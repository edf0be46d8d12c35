"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: versioned snapshot insert of lineitem (sf0.001)
through the VersionedEngine, read back, TPC-H-Q1-shaped aggregation.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; oracles are DuckDB SQL over the pre-registered testdata views.
Queries without an oracle entry (approx sketches, MinHash/SimHash
candidates, BPE's stateful merges, PQ's Lloyd codebooks) get the driver's
rows-only check by design; each is pinned by a dedicated pytest instead.
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
        cleaning,
        dedup,
        multimodal,
        relational,
        similarity,
        text,
        tpch,
        versioned,
    )

    # Registry order = driver check order. The driver's correctness budget
    # may truncate the tail, so order by how much a fresh green row is
    # worth: ids that have never appeared in any driver artifact first,
    # then this round's additions, then previously-green families.
    modules = [versioned, text, similarity, multimodal, dedup, analytic,
               relational, tpch, cleaning]
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)
    priority = [
        # Round-9 rotation (VERDICT r8 #1). The driver budget is ~50 rows;
        # lead with this round's new ids (never driver-checked — worth
        # the most), then the 32 ids whose latest driver row is still r5
        # (the rotation's tail after CORRECTNESS_r08 refreshed the rest)
        # — after r9 no registry id's latest driver row is older than r6.
        # --- round-9 additions (never driver-checked) ---
        "q_exists_subquery", "q_scalar_subquery", "q_lateral_join",
        "q_null_safe_join", "q_pmi_bigrams", "q_winsorize",
        "q_interval_join", "q_hard_negatives", "q_mad_outliers",
        "q_string_agg", "q_resample_interp", "q_stream_merge",
        "q_pareto_frontier", "q_not_in_null", "q_quality_ensemble",
        "q_gaps_islands", "q_maxsim", "q_table_diff",
        # --- 32 ids last green in r5 (core relational + TPC-H bulk) ---
        "q_project", "q_retention", "q_rollup", "q_scan_orc",
        "q_scan_parquet", "q_scan_table", "q_scd2", "q_set_except",
        "q_set_intersect", "q_sort", "q_str_funcs", "q_topk",
        "q_tpch_q1", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6",
        "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
        "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17",
        "q_tpch_q18", "q_tpch_q19", "q_typed_cast", "q_udf_pandas",
        "q_union_all", "q_window_rank", "q_window_running",
        # r6/r7/r8-green families come behind via registry order.
    ]
    pset = set(priority)
    ordered = priority + [n for n in queries if n not in pset]
    queries = {n: queries[n] for n in ordered}
    oracles = {n: oracles[n] for n in ordered if n in oracles}
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
