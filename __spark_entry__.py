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
        # Round-8 rotation (VERDICT r7 #2). Latest-green round per id was
        # computed from CORRECTNESS_r01..r07; the driver budget is ~50
        # rows, so the list leads with the 13 ids whose latest green row
        # is still r4 (the rotation's tail), then the 50 r5-green ids —
        # after r8 no id's latest driver row is older than r5.
        # New round-8 operators are prepended above this comment as they
        # land (never-checked ids are worth the most).
        # --- round-8 additions (never driver-checked) ---
        "q_dedup_fuzzy", "q_entropy", "q_asof_tolerance", "q_window_ntile",
        "q_stream_late", "q_dedup_containment", "q_top_p_quality",
        "q_sample_reservoir", "q_agg_median", "q_array_funcs",
        "q_set_bag_ops", "q_history", "q_map_funcs", "q_join_outer",
        "q_cogroup", "q_stream_static_join", "q_drop_column",
        "q_regexp_funcs", "q_resample_locf",
        # --- 13 r4-stale ids ---
        "q_anomaly", "q_curation_pipeline", "q_date_from_ts", "q_funnel",
        "q_grouping_sets", "q_json_funcs", "q_lm_score", "q_scan_csv",
        "q_scan_json", "q_udaf_pandas", "q_udtf", "q_unpivot",
        "q_window_range_frame",
        # --- 50 ids last green in r5 (core relational + TPC-H bulk) ---
        "q_agg_distinct", "q_agg_hash", "q_change_feed_per_commit",
        "q_change_feed_rewrite", "q_collect", "q_create_ds", "q_cube",
        "q_date_funcs", "q_distinct", "q_filter_eq", "q_join_anti",
        "q_join_inner", "q_join_left", "q_join_semi", "q_join_skew_salted",
        "q_limit", "q_math_funcs", "q_ngram_topk", "q_project",
        "q_retention", "q_rollup", "q_scan_orc", "q_scan_parquet",
        "q_scan_table", "q_scd2", "q_set_except", "q_set_intersect",
        "q_sort", "q_str_funcs", "q_topk", "q_tpch_q1", "q_tpch_q10",
        "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17",
        "q_tpch_q18", "q_tpch_q19", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
        "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_typed_cast",
        "q_udf_pandas", "q_union_all", "q_window_rank", "q_window_running",
        # r6/r7-green families come behind via registry order.
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
