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
        insights,
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
               relational, tpch, cleaning, insights]
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)
    priority = [
        # Round-10 rotation (VERDICT r9 #3). The driver budget is ~50
        # rows; lead with the 8 ids that landed after the r9 priority
        # list froze and have NEVER had a driver row (oracle-green in
        # the independent sweeps, but the driver record is the gate),
        # then this round's new ids, then the oldest (r6) tail so every
        # registry id's latest driver record becomes r7 or newer.
        # --- landed late in r9: never driver-checked ---
        # (q_dedup_survivors closes the head: its recursive-CTE oracle
        # costs ~57 s at sf0.01, so it must not starve the rows behind
        # it if the driver budget is time-bound)
        "q_asof_nearest", "q_percentile_disc",
        "q_rolling_wau", "q_stream_update_mode", "q_tpch_refresh",
        "q_union_by_name", "q_weighted_median",
        # --- round-10 additions (never driver-checked) ---
        "q_abc_analysis", "q_gini", "q_market_basket", "q_rfm",
        "q_mode", "q_arg_extremes", "q_benford", "q_cond_aggs",
        "q_moving_zscore", "q_null_profile", "q_decile_stats",
        "q_hour_entropy", "q_markov_transitions", "q_first_touch",
        "q_name_match", "q_embedding_norms", "q_dow_chisq",
        "q_order_backlog",
        # --- re-planned this round (the rest of the re-planned family
        # has r9 driver rows and rides registry order; head stays at
        # the driver's ~50-row budget) ---
        "q_pareto_frontier", "q_quality_ensemble", "q_top_p_quality",
        "q_domain_mix",
        # --- oldest driver rows (r6) ---
        "q_bloom_skipping", "q_clustered_skipping", "q_zorder_skipping",
        "q_bucketed_join", "q_change_feed", "q_compact_invariant",
        "q_corr", "q_time_travel", "q_time_travel_ts", "q_multimodal",
        "q_multimodal_frames", "q_multimodal_audio",
        "q_multimodal_resize", "q_pivot", "q_explode", "q_window_lag",
        "q_quantiles", "q_restore", "q_schema_evolution",
        "q_vacuum_invariant", "q_dedup_survivors",
        # r7/r8/r9-green families come behind via registry order.
    ]
    pset = set(priority)
    ordered = ([n for n in priority if n in queries]
               + [n for n in queries if n not in pset])
    queries = {n: queries[n] for n in ordered}
    oracles = {n: oracles[n] for n in ordered if n in oracles}
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
