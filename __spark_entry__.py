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
        # New in round 7 — alignment-robust exact duplicated-substring
        # pairs via content-defined chunking, suffix/truncation dups, and
        # the Gopher quality gate (all oracle-backed; never
        # driver-checked, so worth the most):
        "q_dedup_substring", "q_dedup_suffix", "q_gopher_rules",
        # Round-7 rotation (VERDICT r6 #2): the 60 ids whose latest green
        # driver row is r4 or earlier, stalest first. First the 10 ids
        # last checked in r3:
        "q_stream_agg", "q_sim_ann_lsh", "q_kmeans", "q_bm25", "q_tfidf",
        "q_pii_redact", "q_contamination", "q_repetition", "q_histogram",
        "q_sample_per_group",
        # ...then the r4 mutation family:
        "q_upsert", "q_merge", "q_delete", "q_update",
        "q_delete_dv", "q_update_dv", "q_change_feed_rows",
        "q_partition_prune", "q_insert_overwrite_partition",
        "q_rename_column", "q_rollup_incremental",
        # ...the r4 streaming family:
        "q_stream_sink", "q_stream_cdf", "q_stream_dedup",
        "q_stream_window", "q_stream_session", "q_stream_join",
        # ...the r4 TPC-H stragglers:
        "q_tpch_q2", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
        "q_tpch_q20", "q_tpch_q21",
        # ...and the rest of the r4-stale ids (text/dedup/analytic/
        # relational families):
        "q_bpe_train", "q_tokenize_apply", "q_sample_temperature",
        "q_dedup_paragraph", "q_pack_sequences", "q_sample_weighted",
        "q_shuffle_shards", "q_knn_join", "q_dedup_prefix",
        "q_dedup_incremental", "q_semdedup", "q_asof_join", "q_sessionize",
        "q_session_window", "q_funnel", "q_anomaly", "q_scan_csv",
        "q_scan_json", "q_json_funcs", "q_udaf_pandas", "q_udtf",
        "q_window_range_frame", "q_date_from_ts", "q_unpivot",
        "q_grouping_sets", "q_curation_pipeline", "q_lm_score",
        # r5-green families rotate behind; the r6-green families come
        # last via registry order.
        "q_change_feed_rewrite", "q_change_feed_per_commit",
        "q_ngram_topk", "q_scd2", "q_retention",
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
