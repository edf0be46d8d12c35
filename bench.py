"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query plan is fully executed via the noop datasource sink (no driver
collect overhead, no result materialization skew). Session is warmed with a
trivial job first so JVM/codegen startup isn't charged to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the shuffles/joins
# that dominate at scale. Versioned-write flows are included because the
# engine's write path IS a product surface.
HEADLINE = [
    "q_scan_parquet",
    "q_filter_eq",
    "q_agg_hash",
    "q_agg_distinct",
    "q_join_inner",
    "q_join_left",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q18",
    "q_tpch_q2",
    "q_tpch_q21",
    "q_asof_join",
    "q_range_join",
    "q_window_rank",
    "q_window_running",
    "q_topk",
    "q_rollup",
    "q_udf_pandas",
    "q_snapshot_replace",
    "q_insert_overwrite_partition",
    "q_partition_prune",
    "q_dedup_exact",
    "q_text_stats",
    "q_token_count",
    "q_fingerprint",
    "q_sim_search",
    "q_dedup_ngram",
    "q_dedup_embedding",
    "q_dedup_minhash",
    "q_chunk_docs",
    "q_sample_stratified",
    "q_embed_quantize",
    "q_pii_redact",
    "q_contamination",
    "q_repetition",
    "q_tfidf",
    "q_bm25",
    "q_sim_ann_lsh",
    "q_kmeans",
    "q_semdedup",
    "q_lm_score",
    "q_pack_sequences",
    "q_shuffle_shards",
    "q_knn_join",
    "q_json_funcs",
    "q_anomaly",
    "q_session_window",
    "q_dedup_incremental",
    "q_dedup_paragraph",
    "q_grouping_sets",
    "q_delete_dv",
    "q_change_feed_rewrite",
    "q_update_dv",
    "q_scd2",
    "q_retention",
    "q_ngram_topk",
    "q_domain_mix",
    "q_text_normalize",
    "q_quality_bucket",
    "q_sim_ann_pq",
    "q_multimodal_audio",
    "q_dedup_substring",
    "q_dedup_fuzzy",
    "q_dedup_containment",
    "q_entropy",
    "q_asof_tolerance",
    "q_window_ntile",
    "q_top_p_quality",
    "q_resample_locf",
    "q_regexp_funcs",
    "q_interval_join",
    "q_pmi_bigrams",
    "q_winsorize",
    "q_exists_subquery",
    "q_lateral_join",
    "q_hard_negatives",
    "q_mad_outliers",
    "q_resample_interp",
    "q_pareto_frontier",
    "q_not_in_null",
    "q_quality_ensemble",
    "q_string_agg",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from table_versions_spark.session import get_spark

    # ambient host load, sampled BEFORE the session spins up 32 executor
    # threads — reading it after init/warmup charged the bench its own
    # startup burn and made every artifact look contaminated
    load_ambient = _loadavg()
    spark = get_spark(app_name="tvx-bench")
    # Warm-up covers every engine path the headline queries touch (JIT +
    # class-loading for codegen, parquet reader, noop committer), so the
    # first measured query isn't charged JVM startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    # Load-robustness + reproducibility: the whole headline list runs
    # THREE times end-to-end, each visit itself best-of-2 back-to-back
    # reps. Taking the per-query min ACROSS passes means a host-load
    # spike has to hit the same query in all passes, minutes apart, to
    # contaminate its number — single-pass artifacts were hostage to
    # whatever the shared VM was doing that minute (BENCH_r06 read
    # 1.59x vs r5 purely from load; three paired idle A/B replays
    # measured ~1.0x — tools/AB_NOTES.md). The back-to-back second rep
    # is NOT optional: it is what every r01–r10 artifact measured (the
    # first visit bears whole-stage-codegen compile + cold cross-query
    # caches; a 3×1-rep trial read ~1.6× across the board for exactly
    # that reason), so dropping it would break round-over-round
    # comparability. The artifact is SELF-CERTIFYING (r10 verdict #5):
    # per-pass loadavg and per-pass best-of-2 totals ship in the
    # sidecar, so a reader sees the same-tree spread (±12% observed on
    # this shared VM) without rerunning.
    reps_seen: dict[str, list[float]] = {}
    pass_times: list[dict[str, float]] = []
    per_pass_loadavg: list[list[float] | None] = []
    errors: dict[str, str] = {}
    load_start = load_ambient
    for _pass in range(3):
        per_pass_loadavg.append(_loadavg())
        this_pass: dict[str, float] = {}
        pass_times.append(this_pass)
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                errors[name] = "not registered"
                continue
            try:
                best = None
                for _rep in range(2):
                    t0 = time.time()
                    df = fn(spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    took = time.time() - t0
                    reps_seen.setdefault(name, []).append(took)
                    best = took if best is None else min(best, took)
                this_pass[name] = best
            except Exception as exc:  # noqa: BLE001 — artifact must survive
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            # inter-query hygiene: as the headline grew, later queries were
            # paying the accumulated JVM state of earlier ones (~16%
            # inflation on a 54-query tail, measured by replaying an older
            # round's exact list — tools/AB_NOTES.md). An explicit
            # collection between queries keeps each measurement closer to
            # its isolated cost.
            try:
                spark._jvm.System.gc()
            except Exception:  # noqa: BLE001 — hygiene must not fail a run
                pass
    load_end = _loadavg()

    import statistics

    timings = {n: round(min(r), 3) for n, r in reps_seen.items() if r}
    # median of the three per-pass best-of-2 values — the robust
    # "typical visit" number the min can be sanity-checked against
    medians = {n: round(statistics.median(
        [p[n] for p in pass_times if n in p]), 3)
        for n in timings if any(n in p for p in pass_times)}
    spread = {n: [round(min(r), 3), round(max(r), 3)]
              for n, r in reps_seen.items() if r}
    pass_totals = [round(sum(p.values()), 3) for p in pass_times]
    # a query that errored in one pass but completed reps in another is
    # PARTIAL: its min stands on fewer reps. Keep it in timings (a min
    # over fewer reps is still a valid plan cost) but flag it, and keep
    # `errors` reserved for queries with NO successful rep — the old
    # artifacts' invariant that timings and errors never overlap.
    partial = sorted(n for n in errors if n in timings)
    errors = {n: e for n, e in errors.items() if n not in timings}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "passes": 3,
        "reps_per_pass": 2,
        "spread": spread,
        # self-certification: median of the three per-pass best-of-2
        # values per query, the three raw pass totals, and ambient
        # loadavg sampled before EACH pass — a loaded or drifting host
        # is visible in the artifact itself
        "value_median": round(sum(medians.values()), 3),
        "pass_totals": pass_totals,
        "per_pass_loadavg": per_pass_loadavg,
    }
    if partial:
        full["partial"] = partial
    if errors:
        full["errors"] = errors

    # The driver captures only the LAST ~2,000 chars of stdout; the r7
    # artifact's spread/loadavg fields pushed the single line past that and
    # left BENCH_r07.json with parsed:null. Ship the full artifact (spread,
    # loadavg, partial, errors) to a sidecar file and print a COMPACT line
    # — headline value + per-query mins at 2dp — as the LAST stdout line.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "BENCH_full.json"
    )
    try:
        with open(sidecar, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError as exc:
        print(f"bench: sidecar write failed: {exc}", file=sys.stderr)

    print(compact_line(full))


def compact_line(full: dict, limit: int = 1900) -> str:
    """Render the last-stdout-line summary, guaranteed <= `limit` chars.

    Keeps metric/value/sf/queries always; sheds loadavg, partial and error
    detail first, then falls back to 1dp per-query mins. The full-fidelity
    artifact lives in tools/BENCH_full.json.
    """
    timings = full["queries"]
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": {n: round(v, 2) for n, v in timings.items()},
        "sf": full["sf"],
        "passes": full.get("passes", 1),
        "loadavg": full.get("loadavg_start"),
    }
    if full.get("partial"):
        compact["partial"] = full["partial"]
    if full.get("errors"):
        # names only on the compact line; messages live in the sidecar
        compact["errors"] = sorted(full["errors"])
    line = json.dumps(compact, separators=(",", ":"))
    # Degrade gracefully if the headline list ever grows the line past the
    # driver's tail capture: drop optional fields, never the value/queries.
    for victim in ("loadavg", "partial", "errors"):
        if len(line) <= limit:
            break
        compact.pop(victim, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > limit:  # 1dp mins
        compact["queries"] = {n: round(v, 1) for n, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    # Absolute guarantee: keep only the slowest queries that fit, flagged.
    # (The sidecar always carries the full map; value stays the true total.)
    while len(line) > limit and compact["queries"]:
        by_cost = sorted(timings, key=lambda n: -timings[n])
        keep = max(1, len(compact["queries"]) - 8)
        compact["queries"] = {n: round(timings[n], 1) for n in by_cost[:keep]}
        compact["queries_truncated"] = len(timings) - keep
        line = json.dumps(compact, separators=(",", ":"))
    return line


def _loadavg() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return None


if __name__ == "__main__":
    main()
