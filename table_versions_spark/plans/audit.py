"""Physical-plan audit: the 100 TB sanity gate, as a library.

Checks a query's *static* physical plan for the properties that decide
whether it survives a 1000-executor, 100 TB scale-up:

- **pushdown**: parquet scans carry ``PushedFilters`` when the query
  filters on scanned columns (a scan that filters post-read re-reads the
  world);
- **pruning**: scans read only the projected columns (``ReadSchema`` width
  vs table width);
- **broadcast**: joins against dimension tables (region/nation/customer/
  supplier/part at TPC-H ratios) are BroadcastHashJoin/BNLJ, not
  SortMergeJoin (a shuffled dim join is a wasted fact-side shuffle);
- **codegen**: the hot path sits inside WholeStageCodegen spans;
- **no cartesian**: no accidental ``CartesianProduct`` anywhere;
- **no global window**: no WindowExec with an EMPTY partitionSpec —
  Spark executes those on ONE task ("Moving all data to a single
  partition"), the scale-killer that is invisible at test SF and fatal
  at 100 TB. The scalable spelling is the two-phase local+carry
  decomposition (``operators.common.distributed_prefix``); an op whose
  empty-spec window input is bounded by construction may whitelist
  ``"global-window"`` with a reason (none currently needs to — the
  bounded cases use 1-row broadcast cross joins instead).

Use :func:`audit_dataframe` on any DataFrame, or run the CLI wrapper
``tools/explain_audit.py`` to sweep every registered query id. Queries may
declare expected deviations in :data:`EXPECTED` (e.g. the deliberate
BroadcastNestedLoopJoin of a range/band join).
"""

from __future__ import annotations

# Deliberate deviations, with the reason they are fine at scale.
EXPECTED: dict[str, set[str]] = {
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
    # single-row broadcast scalar (Σ sqrt(count) normalizer) crossed into
    # the per-group quota table — 1-row build, optimal plan
    "q_sample_temperature": {"bnlj"},
    # generated 6h grid (≤ O(days·4) rows, broadcast) crossed with the
    # tiny tracked-user set — both sides bounded by construction
    "q_resample_locf": {"bnlj"},
    "q_resample_interp": {"bnlj"},
    # single-row broadcast scalar (corpus bigram total N) crossed into
    # the bigram count table — 1-row build, optimal plan
    "q_pmi_bigrams": {"bnlj"},
    # brute-force exact baselines are documented as such (LSH/IVF variants
    # are the scale path)
    "q_sim_search": {"cartesian", "bnlj"},
    # driver-bounded probe block (HN_PROBES rows) broadcast into the
    # corpus scan with a residual label-mismatch predicate; the post-
    # fan-out exchange is one aggregated row per probe
    "q_hard_negatives": {"cartesian", "bnlj"},
    # query token multivector (MAXSIM_QTOKENS rows) broadcast-crossed
    # into one corpus scan; only #labels pivoted rows shuffle
    "q_maxsim": {"cartesian", "bnlj"},
    "q_dedup_embedding": {"cartesian", "bnlj"},
    "q_dedup_ngram": {"cartesian", "bnlj"},
    # 1-row broadcast corpus totals (token sum / #sources) crossed into
    # the per-source mixture table — 1-row build, optimal plan
    "q_domain_mix": {"bnlj"},
    # 1-row broadcast grand total / row count / max-date scalars crossed
    # into aggregated (ABC class, decile, RFM, digit-histogram) tables —
    # 1-row build each, optimal plan for a scalar denominator
    "q_abc_analysis": {"bnlj"},
    "q_decile_stats": {"bnlj"},
    "q_rfm": {"bnlj"},
    "q_benford": {"bnlj"},
    # 1-row broadcast corpus totals (token total N / vocab size V)
    # crossed into the (source, token) score table — 1-row build
    "q_log_odds_terms": {"bnlj"},
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
    """Audit one physical plan; returns the list of violations (empty =
    the plan shape is the one you'd want on a large cluster)."""
    problems = []
    allowed = EXPECTED.get(name, set())
    if "CartesianProduct" in plan and "cartesian" not in allowed:
        problems.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and "bnlj" not in allowed:
        problems.append("BroadcastNestedLoopJoin in plan")
    # Empty-partitionSpec WindowExec = single-task global sort of its
    # whole input. WindowGroupLimit is exempt (it pre-prunes per
    # partition to the limit, the TakeOrdered-style shape), and
    # whitelisted ids document why their window input is bounded.
    if "global-window" not in allowed:
        for node in _iter_nodes(jplan):
            if (node.nodeName() == "Window"
                    and node.partitionSpec().isEmpty()):
                problems.append(
                    "WindowExec with empty partitionSpec — single-task "
                    "global sort (use the two-phase distributed_prefix)")
                break
    # Walk the tree: any shuffled join whose one side bottoms out purely in
    # dimension-table scans is a missed broadcast (at TPC-H ratios the dims
    # stay broadcastable at any SF). Only file-scan leaves count — a
    # ReusedExchange/InMemoryRelation leaf says nothing about table size,
    # and naive substring matching would see "part" in "hashpartitioning".
    for node in _iter_nodes(jplan):
        nn = node.nodeName()
        if nn in ("SortMergeJoin", "ShuffledHashJoin"):
            # FULL OUTER cannot broadcast either side (BroadcastHashJoin
            # supports no FullOuter build side), so a sort-merge full
            # outer over a dimension IS the correct large-cluster plan.
            if "FullOuter" in node.toString().splitlines()[0]:
                continue
            children = node.children()
            for i in range(children.size()):
                scans = [s for s in _leaf_scans(children.apply(i))
                         if "Scan" in s]
                if scans and all(any(f"{d}.parquet" in s or f"{d}.orc" in s
                                     for d in DIM_TABLES) for s in scans):
                    problems.append(f"{nn} side is all-dimension "
                                    f"({scans}) — expected broadcast")
    # whole-stage codegen renders as "*(n) Operator" in plan.toString()
    if "*(" not in plan and "WholeStageCodegen" not in plan \
            and "Scan parquet" in plan:
        problems.append("no WholeStageCodegen span")
    return problems


def audit_dataframe(df, name: str = "<query>") -> list[str]:
    """Audit a DataFrame's executed plan. Run with AQE disabled to judge
    the static plan — the one a 1000-executor cluster must already get
    right (explicit broadcasts, not runtime rescue conversions)."""
    jplan = df._jdf.queryExecution().executedPlan()
    return audit_plan(name, jplan, jplan.toString())


def plan_stats(plan: str) -> str:
    """One-line exchange/join census of a rendered plan string."""
    return (f"exch={plan.count('Exchange')} "
            f"bhj={plan.count('BroadcastHashJoin')} "
            f"smj={plan.count('SortMergeJoin')}")
