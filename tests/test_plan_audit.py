"""Plan-audit rules + the two-phase distributed_prefix helper.

The global-window rule (round-10): a WindowExec with an EMPTY
partitionSpec executes on ONE task — correct and invisible at test SF,
fatal at 100 TB. The audit must flag a planted one, pass the
whitelisted bounded uses, and the re-planned ranking/percentile family
must be clean (they carry the two-phase decomposition instead).
"""

import pytest
from pyspark.sql import Window, functions as F

from table_versions_spark.operators.common import distributed_prefix, load
from table_versions_spark.plans.audit import audit_dataframe


@pytest.fixture()
def static_plans(spark):
    """The audit judges the STATIC plan — AQE wraps/defers otherwise.

    The prefix small-input floor is also pinned OFF: the audit asks
    what plan a 100 TB input gets, and at that size the floor never
    fires — letting it fire on the test fixture would make the audit
    judge the tiny-input degenerate shape instead (r12)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.tvx.prefix.smallInput.maxBytes", "0")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev)
    spark.conf.unset("spark.tvx.prefix.smallInput.maxBytes")


class TestGlobalWindowRule:
    def test_planted_global_window_flagged(self, static_plans, sf_small):
        li = load(static_plans, sf_small, "lineitem")
        planted = li.withColumn(
            "rn", F.row_number().over(Window.orderBy("l_extendedprice")))
        problems = audit_dataframe(planted, "planted")
        assert any("empty partitionSpec" in p for p in problems), problems

    def test_partitioned_window_passes(self, static_plans, sf_small):
        li = load(static_plans, sf_small, "lineitem")
        ok = li.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
        problems = audit_dataframe(ok, "partitioned")
        assert not any("partitionSpec" in p for p in problems), problems

    def test_domain_mix_passes(self, static_plans, sf_small):
        """The mixture totals ride a whitelisted 1-row broadcast cross
        join — no empty-spec window left anywhere in the plan."""
        from table_versions_spark.operators.text import q_domain_mix

        df = q_domain_mix(static_plans, sf_small)
        problems = audit_dataframe(df, "q_domain_mix")
        assert not problems, problems

    @pytest.mark.parametrize("qid", [
        "q_pareto_frontier", "q_quality_ensemble",
        "q_percentile_disc", "q_weighted_median",
    ])
    def test_replanned_family_clean(self, static_plans, sf_small, qid):
        """The four ids the r9 verdict marked perf-weak now carry the
        two-phase plan: no empty-partitionSpec window anywhere."""
        from table_versions_spark.operators import (analytic, cleaning,
                                                    relational)

        fn = {**analytic.QUERIES, **cleaning.QUERIES,
              **relational.QUERIES}[qid]
        problems = audit_dataframe(fn(static_plans, sf_small), qid)
        assert not any("partitionSpec" in p for p in problems), problems


class TestTinyKeyWindowRule:
    """Round-11 rule (VERDICT r10 #3): a window keyed SOLELY on
    fixed-domain columns over raw-sized input is the single-task sort
    wearing a partitionBy — the shape q_percentile_disc had before its
    re-plan, which the empty-spec rule alone cannot see."""

    def test_planted_tiny_key_window_flagged(self, static_plans, sf_small):
        li = load(static_plans, sf_small, "lineitem")
        planted = li.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("l_returnflag")
                .orderBy("l_extendedprice", "l_orderkey")))
        problems = audit_dataframe(planted, "planted")
        assert any("tiny columns" in p for p in problems), problems

    def test_aggregated_input_passes(self, static_plans, sf_small):
        """A tiny-key window over an AGGREGATE (domain-bounded series,
        the q_moving_zscore shape) is legitimate."""
        li = load(static_plans, sf_small, "lineitem")
        daily = (li.groupBy("l_returnflag", "l_shipdate")
                 .agg(F.count(F.lit(1)).alias("c")))
        ok = daily.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("l_returnflag").orderBy("l_shipdate")))
        problems = audit_dataframe(ok, "agg-input")
        assert not any("tiny columns" in p for p in problems), problems

    def test_constant_rank_bound_passes(self, static_plans, sf_small):
        """A tiny-key window whose consumer filters on a CONSTANT rank
        plans as WindowGroupLimit — per-task pruning, scale-safe."""
        li = load(static_plans, sf_small, "lineitem")
        topk = (li.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("l_returnflag")
                .orderBy(F.desc("l_extendedprice"), "l_orderkey")))
            .where(F.col("rn") <= 5))
        problems = audit_dataframe(topk, "topk")
        assert not any("tiny columns" in p for p in problems), problems

    def test_mixed_key_passes(self, static_plans, sf_small):
        """Any data-growing key in the partitionSpec restores
        parallelism — not flagged."""
        li = load(static_plans, sf_small, "lineitem")
        ok = li.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("l_orderkey", "l_returnflag")
                .orderBy("l_linenumber")))
        problems = audit_dataframe(ok, "mixed")
        assert not any("tiny columns" in p for p in problems), problems

    @pytest.mark.parametrize("qid,module", [
        ("q_moving_zscore", "insights"),
        ("q_log_odds_terms", "insights"),
        ("q_zipf_fit", "trends"),
        ("q_event_paths", "trends"),
    ])
    def test_legitimate_ids_pass_unmodified(self, static_plans, sf_small,
                                            qid, module):
        import importlib

        mod = importlib.import_module(
            f"table_versions_spark.operators.{module}")
        problems = audit_dataframe(mod.QUERIES[qid](static_plans,
                                                    sf_small), qid)
        assert not any("tiny columns" in p for p in problems), problems


class TestDistributedPrefix:
    """Exactness vs the single-task window it replaces, all kinds.

    The small-input floor is forced OFF here: these tests pin the
    two-phase bucketed machinery, which test inputs are far too small
    to reach on their own (the floor has its own test class below)."""

    @pytest.fixture(autouse=True)
    def _force_bucketed(self, spark):
        spark.conf.set("spark.tvx.prefix.smallInput.maxBytes", "0")
        yield
        spark.conf.unset("spark.tvx.prefix.smallInput.maxBytes")

    def _li(self, spark, sf_small):
        return load(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_partkey", "l_linenumber",
            "l_returnflag", "l_extendedprice", "l_quantity")

    def test_global_row_number(self, spark, sf_small):
        li = self._li(spark, sf_small)
        order = ["l_extendedprice", "l_orderkey", "l_partkey",
                 "l_linenumber"]
        ref = li.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("long"))
        got = distributed_prefix(li, order, "rn")
        cols = ["l_orderkey", "l_partkey", "l_linenumber", "rn"]
        assert ref.select(cols).exceptAll(got.select(cols)).count() == 0
        assert got.select(cols).exceptAll(ref.select(cols)).count() == 0

    def test_grouped_prefix_sum(self, spark, sf_small):
        li = self._li(spark, sf_small)
        w = (Window.partitionBy("l_returnflag")
             .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = li.withColumn("cw", F.sum("l_quantity").over(w))
        got = distributed_prefix(
            li, ["l_extendedprice", "l_orderkey", "l_linenumber"], "cw",
            group_cols=["l_returnflag"], value=F.col("l_quantity"),
            kind="sum")
        cols = ["l_orderkey", "l_partkey", "l_linenumber", "cw"]
        assert ref.select(cols).exceptAll(got.select(cols)).count() == 0

    def test_strict_prefix_min_desc(self, spark, sf_small):
        li = self._li(spark, sf_small)
        w = (Window.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"),
                            F.asc("l_linenumber"))
             .rowsBetween(Window.unboundedPreceding, -1))
        ref = li.withColumn("m", F.min("l_quantity").over(w))
        got = distributed_prefix(
            li, [("l_extendedprice", "desc"), "l_orderkey",
                 "l_linenumber"], "m",
            value=F.col("l_quantity"), kind="min", inclusive=False)
        cols = ["l_orderkey", "l_partkey", "l_linenumber", "m"]
        assert ref.select(cols).exceptAll(got.select(cols)).count() == 0
        # the global first row has an empty strict prefix -> NULL
        assert got.where(F.col("m").isNull()).count() == 1

    def test_extra_sums_piggyback(self, spark, sf_small):
        """N running sums over one ordering in ONE pass must equal N
        windows (the q_ks_test shape: cum1+cum2 share buckets/shuffle)."""
        li = self._li(spark, sf_small)
        w = (Window.partitionBy("l_returnflag")
             .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = (li.withColumn("cq", F.sum("l_quantity").over(w))
               .withColumn("cp", F.sum("l_partkey").over(w)))
        got = distributed_prefix(
            li, ["l_extendedprice", "l_orderkey", "l_linenumber"], "cq",
            group_cols=["l_returnflag"], value=F.col("l_quantity"),
            kind="sum", extra_sums={"cp": F.col("l_partkey")})
        cols = ["l_orderkey", "l_partkey", "l_linenumber", "cq", "cp"]
        assert ref.select(cols).exceptAll(got.select(cols)).count() == 0
        assert got.select(cols).exceptAll(ref.select(cols)).count() == 0

    def test_total_name_matches_group_aggregate(self, spark, sf_small):
        """``total_name`` (r11: folded from the same per-bucket totals
        array the carries scan) must equal the separate groupBy branch
        it replaced — per kind, grouped and global, including NULL
        values in a sum."""
        li = self._li(spark, sf_small)
        order = ["l_extendedprice", "l_orderkey", "l_linenumber"]

        # kind="count", grouped: total == group row count
        got = distributed_prefix(li, order, "rn",
                                 group_cols=["l_returnflag"],
                                 total_name="n")
        ref = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_ref"))
        bad = (got.join(ref, "l_returnflag")
               .where(F.col("n") != F.col("n_ref")))
        assert bad.count() == 0
        # and the running value still tops out at the total
        assert got.where(F.col("rn") > F.col("n")).count() == 0

        # kind="sum", strict prefix, grouped, with NULLs in the value:
        # total must match the null-skipping group SUM exactly
        nl = li.withColumn(
            "q", F.when(F.col("l_linenumber") == 1, None)
                  .otherwise(F.col("l_quantity")))
        got = distributed_prefix(
            nl, order, "cw", group_cols=["l_returnflag"],
            value=F.col("q"), kind="sum", inclusive=False,
            total_name="tq")
        ref = nl.groupBy("l_returnflag").agg(F.sum("q").alias("tq_ref"))
        bad = (got.join(ref, "l_returnflag")
               .where(F.col("tq") != F.col("tq_ref")))
        assert bad.count() == 0

        # global (no group), kind="min": total == global MIN
        got = distributed_prefix(li, order, "m",
                                 value=F.col("l_quantity"), kind="min",
                                 total_name="tm")
        tm = got.select("tm").distinct().collect()
        ref_min = li.agg(F.min("l_quantity")).first()[0]
        assert len(tm) == 1 and tm[0]["tm"] == ref_min

    def test_plan_has_no_empty_spec_window(self, static_plans, sf_small):
        li = self._li(static_plans, sf_small)
        got = distributed_prefix(li, ["l_extendedprice", "l_orderkey",
                                      "l_partkey", "l_linenumber"], "rn")
        problems = audit_dataframe(got, "helper")
        assert not any("partitionSpec" in p for p in problems), problems

    def test_edge_cases_ties_degenerate_nulls(self, spark):
        """Boundary ties (3 distinct primary values across 8 buckets),
        a single-value primary column (degenerate one-bucket case), and
        NULLs under both directions all reproduce the window rank."""
        df = spark.range(10000).select(
            (F.col("id") % 3).alias("v"), F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"))
        ref = df.withColumn("rn", F.row_number().over(
            Window.partitionBy("g").orderBy("v", "k")).cast("long"))
        got = distributed_prefix(df, ["v", "k"], "rn", group_cols=["g"])
        assert (ref.select("g", "k", "rn")
                .exceptAll(got.select("g", "k", "rn")).count()) == 0

        one = spark.range(5000).select(F.lit(1).alias("v"),
                                       F.col("id").alias("k"))
        ref1 = one.withColumn("rn", F.row_number().over(
            Window.orderBy("v", "k")).cast("long"))
        got1 = distributed_prefix(one, ["v", "k"], "rn")
        assert (ref1.select("k", "rn")
                .exceptAll(got1.select("k", "rn")).count()) == 0

        nl = spark.range(1000).select(
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.col("id") % 5).alias("v"), F.col("id").alias("k"))
        for order, spec in ((["v", "k"], Window.orderBy("v", "k")),
                            ([("v", "desc"), "k"],
                             Window.orderBy(F.desc("v"), "k"))):
            refn = nl.withColumn(
                "rn", F.row_number().over(spec).cast("long"))
            gotn = distributed_prefix(nl, order, "rn")
            assert (refn.select("k", "rn")
                    .exceptAll(gotn.select("k", "rn")).count()) == 0


class TestPrefixSmallInputFloor:
    """Round-12 (VERDICT r11 #3): when Catalyst's size estimate says the
    input is below ``spark.tvx.prefix.smallInput.maxBytes``, the helper
    degrades to the plain per-group window — no boundary pre-pass, no
    carry broadcast join — with IDENTICAL output to the bucketed path.
    Bucketing is load balance only, so the floor can never change what a
    consumer computes."""

    def _plan(self, df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    def test_small_input_takes_window_path(self, spark, sf_small):
        li = load(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        got = distributed_prefix(
            li, ["l_quantity", "l_orderkey", "l_linenumber"], "rn",
            group_cols=["l_returnflag"], total_name="n")
        plan = self._plan(got)
        # the bucketed path's signature pieces must be absent
        assert "BroadcastHashJoin" not in plan, plan
        assert "_b#" not in plan, plan
        assert "Window" in plan, plan

    def test_conf_zero_forces_bucketed_shape(self, spark, sf_small):
        li = load(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        spark.conf.set("spark.tvx.prefix.smallInput.maxBytes", "0")
        try:
            got = distributed_prefix(
                li, ["l_quantity", "l_orderkey", "l_linenumber"], "rn",
                group_cols=["l_returnflag"], total_name="n")
            plan = self._plan(got)
            assert "BroadcastHashJoin" in plan, plan
        finally:
            spark.conf.unset("spark.tvx.prefix.smallInput.maxBytes")

    @pytest.mark.parametrize("kind,inclusive", [
        ("count", True), ("sum", True), ("sum", False),
        ("min", False)])
    def test_floor_and_bucketed_agree(self, spark, sf_small, kind,
                                      inclusive):
        li = load(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        order = ["l_quantity", "l_orderkey", "l_linenumber"]
        kw = dict(group_cols=["l_returnflag"], kind=kind,
                  inclusive=inclusive, total_name="t")
        if kind != "count":
            kw["value"] = F.col("l_quantity")
        fast = distributed_prefix(li, order, "v", **kw)
        spark.conf.set("spark.tvx.prefix.smallInput.maxBytes", "0")
        try:
            slow = distributed_prefix(li, order, "v", **kw)
            cols = ["l_orderkey", "l_linenumber", "v", "t"]
            assert (fast.select(cols).exceptAll(slow.select(cols))
                    .count()) == 0
            assert (slow.select(cols).exceptAll(fast.select(cols))
                    .count()) == 0
        finally:
            spark.conf.unset("spark.tvx.prefix.smallInput.maxBytes")


class TestRetentionSingleScan:
    """Round-11 re-plan: q_retention's cohort is a per-user window MIN
    over the distinct (user, day) frame. The earlier join-based form
    computed the cohort as a separate groupBy(user_id).min(d) branch —
    the optimizer's redundant-aggregate collapse rewrote min-over-
    distinct into min-over-raw, so the fact table was scanned TWICE and
    the cohort relation rode a broadcast whose size grows with #users.
    Pin the fixed shape: one fact scan, a user_id-keyed window, and no
    broadcast join anywhere in the plan."""

    def test_single_fact_scan_and_no_broadcast(self, static_plans, sf_small):
        from table_versions_spark.operators.analytic import q_retention

        df = q_retention(static_plans, sf_small)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert plan.count("Scan parquet") <= 2, plan  # tree + detail entry
        assert "BroadcastHashJoin" not in plan, plan
        assert "Window" in plan, plan
        problems = audit_dataframe(df, "q_retention")
        assert not problems, problems
