"""Temporal & analytic operators Spark lacks as single primitives
(SURVEY §2.B [ext] / §2.D adjacent).

- **As-of join** (`q_asof_join`): implemented as a *union + partitioned
  window* rather than an inequality join: tag the reference stream and the
  probe stream, union them, and take `last(value, ignorenulls=True)` over a
  `partitionBy(key).orderBy(ts, tag)` window. One shuffle on the key, no
  join explosion, no per-key driver logic — this is the 100 TB-safe shape
  (an inequality join would be a broadcast-nested-loop or a skew-prone
  range join). Oracle: DuckDB native `ASOF LEFT JOIN`.
- **Range join** (`q_range_join`): fact-to-band join on a `BETWEEN`
  condition against a tiny broadcast dimension — Catalyst turns this into a
  BroadcastNestedLoopJoin which is the right plan when the band table is
  O(10) rows; at 100 TB the fact side still streams map-side with no
  shuffle.
- Window navigation (`q_window_lag`), pivot (`q_pivot`), explode
  (`q_explode`), exact quantiles (`q_quantiles`), approximate quantiles
  (`q_approx_quantile`, rows-only — t-digest/GK sketches differ across
  engines), correlation/covariance (`q_corr`).
"""

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import distributed_prefix, load, load_events


# ------------------------------------------------------------ as-of join

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'purchase' event, the latest same-user event at-or-before
    it (backward as-of join, ties resolved toward the reference row)."""
    ev = load_events(spark, sf_dir)
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    # Reference stream: non-purchase activity, deduped per (user, ts) for
    # cross-engine determinism (DuckDB ASOF picks an arbitrary row on ties).
    prior = (ev.where(F.col("event_type") != "purchase")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("prior_event_id")))
    tagged = (prior.select("user_id", "ts",
                           F.lit(0).alias("is_probe"),
                           "prior_event_id",
                           F.lit(None).cast("long").alias("event_id"),
                           F.lit(None).cast("double").alias("value"))
              .unionByName(
                  purchases.select("user_id", "ts",
                                   F.lit(1).alias("is_probe"),
                                   F.lit(None).cast("long").alias("prior_event_id"),
                                   "event_id", "value")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_probe")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (tagged
            .withColumn("matched_prior", F.last("prior_event_id", ignorenulls=True).over(w))
            .where(F.col("is_probe") == 1)
            .select("event_id", "user_id", "ts", "value",
                    F.col("matched_prior").alias("prior_event_id")))


ASOF_TOL_SEC = 21_600  # forward as-of tolerance: 6 hours


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a staleness bound: for every purchase, the
    EARLIEST same-user non-purchase event STRICTLY after it and within
    ``ASOF_TOL_SEC`` — the "next action within the attribution window"
    shape (pandas ``merge_asof(direction='forward', tolerance=...)``).
    Purchases with no in-window follow-up surface with NULLs (left
    semantics), so the tolerance is part of the answer, not a filter.

    Scale shape: NO join — probes and references union into one stream
    and a single ``rangeBetween(1, tol)`` window over epoch-micros per
    user picks ``min(struct(ts, id))`` among reference rows in the
    window (strictly-after falls out of the range start at +1 µs; the
    struct min is the (earliest, lowest-id) tie-break). One shuffle on
    user_id, whole-stage window evaluation. References are pre-deduped
    per (user, ts) exactly like q_asof_join, keeping tie order
    engine-independent."""
    ev = load_events(spark, sf_dir)
    probes = (ev.where(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts", "value",
                      F.lit(1).alias("is_probe"),
                      F.lit(None).cast("long").alias("ref_id")))
    refs = (ev.where(F.col("event_type") != "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("ref_id"))
            .select(F.lit(None).cast("long").alias("event_id"),
                    "user_id", "ts",
                    F.lit(None).cast("double").alias("value"),
                    F.lit(0).alias("is_probe"), "ref_id"))
    tagged = (probes.unionByName(refs)
              .withColumn("ts_us", F.unix_micros("ts")))
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(1, ASOF_TOL_SEC * 1_000_000))
    nxt = F.min(F.when(F.col("is_probe") == 0,
                       F.struct(F.col("ts_us").alias("t"),
                                F.col("ref_id").alias("id")))).over(w)
    return (tagged
            .withColumn("nxt", nxt)
            .where(F.col("is_probe") == 1)
            .select("event_id", "user_id", "value",
                    F.col("nxt.id").alias("next_event_id"),
                    (F.col("nxt.t") - F.col("ts_us")).alias("gap_us")))


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join — pandas
    ``merge_asof(direction='nearest')``, completing the family next to
    q_asof_join (backward) and q_asof_tolerance (forward+tolerance):
    each purchase pairs with the same-user reference event closest in
    ABSOLUTE time, either side; equal distances break BACKWARD (the
    earlier reference), and probes with no same-user reference surface
    with NULLs.

    Scale shape: still NO join — the union+window trick run in both
    directions (the q_resample_interp machinery): one ascending pass
    carries the latest at-or-before reference, one descending pass the
    earliest at-or-after, both as non-null struct markers, then a
    codegen'd distance compare picks the winner. One shuffle on
    user_id total; references pre-deduped per (user, ts) keeps tie
    order engine-independent. ``gap_us`` is SIGNED (ref − probe), so
    the chosen direction is part of the checked answer."""
    ev = load_events(spark, sf_dir)
    probes = (ev.where(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts",
                      F.lit(1).alias("is_probe"),
                      F.lit(None).cast("long").alias("ref_id")))
    refs = (ev.where(F.col("event_type") != "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("ref_id"))
            .select(F.lit(None).cast("long").alias("event_id"),
                    "user_id", "ts", F.lit(0).alias("is_probe"),
                    "ref_id"))
    tagged = (probes.unionByName(refs)
              .withColumn("ts_us", F.unix_micros("ts")))
    obs = F.when(F.col("is_probe") == 0,
                 F.struct(F.col("ts_us").alias("t"),
                          F.col("ref_id").alias("id")))
    w_prev = (Window.partitionBy("user_id").orderBy("ts_us", "is_probe")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy("user_id")
              .orderBy(F.desc("ts_us"), F.asc("is_probe"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.last(obs, ignorenulls=True).over(w_next)
    gap_prev = F.col("ts_us") - prev["t"]
    gap_next = nxt["t"] - F.col("ts_us")
    take_prev = prev.isNotNull() & (nxt.isNull() | (gap_prev <= gap_next))
    best = F.when(take_prev, prev).otherwise(nxt)
    return (tagged
            .withColumn("best", best)
            .where(F.col("is_probe") == 1)
            .select("event_id", "user_id",
                    F.col("best.id").alias("nearest_ref_id"),
                    (F.col("best.t") - F.col("ts_us")).alias("gap_us")))


RESAMPLE_HOURS = 6   # fixed resample grid step
RESAMPLE_USERS = 10  # user_id < this bound rides the resample


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLE with last-observation-carried-forward: each
    tracked user's event value sampled onto a fixed 6-hour grid spanning
    the corpus (day-aligned start), each grid point carrying the most
    recent at-or-before value — pandas ``resample().ffill()`` /
    TimescaleDB ``locf(time_bucket_gapfill(...))`` semantics, including
    NULL before a user's first event.

    Scale shape: the grid is GENERATED declaratively (``sequence`` over
    the corpus min/max — no driver collect) and cross-joined with the
    tiny tracked-user set (both broadcast-sized by construction — the
    BNLJ is whitelisted in the plan audit for exactly this reason); then
    the q_asof_join union+window trick fills values in ONE shuffle on
    user_id — refs sort before probes at equal ts, making the carry
    at-or-before inclusive. Per-(user, ts) duplicates collapse to the
    lexicographic-max (event_id, value) so the fill is deterministic on
    replayed corpora. Observations are carried through a single-field
    STRUCT marker, not the raw value: the struct is non-null for every
    observation row even when its ``value`` is NULL, so a NULL
    observation is carried AS NULL (pandas/TimescaleDB LOCF semantics,
    and what the SQL oracle's "most recent row" computes) instead of
    being skipped over for an older non-null value."""
    ev = load_events(spark, sf_dir)
    refs = (ev.where(F.col("user_id") < RESAMPLE_USERS)
            .groupBy("user_id", "ts")
            .agg(F.max(F.struct("event_id", "value"))["value"]
                 .alias("value")))
    grid = (ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"),
                   F.max("ts").alias("t1"))
            .select(F.explode(F.expr(
                f"sequence(t0, t1, interval {RESAMPLE_HOURS} hours)"))
                .alias("grid_ts")))
    users = refs.select("user_id").distinct()
    probes = (users.crossJoin(F.broadcast(grid))
              .select("user_id", F.col("grid_ts").alias("ts"),
                      F.lit(None).cast("double").alias("value"),
                      F.lit(1).alias("is_probe")))
    tagged = (refs.withColumn("is_probe", F.lit(0))
              .unionByName(probes))
    w = (Window.partitionBy("user_id").orderBy("ts", "is_probe")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = F.last(F.when(F.col("is_probe") == 0,
                           F.struct(F.col("value").alias("v"))),
                    ignorenulls=True).over(w)["v"]
    return (tagged.withColumn("locf_value", filled)
            .where(F.col("is_probe") == 1)
            .select("user_id", F.col("ts").alias("grid_ts"),
                    "locf_value"))


# ------------------------------------------------------------ range join

BANDS = [(1, "low", 0.0, 10.0), (2, "mid", 10.0, 25.0),
         (3, "high", 25.0, 40.0), (4, "xhigh", 40.0, 1e9)]


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem quantity banded against a tiny range dimension
    (broadcast nested-loop: no shuffle on the fact side)."""
    bands = spark.createDataFrame(
        BANDS, "band_id int, band_name string, lo double, hi double")
    li = load(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    return (li.join(F.broadcast(bands),
                    (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
            .groupBy("band_id", "band_name")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
            .orderBy("band_id"))


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLE with LINEAR INTERPOLATION — TimescaleDB
    ``interpolate(time_bucket_gapfill(...))`` / pandas
    ``resample().interpolate()`` semantics, the companion to
    q_resample_locf's step-fill: each grid point gets the line between
    its nearest at-or-before and at-or-after observations (NULL outside
    the observed range, the observation itself when one lands exactly
    on the grid).

    Scale shape: same ONE union+window shuffle on user_id as LOCF, run
    in both directions — ascending (ts, refs-first) for the backward
    carry and descending for the forward carry, both as non-null STRUCT
    markers so NULL observations carry faithfully. The interpolation
    weight is built from exact epoch-µs integers ((g−t₀)/(t₁−t₀) as one
    int/int→double division), so both engines evaluate identical IEEE
    expressions; the result rounds at 6 dp."""
    ev = load_events(spark, sf_dir)
    refs = (ev.where(F.col("user_id") < RESAMPLE_USERS)
            .groupBy("user_id", "ts")
            .agg(F.max(F.struct("event_id", "value"))["value"]
                 .alias("value")))
    grid = (ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"),
                   F.max("ts").alias("t1"))
            .select(F.explode(F.expr(
                f"sequence(t0, t1, interval {RESAMPLE_HOURS} hours)"))
                .alias("grid_ts")))
    users = refs.select("user_id").distinct()
    probes = (users.crossJoin(F.broadcast(grid))
              .select("user_id", F.col("grid_ts").alias("ts"),
                      F.lit(None).cast("double").alias("value"),
                      F.lit(1).alias("is_probe")))
    tagged = (refs.withColumn("is_probe", F.lit(0))
              .unionByName(probes))
    obs = F.when(F.col("is_probe") == 0,
                 F.struct(F.col("ts").alias("t"),
                          F.col("value").alias("v")))
    w_prev = (Window.partitionBy("user_id").orderBy("ts", "is_probe")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # descending pass: refs still sort BEFORE probes at equal ts, so an
    # observation exactly on the grid is its own "next"
    w_next = (Window.partitionBy("user_id")
              .orderBy(F.desc("ts"), F.asc("is_probe"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.last(obs, ignorenulls=True).over(w_next)
    gu, pu, nu = (F.unix_micros("ts"), F.unix_micros(prev["t"]),
                  F.unix_micros(nxt["t"]))
    interp = (F.when(prev.isNull() | nxt.isNull(),
                     F.lit(None).cast("double"))
              .when(nu == pu, prev["v"])
              .otherwise(prev["v"] + (nxt["v"] - prev["v"])
                         * ((gu - pu) / (nu - pu))))
    return (tagged
            .withColumn("interp_value", F.round(interp, 6))
            .where(F.col("is_probe") == 1)
            .select("user_id", F.col("ts").alias("grid_ts"),
                    "interp_value"))


WAU_WINDOW = 7  # trailing window, in days, ending at each reported day


def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users — COUNT(DISTINCT) over a SLIDING
    window, the engagement metric (WAU per day) that defeats ordinary
    window aggregation because distinct-counts don't compose across
    frame slides.

    Scale shape: the cover-explode trick — each distinct (user, day)
    activity fans out to the ≤ WAU_WINDOW window-END days it is visible
    in (a slim ints-only explode, bounded 7×), then one
    two-phase-exact countDistinct per window end. That turns the
    quadratic "re-scan the window per day" into one shuffle keyed by
    window end; reported days are the corpus's active days (joined
    back, broadcast-sized calendar)."""
    days = (load_events(spark, sf_dir)
            .select("user_id", "event_date").distinct())
    d = F.datediff("event_date", F.lit("1970-01-01").cast("date"))
    covered = days.select(
        "user_id", F.explode(F.sequence(d, d + WAU_WINDOW - 1)).alias("e"))
    cal = days.select(d.alias("e")).distinct()
    return (covered.join(F.broadcast(cal), "e")
            .groupBy("e")
            .agg(F.countDistinct("user_id").alias("wau"))
            .select(F.date_add(F.lit("1970-01-01").cast("date"),
                               F.col("e").cast("int")).alias("day"),
                    "wau"))


def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's CONSECUTIVE-day activity streaks —
    the classic SQL pattern behind "N-day streak" product metrics and
    session-era segmentation. The island key is ``day_number −
    row_number()`` (constant within a consecutive run, strictly
    decreasing across a gap), so streaks fall out of ONE window plus a
    groupBy — no self-join, no iteration, all integer arithmetic (both
    engines count days since epoch identically).

    Scale shape: distinct (user, day) is a map-side-combined aggregate,
    the window and the streak groupBy share the user_id shuffle, and
    output is O(users · streaks)."""
    days = (load_events(spark, sf_dir)
            .select("user_id", "event_date").distinct())
    d = F.datediff("event_date", F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("user_id").orderBy(d)
    island = (d - F.row_number().over(w)).alias("island")
    return (days.select("user_id", "event_date", island)
            .groupBy("user_id", "island")
            .agg(F.min("event_date").alias("streak_start"),
                 F.max("event_date").alias("streak_end"),
                 F.count("*").cast("long").alias("streak_days"))
            .drop("island"))


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): the parts not dominated on
    (maximize p_size, minimize p_retailprice) — the "best tradeoffs"
    query behind price-performance dashboards and data-selection
    curricula. A part is dominated if some part has ≥ size and ≤ price
    with at least one strict.

    Scale shape: the naive skyline is an O(n²) NOT-EXISTS self-join
    (that IS the oracle); this plan is the sort-based O(n log n)
    classic, decomposed for a cluster. The only per-size facts the
    dominance test needs are per-size MINIMUM prices, so the fact table
    first reduces by a map-side-combined ``groupBy(p_size)`` (output
    cardinality = |distinct sizes|); the strictly-larger-size running
    minimum over that reduced table runs as
    :func:`distributed_prefix`'s two-phase range-partitioned scan (no
    single-task global window even if the size domain is huge); and the
    per-size (m1, m2) verdict table broadcast-joins back onto the fact
    scan. One aggregation shuffle over parts + the prefix scan over
    per-size rows — nothing sorts the fact table in one task."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("int").alias("p_size"),
        "p_retailprice")
    per_size = (part.groupBy("p_size")
                .agg(F.min("p_retailprice").alias("m2")))
    verdicts = distributed_prefix(per_size, [("p_size", "desc")], "m1",
                                  value=F.col("m2"), kind="min",
                                  inclusive=False)
    return (part.join(F.broadcast(verdicts), "p_size")
            .where((F.col("m1").isNull()
                    | (F.col("p_retailprice") < F.col("m1")))
                   & (F.col("p_retailprice") == F.col("m2")))
            .select("p_partkey", "p_size", "p_retailprice"))


IVL_MIN = 30                       # both interval sets are [ts, ts+30 min)
_IVL_BUCKET_US = IVL_MIN * 60 * 1_000_000  # bucket width = interval length


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equality key — the shape Spark
    has no native operator for (a bare range predicate plans as a
    broadcast nested loop, O(n·m)): error activity windows [ts, ts+30m)
    joined to purchase windows they overlap, aggregated per error event.

    Scale shape: the classic bucketized band join. Each interval
    explodes to the 30-min epoch buckets it covers (≤ 2, since bucket
    width = interval length — integer ``DIV`` on epoch-µs, no float
    precision loss at 2e18), candidates come from an EQUI-join on the
    bucket (hash-partitioned, never all-pairs), the exact overlap
    predicate filters, and pair-level ``distinct`` collapses the
    both-buckets double-match. Fan-out is ≤ 2× each side; a hot bucket
    is time-localized load, exactly how TsFile/DuckDB's IEJoin-free
    fallback buckets band joins.

    Output: per error interval, how many purchase windows overlap it
    and their id-sum (integer-exact)."""
    ev = load_events(spark, sf_dir)

    def intervals(etype: str, p: str) -> DataFrame:
        return (ev.where(F.col("event_type") == etype)
                .select(F.col("event_id").alias(f"{p}_id"),
                        F.col("ts").alias(f"{p}_start"),
                        (F.col("ts")
                         + F.expr(f"INTERVAL {IVL_MIN} MINUTES"))
                        .alias(f"{p}_end")))

    def bucketed(df: DataFrame, p: str) -> DataFrame:
        bs = F.expr(f"unix_micros({p}_start) DIV {_IVL_BUCKET_US}")
        be = F.expr(f"(unix_micros({p}_end) - 1) DIV {_IVL_BUCKET_US}")
        return df.withColumn("bk", F.explode(F.sequence(bs, be)))

    cand = (bucketed(intervals("error", "e"), "e")
            .join(bucketed(intervals("purchase", "p"), "p"), "bk")
            .where((F.col("e_start") < F.col("p_end"))
                   & (F.col("p_start") < F.col("e_end")))
            .select("e_id", "p_id").distinct())
    return (cand.groupBy(F.col("e_id").alias("event_id"))
            .agg(F.count("*").alias("n_overlap"),
                 F.sum("p_id").alias("sum_pid")))


# ------------------------------------------------- window nav / pivot / explode

def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.lag("o_totalprice", 1).over(w).alias("prev_price"),
                    F.lead("o_totalprice", 1).over(w).alias("next_price"),
                    F.ntile(4).over(w).cast("bigint").alias("quartile")))


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted by status (explicit value list ⇒ one pass,
    no extra distinct job to discover pivot values)."""
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .count()
            .select("o_orderpriority",
                    F.coalesce("F", F.lit(0)).alias("n_f"),
                    F.coalesce("O", F.lit(0)).alias("n_o"),
                    F.coalesce("P", F.lit(0)).alias("n_p"))
            .orderBy("o_orderpriority"))


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token explode + count (generator / flatten surface)."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("word"))
            .limit(50))


# ------------------------------------------------------- event analytics

SESSION_GAP_MIN = 30


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts when a user's inter-event
    gap exceeds 30 minutes (lag + running-sum-of-flags — the canonical
    DataFrame shape; the streaming twin lives in streaming/ingest.py as
    ``applyInPandasWithState``). One shuffle on user_id covers both windows
    and the final aggregation."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_min = (F.col("ts").cast("double")
               - F.lag(F.col("ts").cast("double"), 1).over(w)) / 60.0
    new_sess = F.when(gap_min.isNull() | (gap_min > SESSION_GAP_MIN), 1).otherwise(0)
    return (ev
            .withColumn("sess_no", F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                .cast("bigint"))
            .groupBy("user_id", "sess_no")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event")))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per step, how many
    users reached it in order (each step's first occurrence after the
    previous step's).

    ONE events scan and ONE shuffle: three whole-partition windows over
    the same user_id partitioning chain the conditional mins (t_view =
    min view ts; t_click = min click ts strictly after t_view; t_buy =
    min purchase ts strictly after t_click) — each window may reference
    the previous one's output because they share the partition spec, so
    no re-exchange. The old shape re-scanned events three times
    (per-user aggregate + click branch + purchase branch) and paid two
    join shuffles to chain the steps; NULL propagation is identical
    (a missing previous step makes the strict > comparison NULL, which
    the conditional min ignores — exactly what the old left joins +
    ok-flag filters computed). The per-user reduce rides the windows'
    partitioning (no new exchange), and the final count is a 1-row
    fold."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view",
                          F.col("ts"))).over(w)
    staged = ev.select("user_id", "event_type", "ts",
                       t_view.alias("t_view"))
    t_click = F.min(F.when((F.col("event_type") == "click")
                           & (F.col("ts") > F.col("t_view")),
                           F.col("ts"))).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_buy = F.min(F.when((F.col("event_type") == "purchase")
                         & (F.col("ts") > F.col("t_click")),
                         F.col("ts"))).over(w)
    per_user = (staged.withColumn("t_buy", t_buy)
                .groupBy("user_id")
                .agg(F.min("t_view").alias("t_view"),
                     F.min("t_click").alias("t_click"),
                     F.min("t_buy").alias("t_buy")))
    return (per_user.agg(
        F.count(F.col("t_view")).alias("n_view"),
        F.count(F.col("t_click")).alias("n_view_click"),
        F.count(F.col("t_buy")).alias("n_view_click_buy")))


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN gap sessionization (``F.session_window`` — the
    dynamic-gap window type, usable identically in batch and Structured
    Streaming) over the events table; complements ``q_sessionize``'s
    hand-rolled lag+cumsum shape. Semantics: a session extends while the
    next same-user event arrives strictly before ``last_ts + gap``; its
    ``end`` is ``last event + gap``. One shuffle on user_id; in streaming
    the same expression merges session state in the state store.

    The oracle reproduces the exact merge rule (new session when the
    inter-event gap ≥ 30 min — note ≥, not >: an event AT the previous
    session's end starts a new one) in integer µs arithmetic."""
    ev = load_events(spark, sf_dir)
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


HIST_BINS = 20


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram over events (the data-profiling scan a
    pipeline runs before choosing filters/clustering): bins over the
    observed [min, max] — one tiny stats aggregate broadcast into a single
    codegen'd scan + one O(#bins) groupBy. The bin expression is written
    with the SAME operation order in the oracle, so the IEEE arithmetic
    is bit-identical; only a value exactly on a bin edge then depends on
    floor's tie behavior, which both engines share."""
    ev = load(spark, sf_dir, "events").select("value")
    row = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).first()
    lo, hi = float(row.lo), float(row.hi)
    bucket = F.least(
        F.lit(HIST_BINS),
        (F.floor((F.col("value") - F.lit(lo)) / F.lit(hi - lo)
                 * F.lit(float(HIST_BINS))) + 1).cast("int"))
    return (ev.groupBy(bucket.alias("bin"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .orderBy("bin"))


ANOMALY_SIGMA = 2.0


def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (the data-quality screen a
    training pipeline runs over numeric telemetry): events whose ``value``
    sits more than ``ANOMALY_SIGMA`` sample standard deviations from their
    event_type's mean.

    Plan shape: one map-side-combined groupBy computes the O(#groups)
    mean/stddev table, which is broadcast back onto the fact scan — the
    fact side is never shuffled (the same two-pass shape scales to any
    corpus; a window over event_type would shuffle and sort every row to
    compute the same five numbers). Output carries the raw ``value``
    (exact doubles), not the z-score — the filter's boundary is the only
    float comparison, and a value landing within 1e-12 of μ±2σ is the same
    measure-zero exposure every hash-checked float query here carries."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    stats = (ev.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sigma")))
    return (ev.join(F.broadcast(stats), "event_type")
            .where(F.abs(F.col("value") - F.col("mu"))
                   > ANOMALY_SIGMA * F.col("sigma"))
            .select("event_id", "event_type", "value"))


# ------------------------------------------------------------- statistics

def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per return flag."""
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
                 F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99")))


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch — rows-only check (sketch algorithms are
    engine-specific; correctness is asserted against the exact quantiles in
    tests/test_operators.py instead)."""
    return (load(spark, sf_dir, "lineitem")
            .agg(F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
                  .alias("approx_pcts")))


def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation & sample covariance over a *strongly* correlated
    pair (price vs discounted price, r≈0.998). Near-zero-correlation pairs
    are deliberately avoided: there the estimate is pure catastrophic
    cancellation noise and no rounding makes two engines agree."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.corr("l_extendedprice", disc_price), 4).alias("price_corr"),
                 F.round(F.covar_samp("l_extendedprice", disc_price), 1).alias("price_cov")))


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each customer's per-date
    price becomes a validity interval ``[valid_from, valid_to)`` with the
    open-ended current row flagged. The warehouse-classic change-history
    materialization (Kimball SCD2), expressed as one window pass.

    Scale shape: one shuffle on the dimension key, then ``lead()`` per
    key — no self-join (the naive SCD2 build joins each row to its
    successor, doubling the shuffle). Customer-key windows are tiny
    (orders/customer is bounded), so no skew risk at 100 TB."""
    src = (load(spark, sf_dir, "orders")
           .groupBy("o_custkey",
                    F.to_date("o_orderdate").alias("o_orderdate"))
           .agg(F.max("o_totalprice").alias("price")))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (src.select(
        "o_custkey", "price",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull()))


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for each
    (cohort, weeks-since-cohort) bucket, how many distinct users were
    active. The canonical product-analytics rollup.

    Scale shape: activity is first reduced to DISTINCT (user, day) —
    collapsing the fact table with a map-side-combined aggregate before
    anything else — then each user's cohort is the whole-partition MIN
    over a user_id window on that distinct frame, and a single agg
    produces the matrix. The earlier join-based plan computed the cohort
    as a separate ``groupBy(user_id).min(d)`` branch: the optimizer's
    redundant-aggregate collapse rewrote min-over-distinct into
    min-over-raw, so the fact was scanned twice (r11 executed-plan
    capture), and the cohort table rode a broadcast whose size is
    O(#users) — a relation that grows with data and would blow the 8 GB
    broadcast cap long before 100 TB. The window form scans the fact
    once and replaces the broadcast with a distinct-row shuffle keyed on
    user_id (data-growing key, no skewed giant partitions: each window
    group is one user's active days)."""
    ev = (load_events(spark, sf_dir)
          .select("user_id", F.col("event_date").alias("d"))
          .distinct())
    cohort = F.min("d").over(Window.partitionBy("user_id"))
    return (ev.withColumn("cohort_date", cohort)
            .groupBy("cohort_date",
                     F.floor(F.datediff("d", "cohort_date") / 7)
                      .alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_asof_tolerance": q_asof_tolerance,
    "q_asof_nearest": q_asof_nearest,
    "q_interval_join": q_interval_join,
    "q_resample_locf": q_resample_locf,
    "q_resample_interp": q_resample_interp,
    "q_pareto_frontier": q_pareto_frontier,
    "q_gaps_islands": q_gaps_islands,
    "q_rolling_wau": q_rolling_wau,
    "q_scd2": q_scd2,
    "q_retention": q_retention,
    "q_range_join": q_range_join,
    "q_window_lag": q_window_lag,
    "q_pivot": q_pivot,
    "q_explode": q_explode,
    "q_sessionize": q_sessionize,
    "q_session_window": q_session_window,
    "q_funnel": q_funnel,
    "q_anomaly": q_anomaly,
    "q_histogram": q_histogram,
    "q_quantiles": q_quantiles,
    "q_approx_quantile": q_approx_quantile,
    "q_corr": q_corr,
}

ORACLES = {
    "q_scd2": (
        "WITH src AS (SELECT o_custkey, CAST(o_orderdate AS DATE) "
        "AS o_orderdate, MAX(o_totalprice) AS price FROM orders "
        "GROUP BY o_custkey, CAST(o_orderdate AS DATE)) "
        "SELECT o_custkey, price, o_orderdate AS valid_from, "
        "LEAD(o_orderdate) OVER w AS valid_to, "
        "(LEAD(o_orderdate) OVER w IS NULL) AS is_current "
        "FROM src WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate)"),
    "q_retention": (
        "WITH e AS (SELECT DISTINCT user_id, "
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events), "
        "f AS (SELECT user_id, MIN(d) AS cohort_date FROM e "
        "GROUP BY user_id) "
        "SELECT cohort_date, "
        "CAST(FLOOR(date_diff('day', cohort_date, d) / 7.0) AS BIGINT) "
        "AS week_offset, COUNT(DISTINCT e.user_id) AS n_users "
        "FROM e JOIN f ON e.user_id = f.user_id "
        "GROUP BY cohort_date, week_offset"),
    "q_resample_locf": (
        "WITH b AS (SELECT date_trunc('day', MIN(ts)) AS t0, MAX(ts) AS t1 "
        "FROM events), "
        "grid AS (SELECT unnest(generate_series("
        "(SELECT t0 FROM b), (SELECT t1 FROM b), "
        f"INTERVAL {RESAMPLE_HOURS} HOUR)) AS grid_ts), "
        "refs AS (SELECT user_id, ts, value FROM ("
        "SELECT user_id, ts, value, ROW_NUMBER() OVER ("
        "PARTITION BY user_id, ts "
        "ORDER BY event_id DESC, value DESC) AS rn FROM events "
        f"WHERE user_id < {RESAMPLE_USERS}) WHERE rn = 1), "
        "users AS (SELECT DISTINCT user_id FROM refs) "
        "SELECT u.user_id, g.grid_ts, "
        "(SELECT r.value FROM refs r WHERE r.user_id = u.user_id "
        "AND r.ts <= g.grid_ts ORDER BY r.ts DESC LIMIT 1) AS locf_value "
        "FROM users u CROSS JOIN grid g"),
    "q_rolling_wau": (
        "WITH days AS (SELECT DISTINCT user_id, "
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events), "
        "cal AS (SELECT DISTINCT d FROM days) "
        "SELECT cal.d AS day, count(DISTINCT days.user_id) AS wau "
        "FROM cal JOIN days ON days.d "
        f"BETWEEN cal.d - INTERVAL {WAU_WINDOW - 1} DAY AND cal.d "
        "GROUP BY cal.d"),
    "q_gaps_islands": (
        "WITH days AS (SELECT DISTINCT user_id, "
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date FROM events), "
        "isl AS (SELECT user_id, event_date, "
        "(event_date - DATE '1970-01-01') "
        "- ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_date) "
        "AS island FROM days) "
        "SELECT user_id, MIN(event_date) AS streak_start, "
        "MAX(event_date) AS streak_end, COUNT(*) AS streak_days "
        "FROM isl GROUP BY user_id, island"),
    "q_pareto_frontier": (
        # the O(n²) NOT-EXISTS definition — deliberately naive: it IS the
        # skyline's semantics, and the window plan must reproduce it
        "SELECT p_partkey, CAST(p_size AS INT) AS p_size, p_retailprice "
        "FROM part a WHERE NOT EXISTS ("
        "SELECT 1 FROM part b WHERE b.p_size >= a.p_size "
        "AND b.p_retailprice <= a.p_retailprice "
        "AND (b.p_size > a.p_size "
        "OR b.p_retailprice < a.p_retailprice))"),
    "q_asof_nearest": (
        "WITH probes AS (SELECT event_id, user_id, epoch_us(ts) AS tu "
        "FROM events WHERE event_type = 'purchase'), "
        "refs AS (SELECT user_id, epoch_us(ts) AS tu, MAX(event_id) "
        "AS ref_id FROM events WHERE event_type <> 'purchase' "
        "GROUP BY 1, 2) "
        "SELECT p.event_id, p.user_id, r.ref_id AS nearest_ref_id, "
        "r.tu - p.tu AS gap_us "
        "FROM probes p LEFT JOIN LATERAL ("
        "SELECT tu, ref_id FROM refs WHERE refs.user_id = p.user_id "
        "ORDER BY abs(tu - p.tu), tu, ref_id LIMIT 1) r ON TRUE"),
    "q_resample_interp": (
        "WITH b AS (SELECT date_trunc('day', MIN(ts)) AS t0, MAX(ts) AS t1 "
        "FROM events), "
        "grid AS (SELECT unnest(generate_series("
        "(SELECT t0 FROM b), (SELECT t1 FROM b), "
        f"INTERVAL {RESAMPLE_HOURS} HOUR)) AS grid_ts), "
        "refs AS (SELECT user_id, ts, value FROM ("
        "SELECT user_id, ts, value, ROW_NUMBER() OVER ("
        "PARTITION BY user_id, ts "
        "ORDER BY event_id DESC, value DESC) AS rn FROM events "
        f"WHERE user_id < {RESAMPLE_USERS}) WHERE rn = 1), "
        "users AS (SELECT DISTINCT user_id FROM refs) "
        "SELECT u.user_id, g.grid_ts, "
        "ROUND(CASE WHEN pv.ts IS NULL OR nv.ts IS NULL THEN NULL "
        "WHEN epoch_us(nv.ts) = epoch_us(pv.ts) THEN pv.value "
        "ELSE pv.value + (nv.value - pv.value) * "
        "((epoch_us(g.grid_ts) - epoch_us(pv.ts)) / "
        "(epoch_us(nv.ts) - epoch_us(pv.ts))) END, 6) AS interp_value "
        "FROM users u CROSS JOIN grid g "
        "LEFT JOIN LATERAL (SELECT ts, value FROM refs r "
        "WHERE r.user_id = u.user_id AND r.ts <= g.grid_ts "
        "ORDER BY r.ts DESC LIMIT 1) pv ON TRUE "
        "LEFT JOIN LATERAL (SELECT ts, value FROM refs r "
        "WHERE r.user_id = u.user_id AND r.ts >= g.grid_ts "
        "ORDER BY r.ts ASC LIMIT 1) nv ON TRUE"),
    "q_interval_join": (
        "WITH e AS (SELECT event_id AS e_id, CAST(ts AS TIMESTAMP) AS s, "
        f"CAST(ts AS TIMESTAMP) + INTERVAL {IVL_MIN} MINUTE AS t "
        "FROM events WHERE event_type = 'error'), "
        "p AS (SELECT event_id AS p_id, CAST(ts AS TIMESTAMP) AS s, "
        f"CAST(ts AS TIMESTAMP) + INTERVAL {IVL_MIN} MINUTE AS t "
        "FROM events WHERE event_type = 'purchase') "
        "SELECT e_id AS event_id, count(*) AS n_overlap, "
        "CAST(sum(p_id) AS BIGINT) AS sum_pid "
        "FROM e JOIN p ON e.s < p.t AND p.s < e.t GROUP BY e_id"),
    "q_asof_tolerance": (
        "WITH probes AS (SELECT event_id, user_id, value, epoch_us(ts) "
        "AS tu FROM events WHERE event_type = 'purchase'), "
        "refs AS (SELECT user_id, epoch_us(ts) AS tu, MAX(event_id) "
        "AS ref_id FROM events WHERE event_type <> 'purchase' "
        "GROUP BY 1, 2) "
        "SELECT event_id, user_id, value, next_event_id, gap_us FROM ("
        "SELECT p.event_id, p.user_id, p.value, "
        "r.ref_id AS next_event_id, r.tu - p.tu AS gap_us, "
        "ROW_NUMBER() OVER (PARTITION BY p.event_id "
        "ORDER BY r.tu, r.ref_id) AS rn "
        "FROM probes p LEFT JOIN refs r ON p.user_id = r.user_id "
        f"AND r.tu > p.tu AND r.tu <= p.tu + {ASOF_TOL_SEC * 1_000_000}) "
        "WHERE rn = 1"),
    "q_asof_join": (
        "WITH prior AS (SELECT user_id, ts, MAX(event_id) AS prior_event_id "
        "FROM events WHERE event_type <> 'purchase' GROUP BY user_id, ts), "
        "purch AS (SELECT event_id, user_id, ts, value FROM events "
        "WHERE event_type = 'purchase') "
        # CAST to µs TIMESTAMP: the raw column is TIMESTAMP_NS, which a
        # strict schema compare would flag against Spark's µs timestamps
        "SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, "
        "p.value, prior.prior_event_id "
        "FROM purch p ASOF LEFT JOIN prior "
        "ON p.user_id = prior.user_id AND p.ts >= prior.ts"),
    "q_range_join": (
        "SELECT band_id, band_name, COUNT(*) AS n, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price "
        "FROM lineitem JOIN (VALUES (1, 'low', 0.0, 10.0), (2, 'mid', 10.0, 25.0), "
        "(3, 'high', 25.0, 40.0), (4, 'xhigh', 40.0, 1e9)) "
        "AS bands(band_id, band_name, lo, hi) "
        "ON l_quantity >= lo AND l_quantity < hi "
        "GROUP BY band_id, band_name ORDER BY band_id"),
    "q_window_lag": (
        "SELECT o_custkey, o_orderkey, "
        "LAG(o_totalprice, 1) OVER w AS prev_price, "
        "LEAD(o_totalprice, 1) OVER w AS next_price, "
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey)"),
    "q_pivot": (
        "SELECT o_orderpriority, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_explode": (
        "SELECT word, COUNT(*) AS n FROM ("
        "SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 50"),
    "q_sessionize": (
        # CAST ts to µs TIMESTAMP first so gap arithmetic matches Spark's
        # µs-precision timestamps (raw column is ns)
        "WITH e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts "
        "FROM events), "
        "g AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL "
        "OR (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) / 60000000.0 > 30 "
        "THEN 1 ELSE 0 END AS ns_flag FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, CAST(SUM(ns_flag) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no "
        "FROM g) "
        "SELECT user_id, sess_no, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 4) AS sum_value, "
        "MIN(event_id) AS first_event, MAX(event_id) AS last_event "
        "FROM s GROUP BY user_id, sess_no"),
    "q_funnel": (
        "WITH e AS (SELECT event_id, user_id, event_type, "
        "CAST(ts AS TIMESTAMP) AS ts FROM events), "
        "pu AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view "
        "FROM e GROUP BY user_id), "
        "c AS (SELECT pu.user_id, t_view, "
        "MIN(CASE WHEN ec.ts > pu.t_view THEN ec.ts END) AS t_click "
        "FROM pu LEFT JOIN e ec ON ec.user_id = pu.user_id "
        "AND ec.event_type = 'click' GROUP BY pu.user_id, t_view), "
        "b AS (SELECT c.user_id, t_view, t_click, "
        "MIN(CASE WHEN ep.ts > c.t_click THEN ep.ts END) AS t_buy "
        "FROM c LEFT JOIN e ep ON ep.user_id = c.user_id "
        "AND ep.event_type = 'purchase' GROUP BY c.user_id, t_view, t_click) "
        "SELECT COUNT(t_view) AS n_view, COUNT(t_click) AS n_view_click, "
        "COUNT(t_buy) AS n_view_click_buy FROM b"),
    "q_session_window": (
        "WITH e AS (SELECT event_id, user_id, value, "
        "CAST(ts AS TIMESTAMP) AS ts FROM events), "
        # ≥ 30 min starts a NEW session (Spark's session_window closes at
        # last_ts + gap exclusive of the boundary instant)
        "g AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL "
        "OR (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) >= 1800000000 "
        "THEN 1 ELSE 0 END AS ns_flag FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, CAST(SUM(ns_flag) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS sess_no FROM g) "
        "SELECT user_id, MIN(ts) AS session_start, "
        "MAX(ts) + INTERVAL 30 MINUTE AS session_end, "
        "COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value "
        "FROM s GROUP BY user_id, sess_no"),
    "q_histogram": (
        # same operation ORDER as the Spark expression: (v-lo)/(hi-lo)*20,
        # floor, +1, least — bit-identical IEEE arithmetic
        "WITH s AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events) "
        "SELECT CAST(LEAST(20, CAST(FLOOR((value - s.lo) / (s.hi - s.lo) "
        "* 20.0) AS BIGINT) + 1) AS INT) AS bin, "
        "COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value "
        "FROM events CROSS JOIN s GROUP BY bin ORDER BY bin"),
    "q_anomaly": (
        "WITH s AS (SELECT event_type, AVG(value) AS mu, "
        "STDDEV_SAMP(value) AS sigma FROM events GROUP BY event_type) "
        "SELECT e.event_id, e.event_type, e.value "
        "FROM events e JOIN s ON e.event_type = s.event_type "
        "WHERE ABS(e.value - s.mu) > 2.0 * s.sigma"),
    "q_quantiles": (
        "SELECT l_returnflag, "
        "ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50, "
        "ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90, "
        "ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99 "
        "FROM lineitem GROUP BY l_returnflag"),
    "q_corr": (
        "SELECT l_returnflag, "
        "ROUND(CORR(l_extendedprice, l_extendedprice * (1 - l_discount)), 4) "
        "AS price_corr, "
        "ROUND(COVAR_SAMP(l_extendedprice, l_extendedprice * (1 - l_discount)), 1) "
        "AS price_cov "
        "FROM lineitem GROUP BY l_returnflag"),
    # q_approx_quantile: intentionally no oracle (sketch, rows-only)
}
