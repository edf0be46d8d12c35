"""Business-analytics / data-profiling operators (SURVEY §2.D extension
family, round 10) — the classic warehouse analyses a reference user runs
daily, each expressed as a scale-first Spark plan with an exact DuckDB
oracle.

Exactness discipline (the package-wide rules):

- ranks/prefix sums over unbounded inputs go through
  :func:`..common.distributed_prefix` (two-phase range-bucketed scan) —
  never a global or tiny-key window;
- money is aggregated in integer CENTS (``CAST(ROUND(x*100) AS BIGINT)``
  — both engines apply the identical IEEE multiply+round to the same
  stored double, then sum exactly);
- quartile/decile assignment uses the explicit
  ``floor((rank-1)·K / n) + 1`` formula on integers instead of NTILE
  (engines disagree on NTILE's remainder convention);
- float divisions happen once, on exact integer inputs, rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import distributed_prefix, load, load_events
from .dedup import BLOCK_DF_CAP

# ------------------------------------------------------------------ ABC

ABC_A_PCT = 80  # cumulative-volume share boundaries of the A/B/C classes
ABC_B_PCT = 95


def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/95) inventory classification: parts ranked by total
    shipped volume; the head covering 80 % of cumulative volume is class
    A, up to 95 % class B, the tail C — the warehouse slice behind
    "which 20 % of SKUs move 80 % of units".

    Scale shape: per-part volumes are one map-side-combined groupBy
    (quantities are integer-valued ⇒ the BIGINT cast is exact); the
    cumulative volume over (volume DESC, partkey) runs as
    :func:`distributed_prefix`'s two-phase scan over the aggregated
    table; the grand total rides a 1-row broadcast; class boundaries
    compare in pure int64 (``cum·100 <= T·pct``, no float seam)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    vol = (li.groupBy("l_partkey")
           .agg(F.sum("l_quantity").cast("long").alias("v")))
    cum = distributed_prefix(vol, [("v", "desc"), "l_partkey"], "cum",
                             value=F.col("v"), kind="sum")
    total = vol.agg(F.sum("v").alias("t"))
    cls = (F.when(F.col("cum") * 100 <= F.col("t") * ABC_A_PCT, "A")
           .when(F.col("cum") * 100 <= F.col("t") * ABC_B_PCT, "B")
           .otherwise("C"))
    return (cum.crossJoin(F.broadcast(total))
            .withColumn("abc_class", cls)
            .groupBy("abc_class")
            .agg(F.count("*").alias("n_parts"),
                 F.sum("v").alias("volume"),
                 F.round(F.sum("v") / F.max("t"), 6).alias("share"))
            .orderBy("abc_class"))


# ----------------------------------------------------------------- Gini

def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of per-customer order activity,
    by market segment — the inequality statistic behind "how
    concentrated is demand" dashboards. Uses ORDER COUNTS (exact
    integers) as the wealth variable, computed with the rank formula
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over values sorted ascending.

    Scale shape: per-customer counts are one groupBy; the rank i within
    each segment comes from :func:`distributed_prefix` (two-phase, no
    tiny-key window even though segments are few — each segment's
    customer list can be arbitrarily large); Σ i·x, Σ x and n are one
    map-side-combined aggregate. Every sum is int64-exact; the two
    divisions happen once at the end in double (identical IEEE on both
    engines), rounded to 6 dp."""
    cust = load(spark, sf_dir, "customer").select("c_custkey",
                                                  "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    x = (orders.groupBy("o_custkey")
         .agg(F.count(F.lit(1)).cast("long").alias("x"))
         .join(F.broadcast(cust),
               F.col("o_custkey") == F.col("c_custkey"))
         .select("c_mktsegment", "c_custkey", "x"))
    ranked = distributed_prefix(x, ["x", "c_custkey"], "i",
                                group_cols=["c_mktsegment"])
    g = (ranked.groupBy("c_mktsegment")
         .agg(F.sum(F.col("i") * F.col("x")).alias("a"),
              F.sum("x").alias("t"),
              F.count(F.lit(1)).cast("long").alias("n")))
    gini = F.round(
        (2 * F.col("a")) / (F.col("n").cast("double") * F.col("t"))
        - (F.col("n") + 1).cast("double") / F.col("n"), 6)
    return g.select("c_mktsegment", "n", F.col("t").alias("n_orders"),
                    gini.alias("gini"))


# -------------------------------------------------------- market basket

BASKET_TOP = 50  # co-occurrence pairs reported


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the part PAIRS most often ordered
    together (support counts over orders) — the candidate-generation
    step of association-rule mining (Apriori's pair pass).

    Scale shape: the self-join is an EQUI-join on l_orderkey (hash
    partitioned, never all-pairs) and TPC-H-shaped orders hold ≤ 7
    items, so the pair fan-out per order is bounded at 21; items are
    deduped per order first so a twice-ordered part never double
    counts. The final top-K is TakeOrderedAndProject on
    (support DESC, pair) — a per-partition heap, no global sort."""
    items = (load(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_partkey").distinct())
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (a.join(b, "l_orderkey")
            .where(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("support"))
            .orderBy(F.desc("support"), "part_a", "part_b")
            .limit(BASKET_TOP))


# ------------------------------------------------------------------ RFM

RFM_K = 4  # quartile scores


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary): every customer
    scored 1..4 on each axis by quartile, reported as segment counts —
    the classic CRM grid.

    Scale shape: per-customer (r_days, n_orders, cents) is one groupBy
    over orders (money summed as exact integer cents); "now" is the
    corpus max order date on a 1-row broadcast; the three quartile
    ranks run as ONE :func:`distributed_prefix` pass over the metrics
    stacked to long format (the q_quality_ensemble trick — no global
    NTILE window), and scores use the explicit
    ``floor((rank−1)·4/n)+1`` integer formula, so both engines bucket
    identically on ties (rank is total-ordered by (value, custkey)).
    Scores are value-ASCENDING quartiles: r_score 1 = most recent,
    f_score 4 = most orders, m_score 4 = highest spend."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    now = orders.agg(F.max("o_orderdate").alias("now"))
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count(F.lit(1)).cast("long").alias("f"),
                     F.sum("cents").alias("m"))
                .crossJoin(F.broadcast(now))
                .select("o_custkey",
                        F.datediff("now", "last_order").cast("long")
                        .alias("r"), "f", "m"))
    stacked = per_cust.select(
        "o_custkey", F.explode(F.array(
            F.struct(F.lit("r").alias("metric"), F.col("r").alias("v")),
            F.struct(F.lit("f").alias("metric"), F.col("f").alias("v")),
            F.struct(F.lit("m").alias("metric"), F.col("m").alias("v"))))
        .alias("x")).select("o_custkey", "x.metric", "x.v")
    # n (#customers) rides the prefix helper's own totals array
    # (total_name): every customer contributes exactly one stacked row
    # per metric, so each metric group's total IS the customer count —
    # the old separate per_cust.agg(count) branch re-executed the whole
    # orders scan + groupBy for one scalar
    ranked = distributed_prefix(stacked, ["v", "o_custkey"], "rn",
                                group_cols=["metric"], total_name="n")
    score = (F.floor((F.col("rn") - 1) * RFM_K / F.col("n")) + 1)

    def pick(metric):
        return F.max(F.when(F.col("metric") == metric, F.col("score")))

    scores = (ranked
              .withColumn("score", score)
              .groupBy("o_custkey")
              .agg(pick("r").alias("r_score"), pick("f").alias("f_score"),
                   pick("m").alias("m_score")))
    return (scores.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_customers")))


# ----------------------------------------------------------------- mode

def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type (most frequent; ties break to the
    lexicographically smallest type) — the "dominant behavior" feature
    column of any user-level model.

    Scale shape: two aggregates, both keyed on high-cardinality
    user-side keys — groupBy (user, type) count, then one
    ``min(struct(-cnt, type))`` per user: the struct min IS the
    deterministic argmax (largest count, then smallest type) computed
    map-side, with no per-user window or sort anywhere."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type")
    counts = (ev.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    best = (counts.groupBy("user_id")
            .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                F.col("event_type").alias("t")))
                 .alias("b")))
    return best.select("user_id",
                       F.col("b.t").alias("mode_event_type"),
                       (-F.col("b.neg")).alias("mode_cnt"))


# -------------------------------------------------------- arg extremes

def q_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY with pinned tie semantics: per event type, the
    event carrying the highest and the lowest value. Bare
    ``max_by``/``arg_max`` is nondeterministic on value ties on BOTH
    engines, so the plan aggregates ``max(struct(value, event_id))`` —
    ties resolve to the larger id on the max side and the smaller id on
    the min side, the same total order in any engine.

    Scale shape: one map-side-combined aggregate over the fact scan; no
    window, no join."""
    ev = (load_events(spark, sf_dir)
          .where(F.col("value").isNotNull())
          .select("event_type", "value", "event_id"))
    mx = F.max(F.struct(F.col("value"), F.col("event_id")))
    mn = F.min(F.struct(F.col("value"), F.col("event_id")))
    return (ev.groupBy("event_type")
            .agg(mx.alias("mx"), mn.alias("mn"),
                 F.count(F.lit(1)).alias("n"))
            .select("event_type",
                    F.col("mx.value").alias("max_value"),
                    F.col("mx.event_id").alias("max_event_id"),
                    F.col("mn.value").alias("min_value"),
                    F.col("mn.event_id").alias("min_event_id"), "n"))


# -------------------------------------------------------------- Benford

def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed share of each
    leading digit vs the Benford expectation log10(1 + 1/d) — the
    classic fraud/synthetic-data screen.

    Exactness: the digit comes from the INTEGER part's string —
    ``CAST(FLOOR(x) AS BIGINT)`` then first character — because float
    log/pow digit extraction drifts at decade boundaries and
    double→string formatting differs across engines, while
    floor+int64+int-to-string is identical everywhere. Totals below 1
    are excluded (>= 1, not > 0): a (0, 1) total would floor to digit
    '0', where the expectation term 1/digit diverges between engines
    (Spark Divide yields NULL on a zero divisor, DuckDB IEEE yields
    Infinity) — Benford's law is only defined for leading digits 1-9
    anyway. One map-side-combined aggregate + a 1-row broadcast
    total."""
    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
    counts = (orders.where(F.col("o_totalprice") >= 1)
              .groupBy(digit.alias("digit"))
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    total = counts.agg(F.sum("n").alias("t"))
    return (counts.crossJoin(F.broadcast(total))
            .select("digit", "n",
                    F.round(F.col("n") / F.col("t"), 6).alias("share"),
                    F.round(F.log10(1 + 1 / F.col("digit").cast("double")),
                            6).alias("benford_expected"))
            .orderBy("digit"))


# ---------------------------------------------------- conditional aggs

DISC_HI = 0.05  # discount threshold for the conditional count
TAX_HI = 0.07   # tax threshold for the any-flag


def q_cond_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean aggregate surface — ``count_if``,
    ``bool_and`` (EVERY), ``bool_or`` (ANY) and a guarded conditional
    sum, per returnflag: the SQL:2023 filter-aggregate family a
    warehouse user expects as one-liners.

    Scale shape: one map-side-combined aggregate over the scan; every
    output is integer/boolean-exact (the conditional sum counts integer
    quantity units), no float seam anywhere."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax")
    return (li.groupBy("l_returnflag")
            .agg(F.count_if(F.col("l_discount") > DISC_HI)
                 .alias("n_discounted"),
                 F.bool_and(F.col("l_quantity") > 0).alias("all_qty_pos"),
                 F.bool_or(F.col("l_tax") > TAX_HI).alias("any_high_tax"),
                 F.sum(F.when(F.col("l_discount") > DISC_HI,
                              F.col("l_quantity")).otherwise(0))
                 .cast("long").alias("discounted_qty"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("l_returnflag"))


# ------------------------------------------------------- moving z-score

ZSCORE_WIN = 7   # trailing window length in days
ZSCORE_FLAG = 2.0


def q_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day z-score anomaly screen over the daily event-count
    series per event type: each full-window day is scored against its
    own trailing week (sample std), |z| > 2 flags.

    Scale shape: the fact table first reduces to the per-(type, day)
    count series — bounded by calendar horizon × #types by
    construction, the same series contract as q_resample_locf — then a
    BOUNDED-frame window (ROWS 6 PRECEDING) computes trailing integer
    sums (Σc, Σc²) per type. Mean/variance derive from those exact
    integers in one double expression each (n is the constant 7 after
    the full-window filter), so both engines evaluate identical IEEE
    arithmetic; 6-dp rounding pins the report."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", "event_date")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = (Window.partitionBy("event_type").orderBy("event_date")
         .rowsBetween(-(ZSCORE_WIN - 1), 0))
    scored = (daily
              .withColumn("nw", F.count(F.lit(1)).over(w))
              .withColumn("s1", F.sum("c").over(w))
              .withColumn("s2", F.sum(F.col("c") * F.col("c")).over(w))
              .where(F.col("nw") == ZSCORE_WIN))
    mean = F.col("s1") / F.lit(float(ZSCORE_WIN))
    var = ((F.col("s2") - F.col("s1").cast("double") * F.col("s1")
            / F.lit(float(ZSCORE_WIN))) / F.lit(float(ZSCORE_WIN - 1)))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (F.col("c") - mean) / std)
    return (scored
            .select("event_type", "event_date", "c",
                    F.round(mean, 6).alias("mean7"),
                    F.round(std, 6).alias("std7"),
                    F.round(z, 6).alias("z"),
                    (F.abs(F.coalesce(z, F.lit(0.0))) > ZSCORE_FLAG)
                    .alias("is_anomaly")))


# --------------------------------------------------------- null profile

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority"]


def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile of the orders table: per
    column, null count and distinct count — the first screen of any
    ingestion QA gate.

    Scale shape: one aggregate computes every column's stats in a
    single pass (distinct counts expand map-side via Spark's Expand —
    #cols × the scan, embarrassingly parallel, no per-column jobs);
    the 1-row wide result melts to (column, stats) rows through a
    literal array, so the long format costs nothing."""
    orders = load(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = orders.agg(*aggs)
    melted = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"{c}__nulls").alias("n_null"),
                 F.col(f"{c}__distinct").alias("n_distinct"))
        for c in PROFILE_COLS])).alias("s")
    return (wide.select(melted)
            .select("s.column", "s.n_null", "s.n_distinct"))


# --------------------------------------------------------- decile stats

DECILES = 10


def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer account-balance decile table: rank every customer by
    (balance, custkey), split into 10 equal-rank buckets with the
    explicit ``floor((rank−1)·10/n)+1`` formula, and report per-decile
    population, balance range and total (exact integer cents).

    Scale shape: the global rank is :func:`distributed_prefix`'s
    two-phase scan (a global NTILE window would single-task the whole
    table); n rides a 1-row broadcast; the decile rollup is one 10-key
    aggregate."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"))
    ranked = distributed_prefix(cust, ["c_acctbal", "c_custkey"], "rn")
    n = cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    decile = (F.floor((F.col("rn") - 1) * DECILES / F.col("n")) + 1)
    return (ranked.crossJoin(F.broadcast(n))
            .withColumn("decile", decile)
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.min("c_acctbal").alias("min_bal"),
                 F.max("c_acctbal").alias("max_bal"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("decile"))


# --------------------------------------------------------- hour entropy

def q_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's hour-of-day profile — how
    spread across the clock a behavior is (bots are flat ≈ ln 24,
    humans peak). Reported with the peak hour (deterministic argmax).

    Exactness: per-(type, hour) counts are exact integers; the ≤ 24
    (hour, count) pairs per type collect into ONE sorted array and the
    entropy folds over it with the ``aggregate`` higher-order function
    — a left fold in hour order, so BOTH engines (the oracle mirrors
    the ordered fold) add the identical IEEE terms in the identical
    sequence; 6-dp rounding pins the report. Scale shape: one
    map-side-combined groupBy, then a 24-element-bounded per-type
    collect — never a window, never a corpus-sized state."""
    hours = (load_events(spark, sf_dir)
             .groupBy("event_type", F.hour("ts").alias("h"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (hours.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("h", "c")))
                   .alias("a")))
    t = F.expr("aggregate(a, 0L, (acc, x) -> acc + x.c)")
    ent = F.expr(
        "aggregate(a, 0.0D, (acc, x) -> "
        "acc - (x.c / CAST(t AS DOUBLE)) * ln(x.c / CAST(t AS DOUBLE)))")
    peak = F.expr("array_min(transform(a, x -> struct(-x.c AS nc, "
                  "x.h AS h))).h")
    return (packed
            .withColumn("t", t)
            .select("event_type",
                    F.col("t").alias("n_events"),
                    F.round(ent, 6).alias("hour_entropy"),
                    peak.cast("long").alias("peak_hour")))


# ------------------------------------------------------ markov chains

def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (previous event type → next event type) pair, the transition count
    and conditional probability — the sequence model behind "what do
    users do after an error".

    Scale shape: the only window partitions by user_id — a
    HIGH-cardinality key (millions of partitions at scale, each a
    user's own short history; ties pinned by event_id so both engines
    see the same sequence); transition counts are one map-side-combined
    groupBy, and the per-source totals for the conditional probability
    are #event-types rows on a broadcast."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id",
                                           "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .where(F.col("prev_type").isNotNull())
             .groupBy("prev_type", F.col("event_type").alias("next_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (pairs.join(F.broadcast(totals), "prev_type")
            .select("prev_type", "next_type", "n",
                    F.round(F.col("n") / F.col("t"), 6).alias("p")))


# -------------------------------------------- first-touch attribution

def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every user attributed to the channel
    (event type) of their FIRST event; per channel, user count,
    purchasing-user count, purchase count and conversion rate — the
    marketing-analytics rollup.

    Scale shape: the first touch is ``min(struct(ts, event_id, type))``
    — a deterministic argmin computed map-side (no per-user window or
    sort); purchase stats aggregate on the same user_id key so AQE
    reuses the exchange; the channel rollup is #event-types rows."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id",
                                           "event_type")
    first = (ev.groupBy("user_id")
             .agg(F.min(F.struct("ts", "event_id", "event_type"))
                  .alias("ft")))
    buys = (ev.where(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_purch")))
    return (first.join(buys, "user_id", "left")
            .groupBy(F.col("ft.event_type").alias("first_touch"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.count("n_purch").cast("long").alias("n_buyers"),
                 F.coalesce(F.sum("n_purch"), F.lit(0)).cast("long")
                 .alias("n_purchases"))
            .withColumn("cvr", F.round(F.col("n_buyers")
                                       / F.col("n_users"), 6)))


# ---------------------------------------------------- name match (ER)

NAME_MAX_EDIT = 4  # Levenshtein threshold for a candidate name match


def q_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking join — the record-linkage counterpart
    of the dedup families: candidate part pairs whose NAMES are within
    ``NAME_MAX_EDIT`` Levenshtein edits, blocked on (brand, size) so
    comparison never goes all-pairs.

    Scale shape: the self-join is an EQUI-join on the blocking key
    (hash-partitioned) — but (brand, size) has FIXED cardinality
    (TPC-H: 25×50 blocks), so block population grows LINEARLY with
    data and the per-block O(block²) Levenshtein cost would grow
    quadratically with scale. The build side therefore runs through
    :func:`~..dedup._cap_hot_blocks` (``BLOCK_DF_CAP``): blocks hotter
    than the cap are dropped entirely (a pair needs both members in
    the same block, so the one-sided drop suppresses every pair of a
    hot block) and logged as the documented recall bound — at the cap,
    total comparisons are bounded at #blocks × cap²/2 regardless of
    data size. Levenshtein is an exact integer metric with identical
    semantics on both engines; the oracle applies the same QUALIFY
    block-df bound."""
    from .dedup import _cap_hot_blocks

    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                              "p_size", "p_name")
    # concat_ws with a separator: a bare concat would collide
    # ("Brand#1"+"15" == "Brand#11"+"5") and merge distinct blocks
    a = _cap_hot_blocks(
        part.select(F.concat_ws("|", "p_brand", "p_size").alias("blk"),
                    "p_brand", "p_size",
                    F.col("p_partkey").alias("key_a"),
                    F.col("p_name").alias("name_a")),
        "q_name_match").drop("blk")
    b = part.select("p_brand", "p_size",
                    F.col("p_partkey").alias("key_b"),
                    F.col("p_name").alias("name_b"))
    return (a.join(b, ["p_brand", "p_size"])
            .where(F.col("key_a") < F.col("key_b"))
            .withColumn("edit_dist",
                        F.levenshtein("name_a", "name_b").cast("long"))
            .where(F.col("edit_dist") <= NAME_MAX_EDIT)
            .select("p_brand", "p_size", "key_a", "key_b",
                    "name_a", "name_b", "edit_dist"))


# ----------------------------------------------------- embedding norms

NORM_BUCKETS_PER_UNIT = 4  # histogram granularity: buckets of width 0.25


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm histogram per label — the first QA screen of
    any vector corpus (collapsed or exploding norms flag a broken
    encoder or an unnormalized mix).

    Exactness: each norm folds over the vector with the ``aggregate``
    higher-order function in INDEX order — float→double promotion is
    exact and both engines add identical IEEE terms in identical
    sequence (the oracle mirrors the ordered fold), so sqrt and the
    bucket floor see bit-identical doubles. Scale shape: one codegen'd
    scan + a map-side-combined groupBy on (label, bucket); no shuffle
    of vectors anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.expr(
        "aggregate(embedding, 0.0D, "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    bucket = F.floor(F.col("norm") * NORM_BUCKETS_PER_UNIT).cast("long")
    return (emb.select("label", norm.alias("norm"))
            .groupBy("label", bucket.alias("norm_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.min("norm"), 6).alias("min_norm"),
                 F.round(F.max("norm"), 6).alias("max_norm")))


# --------------------------------------------------- day-of-week chi²

def q_dow_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity test of each event type's day-of-week
    profile — "is this behavior weekday-shaped?" as a single statistic
    (χ² against the uniform 1/7 expectation, 6 degrees of freedom).

    Exactness: observed counts are exact integers; the χ² terms fold
    over ONE sorted ≤ 7-element array per type (identical IEEE term
    order on both engines — the q_hour_entropy discipline), and
    day-of-week slots with zero observations contribute their
    (0−e)²/e = e in closed form via the missing-slot count. Scale
    shape: one map-side-combined groupBy, then a 7-element-bounded
    per-type collect."""
    dow = (F.dayofweek("ts") - 1).cast("long")  # 0 = Sunday, both engines
    counts = (load_events(spark, sf_dir)
              .groupBy("event_type", dow.alias("d"))
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (counts.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("d", "c")))
                   .alias("a")))
    t = F.expr("aggregate(a, 0L, (acc, x) -> acc + x.c)")
    e = F.col("t") / F.lit(7.0)
    # 7.0D: a bare 7.0 literal inside expr() parses as DECIMAL and
    # silently switches the whole term to decimal division semantics
    chi = F.expr(
        "aggregate(a, 0.0D, (acc, x) -> acc "
        "+ (x.c - t / 7.0D) * (x.c - t / 7.0D) / (t / 7.0D))")
    return (packed
            .withColumn("t", t)
            .select("event_type", F.col("t").alias("n_events"),
                    F.round(chi + (7 - F.size("a")) * e, 6)
                    .alias("chi2_dow")))


# ------------------------------------------------------- order backlog

def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order backlog — orders placed but not yet fully shipped,
    per day: the event-sourced running-balance shape (ledgers,
    inventory, WIP) computed as a cumulative sum of daily +placed
    −completed nets. An order completes on its LAST line's ship date.

    Scale shape: completion dates are one groupBy on l_orderkey (fact
    shuffle on a high-cardinality key); both event streams reduce to
    per-DAY nets (bounded by calendar horizon) before the cumulative
    sum, which runs as :func:`distributed_prefix`'s two-phase scan —
    no global window even on the bounded series, so the same plan
    holds if the "day" grain became milliseconds."""
    placed = (load(spark, sf_dir, "orders")
              .groupBy(F.to_date("o_orderdate").alias("day"))
              .agg(F.count(F.lit(1)).cast("long").alias("placed")))
    done = (load(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.max(F.to_date("l_shipdate")).alias("day"))
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("completed")))
    daily = (placed.join(done, "day", "full_outer")
             .select(F.col("day"),
                     F.coalesce("placed", F.lit(0)).alias("placed"),
                     F.coalesce("completed", F.lit(0)).alias("completed"))
             .withColumn("day_n", F.datediff(
                 "day", F.lit("1970-01-01").cast("date")).cast("long")))
    cum = distributed_prefix(daily, ["day_n"], "backlog",
                             value=F.col("placed") - F.col("completed"),
                             kind="sum")
    return cum.select("day", "placed", "completed", "backlog")

# --------------------------------------------------- log-odds terms

LOGODDS_ALPHA = 0.5   # Dirichlet smoothing pseudo-count
LOGODDS_TOP = 10      # distinctive terms reported per source
LOGODDS_MIN_C = 5     # noise floor: a term needs this many in-source uses


def q_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source — smoothed log-odds of each
    term's in-source vs rest-of-corpus rate (the "Fightin' Words"
    statistic, Monroe/Colaresi/Quinn 2008): the corpus-analysis answer
    to "which words characterize source X", more robust than raw
    TF-IDF contrast because the Dirichlet prior damps rare-term noise.

    Exactness: every score derives from four exact int64 counts of its
    own row plus broadcast totals — ln() of exact-rational doubles, no
    float accumulation anywhere; 6-dp rounding pins the report. Scale
    shape: token counting is the explode+map-side-combine shape of
    q_tfidf; the (source, token) ↔ token-total join shuffles on the
    content key; per-source totals broadcast (#sources rows); the
    top-K per source is a CONSTANT rank bound directly above its
    window, so Spark inserts Partial+Final WindowGroupLimit — never a
    full per-source sort."""
    toks = (load(spark, sf_dir, "documents")
            .select("source", F.explode(F.filter(
                F.split("text", " "), lambda x: x != "")).alias("tok")))
    # localCheckpoint the (source, token) count table: its THREE
    # consumers (token totals, per-source totals, the scored join)
    # would otherwise each re-run the corpus explode — per-branch
    # column pruning narrows each branch's aggregate output, so the
    # branch exchanges never canonicalize equal and exchange reuse
    # cannot fire. Per-invocation (persist's CacheManager would carry
    # the table across bench reps). Corpus tokenize passes: 3 → 1.
    cw_i = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("c_iw"))
            .localCheckpoint())
    cw = (cw_i.groupBy("tok").agg(F.sum("c_iw").alias("c_w")))
    n_i = (cw_i.groupBy("source").agg(F.sum("c_iw").alias("n_i")))
    tot = cw.agg(F.sum("c_w").alias("n"),
                 F.count(F.lit(1)).cast("long").alias("v"))
    a = float(LOGODDS_ALPHA)
    scored = (cw_i.join(cw, "tok")
              .join(F.broadcast(n_i), "source")
              .crossJoin(F.broadcast(tot))
              .where(F.col("c_iw") >= LOGODDS_MIN_C)
              .withColumn("rest_c", F.col("c_w") - F.col("c_iw"))
              .withColumn("rest_n", F.col("n") - F.col("n_i"))
              .withColumn("score", F.round(
                  F.log((F.col("c_iw") + a)
                        / (F.col("n_i") + a * F.col("v")
                           - F.col("c_iw") - a))
                  - F.log((F.col("rest_c") + a)
                          / (F.col("rest_n") + a * F.col("v")
                             - F.col("rest_c") - a)), 6)))
    w = Window.partitionBy("source").orderBy(F.desc("score"), "tok")
    return (scored
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= LOGODDS_TOP)
            .select("source", "tok", "c_iw", "score",
                    F.col("rn").cast("long").alias("rank")))


# ------------------------------------------------------- burstiness

def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of each event type's daily
    count series — the burstiness statistic separating steady
    machine-like traffic (F ≈ 1, Poisson) from bursty human/incident
    traffic (F ≫ 1).

    Exactness: daily counts are exact integers, the sample variance
    comes from the closed form (n·Σx² − (Σx)²)/(n(n−1)) on int64 sums,
    and the two divisions happen once in double — identical IEEE on
    both engines, 6-dp rounded. Scale shape: two map-side-combined
    aggregates; the per-type series is bounded by calendar horizon."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", "event_date")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    g = (daily.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("c").alias("s1"),
              F.sum(F.col("c") * F.col("c")).alias("s2")))
    var = ((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
           / (F.col("n").cast("double") * (F.col("n") - 1)))
    mean = F.col("s1") / F.col("n").cast("double")
    return g.select("event_type", "n", F.col("s1").alias("n_events"),
                    F.round(mean, 6).alias("mean_daily"),
                    F.round(var, 6).alias("var_daily"),
                    F.round(var / mean, 6).alias("fano"))


# ---------------------------------------------------- keyword trend

TREND_MIN_C = 3   # a token needs this many uses in the latest week
TREND_TOP = 20    # risers reported


def q_keyword_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week trending terms: tokens whose latest-week count
    grew most against the prior week — the "what's new in the corpus"
    monitor of any ingestion pipeline. Documents are assigned to weeks
    by doc_id modulo (the synthetic corpus carries no timestamps; the
    plan is the real one — swap the week expression for a date_trunc
    on a dated corpus).

    Exactness: counts are exact integers; the growth ratio divides two
    smoothed ints once (6-dp rounded); top-K is a total order on
    (ratio DESC, token). Scale shape: one explode+groupBy on (token,
    week); the week-over-week pairing is a self-join on the token
    content key (never a window over the vocabulary); the final top-K
    is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    week = (F.col("doc_id") % 2).cast("long")  # 0 = prior, 1 = latest
    counts = (docs.select(week.alias("wk"), F.explode(F.filter(
                  F.split("text", " "), lambda x: x != "")).alias("tok"))
              .groupBy("tok", "wk")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    latest = (counts.where(F.col("wk") == 1)
              .select("tok", F.col("c").alias("c_now")))
    prior = (counts.where(F.col("wk") == 0)
             .select("tok", F.col("c").alias("c_prev")))
    return (latest.join(prior, "tok", "left")
            .where(F.col("c_now") >= TREND_MIN_C)
            .withColumn("c_prev", F.coalesce("c_prev", F.lit(0)))
            .withColumn("growth", F.round(
                (F.col("c_now") + 1) / (F.col("c_prev") + 1), 6))
            .orderBy(F.desc("growth"), "tok")
            .limit(TREND_TOP)
            .select("tok", "c_now", "c_prev", "growth"))


# ----------------------------------------------------- type overlap

def q_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: Jaccard similarity of the
    USER sets of every type pair — "do clickers also purchase?" as a
    matrix, the segmentation-sanity screen.

    Exactness: all three terms are exact distinct-user counts. Scale
    shape: the corpus reduces to DISTINCT (user, type) first; the pair
    expansion is a self-join on user_id (fan-out bounded at
    C(#types, 2) per user); per-type set sizes ride a broadcast.
    Never an all-pairs product, never a collected set."""
    # localCheckpoint the bounded DISTINCT (user, type) spine (≤ #users
    # × #types rows): its three consumers (both self-join sides and
    # the per-type size aggregate) would otherwise each re-run the
    # events scan + distinct — the sizes branch's pruned aggregate
    # output keeps the exchanges from canonicalizing equal, so reuse
    # cannot fire. Per-invocation. Events scans: 3 → 1.
    ut = (load_events(spark, sf_dir)
          .select("user_id", "event_type").distinct()
          .localCheckpoint())
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (a.join(b, "user_id")
            .where(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    sizes = (ut.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (both
            .join(F.broadcast(sizes.select(
                F.col("event_type").alias("type_a"),
                F.col("n").alias("n_a"))), "type_a")
            .join(F.broadcast(sizes.select(
                F.col("event_type").alias("type_b"),
                F.col("n").alias("n_b"))), "type_b")
            .select("type_a", "type_b", "n_a", "n_b", "n_both",
                    F.round(F.col("n_both")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_both")), 6).alias("jaccard")))

QUERIES = {
    "q_log_odds_terms": q_log_odds_terms,
    "q_burstiness": q_burstiness,
    "q_keyword_trend": q_keyword_trend,
    "q_type_overlap": q_type_overlap,
    "q_markov_transitions": q_markov_transitions,
    "q_first_touch": q_first_touch,
    "q_name_match": q_name_match,
    "q_embedding_norms": q_embedding_norms,
    "q_dow_chisq": q_dow_chisq,
    "q_order_backlog": q_order_backlog,
    "q_abc_analysis": q_abc_analysis,
    "q_gini": q_gini,
    "q_market_basket": q_market_basket,
    "q_rfm": q_rfm,
    "q_mode": q_mode,
    "q_arg_extremes": q_arg_extremes,
    "q_benford": q_benford,
    "q_cond_aggs": q_cond_aggs,
    "q_moving_zscore": q_moving_zscore,
    "q_null_profile": q_null_profile,
    "q_decile_stats": q_decile_stats,
    "q_hour_entropy": q_hour_entropy,
}

ORACLES = {
    "q_log_odds_terms": (
        "WITH t AS (SELECT source, UNNEST(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
        "ci AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_iw "
        "FROM t GROUP BY 1, 2), "
        "cw AS (SELECT tok, CAST(SUM(c_iw) AS BIGINT) AS c_w FROM ci "
        "GROUP BY tok), "
        "ni AS (SELECT source, CAST(SUM(c_iw) AS BIGINT) AS n_i FROM ci "
        "GROUP BY source), "
        "tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS v FROM cw), "
        "sc AS (SELECT ci.source, ci.tok, c_iw, "
        "ROUND(LN((c_iw + 0.5) / (n_i + 0.5 * v - c_iw - 0.5)) "
        "- LN((c_w - c_iw + 0.5) / "
        "((n - n_i) + 0.5 * v - (c_w - c_iw) - 0.5)), 6) AS score "
        "FROM ci JOIN cw USING (tok) JOIN ni ON ci.source = ni.source "
        "CROSS JOIN tot WHERE c_iw >= 5), "
        "r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "ORDER BY score DESC, tok) AS BIGINT) AS rank FROM sc) "
        "SELECT source, tok, c_iw, score, rank FROM r WHERE rank <= 10"),
    "q_burstiness": (
        "WITH daily AS (SELECT event_type, "
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2 "
        "FROM daily GROUP BY event_type) "
        "SELECT event_type, n, s1 AS n_events, "
        "ROUND(s1 / CAST(n AS DOUBLE), 6) AS mean_daily, "
        "ROUND((n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1)), 6) "
        "AS var_daily, "
        "ROUND(((n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1))) "
        "/ (s1 / CAST(n AS DOUBLE)), 6) AS fano FROM g"),
    "q_keyword_trend": (
        "WITH c AS (SELECT doc_id % 2 AS wk, UNNEST(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
        "cnt AS (SELECT tok, wk, CAST(COUNT(*) AS BIGINT) AS c FROM c "
        "GROUP BY 1, 2), "
        "l AS (SELECT tok, c AS c_now FROM cnt WHERE wk = 1), "
        "p AS (SELECT tok, c AS c_prev FROM cnt WHERE wk = 0) "
        "SELECT l.tok, c_now, COALESCE(c_prev, 0) AS c_prev, "
        "ROUND((c_now + 1) / (CAST(COALESCE(c_prev, 0) AS DOUBLE) + 1), "
        "6) AS growth FROM l LEFT JOIN p ON l.tok = p.tok "
        "WHERE c_now >= 3 "
        "ORDER BY growth DESC, l.tok LIMIT 20"),
    "q_type_overlap": (
        "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
        "b AS (SELECT a.event_type AS type_a, c.event_type AS type_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_both FROM ut a "
        "JOIN ut c ON a.user_id = c.user_id "
        "AND a.event_type < c.event_type GROUP BY 1, 2), "
        "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM ut GROUP BY event_type) "
        "SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both, "
        "ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) "
        "AS jaccard FROM b JOIN s sa ON b.type_a = sa.event_type "
        "JOIN s sb ON b.type_b = sb.event_type"),
    "q_markov_transitions": (
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "
        "event_id, event_type FROM events), "
        "p AS (SELECT LAG(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev_type, event_type AS next_type "
        "FROM e), "
        "c AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) "
        "AS n FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
        "t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t FROM c "
        "GROUP BY prev_type) "
        "SELECT c.prev_type, next_type, n, "
        "ROUND(CAST(n AS DOUBLE) / t, 6) AS p "
        "FROM c JOIN t ON c.prev_type = t.prev_type"),
    "q_first_touch": (
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "
        "event_id, event_type FROM events), "
        "ft AS (SELECT user_id, event_type AS first_touch FROM "
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id, event_type) AS rn FROM e) WHERE rn = 1), "
        "b AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purch "
        "FROM e WHERE event_type = 'purchase' GROUP BY user_id) "
        "SELECT first_touch, CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(COUNT(n_purch) AS BIGINT) AS n_buyers, "
        "CAST(COALESCE(SUM(n_purch), 0) AS BIGINT) AS n_purchases, "
        "ROUND(CAST(COUNT(n_purch) AS DOUBLE) / COUNT(*), 6) AS cvr "
        "FROM ft LEFT JOIN b USING (user_id) GROUP BY first_touch"),
    "q_name_match": (
        # the capped CTE mirrors _cap_hot_blocks on the build side; a
        # pair needs both members in one block, so capping one relation
        # of the self-join == excluding hot blocks entirely
        "WITH p AS (SELECT * FROM part QUALIFY count(*) OVER "
        f"(PARTITION BY p_brand, p_size) <= {BLOCK_DF_CAP}) "
        "SELECT a.p_brand, a.p_size, a.p_partkey AS key_a, "
        "b.p_partkey AS key_b, a.p_name AS name_a, b.p_name AS name_b, "
        "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist "
        "FROM p a JOIN p b "
        "ON a.p_brand = b.p_brand AND a.p_size = b.p_size "
        "AND a.p_partkey < b.p_partkey "
        f"WHERE levenshtein(a.p_name, b.p_name) <= 4"),
    "q_embedding_norms": (
        # the norm fold mirrors Spark's aggregate() HOF: index order,
        # left fold from 0.0, float->double promoted terms
        "WITH n AS (SELECT label, SQRT(LIST_REDUCE(LIST_PREPEND(0.0, "
        "LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) "
        "* CAST(x AS DOUBLE))), (acc, e) -> acc + e)) AS norm "
        "FROM embeddings) "
        f"SELECT label, CAST(FLOOR(norm * 4) AS BIGINT) "
        "AS norm_bucket, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(MIN(norm), 6) AS min_norm, ROUND(MAX(norm), 6) "
        "AS max_norm FROM n GROUP BY label, norm_bucket"),
    "q_dow_chisq": (
        "WITH dc AS (SELECT event_type, CAST(EXTRACT(dow FROM "
        "CAST(ts AS TIMESTAMP)) AS BIGINT) AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "p AS (SELECT event_type, LIST(struct_pack(d := d, c := c) "
        "ORDER BY d) AS a, CAST(SUM(c) AS BIGINT) AS t FROM dc "
        "GROUP BY event_type) "
        "SELECT event_type, t AS n_events, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(a, x -> "
        "(x.c - t / 7.0) * (x.c - t / 7.0) / (t / 7.0))), "
        "(acc, e) -> acc + e) + (7 - LEN(a)) * (t / 7.0), 6) "
        "AS chi2_dow FROM p"),
    "q_order_backlog": (
        "WITH placed AS (SELECT CAST(o_orderdate AS DATE) AS day, "
        "CAST(COUNT(*) AS BIGINT) AS placed FROM orders GROUP BY 1), "
        "done AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS completed "
        "FROM (SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS day "
        "FROM lineitem GROUP BY l_orderkey) GROUP BY day), "
        "daily AS (SELECT COALESCE(placed.day, done.day) AS day, "
        "COALESCE(placed, 0) AS placed, COALESCE(completed, 0) "
        "AS completed FROM placed FULL OUTER JOIN done "
        "ON placed.day = done.day) "
        "SELECT day, placed, completed, "
        "CAST(SUM(placed - completed) OVER (ORDER BY day "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog FROM daily"),
    "q_abc_analysis": (
        "WITH pv AS (SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) "
        "AS v FROM lineitem GROUP BY l_partkey), "
        "c AS (SELECT l_partkey, v, SUM(v) OVER "
        "(ORDER BY v DESC, l_partkey ROWS UNBOUNDED PRECEDING) AS cum "
        "FROM pv), t AS (SELECT SUM(v) AS t FROM pv) "
        f"SELECT CASE WHEN cum * 100 <= t * {ABC_A_PCT} THEN 'A' "
        f"WHEN cum * 100 <= t * {ABC_B_PCT} THEN 'B' ELSE 'C' END "
        "AS abc_class, COUNT(*) AS n_parts, CAST(SUM(v) AS BIGINT) AS volume, "
        "ROUND(CAST(SUM(v) AS DOUBLE) / MAX(t), 6) AS share "
        "FROM c CROSS JOIN t GROUP BY 1 ORDER BY abc_class"),
    "q_gini": (
        "WITH x AS (SELECT c_mktsegment, c_custkey, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment, c_custkey), "
        "r AS (SELECT c_mktsegment, x, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY c_mktsegment ORDER BY x, c_custkey) AS BIGINT) "
        "AS i FROM x) "
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS n_orders, "
        "ROUND((2 * SUM(i * x)) / (CAST(COUNT(*) AS DOUBLE) * SUM(x)) "
        "- CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini "
        "FROM r GROUP BY c_mktsegment"),
    "q_market_basket": (
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey "
        "FROM lineitem) "
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "COUNT(*) AS support FROM items a "
        "JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY part_a, part_b "
        f"ORDER BY support DESC, part_a, part_b LIMIT {BASKET_TOP}"),
    "q_rfm": (
        "WITH o AS (SELECT o_custkey, o_orderdate, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders), "
        "now AS (SELECT MAX(o_orderdate) AS now FROM o), "
        "pc AS (SELECT o_custkey, "
        "CAST(DATEDIFF('day', MAX(o_orderdate), (SELECT now FROM now)) "
        "AS BIGINT) AS r, CAST(COUNT(*) AS BIGINT) AS f, "
        "SUM(cents) AS m FROM o GROUP BY o_custkey), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc), "
        "st AS (SELECT o_custkey, 'r' AS metric, r AS v FROM pc "
        "UNION ALL SELECT o_custkey, 'f', f FROM pc "
        "UNION ALL SELECT o_custkey, 'm', m FROM pc), "
        "rk AS (SELECT o_custkey, metric, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY metric ORDER BY v, o_custkey) AS BIGINT) AS rn "
        "FROM st), "
        f"sc AS (SELECT o_custkey, metric, CAST(FLOOR((rn - 1) * {RFM_K}"
        " / (SELECT n FROM n)) + 1 AS BIGINT) AS score FROM rk), "
        "g AS (SELECT o_custkey, "
        "MAX(CASE WHEN metric = 'r' THEN score END) AS r_score, "
        "MAX(CASE WHEN metric = 'f' THEN score END) AS f_score, "
        "MAX(CASE WHEN metric = 'm' THEN score END) AS m_score "
        "FROM sc GROUP BY o_custkey) "
        "SELECT r_score, f_score, m_score, COUNT(*) AS n_customers "
        "FROM g GROUP BY r_score, f_score, m_score"),
    "q_mode": (
        "WITH c AS (SELECT user_id, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events "
        "GROUP BY user_id, event_type), "
        "r AS (SELECT user_id, event_type, cnt, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn "
        "FROM c) "
        "SELECT user_id, event_type AS mode_event_type, "
        "cnt AS mode_cnt FROM r WHERE rn = 1"),
    "q_arg_extremes": (
        "WITH e AS (SELECT event_type, value, event_id FROM events "
        "WHERE value IS NOT NULL), "
        "mx AS (SELECT event_type, value, event_id FROM "
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id DESC) AS rn FROM e) WHERE rn = 1), "
        "mn AS (SELECT event_type, value, event_id FROM "
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY value ASC, event_id ASC) AS rn FROM e) WHERE rn = 1), "
        "n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1) "
        "SELECT n.event_type, mx.value AS max_value, "
        "mx.event_id AS max_event_id, mn.value AS min_value, "
        "mn.event_id AS min_event_id, n.n FROM n "
        "JOIN mx ON n.event_type = mx.event_type "
        "JOIN mn ON n.event_type = mn.event_type"),
    "q_benford": (
        "WITH d AS (SELECT SUBSTRING(CAST(CAST(FLOOR(o_totalprice) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders "
        "WHERE o_totalprice >= 1), "
        "c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d "
        "GROUP BY digit), t AS (SELECT SUM(n) AS t FROM c) "
        "SELECT digit, n, ROUND(CAST(n AS DOUBLE) / t, 6) AS share, "
        "ROUND(LOG10(1 + 1 / CAST(digit AS DOUBLE)), 6) "
        "AS benford_expected FROM c CROSS JOIN t ORDER BY digit"),
    "q_cond_aggs": (
        "SELECT l_returnflag, "
        f"CAST(COUNT(*) FILTER (WHERE l_discount > {DISC_HI}) AS BIGINT) "
        "AS n_discounted, "
        "BOOL_AND(l_quantity > 0) AS all_qty_pos, "
        f"BOOL_OR(l_tax > {TAX_HI}) AS any_high_tax, "
        f"CAST(SUM(CASE WHEN l_discount > {DISC_HI} THEN l_quantity "
        "ELSE 0 END) AS BIGINT) AS discounted_qty, "
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag "
        "ORDER BY l_returnflag"),
    "q_moving_zscore": (
        "WITH daily AS (SELECT event_type, "
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "w AS (SELECT event_type, event_date, c, "
        "COUNT(*) OVER tw AS nw, SUM(c) OVER tw AS s1, "
        "SUM(c * c) OVER tw AS s2 FROM daily "
        "WINDOW tw AS (PARTITION BY event_type ORDER BY event_date "
        "ROWS 6 PRECEDING)) "
        "SELECT event_type, event_date, c, "
        "ROUND(s1 / 7.0, 6) AS mean7, "
        "ROUND(SQRT(GREATEST((s2 - CAST(s1 AS DOUBLE) * s1 / 7.0) "
        "/ 6.0, 0.0)), 6) AS std7, "
        "ROUND(CASE WHEN (s2 - CAST(s1 AS DOUBLE) * s1 / 7.0) / 6.0 > 0 "
        "THEN (c - s1 / 7.0) / SQRT((s2 - CAST(s1 AS DOUBLE) * s1 "
        "/ 7.0) / 6.0) END, 6) AS z, "
        "COALESCE(ABS(CASE WHEN (s2 - CAST(s1 AS DOUBLE) * s1 / 7.0) "
        "/ 6.0 > 0 THEN (c - s1 / 7.0) / SQRT((s2 - CAST(s1 AS DOUBLE) "
        "* s1 / 7.0) / 6.0) END) > 2.0, FALSE) AS is_anomaly "
        "FROM w WHERE nw = 7"),
    "q_null_profile": " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
        for c in PROFILE_COLS),
    "q_decile_stats": (
        "WITH c AS (SELECT c_custkey, c_acctbal, "
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer), "
        "r AS (SELECT *, CAST(ROW_NUMBER() OVER "
        "(ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn FROM c), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c) "
        f"SELECT CAST(FLOOR((rn - 1) * {DECILES} / (SELECT n FROM n)) "
        "+ 1 AS BIGINT) AS decile, COUNT(*) AS n_customers, "
        "MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal, "
        "CAST(SUM(cents) AS BIGINT) AS total_cents FROM r GROUP BY 1 ORDER BY decile"),
    "q_hour_entropy": (
        # the entropy fold mirrors Spark's aggregate() HOF: terms in
        # hour order, left fold from 0.0 — identical IEEE sequence
        "WITH hc AS (SELECT event_type, "
        "CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS h, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "p AS (SELECT event_type, "
        "LIST(struct_pack(h := h, c := c) ORDER BY h) AS a, "
        "CAST(SUM(c) AS BIGINT) AS t FROM hc GROUP BY event_type), "
        "pk AS (SELECT event_type, h AS peak_hour FROM "
        "(SELECT event_type, h, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY c DESC, h) AS rn FROM hc) "
        "WHERE rn = 1) "
        "SELECT p.event_type, t AS n_events, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(a, x -> "
        "-(x.c / CAST(t AS DOUBLE)) * LN(x.c / CAST(t AS DOUBLE)))), "
        "(acc, e) -> acc + e), 6) AS hour_entropy, pk.peak_hour "
        "FROM p JOIN pk ON p.event_type = pk.event_type"),
}
