"""Time-series / growth / corpus-statistics operators (round-11 §2.D
extension family): cohort retention, event paths, EWMA smoothing,
autocorrelation, higher moments, YoY growth, PSI drift, a two-sample KS
test, target encoding, seasonality indices, and the Zipf/Heaps/hapax/
readability corpus screens a training-data pipeline runs per ingest.

Exactness discipline (package-wide rules, see ``insights.py``):

- counts/sums aggregate as exact integers (money in cents, value in
  e2/e4 fixed-point) so parallel-aggregation order can't change a bit;
- float formulas are written ONCE as fully-parenthesized SQL fragments
  shared verbatim by the Spark plan and the DuckDB oracle, evaluated on
  exact integer inputs — identical IEEE expression trees on both
  engines;
- float SUMS over per-group series fold a single sorted array
  (``aggregate(sort_array(collect_list(...)), ...)`` == DuckDB
  ``LIST_REDUCE(LIST_PREPEND(...), ...)``) so IEEE addition order is
  identical; every such series is bounded by construction (calendar
  days × #types, top-K ranks, 10 histogram bins);
- ranks/prefix sums over unbounded inputs go through
  :func:`..common.distributed_prefix`, never a global/tiny-key window;
  the only raw windows are keyed on high-cardinality ids (user_id) or
  sit above an aggregate with a constant rank bound (WindowGroupLimit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import distributed_prefix, load, load_events

# ------------------------------------------------------ cohort retention


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: customers bucketed by first-order month,
    counted as active at each month-age — the triangle behind every
    retention curve.

    Scale shape: first-order month is one groupBy(custkey); the join
    back to orders is an equi-join on custkey (hash-partitioned, both
    sides fact-sized); month arithmetic is exact integers
    (year*12+month), so age buckets agree bit-for-bit; the final
    (cohort, age) aggregate output is calendar-bounded (~80×80)."""
    o = (load(spark, sf_dir, "orders")
         .select("o_custkey", F.to_date("o_orderdate").alias("od")))
    first = o.groupBy("o_custkey").agg(F.min("od").alias("fd"))
    ms = F.year("od") * 12 + F.month("od")
    fms = F.year("fd") * 12 + F.month("fd")
    return (o.join(first, "o_custkey")
            .groupBy(F.trunc("fd", "month").alias("cohort_month"),
                     (ms - fms).cast("long").alias("age_months"))
            .agg(F.count_distinct("o_custkey").alias("n_active")))


# ----------------------------------------------------------- event paths

PATH_LEN = 3    # journey prefix length
PATH_TOP = 20   # paths reported


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: each user's first ``PATH_LEN`` event
    types joined with '>', counted, top ``PATH_TOP`` — the path-analysis
    slice behind funnel/Sankey views.

    Scale shape: the per-user rank is a window keyed on user_id (data-
    sized key domain, NOT a tiny column) with a constant rank bound, so
    it plans as Partial+Final WindowGroupLimit — each task keeps ≤
    PATH_LEN rows per user before the shuffle; the per-user path is a
    ≤ PATH_LEN-element sorted collect; the final top-K is
    TakeOrderedAndProject on (n_users DESC, path), a per-partition
    heap. Tie-break (ts, event_id, event_type) is a total order."""
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "event_id", "event_type"))
    firsts = (load_events(spark, sf_dir)
              .select("user_id", "ts", "event_id", "event_type")
              .withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= PATH_LEN))
    paths = (firsts.groupBy("user_id")
             .agg(F.concat_ws(
                 ">",
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("rn", "event_type"))),
                     lambda x: x["event_type"])).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy(F.desc("n_users"), "path")
            .limit(PATH_TOP))


# ------------------------------------------------------------------ EWMA

EWMA_ALPHA = "0.3"          # smoothing factor, as the literal both
EWMA_BETA = "0.7"           # engines parse (1 - alpha)


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each event type's daily
    count (alpha=0.3, recursive form e_i = a·x_i + (1-a)·e_{i-1},
    e_0 = x_0) — the standard smoothed-trend line.

    Scale shape + exactness: daily counts are one map-side-combined
    aggregate; the recursion folds ONE sorted per-type array bounded by
    the calendar (#days), re-folding the prefix per output row —
    O(days²) on per-type scalars, not data rows. Both engines run the
    identical left fold (Spark ``aggregate`` == DuckDB ``LIST_REDUCE``
    with a prepended init), so every intermediate double matches
    bit-for-bit; counts are exact ints."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("d", "c")))
                   .alias("a")))
    # Spark transform index i is 0-based: slice(a, 2, i) folds elements
    # 1..i (0-based) over the init a[0].c — i=0 folds nothing
    series = F.expr(
        "transform(a, (x, i) -> struct(x.d AS d, x.c AS c, "
        "round(aggregate(slice(a, 2, i), CAST(a[0].c AS DOUBLE), "
        f"(acc, y) -> {EWMA_ALPHA}D * CAST(y.c AS DOUBLE) "
        f"+ {EWMA_BETA}D * acc), 6) AS ewma))")
    return (packed.select("event_type", F.explode(series).alias("s"))
            .select("event_type", F.col("s.d").alias("day"),
                    F.col("s.c").alias("c"), F.col("s.ewma").alias("ewma")))


# ---------------------------------------------------- lag-1 autocorrelation


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily-count series —
    the one-number "is this metric momentum-driven or noise" screen.

    Exactness: the mean comes from exact integer (sum, n); deviations,
    the lag-1 cross products, and the squared sums fold the SAME sorted
    calendar-bounded array left-to-right on both engines (the struct-
    accumulator carry trick for the lagged product), so every IEEE
    term and addition order matches. Denominator-zero series (constant
    counts) are filtered identically on both sides."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("d", "c")))
                   .alias("a")))
    mean = "(CAST(aggregate(a, 0L, (acc, x) -> acc + x.c) AS DOUBLE)" \
           " / size(a))"
    devs = f"transform(a, x -> CAST(x.c AS DOUBLE) - {mean})"
    # lag-1 cross products via a struct accumulator: carry the previous
    # deviation while summing prev*cur — one left fold, no index needed
    num = (f"aggregate(slice({devs}, 2, size(a) - 1), "
           f"named_struct('dev', element_at({devs}, 1), 's', 0.0D), "
           "(acc, x) -> named_struct('dev', x, 's', acc.s + acc.dev * x),"
           " acc -> acc.s)")
    den = f"aggregate({devs}, 0.0D, (acc, x) -> acc + x * x)"
    return (packed
            .withColumn("n_days", F.expr("size(a)").cast("long"))
            .withColumn("_num", F.expr(num))
            .withColumn("_den", F.expr(den))
            .where(F.col("_den") != 0)
            .select("event_type", "n_days",
                    F.round(F.col("_num") / F.col("_den"), 6)
                    .alias("autocorr_lag1")))


# -------------------------------------------------------- higher moments

# Shared float fragments evaluated on exact integer aggregates — the
# SAME string is parsed by Spark and DuckDB, so the IEEE expression
# trees are identical. Integer literals (3, not 3.0) promote to double
# against the double operands on both engines without a decimal detour.
_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_M2 = f"((CAST(s2 AS DOUBLE) / n) - ({_MEAN} * {_MEAN}))"
_M3 = (f"(((CAST(s3 AS DOUBLE) / n) - ((3 * {_MEAN}) * "
       f"(CAST(s2 AS DOUBLE) / n))) + (((2 * {_MEAN}) * {_MEAN}) * "
       f"{_MEAN}))")
_M4 = (f"((((CAST(s4 AS DOUBLE) / n) - ((4 * {_MEAN}) * "
       f"(CAST(s3 AS DOUBLE) / n))) + (((6 * ({_MEAN} * {_MEAN})) * "
       f"(CAST(s2 AS DOUBLE) / n)))) - (((3 * ({_MEAN} * {_MEAN})) * "
       f"({_MEAN} * {_MEAN}))))")
_SKEW = f"round({_M3} / ({_M2} * sqrt({_M2})), 6)"
_KURT = f"round(({_M4} / ({_M2} * {_M2})) - 3, 6)"


def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of order quantities per
    returnflag, from raw integer power sums — the distribution-shape
    profile (built-in ``skewness``/``kurtosis`` are NOT used: engines
    disagree on sample-vs-population corrections, and float power sums
    are accumulation-order-dependent; int64 power sums are exact).

    Scale shape: one map-side-combined aggregate — quantities are ≤ 50,
    so q⁴ ≤ 6.25e6 and the int64 sums hold to ~SF 1000."""
    q = F.col("l_quantity").cast("long")
    agg = (load(spark, sf_dir, "lineitem")
           .select(F.col("l_returnflag"), q.alias("q"))
           .groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("q").alias("s1"),
                F.sum(F.expr("q * q")).alias("s2"),
                F.sum(F.expr("q * q * q")).alias("s3"),
                F.sum(F.expr("q * q * q * q")).alias("s4")))
    return agg.selectExpr("l_returnflag", "n",
                          f"round({_MEAN}, 6) AS mean_qty",
                          f"{_SKEW} AS skewness_qty",
                          f"{_KURT} AS kurtosis_qty")


# ------------------------------------------------------------ YoY growth


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per month: each month's order
    revenue against the same month one year earlier.

    Scale shape: revenue per month is one map-side-combined aggregate
    in exact cents; the YoY pairing is a BROADCAST equi-join of the
    calendar-bounded month table with itself on an integer months-
    since-epoch key (no window, no shuffle of the fact side twice)."""
    o = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    monthly = (o.groupBy(F.trunc("od", "month").alias("month"),
                         (F.year("od") * 12 + F.month("od")).alias("ms"))
               .agg(F.sum("cents").alias("rev_cents")))
    prev = monthly.select(F.col("ms").alias("pms"),
                          F.col("rev_cents").alias("prev_cents"))
    return (monthly.join(F.broadcast(prev),
                         monthly["ms"] == prev["pms"] + 12)
            .select("month", "rev_cents", "prev_cents",
                    F.round(F.col("rev_cents").cast("double")
                            / F.col("prev_cents") - 1, 6).alias("yoy")))


# ------------------------------------------------------------- PSI drift

PSI_BINS = 10       # fixed-width value bins
PSI_BIN_WIDTH = 50  # events.value spans ~[0, 500]


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each event type's value
    distribution, first half of the time range vs second — the standard
    drift monitor for a feature/score column.

    Exactness: bins are fixed-width on exact comparisons; counts are
    exact ints; Laplace smoothing ((c+1)/(n+B)) removes the zero-bin
    log divergence; all 10 bins are materialized per type (explode of a
    literal sequence) so absent bins contribute their smoothed term
    identically on both engines; the PSI sum folds one sorted
    10-element array. Scale shape: one scan + a 1-row broadcast for the
    midpoint date; everything after the (type, bin, period) aggregate
    is bounded at #types × #bins rows."""
    e = load_events(spark, sf_dir).select("event_type", "event_date",
                                          "value")
    mid = e.agg(F.date_add(
        F.min("event_date"),
        F.floor(F.datediff(F.max("event_date"), F.min("event_date")) / 2)
        .cast("int")).alias("mid"))
    bucket = F.least(F.lit(PSI_BINS - 1), F.greatest(F.lit(0), F.floor(
        F.col("value") / PSI_BIN_WIDTH))).cast("long")
    # localCheckpoint the ≤ #types × #bins count table: its two
    # consumers (per-type totals and the bin-grid join) would otherwise
    # each re-run the corpus scan + aggregate below its exchange —
    # per-branch pruning (the totals branch drops b from its copy's
    # aggregate output) keeps the exchanges from canonicalizing equal,
    # so reuse cannot fire. Per-invocation. Corpus passes: 2 → 1
    # (plus the min/max midpoint probe, a narrow date-column scan).
    counts = (e.crossJoin(F.broadcast(mid))
              .groupBy("event_type", bucket.alias("b"))
              .agg(F.sum((F.col("event_date") <= F.col("mid"))
                         .cast("long")).alias("ca"),
                   F.sum((F.col("event_date") > F.col("mid"))
                         .cast("long")).alias("cb"))
              .localCheckpoint())
    totals = (counts.groupBy("event_type")
              .agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
                   F.collect_list(F.struct("b", "ca", "cb")).alias("pre")))
    # materialize all PSI_BINS bins: absent ones carry (c=0) smoothed mass
    grid = totals.select(
        "event_type", "na", "nb",
        F.explode(F.sequence(F.lit(0), F.lit(PSI_BINS - 1))).alias("b"))
    filled = (grid.join(
        counts.select("event_type", F.col("b").cast("int").alias("b"),
                      "ca", "cb"),
        ["event_type", "b"], "left")
        .select("event_type", "na", "nb", "b",
                F.coalesce("ca", F.lit(0)).alias("ca"),
                F.coalesce("cb", F.lit(0)).alias("cb")))
    term = (f"((((ca + 1) / CAST(na + {PSI_BINS} AS DOUBLE)) - "
            f"((cb + 1) / CAST(nb + {PSI_BINS} AS DOUBLE))) * "
            f"ln(((ca + 1) / CAST(na + {PSI_BINS} AS DOUBLE)) / "
            f"((cb + 1) / CAST(nb + {PSI_BINS} AS DOUBLE))))")
    packed = (filled.withColumn("t", F.expr(term))
              .groupBy("event_type", "na", "nb")
              .agg(F.sort_array(F.collect_list(F.struct("b", "t")))
                   .alias("a")))
    return (packed.select(
        "event_type", F.col("na").alias("n_first"),
        F.col("nb").alias("n_second"),
        F.round(F.expr("aggregate(a, 0.0D, (acc, x) -> acc + x.t)"), 6)
        .alias("psi")))


# -------------------------------------------------- two-sample KS test

KS_TYPE_A = "purchase"
KS_TYPE_B = "click"


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic comparing the value
    distributions of two event types — "did this metric shift between
    segments" as one exact number (max ECDF gap over observed points).

    Scale shape: per-value counts are one aggregate; the cumulative
    counts run through :func:`distributed_prefix` (two-phase, exact,
    no global window) over the distinct-value table; the final max is
    an ordinary partial-aggregated global max. Exactness: cumulative
    counts are exact ints; the ECDF gap divides them once per row."""
    e = (load_events(spark, sf_dir)
         .where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
         .select("event_type", "value"))
    per_v = (e.groupBy("value")
             .agg(F.sum((F.col("event_type") == KS_TYPE_A).cast("long"))
                  .alias("c1"),
                  F.sum((F.col("event_type") == KS_TYPE_B).cast("long"))
                  .alias("c2")))
    cum = distributed_prefix(per_v, ["value"], "cum1",
                             value=F.col("c1"), kind="sum",
                             extra_sums={"cum2": F.col("c2")})
    n = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    gap = F.abs(F.col("cum1").cast("double") / F.col("n1")
                - F.col("cum2").cast("double") / F.col("n2"))
    return (cum.crossJoin(F.broadcast(n))
            .agg(F.max("n1").alias("n_a"), F.max("n2").alias("n_b"),
                 F.round(F.max(gap), 6).alias("ks_stat")))


# -------------------------------------------------- target encoding

TE_SMOOTHING = 50  # pseudo-count weight of the global prior


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean-target encoding of part brand against line revenue
    — the feature-engineering staple (category → shrunk mean target),
    with the empirical-Bayes shrinkage (n·mean + m·prior)/(n + m) that
    keeps rare categories from memorizing noise.

    Exactness: revenue is exact e4 fixed-point (2dp price × 2dp
    discount factor ⇒ 4 decimals, integer after ×10⁴ — the IEEE
    product is identical on both engines and never lands near a
    rounding boundary); the encoding formula is one shared float
    fragment over exact ints. Scale shape: part is a broadcast dim;
    the global prior rides a 1-row broadcast."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 10000).cast("long").alias("rev_e4"))
    # localCheckpoint the #brands-row table: its two consumers (the
    # global-prior fold and the output projection) would otherwise each
    # re-run the lineitem scan + join + aggregate (per-branch pruning
    # de-canonicalizes the exchanges, so reuse cannot fire).
    # Per-invocation. Fact passes: 2 → 1.
    per_brand = (li.join(F.broadcast(part),
                         li["l_partkey"] == part["p_partkey"])
                 .groupBy("p_brand")
                 .agg(F.count(F.lit(1)).cast("long").alias("n"),
                      F.sum("rev_e4").alias("s"))
                 .localCheckpoint())
    tot = per_brand.agg(F.sum("n").alias("nt"), F.sum("s").alias("st"))
    prior = "((CAST(st AS DOUBLE) / 10000) / nt)"
    enc = (f"round(((CAST(s AS DOUBLE) / 10000) + ({TE_SMOOTHING} * "
           f"{prior})) / (n + {TE_SMOOTHING}), 6)")
    return (per_brand.crossJoin(F.broadcast(tot))
            .selectExpr("p_brand", "n AS n_items",
                        "round((CAST(s AS DOUBLE) / 10000) / n, 6) "
                        "AS mean_rev",
                        f"{enc} AS enc_smoothed"))


# ------------------------------------------------------- seasonality


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: events-per-active-
    day for each weekday, relative to the type's overall rate (1.0 =
    flat week) — the weekday-shape profile behind staffing/alerting
    baselines.

    Exactness: all four inputs (count and distinct-day count, per dow
    and overall) are exact integers; the index is one shared float
    fragment. Scale shape: two map-side-combined aggregates and a
    broadcast equi-join on the #types-bounded totals table."""
    e = load_events(spark, sf_dir).select(
        "event_type", "event_date",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"))
    # ONE corpus pass: the per-type totals fold EXACTLY from the
    # per-(type, dow) table — every date has exactly one weekday, so
    # the per-dow distinct-day counts partition the per-type distinct
    # days and Σ days ≡ count_distinct(event_date), and Σ c ≡ count(*).
    # The #types × 7 table is localCheckpoint-ed so its two consumers
    # (this fold and the output join) read materialized rows instead of
    # each re-running the corpus aggregate (per-branch pruning keeps
    # the exchanges from canonicalizing equal — reuse cannot fire).
    by_dow = (e.groupBy("event_type", "dow")
              .agg(F.count(F.lit(1)).cast("long").alias("c"),
                   F.count_distinct("event_date").alias("days"))
              .localCheckpoint())
    by_type = (by_dow.groupBy("event_type")
               .agg(F.sum("c").alias("ct"), F.sum("days").alias("dt")))
    idx = ("round((CAST(c AS DOUBLE) / days) / "
           "(CAST(ct AS DOUBLE) / dt), 6)")
    return (by_dow.join(F.broadcast(by_type), "event_type")
            .selectExpr("event_type", "dow", "c AS n_events",
                        "round(CAST(c AS DOUBLE) / days, 6) "
                        "AS events_per_day",
                        f"{idx} AS seasonal_index"))


# ------------------------------------------------------- readability


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy per document from word, sentence,
    and vowel-group counts — the cheap fluency screen a text pipeline
    runs before the expensive LM scorer. (Vowel groups proxy syllables;
    sentence count is floored at 1 for unpunctuated docs.)

    Scale shape: one codegen'd scan, three regexp counts per row, no
    shuffle. Exactness: counts are exact ints (identical RE2/Java
    semantics for these character-class-only patterns); the score is
    one shared float fragment."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[^ ]+"), 0))
        .cast("long").alias("n_words"),
        F.greatest(F.lit(1), F.size(F.regexp_extract_all(
            F.col("text"), F.lit("[.!?]+"), 0))).cast("long")
        .alias("n_sentences"),
        F.size(F.regexp_extract_all(F.col("text"),
                                    F.lit("[aeiouAEIOU]+"), 0))
        .cast("long").alias("n_vowel_groups"))
        .where(F.col("n_words") > 0)
        .selectExpr(
            "doc_id", "n_words", "n_sentences", "n_vowel_groups",
            "round((206.835 - (1.015 * (CAST(n_words AS DOUBLE) / "
            "n_sentences))) - (84.6 * (CAST(n_vowel_groups AS DOUBLE) / "
            "n_words)), 4) AS flesch_proxy"))


# --------------------------------------------------------- Zipf slope

ZIPF_TOP = 100  # ranks fitted


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per source: OLS fit of ln(freq) on
    ln(rank) over the top ``ZIPF_TOP`` tokens — natural corpora sit
    near −1; templated/synthetic sources drift flat, making this a
    generation-artifact screen.

    Scale shape: token counts are one explode + map-side-combined
    aggregate; the per-source rank has a CONSTANT bound over an
    aggregated input, so it plans as Partial+Final WindowGroupLimit
    (each task keeps ≤ K rows per source); the OLS sums fold one
    sorted ≤ K-element array per source — identical IEEE order on both
    engines."""
    tok = (load(spark, sf_dir, "documents")
           .select("source",
                   F.explode(F.split("text", " ")).alias("token"))
           .where(F.col("token") != ""))
    counts = (tok.groupBy("source", "token")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = Window.partitionBy("source").orderBy(F.desc("c"), "token")
    top = (counts.withColumn("r", F.row_number().over(w))
           .where(F.col("r") <= ZIPF_TOP))
    packed = (top.groupBy("source")
              .agg(F.sort_array(F.collect_list(F.struct("r", "c")))
                   .alias("a")))
    folds = {
        "sx": "ln(CAST(x.r AS DOUBLE))",
        "sy": "ln(CAST(x.c AS DOUBLE))",
        "sxy": "ln(CAST(x.r AS DOUBLE)) * ln(CAST(x.c AS DOUBLE))",
        "sxx": "ln(CAST(x.r AS DOUBLE)) * ln(CAST(x.r AS DOUBLE))",
    }
    cols = [F.expr(f"aggregate(a, 0.0D, (acc, x) -> acc + ({t}))")
            .alias(n) for n, t in folds.items()]
    slope = ("round(((size_a * sxy) - (sx * sy)) / "
             "((size_a * sxx) - (sx * sx)), 6)")
    return (packed
            .select("source", F.expr("size(a)").cast("long")
                    .alias("size_a"), *cols)
            .selectExpr("source", "size_a AS n_top",
                        f"{slope} AS zipf_slope"))


# ------------------------------------------------------- hapax ratio


def q_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source: the fraction of the vocabulary
    appearing exactly once — low hapax share flags templated or
    looping generation; high flags noisy OCR. Pure integer aggregates.

    Scale shape: explode + two map-side-combined aggregates keyed on
    (source, token) then source — no windows, no joins."""
    tok = (load(spark, sf_dir, "documents")
           .select("source",
                   F.explode(F.split("text", " ")).alias("token"))
           .where(F.col("token") != ""))
    counts = (tok.groupBy("source", "token")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    return (counts.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"),
                 F.sum("c").alias("n_tokens"),
                 F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"))
            .selectExpr("source", "n_vocab", "n_tokens", "n_hapax",
                        "round(CAST(n_hapax AS DOUBLE) / n_vocab, 6) "
                        "AS hapax_share"))


# ------------------------------------------------------ vocab growth


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law point per source: vocabulary size vs token count and
    the implied growth exponent ln(V)/ln(N) — natural text sits near
    0.4–0.6; an exponent near 0 means the source recycles a closed
    vocabulary (template/boilerplate), near 1 means near-unique tokens
    (ids, hashes). Integer aggregates + one shared float fragment.

    Scale shape: identical to :func:`q_hapax_ratio` — explode, two
    keyed aggregates, nothing quadratic."""
    tok = (load(spark, sf_dir, "documents")
           .select("source",
                   F.explode(F.split("text", " ")).alias("token"))
           .where(F.col("token") != ""))
    counts = (tok.groupBy("source", "token")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    return (counts.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"),
                 F.sum("c").alias("n_tokens"))
            .selectExpr("source", "n_tokens", "n_vocab",
                        "round(ln(CAST(n_vocab AS DOUBLE)) / "
                        "ln(CAST(n_tokens AS DOUBLE)), 6) "
                        "AS heaps_exponent"))


# -------------------------------------------------- CUSUM changepoint

# mean over the packed calendar-bounded series — exact int sum / size
_CUSUM_MEAN = ("(CAST(aggregate(a, CAST(0 AS BIGINT), "
               "(acc, x) -> acc + x.c) AS DOUBLE) / size(a))")


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen per event type: the day where the
    cumulative sum of deviations from the series mean peaks in
    magnitude — the standard "when did the level shift" detector for a
    daily metric.

    Exactness: daily counts and their sum are exact integers; every
    prefix sum folds the SAME sorted calendar-bounded array
    left-to-right on both engines, so each CUSUM double matches
    bit-for-bit; the argmax day resolves by (|CUSUM| desc, day) — a
    deterministic total order given identical doubles. Scale shape:
    one map-side-combined aggregate, then O(days²) folds on per-type
    scalars, never data rows."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("d", "c")))
                   .alias("a")))
    cus = ("transform(a, (x, i) -> struct(x.d AS d, "
           "aggregate(slice(a, 1, i + 1), CAST(0 AS DOUBLE), "
           f"(acc, y) -> acc + (CAST(y.c AS DOUBLE) - {_CUSUM_MEAN})) "
           "AS s))")
    pick = (f"array_min(transform({cus}, "
            "x -> struct(-abs(x.s) AS na, x.d AS d, x.s AS s)))")
    return (packed
            .withColumn("p", F.expr(pick))
            .select("event_type",
                    F.expr("size(a)").cast("long").alias("n_days"),
                    F.col("p.d").alias("change_day"),
                    F.round(F.col("p.s"), 6).alias("cusum_at_change"),
                    F.round(F.expr("abs(p.s)"), 6).alias("max_abs_cusum")))


# ------------------------------------------------ 7-day rolling correlation

ROLL_X = "click"        # the two daily series whose co-movement the
ROLL_Y = "purchase"     # rolling window tracks
ROLL_W = 7


def _roll_sums() -> str:
    """Five exact-integer folds over the 7-element window slice W."""
    w = f"slice(a, i - {ROLL_W - 2}, {ROLL_W})"
    folds = {
        "sx": "acc + e.x", "sy": "acc + e.y", "sxy": "acc + e.x * e.y",
        "sxx": "acc + e.x * e.x", "syy": "acc + e.y * e.y",
    }
    return ", ".join(
        f"aggregate({w}, CAST(0 AS BIGINT), (acc, e) -> {body}) AS {n}"
        for n, body in folds.items())


def _pearson(n: str, p: str = "") -> str:
    """Pearson from exact integer power sums — the SAME fragment text
    (modulo the column prefix) runs on both engines; the zero-variance
    guard tests an exact integer product, so NULL rows agree (Spark /0
    yields NULL, DuckDB yields ±inf — the guard keeps that seam
    unreachable)."""
    sx, sy = f"{p}sx", f"{p}sy"
    sxy, sxx, syy = f"{p}sxy", f"{p}sxx", f"{p}syy"
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    return (f"CASE WHEN {vx} * {vy} = 0 THEN NULL "
            f"ELSE round(CAST({n} * {sxy} - {sx} * {sy} AS DOUBLE) / "
            f"(sqrt(CAST({vx} AS DOUBLE)) * "
            f"sqrt(CAST({vy} AS DOUBLE))), 6) END")


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between the click and purchase
    daily-count series — the co-movement monitor behind "are these two
    metrics still coupled this week".

    Exactness: within each 7-day window all five power sums are EXACT
    int64 folds of integer counts, so the Pearson formula evaluates on
    identical inputs with an identical IEEE expression tree on both
    engines — no float accumulation at all; constant windows yield
    NULL via an integer-exact guard. Scale shape: the two series join
    on day AFTER aggregation (calendar-bounded), then O(days·W) folds
    on per-day scalars."""
    daily = (load_events(spark, sf_dir)
             .where(F.col("event_type").isin([ROLL_X, ROLL_Y]))
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    x = daily.where(F.col("event_type") == ROLL_X).select(
        "d", F.col("c").alias("x"))
    y = daily.where(F.col("event_type") == ROLL_Y).select(
        "d", F.col("c").alias("y"))
    packed = (x.join(y, "d")
              .select(F.struct("d", "x", "y").alias("e"))
              .agg(F.sort_array(F.collect_list("e")).alias("a")))
    win = ("filter(transform(a, (x, i) -> "
           f"CASE WHEN i >= {ROLL_W - 1} THEN "
           "struct(x.d AS d, x.x AS x, x.y AS y, "
           f"{_roll_sums()}) END), w -> w IS NOT NULL)")
    return (packed.select(F.explode(F.expr(win)).alias("w"))
            .select(F.col("w.d").alias("day"),
                    F.col("w.x").alias("x"), F.col("w.y").alias("y"),
                    F.expr(_pearson(str(ROLL_W), "w."))
                    .alias(f"corr{ROLL_W}d")))


# ------------------------------------------------ lead/lag cross-correlation

LAG_X = "signup"       # candidate leading series
LAG_Y = "purchase"     # candidate lagging series
LAG_MAX = 7


def q_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation: Pearson of (signup_t, purchase_{t+L})
    for L = 0..7 days — "does today's signup volume predict purchases
    L days out", the screen behind attribution-lag and forecasting
    feature choices.

    Exactness: per-lag power sums are exact int64 aggregates over
    integer daily counts (map-side-combined, 8 output rows); the
    Pearson fragment and its integer-exact zero-variance guard are
    shared verbatim with :func:`q_rolling_corr`. Scale shape: the lag
    fan-out explodes a literal 8-element sequence on the
    calendar-bounded x series — no join fan-out on fact rows, and the
    shifted join is an equi-join on day."""
    daily = (load_events(spark, sf_dir)
             .where(F.col("event_type").isin([LAG_X, LAG_Y]))
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    x = (daily.where(F.col("event_type") == LAG_X)
         .select("d", F.col("c").alias("xv"))
         .withColumn("lag", F.explode(F.sequence(F.lit(0),
                                                 F.lit(LAG_MAX))))
         .withColumn("yd", F.expr("date_add(d, lag)")))
    y = daily.where(F.col("event_type") == LAG_Y).select(
        F.col("d").alias("yd"), F.col("c").alias("yv"))
    sums = (x.join(y, "yd")
            .groupBy("lag")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("xv").alias("sx"), F.sum("yv").alias("sy"),
                 F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
                 F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
                 F.sum(F.col("yv") * F.col("yv")).alias("syy")))
    return (sums.select(F.col("lag").cast("long").alias("lag_days"),
                        F.col("n").alias("n_days"),
                        F.expr(_pearson("n")).alias("corr")))


# ----------------------------------------------------- Theil–Sen slope


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event type: the median of all
    pairwise (count difference / day difference) slopes of the daily
    series — immune to the outlier days that wreck least-squares.

    Exactness: each pairwise slope is one division of exact integers
    (identical IEEE doubles), and the median is ``percentile`` ≡
    DuckDB ``quantile_cont`` (bit-identical interpolation). Scale
    shape: the self-join runs on the AGGREGATED calendar-bounded
    series — O(days²) pairs per type on per-day scalars, not data
    rows; the fact scan aggregates once with map-side combine."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    a = daily.select("event_type", F.col("d").alias("d1"),
                     F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("d").alias("d2"),
                     F.col("c").alias("c2"))
    pairs = (a.join(b, "event_type")
             .where(F.col("d1") < F.col("d2"))
             .select("event_type",
                     (F.col("c2") - F.col("c1")).cast("double")
                     .alias("dy"),
                     F.datediff("d2", "d1").cast("double").alias("dx")))
    return (pairs.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.round(F.percentile(F.col("dy") / F.col("dx"),
                                      F.lit(0.5)), 6)
                 .alias("slope_per_day")))


# ------------------------------------------------- Mann–Kendall trend test


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type: the S
    statistic (concordant minus discordant day pairs) with the
    tie-corrected normal approximation z — the nonparametric "is this
    metric actually trending" answer that pairs with
    :func:`q_theil_sen`'s slope.

    Exactness: S, the tie term, and the variance numerator are ALL
    exact int64 arithmetic; only the final z division touches floats,
    on identical exact inputs via a shared fragment, with an
    integer-exact zero-variance guard. Scale shape: same bounded
    self-join as Theil–Sen plus one value-ties aggregate — everything
    after the daily rollup is per-day scalars."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    a = daily.select("event_type", F.col("d").alias("d1"),
                     F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("d").alias("d2"),
                     F.col("c").alias("c2"))
    s = (a.join(b, "event_type")
         .where(F.col("d1") < F.col("d2"))
         .groupBy("event_type")
         .agg(F.sum(F.when(F.col("c2") > F.col("c1"), 1)
                    .when(F.col("c2") < F.col("c1"), -1)
                    .otherwise(0).cast("long")).alias("s"),
              ))
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    ties = (daily.groupBy("event_type", "c")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy("event_type")
            .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
                 .alias("tt")))
    z = ("CASE WHEN n * (n - 1) * (2 * n + 5) - tt = 0 THEN NULL "
         "WHEN s > 0 THEN round(CAST(s - 1 AS DOUBLE) / "
         "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18), 6) "
         "WHEN s < 0 THEN round(CAST(s + 1 AS DOUBLE) / "
         "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18), 6) "
         "ELSE CAST(0 AS DOUBLE) END")
    return (s.join(nd, "event_type").join(ties, "event_type")
            .select("event_type", F.col("n").alias("n_days"),
                    F.col("s").alias("s_stat"),
                    F.expr(z).alias("z_score")))


# ------------------------------------------------- conversion lag

CONV_FROM = "signup"     # funnel edge whose latency distribution
CONV_TO = "purchase"     # the report describes


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution: for each user who
    purchased at or after their first signup, the time from first
    signup to first subsequent purchase — conversion rate plus p50/p90
    lag in hours, the funnel-latency report behind attribution-window
    and nurture-campaign choices.

    Exactness: lags are exact integer MICROSECONDS (unix_micros ≡
    DuckDB epoch_us); the percentiles interpolate over those exact
    ints (``percentile`` ≡ ``quantile_cont``) and divide by the exact
    3.6e9 µs/hour only at the end. Scale shape: two keyed aggregates
    and one equi-join on user_id (data-sized key) — no windows."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    s = (ev.where(F.col("event_type") == CONV_FROM)
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = (ev.where(F.col("event_type") == CONV_TO)
         .join(s, "user_id")
         .where(F.col("ts") >= F.col("s_ts"))
         .groupBy("user_id")
         .agg(F.min(F.expr("unix_micros(ts)")).alias("p_us"),
              F.min(F.expr("unix_micros(s_ts)")).alias("s_us")))
    lag = (F.col("p_us") - F.col("s_us")).alias("lag_us")
    n_s = s.agg(F.count(F.lit(1)).cast("long").alias("n_signup"))
    return (p.select(lag)
            .agg(F.count(F.lit(1)).cast("long").alias("n_converted"),
                 F.percentile("lag_us", F.lit(0.5)).alias("_p50"),
                 F.percentile("lag_us", F.lit(0.9)).alias("_p90"))
            .crossJoin(F.broadcast(n_s))
            .select("n_signup", "n_converted",
                    F.round(F.col("n_converted").cast("double")
                            / F.col("n_signup"), 6).alias("conv_rate"),
                    F.round(F.col("_p50") / 3600000000, 6)
                    .alias("p50_hours"),
                    F.round(F.col("_p90") / 3600000000, 6)
                    .alias("p90_hours")))


# ------------------------------------------- naive-forecast baseline


def q_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the two standard no-model forecasts on each event
    type's daily counts — naive (ŷ_t = y_{t−1}) vs seasonal-naive
    (ŷ_t = y_{t−7}) mean absolute error, and their ratio (< 1 means
    the series has real weekly seasonality worth modeling; the MASE
    denominator convention).

    Exactness: both error sums are folds of |integer − integer| over
    the same sorted calendar-bounded array — pure int64 until the two
    final divisions, which run on exact inputs via shared fragments
    with an integer-exact zero guard. Scale shape: one map-side
    aggregate then per-type scalar folds."""
    daily = (load_events(spark, sf_dir)
             .groupBy("event_type", F.col("event_date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = (daily.groupBy("event_type")
              .agg(F.sort_array(F.collect_list(F.struct("d", "c")))
                   .alias("a")))

    def errs(off: int) -> str:
        # 0-based transform index i, 0-based a[i] subscripts: element
        # i's forecast is element i-off; evaluate only for i >= 7 so
        # both baselines score the SAME evaluation window
        return ("aggregate(filter(transform(a, (x, i) -> "
                f"CASE WHEN i >= 7 THEN abs(x.c - a[i - {off}].c) END), "
                "e -> e IS NOT NULL), CAST(0 AS BIGINT), "
                "(acc, e) -> acc + e)")

    return (packed
            .withColumn("n_eval",
                        F.expr("size(a) - 7").cast("long"))
            .where(F.col("n_eval") > 0)
            .withColumn("_sn", F.expr(errs(1)))
            .withColumn("_ss", F.expr(errs(7)))
            .select("event_type", "n_eval",
                    F.round(F.col("_sn").cast("double") / F.col("n_eval"),
                            6).alias("mae_naive"),
                    F.round(F.col("_ss").cast("double") / F.col("n_eval"),
                            6).alias("mae_seasonal"),
                    F.expr("CASE WHEN _sn = 0 THEN NULL ELSE "
                           "round(CAST(_ss AS DOUBLE) / _sn, 6) END")
                    .alias("ratio_seasonal_naive")))


QUERIES = {
    "q_cohort_retention": q_cohort_retention,
    "q_event_paths": q_event_paths,
    "q_ewma": q_ewma,
    "q_autocorr": q_autocorr,
    "q_moments": q_moments,
    "q_yoy_growth": q_yoy_growth,
    "q_psi_drift": q_psi_drift,
    "q_ks_test": q_ks_test,
    "q_target_encoding": q_target_encoding,
    "q_seasonality": q_seasonality,
    "q_readability": q_readability,
    "q_zipf_fit": q_zipf_fit,
    "q_hapax_ratio": q_hapax_ratio,
    "q_vocab_growth": q_vocab_growth,
    "q_cusum_changepoint": q_cusum_changepoint,
    "q_rolling_corr": q_rolling_corr,
    "q_lead_lag_corr": q_lead_lag_corr,
    "q_theil_sen": q_theil_sen,
    "q_mann_kendall": q_mann_kendall,
    "q_conversion_lag": q_conversion_lag,
    "q_forecast_baseline": q_forecast_baseline,
}

_EVENTS = ("SELECT event_id, user_id, event_type, value, "
           "CAST(ts AS TIMESTAMP) AS ts, "
           "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date "
           "FROM events")

ORACLES = {
    "q_cohort_retention": (
        "WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od "
        "FROM orders), "
        "f AS (SELECT o_custkey, MIN(od) AS fd FROM o GROUP BY 1) "
        "SELECT CAST(DATE_TRUNC('month', fd) AS DATE) AS cohort_month, "
        "CAST((EXTRACT(YEAR FROM od) * 12 + EXTRACT(MONTH FROM od)) - "
        "(EXTRACT(YEAR FROM fd) * 12 + EXTRACT(MONTH FROM fd)) "
        "AS BIGINT) AS age_months, "
        "CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active "
        "FROM o JOIN f USING (o_custkey) GROUP BY 1, 2"),
    "q_event_paths": (
        f"WITH e AS ({_EVENTS}), "
        "r AS (SELECT user_id, event_type, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id, event_type) "
        "AS rn FROM e), "
        "p AS (SELECT user_id, ARRAY_TO_STRING(LIST(event_type "
        f"ORDER BY rn), '>') AS path FROM r WHERE rn <= {PATH_LEN} "
        "GROUP BY user_id) "
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p "
        f"GROUP BY path ORDER BY n_users DESC, path LIMIT {PATH_TOP}"),
    "q_ewma": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2), "
        "p AS (SELECT event_type, LIST(struct_pack(d := d, c := c) "
        "ORDER BY d) AS a FROM daily GROUP BY event_type), "
        "i AS (SELECT event_type, a, UNNEST(generate_series(1, "
        "LEN(a))) AS i FROM p) "
        # DuckDB index i is 1-based: a[2:i] folds 1-based elements 2..i
        # over the init a[1].c — i=1 folds nothing (LIST_REDUCE of the
        # prepended singleton returns the init)
        "SELECT event_type, a[i].d AS day, a[i].c AS c, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(a[1].c AS DOUBLE), "
        "LIST_TRANSFORM(a[2:i], y -> CAST(y.c AS DOUBLE))), "
        f"(acc, y) -> {EWMA_ALPHA} * y + {EWMA_BETA} * acc), 6) "
        "AS ewma FROM i"),
    "q_autocorr": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2), "
        "p AS (SELECT event_type, LIST(struct_pack(d := d, c := c) "
        "ORDER BY d) AS a FROM daily GROUP BY event_type), "
        "m AS (SELECT event_type, CAST(LEN(a) AS BIGINT) AS n_days, "
        "LIST_TRANSFORM(a, x -> CAST(x.c AS DOUBLE) - "
        "(CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        "LIST_TRANSFORM(a, y -> y.c)), (acc, y) -> acc + y) AS DOUBLE)"
        " / LEN(a))) AS devs FROM p), "
        "s AS (SELECT event_type, n_days, "
        "LIST_REDUCE(LIST_PREPEND(struct_pack(dev := devs[1], "
        "s := CAST(0 AS DOUBLE)), LIST_TRANSFORM(devs[2:LEN(devs)], "
        "x -> struct_pack(dev := x, s := CAST(0 AS DOUBLE)))), "
        "(acc, x) -> struct_pack(dev := x.dev, "
        "s := acc.s + acc.dev * x.dev)).s AS num, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(devs, x -> x * x)), (acc, x) -> acc + x) "
        "AS den FROM m) "
        "SELECT event_type, n_days, ROUND(num / den, 6) "
        "AS autocorr_lag1 FROM s WHERE den <> 0"),
    "q_moments": (
        "WITH agg AS (SELECT l_returnflag, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(q) AS BIGINT) AS s1, "
        "CAST(SUM(q * q) AS BIGINT) AS s2, "
        "CAST(SUM(q * q * q) AS BIGINT) AS s3, "
        "CAST(SUM(q * q * q * q) AS BIGINT) AS s4 FROM "
        "(SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q "
        "FROM lineitem) GROUP BY l_returnflag) "
        f"SELECT l_returnflag, n, round({_MEAN}, 6) AS mean_qty, "
        f"{_SKEW} AS skewness_qty, {_KURT} AS kurtosis_qty FROM agg"),
    "q_yoy_growth": (
        "WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents "
        "FROM orders), "
        "m AS (SELECT CAST(DATE_TRUNC('month', od) AS DATE) AS month, "
        "EXTRACT(YEAR FROM od) * 12 + EXTRACT(MONTH FROM od) AS ms, "
        "CAST(SUM(cents) AS BIGINT) AS rev_cents FROM o GROUP BY 1, 2) "
        "SELECT cur.month, cur.rev_cents, "
        "prev.rev_cents AS prev_cents, "
        "ROUND(CAST(cur.rev_cents AS DOUBLE) / prev.rev_cents - 1, 6) "
        "AS yoy FROM m cur JOIN m prev ON cur.ms = prev.ms + 12"),
    "q_psi_drift": (
        f"WITH e AS ({_EVENTS}), "
        "mid AS (SELECT MIN(event_date) + CAST(FLOOR((MAX(event_date) "
        "- MIN(event_date)) / 2) AS INTEGER) AS mid FROM e), "
        "c AS (SELECT event_type, CAST(LEAST(9, GREATEST(0, "
        f"FLOOR(value / {PSI_BIN_WIDTH}))) AS BIGINT) AS b, "
        "CAST(SUM(CASE WHEN event_date <= mid THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ca, "
        "CAST(SUM(CASE WHEN event_date > mid THEN 1 ELSE 0 END) "
        "AS BIGINT) AS cb FROM e CROSS JOIN mid GROUP BY 1, 2), "
        "t AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na, "
        "CAST(SUM(cb) AS BIGINT) AS nb FROM c GROUP BY 1), "
        "g AS (SELECT event_type, na, nb, UNNEST(generate_series(0, "
        f"{PSI_BINS - 1})) AS b FROM t), "
        "f AS (SELECT g.event_type, g.na, g.nb, g.b, "
        "COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb "
        "FROM g LEFT JOIN c ON g.event_type = c.event_type "
        "AND g.b = c.b), "
        "terms AS (SELECT event_type, na, nb, LIST("
        f"((((ca + 1) / CAST(na + {PSI_BINS} AS DOUBLE)) - "
        f"((cb + 1) / CAST(nb + {PSI_BINS} AS DOUBLE))) * "
        f"LN(((ca + 1) / CAST(na + {PSI_BINS} AS DOUBLE)) / "
        f"((cb + 1) / CAST(nb + {PSI_BINS} AS DOUBLE)))) ORDER BY b) "
        "AS a FROM f GROUP BY 1, 2, 3) "
        "SELECT event_type, na AS n_first, nb AS n_second, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), a), "
        "(acc, x) -> acc + x), 6) AS psi FROM terms"),
    "q_ks_test": (
        f"WITH e AS ({_EVENTS}), "
        "g AS (SELECT value, "
        f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS c1, "
        f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS c2 FROM e "
        f"WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}') "
        "GROUP BY value), "
        "cum AS (SELECT value, SUM(c1) OVER w AS cum1, "
        "SUM(c2) OVER w AS cum2 FROM g WINDOW w AS (ORDER BY value "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c2) AS BIGINT) AS n2 FROM g) "
        "SELECT n1 AS n_a, n2 AS n_b, "
        "ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / n1 - "
        "CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_stat "
        "FROM cum CROSS JOIN n GROUP BY n1, n2"),
    "q_target_encoding": (
        "WITH li AS (SELECT l_partkey, "
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) "
        "AS BIGINT) AS rev_e4 FROM lineitem), "
        "pb AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(rev_e4) AS BIGINT) AS s FROM li "
        "JOIN part ON l_partkey = p_partkey GROUP BY p_brand), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, "
        "CAST(SUM(s) AS BIGINT) AS st FROM pb) "
        "SELECT p_brand, n AS n_items, "
        "round((CAST(s AS DOUBLE) / 10000) / n, 6) AS mean_rev, "
        f"round(((CAST(s AS DOUBLE) / 10000) + ({TE_SMOOTHING} * "
        "((CAST(st AS DOUBLE) / 10000) / nt))) / "
        f"(n + {TE_SMOOTHING}), 6) AS enc_smoothed "
        "FROM pb CROSS JOIN t"),
    "q_seasonality": (
        f"WITH e AS ({_EVENTS}), "
        "d AS (SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT)"
        " AS dow, CAST(COUNT(*) AS BIGINT) AS c, "
        "CAST(COUNT(DISTINCT event_date) AS BIGINT) AS days "
        "FROM e GROUP BY 1, 2), "
        "t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ct, "
        "CAST(COUNT(DISTINCT event_date) AS BIGINT) AS dt "
        "FROM e GROUP BY 1) "
        "SELECT event_type, dow, c AS n_events, "
        "round(CAST(c AS DOUBLE) / days, 6) AS events_per_day, "
        "round((CAST(c AS DOUBLE) / days) / "
        "(CAST(ct AS DOUBLE) / dt), 6) AS seasonal_index "
        "FROM d JOIN t USING (event_type)"),
    "q_readability": (
        "WITH c AS (SELECT doc_id, "
        "CAST(LEN(regexp_extract_all(text, '[^ ]+')) AS BIGINT) "
        "AS n_words, "
        "CAST(GREATEST(1, LEN(regexp_extract_all(text, '[.!?]+'))) "
        "AS BIGINT) AS n_sentences, "
        "CAST(LEN(regexp_extract_all(text, '[aeiouAEIOU]+')) "
        "AS BIGINT) AS n_vowel_groups FROM documents) "
        "SELECT doc_id, n_words, n_sentences, n_vowel_groups, "
        "round((206.835 - (1.015 * (CAST(n_words AS DOUBLE) / "
        "n_sentences))) - (84.6 * (CAST(n_vowel_groups AS DOUBLE) / "
        "n_words)), 4) AS flesch_proxy FROM c WHERE n_words > 0"),
    "q_zipf_fit": (
        "WITH tok AS (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) "
        "AS token FROM documents), "
        "c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tok WHERE token <> '' GROUP BY 1, 2), "
        "r AS (SELECT source, c, ROW_NUMBER() OVER (PARTITION BY "
        "source ORDER BY c DESC, token) AS r FROM c "
        f"QUALIFY r <= {ZIPF_TOP}), "
        "p AS (SELECT source, LIST(struct_pack(r := r, c := c) "
        "ORDER BY r) AS a FROM r GROUP BY source), "
        "s AS (SELECT source, CAST(LEN(a) AS BIGINT) AS size_a, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), LIST_TRANSFORM(a,"
        " x -> LN(CAST(x.r AS DOUBLE)))), (acc, x) -> acc + x) AS sx, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), LIST_TRANSFORM(a,"
        " x -> LN(CAST(x.c AS DOUBLE)))), (acc, x) -> acc + x) AS sy, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), LIST_TRANSFORM(a,"
        " x -> LN(CAST(x.r AS DOUBLE)) * LN(CAST(x.c AS DOUBLE)))), "
        "(acc, x) -> acc + x) AS sxy, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), LIST_TRANSFORM(a,"
        " x -> LN(CAST(x.r AS DOUBLE)) * LN(CAST(x.r AS DOUBLE)))), "
        "(acc, x) -> acc + x) AS sxx FROM p) "
        "SELECT source, size_a AS n_top, "
        "round(((size_a * sxy) - (sx * sy)) / "
        "((size_a * sxx) - (sx * sx)), 6) AS zipf_slope FROM s"),
    "q_hapax_ratio": (
        "WITH tok AS (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) "
        "AS token FROM documents), "
        "c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tok WHERE token <> '' GROUP BY 1, 2) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab, "
        "CAST(SUM(c) AS BIGINT) AS n_tokens, "
        "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_hapax, "
        "round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ COUNT(*), 6) AS hapax_share FROM c GROUP BY source"),
    "q_vocab_growth": (
        "WITH tok AS (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) "
        "AS token FROM documents), "
        "c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tok WHERE token <> '' GROUP BY 1, 2) "
        "SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, "
        "CAST(COUNT(*) AS BIGINT) AS n_vocab, "
        "round(LN(CAST(COUNT(*) AS DOUBLE)) / "
        "LN(CAST(SUM(c) AS DOUBLE)), 6) AS heaps_exponent "
        "FROM c GROUP BY source"),
    "q_cusum_changepoint": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2), "
        "p AS (SELECT event_type, LIST(struct_pack(d := d, c := c) "
        "ORDER BY d) AS a FROM daily GROUP BY event_type), "
        "m AS (SELECT event_type, a, CAST(LEN(a) AS BIGINT) AS n_days, "
        "(CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        "LIST_TRANSFORM(a, x -> x.c)), (acc, y) -> acc + y) AS DOUBLE) "
        "/ LEN(a)) AS mean FROM p), "
        "i AS (SELECT event_type, a, n_days, mean, "
        "UNNEST(generate_series(1, CAST(n_days AS INTEGER))) AS i "
        "FROM m), "
        "cus AS (SELECT event_type, n_days, a[i].d AS d, "
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(a[1:i], y -> CAST(y.c AS DOUBLE) - mean)), "
        "(acc, y) -> acc + y) AS s FROM i) "
        "SELECT event_type, n_days, d AS change_day, "
        "round(s, 6) AS cusum_at_change, "
        "round(abs(s), 6) AS max_abs_cusum FROM cus "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY abs(s) DESC, d) = 1"),
    "q_rolling_corr": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e "
        f"WHERE event_type IN ('{ROLL_X}', '{ROLL_Y}') GROUP BY 1, 2), "
        f"x AS (SELECT d, c AS x FROM daily WHERE event_type = "
        f"'{ROLL_X}'), "
        f"y AS (SELECT d, c AS y FROM daily WHERE event_type = "
        f"'{ROLL_Y}'), "
        "p AS (SELECT LIST(struct_pack(d := d, x := x, y := y) "
        "ORDER BY d, x, y) AS a FROM x JOIN y USING (d)), "
        "i AS (SELECT a, UNNEST(generate_series("
        f"{ROLL_W}, LEN(a))) AS i FROM p), "
        "w AS (SELECT a[i].d AS day, a[i].x AS x, a[i].y AS y, "
        + ", ".join(
            "CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"LIST_TRANSFORM(a[i - {ROLL_W - 1}:i], e -> {body})), "
            f"(acc, y) -> acc + y) AS BIGINT) AS {nm}"
            for nm, body in [("sx", "e.x"), ("sy", "e.y"),
                             ("sxy", "e.x * e.y"), ("sxx", "e.x * e.x"),
                             ("syy", "e.y * e.y")])
        + " FROM i) "
        f"SELECT day, x, y, {_pearson(str(ROLL_W))} AS corr{ROLL_W}d "
        "FROM w"),
    "q_lead_lag_corr": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e "
        f"WHERE event_type IN ('{LAG_X}', '{LAG_Y}') GROUP BY 1, 2), "
        f"x AS (SELECT d, c AS xv FROM daily WHERE event_type = "
        f"'{LAG_X}'), "
        f"y AS (SELECT d, c AS yv FROM daily WHERE event_type = "
        f"'{LAG_Y}'), "
        "xl AS (SELECT d, xv, UNNEST(generate_series(0, "
        f"{LAG_MAX})) AS lag FROM x), "
        "j AS (SELECT xl.lag, xl.xv, y.yv FROM xl "
        "JOIN y ON y.d = xl.d + CAST(xl.lag AS INTEGER)), "
        "s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(xv) AS BIGINT) AS sx, "
        "CAST(SUM(yv) AS BIGINT) AS sy, "
        "CAST(SUM(xv * yv) AS BIGINT) AS sxy, "
        "CAST(SUM(xv * xv) AS BIGINT) AS sxx, "
        "CAST(SUM(yv * yv) AS BIGINT) AS syy FROM j GROUP BY lag) "
        "SELECT CAST(lag AS BIGINT) AS lag_days, n AS n_days, "
        f"{_pearson('n')} AS corr FROM s"),
    "q_theil_sen": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2) "
        "SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "round(QUANTILE_CONT(CAST(b.c - a.c AS DOUBLE) / "
        "CAST(b.d - a.d AS DOUBLE), 0.5), 6) AS slope_per_day "
        "FROM daily a JOIN daily b ON a.event_type = b.event_type "
        "AND a.d < b.d GROUP BY a.event_type"),
    "q_mann_kendall": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2), "
        "s AS (SELECT a.event_type, CAST(SUM(CASE WHEN b.c > a.c "
        "THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s "
        "FROM daily a JOIN daily b ON a.event_type = b.event_type "
        "AND a.d < b.d GROUP BY a.event_type), "
        "nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM daily GROUP BY event_type), "
        "ties AS (SELECT event_type, CAST(SUM(t * (t - 1) * "
        "(2 * t + 5)) AS BIGINT) AS tt FROM (SELECT event_type, c, "
        "CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1, 2) "
        "GROUP BY event_type) "
        "SELECT s.event_type, n AS n_days, s AS s_stat, "
        "CASE WHEN n * (n - 1) * (2 * n + 5) - tt = 0 THEN NULL "
        "WHEN s > 0 THEN round(CAST(s - 1 AS DOUBLE) / "
        "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18), 6) "
        "WHEN s < 0 THEN round(CAST(s + 1 AS DOUBLE) / "
        "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18), 6) "
        "ELSE CAST(0 AS DOUBLE) END AS z_score "
        "FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)"),
    "q_conversion_lag": (
        f"WITH e AS ({_EVENTS}), "
        f"s AS (SELECT user_id, MIN(ts) AS s_ts FROM e "
        f"WHERE event_type = '{CONV_FROM}' GROUP BY user_id), "
        "p AS (SELECT e.user_id, "
        "MIN(epoch_us(e.ts)) AS p_us, MIN(epoch_us(s.s_ts)) AS s_us "
        f"FROM e JOIN s USING (user_id) WHERE e.event_type = "
        f"'{CONV_TO}' AND e.ts >= s.s_ts GROUP BY e.user_id), "
        "lag AS (SELECT p_us - s_us AS lag_us FROM p), "
        "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_converted, "
        "QUANTILE_CONT(lag_us, 0.5) AS _p50, "
        "QUANTILE_CONT(lag_us, 0.9) AS _p90 FROM lag), "
        "ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup FROM s) "
        "SELECT n_signup, n_converted, "
        "ROUND(CAST(n_converted AS DOUBLE) / n_signup, 6) AS conv_rate, "
        "ROUND(_p50 / 3600000000, 6) AS p50_hours, "
        "ROUND(_p90 / 3600000000, 6) AS p90_hours "
        "FROM agg CROSS JOIN ns"),
    "q_forecast_baseline": (
        f"WITH e AS ({_EVENTS}), "
        "daily AS (SELECT event_type, event_date AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2), "
        "p AS (SELECT event_type, LIST(struct_pack(d := d, c := c) "
        "ORDER BY d) AS a FROM daily GROUP BY event_type), "
        # DuckDB 1-based: evaluate elements 8..n for both baselines
        "m AS (SELECT event_type, CAST(LEN(a) - 7 AS BIGINT) AS n_eval, "
        "CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        "LIST_TRANSFORM(generate_series(8, LEN(a)), "
        "i -> abs(a[i].c - a[i - 1].c))), (acc, e) -> acc + e) "
        "AS BIGINT) AS sn, "
        "CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        "LIST_TRANSFORM(generate_series(8, LEN(a)), "
        "i -> abs(a[i].c - a[i - 7].c))), (acc, e) -> acc + e) "
        "AS BIGINT) AS ss FROM p WHERE LEN(a) > 7) "
        "SELECT event_type, n_eval, "
        "ROUND(CAST(sn AS DOUBLE) / n_eval, 6) AS mae_naive, "
        "ROUND(CAST(ss AS DOUBLE) / n_eval, 6) AS mae_seasonal, "
        "CASE WHEN sn = 0 THEN NULL ELSE "
        "ROUND(CAST(ss AS DOUBLE) / sn, 6) END AS ratio_seasonal_naive "
        "FROM m"),
}
