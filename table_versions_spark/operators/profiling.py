"""Data-profiling / distribution-divergence operators (round-11 §2.D
extension family): candidate-key detection, functional-dependency
checks, column entropy, market-concentration (HHI), and the KL /
Jensen-Shannon corpus-divergence screens a training-data pipeline runs
when deciding whether two sources (or two snapshots) are exchangeable.

Exactness discipline (package-wide rules, see ``insights.py`` /
``trends.py``):

- counts aggregate as exact int64; money in exact fixed-point
  (cents / e4) so parallel-aggregation order can't change a bit;
- float SUMS over per-group term series fold ONE sorted array
  (``aggregate(sort_array(collect_list(...)), ...)`` == DuckDB
  ``LIST_REDUCE(LIST_PREPEND(...), ...)``) so the IEEE addition order
  is identical on both engines; every such series is bounded by
  construction (column vocabulary, #suppliers per nation, corpus
  vocabulary);
- decimal literals never appear bare inside ``F.expr`` fragments (a
  bare ``0.5`` parses as DECIMAL and silently switches the arithmetic
  to decimal semantics); halves are written ``/ 2`` against a double
  operand, zeros as ``CAST(0 AS DOUBLE)`` — fragments shared verbatim
  by both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load

# ------------------------------------------------------ candidate keys

KEY_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
            "o_orderstatus"]


def q_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key profile of the orders table: per-column distinct
    count, uniqueness ratio, and an is-unique-key flag — the first
    query any schema-inference / data-contract tool runs on an
    unfamiliar table.

    Scale shape: ALL five distinct counts run in ONE aggregate — Spark
    plans the multi-``count_distinct`` as a single Expand(×5) over the
    scan with partial aggregation per column, one pass over the data
    instead of five; the unpivot to (column, stats) rows explodes a
    5-element literal array on the 1-row aggregate. Counts are exact
    int64; the uniqueness ratio is one exact-int division, 6-dp."""
    o = load(spark, sf_dir, "orders").select(*KEY_COLS)
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.count_distinct(c).cast("long").alias(f"d{i}")
          for i, c in enumerate(KEY_COLS)])
    stacked = agg.select(
        "n",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("column_name"),
                     F.col(f"d{i}").alias("n_distinct"))
            for i, c in enumerate(KEY_COLS)])).alias("x"))
    return (stacked.select(
        F.col("x.column_name").alias("column_name"),
        F.col("x.n_distinct").alias("n_distinct"),
        F.col("n").alias("n_rows"),
        F.round(F.col("x.n_distinct").cast("double") / F.col("n"), 6)
        .alias("uniqueness"),
        (F.col("x.n_distinct") == F.col("n")).alias("is_unique_key")))


# ------------------------------------------------ functional dependencies

# (table, determinant, dependent) — one expected to HOLD (the primary
# key determines everything), two expected to fail with real fan-out
FD_SPECS = [
    ("orders", "o_orderkey", "o_orderstatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("part", "p_brand", "p_type"),
]


def q_func_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check A → B for three candidate pairs:
    how many A-groups exist, how many map to more than one B, and the
    worst fan-out — the profiling query behind normalization advice
    and silent-denormalization drift alarms.

    Scale shape: each pair is groupBy(A) → count_distinct(B) (hash
    aggregate with map-side partial, output bounded by |A|) followed
    by a 1-row rollup; the three 1-row branches union. No joins, no
    windows; every count is exact int64."""
    parts = []
    for table, lhs, rhs in FD_SPECS:
        per = (load(spark, sf_dir, table).select(lhs, rhs)
               .groupBy(lhs)
               .agg(F.count_distinct(rhs).cast("long").alias("k")))
        parts.append(
            per.agg(F.count(F.lit(1)).cast("long").alias("n_lhs"),
                    F.sum((F.col("k") > 1).cast("long"))
                    .alias("n_violating"),
                    F.max("k").alias("max_fanout"))
            .select(F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
                    "n_lhs", "n_violating", "max_fanout",
                    (F.col("n_violating") == 0).alias("holds")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ------------------------------------------------------- column entropy

ENTROPY_COLS = ["o_orderstatus", "o_orderpriority", "o_orderdate"]

# Shared fold fragments: n is an exact-int fold; the entropy fold sums
# (c/n)·ln(c/n) over values sorted by value — identical term order and
# identical IEEE terms on both engines; /ln(2) converts to bits.
_ENT_N = "aggregate(a, CAST(0 AS BIGINT), (acc, x) -> acc + x.c)"
_ENT_H = ("round(-aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + "
          "(CAST(x.c AS DOUBLE) / n) * ln(CAST(x.c AS DOUBLE) / n)) "
          "/ ln(2), 6)")


def q_col_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of three categorical order columns — the
    value-concentration profile behind "is this column informative,
    constant, or an id in disguise" (entropy ≈ log2(distinct) means
    uniform; ≈ 0 means constant).

    Scale shape: each column is one map-side-combined value-count
    aggregate whose output is vocabulary-bounded, then a single-row
    sorted-array fold (value counts per column collect into ONE array
    ordered by value — bounded by the column's vocabulary, the same
    contract as q_col histograms). Counts exact int64; the entropy
    fold order is pinned by the sort."""
    o = load(spark, sf_dir, "orders")
    parts = []
    for col in ENTROPY_COLS:
        counts = (o.groupBy(F.col(col).cast("string").alias("v"))
                  .agg(F.count(F.lit(1)).cast("long").alias("c")))
        packed = counts.agg(
            F.sort_array(F.collect_list(F.struct("v", "c"))).alias("a"))
        parts.append(
            packed
            .withColumn("n", F.expr(_ENT_N))
            .select(F.lit(col).alias("column_name"),
                    F.expr("size(a)").cast("long").alias("n_distinct"),
                    F.col("n").alias("n_rows"),
                    F.expr(_ENT_H).alias("entropy_bits")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ------------------------------------------- market concentration (HHI)

# Herfindahl–Hirschman index of supplier revenue share per nation —
# shares fold in supplier-key order so the float sum order is pinned
_HHI = ("round(aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + "
        "(CAST(x.r AS DOUBLE) / t) * (CAST(x.r AS DOUBLE) / t)), 6)")


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation via the
    Herfindahl–Hirschman index (sum of squared revenue shares; 1/n =
    perfectly even, 1 = monopoly) — the concentration profile behind
    "is this corpus/market dominated by a handful of producers".

    Scale shape: revenue aggregates once per (nation, supplier) in
    exact e4 fixed-point (extendedprice·(1−discount) has exactly four
    decimals) with map-side combine; the lineitem→supplier join is a
    plain equi-join on the data-sized supplier key (Catalyst/AQE picks
    broadcast while the dim fits); per-nation share folds sort by
    suppkey so both engines add the same IEEE terms in the same
    order."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 10000).cast("long").alias("rev_e4"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey",
                                                 "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_sup = (li.join(sup, li.l_suppkey == sup.s_suppkey)
               .groupBy("s_nationkey", "s_suppkey")
               .agg(F.sum("rev_e4").alias("r")))
    packed = (per_sup.groupBy("s_nationkey")
              .agg(F.sort_array(F.collect_list(F.struct(
                  F.col("s_suppkey").alias("k"), "r"))).alias("a"),
                  F.sum("r").alias("t"),
                  F.count(F.lit(1)).cast("long").alias("n_suppliers")))
    return (packed.join(F.broadcast(nat),
                        packed.s_nationkey == nat.n_nationkey)
            .select(F.col("n_name").alias("nation"), "n_suppliers",
                    F.col("t").alias("revenue_e4"),
                    F.expr(_HHI).alias("hhi")))


# --------------------------------------------------- KL divergence (docs)


def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the source's unigram distribution
    from the whole-corpus distribution, KL(source ‖ corpus) in nats —
    the distribution-shift score behind "which source is least like
    the rest of my training mix" (the corpus support always covers the
    source support, so no term is undefined).

    Scale shape: token counting is the explode + map-side-combine
    shape of q_tfidf; the (source, token) ↔ token-total join shuffles
    on the content key (vocabulary-bounded); per-source totals and the
    corpus total broadcast (#sources + 1 rows). Each KL term is ln()
    of exact-rational doubles; terms fold per source in token order,
    so both engines sum the same IEEE values in the same order."""
    toks = (load(spark, sf_dir, "documents")
            .select("source", F.explode(F.filter(
                F.split("text", " "), lambda x: x != "")).alias("tok")))
    # localCheckpoint the (source, token) count table: its three
    # consumers (token totals, per-source totals, the terms join) would
    # otherwise each re-run the corpus explode — per-branch column
    # pruning keeps the branch exchanges from canonicalizing equal, so
    # exchange reuse cannot fire (the q_log_odds_terms fix, same
    # shape). Per-invocation. Corpus tokenize passes: 3 → 1.
    cw_i = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("c_iw"))
            .localCheckpoint())
    cw = cw_i.groupBy("tok").agg(F.sum("c_iw").alias("c_w"))
    n_i = cw_i.groupBy("source").agg(F.sum("c_iw").alias("n_i"))
    tot = cw.agg(F.sum("c_w").alias("nn"))
    term = ("(CAST(c_iw AS DOUBLE) / n_i) * "
            "ln((CAST(c_iw AS DOUBLE) / n_i) / "
            "(CAST(c_w AS DOUBLE) / nn))")
    terms = (cw_i.join(cw, "tok")
             .join(F.broadcast(n_i), "source")
             .crossJoin(F.broadcast(tot))
             .select("source", "n_i", "tok",
                     F.expr(term).alias("kt")))
    packed = (terms.groupBy("source")
              .agg(F.min("n_i").alias("n_tokens"),
                   F.count(F.lit(1)).cast("long").alias("n_terms"),
                   F.sort_array(F.collect_list(F.struct("tok", "kt")))
                   .alias("a")))
    return (packed.select(
        "source", "n_tokens", "n_terms",
        F.expr("round(aggregate(a, CAST(0 AS DOUBLE), "
               "(acc, x) -> acc + x.kt), 6)").alias("kl_nats")))


# ------------------------------------------- pairwise JS divergence

JS_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def _js_fold(i: int, j: int) -> str:
    """JS(src_i, src_j) fold over the packed per-token count array —
    the SAME arithmetic text runs on both engines (no bare decimal
    literals: halves are written ``/ 2``)."""
    pi = f"(CAST(x.c{i} AS DOUBLE) / n{i})"
    pj = f"(CAST(x.c{j} AS DOUBLE) / n{j})"
    m = f"(({pi} + {pj}) / 2)"
    return (
        "round(aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + "
        f"(CASE WHEN x.c{i} > 0 THEN ({pi} * ln({pi} / {m})) / 2 "
        "ELSE CAST(0 AS DOUBLE) END) + "
        f"(CASE WHEN x.c{j} > 0 THEN ({pj} * ln({pj} / {m})) / 2 "
        "ELSE CAST(0 AS DOUBLE) END)), 6)")


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between five named sources'
    unigram distributions — the symmetric, bounded (≤ ln 2) source-
    similarity matrix used to pick which corpora to merge or deduplicate
    against each other first.

    Scale shape: one token-count aggregate pivots to a per-token count
    vector over the FIVE fixed sources (vocabulary-bounded rows, 5
    int64 columns — a literal pivot, not a data-driven one); the packed
    vocabulary array plus the 5 source totals live in ONE row, and all
    10 pair scores are folds over that same sorted array — computing
    the full matrix costs one aggregate, not 10 joins. Zero-count
    tokens contribute exactly 0 by the CASE guard on both engines."""
    toks = (load(spark, sf_dir, "documents")
            .where(F.col("source").isin(JS_SOURCES))
            .select("source", F.explode(F.filter(
                F.split("text", " "), lambda x: x != "")).alias("tok")))
    cw_i = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    wide = (cw_i.groupBy("tok")
            .agg(*[F.coalesce(F.sum(F.when(F.col("source") == s,
                                           F.col("c"))), F.lit(0))
                   .cast("long").alias(f"c{i}")
                   for i, s in enumerate(JS_SOURCES)]))
    packed = wide.agg(
        F.sort_array(F.collect_list(F.struct(
            "tok", *[f"c{i}" for i in range(len(JS_SOURCES))])))
        .alias("a"),
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(len(JS_SOURCES))])
    pair_structs = [
        F.struct(F.lit(JS_SOURCES[i]).alias("src_a"),
                 F.lit(JS_SOURCES[j]).alias("src_b"),
                 F.expr(_js_fold(i, j)).alias("js_nats"))
        for i in range(len(JS_SOURCES))
        for j in range(i + 1, len(JS_SOURCES))]
    return (packed.select(F.explode(F.array(*pair_structs)).alias("p"))
            .select("p.src_a", "p.src_b", "p.js_nats"))


# ------------------------------------------------------- k-anonymity

K_ANON_K = 5  # groups smaller than this re-identify their members


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of two quasi-identifier sets: group sizes
    under each QI combination, the minimum (the table's k), and how
    many rows sit in groups below ``K_ANON_K`` — the data-governance
    screen run before a table is shared or joined externally.

    Scale shape: each QI set is ONE map-side-combined groupBy whose
    output is bounded by the QI domain, then a 1-row rollup; counts
    and the at-risk threshold are exact int64, the single pct is one
    exact-int division."""
    specs = [
        ("customer:nationkey+mktsegment",
         load(spark, sf_dir, "customer")
         .groupBy("c_nationkey", "c_mktsegment")),
        ("orders:status+priority+year",
         load(spark, sf_dir, "orders")
         .groupBy("o_orderstatus", "o_orderpriority",
                  F.year("o_orderdate").alias("y"))),
    ]
    parts = []
    for name, grouped in specs:
        sizes = grouped.agg(F.count(F.lit(1)).cast("long").alias("sz"))
        parts.append(
            sizes.agg(
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.min("sz").alias("min_group_size"),
                F.sum("sz").alias("n_rows"),
                F.sum(F.when(F.col("sz") < K_ANON_K, F.col("sz"))
                      .otherwise(0)).alias("rows_at_risk"))
            .select(F.lit(name).alias("qi_set"), "n_groups",
                    "min_group_size", "n_rows", "rows_at_risk",
                    F.round(F.col("rows_at_risk").cast("double")
                            / F.col("n_rows"), 6).alias("pct_at_risk")))
    return parts[0].unionAll(parts[1])


# ------------------------------------------------------- l-diversity

LDIV_BAND = 1000  # account-balance band width (the sensitive attribute)


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: within each (nationkey, mktsegment)
    quasi-identifier group, how many DISTINCT sensitive values
    (balance bands) appear — a group with l = 1 discloses its members'
    attribute outright even when k-anonymous. Reports the worst l, the
    homogeneous-group count, and the mean l.

    Scale shape: one two-key aggregate (QI × band, domain-bounded) and
    one QI rollup — exact integers throughout; the mean is one
    exact-int division."""
    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / LDIV_BAND).cast("long").alias("band"))
    per_group = (cust.groupBy("c_nationkey", "c_mktsegment")
                 .agg(F.count_distinct("band").cast("long").alias("l"),
                      F.count(F.lit(1)).cast("long").alias("sz")))
    return (per_group.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("l").alias("min_l"),
        F.sum((F.col("l") == 1).cast("long")).alias("n_homogeneous"),
        F.sum("l").alias("_sl"),
        F.sum("sz").alias("n_rows"))
        .select("n_groups", "min_l", "n_homogeneous", "n_rows",
                F.round(F.col("_sl").cast("double") / F.col("n_groups"),
                        6).alias("avg_l")))


# -------------------------------------------------- data-quality rules


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule report — the dbt-test / Deequ
    shape: referential integrity, accepted values, range, positivity,
    and non-emptiness checks, one row per rule with checked/violation
    counts and a pass flag.

    Scale shape: each FK rule is ONE left join + aggregate (the dim
    side broadcasts while it fits; violations are NULL-probe counts —
    no anti-join second pass); value rules on the SAME fact table ride
    the FK rule's scan as extra conditional counts in the same
    aggregate, unpivoted to rule rows afterwards (a left join on a
    unique dim key preserves the fact row count, so n_checked is
    identical to a standalone pass) — orders and lineitem are each
    scanned ONCE, not once per rule. Branches union; all counts exact
    int64."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    li = load(spark, sf_dir, "lineitem")
    docs = load(spark, sf_dir, "documents")

    def report(name, df, bad):
        return (df.agg(F.count(F.lit(1)).cast("long").alias("n_checked"),
                       F.sum(bad.cast("long")).alias("n_violations"))
                .select(F.lit(name).alias("rule"), "n_checked",
                        "n_violations",
                        (F.col("n_violations") == 0).alias("passed")))

    def report2(df, rules):
        # one scan, one aggregate, N rule rows: shared n_checked plus
        # one conditional violation count per rule, exploded to the
        # exact rows the per-rule aggregates produced
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            *[F.sum(bad.cast("long")).alias(f"_v{i}")
              for i, (_, bad) in enumerate(rules)])
        entries = F.array(*[
            F.struct(F.lit(name).alias("rule"),
                     F.col("n_checked"),
                     F.col(f"_v{i}").alias("n_violations"))
            for i, (name, _) in enumerate(rules)])
        return (agg.select(F.explode(entries).alias("x"))
                .select("x.rule", "x.n_checked", "x.n_violations",
                        (F.col("x.n_violations") == 0).alias("passed")))

    fk1 = orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
    ok = orders.select("o_orderkey", "o_custkey")
    fk2 = li.join(ok, li.l_orderkey == ok.o_orderkey, "left")
    parts = [
        report2(fk1, [
            ("fk:orders.o_custkey->customer", F.col("c_custkey").isNull()),
            ("accepted:orders.o_orderstatus{O,F,P}",
             ~F.col("o_orderstatus").isin(["O", "F", "P"]))]),
        report2(fk2, [
            ("fk:lineitem.l_orderkey->orders", F.col("o_custkey").isNull()),
            ("positive:lineitem.l_quantity", F.col("l_quantity") <= 0)]),
        report("range:customer.c_acctbal[-1000,10000]",
               load(spark, sf_dir, "customer"),
               (F.col("c_acctbal") < -1000) | (F.col("c_acctbal") > 10000)),
        report("nonempty:documents.text", docs,
               F.col("text").isNull() | (F.length("text") == 0)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------- embedding drift

EMB_FP = 10000000  # e7 fixed point: float32 components quantize exactly


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label MEAN embedding
    vectors — the centroid-drift screen behind "did the encoder (or
    the data mix) move between these cohorts". Low off-diagonal cosine
    means separated label clusters; a drop between snapshots means
    drift.

    Exactness: cross-row float sums are order-nondeterministic, so the
    per-(label, dim) mean aggregates e7 FIXED-POINT int64 (float32
    components round exactly at e7), and the cosine folds the two
    64-double mean vectors in dim order — both engines see identical
    IEEE terms in identical order. Scale shape: posexplode fans 64×
    rows into a map-side-combined (label, dim) aggregate bounded at
    #labels × dims; the pair join runs on the #labels-row centroid
    table."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding")
                      .alias("dim", "v"))
    means = (dims.groupBy("label", "dim")
             .agg(F.sum(F.expr(
                 f"CAST(ROUND(CAST(v AS DOUBLE) * {EMB_FP}) AS BIGINT)"))
                 .alias("s"),
                 F.count(F.lit(1)).cast("long").alias("n"))
             .select("label", "dim",
                     F.expr(f"CAST(s AS DOUBLE) / ({EMB_FP} * n)")
                     .alias("m")))
    vecs = (means.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                 .alias("a")))
    va = vecs.select(F.col("label").alias("label_a"),
                     F.col("a").alias("aa"))
    vb = vecs.select(F.col("label").alias("label_b"),
                     F.col("a").alias("ab"))
    dot = ("aggregate(zip_with(aa, ab, (x, y) -> x.m * y.m), "
           "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
    nsq = ("aggregate(transform({v}, x -> x.m * x.m), "
           "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
    return (va.join(vb, va.label_a < vb.label_b)
            .select("label_a", "label_b",
                    F.round(F.expr(
                        f"({dot}) / (sqrt({nsq.format(v='aa')}) * "
                        f"sqrt({nsq.format(v='ab')}))"), 6)
                    .alias("cosine")))


QUERIES = {
    "q_key_candidates": q_key_candidates,
    "q_func_dependencies": q_func_dependencies,
    "q_col_entropy": q_col_entropy,
    "q_hhi_concentration": q_hhi_concentration,
    "q_kl_divergence": q_kl_divergence,
    "q_js_divergence": q_js_divergence,
    "q_k_anonymity": q_k_anonymity,
    "q_l_diversity": q_l_diversity,
    "q_dq_checks": q_dq_checks,
    "q_embedding_drift": q_embedding_drift,
}


def _key_oracle() -> str:
    cd = ", ".join(
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d{i}"
        for i, c in enumerate(KEY_COLS))
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, d{i} AS n_distinct, n AS n_rows, "
        f"ROUND(CAST(d{i} AS DOUBLE) / n, 6) AS uniqueness, "
        f"d{i} = n AS is_unique_key FROM a"
        for i, c in enumerate(KEY_COLS))
    return (f"WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, {cd} "
            f"FROM orders) {rows}")


def _fd_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{t}.{lhs}->{rhs}' AS fd, "
        "CAST(COUNT(*) AS BIGINT) AS n_lhs, "
        "CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violating, MAX(k) AS max_fanout, "
        "SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds FROM "
        f"(SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS k "
        f"FROM {t} GROUP BY {lhs})"
        for t, lhs, rhs in FD_SPECS)
    return rows


def _entropy_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, "
        "CAST(LEN(a) AS BIGINT) AS n_distinct, n AS n_rows, "
        "ROUND(-LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(a, x -> (CAST(x.c AS DOUBLE) / n) * "
        "ln(CAST(x.c AS DOUBLE) / n))), (acc, y) -> acc + y) "
        "/ ln(2), 6) AS entropy_bits FROM "
        "(SELECT a, CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        "LIST_TRANSFORM(a, x -> x.c)), (acc, y) -> acc + y) AS BIGINT) "
        "AS n FROM (SELECT LIST(struct_pack(v := v, c := c) "
        "ORDER BY v, c) AS a FROM (SELECT CAST("
        f"{c} AS VARCHAR) AS v, CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders GROUP BY 1)))"
        for c in ENTROPY_COLS)
    return rows


def _js_oracle() -> str:
    cols = ", ".join(
        "CAST(COALESCE(SUM(CASE WHEN source = "
        f"'{s}' THEN c END), 0) AS BIGINT) AS c{i}"
        for i, s in enumerate(JS_SOURCES))
    tots = ", ".join(f"CAST(SUM(c{i}) AS BIGINT) AS n{i}"
                     for i in range(len(JS_SOURCES)))
    struct_fields = ", ".join(
        [f"tok := tok"] + [f"c{i} := c{i}" for i in range(len(JS_SOURCES))])

    def fold(i: int, j: int) -> str:
        pi = f"(CAST(x.c{i} AS DOUBLE) / n{i})"
        pj = f"(CAST(x.c{j} AS DOUBLE) / n{j})"
        m = f"(({pi} + {pj}) / 2)"
        return (
            "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
            "LIST_TRANSFORM(a, x -> "
            f"(CASE WHEN x.c{i} > 0 THEN ({pi} * ln({pi} / {m})) / 2 "
            "ELSE CAST(0 AS DOUBLE) END) + "
            f"(CASE WHEN x.c{j} > 0 THEN ({pj} * ln({pj} / {m})) / 2 "
            "ELSE CAST(0 AS DOUBLE) END))), (acc, y) -> acc + y), 6)")

    pairs = " UNION ALL ".join(
        f"SELECT '{JS_SOURCES[i]}' AS src_a, '{JS_SOURCES[j]}' AS src_b, "
        f"{fold(i, j)} AS js_nats FROM p"
        for i in range(len(JS_SOURCES))
        for j in range(i + 1, len(JS_SOURCES)))
    src_list = ", ".join(f"'{s}'" for s in JS_SOURCES)
    return (
        "WITH t AS (SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT("
        "text, ' '), x -> x <> '')) AS tok FROM documents "
        f"WHERE source IN ({src_list})), "
        "cwi AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM t GROUP BY 1, 2), "
        f"wide AS (SELECT tok, {cols} FROM cwi GROUP BY tok), "
        f"p AS (SELECT LIST(struct_pack({struct_fields}) ORDER BY tok) "
        f"AS a, {tots} FROM wide) {pairs}")


ORACLES = {
    "q_key_candidates": _key_oracle(),
    "q_func_dependencies": _fd_oracle(),
    "q_col_entropy": _entropy_oracle(),
    "q_hhi_concentration": (
        "WITH li AS (SELECT l_suppkey, CAST(ROUND(l_extendedprice * "
        "(1 - l_discount) * 10000) AS BIGINT) AS rev_e4 FROM lineitem), "
        "ps AS (SELECT s_nationkey, s_suppkey, "
        "CAST(SUM(rev_e4) AS BIGINT) AS r FROM li "
        "JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2), "
        "pk AS (SELECT s_nationkey, LIST(struct_pack(k := s_suppkey, "
        "r := r) ORDER BY s_suppkey, r) AS a, "
        "CAST(SUM(r) AS BIGINT) AS t, "
        "CAST(COUNT(*) AS BIGINT) AS n_suppliers "
        "FROM ps GROUP BY 1) "
        "SELECT n_name AS nation, n_suppliers, t AS revenue_e4, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(a, x -> (CAST(x.r AS DOUBLE) / t) * "
        "(CAST(x.r AS DOUBLE) / t))), (acc, y) -> acc + y), 6) AS hhi "
        "FROM pk JOIN nation ON s_nationkey = n_nationkey"),
    "q_kl_divergence": (
        "WITH t AS (SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT("
        "text, ' '), x -> x <> '')) AS tok FROM documents), "
        "cwi AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_iw "
        "FROM t GROUP BY 1, 2), "
        "cw AS (SELECT tok, CAST(SUM(c_iw) AS BIGINT) AS c_w FROM cwi "
        "GROUP BY tok), "
        "ni AS (SELECT source, CAST(SUM(c_iw) AS BIGINT) AS n_i "
        "FROM cwi GROUP BY source), "
        "tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS nn FROM cw), "
        "terms AS (SELECT cwi.source, ni.n_i, cwi.tok, "
        "(CAST(c_iw AS DOUBLE) / n_i) * "
        "ln((CAST(c_iw AS DOUBLE) / n_i) / (CAST(c_w AS DOUBLE) / nn)) "
        "AS kt FROM cwi JOIN cw USING (tok) JOIN ni USING (source) "
        "CROSS JOIN tot), "
        "pk AS (SELECT source, CAST(MIN(n_i) AS BIGINT) AS n_tokens, "
        "CAST(COUNT(*) AS BIGINT) AS n_terms, "
        "LIST(struct_pack(tok := tok, kt := kt) ORDER BY tok, kt) AS a "
        "FROM terms GROUP BY source) "
        "SELECT source, n_tokens, n_terms, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(a, x -> x.kt)), (acc, y) -> acc + y), 6) "
        "AS kl_nats FROM pk"),
    "q_js_divergence": _js_oracle(),
    "q_k_anonymity": (
        "WITH s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS sz "
        "FROM customer GROUP BY c_nationkey, c_mktsegment), "
        "s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM orders "
        "GROUP BY o_orderstatus, o_orderpriority, "
        "EXTRACT(YEAR FROM o_orderdate)) "
        "SELECT 'customer:nationkey+mktsegment' AS qi_set, "
        "CAST(COUNT(*) AS BIGINT) AS n_groups, MIN(sz) AS "
        "min_group_size, CAST(SUM(sz) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) "
        "AS BIGINT) AS rows_at_risk, "
        f"ROUND(CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END)"
        " AS DOUBLE) / SUM(sz), 6) AS pct_at_risk FROM s1 "
        "UNION ALL "
        "SELECT 'orders:status+priority+year', "
        "CAST(COUNT(*) AS BIGINT), MIN(sz), "
        "CAST(SUM(sz) AS BIGINT), "
        f"CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) "
        "AS BIGINT), "
        f"ROUND(CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END)"
        " AS DOUBLE) / SUM(sz), 6) FROM s2"),
    "q_l_diversity": (
        "WITH g AS (SELECT c_nationkey, c_mktsegment, "
        "CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / "
        f"{LDIV_BAND}) AS BIGINT)) AS BIGINT) AS l, "
        "CAST(COUNT(*) AS BIGINT) AS sz FROM customer "
        "GROUP BY 1, 2) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, MIN(l) AS min_l, "
        "CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS "
        "n_homogeneous, CAST(SUM(sz) AS BIGINT) AS n_rows, "
        "ROUND(CAST(SUM(l) AS DOUBLE) / COUNT(*), 6) AS avg_l FROM g"),
    "q_dq_checks": (
        "SELECT 'fk:orders.o_custkey->customer' AS rule, "
        "CAST(COUNT(*) AS BIGINT) AS n_checked, "
        "CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_violations, "
        "SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) = 0 "
        "AS passed FROM orders LEFT JOIN customer "
        "ON o_custkey = c_custkey "
        "UNION ALL "
        "SELECT 'fk:lineitem.l_orderkey->orders', "
        "CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT), "
        "SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 "
        "FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey "
        "UNION ALL "
        "SELECT 'range:customer.c_acctbal[-1000,10000]', "
        "CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 "
        "THEN 1 ELSE 0 END) AS BIGINT), "
        "SUM(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 "
        "THEN 1 ELSE 0 END) = 0 FROM customer "
        "UNION ALL "
        "SELECT 'accepted:orders.o_orderstatus{O,F,P}', "
        "CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') "
        "THEN 1 ELSE 0 END) AS BIGINT), "
        "SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') "
        "THEN 1 ELSE 0 END) = 0 FROM orders "
        "UNION ALL "
        "SELECT 'positive:lineitem.l_quantity', "
        "CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) "
        "AS BIGINT), "
        "SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) = 0 "
        "FROM lineitem "
        "UNION ALL "
        "SELECT 'nonempty:documents.text', "
        "CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 "
        "THEN 1 ELSE 0 END) AS BIGINT), "
        "SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 "
        "THEN 1 ELSE 0 END) = 0 FROM documents"),
    "q_embedding_drift": (
        "WITH d AS (SELECT label, "
        "UNNEST(generate_series(1, LEN(embedding))) AS dim1, "
        "embedding AS e FROM embeddings), "
        "x AS (SELECT label, dim1 - 1 AS dim, "
        f"CAST(ROUND(CAST(e[dim1] AS DOUBLE) * {EMB_FP}) AS BIGINT) "
        "AS q FROM d), "
        "m AS (SELECT label, dim, CAST(SUM(q) AS DOUBLE) / "
        f"({EMB_FP} * COUNT(*)) AS m FROM x GROUP BY 1, 2), "
        "v AS (SELECT label, LIST(m ORDER BY dim) AS a FROM m "
        "GROUP BY label) "
        "SELECT va.label AS label_a, vb.label AS label_b, "
        "ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(generate_series(1, LEN(va.a)), "
        "i -> va.a[i] * vb.a[i])), (acc, t) -> acc + t) / "
        "(SQRT(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(va.a, x -> x * x)), (acc, t) -> acc + t)) * "
        "SQRT(LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), "
        "LIST_TRANSFORM(vb.a, x -> x * x)), (acc, t) -> acc + t))), 6) "
        "AS cosine FROM v va JOIN v vb ON va.label < vb.label"),
}
