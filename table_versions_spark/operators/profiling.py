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
    cw_i = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("c_iw")))
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


QUERIES = {
    "q_key_candidates": q_key_candidates,
    "q_func_dependencies": q_func_dependencies,
    "q_col_entropy": q_col_entropy,
    "q_hhi_concentration": q_hhi_concentration,
    "q_kl_divergence": q_kl_divergence,
    "q_js_divergence": q_js_divergence,
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
}
