"""Corpus-cleaning / curation operators for LLM-data-pipeline use
(SURVEY §2.D extension family, alongside text.py and dedup.py).

Everything here is the JVM-side fast path — ``split`` / higher-order array
functions / ``regexp_*`` inside whole-stage codegen, no Python UDFs — so each
operator is a single embarrassingly-parallel scan (plus, where noted, one
aggregation whose state is bounded per key). Every operator carries an exact
DuckDB oracle.

Operators:

- ``q_pii_redact``: rule-based PII scrubbing — regex rules (email / phone /
  IPv4, the real-world shapes) plus a configurable denylist vocabulary, with
  per-document redaction counts.
- ``q_contamination``: benchmark-contamination detection — word-n-gram
  overlap of every corpus document against a held-out benchmark set
  (the standard "is my eval set in the training data?" check).
- ``q_repetition``: repetition quality signals (duplicate word / bigram /
  trigram ratios — the Gopher-style heuristics used to drop boilerplate and
  degenerate generations).
- ``q_tfidf``: corpus-level term statistics (df, total tf, tf-idf score) —
  the aggregation backbone of vocabulary building and keyword extraction.
- ``q_bm25``: BM25 relevance scoring of the corpus against a fixed query —
  the classic retrieval scorer, computed as one scan + one tiny stats
  cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import checkpoint_if_big, distributed_prefix, load, load_events

# ---------------------------------------------------------------------------
# q_pii_redact

# Real-world PII shapes (kept even though the synthetic corpus contains no
# digits — the regex machinery is the product surface) plus a denylist
# vocabulary that exercises the path on this corpus.  NOTE: restricted to
# the regex subset Spark's java.util.regex and DuckDB's RE2 agree on —
# character classes, alternation, \b word boundaries; lookaround is RE2-
# unsupported and deliberately avoided.
PII_REGEXES = [
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",   # email
    "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",                   # US phone
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",  # IPv4
]
PII_DENYLIST = ["customer", "vector"]  # stand-in sensitive vocabulary
_PII_PATTERN = "|".join(PII_REGEXES
                        + [rf"\b{w}\b" for w in PII_DENYLIST])
PII_TOKEN = "[REDACTED]"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based PII scrubbing with per-document match accounting.

    One codegen'd scan: ``regexp_count`` for the accounting,
    ``regexp_replace`` for the scrub, sha-256 of the scrubbed text so the
    oracle hash-checks the full redacted content without hauling it around.
    No shuffle; at 100 TB this is a pure map over the corpus partitioning.
    """
    docs = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.col("text"), F.lit(_PII_PATTERN),
                                F.lit(PII_TOKEN))
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_PATTERN)).cast("bigint")
         .alias("n_redacted"),
        F.sha2(redacted, 256).alias("redacted_sha"))


# ---------------------------------------------------------------------------
# q_contamination

CONTAM_NGRAM = 5       # word-n-gram size for overlap detection
BENCH_MOD = 50         # doc_id % 50 == 0 ⇒ document is in the benchmark set


def _word_ngrams_expr(n: int, toks: str = "toks") -> str:
    """Distinct word n-grams over a pre-split token array column.

    Taking the token ARRAY (not the text) matters for cost: higher-order
    lambdas block common-subexpression elimination, so inlining
    ``split(text)`` here would re-tokenize each document several times per
    reference (the q_repetition lesson — measured ~6× on that operator).
    Callers stage ``split(text, ' ') AS toks`` once in a projection.
    """
    return (
        "array_distinct(CASE WHEN size({t}) >= {n} THEN "
        "transform(sequence(1, size({t}) - {n1}), "
        "i -> concat_ws(' ', slice({t}, i, {n}))) "
        "ELSE array() END)").format(n=n, n1=n - 1, t=toks)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every non-benchmark document,
    count its distinct word-5-grams that also appear in the benchmark set
    (documents with ``doc_id % BENCH_MOD == 0`` play the benchmark role).

    Plan shape at 100 TB: the benchmark set is eval suites — MBs, not TBs —
    so its distinct n-gram table is **broadcast**; the corpus side is one
    ``explode_outer`` + broadcast-hash LEFT probe + per-doc count, all
    map-side except the final doc-grain aggregation (key = unique doc_id
    ⇒ skew-free). Documents with zero overlap (or too few tokens for any
    n-gram) survive as the ``explode_outer`` null row with an unmatched
    probe, so no separate corpus-spine scan + join-back is needed — the
    old third scan of the table is gone (two corpus passes remain: the
    benchmark n-gram build and the probe, the algorithmic floor).
    """
    docs = load(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.split("text", " ").alias("toks"))
    ngrams = F.expr(_word_ngrams_expr(CONTAM_NGRAM))
    bench = (staged.where(F.col("doc_id") % BENCH_MOD == 0)
             .select(F.explode(ngrams).alias("g")).distinct()
             .withColumn("_m", F.lit(1)))
    corpus = staged.where(F.col("doc_id") % BENCH_MOD != 0)
    return (corpus.select("doc_id", F.explode_outer(ngrams).alias("g"))
            .join(F.broadcast(bench), "g", "left")
            .groupBy("doc_id")
            .agg(F.count("_m").cast("bigint")
                 .alias("n_contaminated_ngrams"))
            .withColumn("contaminated",
                        F.col("n_contaminated_ngrams") > 0))


# ---------------------------------------------------------------------------
# q_repetition

REPETITION_THRESHOLD = 0.2  # dup-trigram ratio above this ⇒ flag


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals: fraction of duplicate words / word-bigrams
    / word-trigrams per document (1 − distinct/total over full windows).

    All integer counting inside one codegen'd scan; the ratios are a single
    IEEE division + subtraction each (bit-identical across engines — no
    rounding needed). No shuffle. The token array is projected ONCE and the
    three ratios derive from it — higher-order lambdas block Spark's
    common-subexpression elimination, so letting each ratio re-derive
    ``split(text)`` costs ~8 tokenizations per row (measured 3.6 s → 0.6 s
    at sf0.1 for this rewrite).
    """
    docs = load(spark, sf_dir, "documents")

    def ratio(n: int):
        total = (f"greatest(size(toks) - {n - 1}, 0)" if n > 1
                 else "size(toks)")
        # the n>1 arm IS _word_ngrams_expr — one definition, no drift
        grams = (_word_ngrams_expr(n) if n > 1
                 else "array_distinct(toks)")
        return F.expr(
            f"CASE WHEN {total} <= 0 THEN 0.0 ELSE "
            f"1.0 - CAST(size({grams}) AS DOUBLE) / {total} END")

    staged = (docs.select("doc_id", F.split("text", " ").alias("toks"))
              .select("doc_id",
                      ratio(1).alias("dup_word_ratio"),
                      ratio(2).alias("dup_bigram_ratio"),
                      ratio(3).alias("dup_trigram_ratio")))
    return staged.withColumn(
        "is_repetitive", F.col("dup_trigram_ratio") > REPETITION_THRESHOLD)


# ---------------------------------------------------------------------------
# q_lm_score

RARE_TF_MAX = 2  # corpus frequency at or below which a token counts as rare


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency scoring (the CCNet/KenLM-style perplexity-proxy
    quality filter, with the LM trained on the corpus itself): per document,
    the average log-probability of its tokens under the corpus unigram
    distribution, plus the rare-token occurrence ratio (gibberish signal).

    Scale shape: term statistics aggregate to a vocabulary-sized table
    (map-side combined; vocabulary ≪ corpus for natural text) that joins
    back onto the postings. The join strategy is deliberately left to the
    optimizer: with AQE, a vocabulary under the broadcast threshold is
    broadcast at runtime, and a web-scale vocabulary (billions of distinct
    terms — where a forced broadcast would OOM every executor) falls back
    to a shuffled hash join on ``term``; term frequency follows a Zipf
    distribution, so that fallback leans on AQE's skew-join splitting,
    which the session enables. The per-doc aggregation's key (doc_id) is
    unique ⇒ skew-free.

    Portability: a float sum over a doc's tokens is summation-order-
    sensitive, so each term's log-prob (computed ONCE per term, after
    integer-exact aggregation) is cast to ``decimal(28,12)`` before the
    per-doc SUM — decimal addition is exact and order-free, making the
    hash-compare robust; the single final divide happens in double.
    """
    docs = load(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    # The vocabulary-sized term table is checkpointed so its TWO
    # consumers (the N fold below and the scored join side) read the
    # materialized rows instead of each re-running the corpus explode.
    # Exchange reuse cannot be relied on here: per-branch column
    # pruning drops the grouping key from the N-fold branch's aggregate
    # OUTPUT list ([tf] vs [term, tf]), so the two exchanges never
    # canonicalize equal. The checkpoint is per-invocation (persist's
    # CacheManager would dedupe repeated plans ACROSS bench reps) and
    # SIZE-GATED (r12): the driver's r11 bench priced the unconditional
    # materialization at 0.74× — below the conf'd input bar the two
    # extra tokenize passes are cheaper than the round-trip, at scale
    # the collapse stands. N = Σ tf — folded from the vocabulary table,
    # NOT a third corpus explode.
    tstats = checkpoint_if_big(
        postings.groupBy("term").agg(F.count("*").alias("tf")))
    total = tstats.agg(
        F.coalesce(F.sum("tf"), F.lit(0)).alias("n_total"))
    lp = F.log(F.col("tf").cast("double") / F.col("n_total").cast("double"))
    scored = (tstats.crossJoin(F.broadcast(total))
              .select("term", "tf", lp.cast("decimal(28,12)").alias("lp")))
    return (postings.join(scored, "term")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum((F.col("tf") <= RARE_TF_MAX).cast("long"))
                  .alias("n_rare"),
                 (F.sum("lp").cast("double") / F.count("*"))
                  .alias("avg_logprob"))
            .withColumn("rare_ratio",
                        F.col("n_rare").cast("double") / F.col("n_tokens")))


# ---------------------------------------------------------------------------
# q_tfidf

TFIDF_TOP = 20


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term statistics: document frequency, total term
    frequency, and tf-idf score per term; top terms by score.

    The aggregation is integer-exact (counts combined map-side; per-term
    state is two counters no matter how common the term), and the double
    math happens exactly once per term *after* aggregation — so the result
    hash-matches across engines despite floating point (no
    order-of-summation hazard). ``ln(N/df)`` uses the corpus size via a
    1-row cross-join, keeping the plan fully declarative (no driver
    collect).
    """
    docs = load(spark, sf_dir, "documents")
    postings = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    stats = (postings.groupBy("term")
             .agg(F.count_distinct("doc_id").alias("df"),
                  F.count("*").alias("tf_total")))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = (F.col("tf_total").cast("double")
             * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")))
    return (stats.crossJoin(F.broadcast(n))
            .select("term", "df", "tf_total", score.alias("tfidf"))
            .orderBy(F.desc("tfidf"), F.asc("term"))
            .limit(TFIDF_TOP))


# ---------------------------------------------------------------------------
# q_bm25

BM25_QUERY = ["spark", "query", "vector"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 15


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring of every document against a fixed query, top-N.

    Shape at scale: per-document term frequencies come from one codegen'd
    scan (``size(filter(tokens, …))`` per query term — the query is O(10)
    terms, not a join); corpus stats (N, avgdl, per-term df) aggregate to a
    single broadcastable row. The score is a fixed-order sum of per-term
    closed forms over integer inputs, so it is bit-identical across engines
    — no rounding, exact hash-match.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    def _tf(term):
        # closure (not a default arg): F.filter treats a 2-parameter lambda
        # as the (element, index) form
        return F.size(F.filter(toks, lambda w: w == term))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(BM25_QUERY)]
    per_doc = docs.select("doc_id", F.size(toks).cast("bigint").alias("dl"),
                          *tf_cols)
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(BM25_QUERY))])

    def term_score(i: int):
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}").cast("double") + F.lit(0.5)) + F.lit(1.0))
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl"))
        return idf * (tf * F.lit(BM25_K1 + 1.0)) / denom

    score = term_score(0)
    for i in range(1, len(BM25_QUERY)):
        score = score + term_score(i)
    return (per_doc.crossJoin(F.broadcast(stats))
            .select("doc_id", "dl",
                    *[F.col(f"tf_{i}").cast("bigint").alias(f"tf_{t}")
                      for i, t in enumerate(BM25_QUERY)],
                    score.alias("bm25"))
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(BM25_TOP))


# ---------------------------------------------------------------------------
CURATION_QUALITY_MIN = 0.5


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the composed pipeline a training-data
    job actually ships, stacked from this package's individually
    oracle-checked stages:

    1. exact dedup — keep the lowest doc_id per sha-256 content hash;
    2. near-dup dedup — keep only each connected component's
       representative (``q_dedup_groups``' min-doc_id label over the
       exact n-gram near-dup graph);
    3. quality gate — composite score (``q_quality_score``'s formula)
       ≥ ``CURATION_QUALITY_MIN``;
    4. embedding availability — the doc has a vector (vec_id = doc_id).

    All gates are broadcast-able id sets applied as semi-joins onto one
    documents scan — at 100 TB each stage's id list is written to the lake
    and the joins shuffle on doc_id; no stage ever re-reads another's
    inputs. The DuckDB oracle restates the full four-stage pipeline in one
    CTE chain, so the COMPOSITION (not just each stage) is hash-checked.
    """
    from .dedup import q_dedup_groups
    from .text import q_dedup_exact, q_quality_score

    docs = load(spark, sf_dir, "documents")
    # reuse the exact-dedup OPERATOR so the composed pipeline can never
    # drift from the per-stage rule it claims to stack
    exact_keep = q_dedup_exact(spark, sf_dir).select("doc_id")
    near_keep = (q_dedup_groups(spark, sf_dir)
                 .where(F.col("doc_id") == F.col("group_id"))
                 .select("doc_id"))
    quality_keep = (q_quality_score(spark, sf_dir)
                    .where(F.col("quality_score") >= CURATION_QUALITY_MIN)
                    .select("doc_id"))
    has_vec = (load(spark, sf_dir, "embeddings")
               .select(F.col("vec_id").alias("doc_id")))
    return (docs.join(exact_keep, "doc_id", "left_semi")
            .join(near_keep, "doc_id", "left_semi")
            .join(quality_keep, "doc_id", "left_semi")
            .join(has_vec, "doc_id", "left_semi")
            .select("doc_id", "lang", "source", "n_chars"))


def _curation_oracle() -> str:
    """One CTE chain restating all four curation gates (reuses the ngram
    near-dup pair CTEs from dedup.py and the quality formula from
    text.py, so the stages cannot drift from their per-stage oracles)."""
    from .dedup import _NGRAM_PAIRS_CTES
    from .text import _SW_SQL

    return (
        f"WITH RECURSIVE {_NGRAM_PAIRS_CTES}, "
        "e2 AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs "
        "UNION ALL SELECT doc_id_b, doc_id_a FROM pairs), "
        "reach(id, lab) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e2.dst, r.lab FROM reach r JOIN e2 ON e2.src = r.id), "
        "grp AS (SELECT id AS doc_id, MIN(lab) AS group_id "
        "FROM reach GROUP BY id), "
        "near_keep AS (SELECT doc_id FROM grp WHERE doc_id = group_id), "
        "exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents "
        "GROUP BY sha256(text)), "
        "quality AS (SELECT doc_id, alpha_ratio * 0.5 + "
        "stopword_ratio * 0.3 + LEAST(mean_tok_len / 10.0, 1.0) * 0.2 AS s "
        "FROM (SELECT doc_id, "
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) "
        "/ len(string_split(text, ' ')) AS mean_tok_len, "
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) "
        "/ CAST(n_chars AS DOUBLE) AS alpha_ratio, "
        "CAST(len(list_filter(string_split(text, ' '), "
        f"w -> w IN {_SW_SQL})) AS DOUBLE) / len(string_split(text, ' ')) "
        "AS stopword_ratio FROM documents)), "
        "quality_keep AS (SELECT doc_id FROM quality "
        f"WHERE s >= {CURATION_QUALITY_MIN}), "
        "vec AS (SELECT DISTINCT vec_id AS doc_id FROM embeddings) "
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d "
        "JOIN exact_keep ek ON d.doc_id = ek.doc_id "
        "JOIN near_keep nk ON d.doc_id = nk.doc_id "
        "JOIN quality_keep qk ON d.doc_id = qk.doc_id "
        "JOIN vec v ON d.doc_id = v.doc_id")


# registry + DuckDB oracles

# ---------------------------------------------------------------------------
# q_gopher_rules

GOPHER_MIN_WORDS = 20        # corpus-tuned (Gopher's 50 would fail every
GOPHER_MAX_WORDS = 100_000   # 10-99-word synthetic doc); rule SHAPE is the
GOPHER_MIN_MWL = 3           # published one: word-count bounds, mean-word-
GOPHER_MAX_MWL = 10          # length bounds, alpha-word fraction, stop-word
GOPHER_MIN_ALPHA = 0.8       # presence
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with", "a"]
GOPHER_MIN_STOPS = 2         # distinct stop words required


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, §A1.1's
    repetition-free subset — the repetition signals live in
    ``q_repetition``): per doc, word-count bounds, mean-word-length
    bounds, the fraction of words containing an alphabetic character, and
    the presence of ≥ ``GOPHER_MIN_STOPS`` distinct stop words; plus the
    combined pass flag a curation pipeline filters on.

    Engine-portable by construction — the flag contains NO float
    comparisons: mean word length is exactly ``(length(text) − (n−1)) / n``
    (split on single space), so ``3 ≤ mwl ≤ 10`` is the integer test
    ``3n ≤ chars ≤ 10n``, and ``frac_alpha ≥ 0.8`` is ``5·alpha ≥ 4·n``.
    The float columns are descriptive only (rounded). One codegen'd scan:
    split + two flat array filters, no shuffle, no Python.

    NULL text is excluded explicitly (same discipline as
    ``q_dedup_substring``): Spark's ``size(split(NULL))`` yields −1 and
    would emit n_words=-1 / pass=false where the SQL oracle yields NULL —
    out-of-scope rows must not reach the rule arithmetic at all."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = F.split("text", " ")
    n = F.size(w)
    word_chars = F.length("text") - (n - 1)
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_stop = F.size(F.filter(
        F.lit(GOPHER_STOPS), lambda s: F.array_contains(w, s)))
    ok = ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
          & (word_chars >= GOPHER_MIN_MWL * n)
          & (word_chars <= GOPHER_MAX_MWL * n)
          & (F.lit(5) * n_alpha >= F.lit(4) * n)
          & (n_stop >= GOPHER_MIN_STOPS))
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(word_chars.cast("double") / n, 6).alias("mean_word_len"),
        F.round(n_alpha.cast("double") / n, 6).alias("frac_alpha"),
        n_stop.alias("n_stop"),
        ok.alias("pass_gopher"))


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-unigram Shannon entropy per document (bits/word), plus
    type-token ratio — the information-density quality signals a curation
    pipeline thresholds on: near-zero entropy flags generated/looping
    junk, near-log2(n) entropy flags random token soup, and TTR is the
    classic lexical-diversity measure alongside ``q_repetition``'s window
    ratios.

    Scale shape: the canonical word-count plan — explode → partial-agg'd
    ``groupBy(doc_id, word)`` (map-side combine collapses each doc's
    repeats BEFORE the exchange, so the shuffle carries one row per
    distinct (doc, word)) → per-doc fold. Entropy uses the exact-count
    identity H = log2(n) − Σ c·log2(c)/n so all accumulation is over
    integer counts; the single float division/log happens once per doc,
    and 6-dp rounding absorbs cross-engine summation-order ulps (same
    discipline as the jaccard/cosine oracles). NULL/empty text excluded
    explicitly (q_gopher_rules' NULL discipline)."""
    docs = (load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull() & (F.length("text") > 0)))
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    agg = (counts.groupBy("doc_id")
           .agg(F.sum("c").alias("n"),
                F.count("*").alias("nu"),
                F.sum(F.col("c").cast("double") * F.log2("c")).alias("s")))
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_words"),
        F.col("nu").cast("bigint").alias("n_unique"),
        F.round(F.log2("n") - F.col("s") / F.col("n"), 6).alias("entropy"),
        F.round(F.col("nu").cast("double") / F.col("n"), 6).alias("ttr"))


WINSOR_LO = 0.05  # clamp bounds: the conventional p05/p95 winsorization
WINSOR_HI = 0.95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — outlier clamping at exact interpolated
    p05/p95, the robust-statistics step metric pipelines run before
    averaging quality scores (clipping beats dropping when every row
    must survive). Output per event type: the bounds, how many rows each
    side clamped, and the clamped sum.

    Scale shape: ONE pass computes both percentiles per group (Spark's
    ``percentile`` is a single partial-aggregable sketchless aggregate —
    exact, mergeable state = sorted count map per group, bounded by
    distinct values per group), broadcast back onto the fact scan for
    the clamp — no second shuffle of the fact table. Exactness note:
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition, and interpolating between two doubles is
    the same IEEE arithmetic on both engines, so the bounds (and every
    clamp decision) match bit-for-bit."""
    ev = load_events(spark, sf_dir).select("event_type", "value")
    bounds = (ev.groupBy("event_type")
              .agg(F.percentile("value", F.lit(WINSOR_LO)).alias("lo"),
                   F.percentile("value", F.lit(WINSOR_HI)).alias("hi")))
    clamped = (ev.join(F.broadcast(bounds), "event_type")
               .withColumn("cv", F.least(F.greatest("value", F.col("lo")),
                                         F.col("hi"))))
    return (clamped.groupBy("event_type")
            .agg(F.round(F.min("lo"), 6).alias("p05"),
                 F.round(F.min("hi"), 6).alias("p95"),
                 F.sum((F.col("value") < F.col("lo")).cast("long"))
                 .alias("n_clamped_lo"),
                 F.sum((F.col("value") > F.col("hi")).cast("long"))
                 .alias("n_clamped_hi"),
                 F.round(F.sum("cv"), 2).alias("winsorized_sum")))


MAD_K = 3.0  # |value − median| > K·MAD flags an outlier (Hampel rule)


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    Hampel identifier (|x − med| > K·MAD), which unlike q_anomaly's
    z-score does not let the outliers themselves inflate the spread
    estimate. Two exact interpolated medians per group (value, then
    absolute deviation), each a single partial-aggregable percentile
    pass with the tiny bounds table broadcast back onto the fact scan —
    the q_winsorize shape twice, no fact-side re-shuffle. Both medians
    and every comparison are the same IEEE doubles on both engines
    (percentile ≡ quantile_cont), so the flag counts are exact."""
    ev = load_events(spark, sf_dir).select("event_type", "value")
    med = (ev.groupBy("event_type")
           .agg(F.percentile("value", F.lit(0.5)).alias("med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("value") - F.col("med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.min("med").alias("med"),
                F.percentile("adev", F.lit(0.5)).alias("mad")))
    flagged = (ev.join(F.broadcast(mad), "event_type")
               .withColumn("is_out",
                           (F.abs(F.col("value") - F.col("med"))
                            > MAD_K * F.col("mad")).cast("long")))
    return (flagged.groupBy("event_type")
            .agg(F.round(F.min("med"), 6).alias("median_value"),
                 F.round(F.min("mad"), 6).alias("mad"),
                 F.sum("is_out").alias("n_outliers"),
                 F.count("*").alias("n")))


ENSEMBLE_KEEP = 100  # documents surviving the fused-quality gate


def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality fusion by RANK aggregation (Borda count):
    three cheap signals — document length, type-token ratio, alphabetic
    fraction — each rank documents independently, and the fused score
    is the rank sum. Rank fusion is the robust alternative to z-score
    averaging for heterogeneous signals (no scale normalization, no
    outlier leverage) — and on two engines it is EXACT, because ranks
    are integers from a total order (signal DESC, doc_id) while a
    z-score's stddev inherits float summation order.

    Scale shape: one codegen'd scan computes all three signals, which
    STACK into (doc_id, signal, value) long format — ranking all three
    in ONE :func:`distributed_prefix` pass grouped by signal name (a
    global ``row_number`` window would sort the whole corpus in one
    task; the two-phase range-partitioned rank never does). The fused
    score folds back with a per-doc groupBy, and the final keep is
    TakeOrderedAndProject on (borda, doc_id). Signals cast to double
    for the shared rank column — exact for any count below 2^53."""
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.filter(F.split("text", " "), lambda x: x != "").alias("w"))
    sig = w.select(
        "doc_id", "n_chars",
        (F.size(F.array_distinct("w")) / F.size("w")).alias("ttr"),
        (F.size(F.filter("w", lambda x: x.rlike("^[A-Za-z]+$")))
         / F.size("w")).alias("alpha_frac"))
    stacked = (sig.select("doc_id", F.explode(F.array(
        F.struct(F.lit("len").alias("s"),
                 F.col("n_chars").cast("double").alias("v")),
        F.struct(F.lit("ttr").alias("s"), F.col("ttr").alias("v")),
        F.struct(F.lit("alpha").alias("s"),
                 F.col("alpha_frac").alias("v")))).alias("x"))
        .select("doc_id", "x.s", "x.v"))
    ranked = distributed_prefix(
        stacked, [("v", "desc"), "doc_id"], "r", group_cols=["s"])

    def pick(name):
        return F.max(F.when(F.col("s") == name, F.col("r")))

    return (ranked.groupBy("doc_id")
            .agg(pick("len").alias("r_len"),
                 pick("ttr").alias("r_ttr"),
                 pick("alpha").alias("r_alpha"))
            .withColumn("borda",
                        F.col("r_len") + F.col("r_ttr") + F.col("r_alpha"))
            .orderBy("borda", "doc_id")
            .limit(ENSEMBLE_KEEP))


QUERIES = {
    "q_winsorize": q_winsorize,
    "q_mad_outliers": q_mad_outliers,
    "q_quality_ensemble": q_quality_ensemble,
    "q_curation_pipeline": q_curation_pipeline,
    "q_pii_redact": q_pii_redact,
    "q_lm_score": q_lm_score,
    "q_contamination": q_contamination,
    "q_repetition": q_repetition,
    "q_tfidf": q_tfidf,
    "q_bm25": q_bm25,
    "q_gopher_rules": q_gopher_rules,
    "q_entropy": q_entropy,
}


def _duck_ngrams(n: int) -> str:
    """DuckDB mirror of :func:`_word_ngrams_expr` (1-based inclusive slice)."""
    return (
        "list_distinct(CASE WHEN len(string_split(text, ' ')) >= {n} THEN "
        "list_transform(range(1, len(string_split(text, ' ')) - {n1} + 1), "
        "i -> array_to_string(list_slice(string_split(text, ' '), i, i + {n1}), ' ')) "
        "ELSE [] END)").format(n=n, n1=n - 1)


# DuckDB string literals keep backslashes verbatim; only quotes need escaping.
_DUCK_PII = _PII_PATTERN.replace("'", "''")

_DUCK_RATIO = (
    "CASE WHEN {total} <= 0 THEN 0.0 ELSE "
    "1.0 - CAST(len({grams}) AS DOUBLE) / ({total}) END")


def _duck_ratio(n: int) -> str:
    if n == 1:
        return _DUCK_RATIO.format(
            total="len(string_split(text, ' '))",
            grams="list_distinct(string_split(text, ' '))")
    return _DUCK_RATIO.format(
        total=f"greatest(len(string_split(text, ' ')) - {n - 1}, 0)",
        grams=_duck_ngrams(n))


_BM25_TERM_SCORE = (
    "(ln((CAST(n_docs AS DOUBLE) - df_{i} + 0.5) / "
    "(CAST(df_{i} AS DOUBLE) + 0.5) + 1.0) * "
    "(CAST(tf_{i} AS DOUBLE) * {k1p1}) / "
    "(CAST(tf_{i} AS DOUBLE) + {k1} * ({omb} + {b} * "
    "CAST(dl AS DOUBLE) / avgdl)))")

_GOPHER_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + "]"

ORACLES = {
    "q_quality_ensemble": (
        "WITH w AS (SELECT doc_id, CAST(length(text) AS BIGINT) "
        "AS n_chars, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "sig AS (SELECT doc_id, n_chars, "
        "len(list_distinct(w)) / len(w) AS ttr, "
        "len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$'))) "
        "/ len(w) AS alpha_frac FROM w), "
        "ranked AS (SELECT doc_id, "
        "CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) "
        "AS BIGINT) AS r_len, "
        "CAST(ROW_NUMBER() OVER (ORDER BY ttr DESC, doc_id) "
        "AS BIGINT) AS r_ttr, "
        "CAST(ROW_NUMBER() OVER (ORDER BY alpha_frac DESC, doc_id) "
        "AS BIGINT) AS r_alpha FROM sig) "
        "SELECT doc_id, r_len, r_ttr, r_alpha, "
        "r_len + r_ttr + r_alpha AS borda FROM ranked "
        f"ORDER BY borda, doc_id LIMIT {ENSEMBLE_KEEP}"),
    "q_mad_outliers": (
        "WITH ev AS (SELECT event_type, value FROM events), "
        "m AS (SELECT event_type, quantile_cont(value, 0.5) AS med "
        "FROM ev GROUP BY event_type), "
        "d AS (SELECT ev.event_type, value, med, abs(value - med) AS adev "
        "FROM ev JOIN m USING (event_type)), "
        "md AS (SELECT event_type, min(med) AS med, "
        "quantile_cont(adev, 0.5) AS mad FROM d GROUP BY event_type) "
        "SELECT ev.event_type, round(min(md.med), 6) AS median_value, "
        "round(min(md.mad), 6) AS mad, "
        "CAST(sum(CASE WHEN abs(value - md.med) > "
        f"{MAD_K} * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, "
        "count(*) AS n "
        "FROM ev JOIN md USING (event_type) GROUP BY ev.event_type"),
    "q_winsorize": (
        "WITH ev AS (SELECT event_type, value "
        "FROM (SELECT event_type, value FROM events)), "
        "b AS (SELECT event_type, "
        f"quantile_cont(value, {WINSOR_LO}) AS lo, "
        f"quantile_cont(value, {WINSOR_HI}) AS hi "
        "FROM ev GROUP BY event_type) "
        "SELECT ev.event_type, "
        "round(min(lo), 6) AS p05, round(min(hi), 6) AS p95, "
        "CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_clamped_lo, "
        "CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_clamped_hi, "
        "round(sum(least(greatest(value, lo), hi)), 2) "
        "AS winsorized_sum "
        "FROM ev JOIN b ON ev.event_type = b.event_type "
        "GROUP BY ev.event_type"),
    "q_curation_pipeline": _curation_oracle(),
    "q_gopher_rules": (
        "WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w "
        "FROM documents WHERE text IS NOT NULL), "
        "s AS (SELECT doc_id, len(w) AS n, "
        "length(text) - (len(w) - 1) AS wc, "
        "len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS na, "
        f"len(list_filter({_GOPHER_STOPS_SQL}, "
        "sw -> list_contains(w, sw))) AS ns FROM d) "
        "SELECT doc_id, CAST(n AS INT) AS n_words, "
        "round(CAST(wc AS DOUBLE) / n, 6) AS mean_word_len, "
        "round(CAST(na AS DOUBLE) / n, 6) AS frac_alpha, "
        "CAST(ns AS INT) AS n_stop, "
        f"(n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS} "
        f"AND wc >= {GOPHER_MIN_MWL} * n AND wc <= {GOPHER_MAX_MWL} * n "
        f"AND 5 * na >= 4 * n AND ns >= {GOPHER_MIN_STOPS}) AS pass_gopher "
        "FROM s"),
    "q_entropy": (
        "WITH pos AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents WHERE text IS NOT NULL AND length(text) > 0), "
        "counts AS (SELECT doc_id, w, COUNT(*) AS c FROM pos GROUP BY 1, 2), "
        "agg AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nu, "
        "SUM(c * log2(c)) AS s FROM counts GROUP BY 1) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_words, "
        "CAST(nu AS BIGINT) AS n_unique, "
        "ROUND(log2(n) - s / n, 6) AS entropy, "
        "ROUND(CAST(nu AS DOUBLE) / n, 6) AS ttr FROM agg"),
    "q_lm_score": (
        "WITH postings AS (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS term FROM documents), "
        "tstats AS (SELECT term, COUNT(*) AS tf FROM postings GROUP BY term), "
        "tot AS (SELECT COUNT(*) AS n_total FROM postings), "
        "scored AS (SELECT term, tf, CAST(ln(CAST(tf AS DOUBLE) / "
        "(SELECT CAST(n_total AS DOUBLE) FROM tot)) AS DECIMAL(28,12)) AS lp "
        "FROM tstats) "
        "SELECT p.doc_id, COUNT(*) AS n_tokens, "
        f"CAST(SUM(CASE WHEN s.tf <= {RARE_TF_MAX} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_rare, "
        "CAST(SUM(s.lp) AS DOUBLE) / COUNT(*) AS avg_logprob, "
        f"CAST(SUM(CASE WHEN s.tf <= {RARE_TF_MAX} THEN 1 ELSE 0 END) "
        "AS DOUBLE) / COUNT(*) AS rare_ratio "
        "FROM postings p JOIN scored s USING (term) GROUP BY p.doc_id"),
    "q_pii_redact": (
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{_DUCK_PII}')) AS BIGINT) "
        "AS n_redacted, "
        f"sha256(regexp_replace(text, '{_DUCK_PII}', '{PII_TOKEN}', 'g')) "
        "AS redacted_sha FROM documents"),
    "q_contamination": (
        f"WITH ng AS (SELECT doc_id, {_duck_ngrams(CONTAM_NGRAM)} AS gs "
        "FROM documents), "
        f"bench AS (SELECT DISTINCT unnest(gs) AS g FROM ng "
        f"WHERE doc_id % {BENCH_MOD} = 0), "
        f"corpus AS (SELECT doc_id, unnest(gs) AS g FROM ng "
        f"WHERE doc_id % {BENCH_MOD} <> 0), "
        "hits AS (SELECT c.doc_id, COUNT(*) AS n_hits FROM corpus c "
        "JOIN bench b ON c.g = b.g GROUP BY c.doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_ngrams, "
        "COALESCE(h.n_hits, 0) > 0 AS contaminated "
        f"FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id "
        f"WHERE d.doc_id % {BENCH_MOD} <> 0"),
    "q_repetition": (
        "SELECT doc_id, "
        f"{_duck_ratio(1)} AS dup_word_ratio, "
        f"{_duck_ratio(2)} AS dup_bigram_ratio, "
        f"{_duck_ratio(3)} AS dup_trigram_ratio, "
        f"{_duck_ratio(3)} > {REPETITION_THRESHOLD} AS is_repetitive "
        "FROM documents"),
    "q_tfidf": (
        "WITH postings AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS term FROM documents), "
        "stats AS (SELECT term, COUNT(DISTINCT doc_id) AS df, "
        "COUNT(*) AS tf_total FROM postings GROUP BY term) "
        "SELECT term, df, tf_total, "
        "CAST(tf_total AS DOUBLE) * ln(CAST("
        "(SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)) "
        "AS tfidf FROM stats "
        f"ORDER BY tfidf DESC, term LIMIT {TFIDF_TOP}"),
    "q_bm25": (
        "WITH per_doc AS (SELECT doc_id, len(string_split(text, ' ')) AS dl, "
        + ", ".join(
            f"len(list_filter(string_split(text, ' '), w -> w = '{t}')) "
            f"AS tf_{i}" for i, t in enumerate(BM25_QUERY))
        + " FROM documents), "
        "stats AS (SELECT COUNT(*) AS n_docs, "
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, "
        + ", ".join(
            f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
            for i in range(len(BM25_QUERY)))
        + " FROM per_doc) "
        "SELECT doc_id, dl, "
        + ", ".join(
            f"CAST(tf_{i} AS BIGINT) AS tf_{t}"
            for i, t in enumerate(BM25_QUERY))
        + ", "
        + " + ".join(
            _BM25_TERM_SCORE.format(i=i, k1p1=BM25_K1 + 1.0, k1=BM25_K1,
                                    omb=1.0 - BM25_B, b=BM25_B)
            for i in range(len(BM25_QUERY)))
        + " AS bm25 FROM per_doc CROSS JOIN stats "
        f"ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}"),
}
