"""Near-duplicate detection operators (SURVEY §2.D q_dedup_near family).

Four scale strategies over the documents/embeddings tables:

- ``q_dedup_minhash``: MinHash+LSH — shingle → minhash signatures → banded
  LSH candidate join → exact shingle-Jaccard verify. The standard 100 TB
  text-dedup path: candidate generation is a hash-bucket equi-join, never an
  all-pairs product.
- ``q_dedup_simhash``: 64-bit SimHash signatures via JVM-side xxhash64 of
  tokens + per-bit votes; near-dups collide on band keys.
- ``q_dedup_ngram``: exact character-n-gram Jaccard over a *rare-token
  inverted index* — candidate pairs share a token whose document frequency
  is in [2, DF_CAP], so no blocking key can exceed DF_CAP documents
  (skew-free by construction; a first-token blocking key would put every
  "the"-initial document in one quadratic block).
- ``q_dedup_embedding``: embedding-cosine near-dup pairs via
  *block-partitioned GEMM*: both sides are hashed into B row-blocks and each
  of the B·(B+1)/2 block pairs computes its cosine submatrix independently —
  exact all-pairs results with per-task memory bounded by the block size and
  zero driver-side data movement.

``q_dedup_embedding`` and ``q_dedup_ngram`` have exact DuckDB oracles; the
minhash/simhash ones are algorithm-specific (rows-only checks) but seeded
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Index builds are serialized (one per process) and the scratch dirs are
# keyed by corpus path + content fingerprint — see common.build_once /
# common.corpus_tag (hoisted there in r9 so the streaming sources share
# the exact same contract; these were the r8-local definitions).
from .common import build_once as _build_once
from .common import corpus_tag as _corpus_tag
from .common import load, scratch_dir


def _spread(df, spark) -> "DataFrame":
    """Repartition a small-file table to cluster parallelism before
    compute-heavy per-row work. Test-scale artifact with a real-scale
    rationale: one parquet file under ``maxPartitionBytes`` yields ONE input
    partition, serializing the expensive shingle/signature lambdas (and any
    broadcast join downstream keeps that partitioning). The shuffle moves
    only the raw rows (~MBs); at 100 TB the source is many files and this
    becomes a cheap no-op-ish rebalance."""
    return df.repartition(spark.sparkContext.defaultParallelism)

SHINGLE_SIZE = 5
EMB_DUP_THRESHOLD = 0.4
JACCARD_THRESHOLD = 0.4
SIMHASH_BITS = 64


def _shingle_expr(n=SHINGLE_SIZE) -> str:
    """SQL expression producing distinct char n-grams of `text`."""
    return (f"array_distinct(transform(sequence(1, greatest(length(text) - {n - 1}, 1)), "
            f"i -> substring(text, i, {n})))")


def _hashed_shingle_expr(n=SHINGLE_SIZE) -> str:
    """Distinct xxhash64'd char n-grams (bigint array).

    Set sizes — and therefore Jaccard — are identical to the string-shingle
    sets modulo 64-bit collisions (P ≈ |sh|²·2⁻⁶⁴ ≈ 1e-14 per doc), while
    intersections compare primitive longs instead of strings: the per-pair
    verify cost drops ~10× and candidate payloads shrink ~3×.
    """
    return (f"array_distinct(transform(sequence(1, greatest(length(text) - {n - 1}, 1)), "
            f"i -> xxhash64(substring(text, i, {n}))))")


NUM_MINHASHES = 128
LSH_BANDS = 32          # 32 bands × 4 rows = 128 signatures
LSH_ROWS = NUM_MINHASHES // LSH_BANDS
MINHASH_SIM_THRESHOLD = 0.5


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs — native banded implementation.

    shingle → xxhash64 → 128 affine-mixed minhashes → 32 bands of 4 →
    explode bands → band-bucket self-equi-join (the only quadratic-risk
    step; it is an equi-join on uniformly-distributed hash keys, never an
    all-pairs product) → exact shingle-Jaccard verify on the candidates.

    LSH generates candidates; the *exact* Jaccard (recomputed JVM-side from
    the documents table) decides membership, so the minhash signatures never
    gate the final answer — they only bound the candidate set. We replaced
    ``pyspark.ml.feature.MinHashLSH`` here: its LSH uses one row per band,
    so on a high-overlap corpus ~every pair becomes a candidate and
    ``approxSimilarityJoin`` degenerates to an all-pairs join (measured
    >15 min at sf0.1 vs seconds for this plan).

    At 100 TB: candidates scale with true-duplicate density, band join keys
    are uniformly distributed (hash values) so the shuffle is skew-free, and
    the signature stage reads each doc exactly once. The signature table
    materializes under ``scratch_dir`` (``spark.tvx.scratch.dir`` — shared
    storage on a cluster), NOT a driver-local temp path.

    Rows-only check: the hash family is engine-specific. Deterministic
    (xxhash64 is a fixed-seed keyed hash).
    """
    import os

    # One xxhash64 per shingle (JVM-side string work), then 128
    # "permutations" as universal hashes (a·x + b) mod p, p = 2³¹−1
    # (Carter-Wegman family), computed in numpy: per doc the whole signature
    # is one broadcasted (128 × |sh|) modular matrix op — ~20× faster than
    # per-element SQL higher-order lambdas and immune to their interpreter
    # overhead variance.
    p = 2147483647
    rnd = __import__("random").Random(42)
    mult = [rnd.randrange(1, p) for _ in range(NUM_MINHASHES)]
    offs = [rnd.randrange(0, p) for _ in range(NUM_MINHASHES)]

    def signatures(batches):
        import numpy as np
        import pandas as pd

        a = np.array(mult, dtype=np.int64)[:, None]
        b = np.array(offs, dtype=np.int64)[:, None]
        # position tag packed into the high 32 bits (values are < 2³¹): the
        # positional-equality count of two signatures then equals
        # array_intersect size — a codegen'd native set op — instead of an
        # interpreted zip_with/aggregate lambda over every pair
        pos = np.arange(NUM_MINHASHES, dtype=np.int64) << 32
        # per-doc (128 × |sh|) matmul loop. A fully-batched variant (one
        # concatenated matrix + minimum.reduceat segmented mins) was
        # measured ~2× SLOWER warm (0.74 s vs 1.43 s for the stage at
        # sf0.1): the giant intermediate blows L2 and the per-doc numpy
        # dispatch it saves is cheaper than the extra memory traffic.
        for pdf in batches:
            sigs = []
            for sh in pdf["sh"]:
                x = np.asarray(sh, dtype=np.int64) % p
                sigs.append((((a * x + b) % p).min(axis=1)) | pos)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    sig = (_spread(load(spark, sf_dir, "documents"), spark)
           .select("doc_id", F.expr(_hashed_shingle_expr()).alias("sh"))
           .mapInPandas(signatures, "doc_id long, sig array<long>"))
    # Materialize the NARROW signature table (doc_id + 128 longs — the
    # shingle arrays stay out of it) to parquet rather than .persist(): both
    # band sides would otherwise recompute the Python signature stage
    # whenever cache pressure evicts blocks; a disk materialization is
    # immune to eviction and is exactly what a production pipeline does
    # with a signature table.
    # Reused across calls via the _SUCCESS probe (same in-process contract
    # as the ngram-keys index): the signature table is content-pure per
    # corpus digest, and recomputing the Python signature stage per call
    # is exactly the recompute a production pipeline persists to avoid.
    sig_dir = scratch_dir(spark, f"minhash-sig-{_corpus_tag(sf_dir)}")
    _build_once(spark, sig_dir,
                lambda: sig.write.mode("overwrite").parquet(sig_dir))
    sig = spark.read.parquet(sig_dir)
    # NARROW band join: only (doc_id, 64-bit band key) rides the band
    # shuffle — 16-byte rows instead of rows carrying the 1 KB signature
    # array (which at 100 TB is an O(corpus × 32 × 1 KB) exchange). The
    # estimated-Jaccard gate still runs BEFORE pair dedup — on a
    # high-overlap corpus the band join admits ~every moderately-similar
    # pair (363k at sf0.1, 256 real), so filtering early shrinks the
    # distinct() to the survivors — but the signatures are equi-joined
    # back onto the candidate pairs from the materialized sig table: AQE
    # broadcasts it while it fits (5 MB at sf0.1) and falls back to a
    # candidate-sized shuffle join at scale, both strictly smaller than
    # shipping signatures through the band exchange. The estimate itself
    # is a native array_intersect — the position tag packed into each
    # signature value makes positional equality a set operation
    # (codegen'd) instead of an interpreted zip_with/aggregate lambda.
    # Measured ~12% faster end-to-end than the sig-through-the-band-
    # shuffle plan at sf0.1 (2.3–2.4 s vs 2.7 s warm), and an earlier
    # narrow variant that ran distinct() BEFORE the estimate gate
    # measured 2× slower — gate placement is the load-bearing part.
    banded = sig.select("doc_id", F.explode(F.expr(
        f"transform(sequence(0, {LSH_BANDS - 1}), "
        f"b -> xxhash64(b, slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS})))"
        )).alias("band"))
    a = banded.select(F.col("doc_id").alias("doc_id_a"), "band")
    b = banded.select(F.col("doc_id").alias("doc_id_b"), "band")
    pairs = (a.join(b, "band")
             .where(F.col("doc_id_a") < F.col("doc_id_b"))
             .select("doc_id_a", "doc_id_b"))
    sig_a = sig.select(F.col("doc_id").alias("doc_id_a"),
                       F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("doc_id").alias("doc_id_b"),
                       F.col("sig").alias("sig_b"))
    est = (F.size(F.array_intersect("sig_a", "sig_b")).cast("double")
           / F.lit(float(NUM_MINHASHES)))
    survivors = (pairs.join(sig_a, "doc_id_a").join(sig_b, "doc_id_b")
                 .where(est >= MINHASH_SIM_THRESHOLD)
                 .select("doc_id_a", "doc_id_b")
                 .distinct())
    # Materialize the (tiny: scales with true-dup density, not corpus size)
    # survivor set: the verify consumes it three times — probe side plus a
    # doc-id prune for EACH payload side — and without this every consumer
    # re-runs the whole band join. Then re-derive shingles ONLY for
    # surviving docs (semi-join before the shingle expr): the exact-verify
    # cost becomes O(survivors), not O(corpus). Measured 3.9 s → <1 s for
    # the verify stage at sf0.1 (256 survivors over 5000 docs). A persist()
    # variant (skipping this write job) measured faster solo but bimodal
    # and ~1.3 s slower inside the full bench session — the parquet
    # roundtrip keeps the AQE-planned, cache-independent shape.
    surv_dir = scratch_dir(spark, f"minhash-surv-{_corpus_tag(sf_dir)}")
    _build_once(spark, surv_dir,
                lambda: survivors.write.mode("overwrite").parquet(surv_dir))
    survivors = spark.read.parquet(surv_dir)
    ids = (survivors.select(F.col("doc_id_a").alias("doc_id"))
           .unionByName(survivors.select(F.col("doc_id_b").alias("doc_id")))
           .distinct())
    docs_sh = (load(spark, sf_dir, "documents")
               .join(F.broadcast(ids), "doc_id")
               .select("doc_id", F.expr(_hashed_shingle_expr()).alias("sh")))
    payload_a = docs_sh.select(F.col("doc_id").alias("doc_id_a"),
                               F.col("sh").alias("sh_a"))
    payload_b = docs_sh.select(F.col("doc_id").alias("doc_id_b"),
                               F.col("sh").alias("sh_b"))
    exact = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
             / F.size(F.array_union("sh_a", "sh_b")))
    return (survivors
            .join(payload_a, "doc_id_a").join(payload_b, "doc_id_b")
            .select("doc_id_a", "doc_id_b", F.round(exact, 6).alias("jaccard"))
            .where(F.col("jaccard") >= MINHASH_SIM_THRESHOLD))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, all JVM-side:

    token → xxhash64 → per-bit ±1 votes over the token set → sign bits.
    Deterministic (xxhash64 is seeded); rows-only check (bit math isn't
    portable to the oracle).
    """
    docs = _spread(load(spark, sf_dir, "documents"), spark)
    n = SIMHASH_BITS
    # SQL higher-order functions so the per-bit loop stays inside codegen;
    # getbit() accepts a lambda-bound bit index (unlike the DSL's shiftleft).
    simhash = F.expr(f"""
      aggregate(
        transform(sequence(0, {n - 1}), b ->
          if(aggregate(
               transform(array_distinct(split(text, ' ')), w -> xxhash64(w)),
               0,
               (acc, h) -> acc + if(getbit(h, b) = 1, 1, -1)) > 0,
             if(b = 63, cast(-9223372036854775808 as bigint), shiftleft(cast(1 as bigint), b)),
             cast(0 as bigint))),
        cast(0 as bigint), (acc, x) -> acc | x)
    """)
    return (docs.select("doc_id", simhash.alias("simhash"))
            .orderBy("doc_id"))


NGRAM_DF_CAP = 50     # a blocking shingle joins at most this many documents
NGRAM_BLOCK_KEYS = 5  # each document indexes under its K rarest shingles


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs over a rare-shingle inverted index.

    Candidate generation: explode distinct char-5-gram shingles, count each
    shingle's document frequency (groupBy with map-side combine — bounded
    aggregation state even for corpus-common shingles), keep shingles with
    df in [2, NGRAM_DF_CAP], join the rare set back onto the postings,
    and index every document under its
    NGRAM_BLOCK_KEYS *rarest* surviving shingles (row_number window over
    doc_id ordered by (df, shingle) — the string tie-break makes the
    ranking reproducible in the oracle). Candidates are the self-join of
    those postings. Two independent bounds kill quadratic blocks: a key
    matches ≤ NGRAM_DF_CAP documents (so ≤ DF_CAP²/2 pairs per key — the
    failure mode of the previous first-token scheme, where every
    "the"-initial document landed in one skewed block), and a document
    fans out to ≤ K keys (so candidate volume ≤ K·DF_CAP·N — without the
    per-doc cap, an overlap-heavy corpus degenerates toward all-pairs:
    measured 104k candidate pairs over 500 docs vs 7.7k with it).

    Recall is heuristic, as for any bounded blocking: a pair is found iff
    it shares a ranked rare shingle. On template-heavy corpora where even
    duplicate pairs only share corpus-common shingles (this testdata: the
    rarest SHARED shingle of a true pair reaches df≈290), df-capped
    blocking misses pairs that q_dedup_minhash — whose banded LSH keys are
    similarity-based, not frequency-based — still finds; minhash +
    exact-verify is the recall path at scale, this operator is the
    oracle-checkable exact-Jaccard path.

    Verification computes the exact shingle Jaccard per candidate
    (xxhash64'd shingles, JVM-side — value-identical to string sets). The
    DuckDB oracle mirrors the blocking exactly, so this is hash-checked
    end to end. All shuffles are linear and skew-free (df groupBy combines
    map-side; the window partitions by unique doc_id).
    """
    docs, cand = _rare_shingle_candidates(spark, sf_dir)
    docs_sh = docs.select("doc_id", F.expr(_hashed_shingle_expr()).alias("sh"))
    pa = docs_sh.select(F.col("doc_id").alias("doc_id_a"),
                        F.col("sh").alias("sh_a"))
    pb = docs_sh.select(F.col("doc_id").alias("doc_id_b"),
                        F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.round(inter / union, 6)
    # exact pre-prune: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose set
    # sizes differ by >1/τ can never qualify — cheap size compare before the
    # O(|A|+|B|) intersect (cannot change the result set)
    ratio_ok = ((F.size("sh_a") >= JACCARD_THRESHOLD * F.size("sh_b"))
                & (F.size("sh_b") >= JACCARD_THRESHOLD * F.size("sh_a")))
    return (cand.join(pa, "doc_id_a").join(pb, "doc_id_b")
            .where(ratio_ok)
            .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


def _rare_shingle_candidates(spark: SparkSession, sf_dir: str):
    """Shared rare-shingle candidate generator (the blocking stage of
    ``q_dedup_ngram``, reused verbatim by ``q_dedup_containment``):
    returns ``(docs, cand)`` where ``cand`` is the distinct
    (doc_id_a < doc_id_b) candidate-pair set keyed by shared rare
    shingles. See q_dedup_ngram's docstring for the two skew bounds
    (df ≤ NGRAM_DF_CAP per key, ≤ NGRAM_BLOCK_KEYS keys per doc)."""
    import os

    from pyspark.sql import Window

    docs = _spread(load(spark, sf_dir, "documents"), spark)
    postings = docs.select("doc_id",
                           F.explode(F.expr(_shingle_expr())).alias("g"))
    # df via groupBy COUNT (map-side combine: O(1) aggregation state per
    # shingle — a corpus-common shingle like ' the ' costs one counter, not
    # one buffered doc list), filtered to the rare set, then joined back
    # onto a second postings pass to recover the rare postings. Rejected
    # alternatives: df as COUNT(*) OVER (PARTITION BY g) shuffles AND sorts
    # all ~1M postings before the filter can drop 99% of them (measured
    # 5.5 s at sf0.1); a one-pass groupBy with collect_list(doc_id) looks
    # faster (~0.5 s at sf0.1) but buffers EVERY doc id of corpus-common
    # shingles in a single aggregation state before the cap filter can
    # discard them — an O(corpus) single-key buffer at scale, exactly the
    # skew hazard this operator exists to avoid.
    # materialize the tiny key table once, REUSED across calls AND across
    # the ngram/containment pair: scratch paths are namespaced per driver
    # process (common.scratch_dir) and per corpus path digest, and the
    # index is content-pure — so the second operator over the same corpus
    # skips the whole posting pipeline (measured at sf0.1: containment
    # 5.1 s cold → 1.3 s reusing ngram's index). The candidate self-join also consumes the
    # table twice, which is why it is materialized even on first compute
    # (scratch_dir = shared storage on a real cluster).
    keys_dir = scratch_dir(spark, f"ngram-keys-{_corpus_tag(sf_dir)}")
    rare = (postings.groupBy("g").agg(F.count("*").alias("df"))
            .where((F.col("df") >= 2) & (F.col("df") <= NGRAM_DF_CAP)))
    # The broadcast hint assumes the rare-shingle table fits the
    # driver; on a web-scale corpus (where MOST distinct shingles are
    # rare) drop the hint and let AQE choose — the fallback shuffle
    # join on g is still skew-free by construction (every surviving
    # key has df ≤ NGRAM_DF_CAP).
    ranked = (postings.join(F.broadcast(rare), "g")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "g")))
              .where(F.col("rn") <= NGRAM_BLOCK_KEYS)
              .select("doc_id", "g"))
    _build_once(spark, keys_dir,
                lambda: ranked.write.mode("overwrite").parquet(keys_dir))
    ranked = spark.read.parquet(keys_dir)
    cand = (ranked.alias("a").join(ranked.alias("b"), "g")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_id_a"),
                    F.col("b.doc_id").alias("doc_id_b"))
            .distinct()
            # candidate pairs are few BYTES but each costs an
            # O(|sh_a|+|sh_b|) exact-Jaccard verify downstream — AQE's
            # byte-based coalescing would funnel them into ONE task
            # (measured: 4.6 s single-task verify vs 0.7 s spread).
            # Explicit round-robin keeps the compute-bound stage wide.
            .repartition(spark.sparkContext.defaultParallelism))
    return docs, cand


CONTAIN_THRESHOLD = 0.8


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-CONTAINMENT near-dup pairs: |A∩B| / min(|A|, |B|) ≥ 0.8 —
    Broder's containment coefficient, the asymmetric companion to
    ``q_dedup_ngram``'s Jaccard. Jaccard under-scores subset relations
    (a doc quoted inside a 10× larger one has J ≈ 0.1 but containment
    ≈ 1.0); this is the detector for quote inclusion, boilerplate
    wrapping, and doc-in-doc duplication that prefix/suffix containment
    misses when the embedding has leading AND trailing novel text.

    Scale shape: identical to q_dedup_ngram — the shared rare-shingle
    candidate join (both skew bounds apply) — but the verify stage keeps
    NO size-ratio pre-prune: a tiny-in-huge pair is exactly what must
    survive. Per-pair cost stays O(|A|+|B|) JVM-side set math."""
    docs, cand = _rare_shingle_candidates(spark, sf_dir)
    docs_sh = docs.select("doc_id", F.expr(_hashed_shingle_expr()).alias("sh"))
    pa = docs_sh.select(F.col("doc_id").alias("doc_id_a"),
                        F.col("sh").alias("sh_a"))
    pb = docs_sh.select(F.col("doc_id").alias("doc_id_b"),
                        F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cont = F.round(inter / F.least(F.size("sh_a"),
                                   F.size("sh_b")).cast("double"), 6)
    return (cand.join(pa, "doc_id_a").join(pb, "doc_id_b")
            .select("doc_id_a", "doc_id_b", cont.alias("containment"))
            .where(F.col("containment") >= CONTAIN_THRESHOLD))


# Rows per GEMM block. 256 keeps the multi-block path exercised at the test
# scale factors; production would raise it (8–16k ⇒ ~8–16 MB per block side)
# via this constant — per-task memory is O(2·block_rows·dim·8B) regardless
# of table size.
EMB_BLOCK_ROWS = 256


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold, a<b).

    Exact all-pairs via *block-partitioned matrix product*: rows are hashed
    into B blocks; each of the B·(B+1)/2 unordered block pairs (i ≤ j)
    becomes one ``applyInPandas`` group that BLAS-multiplies its two
    submatrices and emits only above-threshold pairs. A row participates as
    the "left" side of block pairs (k, j≥k) and the "right" side of (i≤k, k)
    — the explode-based replication is a map-side fan-out, no driver
    collect, no broadcast of the table. Replaces the round-1 plan that
    ``.collect()``ed the full embeddings table to the driver (a driver OOM
    at 100 TB).

    Scale shape: per-task memory is bounded by 2·EMB_BLOCK_ROWS·dim floats
    no matter how large the table; the shuffle replicates each row B+1
    times. All-pairs work is inherently O(N²) — this exact baseline is the
    verification path; the IVF bucketing in similarity.py is the
    sub-quadratic path when N makes N² infeasible.
    """
    import math

    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()  # parquet footer count — metadata, not a data collect
    nblocks = max(1, math.ceil(n / EMB_BLOCK_ROWS))

    blk = F.pmod(F.xxhash64("vec_id"), F.lit(nblocks)).cast("int")
    base = emb.select("vec_id", "embedding", blk.alias("blk"))
    left = base.select(
        "vec_id", "embedding", F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(nblocks - 1))).alias("bj"),
        F.lit(0).alias("side"))
    right = base.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"), F.lit(1).alias("side"))

    def block_pairs(key, pdf):
        bi, bj = key
        lhs = pdf[pdf["side"] == 0]
        rhs = pdf[pdf["side"] == 1]
        if lhs.empty or rhs.empty:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [],
                                 "cos_sim": []}).astype(
                {"vec_id_a": "int64", "vec_id_b": "int64",
                 "cos_sim": "float64"})
        l_ids = lhs["vec_id"].to_numpy(dtype=np.int64)
        r_ids = rhs["vec_id"].to_numpy(dtype=np.int64)
        l_mat = np.array(list(lhs["embedding"]), dtype=np.float64)
        r_mat = np.array(list(rhs["embedding"]), dtype=np.float64)
        l_n = np.sqrt((l_mat * l_mat).sum(axis=1))
        r_n = np.sqrt((r_mat * r_mat).sum(axis=1))
        cos = np.round((l_mat @ r_mat.T) / np.outer(l_n, r_n), 6)
        if bi == bj:
            # both orientations of every in-block pair are present: keep a<b
            mask = (cos >= EMB_DUP_THRESHOLD) & (l_ids[:, None] < r_ids[None, :])
            li, ri = np.nonzero(mask)
            a_ids, b_ids = l_ids[li], r_ids[ri]
        else:
            # cross-block pairs appear exactly once; order ids afterwards
            li, ri = np.nonzero(cos >= EMB_DUP_THRESHOLD)
            a_ids = np.minimum(l_ids[li], r_ids[ri])
            b_ids = np.maximum(l_ids[li], r_ids[ri])
        return pd.DataFrame({"vec_id_a": a_ids, "vec_id_b": b_ids,
                             "cos_sim": cos[li, ri]})

    return (left.unionByName(right)
            .groupBy("bi", "bj")
            .applyInPandas(block_pairs,
                           "vec_id_a long, vec_id_b long, cos_sim double"))


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus update — the production dedup shape: a NEW batch
    of documents (here the ``doc_id % 5 == 4`` slice plays the arrivals)
    is deduplicated against the EXISTING corpus by content hash, keeping
    only novel documents. Corpus-side work is one hash projection (in
    production, a pre-materialized hash index maintained per ingest — the
    minhash signature table in this module is the near-dup analogue); the
    anti-join is a hash-partitioned equi-join, never a rescan-and-regroup
    of corpus+batch together. Full-batch recompute (``q_dedup_exact``'s
    shape) at 100 TB costs O(corpus) per ingest; this costs
    O(batch + index probe)."""
    docs = load(spark, sf_dir, "documents")
    arriving = F.pmod(F.col("doc_id"), F.lit(5)) == 4
    base_hashes = (docs.where(~arriving)
                   .select(F.md5("text").alias("h")).distinct())
    new = docs.where(arriving).withColumn("h", F.md5("text"))
    return (new.join(base_hashes, "h", "left_anti")
            .select("doc_id", "lang", "source"))


SEMDEDUP_K = 8          # coarse clusters; K ∝ N at scale bounds block size
SEMDEDUP_THRESHOLD = 0.4


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings around K coarse centroids, then drop any vector that
    has a higher-priority near-twin *within its own cluster* — the
    clustering turns the quadratic all-pairs cosine into K bounded
    within-cluster blocks, which is what makes semantic dedup tractable on
    a web-scale corpus.

    Deterministic and fully oracle-checked: centroids are the K lowest
    vec_ids, assignment is max-cosine (ties toward the higher centroid id,
    exactly as q_sim_ann_ivf), and pruning is pairwise — a vector is
    dropped iff some lower vec_id in its cluster has cosine ≥ threshold
    (no order-dependent greedy chain).

    Scale shape: assignment is one Arrow-batched numpy pass against the
    broadcast K×d centroid matrix (the q_kmeans kernel — one BLAS matmul
    per batch replaces K interpreted higher-order-lambda traversals per
    row); each cluster is one ``applyInPandas`` group whose
    task computes a BLAS self-product — per-task memory O(rows·dim +
    rows²) bounded by choosing K ∝ N (and, for clusters that still
    overflow the bound, the same block-pair decomposition as
    q_dedup_embedding nests inside a cluster). No driver collect beyond
    the K centroid rows.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    cents = (emb.orderBy("vec_id").limit(SEMDEDUP_K)
             .select("vec_id", "embedding").collect())
    cent_ids = np.array([int(r.vec_id) for r in cents], dtype=np.int64)
    cent_mat = np.array([[float(x) for x in r.embedding] for r in cents],
                        dtype=np.float64)
    cent_mat = cent_mat / np.sqrt((cent_mat * cent_mat)
                                  .sum(axis=1, keepdims=True))

    def assign(batches):
        # max-cosine assignment as one BLAS product per Arrow batch, ties
        # toward the higher cent_id (cent_ids ascend, so scan columns
        # high-id-first) — same kernel discipline as q_kmeans: Spark's
        # higher-order-function lambdas are interpreted, and K=8 of them
        # per row cost ~8 array traversals this one matmul replaces
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            mat = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            cos = mat @ cent_mat.T
            k = cent_mat.shape[0]
            idx = (k - 1) - np.argmax(cos[:, ::-1], axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": pdf["embedding"],
                                "cluster": cent_ids[idx]})

    assigned = (emb.select("vec_id", "embedding")
                .mapInPandas(assign,
                             "vec_id long, embedding array<float>, "
                             "cluster long"))

    def prune(key, pdf):
        (cluster,) = key
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(list(pdf["embedding"].iloc[order]), dtype=np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round((mat @ mat.T) / np.outer(nrm, nrm), 6)
        # vector j pruned iff any i<j in the cluster is a near-twin
        dup = np.triu(cos >= SEMDEDUP_THRESHOLD, k=1).any(axis=0)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": np.full(len(ids), cluster, dtype=np.int64),
            "kept": ~dup})

    return (assigned.groupBy("cluster")
            .applyInPandas(prune, "vec_id long, cluster long, kept boolean"))


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the exact
    near-dup pair graph (``q_dedup_ngram`` edges), labeling every document
    with the minimum doc_id of its component — the canonical representative
    a dedup pipeline keeps.

    Distributed min-label propagation over the *edge-touched vertices only*
    — documents in no near-dup pair can never change label, so they bypass
    the loop entirely and rejoin as singletons at the end (at corpus scale
    duplicates are a small fraction, so the iterated table is orders of
    magnitude smaller than the corpus). Each vertex starts as its own label;
    each round propagates labels one hop along the (symmetrized) edge set
    and keeps the minimum; fixpoint after O(component diameter) rounds.
    Labels are monotonically non-increasing, so "sum of labels unchanged"
    is an exact convergence test costing one scalar aggregate per round (no
    row-comparison join). Each round is one equi-join + one map-side-
    combined min-groupBy; labels re-materialize to scratch parquet per
    round so the plan/lineage stays O(1) deep regardless of iteration count
    (the classic iterative-algorithm-on-Spark discipline; GraphX/
    GraphFrames use the same shape). Near-dup components are tiny and
    near-clique in practice, so rounds ≈ 2–3; the edge table is
    materialized once and reused by every round.

    Oracle: DuckDB recursive CTE computing min reachable id over the same
    edge set — exact hash-match including singleton documents.
    """
    tag = _corpus_tag(sf_dir)
    edge_dir = scratch_dir(spark, f"dedup-edges-{tag}")
    _build_once(spark, edge_dir,
                lambda: (q_dedup_ngram(spark, sf_dir)
                         .select("doc_id_a", "doc_id_b")
                         .write.mode("overwrite").parquet(edge_dir)))
    edges = spark.read.parquet(edge_dir)
    sym = (edges.select(F.col("doc_id_a").alias("src"),
                        F.col("doc_id_b").alias("dst"))
           .unionByName(edges.select(F.col("doc_id_b").alias("src"),
                                     F.col("doc_id_a").alias("dst"))))

    labels = (sym.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")))
    lab_dir = scratch_dir(spark, f"dedup-labels-{tag}")
    prev_sum = None
    for it in range(64):  # diameter bound; near-dup graphs converge in ~3
        neigh = (sym.join(labels, sym.src == labels.doc_id)
                 .select(F.col("dst").alias("doc_id"), "label")
                 .groupBy("doc_id").agg(F.min("label").alias("nbr_label")))
        labels = (labels.join(neigh, "doc_id", "left")
                  .select("doc_id",
                          F.least("label", F.coalesce("nbr_label", "label"))
                           .alias("label")))
        step_dir = f"{lab_dir}-{it % 2}"
        labels.write.mode("overwrite").parquet(step_dir)
        labels = spark.read.parquet(step_dir)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    from pyspark.sql import Window

    singletons = (load(spark, sf_dir, "documents")
                  .join(labels, "doc_id", "left_anti")
                  .select("doc_id", F.col("doc_id").alias("label")))
    return (labels.unionByName(singletons)
            .withColumnRenamed("label", "group_id")
            .withColumn("group_size",
                        F.count("*").over(Window.partitionBy("group_id"))
                         .cast("bigint")))


PREFIX_BLOCK = 64  # blocking-key length; docs shorter than this are out
                   # of scope (full-equality dups are q_dedup_exact's job)
BLOCK_DF_CAP = 100  # a prefix/suffix/fuzzy blocking key joins at most this
                    # many documents — the NGRAM_DF_CAP analogue for the
                    # char-block families. A boilerplate block shared by B
                    # docs ("Terms of Service …" headers) would otherwise
                    # yield O(B²) candidate pairs; dropping keys above the
                    # cap bounds every block at cap²/2 pairs and is the
                    # documented recall bound: pairs whose ONLY shared
                    # block is corpus-hot are template text, not pairwise
                    # duplication. Testdata max block df is 4 at sf0.1, so
                    # the cap never fires there (oracles stay in lockstep
                    # by applying the same QUALIFY bound).

_LOG = __import__("logging").getLogger(__name__)

_BLOCKCAP_REPORT_DEADLINE_S = 600  # reporter-thread lifetime bound


def _cap_hot_blocks(keys: DataFrame, op: str) -> DataFrame:
    """Drop rows whose ``blk`` document frequency exceeds ``BLOCK_DF_CAP``
    (read at call time so tests can plant a tiny cap), and log how many
    rows the cap removed.

    Applied to the BUILD side of the candidate self-join only: a pair
    needs both roles, so removing hot-block rows from one side already
    suppresses every pair of a hot block while the probe side's hot rows
    hash against an empty build bucket — O(B) instead of O(B²), no
    second filter needed. (It also must be one-sided mechanically: the
    metrics node below may appear only once in the final plan, and the
    probe side is a second reference to the same subtree.)

    Logging is free at query time: an ``Observation`` rides the existing
    scan (no extra job), and a daemon thread polls for the metrics with
    a BOUNDED lifetime (``_BLOCKCAP_REPORT_DEADLINE_S``) — a plan that
    is only built, never executed (explain-only audits), costs one
    thread for minutes, not forever; a blocking ``Observation.get``
    would park until process exit and accumulate in long-lived drivers.
    Only the FIRST execution of the plan is observed (Spark registers
    an Observation once) — re-executions reuse the cap silently."""
    import threading
    import time

    from pyspark.sql import Observation, Window

    cap = BLOCK_DF_CAP
    w = Window.partitionBy("blk")
    keyed = keys.withColumn("_blk_df", F.count(F.lit(1)).over(w))
    obs = Observation()
    keyed = keyed.observe(
        obs,
        F.coalesce(F.sum((F.col("_blk_df") > cap).cast("long")),
                   F.lit(0)).alias("hot_rows"),
        F.coalesce(F.max("_blk_df"), F.lit(0)).alias("max_df"))

    def _report():
        # The non-parking probe rides pyspark's private _jo attribute
        # plus a private[sql] JVM method. Probe capability ONCE, on the
        # first iteration: under Spark Connect (no _jo) or after an API
        # change it logs that reporting is unavailable instead of
        # silently swallowing the AttributeError on every poll — the
        # drop warning is the only signal that recall was bounded
        # (driver ADVICE r10 #1). The probe runs in this daemon thread,
        # not at plan-build time, because a successful empty probe
        # parks <=100 ms JVM-side — a per-call build tax otherwise.
        try:
            probe = obs._jo.getRowOrEmpty
            probe()
        except Exception:  # noqa: BLE001 — Connect / API drift
            _LOG.warning(
                "%s: block-cap drop reporting unavailable on this "
                "pyspark (no Observation._jo non-parking probe) — the "
                "cap still applies, but dropped-row counts will not be "
                "logged", op)
            return
        deadline = time.monotonic() + _BLOCKCAP_REPORT_DEADLINE_S
        while time.monotonic() < deadline:
            try:
                # non-parking probe: waits <=100 ms JVM-side, then
                # returns an empty Option until the metrics land
                if not probe().isEmpty():
                    m = obs.get
                    break
            except Exception:  # noqa: BLE001 — query failed / session gone
                return
            time.sleep(1.0)
        else:
            return  # never executed within the deadline: nothing to report
        if m.get("hot_rows"):
            _LOG.warning(
                "%s: block-df cap %d dropped %d rows (hottest block df=%d)"
                " — pairs inside those blocks are excluded (recall bound)",
                op, cap, m["hot_rows"], m["max_df"])

    threading.Thread(target=_report, daemon=True,
                     name=f"tvx-blockcap-{op}").start()
    return keyed.where(F.col("_blk_df") <= cap).drop("_blk_df")


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection — the step a dedup pass
    actually SHIPS: per connected near-dup component (q_dedup_groups'
    labels), keep exactly one document, chosen by a quality rule
    (longest text, doc_id tie-break) instead of "whichever row the
    shuffle saw first". Singletons survive as themselves, so the output
    is the deduplicated corpus membership.

    Scale shape: the component labels come from the shared cached edge
    index (one build per corpus), the quality join is by doc_id, and
    the pick is one row_number window per group — all shuffles keyed by
    doc_id/group_id, nothing quadratic. Oracle: the same recursive-CTE
    component labels extended with the identical ranked pick."""
    from pyspark.sql import Window

    groups = q_dedup_groups(spark, sf_dir)
    quality = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return (groups.join(quality, "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", "group_id", "group_size"))


def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/truncation duplicates: pairs where one document's text is a
    prefix of (or equal to) another's — the dup class produced by
    re-crawls that truncate, snippet extraction, and max-length cutoffs,
    which Jaccard-style near-dup passes under-score when the longer doc
    is much longer.

    Scale shape: candidate generation is an equi-join on the first
    ``PREFIX_BLOCK`` characters (a prefix relation implies equal blocks
    once both docs are ≥ the block length — shorter docs are out of
    scope by contract), so there is never an all-pairs product; the
    block key is content, distributed like any dedup hash. The block
    join carries ONLY (doc_id, length) — never document text — so the
    candidate exchange moves a few bytes per doc instead of 2× the
    corpus; text is joined back by id just for the candidate pairs, and
    the ``startswith`` verify runs on that thin slice (the texts-side
    exchange is one corpus pass, reused across both id joins). Blocks
    hotter than ``BLOCK_DF_CAP`` are dropped-and-logged (recall bound:
    boilerplate headers shared corpus-wide are template text, and an
    uncapped hot block is the one O(B²) step left in the family)."""
    base = (load(spark, sf_dir, "documents")
            .where(F.length("text") >= PREFIX_BLOCK))
    keys = base.select("doc_id",
                       F.substring("text", 1, PREFIX_BLOCK).alias("blk"),
                       F.length("text").cast("int").alias("n"))
    return _blocked_containment_pairs(
        base, keys, lambda ta, tb: tb.startswith(ta), "q_dedup_prefix")


def q_dedup_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix/truncation duplicates: pairs where one document's text is a
    SUFFIX of (or equal to) another's — the mirror of q_dedup_prefix,
    produced by header/boilerplate stripping, paywall-intro removal, and
    re-crawls that drop the lead paragraph. A Jaccard pass under-scores
    these exactly like prefix dups when the longer doc is much longer.

    Scale shape mirrors q_dedup_prefix: candidate generation is an
    equi-join on the LAST ``PREFIX_BLOCK`` characters (a suffix relation
    implies equal tail blocks once both docs are ≥ the block length), so
    never an all-pairs product; the block join exchanges (doc_id,
    length) only, and the ``endswith`` verify runs on text joined back
    by id for just the candidate pairs. Hot tail blocks (boilerplate
    footers) are capped at ``BLOCK_DF_CAP`` exactly like the prefix
    side."""
    base = (load(spark, sf_dir, "documents")
            .where(F.length("text") >= PREFIX_BLOCK))
    keys = base.select("doc_id",
                       F.expr(f"right(text, {PREFIX_BLOCK})").alias("blk"),
                       F.length("text").cast("int").alias("n"))
    return _blocked_containment_pairs(
        base, keys, lambda ta, tb: tb.endswith(ta), "q_dedup_suffix")


def _blocked_containment_pairs(base: DataFrame, keys: DataFrame,
                               verify, op: str) -> DataFrame:
    """Shared prefix/suffix shape: slim (blk, doc_id, n) candidate join,
    role-ordering so each pair appears once (a = the strictly shorter
    containee; equal lengths tie-break on id), then text joined back BY ID
    for the verify predicate. ``keys`` must carry doc_id/blk/n; ``base``
    carries doc_id/text. The build side drops blocks hotter than
    ``BLOCK_DF_CAP`` (see :func:`_cap_hot_blocks` — one side suffices)."""
    a = _cap_hot_blocks(keys, op).select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("n").alias("len_a"), "blk")
    b = keys.select(F.col("doc_id").alias("doc_id_b"),
                    F.col("n").alias("len_b"), "blk")
    cand = (a.join(b, "blk")
            .where((F.col("len_a") < F.col("len_b"))
                   | ((F.col("len_a") == F.col("len_b"))
                      & (F.col("doc_id_a") < F.col("doc_id_b"))))
            .select("doc_id_a", "doc_id_b", "len_a", "len_b"))
    texts = base.select("doc_id", "text")
    return (cand
            .join(texts.select(F.col("doc_id").alias("doc_id_a"),
                               F.col("text").alias("ta")), "doc_id_a")
            .join(texts.select(F.col("doc_id").alias("doc_id_b"),
                               F.col("text").alias("tb")), "doc_id_b")
            .where(verify(F.col("ta"), F.col("tb")))
            .select("doc_id_a", "doc_id_b", "len_a", "len_b",
                    (F.col("len_a") == F.col("len_b")).alias("exact")))


FUZZY_BLOCK = 32     # shared-prefix blocking key length
FUZZY_MAX_DIST = 16  # max edit distance (and max length difference)


def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicates: pairs within ``FUZZY_MAX_DIST``
    Levenshtein edits — the dup class token-set methods (minhash/ngram
    Jaccard) under-score when edits are single-character typos or small
    in-place rewrites that leave most shingles intact but shift others,
    and that prefix/suffix containment misses when the edit is interior.

    Scale shape mirrors q_dedup_prefix, with TWO blocking keys: an
    equi-join on the first ``FUZZY_BLOCK`` characters and one on the
    last — a pair is a candidate if it shares EITHER end, so only a doc
    edited in both its head and its tail escapes (the two-band analogue
    of MinHash-LSH banding; blocking IS the documented recall bound).
    Each block join exchanges only (doc_id, length) and pre-prunes on
    ``|len_a − len_b| ≤ max_dist`` (an edit-distance lower bound), the
    two candidate sets union-distinct, and no text moves until the
    verify: text joins back BY ID for just the candidate pairs and the
    ``levenshtein(ta, tb, threshold)`` verify is the banded O(d·n)
    JVM kernel (early-exit at threshold), not the full O(n²) DP. Each
    band drops blocks hotter than ``BLOCK_DF_CAP`` (dropped-and-logged
    recall bound — the same guard the prefix/suffix family carries)."""
    base = (load(spark, sf_dir, "documents")
            .where(F.length("text") >= FUZZY_BLOCK))

    def cand_for(blk_col, band):
        keys = base.select("doc_id", blk_col.alias("blk"),
                           F.length("text").cast("int").alias("n"))
        a = _cap_hot_blocks(keys, f"q_dedup_fuzzy[{band}]").select(
            F.col("doc_id").alias("doc_id_a"),
            F.col("n").alias("len_a"), "blk")
        b = keys.select(F.col("doc_id").alias("doc_id_b"),
                        F.col("n").alias("len_b"), "blk")
        return (a.join(b, "blk")
                .where((F.col("doc_id_a") < F.col("doc_id_b"))
                       & (F.abs(F.col("len_a") - F.col("len_b"))
                          <= FUZZY_MAX_DIST))
                .select("doc_id_a", "doc_id_b", "len_a", "len_b"))

    cand = (cand_for(F.substring("text", 1, FUZZY_BLOCK), "head")
            .unionByName(cand_for(F.expr(f"right(text, {FUZZY_BLOCK})"),
                                  "tail"))
            .distinct())
    texts = base.select("doc_id", "text")
    dist = F.levenshtein(F.col("ta"), F.col("tb"), FUZZY_MAX_DIST)
    return (cand
            .join(texts.select(F.col("doc_id").alias("doc_id_a"),
                               F.col("text").alias("ta")), "doc_id_a")
            .join(texts.select(F.col("doc_id").alias("doc_id_b"),
                               F.col("text").alias("tb")), "doc_id_b")
            .withColumn("dist", dist)
            .where(F.col("dist") >= 0)  # threshold form returns -1 above it
            .select("doc_id_a", "doc_id_b", "len_a", "len_b", "dist",
                    (F.col("dist") == 0).alias("exact")))


CDC_MOD = 4        # break after words whose length % CDC_MOD == 0
CDC_MIN_WORDS = 4  # spans shorter than this don't count as duplication
CDC_DF_CAP = 64    # boilerplate guard: chunks shared by more docs are
                   # template text, not pairwise duplication — and the cap
                   # bounds every join block (never quadratic in corpus)


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring pairs via content-defined chunking —
    the alignment-robust exact-span dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    ExactSubstr), re-expressed with the rsync/LBFS chunking trick instead
    of a suffix array: split every document at breakpoints that depend
    only on LOCAL content (after words whose length % CDC_MOD == 0), so
    a span copied between documents at ANY offset produces the same
    chunks in both — which fixed-boundary chunking (q_dedup_paragraph)
    misses whenever the copy is not chunk-aligned.

    Output: (doc_id_a, doc_id_b, n_shared, shared_chars) per document
    pair sharing ≥1 content-defined chunk of ≥ CDC_MIN_WORDS words.

    Scale shape: chunking is ONE Arrow-batched ``mapInPandas`` scan (an
    earlier pure-higher-order-function formulation — filter/transform
    over boundary arrays with slice+array_join per span — was exact but
    ~40× slower at sf0.1: Spark's array lambdas are interpreted, not
    codegen'd, and pay per-element dispatch on every word; the Python
    chunker is a linear string pass per doc, no shuffle either way).
    Pair generation is an equi-join on chunk text with document
    frequency capped at [2, CDC_DF_CAP] — the same inverted-index
    discipline as q_dedup_ngram, so no block can go quadratic and the
    join keys are content-distributed. Fully deterministic string ops
    end to end — exact DuckDB oracle."""
    import os

    import pandas as pd

    docs = load(spark, sf_dir, "documents")

    def cdc_chunks(batches):
        for pdf in batches:
            ids: list = []
            chs: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:  # NULL text ⇒ no chunks, like the
                    continue      # oracle's string_split(NULL)
                out: set = set()
                cur: list = []
                for word in text.split(" "):
                    cur.append(word)
                    if len(word) % CDC_MOD == 0:  # break AFTER this word
                        if len(cur) >= CDC_MIN_WORDS:
                            out.add(" ".join(cur))
                        cur = []
                if len(cur) >= CDC_MIN_WORDS:  # tail run to doc end
                    out.add(" ".join(cur))
                sorted_out = sorted(out)  # per-doc distinct, stable order
                ids.extend([doc_id] * len(sorted_out))
                chs.extend(sorted_out)
            yield pd.DataFrame({"doc_id": ids, "chunk": chs})

    # materialize the narrow (doc_id, chunk) postings once: three
    # consumers (df table + both join sides) would otherwise each re-scan
    # the corpus and re-run the chunking pass — the same scratch
    # discipline as q_dedup_minhash's signature table. The name digests
    # the FULL corpus path (the q_sim_ann_pq rule): two corpora sharing a
    # basename must not overwrite each other's lazily-read postings.
    postings_dir = scratch_dir(spark, f"cdc-chunks-{_corpus_tag(sf_dir)}")
    _build_once(spark, postings_dir,
                lambda: (docs.select("doc_id", "text")
                         .mapInPandas(cdc_chunks, "doc_id long, chunk string")
                         .write.mode("overwrite").parquet(postings_dir)))
    keep = spark.read.parquet(postings_dir)
    df_ok = (keep.groupBy("chunk").agg(F.count("*").alias("df"))
             .where((F.col("df") >= 2) & (F.col("df") <= CDC_DF_CAP))
             .select("chunk"))
    k = keep.join(df_ok, "chunk")
    a = k.select(F.col("doc_id").alias("doc_id_a"), "chunk")
    b = k.select(F.col("doc_id").alias("doc_id_b"), "chunk")
    return (a.join(b, "chunk")
            .where(F.col("doc_id_a") < F.col("doc_id_b"))
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.count("*").alias("n_shared"),
                 F.sum(F.length("chunk")).alias("shared_chars")))


QUERIES = {
    "q_dedup_prefix": q_dedup_prefix,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_groups": q_dedup_groups,
    "q_dedup_survivors": q_dedup_survivors,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_ngram": q_dedup_ngram,
    "q_dedup_embedding": q_dedup_embedding,
    "q_dedup_incremental": q_dedup_incremental,
    "q_dedup_substring": q_dedup_substring,
    "q_dedup_suffix": q_dedup_suffix,
    "q_dedup_fuzzy": q_dedup_fuzzy,
    "q_dedup_containment": q_dedup_containment,
    "q_semdedup": q_semdedup,
}

_NGRAM_SH = ("list_distinct(list_transform("
             "range(1, greatest(length(text) - 4, 1) + 1), "
             "i -> substring(text, i, 5)))")
# Jaccard depends only on set SIZES, which any injective-modulo-collisions
# hash preserves — DuckDB's native hash() plays the role Spark's xxhash64
# plays, making the per-pair intersects integer ops instead of string ops.
_NGRAM_SH_H = ("list_distinct(list_transform("
               "range(1, greatest(length(text) - 4, 1) + 1), "
               "i -> hash(substring(text, i, 5))))")

# Shared CTE chain ending in `cand` = the rare-shingle candidate-pair set
# (the SQL mirror of _rare_shingle_candidates); extended to `pairs` for the
# Jaccard ids and reused directly by the q_dedup_containment oracle.
_NGRAM_CAND_CTES = (
    "d AS (SELECT doc_id, "
    f"{_NGRAM_SH_H} AS sh, {_NGRAM_SH} AS sh_str FROM documents), "
    "postings AS (SELECT doc_id, unnest(sh_str) AS g FROM d), "
    "counted AS (SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS df "
    "FROM postings), "
    "ranked AS (SELECT doc_id, g, ROW_NUMBER() OVER "
    "(PARTITION BY doc_id ORDER BY df, g) AS rn "
    f"FROM counted WHERE df >= 2 AND df <= {NGRAM_DF_CAP}), "
    f"keys AS (SELECT doc_id, g FROM ranked WHERE rn <= {NGRAM_BLOCK_KEYS}), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b "
    "FROM keys a JOIN keys b ON a.g = b.g AND a.doc_id < b.doc_id)")

_NGRAM_PAIRS_CTES = (
    _NGRAM_CAND_CTES + ", "
    "pairs AS (SELECT doc_id_a, doc_id_b, jaccard FROM ("
    "SELECT c.doc_id_a, c.doc_id_b, "
    "ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / "
    "len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard "
    "FROM cand c JOIN d x ON c.doc_id_a = x.doc_id "
    "JOIN d y ON c.doc_id_b = y.doc_id) "
    f"WHERE jaccard >= {JACCARD_THRESHOLD})")

ORACLES = {
    "q_dedup_prefix": (
        "WITH d AS (SELECT doc_id, text, "
        f"substring(text, 1, {PREFIX_BLOCK}) AS blk FROM documents "
        f"WHERE length(text) >= {PREFIX_BLOCK} "
        f"QUALIFY count(*) OVER (PARTITION BY blk) <= {BLOCK_DF_CAP}) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "CAST(length(a.text) AS INT) AS len_a, "
        "CAST(length(b.text) AS INT) AS len_b, "
        "length(a.text) = length(b.text) AS exact "
        "FROM d a JOIN d b ON a.blk = b.blk "
        "WHERE (length(a.text) < length(b.text) "
        "OR (length(a.text) = length(b.text) AND a.doc_id < b.doc_id)) "
        "AND starts_with(b.text, a.text)"),
    "q_dedup_suffix": (
        "WITH d AS (SELECT doc_id, text, "
        f"right(text, {PREFIX_BLOCK}) AS blk FROM documents "
        f"WHERE length(text) >= {PREFIX_BLOCK} "
        f"QUALIFY count(*) OVER (PARTITION BY blk) <= {BLOCK_DF_CAP}) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "CAST(length(a.text) AS INT) AS len_a, "
        "CAST(length(b.text) AS INT) AS len_b, "
        "length(a.text) = length(b.text) AS exact "
        "FROM d a JOIN d b ON a.blk = b.blk "
        "WHERE (length(a.text) < length(b.text) "
        "OR (length(a.text) = length(b.text) AND a.doc_id < b.doc_id)) "
        "AND ends_with(b.text, a.text)"),
    "q_dedup_fuzzy": (
        "WITH d AS (SELECT doc_id, text, "
        f"substring(text, 1, {FUZZY_BLOCK}) AS blk_p, "
        f"right(text, {FUZZY_BLOCK}) AS blk_s, "
        "length(text) AS n FROM documents "
        f"WHERE length(text) >= {FUZZY_BLOCK}), "
        # per-band hot-block cap, mirroring _cap_hot_blocks on each band
        "dp AS (SELECT * FROM d "
        f"QUALIFY count(*) OVER (PARTITION BY blk_p) <= {BLOCK_DF_CAP}), "
        "ds AS (SELECT * FROM d "
        f"QUALIFY count(*) OVER (PARTITION BY blk_s) <= {BLOCK_DF_CAP}), "
        "cand AS (SELECT DISTINCT doc_id_a, doc_id_b, len_a, len_b FROM ("
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "CAST(a.n AS INT) AS len_a, CAST(b.n AS INT) AS len_b "
        "FROM dp a JOIN dp b ON a.blk_p = b.blk_p AND a.doc_id < b.doc_id "
        f"WHERE abs(a.n - b.n) <= {FUZZY_MAX_DIST} "
        "UNION ALL "
        "SELECT a.doc_id, b.doc_id, CAST(a.n AS INT), CAST(b.n AS INT) "
        "FROM ds a JOIN ds b ON a.blk_s = b.blk_s AND a.doc_id < b.doc_id "
        f"WHERE abs(a.n - b.n) <= {FUZZY_MAX_DIST})) "
        "SELECT doc_id_a, doc_id_b, len_a, len_b, dist, dist = 0 AS exact "
        "FROM (SELECT c.doc_id_a, c.doc_id_b, c.len_a, c.len_b, "
        "CAST(levenshtein(x.text, y.text) AS INT) AS dist "
        "FROM cand c JOIN d x ON c.doc_id_a = x.doc_id "
        "JOIN d y ON c.doc_id_b = y.doc_id) "
        f"WHERE dist <= {FUZZY_MAX_DIST}"),
    "q_dedup_ngram": (
        f"WITH {_NGRAM_PAIRS_CTES} "
        "SELECT doc_id_a, doc_id_b, jaccard FROM pairs"),
    "q_dedup_containment": (
        f"WITH {_NGRAM_CAND_CTES} "
        "SELECT doc_id_a, doc_id_b, containment FROM ("
        "SELECT c.doc_id_a, c.doc_id_b, "
        "ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / "
        "least(len(x.sh), len(y.sh)), 6) AS containment "
        "FROM cand c JOIN d x ON c.doc_id_a = x.doc_id "
        "JOIN d y ON c.doc_id_b = y.doc_id) "
        f"WHERE containment >= {CONTAIN_THRESHOLD}"),
    "q_dedup_groups": (
        # min-reachable-id per vertex == min doc_id of the connected
        # component (edge set symmetrized; every document is its own base
        # label, so singletons come out labeled with themselves)
        f"WITH RECURSIVE {_NGRAM_PAIRS_CTES}, "
        "e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs "
        "UNION ALL SELECT doc_id_b, doc_id_a FROM pairs), "
        "reach(id, lab) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id), "
        "grp AS (SELECT id AS doc_id, MIN(lab) AS group_id "
        "FROM reach GROUP BY id) "
        "SELECT doc_id, group_id, CAST(COUNT(*) OVER "
        "(PARTITION BY group_id) AS BIGINT) AS group_size FROM grp"),
    "q_dedup_survivors": (
        f"WITH RECURSIVE {_NGRAM_PAIRS_CTES}, "
        "e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs "
        "UNION ALL SELECT doc_id_b, doc_id_a FROM pairs), "
        "reach(id, lab) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id), "
        "grp AS (SELECT id AS doc_id, MIN(lab) AS group_id "
        "FROM reach GROUP BY id), "
        "g2 AS (SELECT doc_id, group_id, CAST(COUNT(*) OVER "
        "(PARTITION BY group_id) AS BIGINT) AS group_size FROM grp), "
        "j AS (SELECT g2.doc_id, g2.group_id, g2.group_size, "
        "ROW_NUMBER() OVER (PARTITION BY g2.group_id "
        "ORDER BY d.n_chars DESC, g2.doc_id) AS rn "
        "FROM g2 JOIN documents d ON g2.doc_id = d.doc_id) "
        "SELECT doc_id, group_id, group_size FROM j WHERE rn = 1"),
    "q_dedup_embedding": (
        "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, "
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) >= 0.4"),
    "q_dedup_incremental": (
        "SELECT d.doc_id, d.lang, d.source FROM documents d "
        "WHERE d.doc_id % 5 = 4 AND NOT EXISTS ("
        "SELECT 1 FROM documents b WHERE b.doc_id % 5 <> 4 "
        "AND md5(b.text) = md5(d.text))"),
    "q_dedup_substring": (
        # content-defined chunking mirror: cumulative break count BEFORE
        # each word = chunk id (Spark's boundary-pair slices produce the
        # same runs); same CDC_MIN_WORDS / df-cap gates
        "WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        "pos AS (SELECT doc_id, unnest(w) AS word, "
        "generate_subscripts(w, 1) AS p FROM docs), "
        # COALESCE inside marked: GROUP BY would otherwise bind to the raw
        # (NULL-for-first-word) window column, splitting word 1 off its run
        "marked AS (SELECT doc_id, word, p, COALESCE("
        f"SUM(CASE WHEN length(word) % {CDC_MOD} = 0 THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY doc_id ORDER BY p "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid "
        "FROM pos), "
        "chunks AS (SELECT doc_id, cid, "
        "string_agg(word, ' ' ORDER BY p) AS chunk, count(*) AS nw "
        "FROM marked GROUP BY doc_id, cid), "
        "keep AS (SELECT DISTINCT doc_id, chunk FROM chunks "
        f"WHERE nw >= {CDC_MIN_WORDS}), "
        "ok AS (SELECT chunk FROM keep GROUP BY chunk "
        f"HAVING count(*) BETWEEN 2 AND {CDC_DF_CAP}) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "CAST(count(*) AS BIGINT) AS n_shared, "
        "CAST(sum(length(a.chunk)) AS BIGINT) AS shared_chars "
        "FROM keep a JOIN ok USING (chunk) "
        "JOIN keep b ON a.chunk = b.chunk AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2"),
    "q_semdedup": (
        # same centroid rule + ARG_MAX assignment as the q_sim_ann_ivf
        # oracle; pairwise within-cluster pruning toward the lower vec_id
        f"WITH cents AS (SELECT vec_id AS cent_id, "
        "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings "
        f"ORDER BY vec_id LIMIT {SEMDEDUP_K}), "
        "assigned AS (SELECT e.vec_id, "
        "ARG_MAX(c.cent_id, list_cosine_similarity("
        "CAST(e.embedding AS DOUBLE[]), c.cv)) AS cluster "
        "FROM embeddings e CROSS JOIN cents c GROUP BY e.vec_id), "
        "av AS (SELECT a.vec_id, a.cluster, "
        "CAST(e.embedding AS DOUBLE[]) AS v "
        "FROM assigned a JOIN embeddings e USING (vec_id)), "
        "pruned AS (SELECT DISTINCT b.vec_id FROM av a JOIN av b "
        "ON a.cluster = b.cluster AND a.vec_id < b.vec_id "
        "AND ROUND(list_cosine_similarity(a.v, b.v), 6) "
        f">= {SEMDEDUP_THRESHOLD}) "
        "SELECT a.vec_id, a.cluster, p.vec_id IS NULL AS kept "
        "FROM assigned a LEFT JOIN pruned p USING (vec_id)"),
    # q_dedup_minhash / q_dedup_simhash: rows-only (hash-family-specific)
}
