"""Near-duplicate detection operators (SURVEY §2.D q_dedup_near family).

Four scale strategies over the documents/embeddings tables:

- ``q_dedup_minhash``: MinHash+LSH — shingle → minhash signatures → banded
  LSH join (Spark ML ``MinHashLSH.approxSimilarityJoin``). The standard
  100 TB text-dedup path: candidate generation is a hash-bucket equi-join,
  never an all-pairs product.
- ``q_dedup_simhash``: 64-bit SimHash signatures via JVM-side xxhash64 of
  tokens + per-bit votes; near-dups collide on band keys.
- ``q_dedup_ngram``: character-n-gram Jaccard over LSH-style candidates —
  exact verification of the shingle overlap for candidate pairs.
- ``q_dedup_embedding``: embedding-cosine near-dup pairs (exact at test SF;
  at scale the IVF bucketing from similarity.py bounds the pair space).

``q_dedup_embedding`` and ``q_dedup_ngram`` have exact DuckDB oracles; the
minhash/simhash ones are algorithm-specific (rows-only checks) but seeded
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load
from .similarity import as_double_array, cosine


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

    shingle → xxhash64 → 128 affine-mixed minhashes → 32 bands of 4 → explode bands →
    band-bucket self-equi-join (the only shuffle; never an all-pairs product)
    → signature-estimated Jaccard filter → exact shingle-Jaccard verify.

    Shingle hashing and the band/verify joins are JVM-side; the signature
    matrix is Arrow-batched numpy (see below). We replaced
    ``pyspark.ml.feature.MinHashLSH`` here: its LSH uses one row
    per band, so on a high-overlap corpus ~every pair becomes a candidate and
    ``approxSimilarityJoin`` degenerates to an all-pairs join (measured
    >15 min at sf0.1 vs seconds for this plan).

    At 100 TB: candidates scale with true-duplicate density, band join keys
    are uniformly distributed (hash values) so the shuffle is skew-free, and
    the signature stage reads each doc exactly once.

    Rows-only check: the hash family is engine-specific. Deterministic
    (xxhash64 is a fixed-seed keyed hash).
    """
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
        for pdf in batches:
            sigs = []
            for sh in pdf["sh"]:
                x = np.asarray(sh, dtype=np.int64) % p
                sigs.append(((a * x + b) % p).min(axis=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "sh": pdf["sh"], "sig": sigs})

    docs = (_spread(load(spark, sf_dir, "documents"), spark)
            .select("doc_id", F.expr(_hashed_shingle_expr()).alias("sh"))
            .mapInPandas(signatures,
                         "doc_id long, sh array<long>, sig array<long>"))
    # Materialize signatures to parquet rather than .persist(): four
    # downstream consumers (two band sides, two payload sides) would each
    # recompute the expensive signature stage whenever cache pressure evicts
    # the persisted blocks — a disk materialization is immune to eviction
    # (and is exactly what a production pipeline does with a signature table).
    import tempfile
    sig_dir = tempfile.mkdtemp(prefix="tvx-minhash-sig-")
    docs.write.mode("overwrite").parquet(sig_dir)
    docs = spark.read.parquet(sig_dir)
    # band join on NARROW rows only (doc_id, band key) — payloads (shingle
    # arrays, signatures) are re-joined after pair dedup, so the wide data
    # never rides through the candidate shuffle
    banded = docs.select("doc_id", F.explode(F.expr(
        f"transform(sequence(0, {LSH_BANDS - 1}), "
        f"b -> named_struct('idx', b, 'key', "
        f"xxhash64(slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS}))))")).alias("band"))
    a = banded.select(F.col("doc_id").alias("doc_id_a"), "band")
    b = banded.select(F.col("doc_id").alias("doc_id_b"), "band")
    pair_ids = (a.join(b, "band")
                .where(F.col("doc_id_a") < F.col("doc_id_b"))
                .select("doc_id_a", "doc_id_b")
                .distinct())
    payload_a = docs.select(F.col("doc_id").alias("doc_id_a"),
                            F.col("sh").alias("sh_a"), F.col("sig").alias("sig_a"))
    payload_b = docs.select(F.col("doc_id").alias("doc_id_b"),
                            F.col("sh").alias("sh_b"), F.col("sig").alias("sig_b"))
    est = (F.aggregate(F.zip_with("sig_a", "sig_b",
                                  lambda x, y: F.when(x == y, 1).otherwise(0)),
                       F.lit(0), lambda acc, x: acc + x)
           / F.lit(float(NUM_MINHASHES)))
    exact = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
             / F.size(F.array_union("sh_a", "sh_b")))
    return (pair_ids
            .join(payload_a, "doc_id_a").join(payload_b, "doc_id_b")
            .where(est >= MINHASH_SIM_THRESHOLD)
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


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Candidate generation: word-level inverted index on rare tokens would be
    the scale path; at driver-check scale we verify the *exact* Jaccard
    semantics with an all-pairs join on a blocking key (shared first token)
    to bound the product, then compute |A∩B|/|A∪B| on distinct 5-gram sets.
    The DuckDB oracle mirrors the same blocking; Spark-side shingles are
    xxhash64'd to longs (identical set sizes modulo negligible collisions).
    """
    docs = (_spread(load(spark, sf_dir, "documents"), spark)
            .select("doc_id",
                    F.expr(_hashed_shingle_expr()).alias("sh"),
                    F.split(F.col("text"), " ").getItem(0).alias("first_tok")))
    a = docs.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"),
                    F.col("first_tok").alias("k"))
    b = docs.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"),
                    F.col("first_tok").alias("k"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.round(inter / union, 6)
    # exact pre-prune: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose set
    # sizes differ by >1/τ can never qualify — cheap size compare before the
    # O(|A|+|B|) intersect (cannot change the result set)
    ratio_ok = ((F.size("sh_a") >= JACCARD_THRESHOLD * F.size("sh_b"))
                & (F.size("sh_b") >= JACCARD_THRESHOLD * F.size("sh_a")))
    return (a.join(b, "k")
            .where((F.col("doc_id_a") < F.col("doc_id_b")) & ratio_ok)
            .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold, a<b).

    Exact all-pairs via *blockwise matrix product*: the (smaller) right side
    is broadcast as one L2-normalized float64 matrix; ``mapInPandas`` then
    computes each Arrow batch's ``block @ M.T`` with BLAS and emits only the
    above-threshold pairs. Replaces the naive crossJoin+HOF-cosine plan
    (2M interpreted array-aggregates at sf0.1, ~33 s → sub-second GEMM).

    Scale note: this exact baseline requires the broadcast side to fit in
    executor memory (~1e6×64 f64 ≈ 0.5 GB); beyond that the IVF bucketing in
    similarity.py is the documented path (probe only same-bucket pairs).
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    mat_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in mat_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in mat_rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def pairs(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            cos = np.round(cos, 6)
            ai, bi = np.nonzero((cos >= EMB_DUP_THRESHOLD)
                                & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({"vec_id_a": a_ids[ai],
                                "vec_id_b": b_ids[bi],
                                "cos_sim": cos[ai, bi]})

    schema = "vec_id_a long, vec_id_b long, cos_sim double"
    # no _spread here: one GEMM per Arrow batch is already the fast path, and
    # fanning tiny blocks across 32 Python workers just pays 32 worker spins
    return emb.select("vec_id", "embedding").mapInPandas(pairs, schema)


QUERIES = {
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_ngram": q_dedup_ngram,
    "q_dedup_embedding": q_dedup_embedding,
}

_NGRAM_SH = ("list_distinct(list_transform("
             "range(1, greatest(length(text) - 4, 1) + 1), "
             "i -> substring(text, i, 5)))")

ORACLES = {
    "q_dedup_ngram": (
        "WITH d AS (SELECT doc_id, "
        f"{_NGRAM_SH} AS sh, "
        "string_split(text, ' ')[1] AS k FROM documents) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard "
        "FROM d a JOIN d b ON a.k = b.k AND a.doc_id < b.doc_id "
        "WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.4"),
    "q_dedup_embedding": (
        "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, "
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) >= 0.4"),
    # q_dedup_minhash / q_dedup_simhash: rows-only (hash-family-specific)
}
