"""Multimodal (binary) column operators (SURVEY §2.D q_multimodal).

Pattern for image/audio/video at 100 TB: payloads are opaque ``binary``
columns travelling next to a typed metadata struct; decode / feature-extract /
resize run as Arrow-batched ``mapInPandas`` over partition-sized batches, so
Python touches each byte once and the shuffle plan stays columnar.

The container has no image/audio codecs, so ``decode_stub`` is a clearly
marked deterministic fake (documented NotImplementedError path for real
codecs); the Spark-side plumbing — binary schema, metadata struct, Arrow batch
shape, mapInPandas signature — is real and driver-checked: ``q_multimodal``
derives byte-level features whose oracle is plain SQL over the same bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load

FEATURE_SCHEMA = ("doc_id bigint, byte_len bigint, first_byte bigint, "
                  "last_byte bigint, media_type string")


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real media decode.

    A production build would dispatch on ``media_type`` to PIL / torchaudio /
    pyav here. Those libraries are unavailable in this container, so only
    byte-level features are produced; requesting a true pixel/waveform decode
    raises.
    """
    if media_type not in ("text/plain",):
        raise NotImplementedError(
            f"no codec for {media_type!r} in this environment")
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
    }


def to_binary_table(docs: DataFrame) -> DataFrame:
    """documents → multimodal layout: opaque binary payload + metadata struct."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(F.lit("text/plain").alias("media_type"),
                 F.col("source").alias("origin"),
                 F.col("n_chars").alias("n_chars")).alias("meta"))


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_stub(p, m) for p, m in
                     zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "byte_len": [f["byte_len"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "last_byte": [f["last_byte"] for f in feats],
                "media_type": pdf["media_type"].values,
            })
            yield out

    flat = binary_df.select("doc_id", "payload",
                            F.col("meta.media_type").alias("media_type"))
    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(to_binary_table(docs))


QUERIES = {"q_multimodal": q_multimodal}

ORACLES = {
    "q_multimodal": (
        "SELECT doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, "
        "CAST(CASE WHEN length(text) > 0 THEN ord(substring(text, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte, "
        "CAST(CASE WHEN length(text) > 0 THEN ord(substring(text, length(text), 1)) ELSE -1 END AS BIGINT) AS last_byte, "
        "'text/plain' AS media_type FROM documents"),
}
