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


FRAME_SCHEMA = ("doc_id bigint, frame_idx bigint, frame_offset bigint, "
                "frame_bytes binary")


def frame_sample(binary_df: DataFrame, n_frames: int = 4,
                 frame_size: int = 16) -> DataFrame:
    """Uniform frame sampling over opaque media payloads.

    The video-pipeline shape: one input row fans out to ``n_frames`` rows,
    each carrying a fixed-size byte slice ("frame") plus its index/offset.
    With a real codec the slice step becomes a pyav keyframe seek; here the
    deterministic byte slicing exercises the exact same plumbing — binary
    columns through ``mapInPandas``, 1→N fan-out inside an Arrow batch,
    stable output schema — which is what the engine is responsible for.

    Runs fully parallel per input partition; no shuffle (frame extraction is
    embarrassingly parallel; downstream groupBys shuffle on doc_id only if
    the consumer asks for per-document aggregation).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [],
                   "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(len(payload), 1)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(bytes(payload[off:off + frame_size]))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA)


def resize_stub(binary_df: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Image-resize plumbing: same mapInPandas shape as a real PIL resize.

    Without codecs the 'resize' is a deterministic byte truncation to
    ``target[0]*target[1]`` bytes (a real build decodes → resizes →
    re-encodes inside the same batch loop); requesting a non-stub decode
    raises via ``decode_stub``.
    """
    want = target[0] * target[1]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": [bytes(p[:want]) for p in pdf["payload"]],
                "width": target[0],
                "height": target[1],
            })

    return binary_df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, payload binary, width int, height int")


AUDIO_WINDOW = 32  # samples per chunk (64 bytes of 16-bit PCM)


def audio_chunk_features(binary_df: DataFrame,
                         window: int = AUDIO_WINDOW) -> DataFrame:
    """Audio-pipeline plumbing: treat each payload as a 16-bit little-
    endian PCM waveform, split it into tumbling ``window``-sample chunks
    and emit per-chunk energy features (the VAD / loudness-filter shape a
    speech-data pipeline runs before transcription).

    With a real codec the ``frombuffer`` becomes a torchaudio/pyav decode
    of the container format named in ``meta.media_type`` — the engine's
    responsibility is identical either way: binary columns through
    ``mapInPandas``, 1→N chunk fan-out inside an Arrow batch, numeric
    features out, no shuffle (embarrassingly parallel per partition). A
    trailing odd byte is dropped (not a full sample); samples read
    unsigned — a deterministic, SQL-expressible convention, so the whole
    fan-out is hash-checked against a byte-arithmetic oracle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "n_samples": [],
                   "energy": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                usable = len(payload) - (len(payload) % 2)
                if usable <= 0:
                    continue
                smp = np.frombuffer(payload[:usable],
                                    dtype="<u2").astype(np.int64)
                for ci in range(0, len(smp), window):
                    chunk = smp[ci:ci + window]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(ci // window)
                    out["n_samples"].append(len(chunk))
                    out["energy"].append(int((chunk * chunk).sum()))
                    out["peak"].append(int(chunk.max()))
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, chunk_idx bigint, n_samples int, "
                    "energy bigint, peak int")


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(to_binary_table(docs))


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM chunk energies over the binary payloads (oracle = the same
    byte-pair arithmetic in SQL; the corpus is pure ASCII so char ==
    byte, same premise q_multimodal_frames documents)."""
    docs = load(spark, sf_dir, "documents")
    return audio_chunk_features(to_binary_table(docs))


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing as a driver-checked id: the mapInPandas
    shape of a real PIL resize (decode → resize → re-encode per Arrow
    batch), with the stub's deterministic byte semantics hash-checked —
    payload truncated to 16×16 'pixels', dimensions attached. Emits a
    sha of the resized payload (the harness canonicalizes scalars)."""
    docs = load(spark, sf_dir, "documents")
    resized = resize_stub(to_binary_table(docs), target=(16, 16))
    return resized.select(
        "doc_id", "width", "height",
        F.length("payload").cast("bigint").alias("resized_len"),
        F.sha2(F.col("payload"), 256).alias("resized_sha"))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out + per-frame byte checksum (oracle = the same
    slicing arithmetic in SQL over the UTF-8 bytes)."""
    docs = load(spark, sf_dir, "documents")
    frames = frame_sample(to_binary_table(docs), n_frames=4, frame_size=16)
    return (frames.select(
        "doc_id", "frame_idx", "frame_offset",
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
        F.sha2(F.col("frame_bytes"), 256).alias("frame_sha")))


QUERIES = {"q_multimodal": q_multimodal,
           "q_multimodal_frames": q_multimodal_frames,
           "q_multimodal_audio": q_multimodal_audio,
           "q_multimodal_resize": q_multimodal_resize}

ORACLES = {
    "q_multimodal": (
        "SELECT doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, "
        "CAST(CASE WHEN length(text) > 0 THEN ord(substring(text, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte, "
        "CAST(CASE WHEN length(text) > 0 THEN ord(substring(text, length(text), 1)) ELSE -1 END AS BIGINT) AS last_byte, "
        "'text/plain' AS media_type FROM documents"),
    "q_multimodal_frames": (
        # DuckDB can't substring a BLOB; the corpus is pure ASCII at every SF
        # (octet_length(encode(text)) == length(text), verified), so char
        # slicing on the VARCHAR equals the Spark side's byte slicing
        "SELECT doc_id, i AS frame_idx, (i * n) // 4 AS frame_offset, "
        "CAST(length(substring(text, (i * n) // 4 + 1, 16)) AS BIGINT) "
        "AS frame_len, "
        "sha256(substring(text, (i * n) // 4 + 1, 16)) AS frame_sha "
        "FROM (SELECT doc_id, text, GREATEST(length(text), 1) AS n "
        "FROM documents) CROSS JOIN range(4) t(i)"),
    "q_multimodal_audio": (
        # byte pairs → unsigned 16-bit LE samples, tumbling 32-sample
        # chunks; same ASCII char==byte premise as q_multimodal_frames
        "WITH d AS (SELECT doc_id, text, length(text) // 2 AS nsamp "
        "FROM documents), "
        "c AS (SELECT doc_id, text, nsamp, i AS chunk_idx, "
        f"LEAST(nsamp - i * {AUDIO_WINDOW}, {AUDIO_WINDOW}) AS n_samples "
        "FROM d, UNNEST(range(CAST(CEIL(nsamp / "
        f"CAST({AUDIO_WINDOW} AS DOUBLE)) AS BIGINT))) AS t(i) "
        "WHERE nsamp > 0), "
        "s AS (SELECT doc_id, chunk_idx, n_samples, "
        f"ord(substring(text, (chunk_idx * {AUDIO_WINDOW} + j) * 2 + 1, 1)) "
        f"+ 256 * ord(substring(text, (chunk_idx * {AUDIO_WINDOW} + j) * 2 "
        "+ 2, 1)) AS smp "
        f"FROM c CROSS JOIN range({AUDIO_WINDOW}) t2(j) "
        "WHERE j < n_samples) "
        "SELECT doc_id, chunk_idx, CAST(n_samples AS INT) AS n_samples, "
        "CAST(SUM(smp * smp) AS BIGINT) AS energy, "
        "CAST(MAX(smp) AS INT) AS peak "
        "FROM s GROUP BY doc_id, chunk_idx, n_samples"),
    "q_multimodal_resize": (
        # stub resize = byte truncation to 16*16; ASCII char==byte premise
        "SELECT doc_id, 16 AS width, 16 AS height, "
        "CAST(length(substring(text, 1, 256)) AS BIGINT) AS resized_len, "
        "sha256(substring(text, 1, 256)) AS resized_sha FROM documents"),
}
