"""Spark-compatible Murmur3 hashing in pure Python.

Reproduces ``org.apache.spark.sql.catalyst.expressions.Murmur3Hash`` (the
``hash()`` SQL function / ``HashPartitioning``, seed 42) bit-for-bit for the
common bucket-key types, so the DRIVER can compute which bucket a key value
lands in without running a Spark job — the primitive behind bucket-pruned
point reads (``VersionedEngine.read(bucket_filter=...)``).

Validated against ``F.hash`` for int/long/string in
``tests/test_engine.py::TestBucketPrunedReads``. Spark semantics honored:

- multi-column hash chains, each column's hash seeding the next;
- NULL leaves the running hash unchanged;
- strings hash their UTF-8 bytes via ``hashUnsafeBytes`` (4-byte
  little-endian blocks, then signed per-byte tail).
"""

from __future__ import annotations

SEED = 42


def _rotl(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & 0xFFFFFFFF


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    return x - 0x100000000 if x >= 0x80000000 else x


def hash_int(value: int, seed: int = SEED) -> int:
    """int/short/byte/boolean-as-int (Spark hashes all of them as int)."""
    return _signed32(_fmix(_mix_h1(seed & 0xFFFFFFFF,
                                   _mix_k1(value & 0xFFFFFFFF)), 4))


def hash_long(value: int, seed: int = SEED) -> int:
    low = value & 0xFFFFFFFF
    high = (value >> 32) & 0xFFFFFFFF
    h1 = _mix_h1(seed & 0xFFFFFFFF, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """``hashUnsafeBytes``: 4-byte little-endian blocks + signed byte tail."""
    h1 = seed & 0xFFFFFFFF
    n = len(data)
    for i in range(0, n - n % 4, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i:i + 4], "little")))
    for i in range(n - n % 4, n):
        b = data[i]
        if b >= 128:
            b -= 256  # JVM bytes are signed
        h1 = _mix_h1(h1, _mix_k1(b & 0xFFFFFFFF))
    return _signed32(_fmix(h1, n))


_INT_TYPES = {"int", "integer", "smallint", "tinyint", "short", "byte"}
_LONG_TYPES = {"bigint", "long"}


def hash_value(value, spark_type: str, seed: int = SEED) -> int:
    """Hash one column value as Spark's hash() would. NULL returns the seed
    unchanged (Spark skips null columns). Raises for types whose hashing we
    don't reproduce (float/decimal/complex) — callers should reject those
    as bucket columns."""
    if value is None:
        return seed  # Spark skips null columns: running hash unchanged
    t = spark_type.lower()
    if t in _INT_TYPES or t == "boolean":
        return hash_int(int(value), seed)
    if t in _LONG_TYPES:
        return hash_long(int(value), seed)
    if t in ("string", "varchar"):
        return hash_bytes(str(value).encode("utf-8"), seed)
    if t == "date":
        import datetime as dt

        days = (value - dt.date(1970, 1, 1)).days \
            if isinstance(value, dt.date) else int(value)
        return hash_int(days, seed)
    raise ValueError(
        f"Unsupported bucket-column type for driver-side hashing: {spark_type}")


def bucket_id(values: list, spark_types: list[str], n_buckets: int) -> int:
    """``pmod(hash(c1, c2, ...), n)`` exactly as HashPartitioning assigns
    rows to ``repartition(n, cols)`` tasks: the running hash seeds the next
    column's hash."""
    h = SEED
    for v, t in zip(values, spark_types):
        h = hash_value(v, t, h & 0xFFFFFFFF)
    return ((h % n_buckets) + n_buckets) % n_buckets
