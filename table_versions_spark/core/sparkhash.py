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


# ---------------------------------------------------------------------------
# Vectorized (numpy) variant — the EXECUTOR-side path. The tvx sink assigns
# every row of an Arrow batch to its bucket without any per-row Python:
# fixed-width types are pure array arithmetic; strings process the Arrow
# buffer in column-parallel 4-byte blocks (one numpy pass per block index,
# O(max_len/4) passes per batch, each vectorized over all rows).
# ---------------------------------------------------------------------------

HASHABLE_BUCKET_TYPES = frozenset(
    _INT_TYPES | _LONG_TYPES | {"boolean", "string", "varchar", "date"})


def canonical_bucket_type(spark_type: str) -> str | None:
    """Normalize any DDL / ``simpleString`` spelling to the Murmur3 hash
    CLASS it belongs to: ``int`` (4-byte input: int/integer/smallint/
    tinyint/short/byte), ``bigint`` (8-byte: bigint/long), ``string``
    (string/varchar(n)/char(n) — hashed as UTF-8 bytes), ``boolean``,
    ``date``. Returns None for types the driver/executor hashes don't
    reproduce (float/decimal/complex). Two spellings with the same class
    hash identically, so type-drift checks must compare CLASSES, not raw
    tokens — 'id long' vs an arriving bigint frame is not drift."""
    t = spark_type.lower().split("(")[0].strip()
    if t in _INT_TYPES:
        return "int"
    if t in _LONG_TYPES:
        return "bigint"
    if t in ("string", "varchar", "char"):
        return "string"
    if t in ("boolean", "date"):
        return t
    return None


def _np():
    import numpy as np
    return np


def _v_mix_k1(np, k1):
    k1 = k1 * np.uint32(0xCC9E2D51)
    k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
    return k1 * np.uint32(0x1B873593)


def _v_mix_h1(np, h1, k1):
    h1 = h1 ^ k1
    h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
    return h1 * np.uint32(5) + np.uint32(0xE6546B64)


def _v_fmix(np, h1, length):
    h1 = h1 ^ length
    h1 = h1 ^ (h1 >> np.uint32(16))
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> np.uint32(13))
    h1 = h1 * np.uint32(0xC2B2AE35)
    return h1 ^ (h1 >> np.uint32(16))


def _v_hash_int32(np, values_u32, seed_u32):
    """values_u32: uint32 array; seed_u32: uint32 array (running hash)."""
    return _v_fmix(np, _v_mix_h1(np, seed_u32, _v_mix_k1(np, values_u32)),
                   np.uint32(4))


def _v_hash_int64(np, values_i64, seed_u32):
    u = values_i64.astype(np.uint64)
    low = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    high = (u >> np.uint64(32)).astype(np.uint32)
    h1 = _v_mix_h1(np, seed_u32, _v_mix_k1(np, low))
    h1 = _v_mix_h1(np, h1, _v_mix_k1(np, high))
    return _v_fmix(np, h1, np.uint32(8))


def _v_hash_strings(np, arrow_array, seed_u32):
    """``hashUnsafeBytes`` over every row of an Arrow string array at once:
    block j of every string is mixed in pass j (masked to rows long enough),
    then the ≤3 signed tail bytes, then fmix with each row's byte length."""
    arr = arrow_array.combine_chunks() if hasattr(arrow_array, "combine_chunks") \
        else arrow_array
    import pyarrow as pa
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    h = seed_u32.copy()
    nblocks = lens // 4
    for j in range(int(nblocks.max()) if len(nblocks) else 0):
        mask = nblocks > j
        idx = starts[mask] + 4 * j
        w = (data[idx].astype(np.uint32)
             | (data[idx + 1].astype(np.uint32) << np.uint32(8))
             | (data[idx + 2].astype(np.uint32) << np.uint32(16))
             | (data[idx + 3].astype(np.uint32) << np.uint32(24)))
        h[mask] = _v_mix_h1(np, h[mask], _v_mix_k1(np, w))
    tail_len = lens % 4
    for k in range(3):
        mask = tail_len > k
        if not mask.any():
            break
        idx = starts[mask] + nblocks[mask] * 4 + k
        # JVM bytes are signed: sign-extend before widening to uint32
        b = data[idx].view(np.int8).astype(np.int32).astype(np.uint32)
        h[mask] = _v_mix_h1(np, h[mask], _v_mix_k1(np, b))
    return _v_fmix(np, h, lens.astype(np.uint32))


def bucket_ids_arrow(table, columns: list[str], spark_types: list[str],
                     n_buckets: int):
    """Per-row bucket ids for an Arrow table — ``pmod(hash(cols), n)`` with
    Spark ``HashPartitioning`` parity, numpy-vectorized (no per-row Python).
    NULL leaves the running hash unchanged, exactly as Spark skips null
    columns. Returns an int64 numpy array of length ``table.num_rows``."""
    np = _np()
    import pyarrow as pa
    import pyarrow.compute as pc

    n = table.num_rows
    h = np.full(n, SEED, dtype=np.uint32)
    for col, t in zip(columns, spark_types):
        # normalize parameterized forms (varchar(5) → varchar) exactly as
        # the sink's construction-time check does — the two checks must
        # accept the same set or a type passes the loud driver refusal
        # and crashes every executor task instead
        t = t.lower().split("(")[0]
        if t not in HASHABLE_BUCKET_TYPES:
            raise ValueError(
                f"Unsupported bucket-column type for vectorized hashing: {t}")
        arr = table.column(col).combine_chunks()
        valid = (np.ones(n, dtype=bool) if arr.null_count == 0
                 else pc.is_valid(arr).to_numpy(zero_copy_only=False))
        if t in ("string", "varchar"):
            if arr.null_count:
                arr = pc.fill_null(arr, "")
            new_h = _v_hash_strings(np, arr, h)
        else:
            if t in ("date", "boolean"):
                arr = arr.cast(pa.int32())
            if arr.null_count:
                # exact (never via float64/NaN): nulls are masked out below
                arr = pc.fill_null(arr, 0)
            npv = arr.to_numpy(zero_copy_only=False).astype(np.int64)
            if t in _LONG_TYPES:
                new_h = _v_hash_int64(np, npv, h)
            else:
                new_h = _v_hash_int32(
                    np, (npv & 0xFFFFFFFF).astype(np.uint32), h)
        h = np.where(valid, new_h, h)
    signed = h.astype(np.int32).astype(np.int64)
    return ((signed % n_buckets) + n_buckets) % n_buckets
