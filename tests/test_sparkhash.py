"""Vectorized (numpy/Arrow) Spark-Murmur3 parity with the scalar
reference implementation — the executor-side bucket-id path the tvx sink
uses (``core/sparkhash.bucket_ids_arrow``). Scalar-vs-``F.hash`` parity is
pinned separately in test_engine.py::TestBucketPrunedReads; these tests pin
vectorized-vs-scalar, so the chain vectorized == scalar == Spark holds."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from table_versions_spark.core.sparkhash import (
    SEED,
    bucket_id,
    bucket_ids_arrow,
    hash_bytes,
)


def _check(columns: dict, types: list[str], n_buckets: int = 16):
    t = pa.table(columns)
    cols = list(columns)
    got = bucket_ids_arrow(t, cols, types, n_buckets)
    n = t.num_rows
    vals = {c: t.column(c).to_pylist() for c in cols}
    for r in range(n):
        exp = bucket_id([vals[c][r] for c in cols], types, n_buckets)
        assert got[r] == exp, (r, got[r], exp, {c: vals[c][r] for c in cols})


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)),
                min_size=1, max_size=200))
def test_strings_match_scalar(values):
    _check({"s": pa.array(values, pa.string())}, ["string"])
    _check({"s": pa.array(values, pa.large_string())}, ["string"])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-2 ** 63, 2 ** 63 - 1)),
                min_size=1, max_size=200))
def test_longs_match_scalar(values):
    _check({"l": pa.array(values, pa.int64())}, ["bigint"])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-2 ** 31, 2 ** 31 - 1)),
                min_size=1, max_size=200))
def test_ints_match_scalar(values):
    _check({"i": pa.array(values, pa.int32())}, ["int"])


def test_multi_column_chain_and_types():
    n = 1000
    t = {
        "i": pa.array([None if i % 11 == 0 else i - 500
                       for i in range(n)], pa.int32()),
        "l": pa.array([None if i % 13 == 0 else (i - 500) * 10 ** 12
                       for i in range(n)], pa.int64()),
        "s": pa.array([None if i % 7 == 0 else f"k-{i}-é漢"
                       for i in range(n)], pa.string()),
        "d": pa.array([None if i % 17 == 0
                       else dt.date(1970, 1, 1) + dt.timedelta(days=i - 500)
                       for i in range(n)], pa.date32()),
        "b": pa.array([None if i % 19 == 0 else i % 2 == 0
                       for i in range(n)], pa.bool_()),
    }
    _check(t, ["int", "bigint", "string", "date", "boolean"], 32)


def test_sliced_chunked_arrays():
    """Arrow slices keep an offset into the parent buffer — the string
    path indexes raw buffers and must honor it."""
    base = pa.chunked_array([pa.array(["abc", "defg", "héllo"]),
                             pa.array(["", "tail-bytes!", "xy"])])
    t = pa.table({"s": base}).slice(1, 4)
    got = bucket_ids_arrow(t, ["s"], ["string"], 8)
    vals = t.column("s").to_pylist()
    assert list(got) == [bucket_id([v], ["string"], 8) for v in vals]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(-2 ** 63, 2 ** 63 - 1),
                          st.text(max_size=8),
                          st.sampled_from(["a", "b", "c"])),
                min_size=1, max_size=60))
def test_sink_bucket_split_property(tmp_path_factory, rows):
    """Executor-level property of the tvx sink's bucket split (no Spark):
    _write_task_files must put every row into a file whose part index
    equals pmod(hash(id), n) per the scalar reference hash, across
    partition dirs."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from table_versions_spark.streaming.sink import (
        WritePlan,
        _write_task_files,
    )

    out = str(tmp_path_factory.mktemp("bucket-prop"))
    n_buckets = 4
    t = pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "d": pa.array([r[2] for r in rows], pa.string()),
    })
    plan = WritePlan(bucket=(n_buckets, (("id", "bigint"),)))
    written = _write_task_files(iter(t.to_batches(max_chunksize=7)),
                                ["d"], "parquet", out, subdir="v1",
                                plan=plan)
    assert written
    import os as _os

    seen = 0
    for base, _, files in _os.walk(out):
        for f in files:
            if not f.startswith("part-"):
                continue
            bid = int(re.match(r"part-(\d{5})-", f).group(1))
            got = pq_mod.read_table(_os.path.join(base, f))
            assert "__tvx_bucket" not in got.column_names
            d_render = [p for p in base.split(_os.sep) if p.startswith("d=")]
            assert len(d_render) == 1  # partition dir present
            for rid in got.column("id").to_pylist():
                assert bucket_id([rid], ["bigint"], n_buckets) == bid
            seen += got.num_rows
    assert seen == len(rows)


def test_signed_tail_bytes():
    """Non-ASCII tail bytes are >= 0x80: the JVM reads them SIGNED."""
    s = "abcdÿ"  # 4-byte block + 2-byte UTF-8 tail (0xC3 0xBF)
    assert hash_bytes(s.encode("utf-8"), SEED) == hash_bytes(
        b"abcd\xc3\xbf", SEED)
    _check({"s": pa.array([s, "é", "漢字"])}, ["string"])
