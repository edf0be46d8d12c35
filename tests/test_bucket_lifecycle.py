"""Bucketed-table lifecycle property test (VERDICT r6 #3).

Round 6 enabled delete/update(mode="dv") on bucketed tables by REMOVING
two safety guards and re-clustering updated rows into bucket_count tasks.
Each piece has its own unit test; this suite drives the full lifecycle —

    create(bucketed, partitioned) → insert → sink append → delete(dv)
    → update(dv) → compact → bucketed_join + bucket_filter read
    + tvx pushFilters read

— asserting after EVERY step that
  (a) every data file in the layout carries a parseable bucket index
      (the filename/bucket contract whose corruption the loud-failure
      branch in ``engine._bucket_files`` guards against),
  (b) bucket-pruned point reads equal the unpruned read filtered to the
      same key (pruning may over-read, never under-read), and
  (c) the full read has exact row parity with a plain-Python mirror of
      the applied mutations.

If the contract ever breaks on this legal sequence, either an assertion
here fails or ``_bucket_files`` raises its contract-corruption error —
both loud, neither silent data loss.
"""

import os

from pyspark.sql import functions as F

from table_versions_spark.core.paths import parse_bucket_index

DDL = "id bigint, v double, d string"
BUCKETS = 4
SAMPLE_KEYS = (0, 3, 4, 13, 14, 42, 103, 104, 120, 149)


def _walk_data_files(location):
    """Every data file in the table layout, skipping staging dirs and
    '_'-prefixed sidecars (_dv/_cdc) — the same visibility rule every
    read surface applies."""
    out = []
    for base, dirs, files in os.walk(location):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out.extend(os.path.join(base, f) for f in files
                   if f.startswith("part-"))
    return out


def _check_invariants(engine, spark, table, expected, step):
    """The three lifecycle invariants; ``expected`` is {id: (id, v, d)}."""
    loc = engine.definition(table).location
    # (a) filename/bucket contract on every data file
    files = _walk_data_files(loc)
    assert files, f"{step}: no data files"
    bad = [f for f in files if parse_bucket_index(os.path.basename(f)) is None]
    assert not bad, f"{step}: files without a bucket index: {bad}"

    # (c) full-read row parity vs the Python mirror
    got = {r.id: (r.id, r.v, r.d) for r in engine.read(table).collect()}
    assert got == expected, (
        f"{step}: row parity broke — missing={sorted(set(expected) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(expected))[:5]}")

    # (b) bucket-pruned point reads == unpruned read filtered to the key
    for k in SAMPLE_KEYS:
        pruned = sorted(map(tuple, engine.read(
            table, bucket_filter={"id": k}).where(F.col("id") == k).collect()))
        want = [expected[k]] if k in expected else []
        assert pruned == want, f"{step}: bucket-pruned read diverged for id={k}"


class TestBucketedDvLifecycle:
    def test_full_lifecycle_holds_contract(self, spark, engine):
        from table_versions_spark.streaming.source import register

        register(spark)
        table = "blc.fact"
        engine.create_table(table, schema_ddl=DDL,
                            partition_columns=["d"],
                            bucket_columns=["id"], bucket_count=BUCKETS)
        loc = engine.definition(table).location

        # 1. engine insert
        rows = [(i, float(i), ["a", "b", "c"][i % 3]) for i in range(120)]
        engine.insert(spark.createDataFrame(rows, DDL), table, "u", "load")
        expected = {r[0]: r for r in rows}
        _check_invariants(engine, spark, table, expected, "insert")

        # 2. sink append (the r6 bucketed-sink path shares the contract)
        more = [(i, float(i), ["a", "b", "c"][i % 3]) for i in range(120, 150)]
        spark.createDataFrame(more, DDL).write.format("tvx").mode(
            "append").option("location", loc).save()
        expected.update({r[0]: r for r in more})
        _check_invariants(engine, spark, table, expected, "sink append")

        # 3. dv delete — hardlinked files + _dv sidecar, no rewrite
        engine.delete(table, "id % 10 = 3", "u", "dv delete", mode="dv")
        expected = {k: r for k, r in expected.items() if k % 10 != 3}
        _check_invariants(engine, spark, table, expected, "dv delete")

        # 4. dv update — updated rows re-clustered into bucket_count tasks
        engine.update(table, {"v": "v + 1000"}, "id % 10 = 4", "u",
                      "dv update", mode="dv")
        expected = {k: (k, v + 1000 if k % 10 == 4 else v, d)
                    for k, (_, v, d) in expected.items()}
        _check_invariants(engine, spark, table, expected, "dv update")

        # 5. compact — materializes vectors away, rewrites bucketed
        engine.compact(table)
        _check_invariants(engine, spark, table, expected, "compact")

        # 6a. bucketed_join with a co-bucketed dimension: full parity
        engine.create_table("blc.dim", schema_ddl="id bigint, name string",
                            bucket_columns=["id"], bucket_count=BUCKETS)
        engine.insert(spark.createDataFrame(
            [(i, f"n{i}") for i in range(150)], "id bigint, name string"),
            "blc.dim", "u", "dim")
        j = {(r.id, r.v, r.d, r.name)
             for r in engine.bucketed_join(table, "blc.dim").collect()}
        assert j == {(k, v, d, f"n{k}") for k, (_, v, d) in expected.items()}

        # 6b. tvx DataFrame reader with pushed partition + bucket filters:
        # point lookups through the pruned plan match the mirror exactly
        df = spark.read.format("tvx").option("location", loc).load()
        for k in SAMPLE_KEYS:
            d_of = ["a", "b", "c"][k % 3]
            got = sorted(map(tuple, df.where(
                (F.col("d") == d_of) & (F.col("id") == k)).collect()))
            want = [expected[k]] if k in expected else []
            assert got == want, f"tvx pushed read diverged for id={k}"

    def test_multi_column_bucket_spec(self, spark, engine):
        """Two-column bucket specs run the same contract: the running-hash
        Murmur3 over (k1, k2) drives insert clustering, sink writes,
        bucket_filter point reads (which must name EVERY bucket column),
        co-bucketed joins, and tvx pushFilters pruning (which only fires
        when the pushed equalities cover both columns)."""
        import pytest
        from pyspark.sql.datasource import EqualTo

        from table_versions_spark.core.sparkhash import bucket_id
        from table_versions_spark.streaming.source import (
            VersionedTableBatchReader,
            register,
        )

        register(spark)
        ddl = "k1 bigint, k2 string, v double"
        rows = [(i % 13, f"s{i % 7}", float(i)) for i in range(200)]
        engine.create_table("blc.m2", schema_ddl=ddl,
                            bucket_columns=["k1", "k2"], bucket_count=8)
        engine.insert(spark.createDataFrame(rows, ddl), "blc.m2", "u", "v1")
        loc = engine.definition("blc.m2").location

        # sink append shares the two-column hash
        spark.createDataFrame([(99, "sx", 1.0)], ddl).write.format(
            "tvx").mode("append").option("location", loc).save()

        # point read: both columns required, superset-by-contract rows
        got = engine.read("blc.m2", bucket_filter={"k1": 3, "k2": "s3"})
        want = [r for r in rows if r[0] == 3 and r[1] == "s3"]
        assert set(map(tuple, got.where(
            "k1 = 3 AND k2 = 's3'").collect())) == set(want)
        with pytest.raises(ValueError, match="exactly the bucket columns"):
            engine.read("blc.m2", bucket_filter={"k1": 3})

        # co-bucketed join on the composite key
        engine.create_table("blc.m2d", schema_ddl="k1 bigint, k2 string, "
                            "name string",
                            bucket_columns=["k1", "k2"], bucket_count=8)
        dim = [(a, b, f"{a}-{b}") for a in range(13) for b in
               [f"s{x}" for x in range(7)]] + [(99, "sx", "99-sx")]
        engine.insert(spark.createDataFrame(
            dim, "k1 bigint, k2 string, name string"), "blc.m2d", "u", "d")
        j = engine.bucketed_join("blc.m2", "blc.m2d")
        assert j.count() == 201

        # tvx pushFilters: equality on ONE bucket column must not prune;
        # on both, it selects the composite key's bucket
        r1 = VersionedTableBatchReader(loc)
        r1.pushFilters([EqualTo(("k1",), 3)])
        assert r1.bucket_sel is None
        r2 = VersionedTableBatchReader(loc)
        r2.pushFilters([EqualTo(("k1",), 3), EqualTo(("k2",), "s3")])
        assert r2.bucket_sel == bucket_id([3, "s3"], ["bigint", "string"], 8)
        df = spark.read.format("tvx").option("location", loc).load()
        assert set(map(tuple, df.where(
            "k1 = 3 AND k2 = 's3'").collect())) == set(want)

    def test_contract_corruption_fails_loudly(self, spark, engine):
        """The guard this lifecycle relies on: a data file WITHOUT a
        parseable bucket index inside a bucketed layout makes
        bucketed_join raise its contract-corruption error rather than
        silently dropping the file's rows."""
        import pytest

        engine.create_table("blc.ca", schema_ddl="id bigint, x double",
                            bucket_columns=["id"], bucket_count=2)
        engine.create_table("blc.cb", schema_ddl="id bigint, y double",
                            bucket_columns=["id"], bucket_count=2)
        two = [(1, 1.0), (2, 2.0)]
        engine.insert(spark.createDataFrame(two, "id bigint, x double"),
                      "blc.ca", "u", "a")
        engine.insert(spark.createDataFrame(two, "id bigint, y double"),
                      "blc.cb", "u", "b")
        # plant an index-less file (an unbucketed-sink-style hex name whose
        # leading digits must NOT parse as a bucket id) in the current dir
        loc = engine.definition("blc.ca").location
        data_dir = os.path.dirname(sorted(_walk_data_files(loc))[0])
        src = _walk_data_files(loc)[0]
        planted = os.path.join(data_dir, "part-3f2a9c81d04e4e64.parquet")
        engine.storage.link_or_copy(src, planted)
        with pytest.raises(ValueError, match="contract"):
            engine.bucketed_join("blc.ca", "blc.cb")
