"""Incremental rollup (materialized-view maintenance) tests."""

import pytest
from pyspark.sql import functions as F

from table_versions_spark.rollup import IncrementalRollup

DDL = "id bigint, event_type string, value double, d string"


def _agg(df):
    return df.groupBy("d", "event_type").agg(
        F.round(F.sum("value"), 2).alias("total"),
        F.count("*").alias("n"))


def _expected(spark, engine, source):
    return sorted(tuple(r) for r in _agg(engine.read(source)).collect())


def _got(spark, engine, target):
    return sorted(tuple(r) for r in engine.read(target)
                  .select("d", "event_type", "total", "n").collect())


class TestIncrementalRollup:
    def test_full_build_then_incremental(self, spark, engine):
        engine.create_table("db.src", schema_ddl=DDL, partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "click", 1.0, "d1"), (2, "view", 2.0, "d1"),
             (3, "click", 3.0, "d2")], DDL), "db.src", "u", "day1+2")
        roll = IncrementalRollup(engine, "db.src", "db.agg",
                                 group_cols=["d", "event_type"], agg=_agg)
        assert roll.refresh() is not None  # full build
        assert _got(spark, engine, "db.agg") == _expected(spark, engine, "db.src")

        # idempotent: nothing changed -> no commit
        before = len(engine.history("db.agg").collect())
        assert roll.refresh() is None
        assert len(engine.history("db.agg").collect()) == before

        # overwrite ONE day -> incremental refresh touches only that day
        engine.insert(spark.createDataFrame(
            [(9, "click", 10.0, "d1")], DDL), "db.src", "u", "reprocess d1")
        r = roll.refresh()
        assert r is not None
        assert _got(spark, engine, "db.agg") == _expected(spark, engine, "db.src")
        msgs = [h.message for h in engine.history("db.agg").collect()]
        assert any("refresh 1 partition(s)" in m for m in msgs)
        # d2's aggregate row survived untouched (value from the first build)
        d2 = engine.read("db.agg").where("d = 'd2'").collect()
        assert len(d2) == 1 and d2[0]["total"] == 3.0

        # new day arrives -> new groups inserted incrementally
        engine.insert(spark.createDataFrame(
            [(10, "view", 5.0, "d3")], DDL), "db.src", "u", "day3")
        roll.refresh()
        assert _got(spark, engine, "db.agg") == _expected(spark, engine, "db.src")

    def test_removed_partition_drops_groups(self, spark, engine):
        engine.create_table("db.src2", schema_ddl=DDL, partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "click", 1.0, "d1"), (2, "view", 2.0, "d2")], DDL),
            "db.src2", "u", "load")
        roll = IncrementalRollup(engine, "db.src2", "db.agg2",
                                 group_cols=["d", "event_type"], agg=_agg)
        roll.refresh()
        assert len(_got(spark, engine, "db.agg2")) == 2
        from table_versions_spark.core.model import Partition
        engine.remove_partitions("db.src2", [Partition.parse("d=d1")], "u", "rm")
        roll.refresh()
        assert _got(spark, engine, "db.agg2") == _expected(spark, engine, "db.src2")
        assert all(t[0] != "d1" for t in _got(spark, engine, "db.agg2"))

    def test_group_cols_must_cover_partition_cols(self, spark, engine):
        engine.create_table("db.src3", schema_ddl=DDL, partition_columns=["d"])
        with pytest.raises(ValueError, match="partition column"):
            IncrementalRollup(engine, "db.src3", "db.agg3",
                              group_cols=["event_type"], agg=_agg)


def test_full_rebuild_drops_stale_target_partitions(spark, engine):
    """A rebuild over a non-empty target must converge it to the fresh
    aggregation: a crash between a full build and its cursor write,
    followed by a source-partition removal, must not leave the removed
    partition's aggregates in the target forever."""
    engine.create_table("rb.src", schema_ddl=DDL, partition_columns=["d"])
    engine.insert(spark.createDataFrame(
        [(1, "click", 1.0, "d1"), (2, "view", 2.0, "d2")], DDL),
        "rb.src", "u", "base")
    roll = IncrementalRollup(engine, "rb.src", "rb.agg",
                             group_cols=["d", "event_type"], agg=_agg)
    roll.refresh()
    # simulate the crash: cursor write never happened
    engine.storage.delete(roll._cursor_path())
    # source partition d2 disappears before the re-run
    from table_versions_spark.core.model import Partition

    engine.remove_partitions("rb.src", [Partition.parse("d=d2")], "u", "rm")
    roll.refresh()  # cursor None -> full build again
    assert _got(spark, engine, "rb.agg") == _expected(spark, engine, "rb.src")
    assert all(r[0] != "d2" for r in _got(spark, engine, "rb.agg"))


def test_full_rebuild_occ_guards_concurrent_target_write(spark, engine):
    """A full rebuild is read-modify-write over the whole target: a commit
    landing into a rebuilt partition after the rebuild captured its
    baseline must fail the rebuild's commit (ConcurrentWriteError), never
    be silently erased by the rebuild's drop+re-add."""
    from table_versions_spark.core.log import ConcurrentWriteError
    from table_versions_spark.engine import VersionedEngine

    engine.create_table("rb.osrc", schema_ddl=DDL, partition_columns=["d"])
    engine.insert(spark.createDataFrame([(1, "click", 1.0, "d1")], DDL),
                  "rb.osrc", "u", "base")
    roll = IncrementalRollup(engine, "rb.osrc", "rb.oagg",
                             group_cols=["d", "event_type"], agg=_agg)
    roll.refresh()

    eng2 = VersionedEngine(spark, engine.warehouse, engine.storage)
    done = {}
    orig = VersionedEngine._write_partitioned

    def racing(eng_self, df, defn, version, distribute=True, **kw):
        ops = orig(eng_self, df, defn, version, distribute=distribute, **kw)
        if defn.name.name == "oagg" and not done:
            done["x"] = True  # concurrent write into a rebuilt partition
            eng2.insert(spark.createDataFrame(
                [("d1", "click", 9.0, 1)],
                "d string, event_type string, total double, n bigint"),
                "rb.oagg", "w2", "winner")
        return ops

    VersionedEngine._write_partitioned = racing
    try:
        with pytest.raises(ConcurrentWriteError):
            roll._full_build("u")
    finally:
        VersionedEngine._write_partitioned = orig
    # the winner's commit survived; the stale rebuild never landed
    assert ("d1", "click", 9.0, 1) in _got(spark, engine, "rb.oagg")
