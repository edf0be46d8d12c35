"""functions/ package tests (timestamps, skew helper)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        from table_versions_spark.functions.skew import salted_join

        # heavily skewed: 90% of fact rows share key 7
        fact = spark.createDataFrame(
            [(7 if i % 10 else i, float(i)) for i in range(1000)],
            "k bigint, v double")
        dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)],
                                    "k bigint, name string")
        expected = sorted(tuple(r) for r in
                          fact.join(dim, "k").select("k", "v", "name").collect())
        got = sorted(tuple(r) for r in
                     salted_join(fact, dim, "k", salt=4)
                     .select("k", "v", "name").collect())
        assert got == expected

    def test_left_join_keeps_unmatched(self, spark):
        from table_versions_spark.functions.skew import salted_join

        fact = spark.createDataFrame([(1, "x"), (99, "y")], "k bigint, v string")
        dim = spark.createDataFrame([(1, "one")], "k bigint, name string")
        got = sorted(tuple(r) for r in
                     salted_join(fact, dim, "k", how="left", salt=3).collect())
        assert got == [(1, "x", "one"), (99, "y", None)]

    def test_validation(self, spark):
        from table_versions_spark.functions.skew import salted_join

        df = spark.createDataFrame([(1,)], "k bigint")
        with pytest.raises(ValueError, match="salt must be"):
            salted_join(df, df, "k", salt=0)
        with pytest.raises(ValueError, match="missing"):
            salted_join(df, df, "nope")


class TestTimestampTravel:
    def test_read_at_timestamp(self, spark, engine):
        engine.create_table("db.tt", schema_ddl="id bigint")
        engine.insert(spark.createDataFrame([(1,)], "id bigint"), "db.tt", "u", "v1")
        hist1 = engine.history("db.tt").first()
        engine.insert(spark.createDataFrame([(2,)], "id bigint"), "db.tt", "u", "v2")
        # as-of the first insert's exact timestamp → v1 contents
        old = engine.read("db.tt", at_timestamp=hist1["timestamp"])
        assert [r["id"] for r in old.collect()] == [1]
        # far future → head
        assert [r["id"] for r in engine.read(
            "db.tt", at_timestamp="2999-01-01T00:00:00+00:00").collect()] == [2]
        # before the table existed → error
        from table_versions_spark.core.log import UnknownCommitError
        with pytest.raises(UnknownCommitError):
            engine.read("db.tt", at_timestamp=dt.datetime(1990, 1, 1))
        with pytest.raises(ValueError, match="not both"):
            engine.read("db.tt", at_commit="x",
                        at_timestamp="2999-01-01T00:00:00+00:00")


class TestZorder:
    def test_interleave_round_trips(self, spark):
        """The Morton value must be a bijection of the per-column bucket
        tuple: de-interleaving z in Python recovers exactly the buckets
        the expression computed from the normalized inputs."""
        from pyspark.sql import functions as F

        from table_versions_spark.functions.zorder import (
            ZORDER_BITS,
            zorder_column,
        )

        df = spark.createDataFrame(
            [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)],
            "x bigint, y bigint")
        rows = (df.withColumn("z", zorder_column(df, ["x", "y"]))
                .select("x", "y", "z").collect())
        top = (1 << ZORDER_BITS) - 1
        import math

        mx_x = max(r.x for r in rows)
        mx_y = max(r.y for r in rows)
        for r in rows:
            bx = min(max(math.floor(r.x / mx_x * top), 0), top)
            by = min(max(math.floor(r.y / mx_y * top), 0), top)
            gx = gy = 0
            for k in range(ZORDER_BITS):
                gx |= ((r.z >> (2 * k)) & 1) << k
                gy |= ((r.z >> (2 * k + 1)) & 1) << k
            assert (gx, gy) == (bx, by), (r.x, r.y, r.z)

    def test_zorder_locality(self, spark):
        """Rows close in BOTH dimensions get close z-values: sorting by z
        must place each quadrant of a 2x2 grid contiguously."""
        from table_versions_spark.functions.zorder import zorder_column

        df = spark.createDataFrame(
            [(x, y) for x in range(16) for y in range(16)],
            "x bigint, y bigint")
        ordered = (df.withColumn("z", zorder_column(df, ["x", "y"]))
                   .orderBy("z").collect())
        # first quarter of the curve = the low-low quadrant
        first = ordered[:64]
        assert all(r.x < 8 and r.y < 8 for r in first)

    def test_rejects_single_column(self, spark):
        import pytest

        from table_versions_spark.functions.zorder import zorder_column

        df = spark.createDataFrame([(1,)], "x bigint")
        with pytest.raises(ValueError, match="at least 2"):
            zorder_column(df, ["x"])
