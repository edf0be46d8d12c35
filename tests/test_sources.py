"""Batch source connector tests (sources/readers.py)."""

import os

import pytest


class TestReaders:
    def test_csv_requires_schema(self, spark, tmp_path):
        from table_versions_spark.sources import readers

        with pytest.raises(ValueError, match="explicit schema"):
            readers.read(spark, str(tmp_path), format="csv")
        with pytest.raises(ValueError, match="Unsupported format"):
            readers.read(spark, str(tmp_path), format="avroish")

    def test_csv_round_trip(self, spark, tmp_path):
        from table_versions_spark.sources import readers

        p = str(tmp_path / "c.csv")
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string") \
            .write.option("header", "true").csv(p)
        df = readers.read(spark, p, format="csv", schema="id int, s string",
                          header="true")
        assert sorted(tuple(r) for r in df.collect()) == [(1, "a"), (2, "b")]

    def test_binary_files(self, spark, tmp_path):
        from table_versions_spark.sources import readers

        (tmp_path / "x.bin").write_bytes(b"\x01\x02\x03")
        (tmp_path / "skip.txt").write_bytes(b"nope")
        df = readers.read_binary_files(spark, str(tmp_path), glob="*.bin")
        rows = df.select("length", "content").collect()
        assert len(rows) == 1 and rows[0]["length"] == 3
        assert bytes(rows[0]["content"]) == b"\x01\x02\x03"

    def test_register_testdata_views(self, spark, sf_small):
        from table_versions_spark.sources import readers

        readers.register_testdata_views(spark, sf_small)
        assert spark.sql("SELECT COUNT(*) FROM nation").first()[0] > 0
        # events view carries the converted timestamp + derived date
        cols = dict(spark.table("events").dtypes)
        assert cols["ts"] == "timestamp" and cols["event_date"] == "date"
