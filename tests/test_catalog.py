"""Catalog-sync tests: vanilla spark.table() over versioned data
(reference SparkHiveMetastore behavior — SURVEY §2.C)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def clean_catalog(spark):
    yield
    for t in ["cdb.pages", "cdb.users"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestCatalogSync:
    def test_partitioned_lifecycle(self, spark, engine, clean_catalog):
        engine.create_table("cdb.pages", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a"), (2, "b")],
                                            "id bigint, d string"),
                      "cdb.pages", "u", "v1")
        n = engine.sync_catalog("cdb.pages")
        assert n == 2  # two partitions added
        assert sorted(tuple(r) for r in spark.table("cdb.pages").collect()) \
            == [(1, "a"), (2, "b")]
        # reprocess one partition; sync issues exactly one location update
        engine.insert(spark.createDataFrame([(9, "b")], "id bigint, d string"),
                      "cdb.pages", "u", "v2")
        assert engine.sync_catalog("cdb.pages") == 1
        assert sorted(tuple(r) for r in spark.table("cdb.pages").collect()) \
            == [(1, "a"), (9, "b")]
        # no-op sync applies zero ops
        assert engine.sync_catalog("cdb.pages") == 0
        # rollback + sync: catalog follows the pointer (reference checkout)
        first = engine.history("cdb.pages").collect()[1]["commit_id"]
        engine.checkout("cdb.pages", first)
        assert engine.sync_catalog("cdb.pages") == 1
        assert sorted(tuple(r) for r in spark.table("cdb.pages").collect()) \
            == [(1, "a"), (2, "b")]
        # partition removal propagates as DROP PARTITION
        from table_versions_spark.core.model import Partition
        engine.checkout("cdb.pages",
                        engine.history("cdb.pages").first()["commit_id"])
        engine.remove_partitions("cdb.pages", [Partition.parse("d=a")], "u", "rm")
        engine.sync_catalog("cdb.pages")
        assert [tuple(r) for r in spark.table("cdb.pages").collect()] == [(9, "b")]

    def test_snapshot_lifecycle(self, spark, engine, clean_catalog):
        engine.create_table("cdb.users", schema_ddl="id bigint, name string")
        engine.insert(spark.createDataFrame([(1, "a")], "id bigint, name string"),
                      "cdb.users", "u", "v1")
        engine.sync_catalog("cdb.users")
        assert spark.table("cdb.users").count() == 1
        engine.insert(spark.createDataFrame([(2, "b"), (3, "c")],
                                            "id bigint, name string"),
                      "cdb.users", "u", "v2")
        assert engine.sync_catalog("cdb.users") == 1
        assert spark.table("cdb.users").count() == 2


class TestPartitionExpr:
    def test_backslash_and_quote_escaping(self):
        """A value ending in '\\' must not swallow the closing quote; quotes
        and backslashes both escape (backslashes first)."""
        from table_versions_spark.catalog import _partition_expr
        from table_versions_spark.core.model import (
            Partition, escape_partition_value)

        esc_bs = escape_partition_value("a\\")
        p = Partition.parse("d=" + esc_bs)
        assert _partition_expr(p) == "(d='a\\\\')"
        esc_q = escape_partition_value("'x")
        p2 = Partition.parse("d=" + esc_q)
        assert _partition_expr(p2) == "(d='\\'x')"


def test_sync_rejects_column_mapped_tables(spark, engine):
    """A plain catalog reader resolves parquet by physical name — sync
    must refuse tables with renamed/dropped columns."""
    import pytest

    from table_versions_spark.catalog import sync_catalog
    from table_versions_spark.core.log import FileTableVersions

    engine.create_table("db.cmap", schema_ddl="id bigint, v double")
    engine.insert(spark.createDataFrame([(1, 1.0)], "id bigint, v double"),
                  "db.cmap", "u", "v1")
    engine.rename_column("db.cmap", "v", "amount")
    defn = engine.definition("db.cmap")
    with pytest.raises(ValueError, match="column mapping"):
        sync_catalog(spark, defn, FileTableVersions(defn.location))
