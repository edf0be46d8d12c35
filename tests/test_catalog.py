"""Catalog-sync tests: vanilla spark.table() over versioned data
(reference SparkHiveMetastore behavior — SURVEY §2.C)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def clean_catalog(spark):
    yield
    for t in ["cdb.pages", "cdb.users", "cdb.pageview"]:
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

    def test_date_typed_partition_column(self, spark, engine, clean_catalog):
        """The reference's flagship flow: a table PARTITIONED BY a
        *date*-typed column, written versioned, synced, then read via
        vanilla spark.table() with a date-literal filter that partition-
        prunes (examples/.../DatePartitionedTableLoaderSpec.scala:31-101).
        The declared type must round-trip: dir names render as
        event_date=2019-03-13, the catalog surfaces a DateType column,
        and the filter prunes to one versioned partition dir."""
        import datetime as dt

        from pyspark.sql.types import DateType

        d1, d2, d3 = (dt.date(2019, 3, 13), dt.date(2019, 3, 14),
                      dt.date(2019, 3, 15))
        ddl = "path string, event_date date"
        engine.create_table("cdb.pageview", schema_ddl=ddl,
                            partition_columns=["event_date"])
        engine.insert(spark.createDataFrame(
            [("a", d1), ("b", d1), ("c", d2), ("d", d3)], ddl),
            "cdb.pageview", "u", "three days")
        assert engine.sync_catalog("cdb.pageview") == 3

        tbl = spark.table("cdb.pageview")
        assert isinstance(tbl.schema["event_date"].dataType, DateType)
        got = sorted((r["path"], r["event_date"]) for r in tbl.collect())
        assert got == [("a", d1), ("b", d1), ("c", d2), ("d", d3)]

        # date-literal filter partition-prunes to the one versioned dir
        day = tbl.where(F.col("event_date") == F.lit(d1))
        assert sorted(r["path"] for r in day.collect()) == ["a", "b"]
        plan = day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        files = day.inputFiles()
        assert files and all("event_date=2019-03-13" in f for f in files)

        # reprocess one day; the catalog follows to the fresh version
        engine.insert(spark.createDataFrame([("z", d1)], ddl),
                      "cdb.pageview", "u", "reprocess day 1")
        assert engine.sync_catalog("cdb.pageview") == 1
        got = sorted((r["path"], r["event_date"])
                     for r in spark.table("cdb.pageview").collect())
        assert got == [("c", d2), ("d", d3), ("z", d1)]

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


def test_sync_column_mapped_table_via_view(spark, engine):
    """A column-mapped table syncs as <name>__phys (physical schema, real
    partition locations) + a logical-name VIEW over it, so vanilla
    spark.table() sees renamed columns correctly and never resurrects
    dropped ones."""
    try:
        ddl = "id bigint, v double, w string, d string"
        engine.create_table("cdb.cmap", schema_ddl=ddl,
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, 1.0, "x", "a"), (2, 2.0, "y", "b")], ddl),
            "cdb.cmap", "u", "v1")
        engine.rename_column("cdb.cmap", "v", "amount")
        engine.drop_column("cdb.cmap", "w")
        n = engine.sync_catalog("cdb.cmap")
        assert n == 2  # two partitions added to the __phys table
        tbl = spark.table("cdb.cmap")
        assert tbl.columns == ["id", "amount", "d"]
        got = sorted((r.id, r.amount, r.d) for r in tbl.collect())
        assert got == [(1, 1.0, "a"), (2, 2.0, "b")]
        # partition pruning flows through the view
        one = tbl.where("d = 'a'")
        assert [r.id for r in one.collect()] == [1]
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # a further rename re-syncs the view in lockstep
        engine.rename_column("cdb.cmap", "amount", "price")
        engine.sync_catalog("cdb.cmap")
        assert spark.table("cdb.cmap").columns == ["id", "price", "d"]
        # reprocess one partition: catalog follows on the physical table
        engine.insert(spark.createDataFrame([(9, 9.0, "b")],
                                            "id bigint, price double, "
                                            "d string"),
                      "cdb.cmap", "u", "v2")
        assert engine.sync_catalog("cdb.cmap") == 1
        got = sorted((r.id, r.price, r.d)
                     for r in spark.table("cdb.cmap").collect())
        assert got == [(1, 1.0, "a"), (9, 9.0, "b")]
    finally:
        spark.sql("DROP VIEW IF EXISTS cdb.cmap")
        spark.sql("DROP TABLE IF EXISTS cdb.cmap__phys")


def test_sync_refuses_tables_with_deletion_vectors(spark, engine):
    """A plain catalog reader ignores _dv sidecars: deleted rows would
    resurrect and dv-updated rows double-count — sync must refuse until
    compact() materializes the vectors away."""
    try:
        engine.create_table("cdb.dvg", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id bigint, d string"),
            "cdb.dvg", "u", "v1")
        engine.sync_catalog("cdb.dvg")  # clean table syncs fine
        engine.delete("cdb.dvg", "id = 1", "u", "dv", mode="dv")
        with pytest.raises(ValueError, match="compact"):
            engine.sync_catalog("cdb.dvg")
        engine.compact("cdb.dvg")
        engine.sync_catalog("cdb.dvg")
        assert sorted(r.id for r in spark.table("cdb.dvg").collect()) \
            == [2, 3]
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.dvg")


@pytest.mark.parametrize("path", ["bulk", "fallback"])
def test_sync_bulk_and_fallback_paths_converge(spark, engine, monkeypatch,
                                               path):
    """catalog_current_version has two read paths: the bulk JVM
    SessionCatalog.listPartitions call and the SHOW PARTITIONS + DESCRIBE
    per-partition fallback (taken when the py4j surface is unavailable).
    They must produce IDENTICAL state — the r5 case-recasing bug lived
    exactly in this seam, visible only on whichever path a test didn't
    force. Both paths run the full lifecycle: initial sync, update,
    no-op convergence, mixed-case + escaped partition values."""
    import table_versions_spark.catalog as cat

    if path == "fallback":
        monkeypatch.setattr(cat, "_bulk_partition_versions",
                            lambda *a, **k: None)
    try:
        # mixed-case partition column AND a value needing dir-name
        # escaping — the two historical desync hazards
        ddl = "id bigint, Day string"
        engine.create_table("cdb.bf", schema_ddl=ddl,
                            partition_columns=["Day"])
        engine.insert(spark.createDataFrame(
            [(1, "d1"), (2, "x:y"), (3, "d3")], ddl), "cdb.bf", "u", "base")
        assert engine.sync_catalog("cdb.bf") == 3
        assert sorted((r.id, r.Day) for r in
                      spark.table("cdb.bf").collect()) \
            == [(1, "d1"), (2, "x:y"), (3, "d3")]
        # converged: re-sync applies zero ops (read-back == log state)
        assert engine.sync_catalog("cdb.bf") == 0
        # reprocess one partition: exactly one location update
        engine.insert(spark.createDataFrame([(9, "x:y")], ddl),
                      "cdb.bf", "u", "redo")
        assert engine.sync_catalog("cdb.bf") == 1
        assert engine.sync_catalog("cdb.bf") == 0
        assert sorted((r.id, r.Day) for r in
                      spark.table("cdb.bf").collect()) \
            == [(1, "d1"), (3, "d3"), (9, "x:y")]
        # the state the forced path reads equals the log's view
        defn = engine.definition("cdb.bf")
        got = cat.catalog_current_version(spark, "cdb.bf", defn)
        from table_versions_spark.core.log import FileTableVersions

        want = FileTableVersions(defn.location, engine.storage) \
            .current_version(defn.name)
        assert got.partition_versions == want.partition_versions
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.bf")


def test_sync_mixed_case_partition_column_converges(spark, engine):
    """Hive lowercases partition column names; the read-back must re-case
    to the declared names or every other sync emits a spurious Add+Drop
    pair and the DROP deletes the live catalog partition."""
    try:
        ddl = "id bigint, Day string"
        engine.create_table("cdb.mc", schema_ddl=ddl,
                            partition_columns=["Day"])
        engine.insert(spark.createDataFrame([(1, "d1"), (2, "d2")], ddl),
                      "cdb.mc", "u", "base")
        assert engine.sync_catalog("cdb.mc") == 2
        # converged: a re-sync with no commits applies ZERO ops
        assert engine.sync_catalog("cdb.mc") == 0
        assert sorted(r.id for r in spark.table("cdb.mc").collect()) \
            == [1, 2]
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.mc")


def test_sync_reconciles_evolved_schema(spark, engine):
    """Columns added via evolve_schema after the first sync must reach
    vanilla readers on the next sync (ALTER TABLE ADD COLUMNS)."""
    try:
        ddl = "id bigint, d string"
        engine.create_table("cdb.ev", schema_ddl=ddl,
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a")], ddl),
                      "cdb.ev", "u", "base")
        engine.sync_catalog("cdb.ev")
        engine.insert(spark.createDataFrame(
            [(2, 5.0, "a")], "id bigint, extra double, d string"),
            "cdb.ev", "u", "widen", evolve_schema=True)
        engine.sync_catalog("cdb.ev")
        got = spark.table("cdb.ev")
        assert "extra" in got.columns
        assert sorted((r.id, r.extra) for r in got.collect()) \
            == [(2, 5.0)]
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.ev")


def test_sync_schema_less_table_with_existing_entry(spark, engine):
    """A table whose meta carries no schema_ddl must still sync when the
    catalog entry already exists (reconciliation has nothing to compare
    against and must not crash on _schema_fields(None))."""
    from table_versions_spark.catalog import sync_catalog

    try:
        engine.create_table("cdb.nds", schema_ddl="id bigint")
        engine.insert(spark.createDataFrame([(1,)], "id bigint"),
                      "cdb.nds", "u", "base")
        defn, log = engine._log("cdb.nds")
        spark.sql(f"CREATE TABLE cdb.nds (id bigint) USING parquet "
                  f"LOCATION '{defn.location}'")
        import dataclasses
        bare = dataclasses.replace(defn, schema_ddl=None)
        assert sync_catalog(spark, bare, log) == 1
        assert [r.id for r in spark.table("cdb.nds").collect()] == [1]
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.nds")


def test_bulk_listing_partition_arity_mismatch_raises(spark, engine):
    """A catalog entry partitioned by MORE columns than the table
    declares must raise a clean diagnostic, not collapse distinct
    partitions onto one key (zip-truncation class)."""
    import pytest as _pytest

    from table_versions_spark.catalog import (
        PartitionKeyMismatch,
        _bulk_partition_versions,
    )

    try:
        ddl = "id bigint, a string"
        engine.create_table("cdb.bam", schema_ddl=ddl,
                            partition_columns=["a"])
        defn, _ = engine._log("cdb.bam")
        spark.sql("CREATE TABLE cdb.bam (id bigint, a string, b string) "
                  "USING parquet PARTITIONED BY (a, b) "
                  f"LOCATION '{defn.location}'")
        spark.sql("ALTER TABLE cdb.bam ADD PARTITION (a='1', b='1')")
        spark.sql("ALTER TABLE cdb.bam ADD PARTITION (a='1', b='2')")
        with _pytest.raises(PartitionKeyMismatch, match="partition column"):
            _bulk_partition_versions(spark, "cdb.bam", defn)
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.bam")


def test_bulk_partition_listing_active_and_consistent(spark, engine):
    """The one-call SessionCatalog listing must actually engage (a silent
    fallback to SHOW PARTITIONS + DESCRIBE-per-partition is an N+1
    metastore pattern — minutes on a 10k-partition table) and must agree
    with the per-partition read-back."""
    from table_versions_spark.catalog import (
        _bulk_partition_versions,
        catalog_current_version,
        sync_catalog,
    )

    try:
        ddl = "id bigint, d string"
        engine.create_table("cdb.blk", schema_ddl=ddl,
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(i, f"p{i % 5}") for i in range(20)], ddl),
            "cdb.blk", "u", "base")
        defn, log = engine._log("cdb.blk")
        sync_catalog(spark, defn, log)
        bulk = _bulk_partition_versions(spark, "cdb.blk", defn)
        assert bulk is not None, (
            "bulk listing fell back — the py4j SessionCatalog surface "
            "drifted; sync still works but is N+1 round trips")
        assert len(bulk) == 5
        cur = catalog_current_version(spark, "cdb.blk", defn)
        assert {p: v for p, v in bulk.items()} == dict(
            cur.partition_versions)
    finally:
        spark.sql("DROP TABLE IF EXISTS cdb.blk")
