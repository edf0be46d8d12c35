"""Cloud-catalog (Glue-style) sync tests against a dict-backed fake client.

Mirrors the behavior the reference exercises against AWS Glue
(``glue/src/test/scala/.../GlueMetastoreIntegrationTest`` shapes): add /
repoint / drop partitions, snapshot relocation, read-back parity, and
idempotent re-sync. The fake implements the same :class:`CloudCatalogClient`
protocol the boto3 ``GlueCatalogClient`` maps onto SDK calls.
"""

import pytest

from table_versions_spark.catalog_cloud import (
    cloud_catalog_current_version,
    sync_cloud_catalog,
)
from table_versions_spark.core.log import FileTableVersions
from table_versions_spark.core.model import (
    HIVE_DEFAULT_PARTITION,
    PartitionedTableVersion,
    SnapshotTableVersion,
)


class FakeCatalogClient:
    """In-memory Glue stand-in; records every mutating call."""

    def __init__(self):
        self.tables = {}
        self.partitions = {}  # (db, name) -> {tuple(values): location}
        self.databases = set()
        self.calls = []

    def ensure_database(self, db):
        self.databases.add(db)

    def get_table(self, db, name):
        return self.tables[(db, name)]

    def create_table(self, db, name, location, partition_keys, columns,
                     format):
        assert db in self.databases, "create_table before ensure_database"
        self.calls.append(("create_table", name))
        self.tables[(db, name)] = {
            "location": location,
            "partition_keys": [k for k, _ in partition_keys],
            "columns": columns, "format": format}
        self.partitions[(db, name)] = {}

    def update_table_location(self, db, name, location):
        self.calls.append(("update_table_location", location))
        self.tables[(db, name)]["location"] = location

    def update_table_columns(self, db, name, columns):
        self.calls.append(("update_table_columns", tuple(columns)))
        self.tables[(db, name)]["columns"] = columns

    def get_partitions(self, db, name):
        return [{"values": list(v), "location": loc}
                for v, loc in self.partitions.get((db, name), {}).items()]

    def create_partition(self, db, name, values, location):
        self.calls.append(("create_partition", tuple(values)))
        self.partitions[(db, name)][tuple(values)] = location

    def update_partition(self, db, name, values, location):
        self.calls.append(("update_partition", tuple(values)))
        assert tuple(values) in self.partitions[(db, name)]
        self.partitions[(db, name)][tuple(values)] = location

    def delete_partition(self, db, name, values):
        self.calls.append(("delete_partition", tuple(values)))
        del self.partitions[(db, name)][tuple(values)]


@pytest.fixture
def fake():
    return FakeCatalogClient()


class TestCloudCatalogSync:
    def test_partitioned_lifecycle(self, spark, engine, fake):
        ddl = "id bigint, d string"
        engine.create_table("cdb.t", schema_ddl=ddl, partition_columns=["d"])
        defn = engine.definition("cdb.t")
        log = FileTableVersions(defn.location, engine.storage)

        engine.insert(spark.createDataFrame(
            [(1, "a"), (2, "b")], ddl), "cdb.t", "u", "c1")
        n = sync_cloud_catalog(fake, defn, log)
        assert n == 2  # two AddPartition ops
        locs = {tuple(p["values"]): p["location"]
                for p in fake.get_partitions("cdb", "t")}
        assert set(locs) == {("a",), ("b",)}
        state = engine.current_version("cdb.t")
        for p, v in state.partition_versions.items():
            assert locs[(p.column_values[0].value,)].endswith(v.label)

        # overwrite d=b -> one UpdatePartitionVersion; re-sync idempotent
        engine.insert(spark.createDataFrame([(3, "b")], ddl), "cdb.t", "u", "c2")
        assert sync_cloud_catalog(fake, defn, log) == 1
        assert fake.calls[-1][0] == "update_partition"
        assert sync_cloud_catalog(fake, defn, log) == 0

        # read-back parity: catalog state == log state
        assert isinstance(cloud_catalog_current_version(fake, defn),
                          PartitionedTableVersion)
        assert (cloud_catalog_current_version(fake, defn).partition_versions
                == engine.current_version("cdb.t").partition_versions)

        # delete emptying d=a -> DeletePartition
        engine.delete("cdb.t", "d = 'a'", "u", "drop a")
        assert sync_cloud_catalog(fake, defn, log) == 1
        assert fake.calls[-1][0] == "delete_partition"
        assert set(p["values"][0] for p in fake.get_partitions("cdb", "t")) == {"b"}

    def test_snapshot_relocation(self, spark, engine, fake):
        ddl = "id bigint"
        engine.create_table("cdb.s", schema_ddl=ddl)
        defn = engine.definition("cdb.s")
        log = FileTableVersions(defn.location, engine.storage)
        engine.insert(spark.createDataFrame([(1,)], ddl), "cdb.s", "u", "v1")
        assert sync_cloud_catalog(fake, defn, log) == 1
        v1_loc = fake.get_table("cdb", "s")["location"]
        engine.insert(spark.createDataFrame([(2,)], ddl), "cdb.s", "u", "v2")
        assert sync_cloud_catalog(fake, defn, log) == 1
        v2_loc = fake.get_table("cdb", "s")["location"]
        assert v1_loc != v2_loc
        assert isinstance(cloud_catalog_current_version(fake, defn),
                          SnapshotTableVersion)

    def test_raw_values_and_null_partition(self, spark, engine, fake):
        """Catalog partition VALUES are raw (unescaped); NULL keeps the Hive
        default-partition literal; LOCATIONS keep the escaped dir form."""
        ddl = "id bigint, d string"
        engine.create_table("cdb.r", schema_ddl=ddl, partition_columns=["d"])
        defn = engine.definition("cdb.r")
        log = FileTableVersions(defn.location, engine.storage)
        engine.insert(spark.createDataFrame(
            [(1, "x:y"), (2, None)], ddl), "cdb.r", "u", "c1")
        sync_cloud_catalog(fake, defn, log)
        values = {p["values"][0] for p in fake.get_partitions("cdb", "r")}
        assert values == {"x:y", HIVE_DEFAULT_PARTITION}
        locs = {p["values"][0]: p["location"]
                for p in fake.get_partitions("cdb", "r")}
        assert "d=x%3Ay/" in locs["x:y"]
        # read-back round-trips to the same stored partition state
        assert (cloud_catalog_current_version(fake, defn).partition_versions
                == engine.current_version("cdb.r").partition_versions)


def test_cloud_sync_refuses_deletion_vectors(spark, engine, fake):
    """Same guard as the Hive path: vectors are invisible to a plain
    catalog reader, so sync refuses until compact()."""
    import pytest as _pytest

    engine.create_table("cdb.cdv", schema_ddl="id bigint, d string",
                        partition_columns=["d"])
    defn = engine.definition("cdb.cdv")
    log = FileTableVersions(defn.location, engine.storage)
    engine.insert(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, d string"), "cdb.cdv", "u", "v1")
    engine.delete("cdb.cdv", "id = 1", "u", "dv", mode="dv")
    with _pytest.raises(ValueError, match="compact"):
        sync_cloud_catalog(fake, defn, log)
    engine.compact("cdb.cdv")
    assert sync_cloud_catalog(fake, defn, log) > 0


def test_partition_arity_mismatch_raises(spark, engine, fake):
    """A catalog entry created with different partition keys must fail
    with a diagnostic, not silently truncate via zip."""
    ddl = "id bigint, a string, b string"
    engine.create_table("cdb.ar", schema_ddl=ddl,
                        partition_columns=["a", "b"])
    engine.insert(spark.createDataFrame([(1, "x", "y")], ddl),
                  "cdb.ar", "u", "base")
    defn, log = engine._log("cdb.ar")
    fake.ensure_database("cdb")
    fake.create_table("cdb", "ar", defn.location, [("a", "string")],
                      [("id", "bigint")], "parquet")
    fake.partitions[("cdb", "ar")][("x",)] = defn.location + "/a=x/v"
    with pytest.raises(ValueError, match="partition column"):
        sync_cloud_catalog(fake, defn, log)


def test_locationless_table_converges(spark, engine, fake):
    """A present-but-locationless snapshot catalog entry must read as
    UNVERSIONED (and converge via update_table_location), not as absent
    (which would crash-loop on create_table AlreadyExists)."""
    engine.create_table("cdb.nl", schema_ddl="id bigint")
    engine.insert(spark.createDataFrame([(1,)], "id bigint"),
                  "cdb.nl", "u", "base")
    defn, log = engine._log("cdb.nl")
    fake.ensure_database("cdb")
    fake.tables[("cdb", "nl")] = {"location": "", "partition_keys": []}
    fake.partitions[("cdb", "nl")] = {}
    assert sync_cloud_catalog(fake, defn, log) == 1
    assert ("create_table", "nl") not in fake.calls
    assert fake.tables[("cdb", "nl")]["location"].rstrip("/") != ""


def test_cloud_sync_reconciles_evolved_schema(spark, engine, fake):
    """Columns added via evolve_schema after the first sync must reach
    the cloud catalog's storage descriptor on the next sync (the Hive
    path's ADD COLUMNS equivalent) — and only when actually missing."""
    ddl = "id bigint, d string"
    engine.create_table("cdb.cev", schema_ddl=ddl,
                        partition_columns=["d"])
    engine.insert(spark.createDataFrame([(1, "a")], ddl),
                  "cdb.cev", "u", "base")
    defn, log = engine._log("cdb.cev")
    sync_cloud_catalog(fake, defn, log)
    assert fake.tables[("cdb", "cev")]["columns"] == [("id", "bigint")]
    engine.insert(spark.createDataFrame(
        [(2, 5.0, "a")], "id bigint, extra double, d string"),
        "cdb.cev", "u", "widen", evolve_schema=True)
    defn, log = engine._log("cdb.cev")
    sync_cloud_catalog(fake, defn, log)
    assert ("update_table_columns",
            (("id", "bigint"), ("extra", "double"))) in fake.calls
    assert fake.tables[("cdb", "cev")]["columns"] == [
        ("id", "bigint"), ("extra", "double")]
    # converged: a re-sync must NOT re-issue the column update
    n = len([c for c in fake.calls if c[0] == "update_table_columns"])
    sync_cloud_catalog(fake, defn, log)
    assert len([c for c in fake.calls
                if c[0] == "update_table_columns"]) == n


def test_cloud_sync_tolerates_columnless_get_table(spark, engine, fake):
    """A minimal client whose get_table omits 'columns' skips schema
    reconciliation instead of crashing."""
    engine.create_table("cdb.ncol", schema_ddl="id bigint")
    engine.insert(spark.createDataFrame([(1,)], "id bigint"),
                  "cdb.ncol", "u", "base")
    defn, log = engine._log("cdb.ncol")
    fake.ensure_database("cdb")
    fake.tables[("cdb", "ncol")] = {"location": defn.location,
                                    "partition_keys": []}
    fake.partitions[("cdb", "ncol")] = {}
    assert sync_cloud_catalog(fake, defn, log) == 1
    assert not any(c[0] == "update_table_columns" for c in fake.calls)
