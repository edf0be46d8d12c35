"""GlueCatalogClient over a real boto3 Glue client mocked by moto — the
integration counterpart of ``tests/test_catalog_cloud.py``'s protocol fake,
mirroring the reference's env-gated integration spec
(``glue/src/it/scala/com/gu/tableversions/glue/GlueMetastoreIntegrationSpec.scala:26-117``):
create table, add/update/remove partition locations, relocate a snapshot
table, read the state back — all through the actual boto3 Glue API surface
(CreateTable/CreatePartition/UpdatePartition/DeletePartition/UpdateTable +
paginated GetPartitions).
"""

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from table_versions_spark.catalog_cloud import (  # noqa: E402
    GlueCatalogClient,
    cloud_catalog_current_version,
    sync_cloud_catalog,
)
from table_versions_spark.core.log import FileTableVersions  # noqa: E402
from table_versions_spark.core.model import (  # noqa: E402
    PartitionedTableVersion,
    SnapshotTableVersion,
)


@pytest.fixture
def glue():
    with moto.mock_aws():
        client = boto3.client("glue", region_name="us-east-1")
        client.create_database(DatabaseInput={"Name": "gdb"})
        yield GlueCatalogClient(client=client)


class TestGlueMotoSync:
    def test_partitioned_lifecycle(self, spark, engine, glue):
        """Insert → sync → reprocess → sync → remove → sync, with the
        catalog state read back through real GetPartitions each round."""
        engine.create_table("gdb.pages", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a"), (2, "b")],
                                            "id bigint, d string"),
                      "gdb.pages", "u", "v1")
        defn, log = engine._log("gdb.pages")
        assert sync_cloud_catalog(glue, defn, log) == 2
        state = cloud_catalog_current_version(glue, defn)
        assert isinstance(state, PartitionedTableVersion)
        assert state == log.current_version(defn.name)
        # every partition location is a versioned dir under the table root
        for p in glue.get_partitions("gdb", "pages"):
            assert defn.location in p["location"]
            assert f"d={p['values'][0]}/" in p["location"] + "/"
        # reprocess partition b: exactly one UpdatePartition
        engine.insert(spark.createDataFrame([(9, "b")],
                                            "id bigint, d string"),
                      "gdb.pages", "u", "v2")
        assert sync_cloud_catalog(glue, defn, log) == 1
        assert cloud_catalog_current_version(glue, defn) \
            == log.current_version(defn.name)
        # converged: re-sync is a no-op
        assert sync_cloud_catalog(glue, defn, log) == 0
        # rollback: catalog follows the pointer (reference checkout)
        first = engine.history("gdb.pages").collect()[1]["commit_id"]
        engine.checkout("gdb.pages", first)
        assert sync_cloud_catalog(glue, defn, log) == 1
        assert cloud_catalog_current_version(glue, defn) \
            == log.current_version(defn.name)

    def test_snapshot_relocation(self, spark, engine, glue):
        """Snapshot table: each insert moves the Glue table LOCATION to
        the fresh version dir (reference UpdateTable,
        ``GlueMetastore.scala:143-155``)."""
        engine.create_table("gdb.users", schema_ddl="id bigint, name string")
        engine.insert(spark.createDataFrame([(1, "a")],
                                            "id bigint, name string"),
                      "gdb.users", "u", "v1")
        defn, log = engine._log("gdb.users")
        sync_cloud_catalog(glue, defn, log)
        s1 = cloud_catalog_current_version(glue, defn)
        assert isinstance(s1, SnapshotTableVersion)
        assert s1 == log.current_version(defn.name)
        engine.insert(spark.createDataFrame([(2, "b")],
                                            "id bigint, name string"),
                      "gdb.users", "u", "v2")
        assert sync_cloud_catalog(glue, defn, log) == 1
        s2 = cloud_catalog_current_version(glue, defn)
        assert s2 == log.current_version(defn.name)
        assert s1 != s2
        loc = glue.get_table("gdb", "users")["location"]
        assert loc.rstrip("/").endswith(s2.version.label)


class TestGlueTableInputPreservation:
    def test_update_location_preserves_table_fields(self, glue):
        """Glue UpdateTable replaces the WHOLE definition: relocating a
        snapshot table must carry TableType/Parameters/Description or
        Athena-style readers lose the table."""
        c = glue._glue
        c.create_table(DatabaseName="gdb", TableInput={
            "Name": "keepme", "TableType": "EXTERNAL_TABLE",
            "Description": "hands off",
            "Parameters": {"classification": "parquet"},
            "StorageDescriptor": {"Location": "s3://b/t/v1"}})
        glue.update_table_location("gdb", "keepme", "s3://b/t/v2")
        t = c.get_table(DatabaseName="gdb", Name="keepme")["Table"]
        assert t["StorageDescriptor"]["Location"] == "s3://b/t/v2"
        assert t["TableType"] == "EXTERNAL_TABLE"
        assert t["Parameters"] == {"classification": "parquet"}
        assert t["Description"] == "hands off"
