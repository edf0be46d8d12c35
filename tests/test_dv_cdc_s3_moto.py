"""DV/CDC data plane against ``s3://`` paths — moto *server* mode.

The mock_aws suites (test_storage_s3_moto, test_catalog_cloud_moto) pin
driver-side storage/catalog primitives; this module pins the EXECUTOR-side
data plane: a real moto HTTP server on localhost, an ``S3Storage`` carrying
a picklable ``endpoint_url``, and the tvx source/sink moving Arrow batches
through boto3 clients rebuilt inside Spark's python workers. That is the
end-to-end shape a cluster run has (every worker signs its own requests at
the store), minus only hadoop-aws — Spark-JVM ``s3a://`` reads need the
hadoop-aws jar, which this container does not ship, so engine paths that
scan through the JVM (``delete(mode='dv')``'s position scan,
``read_changes``'s DataFrame face) stay pinned by the local/objectstore
suites; the *sidecar plumbing* they produce (``_dv`` vectors, hardlink
carries, commit CAS, vacuum) is exercised here on real object-store
semantics.

Reference gates its integration suite the same way
(``glue/src/it/.../GlueMetastoreIntegrationSpec.scala:26-86`` — env-gated);
here the gate is moto importability.
"""

import os
import uuid

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from table_versions_spark.core.log import FileTableVersions  # noqa: E402
from table_versions_spark.core.model import (  # noqa: E402
    AddTableVersion,
    TableUpdate,
    TableUpdateMetadata,
    Version,
)
from table_versions_spark.core.paths import path_for  # noqa: E402
from table_versions_spark.core.storage import S3Storage  # noqa: E402
from table_versions_spark.engine import (  # noqa: E402
    VersionedEngine,
    _link_data_files,
)

BUCKET = "tvx-moto-e2e"


@pytest.fixture(scope="module")
def moto_server():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://127.0.0.1:{port}"
    client = boto3.client("s3", endpoint_url=endpoint,
                          region_name="us-east-1")
    client.create_bucket(Bucket=BUCKET)
    yield endpoint
    server.stop()


@pytest.fixture
def s3(moto_server):
    return S3Storage(endpoint_url=moto_server, copy_workers=4)


@pytest.fixture
def wh(moto_server):
    """A fresh warehouse root per test — moto state is module-shared."""
    return f"s3://{BUCKET}/wh-{uuid.uuid4().hex[:8]}"


def _sopt(moto_server):
    return f"s3@{moto_server}"


class TestEndpointPlumbing:
    def test_endpoint_url_survives_pickle(self, moto_server, s3):
        import pickle

        clone = pickle.loads(pickle.dumps(s3))
        assert clone.endpoint_url == moto_server
        path = f"s3://{BUCKET}/pickle-probe/x"
        clone.write_atomic(path, "via-clone")
        assert s3.read_text(path) == "via-clone"

    def test_storage_from_name_endpoint_form(self, moto_server):
        from table_versions_spark.core.storage import storage_from_name

        st = storage_from_name(_sopt(moto_server))
        assert isinstance(st, S3Storage)
        assert st.endpoint_url == moto_server

    def test_conditional_put_cas_on_server(self, s3):
        """The commit-slot CAS (PutObject If-None-Match: *) against moto's
        server implementation, not the in-process mock."""
        slot = f"s3://{BUCKET}/cas-probe/commit-0"
        assert s3.create_exclusive(slot, "winner") is True
        assert s3.create_exclusive(slot, "loser") is False
        assert s3.read_text(slot) == "winner"


class TestSinkSourceDataPlane:
    """Arrow batches through boto3 clients rebuilt inside Spark workers."""

    def test_sink_write_source_read_roundtrip(self, spark, moto_server,
                                              s3, wh):
        from table_versions_spark.streaming.source import register

        register(spark)
        engine = VersionedEngine(spark, wh, s3)
        engine.create_table("s3db.t", schema_ddl="id bigint, v string, d string",
                            partition_columns=["d"])
        loc = engine.definition("s3db.t").location
        assert loc.startswith("s3://")

        ddl = "id bigint, v string, d string"
        df = spark.createDataFrame(
            [(i, f"v{i}", "a" if i % 2 else "b") for i in range(20)], ddl)
        (df.write.format("tvx").mode("overwrite")
         .option("location", loc).option("storage", _sopt(moto_server))
         .save())
        got = (spark.read.format("tvx").option("location", loc)
               .option("storage", _sopt(moto_server)).load())
        assert sorted((r.id, r.v, r.d) for r in got.collect()) == \
            [(i, f"v{i}", "a" if i % 2 else "b") for i in range(20)]

        # append accumulates; OCC baseline captured on the server log
        (spark.createDataFrame([(100, "v100", "a")], ddl)
         .write.format("tvx").mode("append")
         .option("location", loc).option("storage", _sopt(moto_server))
         .save())
        got = (spark.read.format("tvx").option("location", loc)
               .option("storage", _sopt(moto_server)).load())
        assert got.count() == 21
        assert engine.history("s3db.t").count() == 3  # init + 2 commits

    def test_streaming_replication_exactly_once(self, spark, moto_server,
                                                s3, wh, tmp_path):
        """tvx source → tvx sink, both on the moto server: one versioned
        commit per epoch, txn tokens absorb replays — the q_stream_sink
        flow on real object-store semantics."""
        from table_versions_spark.streaming.source import register

        register(spark)
        engine = VersionedEngine(spark, wh, s3)
        ddl = "id bigint, v string"
        engine.create_table("s3db.src", schema_ddl=ddl)
        engine.create_table("s3db.dst", schema_ddl=ddl)
        src = engine.definition("s3db.src").location
        dst = engine.definition("s3db.dst").location
        # seed the source with two commits THROUGH the sink (JVM-free)
        for i in range(2):
            (spark.createDataFrame([(i, f"v{i}")], ddl)
             .write.format("tvx").mode("append")
             .option("location", src).option("storage", _sopt(moto_server))
             .save())

        ckpt = str(tmp_path / "ckpt")
        q = (spark.readStream.format("tvx")
             .option("location", src).option("storage", _sopt(moto_server))
             .load()
             .writeStream.format("tvx")
             .option("location", dst).option("storage", _sopt(moto_server))
             .option("txnApp", "moto-repl")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = (spark.read.format("tvx").option("location", dst)
               .option("storage", _sopt(moto_server)).load())
        assert sorted((r.id, r.v) for r in got.collect()) == \
            [(0, "v0"), (1, "v1")]
        # replay the SAME epochs from a fresh checkpoint: the txn
        # high-water probe on the server log must swallow them
        q = (spark.readStream.format("tvx")
             .option("location", src).option("storage", _sopt(moto_server))
             .load()
             .writeStream.format("tvx")
             .option("location", dst).option("storage", _sopt(moto_server))
             .option("txnApp", "moto-repl")
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = (spark.read.format("tvx").option("location", dst)
               .option("storage", _sopt(moto_server)).load())
        assert got.count() == 2  # no duplicates


def _dv_commit(engine, s3, table: str, delete_ids: set[int]):
    """Produce a deletion-vector commit on the s3 table WITHOUT the JVM
    scan `delete(mode='dv')` runs (no hadoop-aws here): positions are
    computed driver-side over the storage backend, then the commit uses
    the engine's own primitives — hardlink carry (server-side CopyObject),
    `_dv` sidecar in the engine's (file, idx) schema, log CAS append."""
    defn = engine.definition(table)
    log = FileTableVersions(defn.location, s3)
    state = log.current_version(defn.name)
    old_dir = path_for(defn.location, state.version)
    files, idxs = [], []
    for name in sorted(s3.list_dir(old_dir)):
        if name.startswith((".", "_")):
            continue
        with s3.open_input(os.path.join(old_dir, name)) as f:
            t = pq.read_table(f, columns=["id"])
        for pos, rid in enumerate(t.column("id").to_pylist()):
            if rid in delete_ids:
                files.append(name)
                idxs.append(pos)
    assert files, "delete_ids matched nothing — test setup bug"
    version = Version.generate()
    new_dir = path_for(defn.location, version)
    s3.makedirs(new_dir)
    _link_data_files(old_dir, new_dir, s3)
    dv_dir = os.path.join(new_dir, "_dv")
    s3.makedirs(dv_dir)
    with s3.open_output(os.path.join(dv_dir, "dv-0.parquet")) as f:
        pq.write_table(pa.table({"file": pa.array(files, pa.string()),
                                 "idx": pa.array(idxs, pa.int64())}), f)
    log.commit(defn.name,
               TableUpdate(TableUpdateMetadata.create("u", "dv delete"),
                           (AddTableVersion(version),)))


class TestDVSidecarsOnObjectStore:
    def test_dv_masking_and_streaming_cdf(self, spark, moto_server, s3,
                                          wh, tmp_path):
        """A dv commit whose data files are server-side-copied hardlink
        equivalents + a `_dv` sidecar: the tvx source must mask the
        deleted positions on batch reads, and the streaming change feed
        must emit EXACT tombstones from the vector delta — all I/O through
        the moto server."""
        from table_versions_spark.streaming.source import register

        register(spark)
        engine = VersionedEngine(spark, wh, s3)
        ddl = "id bigint, v string"
        engine.create_table("s3db.dv", schema_ddl=ddl)
        loc = engine.definition("s3db.dv").location
        (spark.createDataFrame([(i, f"v{i}") for i in range(10)], ddl)
         .write.format("tvx").mode("overwrite")
         .option("location", loc).option("storage", _sopt(moto_server))
         .save())

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            q = (spark.readStream.format("tvx")
                 .option("location", loc)
                 .option("storage", _sopt(moto_server))
                 .option("changeFeed", "true").load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_once()  # span 1: the initial state, all inserts
        rows = sorted((r.id, r._change_type)
                      for r in spark.read.parquet(out).collect())
        assert rows == [(i, "insert") for i in range(10)]

        _dv_commit(engine, s3, "s3db.dv", {2, 5})

        # batch face: vector applied executor-side over the server
        got = (spark.read.format("tvx").option("location", loc)
               .option("storage", _sopt(moto_server)).load())
        assert sorted(r.id for r in got.collect()) == \
            [0, 1, 3, 4, 6, 7, 8, 9]

        # span 2: the after dir is a hardlink superset + _dv — the vector
        # delta emits EXACT tombstones, nothing else
        run_once()
        rows = sorted((r.id, r._change_type)
                      for r in spark.read.parquet(out).collect())
        inserts = [(i, "insert") for i in range(10)]
        deletes = [(2, "delete"), (5, "delete")]
        assert rows == sorted(inserts + deletes)

    def test_vacuum_on_object_store(self, spark, moto_server, s3, wh):
        """vacuum(grace_hours=0) removes the superseded version dir's
        objects from the server; the live version survives."""
        from table_versions_spark.streaming.source import register

        register(spark)
        engine = VersionedEngine(spark, wh, s3)
        ddl = "id bigint, v string"
        engine.create_table("s3db.vac", schema_ddl=ddl)
        loc = engine.definition("s3db.vac").location
        for i in range(2):  # two overwrites: first version superseded
            (spark.createDataFrame([(i, f"v{i}")], ddl)
             .write.format("tvx").mode("overwrite")
             .option("location", loc).option("storage", _sopt(moto_server))
             .save())
        log = FileTableVersions(loc, s3)
        defn = engine.definition("s3db.vac")
        live = path_for(loc, log.current_version(defn.name).version)
        engine.vacuum("s3db.vac", keep_commits=1, grace_hours=0)
        assert s3.is_dir(live)
        # only the live version dir remains under the table location
        vdirs = [n for n in s3.list_dir(loc)
                 if not n.startswith((".", "_")) and "=" not in n]
        assert vdirs == [os.path.basename(live)]
        got = (spark.read.format("tvx").option("location", loc)
               .option("storage", _sopt(moto_server)).load())
        assert [(r.id, r.v) for r in got.collect()] == [(1, "v1")]
