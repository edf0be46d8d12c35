"""Storage-backend contract tests + cross-process commit-CAS stress.

Every backend must satisfy the same contract the commit log and publish
protocol rely on; the reference gets this from Hadoop's FileSystem API
(``spark/.../filesystem/VersionedFileSystem.scala:36-98``), we pin it here
so an S3/GCS implementation has an executable spec to pass.
"""

import json
import multiprocessing
import os

import pytest

from table_versions_spark.core.log import FileTableVersions
from table_versions_spark.core.model import (
    AddPartitionVersion,
    Partition,
    PartitionedTableVersion,
    TableName,
    TableUpdate,
    TableUpdateMetadata,
    Version,
)
from table_versions_spark.core.storage import (
    LocalStorage,
    MemoryStorage,
    ObjectStoreStorage,
)

T = TableName("db", "t")


@pytest.fixture(params=["local", "objectstore", "memory"])
def storage(request):
    return {"local": LocalStorage(), "objectstore": ObjectStoreStorage(),
            "memory": MemoryStorage()}[request.param]


class TestStorageContract:
    def test_write_read_exists(self, storage, tmp_path):
        p = str(tmp_path / "a" / "x.json")
        assert not storage.exists(p)
        storage.write_atomic(p, '{"k": 1}')
        assert storage.exists(p)
        assert json.loads(storage.read_text(p)) == {"k": 1}
        storage.write_atomic(p, '{"k": 2}')  # overwrite allowed
        assert json.loads(storage.read_text(p)) == {"k": 2}

    def test_read_missing_raises(self, storage, tmp_path):
        with pytest.raises(FileNotFoundError):
            storage.read_text(str(tmp_path / "nope"))

    def test_list_dir_names_only(self, storage, tmp_path):
        base = str(tmp_path / "d")
        storage.write_atomic(os.path.join(base, "one.json"), "1")
        storage.write_atomic(os.path.join(base, "sub", "two.json"), "2")
        names = set(storage.list_dir(base))
        assert "one.json" in names and "sub" in names
        assert storage.list_dir(str(tmp_path / "missing")) == []

    def test_create_exclusive_is_cas(self, storage, tmp_path):
        p = str(tmp_path / "d" / "claim")
        storage.makedirs(str(tmp_path / "d"))
        assert storage.create_exclusive(p, "first") is True
        assert storage.create_exclusive(p, "second") is False
        assert storage.read_text(p) == "first"

    def test_update_atomic_read_modify_write(self, storage, tmp_path):
        p = str(tmp_path / "d" / "ptr")
        got = storage.update_atomic(p, lambda cur: "v1" if cur is None else None)
        assert got == "v1"
        # guard declines: content unchanged, current returned
        got = storage.update_atomic(p, lambda cur: None)
        assert got == "v1"
        got = storage.update_atomic(p, lambda cur: cur + "+v2")
        assert got == "v1+v2"
        assert storage.read_text(p) == "v1+v2"

    def test_publish_dir_moves_subtree(self, storage, tmp_path):
        src = str(tmp_path / "staging" / "d=1")
        storage.write_atomic(os.path.join(src, "part-0.parquet"), "data0")
        storage.write_atomic(os.path.join(src, "nested", "part-1.parquet"), "data1")
        dst = str(tmp_path / "final" / "d=1" / "v1")
        storage.publish_dir(src, dst)
        assert storage.read_text(os.path.join(dst, "part-0.parquet")) == "data0"
        assert storage.read_text(
            os.path.join(dst, "nested", "part-1.parquet")) == "data1"
        assert not storage.exists(os.path.join(src, "part-0.parquet"))

    def test_link_or_copy(self, storage, tmp_path):
        src = str(tmp_path / "s" / "f.parquet")
        storage.write_atomic(src, "bytes")
        dst = str(tmp_path / "t" / "f.parquet")
        storage.makedirs(str(tmp_path / "t"))
        storage.link_or_copy(src, dst)
        assert storage.read_text(dst) == "bytes"
        assert storage.read_text(src) == "bytes"  # source untouched

    def test_remove_tree(self, storage, tmp_path):
        base = str(tmp_path / "rm")
        storage.write_atomic(os.path.join(base, "a"), "1")
        storage.write_atomic(os.path.join(base, "sub", "b"), "2")
        storage.remove_tree(base)
        assert not storage.exists(os.path.join(base, "a"))
        assert not storage.exists(os.path.join(base, "sub", "b"))
        storage.remove_tree(base)  # idempotent

    def test_no_rename_semantics_on_object_store(self, tmp_path):
        """The object-store backend must go through per-file copy+delete —
        verify publish works when src/dst live on 'different prefixes' and
        that nothing relies on os.rename by publishing a deep tree."""
        storage = ObjectStoreStorage(copy_workers=4)
        src = str(tmp_path / "stage")
        files = [f"col={i}/part-{j}.parquet" for i in range(3) for j in range(4)]
        for rel in files:
            storage.write_atomic(os.path.join(src, rel), rel)
        dst = str(tmp_path / "published" / "v1")
        storage.publish_dir(src, dst)
        for rel in files:
            assert storage.read_text(os.path.join(dst, rel)) == rel


def mk_update(*ops):
    return TableUpdate(TableUpdateMetadata.create("u", "m"), tuple(ops))


class TestLogOnBackends:
    """The commit log folds identically on every backend."""

    def test_full_lifecycle(self, storage, tmp_path):
        log = FileTableVersions(str(tmp_path / "tbl"), storage)
        log.init(T, is_snapshot=False, user_id="u", message="init")
        v1, v2 = Version.generate(), Version.generate()
        log.commit(T, mk_update(
            AddPartitionVersion(Partition.parse("date=2024-01-01"), v1)))
        log.commit(T, mk_update(
            AddPartitionVersion(Partition.parse("date=2024-01-02"), v2)))
        state = log.current_version(T)
        assert isinstance(state, PartitionedTableVersion)
        assert len(state.partition_versions) == 2
        metas = log.updates(T)
        assert len(metas) == 3
        # rollback to the first data commit and fold again
        log.set_current_version(T, metas[1].commit_id)
        assert len(log.current_version(T).partition_versions) == 1

    def test_checkpoint_roundtrip(self, storage, tmp_path):
        log = FileTableVersions(str(tmp_path / "tbl"), storage)
        log.init(T, is_snapshot=False, user_id="u", message="init")
        for i in range(1, 14):
            log.commit(T, mk_update(AddPartitionVersion(
                Partition.parse(f"date=2024-01-{i:02d}"), Version.generate())))
        assert len(log.current_version(T).partition_versions) == 13
        # time-travel before the checkpoint still folds correctly
        metas = log.updates(T)
        early = metas[-6].commit_id  # 5th data commit
        assert len(log.current_version(T, at_commit=early).partition_versions) == 5


def _hammer(args):
    """Cross-process commit writer (module-level: must pickle)."""
    location, n_commits, worker, backend = args
    storage = (ObjectStoreStorage() if backend == "objectstore"
               else LocalStorage())
    log = FileTableVersions(location, storage)
    for i in range(n_commits):
        log.commit(TableName("db", "t"), TableUpdate(
            TableUpdateMetadata.create(f"w{worker}", f"c{i}"),
            (AddPartitionVersion(Partition.parse(f"date=w{worker}-{i}"),
                                 Version.generate()),)))
    return worker


class TestMultiprocessCommitCAS:
    @pytest.mark.parametrize("backend", ["local", "objectstore"])
    def test_pointer_never_regresses_under_process_race(self, tmp_path,
                                                        backend):
        """16 OS processes hammer commit() on one table: every commit must
        land in a distinct seq slot, the fold must contain every partition,
        and the pointer must end exactly at head (update_atomic's monotone
        guard — flock locally, conditional-put emulation on the object
        backend — is serialized across processes)."""
        storage = (ObjectStoreStorage() if backend == "objectstore"
                   else LocalStorage())
        location = str(tmp_path / "tbl")
        log = FileTableVersions(location, storage)
        log.init(T, is_snapshot=False, user_id="u", message="init")
        n_workers, n_commits = 16, 3
        with multiprocessing.Pool(n_workers) as pool:
            done = pool.map(_hammer,
                            [(location, n_commits, w, backend)
                             for w in range(n_workers)])
        assert sorted(done) == list(range(n_workers))
        state = log.table_state(T)
        assert len(state.updates) == n_workers * n_commits + 1
        head = log.current_version(T)
        assert len(head.partition_versions) == n_workers * n_commits
        # pointer is exactly at head — no trailing allowed anymore
        assert state.current_version == state.updates[-1].metadata.commit_id


def _race_occ(location, worker, barrier, queue):
    """Cross-process OCC writer (explicit Process, one per worker — a Pool
    could hand one worker two tasks and deadlock the barrier). Captures the
    head fold BEFORE the barrier, then races a same-partition commit
    guarded by the engine's own conflict precondition."""
    from table_versions_spark.core.log import ConcurrentWriteError
    from table_versions_spark.core.model import (
        PartitionSchema, TableDefinition)
    from table_versions_spark.engine import VersionedEngine

    log = FileTableVersions(location, LocalStorage())
    defn = TableDefinition(T, location, PartitionSchema(("date",)))
    part = Partition.parse("date=2024-01-01")
    base_fold = log.head_fold(T)          # every worker sees the same head
    precondition = VersionedEngine._conflict_precondition(
        defn, base_fold, {part})
    v = Version.generate()
    barrier.wait()
    try:
        log.commit(T, TableUpdate(
            TableUpdateMetadata.create(f"w{worker}", "race"),
            (AddPartitionVersion(part, v),)), precondition=precondition)
        queue.put(("won", worker, v.label))
    except ConcurrentWriteError:
        queue.put(("lost", worker, None))


class TestCrossProcessOCC:
    def test_same_partition_race_has_exactly_one_winner(self, tmp_path):
        """The storage-CAS commit (core/log.py:144) is the engine's single
        point of atomicity: when N separate OS processes race commits to
        the SAME partition, each guarded by the engine's
        ``_conflict_precondition`` against the same base fold, exactly one
        must win — every loser must abort with ``ConcurrentWriteError``
        (no silent retry-land that would drop the first-writer-wins
        guarantee), no commit file may be lost or shared, and the head
        partition version must be the winner's."""
        location = str(tmp_path / "tbl")
        log = FileTableVersions(location, LocalStorage())
        log.init(T, is_snapshot=False, user_id="u", message="init")
        log.commit(T, TableUpdate(
            TableUpdateMetadata.create("u", "seed"),
            (AddPartitionVersion(Partition.parse("date=2024-01-01"),
                                 Version.generate()),)))
        n = 8
        ctx = multiprocessing.get_context("fork")
        barrier, queue = ctx.Barrier(n), ctx.Queue()
        procs = [ctx.Process(target=_race_occ,
                             args=(location, w, barrier, queue))
                 for w in range(n)]
        for p in procs:
            p.start()
        results = [queue.get(timeout=60) for _ in range(n)]
        for p in procs:
            p.join(timeout=60)
        outcomes = [r[0] for r in results]
        assert outcomes.count("won") == 1, results
        assert outcomes.count("lost") == n - 1
        winner_label = next(r[2] for r in results if r[0] == "won")
        state = log.table_state(T)
        # init + seed + exactly the one winning commit; losers left nothing
        assert len(state.updates) == 3
        head = log.current_version(T)
        assert head.partition_versions[
            Partition.parse("date=2024-01-01")].label == winner_label


class TestRangedReads:
    def test_open_input_is_ranged_and_seekable(self, tmp_path):
        """Object-store open_input must serve pyarrow footer reads via
        ranged GETs (O(footer), not O(file)) and satisfy the full
        read/seek/tell contract."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        from table_versions_spark.core.storage import ObjectStoreStorage

        s = ObjectStoreStorage()
        p = str(tmp_path / "t.parquet")
        import os as _os
        pq.write_table(
            pa.table({"a": list(range(20000)),
                      "b": [("x%05d" % i) * 8 for i in range(20000)]}),
            p, compression="none")
        assert _os.path.getsize(p) > 1 << 19  # ≫ the 64 KiB read buffer
        ranges = []
        orig = s._get_range

        def spy(path, start, length):
            ranges.append((start, length))
            return orig(path, start, length)

        s._get_range = spy
        with s.open_input(p) as f:
            assert isinstance(f, io.BufferedReader)
            meta = pq.ParquetFile(f).metadata
            assert meta.num_rows == 20000
        total = sum(n for _, n in ranges)
        assert total < s.file_size(p)  # footer read ≪ full object
        # column-pruned read fetches less than the whole file too
        ranges.clear()
        with s.open_input(p) as f:
            t = pq.read_table(f, columns=["a"])
        assert t.num_rows == 20000
        assert sum(n for _, n in ranges) < s.file_size(p)
        # plain sequential read still returns full content
        with s.open_input(p) as f:
            data = f.read()
        assert len(data) == s.file_size(p)

    def test_memory_storage_ranged(self):
        from table_versions_spark.core.storage import MemoryStorage

        m = MemoryStorage()
        m._put("/x/blob", b"0123456789")
        with m.open_input("/x/blob") as f:
            f.seek(4)
            assert f.read(3) == b"456"
            f.seek(-2, 2)
            assert f.read() == b"89"


def test_storage_from_name_case_insensitive():
    from table_versions_spark.core.storage import (
        DEFAULT_STORAGE,
        ObjectStoreStorage,
        storage_from_name,
    )

    assert storage_from_name("Local") is DEFAULT_STORAGE
    assert storage_from_name("LOCAL") is DEFAULT_STORAGE
    assert isinstance(storage_from_name("Object"), ObjectStoreStorage)
    with pytest.raises(ValueError, match="Unknown storage"):
        storage_from_name("hdfs")


def test_ranged_reader_rejects_negative_seek(tmp_path):
    from table_versions_spark.core.storage import ObjectStoreStorage

    p = str(tmp_path / "f.bin")
    st = ObjectStoreStorage()
    st.write_atomic(p, "0123456789")
    with st.open_input(p) as f:
        f.seek(3)
        assert f.read(2) == b"34"
        with pytest.raises(ValueError, match="negative seek"):
            f.seek(-5)
        with pytest.raises(ValueError, match="negative seek"):
            f.seek(-99, 1)
