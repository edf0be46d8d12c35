"""Commit-log behaviour tests.

Black-box port of the reference's interface-level suite
``core/src/test/scala/com/gu/tableversions/core/TableVersionsSpec.scala``:
idempotent init (:32-52), partition add/update (:54-105), remove + re-add with
fresh version (:107-162), snapshot versions (:164-196), rollback across history
(:198-377), history ordering (:379-406), unknown-table/commit errors (:408-464).
Run here against the persistent file-backed store (the reference had only an
in-memory impl).
"""

import random

import pytest

from table_versions_spark.core.log import (
    FileTableVersions,
    UnknownCommitError,
    UnknownTableError,
)
from table_versions_spark.core.model import (
    UNVERSIONED,
    AddPartitionVersion,
    AddTableVersion,
    Partition,
    PartitionedTableVersion,
    RemovePartition,
    SnapshotTableVersion,
    TableName,
    TableUpdate,
    TableUpdateMetadata,
    Version,
)

T = TableName("db", "t")


def mk_update(*ops, user="alice", message="msg"):
    return TableUpdate(TableUpdateMetadata.create(user, message), tuple(ops))


@pytest.fixture(params=["local", "objectstore", "memory"])
def log(tmp_path, request):
    from table_versions_spark.core.storage import (
        LocalStorage, MemoryStorage, ObjectStoreStorage)

    storage = {"local": LocalStorage(), "objectstore": ObjectStoreStorage(),
               "memory": MemoryStorage()}[request.param]
    return FileTableVersions(str(tmp_path / "table"), storage)


class TestInit:
    def test_init_creates_table(self, log):
        log.init(T, is_snapshot=False, user_id="u", message="init")
        assert log.exists()
        assert log.current_version(T) == PartitionedTableVersion({})

    def test_init_idempotent(self, log):
        # reference TableVersionsSpec.scala:32-52
        log.init(T, is_snapshot=False, user_id="u", message="init")
        v = Version.generate()
        log.commit(T, mk_update(AddPartitionVersion(Partition.parse("date=1"), v)))
        log.init(T, is_snapshot=False, user_id="u", message="init again")
        assert log.current_version(T) == PartitionedTableVersion(
            {Partition.parse("date=1"): v})
        assert len(log.updates(T)) == 2


class TestPartitioned:
    def test_add_and_update_partitions(self, log):
        # reference TableVersionsSpec.scala:54-105
        log.init(T, False, "u", "init")
        p1, p2 = Partition.parse("date=2019-03-01"), Partition.parse("date=2019-03-02")
        v1, v2, v3 = Version.generate(), Version.generate(), Version.generate()
        log.commit(T, mk_update(AddPartitionVersion(p1, v1),
                                AddPartitionVersion(p2, v1)))
        assert log.current_version(T).partition_versions == {p1: v1, p2: v1}
        log.commit(T, mk_update(AddPartitionVersion(p2, v2)))
        assert log.current_version(T).partition_versions == {p1: v1, p2: v2}
        log.commit(T, mk_update(AddPartitionVersion(p1, v3)))
        assert log.current_version(T).partition_versions == {p1: v3, p2: v2}

    def test_remove_and_readd_fresh_version(self, log):
        # reference TableVersionsSpec.scala:107-162
        log.init(T, False, "u", "init")
        p = Partition.parse("date=2019-03-01")
        v1, v2 = Version.generate(), Version.generate()
        log.commit(T, mk_update(AddPartitionVersion(p, v1)))
        log.commit(T, mk_update(RemovePartition(p)))
        assert log.current_version(T).partition_versions == {}
        log.commit(T, mk_update(AddPartitionVersion(p, v2)))
        assert log.current_version(T).partition_versions == {p: v2}
        assert v1 != v2  # re-added partition gets a fresh version


class TestSnapshot:
    def test_snapshot_updates(self, log):
        # reference TableVersionsSpec.scala:164-196
        log.init(T, True, "u", "init")
        assert log.current_version(T) == SnapshotTableVersion(UNVERSIONED)
        v1, v2 = Version.generate(), Version.generate()
        log.commit(T, mk_update(AddTableVersion(v1)))
        assert log.current_version(T) == SnapshotTableVersion(v1)
        log.commit(T, mk_update(AddTableVersion(v2)))
        assert log.current_version(T) == SnapshotTableVersion(v2)


class TestRollback:
    def test_rollback_partitioned(self, log):
        # reference TableVersionsSpec.scala:198-292
        log.init(T, False, "u", "init")
        p = Partition.parse("date=2019-03-01")
        v1, v2 = Version.generate(), Version.generate()
        u1 = mk_update(AddPartitionVersion(p, v1))
        u2 = mk_update(AddPartitionVersion(p, v2))
        log.commit(T, u1)
        log.commit(T, u2)
        assert log.current_version(T).partition_versions == {p: v2}
        log.set_current_version(T, u1.metadata.commit_id)
        assert log.current_version(T).partition_versions == {p: v1}
        # roll back to empty post-init state
        init_commit = log.table_state(T).updates[0].metadata.commit_id
        log.set_current_version(T, init_commit)
        assert log.current_version(T).partition_versions == {}
        # roll forward to head
        log.set_current_version(T, u2.metadata.commit_id)
        assert log.current_version(T).partition_versions == {p: v2}

    def test_rollback_snapshot(self, log):
        # reference TableVersionsSpec.scala:294-377
        log.init(T, True, "u", "init")
        v1, v2 = Version.generate(), Version.generate()
        u1 = mk_update(AddTableVersion(v1))
        u2 = mk_update(AddTableVersion(v2))
        log.commit(T, u1)
        log.commit(T, u2)
        log.set_current_version(T, u1.metadata.commit_id)
        assert log.current_version(T) == SnapshotTableVersion(v1)

    def test_commit_after_rollback_continues_from_head(self, log):
        # reference DatePartitionedTableLoaderSpec.scala:139-148 semantics:
        # commits append at head even when the pointer is behind
        log.init(T, False, "u", "init")
        p = Partition.parse("date=1")
        v1, v2 = Version.generate(), Version.generate()
        u1 = mk_update(AddPartitionVersion(p, v1))
        log.commit(T, u1)
        log.set_current_version(T, u1.metadata.commit_id)
        init_commit = log.table_state(T).updates[0].metadata.commit_id
        log.set_current_version(T, init_commit)
        u2 = mk_update(AddPartitionVersion(p, v2))
        log.commit(T, u2)
        # new commit contains full history and pointer at new head
        assert log.current_version(T).partition_versions == {p: v2}
        assert len(log.updates(T)) == 3


class TestHistory:
    def test_updates_most_recent_first(self, log):
        # reference TableVersionsSpec.scala:379-406 (100 shuffled commits)
        log.init(T, False, "u", "init")
        ids = []
        rng = random.Random(42)
        for i in rng.sample(range(100), 100):
            u = mk_update(
                AddPartitionVersion(Partition.parse(f"date=d{i}"), Version.generate()),
                message=f"commit {i}")
            log.commit(T, u)
            ids.append(u.metadata.commit_id)
        metas = log.updates(T)
        assert [m.commit_id for m in metas[:-1]] == list(reversed(ids))
        assert metas[-1].message == "init"


class TestCheckpoints:
    def test_state_correct_across_checkpoints(self, log):
        # CHECKPOINT_INTERVAL=10: 25 commits → checkpoints at seq 10 and 20
        import os

        from table_versions_spark.core.log import CHECKPOINT_PREFIX

        log.init(T, False, "u", "init")
        versions = {}
        commits = []
        for i in range(25):
            p = Partition.parse(f"date=d{i % 7}")
            v = Version.generate()
            versions[p] = v
            u = mk_update(AddPartitionVersion(p, v))
            log.commit(T, u)
            commits.append(u.metadata.commit_id)
        ckpts = [f for f in log.storage.list_dir(log.log_dir)
                 if f.startswith(CHECKPOINT_PREFIX)]
        assert len(ckpts) == 2
        assert log.current_version(T).partition_versions == versions

    def test_rollback_before_checkpoint(self, log):
        log.init(T, False, "u", "init")
        p = Partition.parse("date=d0")
        first_v = Version.generate()
        u_first = mk_update(AddPartitionVersion(p, first_v))
        log.commit(T, u_first)
        for _ in range(15):
            log.commit(T, mk_update(AddPartitionVersion(p, Version.generate())))
        # pointer behind every checkpoint → checkpoint must be ignored
        log.set_current_version(T, u_first.metadata.commit_id)
        assert log.current_version(T).partition_versions == {p: first_v}

    def test_time_travel_between_checkpoints(self, log):
        log.init(T, False, "u", "init")
        p = Partition.parse("date=d0")
        mids = []
        for i in range(22):
            v = Version.generate()
            u = mk_update(AddPartitionVersion(p, v))
            log.commit(T, u)
            mids.append((u.metadata.commit_id, v))
        cid, v = mids[11]  # seq 12: after the first checkpoint (seq 10)
        assert log.current_version(T, at_commit=cid).partition_versions == {p: v}

    def test_snapshot_checkpoint(self, log):
        log.init(T, True, "u", "init")
        last = None
        for _ in range(12):
            last = Version.generate()
            log.commit(T, mk_update(AddTableVersion(last)))
        assert log.current_version(T) == SnapshotTableVersion(last)
        # delta after checkpoint contains no AddTableVersion → state from ckpt
        log.commit(T, mk_update())
        assert log.current_version(T) == SnapshotTableVersion(last)


class TestErrors:
    def test_unknown_table(self, log):
        # reference TableVersionsSpec.scala:408-464
        with pytest.raises(UnknownTableError):
            log.current_version(T)
        with pytest.raises(UnknownTableError):
            log.commit(T, mk_update(AddTableVersion(Version.generate())))
        with pytest.raises(UnknownTableError):
            log.set_current_version(T, "some-id")
        with pytest.raises(UnknownTableError):
            log.updates(T)

    def test_unknown_commit_id(self, log):
        log.init(T, False, "u", "init")
        before = log.current_version(T)
        with pytest.raises(UnknownCommitError):
            log.set_current_version(T, "not-a-commit")
        assert log.current_version(T) == before  # state unchanged

    def test_time_travel_to_unknown_commit(self, log):
        log.init(T, False, "u", "init")
        with pytest.raises(UnknownCommitError):
            log.current_version(T, at_commit="nope")


class TestConcurrentWriters:
    def test_racing_commits_all_land(self, log):
        """The O_CREAT|O_EXCL commit-file create is the CAS: N threads racing
        commits must all land (distinct seq slots), the fold must contain
        every partition, and the pointer must end at a valid commit no
        earlier than head-1 (a same-window pointer race can trail by one)."""
        import threading

        log.init(T, is_snapshot=False, user_id="u", message="init")
        n = 8
        barrier = threading.Barrier(n)
        errors = []

        def writer(i):
            try:
                barrier.wait()
                log.commit(T, mk_update(
                    AddPartitionVersion(Partition.parse(f"date=2024-01-{i+1:02d}"),
                                        Version.generate())))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        metas = log.updates(T)
        assert len(metas) == n + 1  # n commits + init
        # every partition landed in the head state
        head_id = metas[0].commit_id
        head = log.current_version(T, at_commit=head_id)
        assert isinstance(head, PartitionedTableVersion)
        assert len(head.partition_versions) == n
        # pointer is exactly at head: update_atomic serializes the advance
        state = log.table_state(T)
        assert state.current_version == state.updates[-1].metadata.commit_id


class TestCheckpointIntegrity:
    def test_checkpoint_folds_at_labeled_commit_not_pointer(self, log):
        """A checkpoint labeled seq N must contain the fold of commits 0..N
        even when the pointer is elsewhere (writer race / rollback)."""
        log.init(T, is_snapshot=False, user_id="u", message="init")
        versions = {}
        for i in range(12):
            part = Partition.parse(f"d=k{i}")
            versions[f"d=k{i}"] = Version.generate()
            log.commit(T, mk_update(AddPartitionVersion(part, versions[f"d=k{i}"])))
        head_id = log.table_state(T).current_version
        # roll the pointer back, then force a checkpoint labeled at head
        old_id = log.commit_id_at(3)
        log.set_current_version(T, old_id)
        head_seq = log.head_seq()
        log._write_checkpoint(head_seq, head_id)
        # a fresh fold THROUGH the checkpoint at head must see all 12 partitions
        got = log.current_version(T, at_commit=head_id)
        assert len(got.partition_versions) == 12
        # and the pointer view is still the rolled-back state
        assert len(log.current_version(T).partition_versions) == 3


class TestTimestampTravel:
    def test_out_of_order_timestamps_pick_max_seq(self, log):
        """Racing writers stamp metadata timestamps before the seq CAS
        resolves, so a later seq can carry an EARLIER timestamp; timestamp
        travel must not stop scanning at the first newer timestamp."""
        log.init(T, is_snapshot=True, user_id="u", message="init")
        def upd(ts, label):
            meta = TableUpdateMetadata(commit_id=f"c-{label}", user_id="u",
                                       message=label, timestamp=ts)
            return TableUpdate(meta, (AddTableVersion(Version.generate()),))
        # seq1 carries a LATER timestamp than seq2 (race inversion)
        log.commit(T, upd("2024-01-01T10:00:05+00:00", "a"))
        log.commit(T, upd("2024-01-01T10:00:03+00:00", "b"))
        log.commit(T, upd("2024-01-01T10:00:10+00:00", "c"))
        # at 10:00:06: eligible = a (05), b (03) -> max seq is b
        assert log.commit_id_at_timestamp("2024-01-01T10:00:06+00:00") == "c-b"
        # at 10:00:04: only b (03) qualifies despite sitting after a in the log
        assert log.commit_id_at_timestamp("2024-01-01T10:00:04+00:00") == "c-b"
        assert log.commit_id_at_timestamp("2024-01-01T10:00:59+00:00") == "c-c"


class TestCheckpointResumedFolds:
    def _commit_txn(self, log, version, app=None, ver=None):
        meta = (TableUpdateMetadata.create("u", "m", txn=(app, ver))
                if app else TableUpdateMetadata.create("u", "m"))
        log.commit(T, TableUpdate(
            meta, (AddPartitionVersion(Partition.parse("d=1"), version),)))

    def test_txn_high_water_rides_checkpoints(self, log):
        log.init(T, False, "u", "init")
        for i in range(25):  # crosses two checkpoint boundaries
            self._commit_txn(log, Version.generate(), app="appA", ver=i)
        got = log.txn_high_water("appA")
        assert got is not None and got[0] == 24
        assert log.txn_high_water("ghost") is None
        # the newest checkpoint's folded txns map is present and correct
        raw, start = log._load_checkpoint_raw(log.head_seq())
        assert raw is not None and "txns" in raw
        assert int(raw["txns"]["appA"][0]) == start - 2  # ckpt at seq start-1

    def test_txn_high_water_legacy_checkpoint_falls_back(self, log):
        import json as _json
        import os as _os

        log.init(T, False, "u", "init")
        for i in range(12):
            self._commit_txn(log, Version.generate(), app="appB", ver=i)
        # simulate a checkpoint written before the txns field existed
        raw, start = log._load_checkpoint_raw(log.head_seq())
        assert raw is not None
        del raw["txns"]
        path = _os.path.join(
            log.log_dir, f"_checkpoint-{start - 1:08d}.json")
        assert log.storage.exists(path) or True
        log.storage.write_atomic(path, _json.dumps(raw))
        got = log.txn_high_water("appB")
        assert got is not None and got[0] == 11

    def test_head_fold_matches_full_replay(self, log):
        log.init(T, False, "u", "init")
        versions = [Version.generate() for _ in range(23)]
        for v in versions:
            self._commit_txn(log, v)
        head = log.head_fold(T)
        assert head.partition_versions[Partition.parse("d=1")] == versions[-1]
        # pointer rollback does not move the head fold
        early = log.table_state(T).updates[3].metadata.commit_id
        log.set_current_version(T, early)
        assert log.head_fold(T).partition_versions[
            Partition.parse("d=1")] == versions[-1]


class TestAtSeqBounds:
    def test_at_seq_past_head_raises(self, log):
        """An explicit at_seq beyond the head (a streaming checkpoint
        replayed against a truncated/recreated log) must raise, never
        silently clamp to a shorter state — a clamped fold makes
        before==after and the stream emits nothing forever."""
        log.init(T, False, "u", "init")
        log.commit(T, mk_update(AddPartitionVersion(
            Partition.parse("d=1"), Version.generate())))
        head = log.head_seq()
        assert log.current_version(T, at_seq=head)  # in range: fine
        with pytest.raises(UnknownCommitError):
            log.current_version(T, at_seq=head + 5)
        with pytest.raises(UnknownCommitError):
            log.stats_map(T, at_seq=head + 5)


class TestLogViewMemo:
    def test_composed_preconditions_share_storage_reads(self, tmp_path):
        """txn recheck + conflict fold on ONE LogView must not re-read
        the same commit files / listing twice (on S3 that doubles GETs
        per CAS attempt exactly when contention multiplies retries)."""
        from table_versions_spark.core.log import LogView
        from table_versions_spark.core.storage import LocalStorage

        class Counting(LocalStorage):
            def __init__(self):
                super().__init__()
                self.reads = 0
                self.lists = 0

            def read_text(self, path):
                self.reads += 1
                return super().read_text(path)

            def list_dir(self, path):
                self.lists += 1
                return super().list_dir(path)

        storage = Counting()
        log = FileTableVersions(str(tmp_path / "t"), storage)
        log.init(T, False, "u", "init")
        for i in range(4):
            log.commit(T, TableUpdate(
                TableUpdateMetadata.create("u", "m", txn=("app", i)),
                (AddPartitionVersion(Partition.parse(f"d={i}"),
                                     Version.generate()),)))
        view = LogView(log, log.head_seq())
        storage.reads = storage.lists = 0
        view.head_fold()
        r1, l1 = storage.reads, storage.lists
        view.txn_high_water("app")  # same range: memo hit, ~no new reads
        assert storage.reads <= r1 + 1
        # a FRESH view re-reads (no cross-attempt staleness)
        view2 = LogView(log, log.head_seq())
        storage.reads = 0
        view2.head_fold()
        assert storage.reads > 0
