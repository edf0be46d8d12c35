"""Storage-backed commit log: the persistent ``TableVersions`` implementation.

The reference only ships a driver-local in-memory store
(``core/src/main/scala/com/gu/tableversions/core/InMemoryTableVersions.scala:10-12``
— "Does not persist state"). We close that gap with a Delta-Lake-shaped
transaction log on the table's storage:

    <table-location>/
      _meta.json                     # TableDefinition
      _version_log/00000000.json ... # TableUpdate records, ordered
      _version_log/_current          # commit-id pointer (rollback ≠ head)

Semantics preserved from the reference interface
(``core/.../TableVersions.scala:20-55``) and its in-memory impl
(``core/.../InMemoryTableVersions.scala:16-58``):

- ``init`` is idempotent (second init is a no-op).
- ``commit`` appends an update and moves the pointer to it; unknown table ⇒ error.
- ``set_current_version`` moves the pointer to an *existing* commit; unknown
  commit id ⇒ error, state unchanged.
- ``current_version`` folds operations of all commits **up to and including**
  the pointer (reference ``TableVersions.scala:29-41``).
- ``updates`` lists commit metadata most-recent-first
  (``TableVersions.scala:44-45``).

Atomicity: each commit file is claimed with the storage backend's
``create_exclusive`` on the next sequence number — ``O_CREAT|O_EXCL`` on
POSIX, a conditional put (``If-None-Match: *``) on object stores — a
storage-level compare-and-set replacing the reference's driver-local ``Ref``
CAS (``core/.../util/RichRef.scala:17-24``). The current-version pointer
advances through ``update_atomic`` (flock locally, ETag ``If-Match`` CAS on
object stores) with a monotonicity guard, so racing writers can never leave
the pointer behind a commit that already folded over theirs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from .model import (
    UNVERSIONED,
    InitTable,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
    TableName,
    TableUpdate,
    TableUpdateMetadata,
    TableVersion,
    apply_partition_updates,
    latest_snapshot_table_version,
    update_from_json,
    update_to_json,
)
from .storage import DEFAULT_STORAGE, Storage

LOG_DIR = "_version_log"
CURRENT_POINTER = "_current"
COMMIT_WIDTH = 8  # 00000000.json
CHECKPOINT_PREFIX = "_checkpoint-"
CHECKPOINT_INTERVAL = 10  # write a folded-state checkpoint every N commits


class UnknownTableError(KeyError):
    pass


class UnknownCommitError(KeyError):
    pass


class ConcurrentWriteError(RuntimeError):
    """A commit precondition failed: another writer changed state this
    commit depends on between the caller's read and its commit attempt."""


class TxnAlreadyCommitted(Exception):
    """Commit-time idempotence signal: the (app, version) txn token this
    commit carries is already in the log — a racing duplicate (zombie
    driver + retry) landed between the writer's probe and its commit.
    Carries the prior commit's id; writers catch it and skip."""

    def __init__(self, commit_id: str):
        super().__init__(commit_id)
        self.commit_id = commit_id


class ConstraintViolationError(ValueError):
    """An insert carried rows failing a declared CHECK constraint; the
    write was rejected before any data landed."""


@dataclass(frozen=True)
class TableState:
    """Full history + pointer (reference ``TableVersions.scala:121-130``)."""

    current_version: str  # commit id
    updates: tuple[TableUpdate, ...]


class FileTableVersions:
    """Commit-log store for one table rooted at ``location``.

    ``storage`` selects the backend (default: local POSIX). All metadata
    reads/writes and CAS operations go through it, so the same log runs on
    an object store unchanged.
    """

    def __init__(self, location: str, storage: Storage | None = None):
        self.location = location.rstrip("/")
        self.log_dir = os.path.join(self.location, LOG_DIR)
        self.storage = storage if storage is not None else DEFAULT_STORAGE

    # -- existence ---------------------------------------------------------

    def exists(self) -> bool:
        return bool(self._commit_files())

    def _require_exists(self, table: TableName | None = None) -> None:
        if not self.exists():
            name = table.fully_qualified_name if table else self.location
            raise UnknownTableError(f"Unknown table: {name}")

    # -- init --------------------------------------------------------------

    def init(self, table: TableName, is_snapshot: bool, user_id: str,
             message: str) -> None:
        """Idempotent init (reference ``InMemoryTableVersions.scala:52-58``)."""
        if self.exists():
            return
        self.storage.makedirs(self.log_dir)
        meta = TableUpdateMetadata.create(user_id, message)
        update = TableUpdate(meta, (InitTable(table, is_snapshot),))
        seq_path = os.path.join(self.log_dir, f"{0:0{COMMIT_WIDTH}d}.json")
        payload = json.dumps(update_to_json(update), indent=1)
        if not self.storage.create_exclusive(seq_path, payload):
            return  # concurrent init won the race — idempotent
        self._advance_pointer(meta.commit_id, 0)

    # -- commit ------------------------------------------------------------

    def commit(self, table: TableName, update: TableUpdate,
               precondition=None) -> None:
        """Append update, move pointer to it
        (reference ``InMemoryTableVersions.scala:16-28``).

        ``precondition`` (optional): callable ``LogView -> None`` that
        raises (typically ``ConcurrentWriteError``) to abort the commit.
        It is re-evaluated against a fresh ``LogView`` before every CAS
        attempt, whose prefix [0, seq-1] is exactly the claimed slot's
        predecessors (commit files are immutable and slot claims are
        dense: slot N can only be claimed after 0..N-1 exist) — so when
        the exclusive create succeeds, the log the precondition validated
        is provably the complete prefix of this commit. The view's folds
        resume from checkpoints, keeping the precondition O(commits since
        checkpoint) instead of a full log replay per attempt. This is
        optimistic-concurrency-control at the commit file, the same
        serialization point Delta uses on its JSON log."""
        self._require_exists(table)
        payload = json.dumps(update_to_json(update), indent=1)
        seq = len(self._commit_files())
        while True:
            if precondition is not None:
                seq = len(self._commit_files())
                precondition(LogView(self, seq - 1))
            seq_path = os.path.join(self.log_dir, f"{seq:0{COMMIT_WIDTH}d}.json")
            if self.storage.create_exclusive(seq_path, payload):
                break
            seq += 1  # another writer landed first: CAS retry on next slot
        self._advance_pointer(update.metadata.commit_id, seq)
        if seq > 0 and seq % CHECKPOINT_INTERVAL == 0:
            self._write_checkpoint(seq, update.metadata.commit_id)

    # -- pointer -----------------------------------------------------------

    def set_current_version(self, table: TableName, commit_id: str) -> None:
        """Rollback/forward; unknown commit ⇒ error, no state change
        (reference ``InMemoryTableVersions.scala:30-44``)."""
        self._require_exists(table)
        seq = self._find_seq(commit_id)
        if seq is None:
            raise UnknownCommitError(f"Unknown commit id: {commit_id}")
        self._write_pointer(commit_id, seq)

    def _pointer_path(self) -> str:
        return os.path.join(self.log_dir, CURRENT_POINTER)

    def _write_pointer(self, commit_id: str, seq: int | None = None) -> None:
        """Unconditional pointer write — checkout only (bypasses the
        monotonicity guard by design: rollback moves the pointer backwards)."""
        payload = commit_id if seq is None else f"{commit_id}\n{seq}"
        self.storage.write_atomic(self._pointer_path(), payload)

    def _advance_pointer(self, commit_id: str, seq: int) -> None:
        """Move the pointer to (commit_id, seq) unless a racing writer has
        already advanced it past ``seq``. The read-check-write runs inside
        the storage backend's serialized ``update_atomic`` (flock / ETag
        CAS), so the pointer can never regress nor trail the head."""

        def advance(current: str | None) -> str | None:
            if current is not None:
                lines = current.strip().splitlines()
                cur_seq = int(lines[1]) if len(lines) > 1 else None
                if cur_seq is not None and cur_seq > seq:
                    return None  # later commit already owns the pointer
            return f"{commit_id}\n{seq}"

        self.storage.update_atomic(self._pointer_path(), advance)

    def _read_pointer(self) -> tuple[str, int | None]:
        lines = self.storage.read_text(self._pointer_path()).strip().splitlines()
        commit_id = lines[0]
        seq = int(lines[1]) if len(lines) > 1 else None
        return commit_id, seq

    def _find_seq(self, commit_id: str) -> int | None:
        # newest-first: the ids looked up in practice (checkpoint writes,
        # txn replays, CDF spans, rollbacks) are near the head, so the
        # common case reads O(recent) files instead of the whole log
        files = self._commit_files()
        for i in range(len(files) - 1, -1, -1):
            data = json.loads(
                self.storage.read_text(os.path.join(self.log_dir, files[i])))
            if data["commit_id"] == commit_id:
                return i
        return None

    # -- queries -----------------------------------------------------------

    def current_commit_id(self, table: TableName | None = None) -> str:
        """Commit id the pointer currently names — one pointer read, no
        log replay (use instead of ``table_state().current_version`` when
        only the id is needed)."""
        self._require_exists(table)
        return self._read_pointer()[0]

    def table_state(self, table: TableName | None = None) -> TableState:
        self._require_exists(table)
        return TableState(self._read_pointer()[0], tuple(self._read_all_updates()))

    def updates(self, table: TableName | None = None) -> list[TableUpdateMetadata]:
        """History, most recent first (reference ``TableVersions.scala:44-45``)."""
        self._require_exists(table)
        return [u.metadata for u in reversed(self._read_all_updates())]

    def current_version(self, table: TableName | None = None,
                        at_commit: str | None = None,
                        at_seq: int | None = None) -> TableVersion:
        """Fold ops up to (and incl.) the pointer — or an explicit commit for
        time-travel reads (reference ``TableVersions.scala:29-41``).

        Unlike the reference (full log replay per call, flagged in SURVEY
        §4.2), the fold resumes from the newest checkpoint at-or-before the
        target commit, so the cost is O(commits since last checkpoint)."""
        self._require_exists(table)
        if at_commit is not None or at_seq is not None:
            # at_seq: callers that already KNOW the commit's seq (the
            # checkpoint writer, span iterators, the streaming source whose
            # offsets ARE seqs) skip the id lookup entirely
            seq = at_seq if at_seq is not None else self._find_seq(at_commit)
            if seq is None:
                raise UnknownCommitError(f"Unknown commit id: {at_commit}")
        else:
            pointer, seq = self._read_pointer()
            if seq is None:  # legacy pointer without seq
                seq = self._find_seq(pointer)
                if seq is None:
                    raise UnknownCommitError(f"Unknown commit id: {pointer}")

        base, start_seq = self._load_checkpoint(seq)
        if seq >= len(self._commit_files()):
            # an explicit at_seq past the head (e.g. a streaming checkpoint
            # replayed against a truncated/recreated log) must fail loudly —
            # the slice below would silently clamp to a shorter state
            raise UnknownCommitError(f"No commit at seq {seq}")
        # via _read_updates_range so a LogView's memo serves composed
        # preconditions (head fold + txn map) with ONE read of the range
        ops = [op for u in self._read_updates_range(start_seq, seq)
               for op in u.operations]

        if base is not None:
            is_snapshot, state = base
        else:
            is_snapshot = any(isinstance(op, InitTable) and op.is_snapshot
                              for op in ops)
            state = (SnapshotTableVersion(UNVERSIONED) if is_snapshot
                     else PartitionedTableVersion({}))
        if is_snapshot:
            folded = latest_snapshot_table_version(ops)
            if folded.version == UNVERSIONED and isinstance(state, SnapshotTableVersion):
                return state  # no snapshot update in the delta: keep checkpoint state
            return folded
        return apply_partition_updates(state, ops)

    def stats_map(self, table: TableName | None = None,
                  at_commit: str | None = None,
                  at_seq: int | None = None) -> dict[str, dict]:
        """Folded version-dir statistics at the pointer (or a commit):
        ``{rel_dir: {"rows": n, "columns": {col: {"min","max"}}}}``.

        Stats ride the commit records (Delta-style), so building this map
        costs zero I/O beyond the log files the fold already reads — never
        one sidecar read per directory (the round-1 shape, O(#partitions)
        plan-time reads). Resumes from the newest checkpoint like
        ``current_version``. Dirs committed without stats are simply absent
        — absence means 'cannot skip', never 'skip'."""
        self._require_exists(table)
        if at_commit is not None or at_seq is not None:
            seq = at_seq if at_seq is not None else self._find_seq(at_commit)
            if seq is None:
                raise UnknownCommitError(f"Unknown commit id: {at_commit}")
        else:
            pointer, seq = self._read_pointer()
            if seq is None:
                seq = self._find_seq(pointer)
                if seq is None:
                    raise UnknownCommitError(f"Unknown commit id: {pointer}")
        raw, start_seq = self._load_checkpoint_raw(seq)
        stats: dict[str, dict] = dict(raw.get("stats") or {}) if raw else {}
        fnames = self._commit_files()
        if seq >= len(fnames):
            raise UnknownCommitError(f"No commit at seq {seq}")
        for fname in fnames[start_seq:seq + 1]:
            d = json.loads(
                self.storage.read_text(os.path.join(self.log_dir, fname)))
            stats.update(d.get("stats") or {})
        return stats

    # -- checkpoints -------------------------------------------------------

    def _write_checkpoint(self, seq: int, commit_id: str) -> None:
        # fold at the commit being checkpointed — NOT at the pointer: under a
        # writer race the pointer may already be past seq, and a checkpoint
        # whose state includes ops beyond its labeled seq would corrupt every
        # later time-travel read that resumes from it
        state = self.current_version(at_commit=commit_id, at_seq=seq)
        if isinstance(state, SnapshotTableVersion):
            payload = {"seq": seq, "commit_id": commit_id, "is_snapshot": True,
                       "snapshot_version": state.version.label}
        else:
            payload = {"seq": seq, "commit_id": commit_id, "is_snapshot": False,
                       "partitions": {p.render(): v.label
                                      for p, v in state.partition_versions.items()}}
        # folded stats ride the checkpoint too, so stats_map never replays
        # commits older than the newest checkpoint
        payload["stats"] = self.stats_map(at_commit=commit_id, at_seq=seq)
        # folded txn high-waters likewise: exactly-once probes and
        # streaming-epoch commits stay O(since-checkpoint)
        payload["txns"] = {a: [v, c]
                           for a, (v, c) in self._txn_map_at(seq).items()}
        path = os.path.join(self.log_dir,
                            f"{CHECKPOINT_PREFIX}{seq:0{COMMIT_WIDTH}d}.json")
        self.storage.write_atomic(path, json.dumps(payload, indent=1))

    def _load_checkpoint_raw(self, max_seq: int):
        """Raw dict of the newest checkpoint with seq <= max_seq plus the
        first unapplied seq, or (None, 0)."""
        memo = getattr(self, "_memo", None)
        if memo is not None and ("ckpt", max_seq) in memo:
            return memo[("ckpt", max_seq)]
        out = self._load_checkpoint_raw_uncached(max_seq)
        if memo is not None:
            memo[("ckpt", max_seq)] = out
        return out

    def _load_checkpoint_raw_uncached(self, max_seq: int):
        best = None
        for fname in self.storage.list_dir(self.log_dir):
            if fname.startswith(CHECKPOINT_PREFIX) and fname.endswith(".json"):
                seq = int(fname[len(CHECKPOINT_PREFIX):-len(".json")])
                if seq <= max_seq and (best is None or seq > best):
                    best = seq
        if best is None:
            return None, 0
        path = os.path.join(self.log_dir,
                            f"{CHECKPOINT_PREFIX}{best:0{COMMIT_WIDTH}d}.json")
        return json.loads(self.storage.read_text(path)), best + 1

    def _load_checkpoint(self, max_seq: int):
        """Newest checkpoint with seq <= max_seq → ((is_snapshot, state),
        first_unapplied_seq), or (None, 0)."""
        from .model import Partition, Version

        d, start = self._load_checkpoint_raw(max_seq)
        if d is None:
            return None, 0
        if d["is_snapshot"]:
            state = SnapshotTableVersion(Version.parse(d["snapshot_version"])
                                         if d["snapshot_version"]
                                         != UNVERSIONED.label else UNVERSIONED)
        else:
            state = PartitionedTableVersion(
                {Partition.parse(p): Version.parse(v)
                 for p, v in d["partitions"].items()})
        return (d["is_snapshot"], state), start

    def commit_id_at(self, seq: int) -> str:
        """Commit id of the log entry at sequence number ``seq`` (0 = init).
        Used by the streaming source, whose offsets are commit seqs."""
        fname = f"{seq:0{COMMIT_WIDTH}d}.json"
        path = os.path.join(self.log_dir, fname)
        try:
            return json.loads(self.storage.read_text(path))["commit_id"]
        except FileNotFoundError:
            raise UnknownCommitError(f"No commit at seq {seq}") from None

    def head_seq(self) -> int:
        """Highest committed sequence number (−1 if the log is empty)."""
        return len(self._commit_files()) - 1

    def commit_id_at_timestamp(self, ts) -> str:
        """Latest commit whose metadata timestamp is <= ``ts`` (datetime or
        ISO-8601 string) — Delta's ``timestampAsOf`` semantics. Errors if
        ``ts`` predates the first commit."""
        from datetime import datetime, timezone

        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        # No early break: racing writers stamp metadata timestamps BEFORE the
        # seq CAS resolves, so a later seq can carry an earlier timestamp.
        # Scan the whole log and take the max-seq commit with ts <= target.
        best = None
        for u in self._read_all_updates():
            when = datetime.fromisoformat(u.metadata.timestamp)
            if when <= ts:
                best = u.metadata.commit_id
        if best is None:
            raise UnknownCommitError(
                f"No commit at or before {ts.isoformat()}")
        return best

    # -- internals ---------------------------------------------------------

    def _commit_files(self) -> list[str]:
        memo = getattr(self, "_memo", None)
        if memo is not None and "files" in memo:
            return memo["files"]
        out = sorted(f for f in self.storage.list_dir(self.log_dir)
                     if f.endswith(".json") and f[:-len(".json")].isdigit())
        if memo is not None:
            memo["files"] = out
        return out

    def _read_all_updates(self) -> list[TableUpdate]:
        return self._read_updates_range(0, len(self._commit_files()) - 1)

    def _read_updates_range(self, start_seq: int,
                            end_seq: int) -> list[TableUpdate]:
        """Updates at seqs [start_seq, end_seq], inclusive."""
        memo = getattr(self, "_memo", None)
        if memo is not None and ("updates", start_seq, end_seq) in memo:
            return memo[("updates", start_seq, end_seq)]
        out = []
        for fname in self._commit_files()[start_seq:end_seq + 1]:
            data = json.loads(
                self.storage.read_text(os.path.join(self.log_dir, fname)))
            out.append(update_from_json(data))
        if memo is not None:
            memo[("updates", start_seq, end_seq)] = out
        return out

    # -- checkpoint-resumed folds (scale path) ------------------------------

    def head_fold(self, table: TableName | None = None) -> TableVersion:
        """Fold of ALL commits (the head, pointer-independent), resuming
        from the newest checkpoint — O(commits since checkpoint), never a
        full log replay. This is the conflict-detection baseline: commit
        preconditions compare against THIS, not the pointer state (which
        a rollback may have moved)."""
        self._require_exists(table)
        return self.current_version(table, at_seq=self.head_seq())

    def _txn_map_at(self, seq: int) -> dict[str, tuple[int, str]]:
        """app → (highest txn_version, its commit_id) folded over commits
        0..seq, resuming from the newest checkpoint's ``txns`` map (a
        legacy checkpoint without one forces a full scan — correct,
        just slower, until the next checkpoint is written)."""
        raw, start = self._load_checkpoint_raw(seq)
        txns: dict[str, tuple[int, str]] = {}
        if raw is not None:
            if "txns" in raw:
                txns = {a: (int(v), c)
                        for a, (v, c) in (raw["txns"] or {}).items()}
            else:
                start = 0
        for u in self._read_updates_range(start, seq):
            app, ver = u.metadata.txn_app, u.metadata.txn_version
            if app and ver is not None:
                cur = txns.get(app)
                if cur is None or ver > cur[0]:
                    txns[app] = (ver, u.metadata.commit_id)
        return txns

    def txn_high_water(self, app: str) -> "tuple[int, str] | None":
        """Highest committed (txn_version, commit_id) for ``app``, or None
        — the exactly-once idempotence probe, checkpoint-resumed so a
        long-lived streaming writer's per-epoch cost stays O(recent), not
        O(epochs so far)."""
        return self._txn_map_at(self.head_seq()).get(app)


class LogView:
    """Read view of the log's immutable prefix [0, seq], handed to commit
    preconditions. Folds resume from checkpoints, so a precondition costs
    O(commits since checkpoint) — not a full log replay per CAS attempt.
    ``updates`` materializes the raw prefix for preconditions that need to
    scan operations (rare; O(seq)).

    Storage reads (commit-file listing, checkpoint, commit range) are
    memoized PER VIEW: composed preconditions (txn recheck + conflict
    fold) both resume from the same checkpoint over the same commit
    range, and without sharing, each CAS attempt would issue every GET
    twice — on S3 that doubles request count exactly when contention
    multiplies retries. A fresh view per attempt keeps the memo safely
    scoped to one immutable prefix."""

    def __init__(self, log: "FileTableVersions", seq: int):
        self._log = log
        self.seq = seq
        self._memo: dict = {}

    def _shared(self):
        from contextlib import contextmanager

        @contextmanager
        def install():
            prev = getattr(self._log, "_memo", None)
            self._log._memo = self._memo
            try:
                yield
            finally:
                self._log._memo = prev

        return install()

    def head_fold(self) -> TableVersion:
        with self._shared():
            return self._log.current_version(at_seq=self.seq)

    def txn_high_water(self, app: str) -> "tuple[int, str] | None":
        with self._shared():
            return self._log._txn_map_at(self.seq).get(app)

    @property
    def updates(self) -> tuple:
        with self._shared():
            return tuple(self._log._read_updates_range(0, self.seq))


# ---------------------------------------------------------------------------
# Table metadata (_meta.json)
# ---------------------------------------------------------------------------

META_FILE = "_meta.json"


def write_table_meta(defn: TableDefinition,
                     storage: Storage | None = None) -> None:
    storage = storage if storage is not None else DEFAULT_STORAGE
    storage.makedirs(defn.location)
    payload = json.dumps({
        "schema": defn.name.schema,
        "name": defn.name.name,
        "location": defn.location,
        "partition_columns": list(defn.partition_schema.columns),
        "format": defn.format,
        "schema_ddl": defn.schema_ddl,
        "merge_schema": defn.merge_schema,
        "bucket_columns": list(defn.bucket_columns),
        "bucket_count": defn.bucket_count,
        "bloom_columns": list(defn.bloom_columns),
        "check_constraints": list(defn.check_constraints),
        "column_mapping": [list(p) for p in defn.column_mapping],
        "dropped_columns": list(defn.dropped_columns),
        "partition_derivations": [list(p) for p in defn.partition_derivations],
        "change_data_feed": defn.change_data_feed,
    }, indent=1)
    storage.write_atomic(os.path.join(defn.location, META_FILE), payload)


def read_table_meta(location: str,
                    storage: Storage | None = None) -> TableDefinition:
    from .model import PartitionSchema

    storage = storage if storage is not None else DEFAULT_STORAGE
    path = os.path.join(location, META_FILE)
    try:
        d = json.loads(storage.read_text(path))
    except FileNotFoundError:
        raise UnknownTableError(f"No table metadata at {location}") from None
    return TableDefinition(
        name=TableName(d["schema"], d["name"]),
        location=d["location"],
        partition_schema=PartitionSchema(tuple(d["partition_columns"])),
        format=d["format"],
        schema_ddl=d.get("schema_ddl"),
        merge_schema=d.get("merge_schema", False),
        bucket_columns=tuple(d.get("bucket_columns", ())),
        bucket_count=d.get("bucket_count", 0),
        bloom_columns=tuple(d.get("bloom_columns", ())),
        check_constraints=tuple(d.get("check_constraints", ())),
        column_mapping=tuple((a, b) for a, b in d.get("column_mapping", ())),
        dropped_columns=tuple(d.get("dropped_columns", ())),
        partition_derivations=tuple(
            (c, e) for c, e in d.get("partition_derivations", ())),
        change_data_feed=d.get("change_data_feed", False),
    )
