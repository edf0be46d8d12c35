"""Incremental rollup maintenance: a versioned aggregate table kept in sync
with a versioned source by re-aggregating ONLY partitions whose version
changed — the materialized-view consumer of the engine's change-data-feed.

The reference has no derived-table story (its pipelines re-run whole loads;
see SURVEY §2.E); this is the standard production pattern its versioning
model enables: because an insert replaces whole partitions with fresh
version directories, the commit-log diff (``compute_changes``) names exactly
the partitions whose aggregates are stale. At 100 TB a daily refresh then
touches one day's partitions, not the table.

Contract:

- ``group_cols`` must contain every source partition column. A group's rows
  then never span an unchanged partition, so replacing the changed
  partitions' aggregate rows wholesale (insert-overwrite) is *exact* — not
  an approximation.
- The refresh cursor (last source commit folded into the target) is stored
  next to the target's commit log (``_rollup.json``) through the engine's
  storage backend, so it survives restarts and works on object stores.
- ``refresh()`` is idempotent: no source changes ⇒ no target commit.
- Removed source partitions delete their group rows from the target in the
  same refresh.

Example::

    rollup = IncrementalRollup(
        engine, source="db.events", target="db.daily",
        group_cols=["event_date", "event_type"],
        agg=lambda df: df.groupBy("event_date", "event_type")
                         .agg(F.sum("value").alias("total")))
    rollup.refresh(user_id="nightly")   # full build on first run
    ...source gets one new day...
    rollup.refresh(user_id="nightly")   # re-aggregates only that day
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from .core.metastore import (
    AddPartition,
    RemovePartitionOp,
    UpdatePartitionVersion,
    compute_changes,
)
from .core.model import (
    HIVE_DEFAULT_PARTITION,
    Partition,
    TableName,
    unescape_partition_value,
)

CURSOR_FILE = "_rollup.json"


class IncrementalRollup:
    """Maintains ``target`` = ``agg(read(source))`` incrementally."""

    def __init__(self, engine, source: TableName | str, target: TableName | str,
                 group_cols: list[str],
                 agg: Callable[[DataFrame], DataFrame]):
        self.engine = engine
        self.source = source if isinstance(source, str) else source.fully_qualified_name
        self.target = target if isinstance(target, str) else target.fully_qualified_name
        self.group_cols = list(group_cols)
        self.agg = agg
        src_defn = engine.definition(self.source)
        self.src_pcols = list(src_defn.partition_schema.columns)
        missing = [c for c in self.src_pcols if c not in self.group_cols]
        if missing:
            raise ValueError(
                "group_cols must contain every source partition column "
                f"(missing {missing}) — otherwise a group can span an "
                "unchanged partition and partial re-aggregation would be "
                "wrong")

    # -- cursor ------------------------------------------------------------

    def _cursor_path(self) -> str:
        return os.path.join(self.engine.definition(self.target).location,
                            CURSOR_FILE)

    def _read_cursor(self) -> str | None:
        # ONLY a genuinely-absent target/cursor means "never refreshed";
        # a transient storage error or corrupted cursor must raise, not
        # silently trigger a full 100 TB rebuild
        from .core.log import UnknownTableError

        try:
            return json.loads(
                self.engine.storage.read_text(self._cursor_path()))["source_commit"]
        except (FileNotFoundError, UnknownTableError):
            return None

    def _write_cursor(self, commit_id: str) -> None:
        self.engine.storage.write_atomic(
            self._cursor_path(), json.dumps({"source_commit": commit_id}))

    # -- refresh -----------------------------------------------------------

    def refresh(self, user_id: str = "rollup"):
        """Fold source changes since the last refresh into the target.
        Returns the target ``CommitResult``, or None if already current."""
        src_defn, src_log = self.engine._log(self.source)
        head = src_log.current_commit_id(src_defn.name)
        cursor = self._read_cursor()
        if cursor == head:
            return None

        if cursor is None or not self.src_pcols:
            # first build — or an unpartitioned source, where any change
            # invalidates every group: full re-aggregation either way
            result = self._full_build(user_id)
        else:
            result = self._incremental(cursor, head, user_id)
        self._write_cursor(head)
        return result

    def _full_build(self, user_id: str):
        out = self.agg(self.engine.read(self.source))
        self._check_schema(out)
        self._ensure_target(out)
        # a rebuild must converge the target to exactly the fresh
        # aggregation: insert-overwrite alone only replaces partitions
        # present in `out`, so a target partition whose source rows
        # vanished (e.g. a crash between a prior full build and its
        # cursor write, then a source partition removal) would keep its
        # stale aggregates forever — drop every existing target partition
        # in the same commit; the write re-adds the live ones
        # conflict baseline BEFORE deriving the drop list, and head_fold
        # rather than the pointer state: the RemovePartition ops land on
        # top of the full-log fold, so the drop list must cover head-only
        # partitions (a rollback may have moved the pointer back), and a
        # concurrent write into a dropped partition must fail the commit
        # precondition instead of being silently erased by the rebuild
        tgt_defn, tgt_log = self.engine._log(self.target)
        base_fold = tgt_log.head_fold(tgt_defn.name)
        drop = ([] if tgt_defn.is_snapshot else
                list(getattr(base_fold, "partition_versions", {})))
        return self.engine._insert(out, self.target, user_id,
                                   "rollup: full build",
                                   drop_partitions=drop,
                                   conflict_fold=base_fold)

    def _incremental(self, cursor: str, head: str, user_id: str):
        src_defn, src_log = self.engine._log(self.source)
        before = src_log.current_version(src_defn.name, at_commit=cursor)
        after = src_log.current_version(src_defn.name, at_commit=head)
        changes = compute_changes(before, after).operations
        changed = [op.partition for op in changes
                   if isinstance(op, (AddPartition, UpdatePartitionVersion))]
        removed = [op.partition for op in changes
                   if isinstance(op, RemovePartitionOp)]
        result = None
        if removed:
            result = self.engine.delete(
                self.target, _partitions_predicate(removed), user_id,
                f"rollup: drop {len(removed)} removed partition(s)")
        if changed:
            # per-column value-set filter — a superset of the changed
            # partitions under multi-level partitioning. Over-selection only
            # re-aggregates groups to their current values (upsert replaces
            # equals with equals): exact result, work bounded by the changed
            # partitions' columns.
            pfilter: dict[str, list] = {}
            for p in changed:
                for cv in p.column_values:
                    raw = (None if cv.value == HIVE_DEFAULT_PARTITION
                           else unescape_partition_value(cv.value))
                    pfilter.setdefault(cv.column, [])
                    if raw not in pfilter[cv.column]:
                        pfilter[cv.column].append(raw)
            slice_df = self.engine.read(self.source, partition_filter=pfilter)
            out = self.agg(slice_df)
            self._check_schema(out)
            # insert-overwrite, not upsert: a reprocessed source partition
            # may have LOST groups, and overwrite replaces the target
            # partition's aggregate rows wholesale (group_cols ⊇ partition
            # cols guarantees the fresh agg carries every current group of
            # the changed partitions)
            # drop_partitions: a changed source partition whose live rows
            # dropped to ZERO (dv-mode delete-all keeps the partition with
            # no rows — UpdatePartitionVersion, not RemovePartition) emits
            # no agg groups, so plain overwrite would leave its stale
            # aggregate rows in the target forever; dropping changed
            # partitions the fresh agg doesn't re-add keeps target exact
            result = self.engine._insert(
                out, self.target, user_id,
                f"rollup: refresh {len(changed)} partition(s)",
                drop_partitions=changed)
        return result

    def _check_schema(self, out: DataFrame) -> None:
        missing = [c for c in self.group_cols if c not in out.columns]
        if missing:
            raise ValueError(f"agg output must carry group_cols; missing {missing}")

    def _ensure_target(self, out: DataFrame) -> None:
        try:
            self.engine.definition(self.target)
        except Exception:  # noqa: BLE001 — absent: create from agg schema
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in out.schema.fields)
            self.engine.create_table(self.target, schema_ddl=ddl,
                                     partition_columns=self.src_pcols)


def _partitions_predicate(partitions: list[Partition]) -> str:
    """OR-of-conjunctions SQL predicate selecting exactly these partitions
    (raw values; NULL partition values become IS NULL)."""
    disjuncts = []
    for p in partitions:
        conj = []
        for cv in p.column_values:
            if cv.value == HIVE_DEFAULT_PARTITION:
                conj.append(f"{cv.column} IS NULL")
            else:
                raw = (unescape_partition_value(cv.value)
                       .replace("\\", "\\\\").replace("'", "\\'"))
                conj.append(f"{cv.column} = '{raw}'")
        disjuncts.append("(" + " AND ".join(conj) + ")")
    return " OR ".join(disjuncts)
