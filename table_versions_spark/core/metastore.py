"""Current-view diff: desired vs actual table state.

Port of the pure diff in reference
``core/src/main/scala/com/gu/tableversions/core/Metastore.scala:41-84``:
given the *current* and *target* ``TableVersion``, compute the minimal set of
operations to move the current view to the target. In the reference these
became ``ALTER TABLE`` statements against Hive/Glue; here they update our own
current-view manifest (no external metastore), but the op algebra and error
semantics are identical (tests: reference ``MetastoreObjectSpec.scala:15-78``).

The reference's ``List.diff``/``intersect`` implementation is quadratic in
partition count (``Metastore.scala:62-79``); this dict-based diff is linear —
one of the known hot spots `BASELINE.md` says not to replicate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from .model import (
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableVersion,
    Version,
)


@dataclass(frozen=True)
class AddPartition:
    partition: Partition
    version: Version


@dataclass(frozen=True)
class UpdatePartitionVersion:
    partition: Partition
    version: Version


@dataclass(frozen=True)
class RemovePartitionOp:
    partition: Partition


@dataclass(frozen=True)
class UpdateTableVersion:
    version: Version


MetastoreOperation = Union[AddPartition, UpdatePartitionVersion,
                           RemovePartitionOp, UpdateTableVersion]


@dataclass(frozen=True)
class TableChanges:
    operations: tuple[MetastoreOperation, ...]


def compute_changes(current: TableVersion, target: TableVersion) -> TableChanges:
    """Structural diff (reference ``Metastore.scala:56-84``).

    Snapshot→partitioned (or vice versa) mismatch is an error, as in the
    reference (``Metastore.scala:81-83``).
    """
    if isinstance(current, SnapshotTableVersion) and isinstance(target, SnapshotTableVersion):
        if current.version == target.version:
            return TableChanges(())
        return TableChanges((UpdateTableVersion(target.version),))

    if isinstance(current, PartitionedTableVersion) and isinstance(target, PartitionedTableVersion):
        cur, tgt = current.partition_versions, target.partition_versions
        ops: list[MetastoreOperation] = []
        for p, v in tgt.items():
            if p not in cur:
                ops.append(AddPartition(p, v))
            elif cur[p] != v:
                ops.append(UpdatePartitionVersion(p, v))
        for p in cur:
            if p not in tgt:
                ops.append(RemovePartitionOp(p))
        return TableChanges(tuple(ops))

    raise ValueError(
        "Cannot change table shape between snapshot and partitioned "
        f"(current={type(current).__name__}, target={type(target).__name__})")
