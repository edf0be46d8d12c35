"""Diff tests (ported from reference ``MetastoreObjectSpec.scala:15-78``)."""

import pytest

from table_versions_spark.core.metastore import (
    AddPartition,
    RemovePartitionOp,
    UpdatePartitionVersion,
    UpdateTableVersion,
    compute_changes,
)
from table_versions_spark.core.model import (
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    Version,
)

P1 = Partition.parse("date=2019-03-01")
P2 = Partition.parse("date=2019-03-02")
V1, V2 = Version.generate(), Version.generate()


def test_snapshot_no_change():
    assert compute_changes(SnapshotTableVersion(V1), SnapshotTableVersion(V1)).operations == ()


def test_snapshot_update():
    ops = compute_changes(SnapshotTableVersion(V1), SnapshotTableVersion(V2)).operations
    assert ops == (UpdateTableVersion(V2),)


def test_partition_add_update_remove():
    cur = PartitionedTableVersion({P1: V1, P2: V1})
    tgt = PartitionedTableVersion({P1: V2, Partition.parse("date=2019-03-03"): V2})
    ops = set(compute_changes(cur, tgt).operations)
    assert ops == {
        UpdatePartitionVersion(P1, V2),
        AddPartition(Partition.parse("date=2019-03-03"), V2),
        RemovePartitionOp(P2),
    }


def test_identical_partitioned_no_ops():
    cur = PartitionedTableVersion({P1: V1})
    assert compute_changes(cur, cur).operations == ()


def test_shape_mismatch_errors():
    with pytest.raises(ValueError):
        compute_changes(SnapshotTableVersion(V1), PartitionedTableVersion({}))
    with pytest.raises(ValueError):
        compute_changes(PartitionedTableVersion({}), SnapshotTableVersion(V1))
