"""Property-based laws over the pure core (hypothesis; ports the reference's
ScalaCheck layer, SURVEY §5.3, and extends it to the fold/diff algebra).

- Fold law: replaying any sequence of partition ops through the persisted log
  yields exactly the dict-fold semantics of reference
  ``TableVersions.applyPartitionUpdates`` (``TableVersions.scala:135-149``).
- Diff law: ``compute_changes(current, target)`` applied to ``current``
  reconstructs ``target`` (reference ``Metastore.scala:56-84``) — the property
  the metastore-sync layer relies on.
- Checkpoint transparency: folded state is identical whether or not replay
  crosses checkpoint boundaries (log.py writes checkpoints every 10 commits).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from table_versions_spark.core.log import FileTableVersions
from table_versions_spark.core.metastore import (
    AddPartition,
    RemovePartitionOp,
    UpdatePartitionVersion,
    compute_changes,
)
from table_versions_spark.core.model import (
    AddPartitionVersion,
    Partition,
    PartitionedTableVersion,
    RemovePartition,
    TableName,
    TableUpdate,
    TableUpdateMetadata,
    Version,
)

T = TableName("db", "prop")

# small partition-key space so add/update/remove sequences actually interact
PARTITIONS = [Partition.parse(f"d=k{i}") for i in range(5)]

op_strategy = st.one_of(
    st.tuples(st.just("add"), st.sampled_from(range(len(PARTITIONS)))),
    st.tuples(st.just("remove"), st.sampled_from(range(len(PARTITIONS)))),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(op_strategy, min_size=1, max_size=30))
def test_fold_matches_dict_simulation(tmp_path_factory, ops):
    log = FileTableVersions(str(tmp_path_factory.mktemp("prop") / "t"))
    log.init(T, is_snapshot=False, user_id="u", message="init")
    expected: dict[Partition, Version] = {}
    for kind, idx in ops:
        part = PARTITIONS[idx]
        if kind == "add":
            v = Version.generate()
            expected[part] = v
            op = AddPartitionVersion(part, v)
        else:
            expected.pop(part, None)
            op = RemovePartition(part)
        log.commit(T, TableUpdate(TableUpdateMetadata.create("u", kind), (op,)))
    state = log.current_version(T)
    assert isinstance(state, PartitionedTableVersion)
    assert dict(state.partition_versions) == expected


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(st.sampled_from(PARTITIONS),
                    st.builds(Version.generate), max_size=5),
    st.dictionaries(st.sampled_from(PARTITIONS),
                    st.builds(Version.generate), max_size=5),
)
def test_diff_applied_to_current_reconstructs_target(cur, tgt):
    current = PartitionedTableVersion(dict(cur))
    target = PartitionedTableVersion(dict(tgt))
    changes = compute_changes(current, target)
    rebuilt = dict(cur)
    for op in changes.operations:
        if isinstance(op, (AddPartition, UpdatePartitionVersion)):
            rebuilt[op.partition] = op.version
        elif isinstance(op, RemovePartitionOp):
            rebuilt.pop(op.partition)
    assert rebuilt == dict(tgt)
    # and the diff is minimal: no op touches an already-correct partition
    for op in changes.operations:
        if isinstance(op, AddPartition):
            assert op.partition not in cur
        elif isinstance(op, UpdatePartitionVersion):
            assert cur[op.partition] != op.version


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=25))
def test_checkpoint_transparency(tmp_path_factory, n_commits):
    """State after N commits is identical whether N crosses the checkpoint
    interval (10) or not, and time travel to every historical commit agrees
    with an incremental dict replay."""
    log = FileTableVersions(str(tmp_path_factory.mktemp("ckpt") / "t"))
    log.init(T, is_snapshot=False, user_id="u", message="init")
    running: dict[Partition, Version] = {}
    snapshots = []
    for i in range(n_commits):
        part = PARTITIONS[i % len(PARTITIONS)]
        v = Version.generate()
        running[part] = v
        log.commit(T, TableUpdate(TableUpdateMetadata.create("u", f"c{i}"),
                                  (AddPartitionVersion(part, v),)))
        snapshots.append((log.table_state(T).current_version, dict(running)))
    for commit_id, expected in snapshots:
        got = log.current_version(T, at_commit=commit_id)
        assert dict(got.partition_versions) == expected


@settings(max_examples=15, deadline=None)
@given(st.lists(op_strategy, min_size=1, max_size=20))
def test_clone_preserves_current_state(tmp_path_factory, ops):
    """Clone law: for ANY commit history, the shallow clone's folded state
    equals the source's current state (and stays equal to what the source
    was at clone time if the source keeps evolving). Metadata-level — no
    Spark, no data files; version dirs are empty but the state algebra is
    exactly what clone_table carries."""
    from table_versions_spark.engine import VersionedEngine

    wh = str(tmp_path_factory.mktemp("clonewh"))
    eng = VersionedEngine(None, wh)
    eng.create_table("db.src", schema_ddl="id bigint, d string",
                     partition_columns=["d"])
    defn, log = eng._log("db.src")
    for kind, i in ops:
        op = (AddPartitionVersion(PARTITIONS[i], Version.generate())
              if kind == "add" else RemovePartition(PARTITIONS[i]))
        log.commit(defn.name, TableUpdate(
            TableUpdateMetadata.create("u", "m"), (op,)))
    src_state = log.current_version(defn.name)
    eng.clone_table("db.src", "db.dst")
    ddefn, dlog = eng._log("db.dst")
    assert dlog.current_version(ddefn.name).partition_versions \
        == src_state.partition_versions
    # source evolves after the clone; the clone must not follow
    log.commit(defn.name, TableUpdate(
        TableUpdateMetadata.create("u", "later"),
        (AddPartitionVersion(PARTITIONS[0], Version.generate()),)))
    assert dlog.current_version(ddefn.name).partition_versions \
        == src_state.partition_versions
