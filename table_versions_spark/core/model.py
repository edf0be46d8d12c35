"""Core data model: versions, partitions, tables, commits.

Re-expresses the reference data model (guardian/table-versions) in Python:

- ``Version`` — reference ``core/src/main/scala/com/gu/tableversions/core/Version.scala:15-57``.
  The label format ``yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>`` is a storage-layout
  contract and is preserved exactly.
- ``Partition`` / ``ColumnValue`` / ``PartitionSchema`` — reference
  ``core/.../model.scala:10-83`` (render :23-24, parse regex :45-69).
- ``TableName`` / ``TableDefinition`` — reference ``core/.../model.scala:89-95``.
- ``TableUpdate`` + operation ADT — reference ``core/.../TableVersions.scala:75-119``.
- ``TableVersion`` ADT — reference ``core/.../model.scala:100-102``.

This module is pure Python (no Spark dependency) by design, mirroring the
reference's ``core`` module split.
"""

from __future__ import annotations

import re
import time
import uuid as _uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Union


# ---------------------------------------------------------------------------
# Version
# ---------------------------------------------------------------------------

_VERSION_RE = re.compile(r"^(\d{8}-\d{6})\.(\d{9})-([0-9a-fA-F-]{36})$")
_TS_FORMAT = "%Y%m%d-%H%M%S"


@dataclass(frozen=True, order=True)
class Version:
    """An immutable version label: UTC timestamp (ns precision) + UUID.

    Label format (contract with on-disk layout, identical to reference
    ``Version.scala:19-24``): ``yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>``.
    """

    epoch_seconds: int
    nanos: int  # 0..999_999_999 fractional part
    uuid: str  # canonical lowercase uuid string

    @property
    def label(self) -> str:
        ts = datetime.fromtimestamp(self.epoch_seconds, tz=timezone.utc)
        return f"{ts.strftime(_TS_FORMAT)}.{self.nanos:09d}-{self.uuid}"

    @classmethod
    def generate(cls) -> "Version":
        ns = time.time_ns()
        return cls(epoch_seconds=ns // 1_000_000_000, nanos=ns % 1_000_000_000,
                   uuid=str(_uuid.uuid4()))

    @classmethod
    def parse(cls, label: str) -> "Version":
        m = _VERSION_RE.match(label)
        if not m:
            raise ValueError(f"Invalid version label: {label!r}")
        ts = datetime.strptime(m.group(1), _TS_FORMAT).replace(tzinfo=timezone.utc)
        return cls(epoch_seconds=int(ts.timestamp()), nanos=int(m.group(2)),
                   uuid=m.group(3).lower())

    @classmethod
    def is_version_label(cls, s: str) -> bool:
        return _VERSION_RE.match(s) is not None

    def is_unversioned(self) -> bool:
        return self == UNVERSIONED


#: Sentinel for "no version yet" (reference ``Version.scala:30``).
UNVERSIONED = Version(epoch_seconds=0, nanos=0,
                      uuid="00000000-0000-0000-0000-000000000000")


# ---------------------------------------------------------------------------
# Partitions
# ---------------------------------------------------------------------------

# any Spark-legal identifier — create_table/insert accept mixed-case
# column names, and Spark's partitionBy writes their dirs verbatim, so a
# lowercase-only pattern would fail the publish-time parse AFTER the full
# data write (reference model.scala:30 is lowercase-only; widened here)
_PARTITION_COL_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)=(.+)$")


@dataclass(frozen=True, order=True)
class ColumnValue:
    """A single ``column=value`` pair; values are always strings
    (reference ``model.scala:43``)."""

    column: str
    value: str


# Characters Spark/Hive escape in partition directory names
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName):
# ASCII control chars, DEL, and the listed specials become %XX. Partition
# values parsed from dir names are therefore stored in ESCAPED form; any
# user-supplied raw value must pass through escape_partition_value before
# being compared with stored values or used to address a directory.
_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^') | {chr(c) for c in range(0x20)} | {chr(0x7F)}

# Hive/Spark's directory name for a NULL partition value
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME).
# A Python ``None`` partition value maps to this literal when addressing
# directories / stored partition values, and back to ``None`` when surfacing
# values to users.
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def render_partition_value(value) -> "str | None":
    """Python value → the string Spark's ``getPartitionPathString`` renders
    (before Hive escaping): booleans lowercase, timestamps in Spark's
    cast-to-string form (space separator, zero-padded year, fractional
    seconds trimmed of trailing zeros), empty string → the default
    partition (None). ``int``/``date``/``Decimal`` ``str()`` already match
    Java's rendering. float/bytes are REFUSED: Python has no rendering
    that matches ``Double.toString`` / Spark's binary form, and a silently
    divergent name would address (or drop) the wrong directory."""
    import datetime

    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, datetime.datetime):
        # explicit field formatting, not strftime: glibc's %Y renders
        # year 1 as '1' where Spark pads to '0001'
        s = (f"{value.year:04d}-{value.month:02d}-{value.day:02d} "
             f"{value.hour:02d}:{value.minute:02d}:{value.second:02d}")
        if value.microsecond:
            s += f".{value.microsecond:06d}".rstrip("0")
        return s
    if isinstance(value, (float, bytes)):
        raise ValueError(
            f"partition value {value!r} of type {type(value).__name__} "
            "cannot be rendered with Spark directory-name parity")
    if value == "":
        return None
    return value


def escape_partition_value(value) -> str:
    value = render_partition_value(value)
    if value is None:
        return HIVE_DEFAULT_PARTITION
    return "".join(f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS else ch
                   for ch in str(value))


_PCT_RE = None


def unescape_partition_value(value: str) -> str:
    """Inverse of :func:`escape_partition_value` (sans the None mapping —
    callers decide whether ``__HIVE_DEFAULT_PARTITION__`` means NULL)."""
    global _PCT_RE
    if _PCT_RE is None:
        import re
        _PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
    return _PCT_RE.sub(lambda m: chr(int(m.group(1), 16)), value)


@dataclass(frozen=True, order=True)
class Partition:
    """Ordered, non-empty list of column values.

    Renders as a Hive-style relative path ``col1=v1/col2=v2``
    (reference ``model.scala:23-24``).
    """

    column_values: tuple[ColumnValue, ...]

    def __post_init__(self) -> None:
        if not self.column_values:
            raise ValueError("Partition must have at least one column value")

    def render(self) -> str:
        return "/".join(f"{cv.column}={cv.value}" for cv in self.column_values)

    def resolve(self, base: str) -> str:
        return f"{base.rstrip('/')}/{self.render()}"

    @property
    def columns(self) -> tuple[str, ...]:
        return tuple(cv.column for cv in self.column_values)

    @classmethod
    def of(cls, *pairs: tuple[str, str] | ColumnValue) -> "Partition":
        cvs = tuple(p if isinstance(p, ColumnValue) else ColumnValue(*p)
                    for p in pairs)
        return cls(cvs)

    @classmethod
    def parse(cls, s: str) -> "Partition":
        """Parse ``col1=v1/col2=v2`` (reference ``model.scala:45-69``)."""
        segments = [seg for seg in s.strip("/").split("/") if seg]
        if not segments:
            raise ValueError(f"Cannot parse partition from {s!r}")
        cvs = []
        for seg in segments:
            m = _PARTITION_COL_RE.match(seg)
            if not m:
                raise ValueError(f"Invalid partition segment {seg!r} in {s!r}")
            cvs.append(ColumnValue(m.group(1), m.group(2)))
        return cls(tuple(cvs))


@dataclass(frozen=True)
class PartitionSchema:
    """Ordered partition columns; empty ⇒ snapshot table
    (reference ``model.scala:76-83``)."""

    columns: tuple[str, ...] = ()

    @property
    def is_snapshot(self) -> bool:
        return not self.columns


SNAPSHOT_SCHEMA = PartitionSchema(())


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

@dataclass(frozen=True, order=True)
class TableName:
    schema: str
    name: str

    @property
    def fully_qualified_name(self) -> str:
        return f"{self.schema}.{self.name}"

    @classmethod
    def parse(cls, fqn: str) -> "TableName":
        parts = fqn.split(".")
        if len(parts) != 2:
            raise ValueError(f"Expected 'schema.name', got {fqn!r}")
        return cls(parts[0], parts[1])


@dataclass(frozen=True)
class TableDefinition:
    """Reference ``model.scala:93-95`` + our extension: we persist the row
    schema (as a Spark DDL string) so empty tables can be read with a stable
    schema — a gap in the reference (schema lives only in Hive DDL there).
    """

    name: TableName
    location: str
    partition_schema: PartitionSchema
    format: str = "parquet"  # "parquet" | "orc" (reference model.scala:104-109)
    schema_ddl: str | None = None
    # True once a widening insert has happened: reads then merge footers
    # across version dirs so pre-evolution versions surface NULL for the
    # added columns. (Schema evolution is unsupported in the reference —
    # SURVEY §1.3 — this closes that gap.)
    merge_schema: bool = False
    # Hive-style bucket spec: (columns tuple, bucket count). Declared at
    # create_table; every insert then hash-clusters rows into exactly
    # ``count`` write tasks on these columns, so the file NAME's task index
    # is the bucket id (part-00003-... = bucket 3 — the same filename
    # contract Hive bucketing uses). Enables bucket-wise map joins between
    # co-bucketed tables (see engine.bucketed_join).
    bucket_columns: tuple[str, ...] = ()
    bucket_count: int = 0
    # Columns carrying a per-file Bloom filter in the commit-record stats
    # (extension; Delta's BLOOMFILTER INDEX role). Built at publish time
    # from the written files, consulted by ``read(stats_filter=...)`` for
    # point-equality skipping where min/max ranges cannot prune (hash-
    # distributed high-cardinality keys).
    bloom_columns: tuple[str, ...] = ()
    # Column mapping (extension; Delta column-mapping name mode): logical
    # (current) name → physical name as stored in every data file. Rename
    # is a metadata-only commit — files are never rewritten; reads rename
    # physical→logical, writes rename logical→physical. ``dropped_columns``
    # lists physical names excluded from reads (metadata-only DROP COLUMN);
    # schema evolution refuses to reuse a physical name still present in
    # old files.
    column_mapping: tuple[tuple[str, str], ...] = ()
    dropped_columns: tuple[str, ...] = ()
    # CHECK constraints (extension; Delta ``ALTER TABLE ADD CONSTRAINT
    # CHECK`` shape): SQL boolean expressions every inserted row must
    # satisfy — standard SQL semantics, so a NULL result passes. Enforced
    # at write time (one extra aggregation job per insert, only on tables
    # that declare constraints); a violation rejects the whole commit.
    check_constraints: tuple[str, ...] = ()
    # Generated partition columns (extension; Delta GENERATED ALWAYS AS /
    # the reference's derive-date-from-timestamp convention,
    # ``examples/.../DateTime.scala:10-13``): (column, SQL expression)
    # pairs. An insert whose DataFrame lacks the partition column gets it
    # computed from the expression — the derivation lives with the table,
    # not in every writer job.
    partition_derivations: tuple[tuple[str, str], ...] = ()
    # Change data feed (extension; Delta ``delta.enableChangeDataFeed``):
    # when True, rewrite-mode DELETE/UPDATE/MERGE additionally write a
    # ``_cdc/`` sidecar of exactly-changed rows (+ ``_change_type``) into
    # each new version dir, so ``read_changes(row_level=True)`` and the
    # streaming change feed stay row-exact across rewrite commits instead
    # of falling back to delete-all+insert-all. Costs one extra write job
    # over the CHANGED rows per such commit.
    change_data_feed: bool = False

    @property
    def is_snapshot(self) -> bool:
        return self.partition_schema.is_snapshot


# ---------------------------------------------------------------------------
# Commit log records
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class InitTable:
    table: TableName
    is_snapshot: bool
    op: str = field(default="init-table", repr=False)


@dataclass(frozen=True)
class AddTableVersion:
    version: Version
    op: str = field(default="add-table-version", repr=False)


@dataclass(frozen=True)
class AddPartitionVersion:
    partition: Partition
    version: Version
    op: str = field(default="add-partition-version", repr=False)


@dataclass(frozen=True)
class RemovePartition:
    partition: Partition
    op: str = field(default="remove-partition", repr=False)


@dataclass(frozen=True)
class UpdateColumnMapping:
    """Metadata-only schema change (``rename_column`` / ``drop_column``) as
    a logged commit (extension; Delta records schema changes in the log the
    same way). Carries the column-mapping state both AFTER and BEFORE the
    change, so (a) history shows the rename/drop, (b) concurrent metadata
    writers CAS-conflict on the commit append instead of last-write-wins
    on ``_meta.json``, and (c) the mapping as of ANY commit is
    reconstructable by folding — time travel and restore can show/restore
    the schema of that era. Ignored by the partition/snapshot version
    folds (like ``InitTable``)."""

    schema_ddl: str
    column_mapping: "tuple[tuple[str, str], ...]"
    dropped_columns: "tuple[str, ...]"
    prev_schema_ddl: str
    prev_column_mapping: "tuple[tuple[str, str], ...]"
    prev_dropped_columns: "tuple[str, ...]"
    op: str = field(default="update-column-mapping", repr=False)


TableOperation = Union[InitTable, AddTableVersion, AddPartitionVersion,
                       RemovePartition, UpdateColumnMapping]


@dataclass(frozen=True)
class TableUpdateMetadata:
    """Reference ``TableVersions.scala:96-107``.

    ``txn_app``/``txn_version`` (extension, Delta's ``txnAppId``/
    ``txnVersion``): an idempotence token for exactly-once writers. A writer
    that retries a failed job re-submits the same (app, version) pair; the
    engine skips the write if that version is already committed."""

    commit_id: str
    user_id: str
    message: str
    timestamp: str  # ISO-8601 UTC
    txn_app: "str | None" = None
    txn_version: "int | None" = None

    @classmethod
    def create(cls, user_id: str, message: str,
               txn: "tuple[str, int] | None" = None) -> "TableUpdateMetadata":
        return cls(commit_id=str(_uuid.uuid4()), user_id=user_id, message=message,
                   timestamp=datetime.now(timezone.utc).isoformat(),
                   txn_app=txn[0] if txn else None,
                   txn_version=txn[1] if txn else None)


@dataclass(frozen=True)
class TableUpdate:
    """A commit: metadata + operations, plus optional per-version-dir column
    statistics (Delta-style add-file stats, SURVEY §2 stats_filter): a dict
    mapping the version dir's path RELATIVE to the table location (e.g.
    ``date=2024-01-01/v2-...`` or ``v1-...`` for snapshots) to
    ``{"rows": n, "columns": {col: {"min": x, "max": y}}}``. Stats ride the
    commit record so plan-time data skipping reads the log it already has —
    never one sidecar per directory."""

    metadata: TableUpdateMetadata
    operations: tuple[TableOperation, ...]
    stats: "dict[str, dict] | None" = None


# ---------------------------------------------------------------------------
# Current table state (the fold target)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SnapshotTableVersion:
    version: Version


@dataclass(frozen=True)
class PartitionedTableVersion:
    partition_versions: dict[Partition, Version] = field(default_factory=dict)

    def __hash__(self) -> int:  # pragma: no cover - convenience only
        return hash(frozenset(self.partition_versions.items()))


TableVersion = Union[SnapshotTableVersion, PartitionedTableVersion]


def apply_partition_updates(initial: PartitionedTableVersion,
                            operations: list[TableOperation]) -> PartitionedTableVersion:
    """Fold commit-log ops into partition→version state
    (reference ``TableVersions.scala:135-149``)."""
    pv = dict(initial.partition_versions)
    for op in operations:
        if isinstance(op, AddPartitionVersion):
            pv[op.partition] = op.version
        elif isinstance(op, RemovePartition):
            pv.pop(op.partition, None)
        # InitTable / AddTableVersion ignored for partitioned state
    return PartitionedTableVersion(pv)


def latest_snapshot_table_version(operations: list[TableOperation]) -> SnapshotTableVersion:
    """Last AddTableVersion wins; else Unversioned
    (reference ``TableVersions.scala:154-159``)."""
    version = UNVERSIONED
    for op in operations:
        if isinstance(op, AddTableVersion):
            version = op.version
    return SnapshotTableVersion(version)


# ---------------------------------------------------------------------------
# JSON (de)serialization of commit records
# ---------------------------------------------------------------------------

def operation_to_json(op: TableOperation) -> dict[str, Any]:
    if isinstance(op, InitTable):
        return {"op": "init-table", "table": op.table.fully_qualified_name,
                "is_snapshot": op.is_snapshot}
    if isinstance(op, AddTableVersion):
        return {"op": "add-table-version", "version": op.version.label}
    if isinstance(op, AddPartitionVersion):
        return {"op": "add-partition-version", "partition": op.partition.render(),
                "version": op.version.label}
    if isinstance(op, RemovePartition):
        return {"op": "remove-partition", "partition": op.partition.render()}
    if isinstance(op, UpdateColumnMapping):
        return {"op": "update-column-mapping",
                "schema_ddl": op.schema_ddl,
                "column_mapping": [list(m) for m in op.column_mapping],
                "dropped_columns": list(op.dropped_columns),
                "prev_schema_ddl": op.prev_schema_ddl,
                "prev_column_mapping": [list(m) for m in op.prev_column_mapping],
                "prev_dropped_columns": list(op.prev_dropped_columns)}
    raise TypeError(f"Unknown operation {op!r}")


def operation_from_json(d: dict[str, Any]) -> TableOperation:
    kind = d["op"]
    if kind == "init-table":
        return InitTable(TableName.parse(d["table"]), d["is_snapshot"])
    if kind == "add-table-version":
        return AddTableVersion(Version.parse(d["version"]))
    if kind == "add-partition-version":
        return AddPartitionVersion(Partition.parse(d["partition"]),
                                   Version.parse(d["version"]))
    if kind == "remove-partition":
        return RemovePartition(Partition.parse(d["partition"]))
    if kind == "update-column-mapping":
        return UpdateColumnMapping(
            d["schema_ddl"],
            tuple((m[0], m[1]) for m in d["column_mapping"]),
            tuple(d["dropped_columns"]),
            d["prev_schema_ddl"],
            tuple((m[0], m[1]) for m in d["prev_column_mapping"]),
            tuple(d["prev_dropped_columns"]))
    raise ValueError(f"Unknown operation kind {kind!r}")


def update_to_json(update: TableUpdate) -> dict[str, Any]:
    return {
        "commit_id": update.metadata.commit_id,
        "user_id": update.metadata.user_id,
        "message": update.metadata.message,
        "timestamp": update.metadata.timestamp,
        "operations": [operation_to_json(op) for op in update.operations],
        **({"stats": update.stats} if update.stats else {}),
        **({"txn_app": update.metadata.txn_app,
            "txn_version": update.metadata.txn_version}
           if update.metadata.txn_app is not None else {}),
    }


def update_from_json(d: dict[str, Any]) -> TableUpdate:
    meta = TableUpdateMetadata(commit_id=d["commit_id"], user_id=d["user_id"],
                               message=d["message"], timestamp=d["timestamp"],
                               txn_app=d.get("txn_app"),
                               txn_version=d.get("txn_version"))
    ops = tuple(operation_from_json(o) for o in d["operations"])
    return TableUpdate(metadata=meta, operations=ops, stats=d.get("stats"))
