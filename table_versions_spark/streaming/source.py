"""Versioned tables as a Structured Streaming *source* (commit-log CDF).

The reference has no streaming surface at all (SURVEY §2.E). This closes the
loop the other ingest direction: downstream pipelines can
``spark.readStream.format("tvx")`` a versioned table and receive one
micro-batch per span of new commits — the streaming face of
``VersionedEngine.read_changes``.

Built on the Spark 4 Python Data Source API (public:
``pyspark.sql.datasource``). Offsets are commit *sequence numbers* in the
table's transaction log, so progress is exactly-once per commit and restarts
resume from the checkpointed seq. Each batch reads only version directories
that changed in the span — unchanged partitions are never scanned, same
contract as ``read_changes``.

Typical use::

    from table_versions_spark.streaming.source import register
    register(spark)
    stream = (spark.readStream.format("tvx")
              .option("location", "/warehouse/db/events")
              .load())

Scale notes: the default stream reader is a partition-parallel
``DataSourceStreamReader`` — the driver only plans offsets and lists changed
version dirs (metadata); each changed dir becomes one ``InputPartition``
whose rows are read executor-side, so one huge commit fans out across the
cluster like any file scan. Setting ``maxCommitsPerTrigger`` switches to the
``SimpleDataSourceStreamReader`` path: per-trigger admission control needs
offset-aware reads, which only the simple (driver-side) API provides — the
right trade-off when batches must stay small anyway.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..core.log import FileTableVersions, read_table_meta
from ..core.metastore import (
    AddPartition,
    UpdatePartitionVersion,
    UpdateTableVersion,
    compute_changes,
)
from ..core.model import UNVERSIONED, SnapshotTableVersion
from ..core.paths import path_for

FORMAT_NAME = "tvx"


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format("tvx").option("location", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        defn = read_table_meta(self.options["location"])
        if not defn.schema_ddl:
            raise ValueError(
                f"{defn.name.fully_qualified_name} has no declared schema; "
                "a streaming source needs one (pass schema_ddl to create_table)")
        return defn.schema_ddl

    def streamReader(self, schema) -> "VersionedTableParallelStreamReader":
        """Default: partition-parallel, executor-side reads. With
        ``maxCommitsPerTrigger`` set, defer to the simple reader (raising
        routes pyspark's ``_streamReader`` fallback) — admission control
        needs the offset-aware read(start) API."""
        if int(self.options.get("maxCommitsPerTrigger", 0)) > 0:
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature":
                                   "streamReader with maxCommitsPerTrigger"})
        return VersionedTableParallelStreamReader(self.options["location"],
                                                  schema=schema)

    def simpleStreamReader(self, schema) -> "VersionedTableStreamReader":
        return VersionedTableStreamReader(
            self.options["location"],
            max_commits=int(self.options.get("maxCommitsPerTrigger", 0)),
            schema=schema)

    def reader(self, schema) -> "VersionedTableBatchReader":
        """Batch face: ``spark.read.format("tvx").option("location", dir)``.

        Compat path — one InputPartition per current version dir, so the
        read parallelizes across executors like any file scan; rows travel
        as column-pruned Arrow RecordBatches (never per-row Python objects).
        ``VersionedEngine.read`` remains the fastest path (hands Catalyst
        the parquet dirs directly: native columnar scan, pushdown, pruning);
        use this format where only a DataFrame reader API is accepted or
        from a session that doesn't import this library's engine.
        """
        return VersionedTableBatchReader(self.options["location"],
                                         self.options.get("at_commit"),
                                         schema=schema)

    def writer(self, schema, overwrite: bool):
        """Batch sink: ``df.write.format("tvx").option("location", dir)`` —
        one versioned commit per write (see :mod:`.sink`)."""
        from .sink import VersionedTableWriter

        return VersionedTableWriter(self.options["location"], overwrite,
                                    schema=schema)

    def streamWriter(self, schema, overwrite: bool):
        """Streaming sink: one versioned commit per micro-batch with
        exactly-once epoch idempotence (``txnApp`` option names the
        writer's token stream; default is per-location)."""
        from .sink import VersionedTableStreamWriter

        location = self.options["location"]
        txn_app = self.options.get("txnApp", f"tvx-stream:{location}")
        return VersionedTableStreamWriter(location, overwrite, txn_app,
                                          schema=schema)


class VersionedTableStreamReader(SimpleDataSourceStreamReader):
    """Offsets: ``{"seq": <last consumed commit seq>}`` (−1 = nothing yet)."""

    def __init__(self, location: str, max_commits: int = 0, schema=None):
        self.location = location
        # admission control: cap commits consumed per micro-batch (0 = no
        # cap) so a large backlog can't become one giant first batch
        self.max_commits = max_commits
        self.defn = read_table_meta(location)
        self.log = FileTableVersions(location)
        fields = _schema_fields(self.defn.schema_ddl)
        self.pcols = list(self.defn.partition_schema.columns)
        self.ptypes = {name: typ for name, typ in fields if name in self.pcols}
        self.pa_schema = _arrow_schema(self.defn.schema_ddl, schema)

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def _commit_id_at(self, seq: int) -> str | None:
        if seq < 0:
            return None
        return self.log.commit_id_at(seq)

    # -- reads -------------------------------------------------------------

    def read(self, start: dict):
        head = self.log.head_seq()
        if self.max_commits > 0:
            head = min(head, start["seq"] + self.max_commits)
        end = {"seq": head}
        if head <= start["seq"]:
            return [], end
        # materialized list, not a generator: Spark caches the prefetched
        # batch for replay (batch volume ∝ newly committed data only).
        # Elements are Arrow RecordBatches, which pyspark forwards without
        # per-row Python conversion.
        return list(self._batches_between(start["seq"], head)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._batches_between(start["seq"], end["seq"]))

    def _batches_between(self, start_seq: int, end_seq: int):
        for partition, d in _changed_dirs(self.log, self.defn,
                                          start_seq, end_seq):
            yield from _dir_batches(d, partition, self.pa_schema,
                                    self.ptypes, self.defn.format)


def _changed_dirs(log, defn, start_seq: int, end_seq: int):
    """(partition, version_dir) pairs whose version changed in
    (start_seq, end_seq]; start_seq < 0 means the full state at end_seq.
    Sorted by dir path for deterministic planning."""
    before = (log.current_version(defn.name,
                                  at_commit=log.commit_id_at(start_seq))
              if start_seq >= 0 else None)
    after = log.current_version(defn.name,
                                at_commit=log.commit_id_at(end_seq))
    if before is None:
        if isinstance(after, SnapshotTableVersion):
            dirs = ([] if after.version == UNVERSIONED
                    else [(None, path_for(defn.location, after.version))])
        else:
            dirs = [(p, os.path.join(defn.location, p.render(), v.label))
                    for p, v in after.partition_versions.items()]
    else:
        changes = compute_changes(before, after)
        dirs = []
        for op in changes.operations:
            if isinstance(op, UpdateTableVersion):
                dirs.append((None, path_for(defn.location, op.version)))
            elif isinstance(op, (AddPartition, UpdatePartitionVersion)):
                dirs.append((op.partition,
                             os.path.join(defn.location,
                                          op.partition.render(),
                                          op.version.label)))
    return sorted(dirs, key=lambda x: x[1])


class VersionedDirPartition(InputPartition):
    def __init__(self, directory: str, partition):
        self.directory = directory
        self.partition = partition


class VersionedTableParallelStreamReader(DataSourceStreamReader):
    """Partition-parallel streaming reader: offsets are commit seqs; each
    micro-batch plans one ``InputPartition`` per changed version directory,
    and executors read the rows — the driver never touches row data.

    The reader instance is pickled to executors for ``read``; it carries
    only plain strings/dicts plus the target Arrow schema."""

    def __init__(self, location: str, schema=None):
        self.location = location
        self.defn = read_table_meta(location)
        self.log = FileTableVersions(location)
        fields = _schema_fields(self.defn.schema_ddl)
        pcols = set(self.defn.partition_schema.columns)
        self.ptypes = {n: t for n, t in fields if n in pcols}
        self.format = self.defn.format
        self.pa_schema = _arrow_schema(self.defn.schema_ddl, schema)

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def latestOffset(self) -> dict:
        return {"seq": self.log.head_seq()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if end["seq"] <= start["seq"]:
            return []
        return [VersionedDirPartition(d, p)
                for p, d in _changed_dirs(self.log, self.defn,
                                          start["seq"], end["seq"])]

    def read(self, part: VersionedDirPartition):
        yield from _dir_batches(part.directory, part.partition,
                                self.pa_schema, self.ptypes, self.format)

    def commit(self, end: dict) -> None:
        pass  # progress is checkpointed by the engine; nothing to GC


class VersionedTableBatchReader(DataSourceReader):
    """Executor-parallel batch read of a versioned table's current (or
    time-travel) state — one input partition per version directory."""

    def __init__(self, location: str, at_commit: str | None = None,
                 schema=None):
        defn = read_table_meta(location)
        log = FileTableVersions(location)
        state = log.current_version(defn.name, at_commit=at_commit)
        fields = _schema_fields(defn.schema_ddl)
        pcols = set(defn.partition_schema.columns)
        self.ptypes = {n: t for n, t in fields if n in pcols}
        self.format = defn.format
        self.pa_schema = _arrow_schema(defn.schema_ddl, schema)
        if isinstance(state, SnapshotTableVersion):
            self.dirs = ([] if state.version == UNVERSIONED
                         else [(None, path_for(defn.location, state.version))])
        else:
            self.dirs = [(p, os.path.join(defn.location, p.render(), v.label))
                         for p, v in state.partition_versions.items()]

    def partitions(self) -> list[InputPartition]:
        return [VersionedDirPartition(d, p) for p, d in sorted(
            self.dirs, key=lambda x: x[1])] or [VersionedDirPartition("", None)]

    def read(self, part: VersionedDirPartition):
        if not part.directory:
            return
        yield from _dir_batches(part.directory, part.partition,
                                self.pa_schema, self.ptypes, self.format)


def _schema_fields(schema_ddl: str) -> list[tuple[str, str]]:
    """"a int, b decimal(10,2), c array<int>" → [(name, type), ...] —
    splits on top-level commas only (type args carry their own commas)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(schema_ddl + ","):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            piece = schema_ddl[start:i].strip()
            if piece:
                name, _, typ = piece.partition(" ")
                out.append((name, typ.strip().lower()))
            start = i + 1
    return out


def _arrow_schema(schema_ddl: str, schema=None):
    """Target ``pyarrow.Schema`` for batches this source yields.

    Must equal what the pyspark data-source worker would build for this
    source's declared schema (``to_arrow_schema`` of the parsed DDL) —
    field order, arrow types, and timestamp tz all included — so yielded
    RecordBatches stream to the JVM without conversion. ``schema`` is the
    ``StructType`` pyspark passes to ``DataSource.reader``/``streamReader``;
    when a reader is constructed directly (tests/tools), fall back to
    parsing the table DDL via the active session.
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    if schema is None:
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema_ddl)
    return to_arrow_schema(schema)


def _cast_column(chunked, target):
    """Cast a file column to the declared arrow type. The one safe-cast
    exception we permit is timestamp unit narrowing (files written with ns
    precision → Spark's us): sub-microsecond truncation is the documented
    TIMESTAMP semantics, not data corruption. A naive→tz-aware timestamp
    cast attaches the zone to the stored UTC instant (exactly the
    localization the old row path did by hand)."""
    import pyarrow as pa

    if chunked.type == target:
        return chunked
    try:
        return chunked.cast(target)
    except pa.ArrowInvalid:
        if pa.types.is_timestamp(target):
            return chunked.cast(target, safe=False)
        raise


def _dir_batches(directory: str, partition, pa_schema,
                 ptypes: dict[str, str], fmt: str):
    """Yield the rows of one version directory as column-pruned
    ``pyarrow.RecordBatch``es matching ``pa_schema``.

    This is the data plane of the ``tvx`` source — batch and streaming
    readers both land here, executor-side. Rows never pass through Python
    objects: files are read as Arrow tables (only declared columns),
    partition-path values are materialized as constant arrays, and missing
    columns (schema evolution) become typed nulls.
    """
    import pyarrow as pa
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    if not os.path.isdir(directory):
        return  # vacuumed beyond retention — same contract as read_changes
    # stored partition values are in escaped dir-name form — surface them the
    # way engine.read does: unescape %XX and map the Hive NULL sentinel to None
    from ..core.model import HIVE_DEFAULT_PARTITION, unescape_partition_value

    pvals = {}
    if partition is not None:
        for cv in partition.column_values:
            if cv.value == HIVE_DEFAULT_PARTITION:
                pvals[cv.column] = None
            else:
                pvals[cv.column] = _cast_partition_value(
                    unescape_partition_value(cv.value),
                    ptypes.get(cv.column, "string"))
    # deletion vectors (engine delete(mode="dv")): positions recorded in
    # the dir's _dv sidecar are masked out per file, same semantics as the
    # engine read path's anti-join
    dv_by_file: dict[str, set[int]] = {}
    dv_dir = os.path.join(directory, "_dv")
    if os.path.isdir(dv_dir):
        dv_tbl = pq.read_table(dv_dir, columns=["file", "idx"])
        for f, i in zip(dv_tbl.column("file").to_pylist(),
                        dv_tbl.column("idx").to_pylist()):
            dv_by_file.setdefault(f, set()).add(i)
    declared = set(pa_schema.names)
    for fname in sorted(os.listdir(directory)):
        path = os.path.join(directory, fname)
        if fname.startswith((".", "_")) or not os.path.isfile(path):
            continue
        if fmt == "orc":
            table = orc.read_table(path)
            table = table.select([n for n in table.column_names
                                  if n in declared])
        else:
            present = [n for n in pq.read_schema(path).names if n in declared]
            table = pq.read_table(path, columns=present)
        if fname in dv_by_file:
            import numpy as np

            mask = np.ones(table.num_rows, dtype=bool)
            mask[list(dv_by_file[fname])] = False
            table = table.filter(pa.array(mask))
        n = table.num_rows
        columns = []
        for field in pa_schema:
            if field.name in table.column_names:
                columns.append(_cast_column(table.column(field.name),
                                            field.type))
            elif field.name in pvals and pvals[field.name] is not None:
                columns.append(pa.array([pvals[field.name]] * n)
                               .cast(field.type))
            else:
                columns.append(pa.nulls(n, field.type))
        yield from pa.table(columns, schema=pa_schema).to_batches()


def _cast_partition_value(value: str, typ: str):
    """Partition dir values are strings; cast to the declared column type."""
    import datetime as dt

    if typ in ("int", "integer", "bigint", "long", "smallint", "tinyint"):
        return int(value)
    if typ in ("double", "float"):
        return float(value)
    if typ == "date":
        return dt.date.fromisoformat(value)
    return value


def register(spark) -> None:
    """Register the ``tvx`` format on this SparkSession."""
    spark.dataSource.register(VersionedTableDataSource)
