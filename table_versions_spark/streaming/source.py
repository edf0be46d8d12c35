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

from ..core.log import (
    FileTableVersions,
    UnknownCommitError,
    read_table_meta,
)
from ..core.metastore import (
    AddPartition,
    UpdatePartitionVersion,
    UpdateTableVersion,
    compute_changes,
)
from ..core.model import UNVERSIONED, SnapshotTableVersion
from ..core.paths import CDC_DIR, DV_DIR, cdc_before_label, path_for
from ..core.storage import DEFAULT_STORAGE, storage_from_name

FORMAT_NAME = "tvx"


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format("tvx").option("location", dir)``.

    ``.option("storage", "local" | "object" | "s3")`` selects the metadata
    /data-plane backend (default local POSIX) — the same ``Storage``
    abstraction the engine uses, so the whole ``tvx`` read/write surface
    works on object stores, not just local disks."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _change_feed(self) -> bool:
        return str(self.options.get("changeFeed", "false")).lower() == "true"

    def _storage(self):
        return storage_from_name(self.options.get("storage"))

    def schema(self):
        defn = read_table_meta(self.options["location"], self._storage())
        if not defn.schema_ddl:
            raise ValueError(
                f"{defn.name.fully_qualified_name} has no declared schema; "
                "a streaming source needs one (pass schema_ddl to create_table)")
        if self._change_feed():
            return defn.schema_ddl + ", _change_type string"
        return defn.schema_ddl

    def streamReader(self, schema) -> "VersionedTableParallelStreamReader":
        """Default: partition-parallel, executor-side reads. With
        ``maxCommitsPerTrigger`` set, defer to the simple reader (raising
        routes pyspark's ``_streamReader`` fallback) — admission control
        needs the offset-aware read(start) API."""
        if int(self.options.get("maxCommitsPerTrigger", 0)) > 0:
            if self._change_feed():
                raise ValueError(
                    "changeFeed and maxCommitsPerTrigger cannot combine: "
                    "the change feed needs the partition-parallel reader")
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature":
                                   "streamReader with maxCommitsPerTrigger"})
        return VersionedTableParallelStreamReader(
            self.options["location"], schema=schema,
            change_feed=self._change_feed(), storage=self._storage())

    def simpleStreamReader(self, schema) -> "VersionedTableStreamReader":
        return VersionedTableStreamReader(
            self.options["location"],
            max_commits=int(self.options.get("maxCommitsPerTrigger", 0)),
            schema=schema, storage=self._storage())

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
        if self._change_feed():
            raise ValueError(
                "changeFeed is a streaming option (readStream); a batch "
                "read would return the current snapshot with NULL "
                "_change_type — use VersionedEngine.read_changes for "
                "batch change queries")
        return VersionedTableBatchReader(self.options["location"],
                                         self.options.get("at_commit"),
                                         schema=schema,
                                         storage=self._storage())

    def writer(self, schema, overwrite: bool):
        """Batch sink: ``df.write.format("tvx").option("location", dir)`` —
        one versioned commit per write (see :mod:`.sink`)."""
        from .sink import VersionedTableWriter

        return VersionedTableWriter(self.options["location"], overwrite,
                                    schema=schema, storage=self._storage())

    def streamWriter(self, schema, overwrite: bool):
        """Streaming sink: one versioned commit per micro-batch with
        exactly-once epoch idempotence (``txnApp`` option names the
        writer's token stream; default is per-location)."""
        from .sink import VersionedTableStreamWriter

        location = self.options["location"]
        txn_app = self.options.get("txnApp", f"tvx-stream:{location}")
        return VersionedTableStreamWriter(location, overwrite, txn_app,
                                          schema=schema,
                                          storage=self._storage())


class VersionedTableStreamReader(SimpleDataSourceStreamReader):
    """Offsets: ``{"seq": <last consumed commit seq>}`` (−1 = nothing yet)."""

    def __init__(self, location: str, max_commits: int = 0, schema=None,
                 storage=None):
        self.location = location
        # admission control: cap commits consumed per micro-batch (0 = no
        # cap) so a large backlog can't become one giant first batch
        self.max_commits = max_commits
        self.storage = storage if storage is not None else DEFAULT_STORAGE
        self.defn = read_table_meta(location, self.storage)
        self.log = FileTableVersions(location, self.storage)
        fields = _schema_fields(self.defn.schema_ddl)
        self.pcols = list(self.defn.partition_schema.columns)
        self.ptypes = {name: typ for name, typ in fields if name in self.pcols}
        self.pa_schema = _arrow_schema(self.defn.schema_ddl, schema)
        self.colmap = _phys_to_logical(self.defn)

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"seq": -1}

    # -- reads -------------------------------------------------------------

    def read(self, start: dict):
        head = self.log.head_seq()
        if start["seq"] > head:
            # a checkpoint offset past the head means the checkpoint
            # belongs to a different (truncated/recreated) log — clamping
            # would regress the offset and silently skip the new log's
            # commits
            raise UnknownCommitError(
                f"stream checkpoint offset {start['seq']} is past the log "
                f"head {head} of {self.location}: the checkpoint does not "
                "belong to this table's log (recreated table?) — start the "
                "query with a fresh checkpoint")
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
                                    self.ptypes, self.defn.format,
                                    storage=self.storage,
                                    colmap=self.colmap)


def _changed_dirs(log, defn, start_seq: int, end_seq: int):
    """(partition, version_dir) pairs whose version changed in
    (start_seq, end_seq]; start_seq < 0 means the full state at end_seq.
    Sorted by dir path for deterministic planning."""
    before = (log.current_version(defn.name, at_seq=start_seq)
              if start_seq >= 0 else None)
    after = log.current_version(defn.name, at_seq=end_seq)
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
    def __init__(self, directory: str, partition, bucket: "int | None" = None):
        self.directory = directory
        self.partition = partition
        # bucket-pruned point reads: only files whose part index == bucket
        # are read (None = all files)
        self.bucket = bucket


class ChangeFeedPartition(InputPartition):
    """One planned change-feed unit: a coarse whole-dir emit
    (kind="coarse"; change_type "delete" reads b_dir, "insert" reads
    a_dir), a refined before/after pair whose diff the executor computes
    from the dirs' deletion vectors (kind="refined"), or a commit-time
    ``_cdc/`` sidecar dir in a_dir (kind="cdc")."""

    def __init__(self, kind: str, change_type, b_dir, a_dir,
                 b_files: tuple, partition):
        self.kind = kind
        self.change_type = change_type
        self.b_dir = b_dir
        self.a_dir = a_dir
        self.b_files = b_files
        self.partition = partition


class VersionedTableParallelStreamReader(DataSourceStreamReader):
    """Partition-parallel streaming reader: offsets are commit seqs; each
    micro-batch plans one ``InputPartition`` per changed version directory,
    and executors read the rows — the driver never touches row data.

    The reader instance is pickled to executors for ``read``; it carries
    only plain strings/dicts plus the target Arrow schema."""

    def __init__(self, location: str, schema=None, change_feed: bool = False,
                 storage=None):
        self.location = location
        self.storage = storage if storage is not None else DEFAULT_STORAGE
        self.defn = read_table_meta(location, self.storage)
        self.log = FileTableVersions(location, self.storage)
        fields = _schema_fields(self.defn.schema_ddl)
        pcols = set(self.defn.partition_schema.columns)
        self.ptypes = {n: t for n, t in fields if n in pcols}
        self.format = self.defn.format
        self.change_feed = change_feed
        ddl = (self.defn.schema_ddl + ", _change_type string"
               if change_feed else self.defn.schema_ddl)
        self.pa_schema = _arrow_schema(ddl, schema)
        self.colmap = _phys_to_logical(self.defn)

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def latestOffset(self) -> dict:
        return {"seq": self.log.head_seq()}

    def _state_dirs(self, seq: int) -> dict:
        """qualifier (partition render, or "" for snapshot) → version dir
        of the state at commit seq; {} before the first commit."""
        if seq < 0:
            return {}
        state = self.log.current_version(self.defn.name, at_seq=seq)
        if isinstance(state, SnapshotTableVersion):
            if state.version == UNVERSIONED:
                return {}
            return {"": path_for(self.defn.location, state.version)}
        return {p.render(): os.path.join(self.defn.location, p.render(),
                                         v.label)
                for p, v in state.partition_versions.items()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if end["seq"] <= start["seq"]:
            return []
        if not self.change_feed:
            return [VersionedDirPartition(d, p)
                    for p, d in _changed_dirs(self.log, self.defn,
                                              start["seq"], end["seq"])]
        # change feed: plan per changed (before, after) dir pair — exact
        # vector-delta diff when the after dir is a file superset of the
        # before dir (the dv-commit shape), coarse delete+insert otherwise
        from ..core.model import Partition

        before = self._state_dirs(start["seq"])
        after = self._state_dirs(end["seq"])
        parts: list[InputPartition] = []
        for q in sorted(set(before) | set(after)):
            b, a = before.get(q), after.get(q)
            if b == a:
                continue
            partition = Partition.parse(q) if q else None
            if b is None:
                parts.append(ChangeFeedPartition(
                    "coarse", "insert", None, _require_dir(a, self.storage),
                    (), partition))
            elif a is None:
                parts.append(ChangeFeedPartition(
                    "coarse", "delete", _require_dir(b, self.storage), None,
                    (), partition))
            else:
                # a _cdc sidecar diffed against exactly this before-dir is
                # row-exact for the pair (rewrite commits on
                # change_data_feed tables) and stays exact even past
                # vacuum retention; else vector-delta, else coarse
                cdc_dir = os.path.join(a, CDC_DIR)
                if cdc_before_label(cdc_dir, self.storage) == \
                        os.path.basename(b):
                    parts.append(ChangeFeedPartition(
                        "cdc", None, None, cdc_dir, (), partition))
                    continue
                _require_dir(b, self.storage)
                _require_dir(a, self.storage)
                bf = _data_files(b, self.storage)
                if bf <= _data_files(a, self.storage):
                    parts.append(ChangeFeedPartition(
                        "refined", None, b, a, tuple(sorted(bf)), partition))
                else:
                    parts.append(ChangeFeedPartition(
                        "coarse", "delete", b, None, (), partition))
                    parts.append(ChangeFeedPartition(
                        "coarse", "insert", None, a, (), partition))
        return parts

    def read(self, part):
        if isinstance(part, ChangeFeedPartition):
            yield from _change_feed_batches(part, self.pa_schema,
                                            self.ptypes, self.format,
                                            storage=self.storage,
                                            colmap=self.colmap)
            return
        yield from _dir_batches(part.directory, part.partition,
                                self.pa_schema, self.ptypes, self.format,
                                storage=self.storage, colmap=self.colmap)

    def commit(self, end: dict) -> None:
        pass  # progress is checkpointed by the engine; nothing to GC


class VersionedTableBatchReader(DataSourceReader):
    """Executor-parallel batch read of a versioned table's current (or
    time-travel) state — one input partition per version directory."""

    def __init__(self, location: str, at_commit: str | None = None,
                 schema=None, storage=None):
        self.storage = storage if storage is not None else DEFAULT_STORAGE
        defn = read_table_meta(location, self.storage)
        log = FileTableVersions(location, self.storage)
        state = log.current_version(defn.name, at_commit=at_commit)
        fields = _schema_fields(defn.schema_ddl)
        pcols = set(defn.partition_schema.columns)
        self.ptypes = {n: t for n, t in fields if n in pcols}
        self.format = defn.format
        self.pa_schema = _arrow_schema(defn.schema_ddl, schema)
        self.colmap = _phys_to_logical(defn)
        self.bucket_columns = list(defn.bucket_columns)
        self.bucket_count = defn.bucket_count
        self.btypes = {n: t for n, t in fields if n in set(defn.bucket_columns)}
        self.bucket_sel: "int | None" = None
        if isinstance(state, SnapshotTableVersion):
            self.dirs = ([] if state.version == UNVERSIONED
                         else [(None, path_for(defn.location, state.version))])
        else:
            self.dirs = [(p, os.path.join(defn.location, p.render(), v.label))
                         for p, v in state.partition_versions.items()]

    def pushFilters(self, filters):
        """Partition pruning for ``spark.read.format("tvx")``: equality/IN
        filters on partition columns drop whole version dirs before a
        single task is planned — the metadata-level prune
        ``engine.read(partition_filter=...)`` gives the engine API, now
        reachable from the plain DataFrame reader. At 10⁵+ partitions the
        task-planning and Python-side file listing are the bottleneck a
        ``.where()`` alone cannot remove (Spark can only filter rows the
        source already read).

        Every filter is returned as still-needing-evaluation ("partially
        pushed"), so Spark re-applies the exact predicate post-scan: the
        prune only ever drops dirs whose rendered partition value cannot
        match, never takes ownership of the comparison semantics — a
        rendering mismatch could at worst read too much, never too
        little... and the renderer is the same ``escape_partition_value``
        every write and read surface shares, so values always agree."""
        from pyspark.sql.datasource import EqualTo, In

        from ..core.model import escape_partition_value as esc

        constraints: list = []
        for f in filters:
            # esc() raises for value types the partition renderer refuses
            # (float/bytes/...); like the bucket-prune arm below, an
            # unrenderable pushed value must fall back to a full read for
            # that constraint, never fail the query.
            try:
                if isinstance(f, EqualTo) and len(f.attribute) == 1 \
                        and f.attribute[0] in self.ptypes:
                    constraints.append((f.attribute[0], {esc(f.value)}))
                elif isinstance(f, In) and len(f.attribute) == 1 \
                        and f.attribute[0] in self.ptypes:
                    constraints.append(
                        (f.attribute[0], {esc(v) for v in f.value}))
            except Exception:  # noqa: BLE001 — prune is an optimization only
                continue
        if constraints:
            def keep(p) -> bool:
                if p is None:
                    return True  # snapshot dir: nothing to prune on
                vals = {cv.column: cv.value for cv in p.column_values}
                return all(vals.get(col) in allowed
                           for col, allowed in constraints
                           if col in vals)

            self.dirs = [(p, d) for p, d in self.dirs if keep(p)]
        # bucket pruning: a point lookup equality-constraining EVERY
        # bucket column reads 1/bucket_count of the files (the engine's
        # read(bucket_filter=...), reachable from the DataFrame reader).
        # Contradictory equalities match nothing anyway — any bucket
        # choice is safe since Spark re-applies the full predicate.
        if self.bucket_count and self.bucket_columns:
            eq = {f.attribute[0]: f.value for f in filters
                  if isinstance(f, EqualTo) and len(f.attribute) == 1}
            if all(c in eq for c in self.bucket_columns):
                try:
                    from ..core.sparkhash import bucket_id

                    self.bucket_sel = bucket_id(
                        [eq[c] for c in self.bucket_columns],
                        [self.btypes[c] for c in self.bucket_columns],
                        self.bucket_count)
                except Exception:  # noqa: BLE001 — the prune is purely an
                    # optimization: an unhashable type or unexpected pushed
                    # value must fall back to a full read, never fail it
                    self.bucket_sel = None
        return filters  # Spark re-applies everything post scan

    def partitions(self) -> list[InputPartition]:
        return [VersionedDirPartition(d, p, self.bucket_sel)
                for p, d in sorted(self.dirs, key=lambda x: x[1])] \
            or [VersionedDirPartition("", None)]

    def read(self, part: VersionedDirPartition):
        if not part.directory:
            return
        yield from _dir_batches(part.directory, part.partition,
                                self.pa_schema, self.ptypes, self.format,
                                storage=self.storage, colmap=self.colmap,
                                bucket=part.bucket)


def _phys_to_logical(defn) -> dict[str, str]:
    """physical file-column name → logical schema name (renamed columns:
    files always carry the ORIGINAL physical names — mirror of the engine
    read path's ``_apply_mapping``). {} when the table has no mapping."""
    return {physical: logical for logical, physical in defn.column_mapping
            if physical != logical}


# canonical implementation lives in core.ddl (pyspark-free callers need
# it too); re-exported here because this was its historical home
from ..core.ddl import schema_fields as _schema_fields  # noqa: E402,F401


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


def _partition_values(partition, ptypes: dict[str, str]) -> dict:
    """Stored partition values are in escaped dir-name form — surface them
    the way engine.read does: unescape %XX, map the Hive NULL sentinel to
    None, cast to the declared type."""
    from ..core.model import HIVE_DEFAULT_PARTITION, unescape_partition_value

    pvals: dict = {}
    if partition is not None:
        for cv in partition.column_values:
            if cv.value == HIVE_DEFAULT_PARTITION:
                pvals[cv.column] = None
            else:
                pvals[cv.column] = _cast_partition_value(
                    unescape_partition_value(cv.value),
                    ptypes.get(cv.column, "string"))
    return pvals


def _dv_positions(directory: str, storage=None) -> dict[str, set[int]]:
    """file → deleted row indices from the dir's ``_dv`` sidecar ({} if
    the dir carries no deletion vector)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    storage = storage if storage is not None else DEFAULT_STORAGE
    dv_dir = os.path.join(directory, DV_DIR)
    out: dict[str, set[int]] = {}
    if storage.is_dir(dv_dir):
        parts = []
        for name in sorted(storage.list_dir(dv_dir)):
            if name.startswith((".", "_")) or not name.endswith(".parquet"):
                continue
            with storage.open_input(os.path.join(dv_dir, name)) as f:
                # cast to one nullable schema: vector files written from a
                # live _metadata scan carry REQUIRED fields, ones written
                # from a scratch re-read carry OPTIONAL — concat_tables
                # rejects the nullability mismatch
                parts.append(pq.read_table(f, columns=["file", "idx"]).cast(
                    pa.schema([pa.field("file", pa.string()),
                               pa.field("idx", pa.int64())])))
        if parts:
            dv_tbl = pa.concat_tables(parts)
            for f, i in zip(dv_tbl.column("file").to_pylist(),
                            dv_tbl.column("idx").to_pylist()):
                out.setdefault(f, set()).add(i)
    return out


def _require_dir(d: str, storage) -> str:
    """Change-feed planning guard: a vacuumed dir means this span's diff is
    no longer reconstructible — fail with the reason instead of silently
    planning an empty before-state (which would re-emit the whole after
    dir as inserts and drop every delete). Same contract as
    ``engine.read_changes``; CDC-sidecar pairs never reach this."""
    if not storage.is_dir(d):
        raise ValueError(
            f"version dir {d} was vacuumed: streaming change-feed rows "
            "over this span are no longer reconstructible — restart from "
            "a fresh checkpoint within the vacuum retention (CDC-sidecar "
            "commits on change_data_feed tables remain exact)")
    return d


def _data_files(directory: str, storage=None) -> set[str]:
    """Data-file names of one version dir. Name-filter only: the only
    non-data entries a version dir ever holds (``_dv/``, ``_cdc/``,
    ``_SUCCESS``, ``.crc``) start with ``_`` or ``.``, and a per-entry
    ``is_dir`` probe would cost one LIST round-trip per file on S3."""
    storage = storage if storage is not None else DEFAULT_STORAGE
    return {f for f in storage.list_dir(directory)
            if not f.startswith((".", "_"))}


def _read_file(path: str, fmt: str, declared: set[str], storage=None,
               colmap: "dict[str, str] | None" = None):
    """One data file as a column-pruned Arrow table. ``colmap`` (physical →
    logical) renames mapped columns to their logical names after the read;
    pruning keeps a column present under EITHER name. Data files AND CDC
    sidecars both carry physical names (``_write_cdc_sidecars`` renames
    logical→physical before the write, same as the data path), so the
    same mapping applies to both."""
    storage = storage if storage is not None else DEFAULT_STORAGE
    keep = declared if not colmap else (
        declared | {p for p, l in colmap.items() if l in declared})
    if fmt == "orc":
        import pyarrow.orc as orc

        with storage.open_input(path) as f:
            o = orc.ORCFile(f)
            # push the column list into the stripe read, mirroring the
            # parquet branch — never decode undeclared columns
            table = o.read(columns=[n for n in o.schema.names if n in keep])
    else:
        import pyarrow.parquet as pq

        with storage.open_input(path) as f:
            present = [n for n in pq.read_schema(f).names if n in keep]
            table = pq.read_table(f, columns=present)
    if colmap:
        table = table.rename_columns(
            [colmap.get(n, n) for n in table.column_names])
    return table


def _table_to_batches(table, pa_schema, consts: dict):
    """Arrow table → RecordBatches matching ``pa_schema``: file columns
    cast, constants (partition values / _change_type) materialized as
    constant arrays, anything else typed nulls."""
    import pyarrow as pa

    n = table.num_rows
    columns = []
    for field in pa_schema:
        if field.name in table.column_names:
            columns.append(_cast_column(table.column(field.name),
                                        field.type))
        elif field.name in consts and consts[field.name] is not None:
            # O(1) Python work per constant column — never an n-element
            # Python list on the data plane
            columns.append(pa.repeat(
                pa.scalar(consts[field.name], field.type), n))
        else:
            columns.append(pa.nulls(n, field.type))
    yield from pa.table(columns, schema=pa_schema).to_batches()


def _dir_batches(directory: str, partition, pa_schema,
                 ptypes: dict[str, str], fmt: str,
                 constants: dict | None = None,
                 storage=None,
                 colmap: "dict[str, str] | None" = None,
                 bucket: "int | None" = None):
    """Yield the rows of one version directory as column-pruned
    ``pyarrow.RecordBatch``es matching ``pa_schema``.

    This is the data plane of the ``tvx`` source — batch and streaming
    readers both land here, executor-side. Rows never pass through Python
    objects: files are read as Arrow tables (only declared columns),
    partition-path values (and any extra ``constants``, e.g. the change
    feed's ``_change_type``) are materialized as constant arrays, and
    missing columns (schema evolution) become typed nulls. Rows recorded
    in the dir's deletion vector are masked out, same semantics as the
    engine read path's anti-join.
    """
    import numpy as np
    import pyarrow as pa

    storage = storage if storage is not None else DEFAULT_STORAGE
    if not storage.is_dir(directory):
        # a planned dir that vanished before the task ran was vacuumed
        # out from under the query. Silently yielding nothing here would
        # commit the micro-batch (or batch read) MINUS these rows — a
        # downstream replica diverges with no signal. Loud, like
        # engine.read_changes and the refined change-feed recheck.
        raise ValueError(
            f"version dir {directory} is missing (vacuumed between "
            "planning and execution): this span's rows are no longer "
            "readable — re-run the query, or restart streaming from a "
            "fresh checkpoint within the vacuum retention")
    consts = dict(_partition_values(partition, ptypes))
    consts.update(constants or {})
    dv_by_file = _dv_positions(directory, storage)
    declared = set(pa_schema.names)
    fnames = sorted(_data_files(directory, storage))
    if bucket is not None:
        from ..core.paths import parse_bucket_index

        # no parseable index: read it — pruning may only over-read
        fnames = [f for f in fnames
                  if parse_bucket_index(f) in (None, bucket)]
    for fname in fnames:
        table = _read_file(os.path.join(directory, fname), fmt, declared,
                           storage, colmap=colmap)
        if fname in dv_by_file:
            mask = np.ones(table.num_rows, dtype=bool)
            mask[list(dv_by_file[fname])] = False
            table = table.filter(pa.array(mask))
        yield from _table_to_batches(table, pa_schema, consts)


def _change_feed_batches(part: "ChangeFeedPartition", pa_schema,
                         ptypes: dict[str, str], fmt: str, storage=None,
                         colmap: "dict[str, str] | None" = None):
    """Executor side of the streaming change feed.

    coarse: the whole dir (vector applied) under the planned change type.
    refined: the before/after pair diffs via the deletion-vector delta —
    deletes are the before files' rows at positions newly recorded in the
    after vector; inserts are the rows of files the after dir added
    (minus any vector entries on them). O(changed positions + new files),
    no rescan diff.
    """
    storage = storage if storage is not None else DEFAULT_STORAGE
    if part.kind == "cdc":
        # exact changed rows written at commit time; always parquet, with
        # _change_type as a file column (pa_schema includes it, so
        # _dir_batches surfaces it like any declared column)
        yield from _dir_batches(part.a_dir, part.partition, pa_schema,
                                ptypes, "parquet", storage=storage,
                                colmap=colmap)
        return
    if part.kind == "coarse":
        d = part.b_dir if part.change_type == "delete" else part.a_dir
        yield from _dir_batches(d, part.partition, pa_schema,
                                ptypes, fmt,
                                constants={"_change_type": part.change_type},
                                storage=storage, colmap=colmap)
        return
    # re-check at execution: vacuum may have removed a dir between the
    # driver's planning and this task — fail with the retention reason,
    # not a raw FileNotFoundError from the first open
    _require_dir(part.b_dir, storage)
    _require_dir(part.a_dir, storage)
    declared = set(pa_schema.names)
    consts = dict(_partition_values(part.partition, ptypes))
    b_dv = _dv_positions(part.b_dir, storage)
    a_dv = _dv_positions(part.a_dir, storage)
    b_files = set(part.b_files)
    # deletes: before-file rows at newly-vectored positions.
    # resurrections: rows whose vector entries DISAPPEARED (a restore of
    # a dv-delete commit shrinks the vector) come back as inserts — the
    # file exists in both dirs (refined requires a file superset), so one
    # read serves both sides of the delta.
    for fname in sorted(b_files):
        bv, av = b_dv.get(fname, set()), a_dv.get(fname, set())
        delta = sorted(av - bv)
        back = sorted(bv - av)
        if not delta and not back:
            continue
        table = _read_file(os.path.join(part.b_dir, fname), fmt, declared,
                           storage, colmap=colmap)
        if delta:
            yield from _table_to_batches(
                table.take(delta), pa_schema,
                {**consts, "_change_type": "delete"})
        if back:
            yield from _table_to_batches(
                table.take(back), pa_schema,
                {**consts, "_change_type": "insert"})
    # inserts: files the after dir added, minus their vector entries
    for fname in sorted(_data_files(part.a_dir, storage) - b_files):
        table = _read_file(os.path.join(part.a_dir, fname), fmt, declared,
                           storage, colmap=colmap)
        masked = a_dv.get(fname)
        if masked:
            import numpy as np
            import pyarrow as pa

            mask = np.ones(table.num_rows, dtype=bool)
            mask[list(masked)] = False
            table = table.filter(pa.array(mask))
        yield from _table_to_batches(
            table, pa_schema, {**consts, "_change_type": "insert"})


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
    # partition pruning via pushFilters is gated by this flag (default
    # false in Spark 4.1); a reader that implements pushFilters FAILS
    # outright when the flag is off, so enable it wherever tvx is used
    # (runtime-settable; get_spark also sets it at build time)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
