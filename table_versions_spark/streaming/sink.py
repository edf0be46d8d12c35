"""Versioned tables as a DataFrame *sink* — ``df.write.format("tvx")`` and
``df.writeStream.format("tvx")``.

The write-side complement of :mod:`.source`: the reference's only write
path is the engine's ``versionedInsertInto`` equivalent
(``spark/.../VersionContext.scala:29-44``); this exposes the same
versioned-commit semantics through the standard DataFrame writer API, so a
session that only speaks ``spark.read``/``df.write`` can still produce
versioned commits (``VersionedEngine.insert`` remains the full-featured
path — constraints, schema evolution, clustering, bucketing).

Built on the Spark 4 Python Data Source API Arrow writers:

- **batch** (:class:`VersionedTableWriter`): every task writes its rows as
  parquet/ORC files *directly into the final immutable version dirs*
  (``<part>/<label>/part-*.parquet``) — uncommitted dirs are invisible to
  every reader, so no staging/rename pass is needed; the driver-side
  ``commit`` links previous files for append mode, collects footer stats,
  and appends ONE commit record — the same atomic-publish point the engine
  uses. ``mode("overwrite")`` = replace-touched-partitions (Hive-insert
  semantics); ``mode("append")`` = accumulate (previous version's files
  hardlinked, no rewrite).
- **streaming** (:class:`VersionedTableStreamWriter`): tasks stage files
  under ``_staging/`` (they don't know the epoch yet); ``commit(messages,
  batchId)`` moves them into a fresh version dir and commits with the
  idempotence token ``txn=(txnApp, batchId)`` — a batch replayed after a
  crash between the log commit and the streaming checkpoint is SKIPPED,
  upgrading foreachBatch-style at-least-once to exactly-once (Delta's
  ``txnAppId``/``txnVersion`` recipe, same as ``VersionedEngine.insert``).

Scale notes: rows never pass through Python objects (Arrow in, Arrow out;
partition grouping is an Arrow ``group_by`` + per-group ``take``); each
task writes one file per partition it actually holds (pair with a
``repartition(*pcols)`` upstream to avoid the small-files spiral, exactly
as ``engine.insert(distribute=True)`` does); driver-side work is metadata
only (links, footer reads, one log append). Every filesystem touch goes
through the ``Storage`` backend selected by ``.option("storage", ...)``
(default local POSIX), so the sink works on object stores too.

Capability parity with ``engine.insert`` (no SparkSession on this path —
see :mod:`.arrowexpr` for how each is kept byte-identical):

- column-mapped tables: incoming logical names are renamed to the
  on-disk physical names per batch (pure rename; mapped columns are
  never partition/constraint/derivation columns, ``rename_column``
  guards that);
- CHECK constraints: evaluated per task over the Arrow batches with
  DuckDB, after driver-side validation that the expression sits in the
  dialect-neutral grammar where DuckDB and Spark SQL agree — a
  violation fails the job before any commit (written files are swept by
  ``abort``); out-of-grammar constraints refuse at construction;
- generated partition columns: the catalogue forms (``to_date``, date
  parts, ``substring``, integer arithmetic, identity) are compiled to
  Arrow kernels at construction; out-of-catalogue derivations refuse.

- bucketed tables: each task's batch is split by the row's bucket id —
  the SAME Murmur3 ``pmod(hash(cols), n)`` HashPartitioning assigns at
  ``engine.insert``'s ``repartition(n, cols)`` (vectorized over the
  Arrow buffers, ``core/sparkhash.bucket_ids_arrow``) — and the id is
  stamped into the part-file name (``part-00003-…``), the same Hive
  filename contract the engine's readers parse
  (``engine._bucket_files`` / ``_bucket_filter_files``). The sink can't
  impose Spark-side clustering (Python DataSources have no
  requiredDistribution), so it may produce several files per bucket per
  commit — bucket-pruned reads and ``bucketed_join`` group files by the
  parsed index, not by count, so both stay correct; co-bucketed join
  branch sizes just track the writer's upstream partitioning.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from ..core.log import (
    ConstraintViolationError,
    FileTableVersions,
    TxnAlreadyCommitted,
    read_table_meta,
)
from ..core.model import (
    UNVERSIONED,
    AddPartitionVersion,
    AddTableVersion,
    Partition,
    SnapshotTableVersion,
    TableDefinition,
    TableUpdate,
    TableUpdateMetadata,
    Version,
    escape_partition_value,
)
from ..core.paths import path_for
from ..core.storage import DEFAULT_STORAGE

# transient per-row bucket-id column, appended by _apply_write_plan and
# consumed (grouped on, then dropped) by _write_task_files — never written
BUCKET_COL = "__tvx_bucket"


@dataclass
class TvxCommitMessage(WriterCommitMessage):
    # [(partition render or None for snapshot, dir written, rows)]
    written: "list[tuple[str | None, str, int]]"
    # streaming only: the task's private staging root (removed after the
    # epoch commit moves its files out)
    root: "str | None" = None


@dataclass
class WritePlan:
    """Per-write capability plan, compiled driver-side by
    :func:`_write_plan` and shipped (plain data, pickle-safe) to the
    executors where :func:`_apply_write_plan` runs it per task."""
    rename: tuple = ()        # ((logical, physical), ...)
    constraints: tuple = ()   # validated CHECK expressions (logical names)
    derivations: tuple = ()   # ((pcol, arrowexpr spec), ...) — omitted only
    bucket: tuple = ()        # (bucket_count, ((col, spark_type), ...))


def _write_plan(defn: TableDefinition, schema) -> WritePlan:
    refuse = (f"write to {defn.name.fully_qualified_name} through "
              "VersionedEngine.insert")
    if schema is None and (defn.check_constraints
                           or defn.partition_derivations
                           or defn.bucket_count):
        raise ValueError(
            f"{refuse}: no write schema available to validate "
            "constraints/derivations/bucketing against")
    bucket: tuple = ()
    if defn.bucket_count:
        # the sink can't make Spark cluster rows into bucket_count tasks
        # (Python DataSources have no requiredDistribution), so instead of
        # the engine's task-index-is-bucket-id contract it SPLITS each
        # task's batch by the row's bucket id (same Murmur3, vectorized)
        # and stamps the id into the part-file name — multiple files per
        # bucket, which _bucket_files/_bucket_filter_files already group by
        # the parsed part index (engine.py:2465,2490)
        from ..core.sparkhash import canonical_bucket_type
        from .source import _schema_fields as _sf

        by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
        declared_types = dict(_sf(defn.schema_ddl)) if defn.schema_ddl \
            else {}
        spec = []
        for c in defn.bucket_columns:
            t = by_name.get(c)
            if t is None:
                raise ValueError(
                    f"{refuse}: bucket column {c} missing from the write "
                    f"schema {sorted(by_name)}")
            t_class = canonical_bucket_type(t)
            if t_class is None:
                raise ValueError(
                    f"{refuse}: bucket column {c} has type {t}, which the "
                    "sink cannot hash with Spark HashPartitioning parity "
                    "(supported: int/bigint/boolean/string/date)")
            # Murmur3 hashes int and bigint DIFFERENTLY (4- vs 8-byte
            # input), so a type-drifted frame (int32 source against a
            # declared bigint column) would place rows in buckets the
            # read side's declared-type hash never probes — silent empty
            # point lookups. Refuse the drift at declaration time.
            # Compare hash CLASSES, not raw spellings: a table declared
            # 'id long' or 'c varchar(10)' must accept a frame arriving
            # as bigint / string (aliases hash identically).
            want = declared_types.get(c)
            if want is not None and canonical_bucket_type(want) != t_class:
                raise ValueError(
                    f"{refuse}: bucket column {c} arrives as {t} but is "
                    f"declared {want}; bucket hashing is type-sensitive, "
                    "so the write frame must carry the declared type "
                    f"(cast {c} before writing)")
            spec.append((c, t))
        bucket = (defn.bucket_count, tuple(spec))
    derivations = []
    if schema is not None:
        from .arrowexpr import compile_derivation

        incoming_names = {n.lower() for n in schema.fieldNames()}
        for col, expr in defn.partition_derivations:
            if col.lower() in incoming_names:
                continue  # writer supplied the derived column itself
            spec = compile_derivation(expr, schema)
            if isinstance(spec, str):
                raise ValueError(
                    f"{refuse}: partition derivation {col}={expr!r} is "
                    f"outside the sink's Arrow catalogue ({spec})")
            derivations.append((col, spec))
    from .source import _schema_fields

    declared_fields = (_schema_fields(defn.schema_ddl)
                       if defn.schema_ddl else [])
    constraints = ()
    if defn.check_constraints:
        from .arrowexpr import validate_constraint

        declared_cols = [n for n, _ in declared_fields]
        for expr in defn.check_constraints:
            reason = validate_constraint(expr, declared_cols)
            if reason is not None:
                raise ValueError(
                    f"{refuse}: CHECK constraint {expr!r} is outside the "
                    f"dialect-neutral grammar ({reason}), so the sink "
                    "cannot evaluate it faithfully without Spark")
        constraints = tuple(defn.check_constraints)
    if declared_fields and schema is not None:
        declared = {n for n, _ in declared_fields}
        derivable = {col for col, _ in derivations}
        incoming = set(schema.fieldNames())
        if not (incoming <= declared and (declared - derivable) <= incoming):
            raise ValueError(
                f"write schema {sorted(incoming)} must match declared "
                f"schema {sorted(declared)}"
                + (f" (less any derived partition columns "
                   f"{sorted(derivable)})" if derivable else "")
                + " (schema evolution goes through "
                "VersionedEngine.insert(evolve_schema=True))")
    if schema is not None:
        # partition values render from Python objects
        # (core.model.render_partition_value inside escape_partition_value);
        # float/double/binary have no str() that matches Java's
        # Double.toString / Spark's binary rendering, so a sink write
        # would split one logical partition across two directory names.
        # A derived partition column's effective type is its spec's
        # output: only the bare-column ('identity') form can carry a
        # non-renderable source type through — every other catalogue form
        # yields date/int/string.
        by_name = {f.name: f.dataType.typeName() for f in schema.fields}
        eff = {f.name.lower(): f.dataType.typeName()
               for f in schema.fields}
        for col, spec in derivations:
            if spec[0] == "identity":
                eff[col.lower()] = by_name[spec[1]]
        for c in defn.partition_schema.columns:
            if eff.get(c.lower()) in ("float", "double", "binary"):
                raise ValueError(
                    f"{refuse}: partition column {c} of type "
                    f"{eff[c.lower()]} cannot be rendered with "
                    "Spark directory-name parity by the sink")
    plan = WritePlan(rename=tuple(defn.column_mapping),
                     constraints=constraints,
                     derivations=tuple(derivations),
                     bucket=bucket)
    if constraints and schema is not None:
        # construction-time faithfulness probe: run the EXACT executor path
        # (derive, then DuckDB) over a ONE-ROW batch of representative
        # values for the incoming types. Binder errors (e.g. a
        # varchar-vs-integer comparison Spark would silently coerce but
        # DuckDB refuses) AND vectorized-cast errors that only fire with
        # rows present (e.g. ts >= '2020-01': Spark casts the partial
        # timestamp literal, DuckDB's conversion raises) become a loud
        # refusal here, not a per-task crash on the first real write.
        # The probe row may legitimately VIOLATE the constraints — only
        # evaluation errors refuse, violations() output is discarded.
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from .arrowexpr import violations

        arrow_schema = to_arrow_schema(schema)
        try:
            probe = pa.Table.from_pylist(
                [{f.name: _probe_value(f.type) for f in arrow_schema}],
                schema=arrow_schema)
            probe = _apply_write_plan(
                probe, WritePlan(derivations=tuple(derivations)))
            violations(probe, constraints)
        except Exception as e:
            raise ValueError(
                f"{refuse}: CHECK constraints {constraints} cannot be "
                f"evaluated faithfully by the sink's DuckDB probe ({e})")
    return plan


def _probe_value(t):
    """A representative non-null Python value for one Arrow type — the
    construction-time constraint probe needs a row PRESENT so DuckDB
    executes its vectorized literal casts, not just its binder."""
    import datetime
    import decimal

    import pyarrow.types as pat

    if pat.is_boolean(t):
        return True
    if pat.is_integer(t):
        return 1
    if pat.is_floating(t):
        return 1.0
    if pat.is_decimal(t):
        return decimal.Decimal(1).scaleb(-t.scale)
    if pat.is_timestamp(t):
        return datetime.datetime(2000, 1, 1)
    if pat.is_date(t):
        return datetime.date(2000, 1, 1)
    if pat.is_string(t) or pat.is_large_string(t):
        return "a"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return b"a"
    return None  # nested/other: constraints can't reference these anyway


def _apply_write_plan(t, plan: "WritePlan | None"):
    """Executor side: derive omitted partition columns, probe CHECK
    constraints (violation iff FALSE; NULL passes — the engine's
    semantics), then rename logical→physical for column-mapped tables.
    All Arrow-vectorized; a violation aborts the job before commit."""
    if plan is None:
        return t
    if plan.derivations:
        from .arrowexpr import apply_derivation

        for col, spec in plan.derivations:
            if col not in t.column_names:
                t = t.append_column(col,
                                    apply_derivation(spec, t.column(spec[1])))
    if plan.constraints:
        from .arrowexpr import violations

        try:
            bad = violations(t, plan.constraints)
        except Exception as e:
            # the construction-time probe runs under UTC (the plan worker
            # has no SparkSession, so the session timezone is unknowable
            # there); a timezone-dependent evaluation failure can only
            # surface here — make it actionable, not a bare DuckDB error
            raise ValueError(
                f"CHECK constraints {plan.constraints} could not be "
                f"evaluated faithfully over this batch (its timestamp "
                f"timezone is the Spark session's, which the "
                f"construction-time probe cannot see): {e} — write "
                "through VersionedEngine.insert") from e
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint {plan.constraints} rejected "
                f"row {bad[0]}")
    if plan.bucket:
        # before rename: the bucket spec names logical columns. One
        # vectorized pass (core/sparkhash.bucket_ids_arrow — numpy over
        # the Arrow buffers, zero per-row Python) stamps each row's
        # bucket id; _write_task_files groups on it and writes the id
        # into the part-file name (Hive's filename contract).
        import pyarrow as pa

        from ..core.sparkhash import bucket_ids_arrow

        count, spec = plan.bucket
        ids = bucket_ids_arrow(t, [c for c, _ in spec],
                               [ty for _, ty in spec], count)
        t = t.append_column(BUCKET_COL, pa.array(ids, type=pa.int32()))
    if plan.rename:
        to_phys = dict(plan.rename)
        t = t.rename_columns([to_phys.get(c, c) for c in t.column_names])
    return t


def _write_task_files(iterator, pcols: list[str], fmt: str,
                      out_root: str, subdir: str = "",
                      storage=None, plan: "WritePlan | None" = None) -> list:
    """Executor side: split the task's Arrow batches by partition value and
    write one file per partition under ``out_root[/render][/subdir]``.
    Grouping is Arrow-native (``group_by`` on the partition columns, then
    one ``take`` per group): per-ROW work never enters Python — only the
    per-GROUP distinct keys do (O(#partitions in the task), tiny).
    Returns ``[(render|None, dir, rows)]``."""
    import numpy as np
    import pyarrow as pa

    storage = storage if storage is not None else DEFAULT_STORAGE
    batches = list(iterator)
    written: list = []
    if not batches:
        return written
    t = pa.Table.from_batches(batches)
    if t.num_rows == 0:
        return written
    t = _apply_write_plan(t, plan)
    bucketed = plan is not None and bool(plan.bucket)
    gcols = list(pcols) + ([BUCKET_COL] if bucketed else [])
    if not gcols:
        groups = [(None, None, t)]
    else:
        key_tbl = t.select(gcols).append_column(
            "__tvx_idx", pa.array(np.arange(t.num_rows), type=pa.int64()))
        grouped = key_tbl.group_by(gcols).aggregate([("__tvx_idx", "list")])
        idx_col = grouped.column("__tvx_idx_list").combine_chunks()
        keys = [grouped.column(c).to_pylist() for c in pcols]  # O(#groups)
        bids = (grouped.column(BUCKET_COL).to_pylist() if bucketed
                else [None] * grouped.num_rows)
        groups = [
            # escape_partition_value renders with Spark's
            # getPartitionPathString parity (booleans lowercase,
            # timestamps Spark-formatted, ''/None → default partition)
            # before Hive-escaping — matching engine.insert's partitionBy
            # dirs exactly (float/binary are refused at construction)
            ("/".join(f"{c}={escape_partition_value(k[gi])}"
                      for c, k in zip(pcols, keys)) or None,
             bids[gi],
             t.take(idx_col[gi].values))
            for gi in range(grouped.num_rows)]
    for render, bid, tbl in groups:
        drop = [c for c in (*pcols, BUCKET_COL) if c in tbl.column_names]
        if drop:  # partition values live in the dir name, as partitionBy does
            tbl = tbl.drop_columns(drop)
        d = (os.path.join(out_root, render, subdir) if render
             else out_root)
        storage.makedirs(d)
        ext = "orc" if fmt == "orc" else "parquet"
        # bucketed: the bucket id rides the part index (Hive's filename
        # contract), parsed back by engine._bucket_files and
        # _bucket_filter_files — several files per bucket are fine
        stem = (f"part-{bid:05d}-{uuid.uuid4().hex}" if bid is not None
                else f"part-{uuid.uuid4().hex}")
        path = os.path.join(d, f"{stem}.{ext}")
        with storage.open_output(path) as f:
            if fmt == "orc":
                import pyarrow.orc as orc

                orc.write_table(tbl, f)
            else:
                import pyarrow.parquet as pq

                pq.write_table(tbl, f)
        written.append((render, d, tbl.num_rows))
    return written


def _commit_versioned_write(location: str, version: Version,
                            renders, append: bool,
                            user_id: str, message: str,
                            txn: "tuple[str, int] | None" = None,
                            storage=None) -> None:
    """Driver side: link previous files for append (deletion vectors ride
    along — the linked files still hold any dv-masked rows), collect
    footer stats (dv-adjusted), append ONE commit record — atomic at the
    commit-file write."""
    from ..engine import (
        _carry_dv_sidecar,
        _collect_version_stats,
        _dv_row_count,
        _link_data_files,
    )

    storage = storage if storage is not None else DEFAULT_STORAGE
    defn = read_table_meta(location, storage)
    log = FileTableVersions(location, storage)
    # append links the previous version's files: capture the conflict
    # baseline (head fold) BEFORE reading the link source, exactly as
    # engine._insert does — a concurrent append landing in between then
    # fails the commit precondition instead of having its rows silently
    # dropped by the stale link
    read_fold = log.head_fold(defn.name) if append else None
    prev = log.current_version(defn.name)

    def _stats_payload(vdir: str):
        # parquet-footer stats only — the engine's insert has the same
        # guard (an ORC dir would yield a truthy rows=0 payload, making
        # table_stats() report zero rows WITHOUT listing the dir as
        # 'missing', breaking its exactness contract)
        if defn.format != "parquet":
            return None
        payload = _collect_version_stats(vdir, storage,
                                         bloom_columns=defn.bloom_columns)
        if payload:
            from ..core.paths import DV_DIR

            dv = os.path.join(vdir, DV_DIR)
            if storage.exists(dv):
                payload["rows"] = max(
                    payload["rows"] - _dv_row_count(dv, storage), 0)
        return payload

    ops: list = []
    stats: dict = {}
    if defn.is_snapshot:
        vdir = path_for(location, version)
        storage.makedirs(vdir)
        if append and isinstance(prev, SnapshotTableVersion) \
                and prev.version != UNVERSIONED:
            prev_dir = path_for(location, prev.version)
            _link_data_files(prev_dir, vdir, storage)
            _carry_dv_sidecar(prev_dir, vdir, storage)
        ops.append(AddTableVersion(version))
        payload = _stats_payload(vdir)
        if payload:
            stats[version.label] = payload
    else:
        prev_pv = getattr(prev, "partition_versions", {})
        for render in sorted(r for r in renders if r is not None):
            part = Partition.parse(render)
            vdir = os.path.join(location, render, version.label)
            storage.makedirs(vdir)
            if append and part in prev_pv:
                prev_dir = os.path.join(location, render,
                                        prev_pv[part].label)
                _link_data_files(prev_dir, vdir, storage)
                _carry_dv_sidecar(prev_dir, vdir, storage)
            ops.append(AddPartitionVersion(part, version))
            payload = _stats_payload(vdir)
            if payload:
                stats[os.path.join(render, version.label)] = payload
    if not ops:
        return
    precondition = None
    if read_fold is not None:
        # the engine's OCC precondition, verbatim — one implementation of
        # the conflict semantics for both writers
        from ..engine import VersionedEngine

        touched = (None if defn.is_snapshot else
                   {op.partition for op in ops
                    if isinstance(op, AddPartitionVersion)})
        precondition = VersionedEngine._conflict_precondition(
            defn, read_fold, touched)
    if txn is not None:
        # same commit-time idempotence recheck as engine._insert: a
        # racing duplicate epoch (zombie driver + restarted query) must
        # skip inside the CAS loop, not double-commit
        from ..engine import _txn_recheck_precondition

        precondition = _txn_recheck_precondition(txn, precondition)
    try:
        log.commit(defn.name,
                   TableUpdate(TableUpdateMetadata.create(user_id, message,
                                                          txn=txn),
                               tuple(ops), stats=stats or None),
                   precondition=precondition)
    except TxnAlreadyCommitted:
        return  # the racing writer's commit IS this epoch: nothing to do


def _txn_high_water(location: str, app: str,
                    storage=None) -> "int | None":
    """Highest txn_version committed for ``app`` (None = never) —
    checkpoint-resumed, so a long-lived stream's per-epoch probe reads
    O(commits since checkpoint), not the whole log."""
    got = FileTableVersions(location, storage).txn_high_water(app)
    return got[0] if got is not None else None


class VersionedTableWriter(DataSourceArrowWriter):
    """Batch face: one versioned commit per ``df.write.format("tvx")``."""

    def __init__(self, location: str, overwrite: bool, schema=None,
                 storage=None):
        self.storage = storage if storage is not None else DEFAULT_STORAGE
        defn = read_table_meta(location, self.storage)
        self.plan = _write_plan(defn, schema)
        self.location = location
        self.pcols = list(defn.partition_schema.columns)
        self.format = defn.format
        self.overwrite = overwrite
        self.version = Version.generate()

    def write(self, iterator):
        # tasks write straight into the final (still-uncommitted, hence
        # invisible) version dirs: <location>/<render>/<label>/part-*.ext —
        # task file names are uuid-unique, so concurrent tasks touching the
        # same partition never collide and no staging/rename pass exists
        if not self.pcols:
            written = _write_task_files(iterator, self.pcols, self.format,
                                        path_for(self.location, self.version),
                                        storage=self.storage, plan=self.plan)
        else:
            written = _write_task_files(iterator, self.pcols, self.format,
                                        self.location,
                                        subdir=self.version.label,
                                        storage=self.storage, plan=self.plan)
        return TvxCommitMessage(written=written)

    def commit(self, messages):
        renders = set()
        for m in messages:
            if m is not None:
                renders.update(r for r, _, _ in m.written)
        mode = "overwrite" if self.overwrite else "append"
        _commit_versioned_write(
            self.location, self.version,
            renders if self.pcols else [None],
            append=not self.overwrite,
            user_id="tvx-writer", message=f"tvx batch write ({mode})",
            storage=self.storage)

    def abort(self, messages):
        for m in messages or []:
            if m is None:
                continue
            for _, d, _ in m.written:
                self.storage.remove_tree(d)


class VersionedTableStreamWriter(DataSourceStreamArrowWriter):
    """Streaming face: one versioned commit per micro-batch, exactly-once
    via ``txn=(txnApp, batchId)``."""

    def __init__(self, location: str, overwrite: bool, txn_app: str,
                 schema=None, storage=None):
        self.storage = storage if storage is not None else DEFAULT_STORAGE
        defn = read_table_meta(location, self.storage)
        self.plan = _write_plan(defn, schema)
        self.location = location
        self.pcols = list(defn.partition_schema.columns)
        self.format = defn.format
        self.overwrite = overwrite
        self.txn_app = txn_app
        self.staging_root = os.path.join(location, "_staging")

    def write(self, iterator):
        # the task doesn't know the epoch: stage under a task-unique dir,
        # commit() moves the files into the epoch's version dir
        task_root = os.path.join(self.staging_root, uuid.uuid4().hex)
        return TvxCommitMessage(
            written=_write_task_files(iterator, self.pcols, self.format,
                                      task_root, storage=self.storage,
                                      plan=self.plan),
            root=task_root)

    def commit(self, messages, batchId: int):
        staged: dict = {}
        roots = []
        for m in messages:
            if m is not None:
                if m.root:
                    roots.append(m.root)
                for render, d, rows in m.written:
                    staged.setdefault(render, []).append(d)
        try:
            high = _txn_high_water(self.location, self.txn_app,
                                   self.storage)
            if high is not None:
                if batchId < high:
                    # exactly-once replay only ever re-delivers the LATEST
                    # epoch (batchId == high); anything lower means the
                    # query restarted with a FRESH checkpoint (batchId
                    # reset to 0) under a txnApp that already recorded
                    # later epochs — silently skipping would drop every
                    # batch, so fail loudly instead
                    raise ValueError(
                        f"txnApp {self.txn_app!r} already committed epoch "
                        f"{high} but this query submitted epoch {batchId}; "
                        "a new checkpoint location needs a new txnApp "
                        "option (or reuse the old checkpoint)")
                if batchId == high:
                    return  # replayed epoch: in the log, drop the stage
            if not staged:
                return
            version = Version.generate()
            # stage→final moves are independent per-file metadata ops
            # (rename locally, copy+delete on object stores): run them on
            # the publish thread pool so an epoch touching many partitions
            # costs wall-clock of round trips/16, not their sum
            from ..engine import _parallel_publish

            moves = []
            for render, dirs in staged.items():
                final = (path_for(self.location, version) if render is None
                         else os.path.join(self.location, render,
                                           version.label))
                self.storage.makedirs(final)
                # a bucketed task reports one `written` entry PER BUCKET,
                # all sharing its task dir — dedupe or the same file is
                # moved twice (the second move finds it gone)
                for d in dict.fromkeys(dirs):
                    moves.extend((os.path.join(d, f),
                                  os.path.join(final, f))
                                 for f in self.storage.list_dir(d))
            _parallel_publish(lambda m: self.storage.move_file(*m), moves)
            _commit_versioned_write(
                self.location, version, list(staged),
                append=not self.overwrite,
                user_id="tvx-stream-writer",
                message=f"tvx stream epoch {batchId}",
                txn=(self.txn_app, batchId), storage=self.storage)
        finally:
            for root in roots:
                self.storage.remove_tree(root)

    def abort(self, messages, batchId: int):
        for m in messages or []:
            if m is None:
                continue
            if m.root:
                self.storage.remove_tree(m.root)
            else:
                for _, d, _ in m.written:
                    self.storage.remove_tree(d)
