"""Spark-catalog sync: make plain ``spark.table()`` see versioned data.

Port of the reference's metastore layer (§2.C): the reference keeps a
Hive/Glue metastore's partition LOCATIONs pointed at versioned directories so
vanilla reads resolve current versions
(``spark/src/main/scala/com/gu/tableversions/spark/SparkHiveMetastore.scala:45-99``,
``glue/src/main/scala/com/gu/tableversions/glue/GlueMetastore.scala:78-155``).
This engine doesn't need a metastore — ``VersionedEngine.read`` resolves the
log directly — but syncing one buys interop: any SQL tool sharing the
SparkSession (or a Hive metastore, same statements) reads current versions
with zero knowledge of this library.

Same three-step behavior as the reference's ``VersionedMetastore.commit``:
read actual catalog state back (``SHOW PARTITIONS`` + ``DESCRIBE FORMATTED``
— ``SparkHiveMetastore.scala:114-157``), diff against the log-derived target
(``core/.../Metastore.scala:56-84`` = our ``compute_changes``), apply one
``ALTER TABLE`` per op (``SparkHiveMetastore.scala:45-99``). The per-op apply
loop is non-atomic mid-crash — the same caveat the reference carries; re-run
``sync_catalog`` to converge (every op is idempotent).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from .core.log import FileTableVersions
from .core.metastore import (
    AddPartition,
    RemovePartitionOp,
    UpdatePartitionVersion,
    UpdateTableVersion,
    compute_changes,
)
from .core.model import (
    UNVERSIONED,
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
    Version,
)
from .core.paths import path_for, resolved_versioned_path

from .core.model import unescape_partition_value  # noqa: F401  (re-export)


def _partition_expr(partition: Partition) -> str:
    """``(d='2019-01-31', h='0')`` — reference ``SparkHiveMetastore.scala:163-171``.

    Backslashes are escaped BEFORE quotes: a value ending in ``\\`` would
    otherwise render as ``'...\\'`` and swallow the closing quote."""
    parts = []
    for cv in partition.column_values:
        raw = (unescape_partition_value(cv.value)
               .replace("\\", "\\\\").replace("'", "\\'"))
        parts.append(f"{cv.column}='{raw}'")
    return "(" + ", ".join(parts) + ")"


def _strip_scheme(location: str) -> str:
    return re.sub(r"^file:", "", location)


def catalog_current_version(spark: SparkSession, catalog_table: str,
                            defn: TableDefinition):
    """Read the catalog's actual state back as a TableVersion (port of
    ``SparkHiveMetastore.currentVersion``, ``SparkHiveMetastore.scala:114-157``):
    partition/table locations are parsed for their trailing version label;
    an unversioned location maps to UNVERSIONED."""
    def version_of(location: str) -> Version:
        label = _strip_scheme(location).rstrip("/").rsplit("/", 1)[-1]
        try:
            return Version.parse(label)
        except ValueError:
            return UNVERSIONED

    if defn.is_snapshot:
        row = (spark.sql(f"DESCRIBE FORMATTED {catalog_table}")
               .where("col_name = 'Location'").select("data_type").first())
        return SnapshotTableVersion(version_of(row[0]) if row else UNVERSIONED)
    # Hive lowercases partition column names on the way in — read-back
    # renders must be re-cased to the DECLARED names or the diff against
    # the log state emits a spurious Add('Day=x') + Remove('day=x') pair
    # whose DROP deletes the live catalog partition every other sync
    canon = {c.lower(): c for c in defn.partition_schema.columns}

    def recase(part: Partition) -> Partition:
        from .core.model import ColumnValue

        return Partition(tuple(
            ColumnValue(canon.get(cv.column.lower(), cv.column), cv.value)
            for cv in part.column_values))

    bulk = _bulk_partition_versions(spark, catalog_table, defn)
    if bulk is not None:
        return PartitionedTableVersion(
            {recase(p): v for p, v in bulk.items()})
    mapping = {}
    for prow in spark.sql(f"SHOW PARTITIONS {catalog_table}").collect():
        part = recase(Partition.parse(prow[0]))
        loc = (spark.sql(f"DESCRIBE FORMATTED {catalog_table} "
                         f"PARTITION {_partition_expr(part)}")
               .where("col_name = 'Location'").select("data_type").first())
        mapping[part] = version_of(loc[0]) if loc else UNVERSIONED
    return PartitionedTableVersion(mapping)


class PartitionKeyMismatch(ValueError):
    """The catalog entry's partition keys disagree with the declared
    partition schema — sync cannot converge; recreate the catalog entry
    (or pass a different ``catalog_table``)."""


def _bulk_partition_versions(spark: SparkSession, catalog_table: str,
                             defn: TableDefinition) -> "dict | None":
    """All catalog partitions' (Partition, Version) in ONE metastore call
    via the JVM SessionCatalog — the SHOW PARTITIONS + one DESCRIBE per
    partition fallback is an N+1 round-trip pattern (minutes of wall
    clock on a 10k-partition table, even for a no-op sync). Returns None
    when the py4j surface is unavailable (non-session catalogs, API
    drift) — callers fall back to the per-partition loop.

    Raises :class:`PartitionKeyMismatch` (not ``None``-fallback) when the
    catalog entry carries a different partition-key arity than ``defn``
    declares: reading only the declared subset of the spec would collapse
    distinct catalog partitions onto one key and drive the diff into
    wrong-arity ALTER statements with no diagnostic — the same defect
    class ``catalog_cloud._partition_of`` rejects loudly."""
    from .core.model import escape_partition_value
    from .core.paths import parse_version

    try:
        parts = catalog_table.split(".")
        if len(parts) == 1:
            db = spark.catalog.currentDatabase()
            tbl = parts[0]
        elif len(parts) == 2:
            db, tbl = parts
        else:
            return None  # catalog-qualified: session-catalog API only
        jvm = spark._jvm
        ident = jvm.org.apache.spark.sql.catalyst.TableIdentifier(
            tbl, jvm.scala.Some(db))
        jparts = (spark._jsparkSession.sessionState().catalog()
                  .listPartitions(ident, jvm.scala.Option.empty()))
        cols = list(defn.partition_schema.columns)
        out = {}
        it = jparts.iterator()
        while it.hasNext():
            p = it.next()
            spec = p.spec()  # raw (unescaped) values, keyed by column
            if spec.size() != len(cols):
                raise PartitionKeyMismatch(
                    f"{catalog_table}: catalog partition spec has "
                    f"{spec.size()} key(s) but the table declares "
                    f"{len(cols)} partition column(s) {cols} — the "
                    "catalog entry was created with different partition "
                    "keys")
            render = []
            for c in cols:
                opt = spec.get(c)
                if opt.isEmpty():
                    opt = spec.get(c.lower())
                if opt.isEmpty():
                    return None  # unexpected spec shape: fall back
                render.append(f"{c}={escape_partition_value(opt.get())}")
            loc = p.storage().locationUri()
            v = (parse_version(str(loc.get())) if not loc.isEmpty()
                 else UNVERSIONED)
            out[Partition.parse("/".join(render))] = v
        return out
    except PartitionKeyMismatch:
        raise
    except Exception:
        return None


def _physical_schema_ddl(defn: TableDefinition) -> str:
    """The declared schema with logical names replaced by the PHYSICAL
    names data files carry (partition columns are never renameable, so
    they pass through)."""
    from .core.ddl import schema_fields
    from .core.model import TableName  # noqa: F401  (doc anchor)

    to_phys = dict(defn.column_mapping)
    return ", ".join(f"{to_phys.get(n, n)} {t}"
                     for n, t in schema_fields(defn.schema_ddl))


def _guard_no_deletion_vectors(defn: TableDefinition,
                               log: FileTableVersions,
                               state=None) -> None:
    """Refuse catalog sync while any current version dir carries a ``_dv``
    deletion-vector sidecar: a vanilla catalog reader knows nothing about
    vectors, so rows deleted via ``delete(mode='dv')`` would resurrect in
    ``spark.table()``, and rows updated via ``update(mode='dv')`` would
    appear twice (hardlinked old file plus new file). ``compact()``
    materializes vectors away; sync after that. Same refusal pattern as
    the column-mapping VIEW interlock. Pass the already-folded ``state``
    to avoid a second full log fold per sync."""
    if state is None:
        state = log.current_version(defn.name)
    if isinstance(state, SnapshotTableVersion):
        dirs = ([] if state.version == UNVERSIONED
                else [path_for(defn.location, state.version)])
    else:
        dirs = [resolved_versioned_path(defn.location, p, v)
                for p, v in state.partition_versions.items()
                if v != UNVERSIONED]
    bad = sorted(d for d in dirs
                 if log.storage.exists(os.path.join(d, "_dv")))
    if bad:
        raise ValueError(
            f"{defn.name.fully_qualified_name} has deletion vectors in "
            f"{len(bad)} current version dir(s) (e.g. {bad[0]}); a plain "
            "catalog reader would resurrect deleted rows or double-count "
            "updated ones. Run compact() to materialize vectors away, "
            "then sync.")


def sync_catalog(spark: SparkSession, defn: TableDefinition,
                 log: FileTableVersions,
                 catalog_table: str | None = None) -> int:
    """Create-if-absent and point the Spark catalog table at the current
    versioned locations. Returns the number of ALTER ops applied.

    Tables using column mapping (``rename_column``/``drop_column``) sync
    through a VIEW: a vanilla catalog reader resolves parquet columns by
    PHYSICAL name (it would surface NULLs for renamed columns and
    resurrect dropped ones), so the partition-location machinery targets
    a ``<name>__phys`` table declared with the physical schema, and
    ``<name>`` becomes ``CREATE OR REPLACE VIEW`` applying the
    logical-name projection — plain ``spark.table(name)`` then reads
    correct current-version data under the logical names, with partition
    pruning flowing through the view."""
    target = log.current_version(defn.name)
    _guard_no_deletion_vectors(defn, log, state=target)
    name = catalog_table or defn.name.fully_qualified_name
    qualifier = name.split(".")[:-1]
    if qualifier:
        # only when the table name is actually qualified — an unqualified
        # name lives in the current database, and 'interop' in
        # sync_catalog(..., catalog_table='interop') is a TABLE name, not
        # a database to create
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {'.'.join(qualifier)}")
    mapped = bool(defn.column_mapping or defn.dropped_columns)
    view_name = None
    if mapped:
        view_name, name = name, f"{name}__phys"
        schema_ddl = _physical_schema_ddl(defn)
    else:
        schema_ddl = defn.schema_ddl
    if not spark.catalog.tableExists(name):
        pcols = list(defn.partition_schema.columns)
        if defn.is_snapshot:
            # snapshot tables need a LOCATION up front; point at the base —
            # the first sync moves it to the current version dir
            spark.sql(f"CREATE TABLE {name} ({schema_ddl}) "
                      f"USING {defn.format} LOCATION '{defn.location}'")
        else:
            # LOCATION makes the catalog table EXTERNAL: a managed table's
            # DROP TABLE (user-issued, or this function's own drop on the
            # column-mapping transition below) would DELETE the versioned
            # partition data under a Hive metastore
            spark.sql(f"CREATE TABLE {name} ({schema_ddl}) "
                      f"USING {defn.format} "
                      f"PARTITIONED BY ({', '.join(pcols)}) "
                      f"LOCATION '{defn.location}'")
    elif schema_ddl:  # schema-less tables have nothing to reconcile
        # schema reconciliation: evolution widened the declared schema
        # after the catalog table was created — without ADD COLUMNS the
        # evolved columns never reach vanilla readers (and the mapped
        # view regeneration below would reference a column its __phys
        # table lacks, failing every subsequent sync)
        from .core.ddl import schema_fields

        have = {c.name.lower() for c in spark.catalog.listColumns(name)}
        missing = [(n, t) for n, t in schema_fields(schema_ddl)
                   if n.lower() not in have]
        if missing:
            spark.sql(f"ALTER TABLE {name} ADD COLUMNS ("
                      + ", ".join(f"{n} {t}" for n, t in missing) + ")")
    actual = catalog_current_version(spark, name, defn)
    ops = compute_changes(actual, target).operations
    for op in ops:  # one statement per op, as in the reference (:45-54)
        if isinstance(op, UpdateTableVersion):
            spark.sql(f"ALTER TABLE {name} SET LOCATION "
                      f"'{path_for(defn.location, op.version)}'")
        elif isinstance(op, AddPartition):
            loc = resolved_versioned_path(defn.location, op.partition,
                                          op.version)
            spark.sql(f"ALTER TABLE {name} ADD IF NOT EXISTS "
                      f"PARTITION {_partition_expr(op.partition)} "
                      f"LOCATION '{loc}'")
        elif isinstance(op, UpdatePartitionVersion):
            loc = resolved_versioned_path(defn.location, op.partition,
                                          op.version)
            spark.sql(f"ALTER TABLE {name} "
                      f"PARTITION {_partition_expr(op.partition)} "
                      f"SET LOCATION '{loc}'")
        elif isinstance(op, RemovePartitionOp):
            spark.sql(f"ALTER TABLE {name} DROP IF EXISTS "
                      f"PARTITION {_partition_expr(op.partition)}")
    # refresh so cached relation metadata picks up the new locations
    spark.catalog.refreshTable(name)
    if mapped:
        # (re)derive the logical-name view — CREATE OR REPLACE keeps it in
        # lockstep with the current mapping; a pre-mapping plain TABLE
        # under the logical name is superseded by the view
        from .core.ddl import schema_fields

        to_phys = dict(defn.column_mapping)
        cols = ", ".join(
            (f"{to_phys[n]} AS {n}" if n in to_phys else n)
            for n, _ in schema_fields(defn.schema_ddl))
        if spark.catalog.tableExists(view_name) and \
                spark.catalog.getTable(view_name).tableType != "VIEW":
            spark.sql(f"DROP TABLE {view_name}")
        spark.sql(f"CREATE OR REPLACE VIEW {view_name} AS "
                  f"SELECT {cols} FROM {name}")
    return len(ops)
