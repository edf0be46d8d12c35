"""Cloud-catalog sync: point a Glue-style data catalog at versioned locations.

Port of the reference's AWS Glue metastore behavior
(``glue/src/main/glue/GlueMetastore.scala:20-66`` read-back,
``:67-160`` one-SDK-call-per-op apply) re-expressed over a small
client protocol so the sync logic is testable without AWS:

- :class:`CloudCatalogClient` — the five catalog calls the sync needs
  (duck-typed; any object with these methods works).
- :func:`cloud_catalog_current_version` — read the catalog's actual state
  back as a ``TableVersion`` by parsing trailing version labels from
  partition/table locations (reference ``GlueMetastore.scala:20-66``).
- :func:`sync_cloud_catalog` — same three-step contract as the Hive path in
  ``catalog.py``: read back, diff against the log-derived target
  (``compute_changes``), apply one client call per op. Idempotent; re-run
  to converge after a mid-apply crash (the same caveat the reference
  carries).
- :class:`GlueCatalogClient` — the boto3 implementation of the protocol
  (lazy import; this environment does not bundle boto3).

Values vs locations: catalog partition VALUES are raw strings (NULL is the
Hive default-partition literal), while LOCATIONS carry the escaped dir-name
form — matching how Hive/Glue themselves store them.
"""

from __future__ import annotations

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
    HIVE_DEFAULT_PARTITION,
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
    Version,
    escape_partition_value,
    unescape_partition_value,
)
from .core.paths import path_for, resolved_versioned_path


class CloudCatalogClient:
    """Protocol for a Glue-style catalog. A real implementation maps these
    1:1 onto SDK calls (see :class:`GlueCatalogClient`); tests use a
    dict-backed fake. All ``values`` lists are raw (unescaped) partition
    values in partition-key order."""

    def ensure_database(self, database: str) -> None:
        """Create the database if absent (idempotent) — the Hive path's
        ``CREATE DATABASE IF NOT EXISTS`` equivalent."""
        raise NotImplementedError

    def get_table(self, database: str, name: str) -> dict:
        """-> {"location": str ('' when the catalog entry has no
        location), "partition_keys": [str, ...], "columns":
        [(name, type), ...]}; KeyError ONLY when the table is absent (a
        malformed-but-present table must not read as absent, or sync
        crash-loops on CreateTable AlreadyExists). ``columns`` may be
        omitted by minimal clients — sync then skips schema
        reconciliation (evolved columns won't reach catalog readers)."""
        raise NotImplementedError

    def create_table(self, database: str, name: str, location: str,
                     partition_keys: "list[tuple[str, str]]",
                     columns: "list[tuple[str, str]]",
                     format: str) -> None:
        """``partition_keys``/``columns`` are (name, type) pairs in
        declared order; ``format`` is the table's file format — a real
        catalog needs the full storage descriptor (columns + serde +
        input/output formats) or the synced table is an unreadable shell
        to the plain readers this module exists to serve."""
        raise NotImplementedError

    def update_table_location(self, database: str, name: str,
                              location: str) -> None:
        raise NotImplementedError

    def update_table_columns(self, database: str, name: str,
                             columns: "list[tuple[str, str]]") -> None:
        """Replace the table's non-partition column list (schema
        reconciliation after ``evolve_schema`` widened the declared
        schema). Only called when :meth:`get_table` reported ``columns``
        and some declared column is missing from it."""
        raise NotImplementedError

    def get_partitions(self, database: str, name: str) -> list[dict]:
        """-> [{"values": [str, ...], "location": str}, ...]"""
        raise NotImplementedError

    def create_partition(self, database: str, name: str, values: list[str],
                         location: str) -> None:
        raise NotImplementedError

    def update_partition(self, database: str, name: str, values: list[str],
                         location: str) -> None:
        raise NotImplementedError

    def delete_partition(self, database: str, name: str,
                         values: list[str]) -> None:
        raise NotImplementedError


def _version_of(location: str) -> Version:
    label = location.rstrip("/").rsplit("/", 1)[-1]
    try:
        return Version.parse(label)
    except ValueError:
        return UNVERSIONED


def _raw_values(partition: Partition) -> list[str]:
    """Stored (escaped) partition values → the raw values a catalog keeps."""
    out = []
    for cv in partition.column_values:
        out.append(cv.value if cv.value == HIVE_DEFAULT_PARTITION
                   else unescape_partition_value(cv.value))
    return out


def _partition_of(defn: TableDefinition, values: list[str]) -> Partition:
    cols = defn.partition_schema.columns
    if len(values) != len(cols):
        # zip would silently truncate, collapsing distinct catalog
        # partitions onto one key and driving sync into non-convergent
        # wrong-arity client calls with no diagnostic
        raise ValueError(
            f"{defn.name.fully_qualified_name}: catalog partition has "
            f"{len(values)} value(s) {values!r} but the table declares "
            f"{len(cols)} partition column(s) {list(cols)} — the catalog "
            "entry was created with different partition keys")
    return Partition.parse("/".join(
        f"{c}={v if v == HIVE_DEFAULT_PARTITION else escape_partition_value(v)}"
        for c, v in zip(cols, values)))


def cloud_catalog_current_version(client: CloudCatalogClient,
                                  defn: TableDefinition):
    """Read the catalog's actual state back (reference
    ``GlueMetastore.currentVersion``, ``GlueMetastore.scala:20-66``)."""
    if defn.is_snapshot:
        t = client.get_table(defn.name.schema, defn.name.name)
        return SnapshotTableVersion(_version_of(t["location"]))
    mapping = {}
    for p in client.get_partitions(defn.name.schema, defn.name.name):
        mapping[_partition_of(defn, p["values"])] = _version_of(p["location"])
    return PartitionedTableVersion(mapping)


def sync_cloud_catalog(client: CloudCatalogClient, defn: TableDefinition,
                       log: FileTableVersions) -> int:
    """Create-if-absent, then apply the diff between the catalog's actual
    state and the commit log's current state — one client call per op, as
    the reference does (``GlueMetastore.update``, ``GlueMetastore.scala:
    67-77``). Returns the number of ops applied.

    Column-mapped tables (renamed/dropped columns) refuse to sync — a
    plain catalog reader resolves parquet by physical name (same
    restriction as :func:`catalog.sync_catalog`)."""
    if defn.column_mapping or defn.dropped_columns:
        raise ValueError(
            f"{defn.name.fully_qualified_name} uses column mapping "
            "(renamed/dropped columns); a plain catalog reader cannot "
            "apply the logical↔physical name translation")
    from .catalog import _guard_no_deletion_vectors

    target = log.current_version(defn.name)
    _guard_no_deletion_vectors(defn, log, state=target)
    from .core.ddl import schema_fields

    db, name = defn.name.schema, defn.name.name
    fields = schema_fields(defn.schema_ddl) if defn.schema_ddl else []
    pcols = {c.lower() for c in defn.partition_schema.columns}
    declared = [(n, t) for n, t in fields if n.lower() not in pcols]
    client.ensure_database(db)
    try:
        t = client.get_table(db, name)
    except KeyError:
        types = {n.lower(): t for n, t in fields}
        client.create_table(
            db, name, defn.location,
            [(c, types.get(c.lower(), "string"))
             for c in defn.partition_schema.columns],
            declared, defn.format)
    else:
        # schema reconciliation: evolution widened the declared schema
        # after the catalog entry was created — without a column update
        # the evolved columns never reach Athena/Hive readers (the Hive
        # path's ADD COLUMNS equivalent). Skipped when the client's
        # get_table doesn't report columns.
        have = t.get("columns")
        if have is not None and declared:
            have_names = {str(n).lower() for n, _ in have}
            if any(n.lower() not in have_names for n, _ in declared):
                client.update_table_columns(db, name, declared)
    actual = cloud_catalog_current_version(client, defn)
    ops = compute_changes(actual, target).operations
    for op in ops:
        if isinstance(op, UpdateTableVersion):
            client.update_table_location(
                db, name, path_for(defn.location, op.version))
        elif isinstance(op, AddPartition):
            client.create_partition(
                db, name, _raw_values(op.partition),
                resolved_versioned_path(defn.location, op.partition,
                                        op.version))
        elif isinstance(op, UpdatePartitionVersion):
            client.update_partition(
                db, name, _raw_values(op.partition),
                resolved_versioned_path(defn.location, op.partition,
                                        op.version))
        elif isinstance(op, RemovePartitionOp):
            client.delete_partition(db, name, _raw_values(op.partition))
    return len(ops)


class GlueCatalogClient(CloudCatalogClient):
    """boto3-backed implementation (AWS Glue Data Catalog). Mirrors the
    reference's SDK usage: CreatePartition / UpdatePartition /
    DeletePartition / UpdateTable (``GlueMetastore.scala:78-160``), with
    GetPartitions paginated. boto3 is imported lazily — pass a
    preconfigured ``client=`` (e.g. in tests or custom endpoints)."""

    def __init__(self, client=None):
        if client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "GlueCatalogClient requires boto3, or pass client=") from e
            client = boto3.client("glue")
        self._glue = client
        self._sd_cache: dict = {}

    def ensure_database(self, database):
        try:
            self._glue.get_database(Name=database)
        except self._glue.exceptions.EntityNotFoundException:
            try:
                self._glue.create_database(DatabaseInput={"Name": database})
            except self._glue.exceptions.AlreadyExistsException:
                pass  # racing creator: converged either way

    def get_table(self, database, name):
        try:
            t = self._glue.get_table(DatabaseName=database, Name=name)["Table"]
        except self._glue.exceptions.EntityNotFoundException:
            raise KeyError(f"{database}.{name}") from None
        # a present-but-locationless table (crawler/other tool) must NOT
        # read as absent — sync would crash-loop on CreateTable
        # AlreadyExists; '' maps to UNVERSIONED and converges via
        # update_table_location
        sd = t.get("StorageDescriptor", {})
        return {"location": sd.get("Location", ""),
                "partition_keys": [k["Name"]
                                   for k in t.get("PartitionKeys", [])],
                "columns": [(c["Name"], c.get("Type", "string"))
                            for c in sd.get("Columns", [])]}

    # Glue UpdateTable REPLACES the whole definition: every TableInput-
    # legal field of the existing table must be carried over or it is
    # silently wiped (TableType/Parameters loss breaks Athena readers)
    _TABLE_INPUT_FIELDS = (
        "Name", "Description", "Owner", "LastAccessTime",
        "LastAnalyzedTime", "Retention", "StorageDescriptor",
        "PartitionKeys", "ViewOriginalText", "ViewExpandedText",
        "TableType", "Parameters", "TargetTable")

    # Hive storage-descriptor triples per file format: without columns,
    # serde and input/output formats the synced table is an unreadable
    # shell to Athena/EMR/Hive — the plain readers this sync serves
    _FORMATS = {
        "parquet": (
            "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe",
            "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
            "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"),
        "orc": (
            "org.apache.hadoop.hive.ql.io.orc.OrcSerde",
            "org.apache.hadoop.hive.ql.io.orc.OrcInputFormat",
            "org.apache.hadoop.hive.ql.io.orc.OrcOutputFormat"),
    }

    def _storage_descriptor(self, location, columns, format):
        serde, in_fmt, out_fmt = self._FORMATS.get(
            format, self._FORMATS["parquet"])
        return {"Location": location,
                "Columns": [{"Name": n, "Type": t} for n, t in columns],
                "SerdeInfo": {"SerializationLibrary": serde},
                "InputFormat": in_fmt,
                "OutputFormat": out_fmt}

    def create_table(self, database, name, location, partition_keys,
                     columns, format):
        sd = self._storage_descriptor(location, columns, format)
        self._sd_cache[(database, name)] = sd
        self._glue.create_table(
            DatabaseName=database,
            TableInput={"Name": name,
                        "TableType": "EXTERNAL_TABLE",
                        "Parameters": {"classification": format,
                                       "EXTERNAL": "TRUE"},
                        "StorageDescriptor": sd,
                        "PartitionKeys": [{"Name": k, "Type": t}
                                          for k, t in partition_keys]})

    def _table_sd(self, database, name):
        """The table's storage descriptor (sans Location), reused for
        partition SDs so partitions are readable too — fetched once per
        client per table, not once per partition op."""
        sd = self._sd_cache.get((database, name))
        if sd is None:
            t = self._glue.get_table(DatabaseName=database,
                                     Name=name)["Table"]
            sd = t.get("StorageDescriptor", {})
            self._sd_cache[(database, name)] = sd
        return {k: v for k, v in sd.items() if k != "Location"}

    def _update_table_sd(self, database, name, **sd_overrides):
        """UpdateTable carrying the FULL existing definition with the
        given storage-descriptor fields replaced (Glue's UpdateTable
        replaces everything it isn't handed). Invalidates the partition-SD
        cache — subsequent partition ops must see the new descriptor."""
        t = self._glue.get_table(DatabaseName=database, Name=name)["Table"]
        table_input = {k: t[k] for k in self._TABLE_INPUT_FIELDS if k in t}
        table_input["StorageDescriptor"] = dict(
            t.get("StorageDescriptor", {}), **sd_overrides)
        self._sd_cache.pop((database, name), None)
        self._glue.update_table(DatabaseName=database,
                                TableInput=table_input)

    def update_table_location(self, database, name, location):
        self._update_table_sd(database, name, Location=location)

    def update_table_columns(self, database, name, columns):
        self._update_table_sd(
            database, name,
            Columns=[{"Name": n, "Type": t} for n, t in columns])

    def get_partitions(self, database, name):
        out = []
        paginator = self._glue.get_paginator("get_partitions")
        for page in paginator.paginate(DatabaseName=database, TableName=name):
            for p in page.get("Partitions", []):
                # tolerate crawler-created partitions without an SD or
                # location: '' reads back as UNVERSIONED and converges
                # via update_partition (same hardening as get_table)
                out.append({"values": list(p["Values"]),
                            "location": p.get("StorageDescriptor",
                                              {}).get("Location", "")})
        return out

    def create_partition(self, database, name, values, location):
        self._glue.create_partition(
            DatabaseName=database, TableName=name,
            PartitionInput={"Values": values,
                            "StorageDescriptor": dict(
                                self._table_sd(database, name),
                                Location=location)})

    def update_partition(self, database, name, values, location):
        self._glue.update_partition(
            DatabaseName=database, TableName=name,
            PartitionValueList=values,
            PartitionInput={"Values": values,
                            "StorageDescriptor": dict(
                                self._table_sd(database, name),
                                Location=location)})

    def delete_partition(self, database, name, values):
        self._glue.delete_partition(DatabaseName=database, TableName=name,
                                    PartitionValues=values)
