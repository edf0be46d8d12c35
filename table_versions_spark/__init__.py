"""table_versions_spark — a PySpark-native versioned-table analytics engine.

Rebuilds the capabilities of guardian/table-versions (git-like version control
for big-data tables: immutable versioned writes, commit log, checkout/rollback,
partition-overwrite semantics) as an idiomatic PySpark library with a
Delta-style transaction log, plus a full relational query surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from .core.log import (
    ConstraintViolationError,
    UnknownCommitError,
    UnknownTableError,
)
from .core.model import (
    UNVERSIONED,
    ColumnValue,
    Partition,
    PartitionedTableVersion,
    PartitionSchema,
    SnapshotTableVersion,
    TableDefinition,
    TableName,
    Version,
)
from .engine import CommitResult, VersionedEngine
from .rollup import IncrementalRollup
from .session import get_spark

__all__ = [
    "UNVERSIONED",
    "ColumnValue",
    "CommitResult",
    "ConstraintViolationError",
    "IncrementalRollup",
    "Partition",
    "PartitionSchema",
    "PartitionedTableVersion",
    "SnapshotTableVersion",
    "TableDefinition",
    "TableName",
    "UnknownCommitError",
    "UnknownTableError",
    "Version",
    "VersionedEngine",
    "get_spark",
]

__version__ = "0.1.0"
