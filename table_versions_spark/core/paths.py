"""Versioned path algebra.

Port of reference ``core/src/main/scala/com/gu/tableversions/core/VersionPaths.scala:15-51``:
a version label maps a base (partition or table) path to
``<base>/<version-label>``; the ``UNVERSIONED`` sentinel leaves the path
unchanged. ``parse_version``/``versioned_to_base_path`` recover and strip the
label from the last path segment.
"""

from __future__ import annotations

from .model import UNVERSIONED, Partition, Version


def path_for(base: str, version: Version) -> str:
    """Reference ``VersionPaths.scala:15-22``: Unversioned ⇒ base unchanged."""
    if version.is_unversioned():
        return base
    return f"{base.rstrip('/')}/{version.label}"


def resolved_versioned_path(table_location: str, partition: Partition,
                            version: Version) -> str:
    """``<tableLocation>/<partition-dirs>/<version-label>``
    (layout proven in reference ``VersionedPathMapperSpec.scala:35-57``)."""
    return path_for(partition.resolve(table_location), version)


def parse_bucket_index(filename: str) -> "int | None":
    """Bucket id from a data-file NAME per Hive's filename contract
    (``part-00003-…`` = bucket 3; append-linked files keep the substring
    inside their prefixed names). ``None`` = no parseable index. THE one
    definition of the contract — the engine's bucket-join grouping and
    point-read pruning and the tvx reader's pruning must all agree, or a
    filename-convention change silently splits their semantics.

    The trailing ``-`` is required: every stamped name (Spark's
    ``part-00003-<uuid>`` and the sink's ``part-00003-<hex>``) carries it,
    while UNBUCKETED sink names (``part-<uuid4().hex>``) start with raw hex
    whose leading digits would otherwise parse as a bogus bucket id —
    those must return None so ``_bucket_files``'s loud contract-corruption
    error fires instead of silently misassigning the file."""
    import re

    m = re.search(r"part-(\d+)-", filename)
    return int(m.group(1)) if m else None


def parse_version(path: str) -> Version:
    """Recover the version from the last path segment; ``UNVERSIONED`` if the
    segment is not a version label (reference ``VersionPaths.scala:27-40``)."""
    last = path.rstrip("/").rsplit("/", 1)[-1]
    if Version.is_version_label(last):
        return Version.parse(last)
    return UNVERSIONED


def versioned_to_base_path(path: str) -> str:
    """Strip a trailing version label if present
    (reference ``VersionPaths.scala:42-51``)."""
    stripped = path.rstrip("/")
    last = stripped.rsplit("/", 1)[-1]
    if Version.is_version_label(last):
        return stripped.rsplit("/", 1)[0]
    return stripped


# Sidecar directories inside an immutable version dir (both "_"-prefixed,
# so Spark scans and the engine's own data-file listings skip them):
DV_DIR = "_dv"    # deletion-vector positions: (file, idx) parquet
CDC_DIR = "_cdc"  # change-data-feed rows of the commit that wrote the dir
CDC_BEFORE = "_before"  # marker in CDC_DIR naming the diffed-against label


def cdc_before_label(cdc_dir: str, storage) -> str | None:
    """The version label a ``_cdc`` sidecar was diffed against, or None
    when the marker is absent/unreadable. Shared by the batch CDF reader
    (engine) and the streaming change feed (tvx source) so both agree on
    which sidecars are usable."""
    import os

    try:
        return storage.read_text(os.path.join(cdc_dir, CDC_BEFORE)).strip()
    except Exception:  # noqa: BLE001 — any miss ⇒ not usable
        return None
