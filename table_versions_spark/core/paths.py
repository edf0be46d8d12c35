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
