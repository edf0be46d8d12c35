"""Path algebra tests (ported from reference ``VersionPathsSpec.scala:12-44``)."""

from table_versions_spark.core.model import UNVERSIONED, Partition, Version
from table_versions_spark.core.paths import (
    parse_version,
    path_for,
    resolved_versioned_path,
    versioned_to_base_path,
)

LABEL = "20190313-235900.123456789-aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
V = Version.parse(LABEL)


def test_path_for_versioned():
    assert path_for("/data/t", V) == f"/data/t/{LABEL}"


def test_path_for_unversioned_unchanged():
    # reference VersionPathsSpec.scala:12-22
    assert path_for("/data/t", UNVERSIONED) == "/data/t"


def test_resolved_versioned_path():
    p = Partition.of(("date", "2019-03-13"))
    assert (resolved_versioned_path("/data/t", p, V)
            == f"/data/t/date=2019-03-13/{LABEL}")


def test_parse_version_round_trip():
    # reference VersionPathsSpec.scala:24-34
    assert parse_version(f"/data/t/date=1/{LABEL}") == V
    assert parse_version("/data/t/date=1") == UNVERSIONED


def test_versioned_to_base_path():
    # reference VersionPathsSpec.scala:36-44
    assert versioned_to_base_path(f"/data/t/date=1/{LABEL}") == "/data/t/date=1"
    assert versioned_to_base_path("/data/t/date=1") == "/data/t/date=1"
