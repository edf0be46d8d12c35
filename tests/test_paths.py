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


def test_parse_bucket_index_contract():
    from table_versions_spark.core.paths import parse_bucket_index

    # stamped names (Spark task files and the sink's bucketed names)
    assert parse_bucket_index("part-00003-abc123.parquet") == 3
    assert parse_bucket_index("prev-2-part-00011-uuid.c000.parquet") == 11
    # UNBUCKETED sink names are raw hex: leading digits must NOT parse as
    # a bucket id — the loud contract-corruption error depends on None
    assert parse_bucket_index("part-3f2a9c81d04e4e64.parquet") is None
    assert parse_bucket_index("part-42.parquet") is None  # no delimiter
    assert parse_bucket_index("notapart-00001-x.parquet") == 1  # substring
