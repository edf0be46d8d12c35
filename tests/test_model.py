"""Unit tests for the core model.

Ported test intents: reference ``core/src/test/.../VersionSpec.scala`` (label
render/parse round-trip :49-54), ``ModelSpec.scala`` (partition parse/render
:13-65), plus hypothesis property tests replacing ScalaCheck generators
(``spark/src/test/.../Generators.scala:10-29``).
"""

import uuid

import pytest
from hypothesis import given, strategies as st

from table_versions_spark.core.model import (
    UNVERSIONED,
    ColumnValue,
    Partition,
    PartitionSchema,
    TableName,
    Version,
)


class TestVersion:
    def test_generate_label_format(self):
        v = Version.generate()
        # yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>
        assert Version.is_version_label(v.label)
        ts, rest = v.label.split(".", 1)
        assert len(ts) == 15
        nanos, uid = rest.split("-", 1)
        assert len(nanos) == 9
        uuid.UUID(uid)  # parses

    def test_round_trip(self):
        v = Version.generate()
        assert Version.parse(v.label) == v

    @given(st.integers(min_value=0, max_value=4_102_444_800),
           st.integers(min_value=0, max_value=999_999_999),
           st.uuids())
    def test_round_trip_property(self, secs, nanos, uid):
        v = Version(secs, nanos, str(uid))
        assert Version.parse(v.label) == v

    def test_parse_known_label(self):
        v = Version.parse("20190313-235900.123456789-aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee")
        assert v.nanos == 123456789
        assert v.uuid == "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"

    def test_parse_invalid(self):
        for bad in ["", "not-a-version", "20190313-235900-uuid",
                    "20190313-235900.123-aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"]:
            with pytest.raises(ValueError):
                Version.parse(bad)
            assert not Version.is_version_label(bad)

    def test_unversioned_sentinel(self):
        assert UNVERSIONED.is_unversioned()
        assert not Version.generate().is_unversioned()

    def test_generated_versions_unique_and_ordered(self):
        versions = [Version.generate() for _ in range(100)]
        assert len(set(versions)) == 100
        assert sorted(versions) == versions  # time-ordered labels


class TestPartition:
    def test_render_single(self):
        p = Partition.of(("date", "2019-01-31"))
        assert p.render() == "date=2019-01-31"

    def test_render_multi(self):
        p = Partition.of(("year", "2019"), ("month", "01"), ("day", "31"))
        assert p.render() == "year=2019/month=01/day=31"

    def test_parse_round_trip(self):
        # table from reference ModelSpec.scala:32-49
        for s in ["date=2019-01-31", "year=2019/month=01/day=31",
                  "event_type=click"]:
            assert Partition.parse(s).render() == s

    def test_parse_invalid(self):
        for bad in ["", "noequals", "a=/b", "=v", "1a=x", "a-b=x"]:
            with pytest.raises(ValueError):
                Partition.parse(bad)

    def test_parse_mixed_case_column(self):
        # create_table/insert accept any Spark identifier and partitionBy
        # writes its dir verbatim — the publish-time parse must accept it
        # (a lowercase-only pattern failed AFTER the full data write)
        p = Partition.parse("eventDate=2024-01-01")
        assert p.column_values[0].column == "eventDate"

    def test_resolve(self):
        p = Partition.of(("date", "2019-01-31"))
        assert p.resolve("/data/table/") == "/data/table/date=2019-01-31"

    def test_empty_partition_rejected(self):
        with pytest.raises(ValueError):
            Partition(())

    @given(st.lists(st.tuples(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9._-]{1,12}", fullmatch=True)),
        min_size=1, max_size=4))
    def test_render_parse_property(self, pairs):
        p = Partition(tuple(ColumnValue(c, v) for c, v in pairs))
        assert Partition.parse(p.render()) == p


class TestTableName:
    def test_fqn(self):
        assert TableName("db", "t").fully_qualified_name == "db.t"
        assert TableName.parse("db.t") == TableName("db", "t")

    def test_parse_invalid(self):
        with pytest.raises(ValueError):
            TableName.parse("no_schema")


class TestPartitionSchema:
    def test_snapshot(self):
        assert PartitionSchema(()).is_snapshot
        assert not PartitionSchema(("date",)).is_snapshot
