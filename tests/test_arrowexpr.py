"""Unit tests for the sink's driver-validated expression subset —
no SparkSession needed (grammar and kernels are plain Python/Arrow)."""

import datetime as dt

import pyarrow as pa
import pytest

from table_versions_spark.streaming.arrowexpr import (
    apply_derivation,
    compile_derivation,
    validate_constraint,
    violations,
)


class FakeField:
    def __init__(self, name, type_name):
        self.name = name
        self.dataType = type("T", (), {"typeName": lambda s, _t=type_name: _t})()


class FakeSchema:
    def __init__(self, **cols):
        self.fields = [FakeField(n, t) for n, t in cols.items()]

    def fieldNames(self):
        return [f.name for f in self.fields]


class TestConstraintGrammar:
    COLS = ["id", "v", "name"]

    @pytest.mark.parametrize("expr", [
        "v >= 0",
        "v > 0 AND v < 100",
        "id * 2 <= 100 OR name = 'x'",
        "name IS NOT NULL",
        "v BETWEEN 0 AND 1",
        "name IN ('a', 'b')",
        "NOT (v < 0)",
        "name LIKE 'a%'",
        "v != 3.5e2",
    ])
    def test_accepts_dialect_neutral(self, expr):
        assert validate_constraint(expr, self.COLS) is None

    @pytest.mark.parametrize("expr,why", [
        ("length(name) > 0", "unknown identifier"),
        ("abs(v) < 1", "unknown identifier"),
        ("nope > 0", "unknown identifier"),
        ("v ; drop table t", "unsupported syntax"),
        ("", "empty"),
        ("cast(v as int) = 1", "unknown identifier"),
        # a FUNCTION sharing a column's name is the one call form the
        # identifier check alone would admit — the adjacency rule catches it
        ("v(id) > 0", "function call"),
        # literal forms where Spark and DuckDB diverge: backslash is a
        # Spark escape but literal in DuckDB; '' is concat vs escape
        (r"name <> 'a\nb'", "unsupported syntax"),
        ("name <> 'it''s'", "unsupported syntax"),
        # zero divisors: ANSI Spark raises, DuckDB yields NULL (passes)
        ("100 / v > 200", "division"),
        ("id % 2 = 0", "division"),
    ])
    def test_rejects_outside_grammar(self, expr, why):
        reason = validate_constraint(expr, self.COLS)
        assert reason is not None and why in reason

    def test_violations_false_only_null_passes(self):
        t = pa.table({"id": [1, 2, 3], "v": [1.0, None, -4.0]})
        bad = violations(t, ("v >= 0",), limit=10)
        # row 2 (NULL) passes, row 3 violates — engine._insert semantics
        assert [b["id"] for b in bad] == [3]

    def test_violations_multi_constraint(self):
        t = pa.table({"id": [1, 2], "v": [5.0, 50.0]})
        assert violations(t, ("v >= 0", "v < 10")) != []

    def test_violations_pin_session_timezone(self):
        """Spark attaches its SESSION tz to Arrow timestamp columns; the
        DuckDB probe must cast string literals in THAT zone, not the
        executor's OS zone."""
        ts = pa.array([dt.datetime(2020, 1, 1, 3, tzinfo=dt.timezone.utc)],
                      type=pa.timestamp("us", tz="America/New_York"))
        t = pa.table({"ts": ts})
        # 2020-01-01T03:00Z is 2019-12-31 22:00 in New York: with the pin
        # the row violates; evaluated in UTC (this container's OS tz) it
        # would wrongly pass
        assert violations(t, ("ts >= '2020-01-01'",)) != []


class TestDerivationCatalogue:
    def test_to_date_matches_spark_truncation(self):
        schema = FakeSchema(ts="timestamp")
        spec = compile_derivation("to_date(ts)", schema)
        assert not isinstance(spec, str)
        col = pa.chunked_array([pa.array(
            [dt.datetime(2019, 3, 13, 23, 59), None],
            type=pa.timestamp("us"))])
        out = apply_derivation(spec, col)
        assert out.to_pylist() == [dt.date(2019, 3, 13), None]

    def test_date_parts(self):
        schema = FakeSchema(ts="timestamp")
        col = pa.chunked_array([pa.array([dt.datetime(2019, 3, 13, 7)],
                                         type=pa.timestamp("us"))])
        for expr, want in [("year(ts)", 2019), ("month(ts)", 3),
                           ("dayofmonth(ts)", 13), ("hour(ts)", 7)]:
            spec = compile_derivation(expr, schema)
            assert not isinstance(spec, str), expr
            assert apply_derivation(spec, col).to_pylist() == [want]

    def test_substring_is_one_based(self):
        schema = FakeSchema(name="string")
        spec = compile_derivation("substring(name, 2, 3)", schema)
        col = pa.chunked_array([pa.array(["abcdef", None])])
        assert apply_derivation(spec, col).to_pylist() == ["bcd", None]

    def test_modulo_truncated_remainder(self):
        """Spark's % keeps the dividend's sign — so must the kernel."""
        schema = FakeSchema(id="long")
        spec = compile_derivation("id % 3", schema)
        col = pa.chunked_array([pa.array([7, -7, 6, None],
                                         type=pa.int64())])
        assert apply_derivation(spec, col).to_pylist() == [1, -1, 0, None]

    def test_case_insensitive_resolution_records_actual_name(self):
        """Spark resolves columns case-insensitively; the spec must carry
        the field's ACTUAL name or the executor's (case-sensitive) Arrow
        lookup would KeyError."""
        schema = FakeSchema(ts="timestamp")
        spec = compile_derivation("to_date(TS)", schema)
        assert not isinstance(spec, str) and spec[1] == "ts"
        col = pa.chunked_array([pa.array([dt.datetime(2020, 1, 2)],
                                         type=pa.timestamp("us"))])
        assert apply_derivation(spec, col).to_pylist() == [dt.date(2020, 1, 2)]

    def test_identity_and_arith(self):
        schema = FakeSchema(id="long")
        col = pa.chunked_array([pa.array([10], type=pa.int64())])
        assert apply_derivation(
            compile_derivation("id", schema), col).to_pylist() == [10]
        assert apply_derivation(
            compile_derivation("id + 5", schema), col).to_pylist() == [15]

    def test_arith_overflow_raises_like_ansi_spark(self):
        """int64 overflow must fail the task (ANSI Spark raises), never
        wrap into a silently wrong partition value."""
        schema = FakeSchema(id="long")
        spec = compile_derivation("id * 4", schema)
        col = pa.chunked_array([pa.array([2 ** 62], type=pa.int64())])
        with pytest.raises(pa.ArrowInvalid):
            apply_derivation(spec, col)

    @pytest.mark.parametrize("expr", [
        "date_format(ts, 'yyyy-MM')",
        "to_date(name)",          # wrong type
        "upper(name)",
        "id % 0",
        "ts + 1",                 # arithmetic over non-integral
        "missing_col",
    ])
    def test_out_of_catalogue_returns_reason(self, expr):
        schema = FakeSchema(ts="timestamp", name="string", id="long")
        assert isinstance(compile_derivation(expr, schema), str)


def test_mixed_timestamp_timezones_refused():
    """Two distinct tz annotations in one batch cannot both pin DuckDB's
    TimeZone — refuse loudly rather than cast one column's literals in
    the other's zone (not producible via the sink, which attaches one
    session tz; guarded for direct callers)."""
    import pyarrow as pa
    import pytest

    from table_versions_spark.streaming.arrowexpr import violations

    t = pa.table({
        "a": pa.array([1000000], pa.timestamp("us", tz="UTC")),
        "b": pa.array([1000000], pa.timestamp("us", tz="America/New_York")),
    })
    with pytest.raises(ValueError, match="mixed timestamp timezones"):
        violations(t, ("a IS NOT NULL",))
