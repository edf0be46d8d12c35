"""Timestamp helpers.

``to_utc_date`` ports the reference's UTC timestamp→date derivation used for
partition values (``examples/src/main/scala/com/gu/tableversions/examples/DateTime.scala:10-13``).

``ts_from_nanos`` handles nanosecond-precision parquet timestamps read as
``bigint`` nanos-since-epoch (Sparks where
``spark.sql.legacy.parquet.nanosAsLong=true`` is honored); it converts them to
a proper (microsecond) timestamp column JVM-side — no UDF. On Spark 4.1.2+
the reader surfaces TIMESTAMP(NANOS) natively as µs-truncated
``timestamp_ntz`` and the conf is a no-op, so callers must branch on the
actual read dtype (see ``operators.common.load_events``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def ts_from_nanos(col: Column | str) -> Column:
    # Exact integer ns→µs: epoch-nanos (~1.7e18) exceed double's 2^53 exact
    # range, so `/ 1000` through double can be off by 1µs — divide in decimal.
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(
        F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long"))


def to_utc_date(ts: Column | str) -> Column:
    """UTC date of a timestamp (reference ``DateTime.scala:10-13``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(c)
