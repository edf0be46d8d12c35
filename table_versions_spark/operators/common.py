"""Shared helpers for query operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def ensure_compat(spark: SparkSession) -> SparkSession:
    """Set runtime confs the testdata requires, safe to call repeatedly.

    The driver harness owns the SparkSession, so these must be runtime-settable
    confs, applied lazily by every query entry point:

    - ``nanosAsLong``: events.parquet carries TIMESTAMP(NANOS), which the
      Spark 4 parquet reader rejects by default.
    - UTC session timezone so timestamp→date derivations agree with the
      (timezone-naive) DuckDB oracles.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    ensure_compat(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with its ns-precision ``ts`` (read as long nanos) converted to a
    proper timestamp column, plus the derived UTC ``event_date``."""
    from ..functions.timestamps import ts_from_nanos

    df = load(spark, sf_dir, "events")
    return (df.withColumn("ts", ts_from_nanos("ts"))
              .withColumn("event_date", F.to_date("ts")))
