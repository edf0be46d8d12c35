"""Versioning-flow queries (SURVEY §2.A surfaced as driver-checkable §2.B ids).

Each query exercises the VersionedEngine end-to-end on a throwaway warehouse:
the Spark result is whatever a reader of the versioned table sees, and the
DuckDB oracle states the same expected contents in plain SQL over the original
testdata tables. This verifies, via the driver's hash-compare, that:

- snapshot replace shows only the latest snapshot
  (reference ``SnapshotTableLoaderSpec.scala:60-74``),
- partition overwrite replaces exactly the touched partitions
  (reference ``DatePartitionedTableLoaderSpec.scala:110-123``),
- time travel reproduces the pre-update state
  (reference ``DatePartitionedTableLoaderSpec.scala:125-137``),
- partition-pruned reads return exactly one partition's rows
  (reference ``DatePartitionedTableLoaderSpec.scala:86-101``).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import VersionedEngine
from .common import ensure_compat, load, load_events

CUSTOMER_DDL = ("c_custkey bigint, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string")
EVENTS_DDL = ("event_id bigint, user_id bigint, event_type string, "
              "value double, event_date date")

# DuckDB scalar for the partition used in partition-level scenarios
_MIN_DATE_SQL = "(SELECT MIN(CAST(ts AS DATE)) FROM events)"


def _engine(spark: SparkSession) -> VersionedEngine:
    ensure_compat(spark)
    return VersionedEngine(spark, tempfile.mkdtemp(prefix="tvx-wh-"))


def _events_for_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_snapshot_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two snapshot inserts; reader sees only the second."""
    eng = _engine(spark)
    cust = load(spark, sf_dir, "customer")
    eng.create_table("vx.customers", schema_ddl=CUSTOMER_DDL)
    eng.insert(cust, "vx.customers", "tester", "v1: full load")
    eng.insert(cust.where(F.col("c_acctbal") > 0), "vx.customers", "tester",
               "v2: positive balances only")
    return eng.read("vx.customers")


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot v1, v2, then read *as of* the v1 commit."""
    eng = _engine(spark)
    cust = load(spark, sf_dir, "customer")
    eng.create_table("vx.customers", schema_ddl=CUSTOMER_DDL)
    r1 = eng.insert(cust, "vx.customers", "tester", "v1")
    eng.insert(cust.where(F.col("c_acctbal") > 0), "vx.customers", "tester", "v2")
    return eng.read("vx.customers", at_commit=r1.commit_id)


def q_insert_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert all days of events, then reprocess the earliest day with doubled
    values: only that partition is replaced (Hive-overwrite emulation)."""
    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.events", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.events", "tester", "all days")
    min_date = ev.agg(F.min("event_date")).collect()[0][0]
    reprocessed = (ev.where(F.col("event_date") == F.lit(min_date))
                     .withColumn("value", F.col("value") * 2))
    eng.insert(reprocessed, "vx.events", "tester", "reprocess earliest day")
    return eng.read("vx.events").select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read one partition of a versioned partitioned table (Catalyst prunes
    via PartitionFilters on the basePath-resolved layout)."""
    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.events", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.events", "tester", "all days")
    min_date = ev.agg(F.min("event_date")).collect()[0][0]
    return (eng.read("vx.events")
            .where(F.col("event_date") == F.lit(min_date))
            .select("event_id", "user_id", "event_type", "value"))


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert into a partitioned versioned table: rows of the
    earliest day are replaced with tripled values plus one brand-new row;
    untouched partitions keep their version (engine.upsert semantics —
    partition-scoped rewrite, null-safe partition scoping)."""
    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.events_up", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.events_up", "tester", "all days")
    min_date = ev.agg(F.min("event_date")).collect()[0][0]
    changed = (ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 3))
    extra = spark.createDataFrame(
        [(-1, 0, "synthetic", 1.0, min_date)], EVENTS_DDL)
    eng.upsert(changed.unionByName(extra), "vx.events_up",
               keys=["event_id"], user_id="tester", message="merge day 1")
    return eng.read("vx.events_up").select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level delete: drop all 'error' events; only partitions containing
    matches are rewritten as a fresh version (engine.delete semantics)."""
    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.events_del", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.events_del", "tester", "all days")
    eng.delete("vx.events_del", "event_type = 'error'", "tester", "purge errors")
    return eng.read("vx.events_del").select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE into a partitioned versioned table (engine.merge,
    Delta ``MERGE INTO`` shape): the earliest day's events arrive
    reprocessed with tripled values — matched 'error' events are DELETED,
    other matched events are UPDATED to the reprocessed row, and one
    brand-new row is INSERTED. Untouched day-partitions keep their
    version; the whole merge is a single commit."""
    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.events_mg", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.events_mg", "tester", "all days")
    min_date = ev.agg(F.min("event_date")).collect()[0][0]
    src = (ev.where(F.col("event_date") == F.lit(min_date))
             .withColumn("value", F.col("value") * 3))
    extra = spark.createDataFrame(
        [(-1, 0, "synthetic", 1.0, min_date)], EVENTS_DDL)
    eng.merge(src.unionByName(extra), "vx.events_mg", keys=["event_id"],
              user_id="tester", message="reprocess day 1 via merge",
              when_matched_delete="s.event_type = 'error'",
              when_matched_update=True)
    return eng.read("vx.events_mg").select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-wise map join of co-bucketed versioned tables (engine
    ``bucketed_join``): lineitem and orders bucketed 8 ways on the order
    key; the result must be identical to the plain join — bucketing is a
    physical-layout optimization, invisible in the answer."""
    eng = _engine(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    li_ddl = "l_orderkey bigint, l_linenumber int, l_extendedprice double"
    od_ddl = "l_orderkey bigint, o_totalprice double"
    eng.create_table("vx.bli", schema_ddl=li_ddl,
                     bucket_columns=["l_orderkey"], bucket_count=8)
    eng.create_table("vx.bod", schema_ddl=od_ddl,
                     bucket_columns=["l_orderkey"], bucket_count=8)
    eng.insert(li, "vx.bli", "tester", "lineitems")
    eng.insert(od, "vx.bod", "tester", "orders")
    return (eng.bucketed_join("vx.bli", "vx.bod")
            .groupBy("l_orderkey")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                 F.count("*").alias("n_items"),
                 F.round(F.max("o_totalprice"), 2).alias("o_totalprice")))


def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: full build, then the
    earliest day is reprocessed with doubled values and ONLY that day is
    re-aggregated (IncrementalRollup over the commit-log diff). The final
    aggregate must equal the from-scratch aggregation."""
    from ..rollup import IncrementalRollup

    eng = _engine(spark)
    ev = _events_for_insert(spark, sf_dir)
    eng.create_table("vx.rsrc", schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"])
    eng.insert(ev, "vx.rsrc", "tester", "all days")

    def agg(df):
        return df.groupBy("event_date", "event_type").agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count("*").alias("n"))

    roll = IncrementalRollup(eng, "vx.rsrc", "vx.ragg",
                             group_cols=["event_date", "event_type"], agg=agg)
    roll.refresh(user_id="tester")  # full build
    min_date = ev.agg(F.min("event_date")).collect()[0][0]
    eng.insert(ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 2),
               "vx.rsrc", "tester", "reprocess earliest day")
    roll.refresh(user_id="tester")  # incremental: only the changed day
    return eng.read("vx.ragg").select("event_date", "event_type", "total", "n")


QUERIES = {
    "q_snapshot_replace": q_snapshot_replace,
    "q_time_travel": q_time_travel,
    "q_insert_overwrite_partition": q_insert_overwrite_partition,
    "q_partition_prune": q_partition_prune,
    "q_upsert": q_upsert,
    "q_delete": q_delete,
    "q_merge": q_merge,
    "q_bucketed_join": q_bucketed_join,
    "q_rollup_incremental": q_rollup_incremental,
}

ORACLES = {
    "q_snapshot_replace": "SELECT * FROM customer WHERE c_acctbal > 0",
    "q_time_travel": "SELECT * FROM customer",
    "q_insert_overwrite_partition": (
        "SELECT event_id, user_id, event_type, value * 2 AS value, "
        f"CAST(ts AS DATE) AS event_date FROM events WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date "
        f"FROM events WHERE CAST(ts AS DATE) <> {_MIN_DATE_SQL}"),
    "q_partition_prune": (
        "SELECT event_id, user_id, event_type, value FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL}"),
    "q_upsert": (
        "SELECT event_id, user_id, event_type, value * 3 AS value, "
        f"CAST(ts AS DATE) AS event_date FROM events WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "UNION ALL "
        f"SELECT -1, 0, 'synthetic', 1.0, {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date "
        f"FROM events WHERE CAST(ts AS DATE) <> {_MIN_DATE_SQL}"),
    "q_delete": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "WHERE event_type <> 'error'"),
    "q_merge": (
        "SELECT event_id, user_id, event_type, value * 3 AS value, "
        f"CAST(ts AS DATE) AS event_date FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} AND event_type <> 'error' "
        "UNION ALL "
        f"SELECT -1, 0, 'synthetic', 1.0, {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        f"WHERE CAST(ts AS DATE) <> {_MIN_DATE_SQL}"),
    "q_bucketed_join": (
        "SELECT l.l_orderkey, ROUND(SUM(l.l_extendedprice), 2) AS sum_price, "
        "COUNT(*) AS n_items, ROUND(MAX(o.o_totalprice), 2) AS o_totalprice "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_orderkey"),
    "q_rollup_incremental": (
        "SELECT CAST(ts AS DATE) AS event_date, event_type, "
        "ROUND(SUM(CASE WHEN CAST(ts AS DATE) = "
        f"{_MIN_DATE_SQL} THEN value * 2 ELSE value END), 2) AS total, "
        "COUNT(*) AS n FROM events "
        "GROUP BY CAST(ts AS DATE), event_type"),
}
