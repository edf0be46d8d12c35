"""Versioning-flow + streaming queries (SURVEY §2.A surfaced as
driver-checkable §2.B ids, plus the Structured-Streaming query family:
commit-log CDF aggregation, watermarked windows, stateful sessionization,
cross-batch dedup, and stream-stream interval joins).

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

import itertools
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import VersionedEngine
from .common import ensure_compat, load, load_events

CUSTOMER_DDL = ("c_custkey bigint, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string")
EVENTS_DDL = ("event_id bigint, user_id bigint, event_type string, "
              "value double, event_date date")

# DuckDB scalar for the partition used in partition-level scenarios
_MIN_DATE_SQL = "(SELECT MIN(CAST(ts AS DATE)) FROM events)"

# Process-scoped shared warehouse per sf_dir: the base all-days events table
# is inserted ONCE; every mutating query shallow-clones it (zero data
# rewrite, no Spark job) instead of re-inserting the full table. This is
# both the engine feature a production reprocessing pipeline would use
# (branch a table, mutate the branch) and what keeps the per-query setup
# O(metadata) instead of O(data).
_SHARED: dict[str, dict] = {}
_SEQ = itertools.count()
# Extra per-process token for streaming run/checkpoint dir NAMES.
# scratch_dir already namespaces per driver process, so cross-process
# collision is impossible; _RUN additionally keeps run dirs unique if a
# process ever re-enters a query family after clearing _SEQ-based state
# (cheap belt over the existing suspenders).
_RUN = uuid.uuid4().hex[:8]


def _await(q, timeout: int = 300) -> None:
    """awaitTermination with the boolean CHECKED: a timed-out (still
    running) availableNow query must raise, not silently hand back a
    partial sink — a wrong-but-plausible result is worse than a timeout.
    The query is stopped before raising so it can't keep competing for
    executors or poison a cached setup marker."""
    if not q.awaitTermination(timeout):
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"streaming query {q.name or q.id} still running after "
                f"{timeout}s — partial results discarded")


def _engine(spark: SparkSession) -> VersionedEngine:
    ensure_compat(spark)
    return VersionedEngine(spark, tempfile.mkdtemp(prefix="tvx-wh-"))


def _events_for_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def _shared(spark: SparkSession, sf_dir: str) -> dict:
    # keyed by the session too: a cached engine bound to a stopped/replaced
    # SparkSession must not leak into a fresh session's queries. Only
    # id(spark) rides the KEY; what prevents GC id-reuse from aliasing
    # entries is the 'spark' field in the VALUE dict below, which keeps
    # the session object alive for as long as its entry exists — do not
    # remove that field as redundant
    key = (id(spark), sf_dir)
    st = _SHARED.get(key)
    if st is None:
        eng = _engine(spark)
        ev = _events_for_insert(spark, sf_dir)
        eng.create_table("vx.events_base", schema_ddl=EVENTS_DDL,
                         partition_columns=["event_date"])
        eng.insert(ev, "vx.events_base", "tester", "all days")
        min_date = ev.agg(F.min("event_date")).collect()[0][0]
        st = {"eng": eng, "min_date": min_date, "spark": spark}
        _SHARED[key] = st
    return st


def _clone_base(st: dict) -> str:
    """Fresh uniquely-named shallow clone of the base events table — clones
    are single-use so repeated query invocations (bench best-of-2) never
    mutate the same table twice."""
    name = f"vx.branch_{next(_SEQ)}"
    st["eng"].clone_table("vx.events_base", name, user_id="tester")
    return name


def q_snapshot_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two snapshot inserts; reader sees only the second."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "customers_v1_commit" not in st:
        cust = load(spark, sf_dir, "customer")
        eng.create_table("vx.customers", schema_ddl=CUSTOMER_DDL)
        r1 = eng.insert(cust, "vx.customers", "tester", "v1: full load")
        eng.insert(cust.where(F.col("c_acctbal") > 0), "vx.customers",
                   "tester", "v2: positive balances only")
        st["customers_v1_commit"] = r1.commit_id
    return eng.read("vx.customers")


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot v1, v2, then read *as of* the v1 commit (same shared table as
    q_snapshot_replace — time travel is a read-path feature, so both queries
    observe one commit history, as two users of one table would)."""
    st = _shared(spark, sf_dir)
    q_snapshot_replace(spark, sf_dir)  # ensure the two commits exist
    return st["eng"].read("vx.customers",
                          at_commit=st["customers_v1_commit"])


def q_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-based time travel (``read(at_timestamp=...)`` — Delta's
    ``TIMESTAMP AS OF``): reading the shared snapshot table as of the v1
    commit's own recorded timestamp must reproduce the v1 state, exactly
    as commit-id travel does (the resolver picks the last commit at or
    before the instant). Same oracle as ``q_time_travel``."""
    st = _shared(spark, sf_dir)
    q_snapshot_replace(spark, sf_dir)  # ensure the two commits exist
    eng = st["eng"]
    v1_ts = next(m.timestamp for m in eng.updates("vx.customers")
                 if m.commit_id == st["customers_v1_commit"])
    return eng.read("vx.customers", at_timestamp=v1_ts)


def q_insert_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All days of events (shallow-cloned base), then reprocess the earliest
    day with doubled values: only that partition is replaced
    (Hive-overwrite emulation)."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    ev = _events_for_insert(spark, sf_dir)
    reprocessed = (ev.where(F.col("event_date") == F.lit(min_date))
                     .withColumn("value", F.col("value") * 2))
    eng.insert(reprocessed, table, "tester", "reprocess earliest day")
    return eng.read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read one partition of a versioned partitioned table (Catalyst prunes
    via PartitionFilters on the basePath-resolved layout). Read-only —
    scans the shared base table directly."""
    st = _shared(spark, sf_dir)
    return (st["eng"].read("vx.events_base")
            .where(F.col("event_date") == F.lit(st["min_date"]))
            .select("event_id", "user_id", "event_type", "value"))


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert into a partitioned versioned table: rows of the
    earliest day are replaced with tripled values plus one brand-new row;
    untouched partitions keep their version (engine.upsert semantics —
    partition-scoped rewrite, null-safe partition scoping)."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    ev = _events_for_insert(spark, sf_dir)
    changed = (ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 3))
    extra = spark.createDataFrame(
        [(-1, 0, "synthetic", 1.0, min_date)], EVENTS_DDL)
    eng.upsert(changed.unionByName(extra), table,
               keys=["event_id"], user_id="tester", message="merge day 1")
    return eng.read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level delete: drop all 'error' events; only partitions containing
    matches are rewritten as a fresh version (engine.delete semantics)."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].delete(table, "event_type = 'error'", "tester", "purge errors")
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level delete via DELETION VECTORS (engine.delete(mode="dv"),
    Delta DV shape): the same 'error'-purge as q_delete, but with ZERO
    data rewrite — affected partitions get a fresh version dir that
    hardlinks the previous files and carries a ``_dv/`` sidecar of
    deleted (file, row_index) positions; reads anti-join the vector out.
    The oracle is identical to q_delete's, proving the two delete modes
    agree row-for-row; the plans differ completely (rewrite vs
    O(deleted-positions) metadata commit — the mode a TB-scale partition
    wants for a sliver-sized purge)."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].delete(table, "event_type = 'error'", "tester",
                     "purge errors via dv", mode="dv")
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE (engine.update, Delta ``UPDATE ... SET ... WHERE``):
    'error' events get value doubled and their type rewritten, in one
    commit; only partitions containing matches are rewritten (simultaneous
    assignment against the pre-update row — the swapped-columns hazard the
    oracle would catch)."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].update(table,
                     set={"value": "value * 2",
                          "event_type": "concat('was_', event_type)"},
                     predicate="event_type = 'error'",
                     user_id="tester", message="rewrite errors")
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_change_feed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed (engine.read_changes(row_level=True), Delta
    CDF shape): after a deletion-vector purge of 'error' events, the CDF
    since the pre-delete commit is EXACTLY the purged rows tagged
    _change_type='delete' — derived from the vector delta, not a rescan
    diff. The oracle states the same set in SQL, proving both the delete's
    row selection and the feed's tombstone semantics."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    table = _clone_base(st)
    pre = eng.updates(table)[0].commit_id
    eng.delete(table, "event_type = 'error'", "tester", "purge errors",
               mode="dv")
    return (eng.read_changes(table, since_commit=pre, row_level=True)
            .select("event_id", "user_id", "event_type", "value",
                    "event_date", "_change_type"))


def _cdf_base(st: dict, spark: SparkSession, sf_dir: str) -> str:
    """Once-per-process base events table with change_data_feed=True;
    CDF queries shallow-clone it (same pattern as _clone_base)."""
    if "cdf_base" not in st:
        eng = st["eng"]
        eng.create_table("vx.events_cdf", schema_ddl=EVENTS_DDL,
                         partition_columns=["event_date"],
                         change_data_feed=True)
        eng.insert(_events_for_insert(spark, sf_dir), "vx.events_cdf",
                   "tester", "all days")
        st["cdf_base"] = "vx.events_cdf"
    return st["cdf_base"]


def q_change_feed_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed across a REWRITE commit (engine.update
    mode='rewrite' on a ``change_data_feed=True`` table): the ``_cdc/``
    sidecar written at commit time makes the CDF EXACT — the matched
    rows' pre-image as deletes plus their post-image as inserts, and
    NOTHING for the unmatched rows of the rewritten partitions (the
    coarse fallback would emit those too, failing this oracle)."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    _cdf_base(st, spark, sf_dir)
    table = f"vx.cdcrw_{next(_SEQ)}"
    eng.clone_table(st["cdf_base"], table, user_id="tester")
    pre = eng.updates(table)[0].commit_id
    # scope to ONE day-partition: only it is rewritten (and sidecar'd) —
    # the partition-scoped rewrite shape a production UPDATE has
    eng.update(table, set={"value": "value * 2"},
               predicate=("event_type = 'error' AND "
                          f"event_date = DATE'{st['min_date']}'"),
               user_id="tester", message="reprice errors", mode="rewrite")
    return (eng.read_changes(table, since_commit=pre, row_level=True)
            .select("event_id", "user_id", "event_type", "value",
                    "event_date", "_change_type"))


def q_change_feed_per_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-commit CDF events (read_changes(row_level=True,
    per_commit=True), Delta's per-commit shape): a deletion-vector DELETE
    commit followed by a rewrite UPDATE commit on a change_data_feed
    table — the span returns EACH commit's exact rows (vector delta for
    the first, _cdc sidecar for the second), where the net span diff
    would go coarse. ``_commit_id`` is dropped for the oracle compare
    (commit ids are run-random); the rows themselves pin exactness."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    _cdf_base(st, spark, sf_dir)
    table = f"vx.cdcpc_{next(_SEQ)}"
    eng.clone_table(st["cdf_base"], table, user_id="tester")
    pre = eng.updates(table)[0].commit_id
    eng.delete(table, "event_type = 'error'", "tester", "purge errors",
               mode="dv")
    eng.update(table, set={"value": "value * 2"},
               predicate="event_type = 'click'",
               user_id="tester", message="reprice clicks", mode="rewrite")
    return (eng.read_changes(table, since_commit=pre, row_level=True,
                             per_commit=True)
            .select("event_id", "user_id", "event_type", "value",
                    "event_date", "_change_type"))


def q_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE via DELETION VECTORS (engine.update(mode="dv")):
    the same rewrite as q_update, but unmatched rows are never rewritten —
    matched rows' old positions go into the ``_dv/`` sidecar and only the
    updated rows are written as new files into the hardlinked version
    dir. Oracle identical to q_update's: both modes must agree
    row-for-row."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].update(table,
                     set={"value": "value * 2",
                          "event_type": "concat('was_', event_type)"},
                     predicate="event_type = 'error'",
                     user_id="tester", message="dv reclassify errors",
                     mode="dv")
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE into a partitioned versioned table (engine.merge,
    Delta ``MERGE INTO`` shape): the earliest day's events arrive
    reprocessed with tripled values — matched 'error' events are DELETED,
    other matched events are UPDATED to the reprocessed row, and one
    brand-new row is INSERTED. Untouched day-partitions keep their
    version; the whole merge is a single commit."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    ev = _events_for_insert(spark, sf_dir)
    src = (ev.where(F.col("event_date") == F.lit(min_date))
             .withColumn("value", F.col("value") * 3))
    extra = spark.createDataFrame(
        [(-1, 0, "synthetic", 1.0, min_date)], EVENTS_DDL)
    eng.merge(src.unionByName(extra), table, keys=["event_id"],
              user_id="tester", message="reprocess day 1 via merge",
              when_matched_delete="s.event_type = 'error'",
              when_matched_update=True)
    return eng.read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-wise map join of co-bucketed versioned tables (engine
    ``bucketed_join``): lineitem and orders bucketed 8 ways on the order
    key; the result must be identical to the plain join — bucketing is a
    physical-layout optimization, invisible in the answer."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "bucketed" not in st:
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
        st["bucketed"] = True
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

    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    src_table = _clone_base(st)
    agg_table = f"{src_table}_agg"
    ev = _events_for_insert(spark, sf_dir)

    def agg(df):
        return df.groupBy("event_date", "event_type").agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count("*").alias("n"))

    roll = IncrementalRollup(eng, src_table, agg_table,
                             group_cols=["event_date", "event_type"], agg=agg)
    roll.refresh(user_id="tester")  # full build
    eng.insert(ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 2),
               src_table, "tester", "reprocess earliest day")
    roll.refresh(user_id="tester")  # incremental: only the changed day
    return eng.read(agg_table).select("event_date", "event_type", "total", "n")


def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read (engine.read_changes): after reprocessing the
    earliest day on a branch of the base table, a consumer that remembers
    the pre-reprocess commit reads ONLY the changed partition — unchanged
    day-partitions are never scanned (metadata-level commit diff)."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    since = eng.updates(table)[0].commit_id  # the clone commit
    ev = _events_for_insert(spark, sf_dir)
    eng.insert(ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 2),
               table, "tester", "reprocess earliest day")
    return eng.read_changes(table, since_commit=since).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_compact_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (engine.compact) on a branch of the base
    table: the rewrite must be invisible in the answer — the compacted
    table reads identically to the original events."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].compact(table)
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_clustered_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered write + per-file data skipping (engine ``cluster_by`` +
    ``stats_filter``): events are written sorted on ``value`` so each file
    covers a tight range; the stats-filtered read prunes files via the
    per-file footer ranges in the commit record, and the residual
    ``.where`` makes the (superset) result exact — the standard
    skipping-read usage."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "clustered" not in st:
        ev = _events_for_insert(spark, sf_dir)
        eng.create_table("vx.events_cl", schema_ddl=EVENTS_DDL)
        eng.insert(ev, "vx.events_cl", "tester", "clustered load",
                   cluster_by=["value"])
        st["clustered"] = True
    return (eng.read("vx.events_cl", stats_filter={"value": (10.0, 20.0)})
            .where((F.col("value") >= 10.0) & (F.col("value") <= 20.0))
            .select("event_id", "user_id", "event_type", "value",
                    "event_date"))


def q_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column rename (engine ``rename_column``, Delta
    column-mapping name mode) on a branch of the base table: ``value``
    becomes ``amount`` without touching a single data file — reads
    translate physical→logical, so the full pre-rename history surfaces
    under the new name. The oracle aliases the original column, proving
    the mapping is invisible in the data."""
    st = _shared(spark, sf_dir)
    table = _clone_base(st)
    st["eng"].rename_column(table, "value", "amount")
    return st["eng"].read(table).select(
        "event_id", "user_id", "event_type", "amount", "event_date")


def q_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only DROP COLUMN (engine ``drop_column``, the sibling of
    ``rename_column``): ``user_id`` disappears from reads with ZERO data
    rewrite — every committed file keeps its bytes, the physical name
    stays reserved against resurrection by schema evolution, and the
    change is itself a logged commit. A post-drop append then writes
    files WITHOUT the column, so the read path must serve mixed-era
    files through one schema — the oracle is the same union stated over
    the raw events (dropped column simply projected away)."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    eng.drop_column(table, "user_id")
    ev = _events_for_insert(spark, sf_dir)
    extra = (ev.where(F.col("event_date") == F.lit(min_date))
             .drop("user_id")
             .withColumn("event_id", F.col("event_id") + 1_000_000))
    eng.insert(extra, table, "tester", "post-drop append", mode="append")
    return eng.read(table).select(
        "event_id", "event_type", "value", "event_date")


def q_derived_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated partition column (engine ``partition_derivations``, Delta
    GENERATED-column shape): the table declares
    ``event_date = to_date(ts)`` ONCE, and events are inserted WITHOUT the
    partition column — the engine derives it at write time. This is the
    reference's own convention (every writer derives the date partition by
    hand, ``examples/.../DateTime.scala:10-13``) promoted to table
    metadata, so writer jobs can't desync on the derivation. The pruned
    single-day read proves the derived values landed as real partition
    directories."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "derived" not in st:
        ev = load_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value")
        eng.create_table("vx.events_dp",
                         schema_ddl=EVENTS_TS_DDL + ", event_date date",
                         partition_columns=["event_date"],
                         partition_derivations={"event_date": "to_date(ts)"})
        eng.insert(ev, "vx.events_dp", "tester", "derived partitions")
        st["derived"] = True
    return (eng.read("vx.events_dp")
            .where(F.col("event_date") == F.lit(st["min_date"]))
            .select("event_id", "user_id", "event_type", "value",
                    "event_date"))


def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write + two-column file skipping (engine
    ``cluster_mode="zorder"`` + ``stats_filter``): events are written
    sorted on the Morton curve over (value, user_id), so every file covers
    a small rectangle of that plane and the stats-filtered read prunes
    files on BOTH columns at once — a lexicographic (value, user_id) sort
    would only ever skip on ``value``. The residual ``.where`` makes the
    (superset) skipping read exact, so the curve math is hash-verified to
    be invisible in results."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "zordered" not in st:
        ev = _events_for_insert(spark, sf_dir)
        eng.create_table("vx.events_z", schema_ddl=EVENTS_DDL)
        eng.insert(ev, "vx.events_z", "tester", "z-ordered load",
                   cluster_by=["value", "user_id"], cluster_mode="zorder")
        st["zordered"] = True
    lo_u, hi_u = 1, 8  # a user band present at every scale factor
    return (eng.read("vx.events_z",
                     stats_filter={"value": (10.0, 20.0),
                                   "user_id": (lo_u, hi_u)})
            .where((F.col("value") >= 10.0) & (F.col("value") <= 20.0)
                   & (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u))
            .select("event_id", "user_id", "event_type", "value",
                    "event_date"))


def q_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter point-lookup skipping (engine ``bloom_columns`` +
    ``stats_filter``): events are written hash-distributed on ``event_id``
    so every file's min/max range covers the whole key space — range stats
    can prune nothing — and only the per-file Bloom bitsets recorded in
    the commit can narrow the point lookup to ~one file. The residual
    ``.where`` makes the (superset) read exact, so the skipping machinery
    is hash-verified to be invisible to results."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "bloomed" not in st:
        ev = _events_for_insert(spark, sf_dir)
        eng.create_table("vx.events_bl", schema_ddl=EVENTS_DDL,
                         bloom_columns=["event_id"])
        eng.insert(ev.repartition(8, F.col("event_id")), "vx.events_bl",
                   "tester", "bloom-indexed load")
        st["bloomed"] = True
    return (eng.read("vx.events_bl", stats_filter={"event_id": 777})
            .where(F.col("event_id") == 777)
            .select("event_id", "user_id", "event_type", "value",
                    "event_date"))


def q_vacuum_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version GC (engine.vacuum) on a branch: after reprocessing the
    earliest day, vacuuming old version dirs must leave the current state
    byte-identical — GC removes only unreachable history."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    ev = _events_for_insert(spark, sf_dir)
    eng.insert(ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 2),
               table, "tester", "reprocess earliest day")
    eng.vacuum(table, keep_commits=1, grace_hours=0)
    return eng.read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


def q_stream_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming read of the versioned base table through the
    ``tvx`` commit-log stream source with an in-stream aggregation to a
    memory sink. Under availableNow the Python DataSource stream has no
    admission control, so the whole backlog lands as ONE micro-batch (see
    ``q_stream_window``'s note); in continuous operation each trigger
    consumes the commit span since its checkpointed seq.

    The streamed rows are exactly the rows the base table's single insert
    committed, so the per-event_type aggregate equals the same aggregate
    over the raw events table — which is the DuckDB oracle. The streaming
    plan is the production CDF-consumer shape: partition-parallel source
    (each changed version dir = one input partition), complete-mode agg,
    and only the O(#event_types) aggregate ever reaches the driver/sink.
    All aggregates are integer-exact (no double summation-order hazard).
    """
    from ..streaming.source import register

    st = _shared(spark, sf_dir)
    register(spark)
    loc = st["eng"].definition("vx.events_base").location
    name = f"tvx_stream_agg_{next(_SEQ)}"
    stream = spark.readStream.format("tvx").option("location", loc).load()
    agg = (stream.groupBy("event_type")
           .agg(F.count("*").alias("n"),
                F.min("event_id").alias("min_event"),
                F.max("event_id").alias("max_event"),
                F.sum("user_id").alias("sum_user")))
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    _await(q)
    return spark.table(name)


def q_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-to-versioned streaming replication — the ``tvx`` data
    source driving BOTH faces: the base table's commit log streams out
    through ``readStream.format("tvx")`` (the span since the checkpointed
    seq per trigger; ONE batch under availableNow, which has no Python
    DataSource admission control) and lands in a replica table through
    ``writeStream.format("tvx")`` (one versioned commit per epoch,
    exactly-once via the ``txn=(txnApp, batchId)`` idempotence token). The replica's contents
    then equal the base's — the oracle aggregates the raw events table.

    This is the change-data-replication shape (Delta "CDF in → table
    out"): restartable from the checkpoint, replay-safe at the sink, no
    driver-side data movement — rows travel Arrow-batch → parquet file,
    commits are metadata."""
    from ..streaming.source import register

    st = _shared(spark, sf_dir)
    register(spark)
    eng = st["eng"]
    if "stream_sink" not in st:
        from .common import scratch_dir

        eng.create_table("vx.events_replica", schema_ddl=EVENTS_DDL,
                         partition_columns=["event_date"])
        dst = eng.definition("vx.events_replica").location
        src = eng.definition("vx.events_base").location
        ckpt = scratch_dir(spark, f"stream-sink-ckpt-{_RUN}-{next(_SEQ)}")
        q = (spark.readStream.format("tvx").option("location", src).load()
             .writeStream.format("tvx").option("location", dst)
             .option("txnApp", "events-replication")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _await(q)
        st["stream_sink"] = True
    return (eng.read("vx.events_replica")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("min_event"),
                 F.max("event_id").alias("max_event"),
                 F.sum("user_id").alias("sum_user")))


def q_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming row-level change feed (``readStream.format("tvx")
    .option("changeFeed", "true")``): first pass consumes the base
    table's initial state (every row arrives as ``_change_type=insert``),
    then a deletion-vector purge of 'error' events commits, and the
    resumed stream's next span emits EXACTLY the purged rows as
    ``delete`` tombstones — computed executor-side from the vector
    delta, never a rescan diff. The per-change-type aggregate is the
    oracle: inserts cover all events, deletes cover the error rows."""
    import os

    from ..streaming.source import register
    from .common import scratch_dir

    st = _shared(spark, sf_dir)
    register(spark)
    eng = st["eng"]
    table = _clone_base(st)
    loc = eng.definition(table).location
    run = scratch_dir(spark, f"stream-cdf-{_RUN}-{next(_SEQ)}")
    out, ckpt = os.path.join(run, "out"), os.path.join(run, "ckpt")

    def consume():
        q = (spark.readStream.format("tvx").option("location", loc)
             .option("changeFeed", "true").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _await(q)

    consume()  # initial state: inserts
    eng.delete(table, "event_type = 'error'", "tester", "purge", mode="dv")
    consume()  # delta span: exact delete tombstones
    return (spark.read.parquet(out)
            .groupBy("_change_type")
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("min_event"),
                 F.max("event_id").alias("max_event"),
                 F.sum("event_id").alias("sum_event")))


EVENTS_TS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double")


def _events_ts_location(spark: SparkSession, sf_dir: str) -> str:
    """Shared snapshot table carrying the µs event timestamp — the stream
    source for the event-time streaming queries (one commit ⇒ one
    micro-batch under availableNow)."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "events_ts" not in st:
        ev = load_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value")
        eng.create_table("vx.events_ts", schema_ddl=EVENTS_TS_DDL)
        eng.insert(ev, "vx.events_ts", "tester", "ts snapshot")
        st["events_ts"] = True
    return eng.definition("vx.events_ts").location


def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation
    (``streaming.ingest.windowed_counts``) in APPEND mode: a window row is
    emitted exactly once, when the watermark (max event time − 10 min)
    passes its end — the late-data-bounded, state-evicting shape a
    production stream runs, and the emission rule itself is what the
    oracle hash-checks: windows still within 10 min of the stream's max
    timestamp stay open and must NOT appear.

    Source is Spark's native file stream over a scratch export of the
    events table: under availableNow it runs the data batches and then the
    trailing no-data micro-batch that finalizes every window whose end ≤
    final watermark (``spark.sql.streaming.noDataMicroBatches.enabled`` is
    pinned on, since the rule depends on it). The ``tvx`` commit-log
    source can't drive this shape yet — the Python DataSource stream API
    has no availableNow admission control, so Spark demotes it to one
    batch and never runs the finalize batch (its append-side story is the
    ``foreachBatch`` ingest in ``streaming.ingest``; complete-mode reads
    are ``q_stream_agg``). At scale the file-source batches fan out like
    any parquet scan and window state lives partitioned in the executors'
    state stores."""
    import os

    from ..streaming.ingest import windowed_counts
    from .common import scratch_dir

    # pin the conf for THIS run only — a query function must not leak
    # session-global config into every later query in the session
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        from .common import build_once, corpus_tag

        tag = corpus_tag(sf_dir)
        src = scratch_dir(spark, f"stream-win-src-{tag}")
        build_once(spark, src,
                   lambda: (load_events(spark, sf_dir)
                            .select("event_id", "ts", "event_type", "value")
                            .write.mode("overwrite").parquet(src)))
        run = scratch_dir(spark, f"stream-win-run-{tag}-{_RUN}-{next(_SEQ)}")
        stream = (spark.readStream
                  .schema("event_id bigint, ts timestamp, event_type string, "
                          "value double")
                  .parquet(src))
        agg = windowed_counts(stream, ts_col="ts", window_duration="1 hour",
                              watermark_delay="10 minutes",
                              key_col="event_type")
        q = (agg.withColumn("sum_value", F.round("sum_value", 2))
             .writeStream.format("parquet")
             .option("path", os.path.join(run, "out"))
             .option("checkpointLocation", os.path.join(run, "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        _await(q)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    # explicit schema: a run that closes ZERO windows commits no files,
    # and schema inference over the empty sink dir would crash instead of
    # returning the empty set the oracle expects
    return spark.read.schema(
        "window_start timestamp, window_end timestamp, event_type string, "
        "n_events bigint, sum_value double").parquet(os.path.join(run, "out"))


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join — the third streaming-join shape
    next to q_stream_join's stream-stream and q_stream_dedup's keyed
    state: the event stream joins a static customer dimension
    (c_custkey = user_id + 1) per micro-batch, no watermark needed on
    the static side, then aggregates per market segment in complete
    mode. Spark plans the static side as an ordinary broadcast per
    batch — at scale the dimension re-resolves each trigger (picking up
    dim updates), while the stream side fans out like any file batch.
    Inner join per batch ≡ the batch join, which is the oracle; sums
    are integer event_ids plus one 2-dp-rounded value sum."""
    from .common import build_once, corpus_tag, scratch_dir

    # corpus_tag (path digest + content fingerprint) + build_once: two
    # corpora sharing a basename get distinct cached sources, and two
    # threads can't race the first export (same contract as the dedup
    # scratch indexes)
    src = scratch_dir(spark, f"stream-ssj-src-{corpus_tag(sf_dir)}")
    build_once(spark, src,
               lambda: (load_events(spark, sf_dir)
                        .select("event_id", "ts", "user_id", "value")
                        .write.mode("overwrite").parquet(src)))
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "value double")
              .parquet(src))
    joined = stream.join(
        cust, cust.c_custkey == stream.user_id + 1)
    agg = (joined.groupBy("c_mktsegment")
           .agg(F.count("*").alias("n_events"),
                F.sum("event_id").alias("sum_eid"),
                F.round(F.sum("value"), 2).alias("sum_value")))
    name = f"tvx_ssj_{next(_SEQ)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    _await(q)
    return spark.table(name)


RF_KEY_OFFSET = 1_000_000_000  # refresh-insert order keys land above base


def q_tpch_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H refresh functions RF1/RF2 through the versioned engine —
    the benchmark's write side, which the query-only q_tpch_q1–q22
    family never exercises: RF1 appends a batch of new orders (the
    %10==7 slice cloned above RF_KEY_OFFSET, so the clones keep their
    key class and survive RF2), RF2 deletes the %10==3 slice via a
    deletion vector, and the ACID check is the final per-status rollup
    — base minus deletes plus inserts, which the oracle reconstructs
    from the raw table. Three commits, linear history; the dv delete
    rewrites nothing (the RF cadence a daily warehouse actually runs)."""
    eng = _engine(spark)
    table = f"vx.rf_{next(_SEQ)}"
    ddl = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority")
    eng.create_table(table, schema_ddl=ddl,
                     user_id="creator", message="rf base")
    eng.insert(orders, table, "loader", "base load")
    rf1 = (orders.where(F.col("o_orderkey") % 10 == 7)
           .withColumn("o_orderkey",
                       F.col("o_orderkey") + RF_KEY_OFFSET))
    eng.insert(rf1, table, "rf1", "refresh insert", mode="append")
    eng.delete(table, "o_orderkey % 10 = 3", "rf2", "refresh delete",
               mode="dv")
    return (eng.read(table)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key")))


def q_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode — the third emission contract next to
    q_stream_agg's complete and q_stream_window's append: each trigger
    re-emits ONLY the aggregate keys that batch changed, the mode
    dashboards and upsert sinks consume (emit deltas, not the world).

    Drive: two availableNow runs over one checkpoint (deterministic
    batch order, as in q_stream_late). Run 1 streams every event except
    the held-back click slice and its update batch emits every
    event_type's running totals; run 2 appends ONLY that click slice —
    its emission must contain EXACTLY ONE row (the 'click' key, with
    totals now covering ALL clicks) even though state holds every key.
    The returned frame is run 2's emission; the oracle computes the
    full-corpus click totals. foreachBatch records each epoch's emitted
    rows to parquet — at scale that batch IS the delta an upsert sink
    merges, state stays executor-side."""
    import os

    from .common import scratch_dir

    run = scratch_dir(spark, f"stream-upd-{_RUN}-{next(_SEQ)}")
    src, out, ckpt = (os.path.join(run, d) for d in ("src", "out", "ckpt"))
    ev = load_events(spark, sf_dir).select("event_id", "event_type")
    held = (F.col("event_type") == "click") & (F.col("event_id") % 3 == 0)

    def run_once(tag: str) -> None:
        stream = (spark.readStream
                  .schema("event_id bigint, event_type string")
                  .parquet(src))
        agg = (stream.groupBy("event_type")
               .agg(F.count("*").alias("n_events"),
                    F.sum("event_id").alias("sum_eid")))

        def sink(batch, _epoch):
            (batch.withColumn("run", F.lit(tag))
             .write.mode("append").parquet(out))

        q = (agg.writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _await(q)

    ev.where(~held).coalesce(1).write.mode("overwrite").parquet(src)
    run_once("r1")  # every key emits its first totals
    ev.where(held).coalesce(1).write.mode("append").parquet(src)
    run_once("r2")  # ONLY the touched key re-emits
    return (spark.read.parquet(out)
            .where(F.col("run") == "r2")
            .select("event_type", "n_events", "sum_eid"))


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — row-level diff of a table between two
    commits (the data-ops "what changed since yesterday" audit, and the
    validation step behind any migration sign-off): a FULL OUTER join
    of the time-travel read at the pre-mutation commit against the
    current read, on the row key, classifying each key as
    added / removed / changed.

    Drive: a fresh snapshot table takes the deduped event
    representatives, then a dv DELETE of error rows, an UPDATE
    repricing clicks (``coalesce(value, 0) + 1`` — no fixed point for
    any finite value INCLUDING NULL and −1, so every click classifies
    as changed; ``value·2 + 1`` would silently keep a −1-valued or
    NULL click "unchanged" while the oracle marks it changed), and one
    synthetic INSERT; the
    diff of (insert commit → head) must be exactly those three commit
    footprints, which is the oracle. Unchanged rows drop out.

    Scale shape: two versioned reads (the old one metadata-resolved by
    time travel — no log replay cost beyond the fold), one shuffle on
    the key for the full-outer join, column-equality classification in
    codegen. At 100 TB this is the CDF-less diff; with CDF enabled,
    q_change_feed reads the same answer without the join."""
    eng = _engine(spark)
    table = f"vx.tdiff_{next(_SEQ)}"
    ddl = "event_id bigint, user_id bigint, event_type string, value double"
    eng.create_table(table, schema_ddl=ddl,
                     user_id="creator", message="diff base")
    base = (load_events(spark, sf_dir)
            .groupBy("event_id")
            .agg(F.min("user_id").alias("user_id"),
                 F.min("event_type").alias("event_type"),
                 F.min("value").alias("value")))
    r0 = eng.insert(base, table, "loader", "initial snapshot")
    eng.delete(table, "event_type = 'error'", "auditor", "purge errors",
               mode="dv")
    eng.update(table, set={"value": "coalesce(value, 0) + 1"},
               predicate="event_type = 'click'",
               user_id="ops", message="reprice clicks")
    eng.insert(spark.createDataFrame([(-777, 0, "synthetic", 1.0)], ddl),
               table, "ops", "backfill row", mode="append")
    old = eng.read(table, at_commit=r0.commit_id).alias("o")
    new = eng.read(table).alias("n")
    j = old.join(new, F.col("o.event_id") == F.col("n.event_id"),
                 "full_outer")
    # null-safe inequality (<=>) so a NULL-vs-value cell classifies as
    # changed instead of silently dropping out of the diff
    diff_cols = ["value", "event_type", "user_id"]
    any_diff = None
    for c in diff_cols:
        ne = ~F.expr(f"o.{c} <=> n.{c}")
        any_diff = ne if any_diff is None else (any_diff | ne)
    status = (F.when(F.col("o.event_id").isNull(), "added")
              .when(F.col("n.event_id").isNull(), "removed")
              .when(any_diff, "changed"))
    return (j.withColumn("status", status)
            .where(F.col("status").isNotNull())
            .select(F.coalesce("o.event_id", "n.event_id")
                    .alias("event_id"), "status"))


SMERGE_UPD_MOD = 5  # event_id % 5 == 0 rows arrive reprocessed (value·3)
SMERGE_NEW_MOD = 7  # event_id % 7 == 0 rows spawn a NEW id (offset by
                    # max(event_id)+1, snapshot from the corpus — a fixed
                    # +10M constant would collide with real ids >= 10M at
                    # larger corpora: the merge would UPDATE the colliding
                    # base row while the oracle unions a duplicate-id row)


def q_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-APPLY: a change stream lands in a versioned table
    through ``foreachBatch`` + ``engine.merge`` — the production pattern
    for upserting a CDC feed where an append-only sink is not enough
    (Delta's ``foreachBatch`` + ``MERGE INTO`` recipe).

    Drive: TWO availableNow runs over one checkpoint (the deterministic
    replay pattern of q_stream_late — file-source batch order is mtime-
    dependent, so ordered phases must be separate runs, exactly how a
    daily CDC feed arrives). Run 1 streams the base snapshot (one row
    per distinct event_id, deterministic min-representative) and the
    merge inserts it all. Run 2 appends the change file — every
    ``event_id % SMERGE_UPD_MOD == 0`` row reprocessed with value·3
    (matched ⇒ whole-row update) plus a brand-new id (offset past the
    corpus max, value+1) per ``% SMERGE_NEW_MOD == 0`` row
    (not-matched ⇒ insert) —
    and one merge commit applies it. Final table state is the oracle:
    base with the %5 slice re-valued plus the synthetic inserts.

    Scale shape: each micro-batch is one distributed MERGE (broadcast
    or shuffle join on the key, only touched files rewritten, one
    commit per epoch); state lives in the TABLE, not the stream — the
    restartable, replay-safe alternative to a giant dropDuplicates
    buffer. A replayed epoch would re-run the merge; updates are
    idempotent, and exactly-once inserts come from the checkpoint (the
    tvx sink's txn-token variant is q_stream_sink's contract)."""
    import os

    from .common import scratch_dir

    eng = _engine(spark)
    table = f"vx.smerge_{next(_SEQ)}"
    ddl = "event_id bigint, user_id bigint, event_type string, value double"
    eng.create_table(table, schema_ddl=ddl,
                     user_id="creator", message="cdc-apply target")
    run = scratch_dir(spark, f"stream-merge-{_RUN}-{next(_SEQ)}")
    src, ckpt = os.path.join(run, "src"), os.path.join(run, "ckpt")
    base = (load_events(spark, sf_dir)
            .groupBy("event_id")
            .agg(F.min("user_id").alias("user_id"),
                 F.min("event_type").alias("event_type"),
                 F.min("value").alias("value")))

    def run_once():
        stream = spark.readStream.schema(ddl).parquet(src)
        q = (stream.writeStream
             .foreachBatch(lambda batch, epoch: eng.merge(
                 batch, table, keys=["event_id"],
                 user_id="cdc", message=f"apply epoch {epoch}"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _await(q)

    base.write.mode("overwrite").parquet(src)
    run_once()  # epoch 0: initial snapshot inserts
    upd = (base.where(F.col("event_id") % SMERGE_UPD_MOD == 0)
           .withColumn("value", F.col("value") * 3))
    offset = base.agg(F.max("event_id")).first()[0] + 1  # 1-scalar collect
    new = (base.where(F.col("event_id") % SMERGE_NEW_MOD == 0)
           .select((F.col("event_id") + offset).alias("event_id"),
                   "user_id", "event_type",
                   (F.col("value") + 1).alias("value")))
    upd.unionByName(new).write.mode("append").parquet(src)
    run_once()  # epoch 1: the change file merges in
    return eng.read(table).select("event_id", "user_id",
                                  "event_type", "value")


def q_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-history surface as a driver-checkable id (engine.history =
    reference ``updates``, ``TableVersions.scala:44-45``; Delta DESCRIBE
    HISTORY shape): a fresh table takes a create → insert → dv-delete →
    rewrite-update commit chain and the history must replay it EXACTLY —
    seq ordinals descending from the head, each commit's author and
    message intact. commit_id/timestamp are run-random and excluded; the
    ``seq`` column (added for this contract) is the deterministic
    ordering handle, position-derived from the append-only contiguous
    log. Driver-side metadata only — no table data is read."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    table = f"vx.hist_{next(_SEQ)}"
    eng.create_table(table, schema_ddl=EVENTS_DDL,
                     partition_columns=["event_date"],
                     user_id="creator", message="create events table")
    eng.insert(_events_for_insert(spark, sf_dir), table,
               "loader", "load all days")
    eng.delete(table, "event_type = 'error'", "auditor", "purge errors",
               mode="dv")
    eng.update(table, set={"value": "value * 2"},
               predicate="event_type = 'click'",
               user_id="ops", message="reprice clicks")
    return eng.history(table).select("seq", "user_id", "message")


LATE_MOD = 7  # event_id % LATE_MOD == 0 ⇒ the row arrives in the LATE wave


def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data DROP semantics under a watermark — the one streaming
    contract ``q_stream_window`` can't witness from a single pass: rows
    arriving AFTER the watermark passed their window's end must be
    discarded (their window already emitted and its state was evicted),
    while late-but-in-grace rows still aggregate.

    Drive: two availableNow runs over one checkpoint (the deterministic
    replay pattern of ``q_stream_cdf``). Run 1 streams wave 1 (6/7 of
    events, one file ⇒ one data batch) and its no-data finalize batch
    emits every window whose end ≤ wm1 = max(wave-1 ts) − 10 min and
    evicts their state, persisting wm1 in the checkpoint. Run 2 appends
    wave 2 (the ``event_id % LATE_MOD = 0`` rows — timestamps spread over
    the whole range, so most are genuinely late): rows whose window end ≤
    wm1 are dropped at the stateful operator, survivors join wave-1 state
    in still-open windows, and the finalize batch closes ends ≤ wm2.
    Watermark advance uses ALL observed rows (late ones included — Spark
    collects event-time stats before the late filter), so wm2 =
    max(all ts) − 10 min; the oracle states the full rule in SQL. At
    scale this is the production backfill-collision shape: a replayed
    partition must not corrupt windows the stream already sealed."""
    import os

    from ..streaming.ingest import windowed_counts
    from .common import scratch_dir

    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        tag = os.path.basename(os.path.normpath(sf_dir))
        run = scratch_dir(spark, f"stream-late-{tag}-{_RUN}-{next(_SEQ)}")
        src, out, ckpt = (os.path.join(run, d) for d in
                          ("src", "out", "ckpt"))
        ev = load_events(spark, sf_dir).select(
            "event_id", "ts", "event_type", "value")

        def run_once():
            stream = (spark.readStream
                      .schema("event_id bigint, ts timestamp, "
                              "event_type string, value double")
                      .parquet(src))
            agg = windowed_counts(stream, ts_col="ts",
                                  window_duration="1 hour",
                                  watermark_delay="10 minutes",
                                  key_col="event_type")
            q = (agg.withColumn("sum_value", F.round("sum_value", 2))
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            _await(q)

        (ev.where(F.col("event_id") % LATE_MOD != 0)
         .coalesce(1).write.mode("overwrite").parquet(src))
        run_once()  # seals windows ≤ wm1, checkpoints the watermark
        (ev.where(F.col("event_id") % LATE_MOD == 0)
         .coalesce(1).write.mode("append").parquet(src))
        run_once()  # late wave: drops vs wm1, closes the rest vs wm2
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return spark.read.schema(
        "window_start timestamp, window_end timestamp, event_type string, "
        "n_events bigint, sum_value double").parquet(out)


def q_stream_window_tvx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode tumbling windows driven BY THE TVX SOURCE —
    the shape q_stream_window runs over Spark's native file source,
    re-expressed over the versioned commit log with the availableNow
    demotion worked around by TWO sequential runs sharing one checkpoint:

    run 1 streams the "early" commit (all days before the corpus's last
    day) into window state and checkpoints its watermark
    (max(batch-1 ts) − 10 min); run 2 streams the last-day commit, and
    Spark evicts+emits every window whose end ≤ that checkpointed
    watermark. The emitted set is therefore EXACTLY the batch-1 windows
    closed by the batch-1 watermark — batch-2 rows land in the last
    day's windows, all still open — which is what the oracle computes.
    The split is DAY-aligned on purpose: the trailing commit then only
    ADDS partitions (the daily-ingest shape), so the source re-reads
    nothing and the emission cannot depend on cross-restart late-row
    filtering of replayed rows. A continuous production run emits the
    trailing windows on later triggers — nothing here is availableNow-
    specific except the pause between runs."""
    import os

    from ..streaming.ingest import windowed_counts
    from ..streaming.source import register
    from .common import scratch_dir

    register(spark)
    eng = _engine(spark)
    table = f"vx.winsrc_{next(_SEQ)}"
    eng.create_table(table,
                     schema_ddl=("event_id bigint, ts timestamp, "
                                 "event_type string, value double, "
                                 "event_date date"),
                     partition_columns=["event_date"])
    loc = eng.definition(table).location
    ev = (load_events(spark, sf_dir)
          .select("event_id", "ts", "event_type", "value",
                  F.to_date("ts").alias("event_date")))
    cutoff = ev.agg(
        F.date_trunc("day", F.max("ts")).alias("c")).first()["c"]
    eng.insert(ev.where(F.col("ts") < F.lit(cutoff)), table,
               "tester", "early days")

    run = scratch_dir(spark, f"stream-wintvx-{_RUN}-{next(_SEQ)}")
    out, ckpt = os.path.join(run, "out"), os.path.join(run, "ckpt")

    def run_once():
        stream = (spark.readStream.format("tvx")
                  .option("location", loc).load()
                  .select("ts", "event_type", "value"))
        agg = windowed_counts(stream, ts_col="ts",
                              window_duration="1 hour",
                              watermark_delay="10 minutes",
                              key_col="event_type")
        q = (agg.withColumn("sum_value", F.round("sum_value", 2))
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        _await(q)

    run_once()  # batch 1 into state; nothing closed yet
    eng.insert(ev.where(F.col("ts") >= F.lit(cutoff)), table,
               "tester", "last day", mode="append")
    run_once()  # watermark from run 1 closes the batch-1 windows
    return spark.read.schema(
        "window_start timestamp, window_end timestamp, event_type string, "
        "n_events bigint, sum_value double").parquet(out)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch streaming deduplication: the full events set is landed
    TWICE (two identical files) and streamed one file per micro-batch;
    ``dropDuplicates("event_id")`` holds per-key state across batches, so
    the replayed second batch contributes NOTHING — the exactly-once
    guard a streaming ingest puts in front of an at-least-once upstream.
    The oracle is simply the distinct event set: hash-matching it proves
    the replay was fully absorbed by state.

    At scale the key state is hash-partitioned across executors; a
    production pipeline bounds it with
    ``dropDuplicatesWithinWatermark`` once upstream replays have a known
    lateness horizon."""
    import os

    from .common import (build_once, corpus_tag, fs_copy_file,
                         fs_list_files, scratch_dir)

    tag = corpus_tag(sf_dir)
    src = scratch_dir(spark, f"stream-dedup-src2-{tag}")

    # scratch may be a shared-storage URI on a cluster — every touch goes
    # through Hadoop's FileSystem, never os.*/shutil
    def _export():
        tmp = scratch_dir(spark, f"stream-dedup-tmp-{tag}")
        # land ONE deterministic representative per event_id (min of each
        # payload column): dropDuplicates picks an arbitrary row when ids
        # repeat, so without this the query and the oracle could disagree
        # on which payload survives — the test must not depend on
        # event_id uniqueness in the testdata
        (load_events(spark, sf_dir)
         .groupBy("event_id")
         .agg(F.min("user_id").alias("user_id"),
              F.min("event_type").alias("event_type"),
              F.min("value").alias("value"))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = next(f for f in sorted(fs_list_files(spark, tmp))
                    if f.endswith(".parquet"))
        fs_copy_file(spark, os.path.join(tmp, part),
                     os.path.join(src, "f1.parquet"))
        fs_copy_file(spark, os.path.join(tmp, part),
                     os.path.join(src, "f2.parquet"))

    # marker = LAST-written file, so a crash mid-setup re-runs the export
    build_once(spark, src, _export, marker="f2.parquet")
    run = scratch_dir(spark, f"stream-dedup-run-{tag}-{_RUN}-{next(_SEQ)}")
    stream = (spark.readStream
              .schema("event_id bigint, user_id bigint, "
                      "event_type string, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(src)
              .dropDuplicates(["event_id"]))
    q = (stream.writeStream.format("parquet")
         .option("path", os.path.join(run, "out"))
         .option("checkpointLocation", os.path.join(run, "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    return spark.read.parquet(os.path.join(run, "out"))


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with event-time interval condition and
    watermarks on both sides — the hardest built-in streaming join shape:
    every purchase joined to the same user's view events from the
    preceding hour. Both sides carry watermarks (10 min), which is what
    lets Spark bound the join state (view rows older than the watermark
    minus the interval are evicted); the join itself is an equi-join on
    user_id plus a time-range predicate, so state is hash-partitioned by
    user across executors.

    Determinism: inner stream-stream joins emit a match as soon as both
    rows are present — no closed-window gating — so under availableNow
    the emitted set equals the batch interval join, which is the oracle.
    Sum over matches is integer event_id arithmetic (no float hazard)."""
    import os

    from .common import scratch_dir

    from .common import build_once, corpus_tag

    tag = corpus_tag(sf_dir)
    src = scratch_dir(spark, f"stream-join-src-{tag}")

    def _export():
        ev = load_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value")
        (ev.where(F.col("event_type") == "view")
         .write.mode("overwrite").parquet(os.path.join(src, "views")))
        (ev.where(F.col("event_type") == "purchase")
         .write.mode("overwrite").parquet(os.path.join(src, "purchases")))

    # the marker is the LAST-written export, so a crash mid-setup re-runs
    # the whole export instead of leaving a half-built source
    build_once(spark, src, _export,
               marker=os.path.join("purchases", "_SUCCESS"))
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    views = (spark.readStream.schema(schema)
             .parquet(os.path.join(src, "views"))
             .select(F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"),
                     F.col("user_id").alias("v_user"))
             .withWatermark("view_ts", "10 minutes"))
    purchases = (spark.readStream.schema(schema)
                 .parquet(os.path.join(src, "purchases"))
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"), "user_id")
                 .withWatermark("purchase_ts", "10 minutes"))
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner").select("purchase_id", "user_id", "view_id")
    run = scratch_dir(spark, f"stream-join-run-{tag}-{_RUN}-{next(_SEQ)}")
    q = (joined.writeStream.format("parquet")
         .option("path", os.path.join(run, "out"))
         .option("checkpointLocation", os.path.join(run, "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    # explicit schema: zero matched pairs = empty sink dir = inference crash
    out = spark.read.schema(
        "purchase_id bigint, user_id bigint, view_id bigint"
        ).parquet(os.path.join(run, "out"))
    # doc-grain summary keeps the compare payload small and integer-exact
    return (out.groupBy("user_id")
            .agg(F.count("*").alias("n_pairs"),
                 F.min("purchase_id").alias("first_purchase"),
                 F.max("view_id").alias("last_view")))


STREAM_SESSION_GAP_MIN = 30


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user gap-sessionization via
    ``applyInPandasWithState`` — the arbitrary-state API Spark offers where
    built-in windows can't express the semantics (session boundaries depend
    on inter-event gaps, not fixed buckets).

    State per user is O(1): the OPEN session's running aggregates +
    last-seen timestamp. Each micro-batch sorts the user's new rows by
    event time, closes sessions whose gap exceeds 30 min, emits the closed
    sessions plus the (possibly still-growing) open one, and stores the
    open session back. Under availableNow on a single-commit table the one
    batch carries each user's full history, so the emitted rows equal the
    batch sessionization exactly — ``q_sessionize``'s oracle verbatim. On
    a live stream the same operator keeps emitting; the open session's row
    is re-emitted corrected as it grows (idempotent upsert sink keyed on
    (user_id, sess_no) — the standard pattern).

    Scale: one shuffle on user_id; state is per-key in the executor state
    store; a user's per-batch rows are concatenated in memory (bounded by
    per-batch volume, not history)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..streaming.source import register

    register(spark)
    loc = _events_ts_location(spark, sf_dir)
    name = f"tvx_stream_sess_{next(_SEQ)}"
    stream = (spark.readStream.format("tvx").option("location", loc).load()
              .select("event_id", "ts", "user_id", "value"))
    gap = pd.Timedelta(minutes=STREAM_SESSION_GAP_MIN)

    def update(key, pdfs, state):
        (user_id,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            sess_no, n, s, first, last, last_ts = state.get
            last_ts = pd.Timestamp(last_ts)
        else:
            sess_no, n, s, first, last, last_ts = 0, 0, 0.0, None, None, None
        out = []
        for ts, eid, val in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            if last_ts is None or (ts - last_ts) > gap:
                if n:
                    out.append((user_id, sess_no, n, round(s, 4), first, last))
                sess_no, n, s, first, last = sess_no + 1, 0, 0.0, None, None
            n += 1
            s += float(val)
            first = int(eid) if first is None else min(first, int(eid))
            last = int(eid) if last is None else max(last, int(eid))
            last_ts = ts
        out.append((user_id, sess_no, n, round(s, 4), first, last))
        state.update((int(sess_no), int(n), float(s), int(first), int(last),
                      last_ts.to_pydatetime()))
        yield pd.DataFrame(out, columns=["user_id", "sess_no", "n_events",
                                         "sum_value", "first_event",
                                         "last_event"])

    sessions = (stream.groupBy("user_id")
                .applyInPandasWithState(
                    update,
                    outputStructType=("user_id bigint, sess_no bigint, "
                                      "n_events bigint, sum_value double, "
                                      "first_event bigint, last_event bigint"),
                    stateStructType=("sess_no bigint, n_events bigint, "
                                     "sum_value double, first_event bigint, "
                                     "last_event bigint, last_ts timestamp"),
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout))
    q = (sessions.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    return spark.table(name)


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widening schema evolution on a branch of the base table: the earliest
    day is reprocessed with a NEW ``source`` column (``evolve_schema=True``
    — extension; the reference rejects schema drift outright). Readers see
    the union schema: reprocessed rows carry the value, untouched
    partitions' rows surface NULL — Parquet-style additive evolution with
    no rewrite of old versions."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    ev = _events_for_insert(spark, sf_dir)
    widened = (ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("source", F.lit("reproc")))
    eng.insert(widened, table, "tester", "reprocess with provenance column",
               evolve_schema=True)
    return eng.read(table).select("event_id", "user_id", "event_type",
                                  "value", "event_date", "source")


def q_multi_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level partition versioning on ORC (the reference's A3
    ``ad_impressions`` scenario: multi-column partitions, STORED AS orc —
    ``MultiPartitionTableLoaderSpec.scala:37-45``): events partitioned by
    (event_date, event_type); a read filtered on both columns prunes to a
    single leaf partition directory."""
    st = _shared(spark, sf_dir)
    eng = st["eng"]
    if "multipart_min_type" not in st:
        ev = _events_for_insert(spark, sf_dir)
        eng.create_table("vx.events_mp", schema_ddl=EVENTS_DDL,
                         partition_columns=["event_date", "event_type"],
                         format="orc")
        eng.insert(ev, "vx.events_mp", "tester", "all days, orc")
        st["multipart_min_type"] = (
            ev.agg(F.min("event_type")).collect()[0][0])
    return (eng.read("vx.events_mp")
            .where((F.col("event_date") == F.lit(st["min_date"]))
                   & (F.col("event_type") == st["multipart_min_type"]))
            .select("event_id", "user_id", "value"))


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE from the commit log: per-column min/max and row count of the
    base table folded purely from the stats payloads riding its commits —
    no data scan, no Spark job. The oracle computes the same numbers by
    scanning the raw events table, so a hash-match proves the recorded
    stats are exact — the invariant the per-file data-skipping read
    (``read(stats_filter=...)``) silently relies on."""
    st = _shared(spark, sf_dir)
    stats = st["eng"].table_stats("vx.events_base")
    assert not stats["missing"], stats["missing"]
    c = stats["columns"]
    row = (int(stats["rows"]),
           int(c["event_id"]["min"]), int(c["event_id"]["max"]),
           int(c["user_id"]["min"]), int(c["user_id"]["max"]))
    return spark.createDataFrame(
        [row], "n_rows bigint, min_event bigint, max_event bigint, "
               "min_user bigint, max_user bigint")


def q_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll back by committing forward (engine.restore, Delta RESTORE
    shape): after reprocessing the earliest day on a branch, restoring to
    the pre-reprocess commit must read byte-identical to the original
    events — with history staying linear and append-only (the bad commit
    remains time-travelable; q_time_travel covers that side)."""
    st = _shared(spark, sf_dir)
    eng, min_date = st["eng"], st["min_date"]
    table = _clone_base(st)
    good = eng.updates(table)[0].commit_id  # the clone commit
    ev = _events_for_insert(spark, sf_dir)
    eng.insert(ev.where(F.col("event_date") == F.lit(min_date))
                 .withColumn("value", F.col("value") * 2),
               table, "tester", "bad reprocess")
    eng.restore(table, good, user_id="tester")
    return eng.read(table).select(
        "event_id", "user_id", "event_type", "value", "event_date")


QUERIES = {
    "q_stream_agg": q_stream_agg,
    "q_stream_sink": q_stream_sink,
    "q_stream_cdf": q_stream_cdf,
    "q_stream_window": q_stream_window,
    "q_stream_late": q_stream_late,
    "q_history": q_history,
    "q_tpch_refresh": q_tpch_refresh,
    "q_stream_update_mode": q_stream_update_mode,
    "q_table_diff": q_table_diff,
    "q_stream_merge": q_stream_merge,
    "q_stream_static_join": q_stream_static_join,
    "q_stream_window_tvx": q_stream_window_tvx,
    "q_stream_session": q_stream_session,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_join": q_stream_join,
    "q_restore": q_restore,
    "q_schema_evolution": q_schema_evolution,
    "q_multi_partition_prune": q_multi_partition_prune,
    "q_table_stats": q_table_stats,
    "q_change_feed": q_change_feed,
    "q_clustered_skipping": q_clustered_skipping,
    "q_zorder_skipping": q_zorder_skipping,
    "q_derived_partition": q_derived_partition,
    "q_rename_column": q_rename_column,
    "q_drop_column": q_drop_column,
    "q_bloom_skipping": q_bloom_skipping,
    "q_vacuum_invariant": q_vacuum_invariant,
    "q_compact_invariant": q_compact_invariant,
    "q_snapshot_replace": q_snapshot_replace,
    "q_time_travel": q_time_travel,
    "q_time_travel_ts": q_time_travel_ts,
    "q_insert_overwrite_partition": q_insert_overwrite_partition,
    "q_partition_prune": q_partition_prune,
    "q_upsert": q_upsert,
    "q_delete": q_delete,
    "q_delete_dv": q_delete_dv,
    "q_update": q_update,
    "q_update_dv": q_update_dv,
    "q_change_feed_rows": q_change_feed_rows,
    "q_change_feed_rewrite": q_change_feed_rewrite,
    "q_change_feed_per_commit": q_change_feed_per_commit,
    "q_merge": q_merge,
    "q_bucketed_join": q_bucketed_join,
    "q_rollup_incremental": q_rollup_incremental,
}

ORACLES = {
    "q_stream_agg": (
        "SELECT event_type, COUNT(*) AS n, "
        "MIN(event_id) AS min_event, MAX(event_id) AS max_event, "
        "CAST(SUM(user_id) AS BIGINT) AS sum_user "
        "FROM events GROUP BY event_type"),
    "q_stream_sink": (
        "SELECT event_type, COUNT(*) AS n, "
        "MIN(event_id) AS min_event, MAX(event_id) AS max_event, "
        "CAST(SUM(user_id) AS BIGINT) AS sum_user "
        "FROM events GROUP BY event_type"),
    "q_stream_cdf": (
        "SELECT 'insert' AS _change_type, COUNT(*) AS n, "
        "MIN(event_id) AS min_event, MAX(event_id) AS max_event, "
        "CAST(SUM(event_id) AS BIGINT) AS sum_event FROM events "
        "UNION ALL "
        "SELECT 'delete', COUNT(*), MIN(event_id), MAX(event_id), "
        "CAST(SUM(event_id) AS BIGINT) FROM events "
        "WHERE event_type = 'error'"),
    "q_stream_window": (
        # closed-window rule: a window row appears iff its end ≤ the final
        # watermark (max event time − 10 min); hour buckets are epoch-
        # aligned, so date_trunc('hour') IS Spark's window start
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value "
        "FROM events), "
        "wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM e) "
        "SELECT DATE_TRUNC('hour', ts) AS window_start, "
        "DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end, "
        "event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM e GROUP BY DATE_TRUNC('hour', ts), event_type "
        "HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= "
        "(SELECT w FROM wm)"),
    "q_tpch_refresh": (
        "WITH final AS ("
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE o_orderkey % 10 <> 3 "
        "UNION ALL "
        f"SELECT o_orderkey + {RF_KEY_OFFSET}, o_orderstatus, "
        "o_totalprice FROM orders WHERE o_orderkey % 10 = 7) "
        "SELECT o_orderstatus, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS sum_price, "
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
        "FROM final GROUP BY o_orderstatus"),
    "q_stream_update_mode": (
        "SELECT 'click' AS event_type, count(*) AS n_events, "
        "CAST(sum(event_id) AS BIGINT) AS sum_eid "
        "FROM events WHERE event_type = 'click'"),
    "q_table_diff": (
        "WITH base AS (SELECT event_id, min(event_type) AS event_type "
        "FROM events GROUP BY event_id) "
        "SELECT event_id, 'removed' AS status FROM base "
        "WHERE event_type = 'error' "
        "UNION ALL SELECT event_id, 'changed' FROM base "
        "WHERE event_type = 'click' "
        "UNION ALL SELECT -777, 'added'"),
    "q_stream_merge": (
        "WITH base AS (SELECT event_id, min(user_id) AS user_id, "
        "min(event_type) AS event_type, min(value) AS value "
        "FROM events GROUP BY event_id) "
        "SELECT event_id, user_id, event_type, value FROM base "
        f"WHERE event_id % {SMERGE_UPD_MOD} <> 0 "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value * 3 FROM base "
        f"WHERE event_id % {SMERGE_UPD_MOD} = 0 "
        "UNION ALL "
        "SELECT event_id + (SELECT MAX(event_id) + 1 FROM base), "
        "user_id, event_type, value + 1 "
        f"FROM base WHERE event_id % {SMERGE_NEW_MOD} = 0"),
    "q_stream_static_join": (
        "SELECT c_mktsegment, COUNT(*) AS n_events, "
        "CAST(SUM(event_id) AS BIGINT) AS sum_eid, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM events JOIN customer ON c_custkey = user_id + 1 "
        "GROUP BY c_mktsegment"),
    "q_history": (
        "SELECT * FROM (VALUES "
        "(CAST(3 AS BIGINT), 'ops', 'reprice clicks'), "
        "(2, 'auditor', 'purge errors'), "
        "(1, 'loader', 'load all days'), "
        "(0, 'creator', 'create events table')) "
        "AS t(seq, user_id, message)"),
    "q_stream_late": (
        # two-run late-data rule: wave-2 rows (event_id % LATE_MOD = 0)
        # whose window end ≤ wm1 = max(wave-1 ts) − 10 min were dropped by
        # the checkpointed watermark; everything else aggregates, and a
        # window emits iff its end ≤ wm2 = max(ALL ts) − 10 min (late rows
        # still advance event-time stats)
        "WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
        "event_type, value FROM events), "
        f"w1 AS (SELECT * FROM e WHERE event_id % {LATE_MOD} <> 0), "
        "wm1 AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM w1), "
        "wm2 AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM e), "
        "surv AS (SELECT * FROM w1 UNION ALL "
        f"SELECT * FROM e WHERE event_id % {LATE_MOD} = 0 "
        "AND DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR > "
        "(SELECT w FROM wm1)) "
        "SELECT DATE_TRUNC('hour', ts) AS window_start, "
        "DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end, "
        "event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM surv GROUP BY DATE_TRUNC('hour', ts), event_type "
        "HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= "
        "(SELECT w FROM wm2)"),
    "q_stream_window_tvx": (
        # two-run availableNow drive: the emitted set is the batch-1
        # (ts before the corpus's last day) windows whose end ≤ batch-1's
        # final watermark; batch-2 windows are all still open
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value "
        "FROM events), "
        "cut AS (SELECT DATE_TRUNC('day', MAX(ts)) AS c FROM e), "
        "b1 AS (SELECT * FROM e WHERE ts < (SELECT c FROM cut)), "
        "wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM b1) "
        "SELECT DATE_TRUNC('hour', ts) AS window_start, "
        "DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end, "
        "event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM b1 GROUP BY DATE_TRUNC('hour', ts), event_type "
        "HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= "
        "(SELECT w FROM wm)"),
    "q_stream_dedup": (
        # same deterministic per-id representative the landed source
        # carries (min of each payload column) — no reliance on event_id
        # uniqueness in the testdata on either side
        "SELECT event_id, MIN(user_id) AS user_id, "
        "MIN(event_type) AS event_type, MIN(value) AS value "
        "FROM events GROUP BY event_id"),
    "q_stream_join": (
        "WITH e AS (SELECT event_id, user_id, event_type, "
        "CAST(ts AS TIMESTAMP) AS ts FROM events), "
        "j AS (SELECT p.event_id AS purchase_id, p.user_id, "
        "v.event_id AS view_id "
        "FROM e p JOIN e v ON p.event_type = 'purchase' "
        "AND v.event_type = 'view' AND v.user_id = p.user_id "
        "AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR) "
        "SELECT user_id, COUNT(*) AS n_pairs, "
        "MIN(purchase_id) AS first_purchase, MAX(view_id) AS last_view "
        "FROM j GROUP BY user_id"),
    "q_stream_session": (
        # identical session definition to q_sessionize's oracle: new
        # session when the same-user gap exceeds 30 min, ordered (ts,
        # event_id)
        "WITH e AS (SELECT event_id, user_id, value, "
        "CAST(ts AS TIMESTAMP) AS ts FROM events), "
        "g AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL "
        "OR (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) / 60000000.0 > 30 "
        "THEN 1 ELSE 0 END AS ns_flag FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, CAST(SUM(ns_flag) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS sess_no FROM g) "
        "SELECT user_id, sess_no, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 4) AS sum_value, "
        "MIN(event_id) AS first_event, MAX(event_id) AS last_event "
        "FROM s GROUP BY user_id, sess_no"),
    "q_restore": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events"),
    "q_table_stats": (
        "SELECT COUNT(*) AS n_rows, "
        "MIN(event_id) AS min_event, MAX(event_id) AS max_event, "
        "MIN(user_id) AS min_user, MAX(user_id) AS max_user FROM events"),
    "q_schema_evolution": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, 'reproc' AS source FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, CAST(NULL AS VARCHAR) AS source "
        f"FROM events WHERE CAST(ts AS DATE) <> {_MIN_DATE_SQL}"),
    "q_multi_partition_prune": (
        "SELECT event_id, user_id, value FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "AND event_type = (SELECT MIN(event_type) FROM events)"),
    "q_clustered_skipping": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "WHERE value >= 10.0 AND value <= 20.0"),
    "q_rename_column": (
        "SELECT event_id, user_id, event_type, value AS amount, "
        "CAST(ts AS DATE) AS event_date FROM events"),
    "q_drop_column": (
        "SELECT event_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "UNION ALL SELECT event_id + 1000000, event_type, value, "
        "CAST(ts AS DATE) FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL}"),
    "q_derived_partition": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL}"),
    "q_zorder_skipping": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "WHERE value >= 10.0 AND value <= 20.0 "
        "AND user_id >= 1 AND user_id <= 8"),
    "q_bloom_skipping": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "WHERE event_id = 777"),
    "q_vacuum_invariant": (
        "SELECT event_id, user_id, event_type, value * 2 AS value, "
        f"CAST(ts AS DATE) AS event_date FROM events WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date "
        f"FROM events WHERE CAST(ts AS DATE) <> {_MIN_DATE_SQL}"),
    "q_change_feed": (
        "SELECT event_id, user_id, event_type, value * 2 AS value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        f"WHERE CAST(ts AS DATE) = {_MIN_DATE_SQL}"),
    "q_compact_invariant": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events"),
    "q_snapshot_replace": "SELECT * FROM customer WHERE c_acctbal > 0",
    "q_time_travel": "SELECT * FROM customer",
    "q_time_travel_ts": "SELECT * FROM customer",
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
    "q_delete_dv": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date FROM events "
        "WHERE event_type <> 'error'"),
    "q_change_feed_rows": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, 'delete' AS _change_type "
        "FROM events WHERE event_type = 'error'"),
    "q_change_feed_rewrite": (
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, 'delete' AS _change_type "
        "FROM events WHERE event_type = 'error' "
        f"AND CAST(ts AS DATE) = {_MIN_DATE_SQL} "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value * 2 AS value, "
        "CAST(ts AS DATE) AS event_date, 'insert' AS _change_type "
        "FROM events WHERE event_type = 'error' "
        f"AND CAST(ts AS DATE) = {_MIN_DATE_SQL}"),
    "q_change_feed_per_commit": (
        # commit 1 (dv delete of errors): deletes of all error rows;
        # commit 2 (rewrite update of clicks): pre+post pair per click
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, 'delete' AS _change_type "
        "FROM events WHERE event_type = 'error' "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ts AS DATE) AS event_date, 'delete' AS _change_type "
        "FROM events WHERE event_type = 'click' "
        "UNION ALL "
        "SELECT event_id, user_id, event_type, value * 2 AS value, "
        "CAST(ts AS DATE) AS event_date, 'insert' AS _change_type "
        "FROM events WHERE event_type = 'click'"),
    "q_update": (
        "SELECT event_id, user_id, "
        "CASE WHEN event_type = 'error' THEN 'was_' || event_type "
        "ELSE event_type END AS event_type, "
        "CASE WHEN event_type = 'error' THEN value * 2 ELSE value END "
        "AS value, CAST(ts AS DATE) AS event_date FROM events"),
    "q_update_dv": (
        "SELECT event_id, user_id, "
        "CASE WHEN event_type = 'error' THEN 'was_' || event_type "
        "ELSE event_type END AS event_type, "
        "CASE WHEN event_type = 'error' THEN value * 2 ELSE value END "
        "AS value, CAST(ts AS DATE) AS event_date FROM events"),
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
