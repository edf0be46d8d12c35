"""Relational query surface (SURVEY §2.B).

Each query id maps to a (spark, sf_dir) -> DataFrame callable plus a DuckDB
oracle SQL string with matching column names/types. All queries are pure
DataFrame-API plans — Catalyst picks the physical strategy (broadcast vs
shuffle join, partial aggregation, whole-stage codegen).

Cross-engine determinism rules applied throughout:
- every aggregate over doubles is ROUNDed in BOTH engines (floating-point
  summation order differs between engines);
- integer-typed function results are cast so Spark/DuckDB types line up
  (e.g. Spark LENGTH→int vs DuckDB→BIGINT, DuckDB SUM(int)→HUGEINT);
- window/top-k queries carry a unique tiebreaker column in the ordering.

Reference citations for the reference-exercised subset are in SURVEY §2.B
(e.g. projection+distinct: ``spark/.../VersionContext.scala:98-99``; equality
filter: ``examples/.../DatePartitionedTableLoaderSpec.scala:88-91``; take/limit:
``spark/.../SparkHiveSuite.scala:106``).
"""

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from .common import distributed_prefix, ensure_compat, load, load_events

LINEITEM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus"]


# ---------------------------------------------------------------- scans

def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(*LINEITEM_COLS)


def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write+read round trip (format plumbing as in reference
    ``VersionContext.scala:132-136``)."""
    ensure_compat(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="tvx-orc-"), "supplier_orc")
    load(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return spark.read.orc(out)


def q_scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("tvx_nation_view")
    return spark.table("tvx_nation_view")


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .where(F.col("l_returnflag") == F.lit("R"))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))


def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .orderBy("o_orderkey").limit(100)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = cust.where(F.col("c_acctbal") < 0).select("c_custkey", "c_acctbal")
    return a.unionByName(b)


def q_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


def q_create_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = [(1, "alpha"), (2, "beta"), (3, "gamma")]
    return spark.createDataFrame(data, "id bigint, name string")


def q_typed_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").cast("string").alias("okey_str"),
                    F.col("l_linenumber").cast("bigint").alias("lineno"),
                    F.col("l_quantity").cast("bigint").alias("qty_int")))


# ---------------------------------------------------------------- joins

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey, "inner")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_price")))


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no completed ('F') orders."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    cust = load(spark, sf_dir, "customer")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the join type the inner/left/semi/anti ids can't
    witness: per-nation order totals (via customer) full-outer-joined
    against per-nation supplier counts, so nations missing from either
    side surface with NULLs on that side and the coalesced key survives.
    Both inputs pre-aggregate to |nations| rows before the join — the
    aggregate-then-outer-join shape that keeps the nullable side tiny."""
    cust_orders = (load(spark, sf_dir, "orders")
                   .join(load(spark, sf_dir, "customer"),
                         F.col("o_custkey") == F.col("c_custkey"))
                   .groupBy("c_nationkey")
                   .agg(F.count("*").alias("n_orders"),
                        F.round(F.sum("o_totalprice"), 2)
                        .alias("sum_price")))
    supp = (load(spark, sf_dir, "supplier")
            .groupBy("s_nationkey")
            .agg(F.count("*").alias("n_suppliers")))
    return (cust_orders.join(
                supp, cust_orders.c_nationkey == supp.s_nationkey, "outer")
            .select(F.coalesce("c_nationkey", "s_nationkey")
                    .alias("nationkey"),
                    "n_orders", "sum_price", "n_suppliers"))


def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup().applyInPandas`` — the two-sided Arrow-grouped API
    (next to q_udf/udaf/udtf's one-sided forms): each customer key's
    orders AND customer rows arrive as two pandas frames in one task;
    the function joins them imperatively (order count + total vs the
    account balance, flagging over-spenders). Keys present on only one
    side still fire with an empty peer frame — semantics a SQL FULL
    JOIN + GROUP BY states exactly, which is the oracle. One co-shuffle
    on the key, Arrow both ways, group state never leaves the task."""
    import pandas as pd

    orders = (load(spark, sf_dir, "orders")
              .select("o_custkey", "o_totalprice"))
    cust = (load(spark, sf_dir, "customer")
            .select("c_custkey", "c_acctbal"))

    def merge(key, od: pd.DataFrame, cd: pd.DataFrame) -> pd.DataFrame:
        bal = float(cd["c_acctbal"].iloc[0]) if len(cd) else None
        total = round(float(od["o_totalprice"].sum()), 2) if len(od) else 0.0
        return pd.DataFrame(
            [{"custkey": key[0], "n_orders": len(od), "sum_price": total,
              "acctbal": bal,
              "overspent": bal is not None and total > 100.0 * bal}])

    return (orders.groupBy("o_custkey")
            .cogroup(cust.groupBy("c_custkey"))
            .applyInPandas(merge,
                           "custkey bigint, n_orders bigint, "
                           "sum_price double, acctbal double, "
                           "overspent boolean"))


# ----------------------------------------------------------- aggregates

def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (the flagship agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("distinct_parts"),
                 F.countDistinct("l_suppkey").alias("distinct_supps")))


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — algorithm-specific, so rows-only check
    (no DuckDB oracle; HLL++ estimates differ across engines)."""
    return (load(spark, sf_dir, "lineitem")
            .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"),
                 F.approx_count_distinct("l_partkey").alias("approx_parts")))


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count("*").alias("n")))


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count("*").alias("n")))


# -------------------------------------------------------------- windows

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (load(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (load(spark, sf_dir, "orders")
            .withColumn("running_total", F.round(F.sum("o_totalprice").over(w), 2))
            .select("o_custkey", "o_orderkey", "running_total"))


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile / percent_rank / cume_dist
    per order-priority over total price. Ordering carries the unique
    o_orderkey tie-break so every rank family is deterministic
    cross-engine; the float ranks are 6-dp rounded (exact small-integer
    ratios, rounding is belt-and-braces). One shuffle on the partition
    key; whole-stage window evaluation, no Python."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice",
                    F.ntile(10).over(w).alias("decile"),
                    F.round(F.percent_rank().over(w), 6).alias("pr"),
                    F.round(F.cume_dist().over(w), 6).alias("cd")))


# ------------------------------------------------------- sort / set ops

def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "supplier")
            .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
            .select("s_suppkey", "s_name", "s_acctbal"))


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer keys minus those with an open ('O') order."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    with_open = (load(spark, sf_dir, "orders")
                 .where(F.col("o_orderstatus") == "O")
                 .select(F.col("o_custkey").alias("c_custkey")))
    return cust.subtract(with_open)


# ------------------------------------------------------ scalar functions

def q_set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (``intersectAll`` / ``exceptAll`` —
    SQL INTERSECT ALL / EXCEPT ALL): multiplicity-preserving overlap and
    difference of two overlapping lineitem slices, tagged and unioned
    into one result. Distinct from q_set_intersect/q_set_except, which
    pin the DISTINCT variants; the bag forms keep min(n_a, n_b) /
    max(n_a − n_b, 0) copies per value — a counting contract the
    DISTINCT ops can't witness. Plans as a counted aggregate + generate
    (no row-by-row anti semantics), shuffling each side once."""
    li = load(spark, sf_dir, "lineitem")
    a = (li.where(F.col("l_linenumber") <= 2)
         .select("l_quantity", "l_returnflag"))
    b = (li.where(F.col("l_linenumber") >= 2)
         .select("l_quantity", "l_returnflag"))
    return (a.intersectAll(b).withColumn("op", F.lit("intersect"))
            .unionByName(
                b.exceptAll(a).withColumn("op", F.lit("except"))))


def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "part")
            .select("p_partkey",
                    F.upper("p_brand").alias("brand_u"),
                    F.lower("p_type").alias("type_l"),
                    F.substring("p_name", 1, 5).alias("name5"),
                    F.length("p_type").cast("bigint").alias("type_len"),
                    F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
                    F.trim(F.lit("  x  ")).alias("trimmed")))


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function surface: per-order sorted quantity array via
    collect_list + array_sort, probed with element_at (both ends), an
    ``aggregate`` fold (sum over the SORTED sequence, so the float fold
    order is engine-independent; 2-dp round as belt), and
    array_contains. One partial-agg shuffle on the group key; the array
    ops are per-row JVM expressions on the grouped result."""
    arr = F.array_sort(F.collect_list("l_quantity"))
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(arr.alias("arr"))
            .select("l_orderkey",
                    F.size("arr").cast("bigint").alias("n_items"),
                    F.element_at("arr", 1).alias("qty_min"),
                    F.element_at("arr", -1).alias("qty_max"),
                    F.round(F.expr(
                        "aggregate(arr, CAST(0 AS DOUBLE), "
                        "(acc, x) -> acc + x)"), 2).alias("qty_sum"),
                    F.array_contains("arr", 1.0).alias("has_single")))


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type surface: per-order linenumber→quantity map via
    map_from_entries over a sorted entry list, probed with element_at
    (NULL on absent key), map_values/map_keys + array_max. Linenumbers
    are NOT unique per order in this corpus, so entries pre-aggregate to
    (order, line)→max(quantity) — map_from_entries on duplicate keys is
    an error in both engines, and the dedup IS the semantic point. Only
    scalars are projected out (no map column reaches the hash compare)."""
    li = load(spark, sf_dir, "lineitem")
    d = (li.groupBy("l_orderkey", "l_linenumber")
         .agg(F.max("l_quantity").alias("q")))
    entries = F.array_sort(F.collect_list(
        F.struct(F.col("l_linenumber").alias("key"),
                 F.col("q").alias("value"))))
    g = (d.groupBy("l_orderkey")
         .agg(F.map_from_entries(entries).alias("m")))
    return g.select(
        "l_orderkey",
        F.size("m").alias("n_keys"),
        F.element_at("m", F.lit(1)).alias("q1"),
        F.array_max(F.map_values("m")).alias("q_max"),
        F.array_max(F.map_keys("m")).alias("k_max"))


def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped MEDIAN (interpolated, percentile semantics both
    engines share) plus a DETERMINISTIC MODE: Spark's builtin ``mode()``
    picks an arbitrary value on frequency ties, so the mode here is
    derived from the (flag, quantity) count table with a total
    (count DESC, value ASC) ordering — reproducible on any engine. Two
    tiny aggregations (the count table is |flags|·|distinct qty| rows)
    joined broadcast-side."""
    li = load(spark, sf_dir, "lineitem")
    med = (li.groupBy("l_returnflag")
           .agg(F.round(F.percentile("l_quantity", F.lit(0.5)), 6)
                .alias("median_qty")))
    counts = (li.groupBy("l_returnflag", "l_quantity")
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_quantity"))
    mode = (counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("l_returnflag", F.col("l_quantity").alias("mode_qty"),
                    F.col("cnt").alias("mode_n")))
    return med.join(mode, "l_returnflag")


def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function surface over part names: first-word extraction via a
    capture group, vowel stripping via global replace, and an rlike/
    regexp_matches flag. Patterns deliberately stay inside the
    Java-regex ∩ RE2 dialect intersection (character classes, anchors,
    capture groups — no lookaround, no backrefs), the same discipline
    ``q_pii_redact``'s pattern documents; that intersection is what makes
    a cross-engine regex oracle sound. One codegen'd scan, no shuffle."""
    return (load(spark, sf_dir, "part")
            .select("p_partkey",
                    F.regexp_extract("p_name", r"^([a-z]+)", 1)
                    .alias("first_word"),
                    F.regexp_replace("p_name", r"[aeiou]", "")
                    .alias("devoweled"),
                    F.col("p_name").rlike(r"^[a-z]+ [a-z]+$")
                    .alias("two_words"),
                    F.regexp_extract("p_type", r"([A-Z]+)$", 1)
                    .alias("type_tail")))


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .where(F.col("l_linenumber") == 1)
            .select("l_orderkey",
                    F.round("l_extendedprice", 4).alias("price_r"),
                    F.abs(F.col("l_discount") - 0.05).alias("disc_diff"),
                    F.floor("l_quantity").cast("bigint").alias("qty_floor"),
                    F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
                    F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt")))


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
                    F.year("o_orderdate").cast("bigint").alias("order_year"),
                    F.month("o_orderdate").cast("bigint").alias("order_mon"),
                    F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
                     .cast("bigint").alias("days_since_95")))


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join via functions.skew.salted_join: lineitem salted,
    supplier replicated — identical semantics to the plain join, so the plain
    SQL join is the oracle (the salting must be invisible in the result)."""
    from ..functions.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (salted_join(li, supp, "s_suppkey", salt=8)
            .groupBy(F.col("s_nationkey").cast("bigint").alias("nationkey"))
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_price")))


def q_date_from_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC timestamp→date derivation (reference ``DateTime.scala:10-13``,
    used for partition values at ``DatePartitionedTableLoaderSpec.scala:166-168``)."""
    from ..functions.timestamps import to_utc_date
    from .common import load_events

    ev = load_events(spark, sf_dir)
    return ev.select("event_id", to_utc_date("ts").alias("event_date"))


def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source round-trip (sources.read dispatch): the customer table is
    exported to CSV once under scratch and read back with an EXPLICIT
    schema (inference is a full extra data pass at scale — sources.read
    refuses to infer). Exact: Spark writes doubles in shortest-round-trip
    form, so text→double reproduces the bits, and the oracle is the
    original parquet table."""
    from ..sources.readers import read
    from .common import build_once, corpus_tag, scratch_dir

    src = scratch_dir(spark, "csv-customer-" + corpus_tag(sf_dir))
    build_once(spark, src,
               lambda: (load(spark, sf_dir, "customer")
                        .write.mode("overwrite")
                        .option("header", "true").csv(src)))
    return read(spark, src, format="csv", header="true",
                schema=("c_custkey bigint, c_name string, c_nationkey int, "
                        "c_acctbal double, c_mktsegment string"))


def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip (sources.read dispatch): orders
    exported once, read back with an explicit schema — timestamps
    round-trip at µs through ISO-8601 in the UTC session zone."""
    from ..sources.readers import read
    from .common import build_once, corpus_tag, scratch_dir

    src = scratch_dir(spark, "json-orders-" + corpus_tag(sf_dir))
    build_once(spark, src,
               lambda: (load(spark, sf_dir, "orders")
                        .write.mode("overwrite").json(src)))
    return read(spark, src, format="json",
                schema=("o_orderkey bigint, o_custkey bigint, "
                        "o_orderstatus string, o_totalprice double, "
                        "o_orderdate timestamp, o_orderpriority string"))


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction over ``events.props`` — both access
    styles a pipeline uses: path extraction (``get_json_object``, no schema
    needed) and schema-on-read parsing (``from_json`` to a typed struct).
    Both are JVM expressions inside whole-stage codegen — a Python
    ``json.loads`` UDF here would be the classic 100× slow path. At 100 TB
    the parse cost is per-row CPU on the scan, no shuffle; the downstream
    grouped aggregate is map-side combined."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.from_json("props", "k bigint").alias("p"))
    return (parsed
            .withColumn("k", F.col("p.k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k_path").alias("min_k"),
                 F.max("k_path").alias("max_k"),
                 F.count(F.when(F.col("k") % 7 == 0, 1)).alias("n_div7")))


# ------------------------------------------------------------ pandas UDF

def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow-batched) scalar Pandas UDF — the sanctioned Python
    hot path (row-at-a-time Python UDFs are deliberately absent from this
    library). Per-row IEEE arithmetic is bit-deterministic, so the oracle is
    the equivalent SQL expression with no rounding."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def revenue(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    return (load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber",
                    revenue("l_extendedprice", "l_discount", "l_tax").alias("revenue")))


def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDAF (``pandas_udf`` over a whole group's
    series — the custom-aggregation surface next to ``q_udf_pandas``'s
    scalar form): discount-weighted mean price per return flag. Arrow ships
    each group's columns once; numpy reduces them. Group count is tiny and
    the shuffle is the same single hash partitioning any built-in agg pays.
    Weighted mean = sum(w·x)/sum(w) is two order-insensitive float sums —
    rounded to 6 dp, same determinism exposure as every SUM oracle here."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, disc: pd.Series) -> float:
        w = 1.0 - disc
        return float((price * w).sum() / w.sum())

    @pandas_udf("long")
    def grp_rows(price: pd.Series) -> int:
        # Spark disallows mixing pandas and built-in aggregates in one
        # agg(), so the row count is a second pandas UDAF
        return int(len(price))

    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(wmean("l_extendedprice", "l_discount"), 6)
                 .alias("disc_weighted_price"),
                 grp_rows("l_extendedprice").alias("n")))


def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (``@udtf`` — the 1→N row
    expansion surface; generators/explode's programmable cousin): each
    region row fans out into one row per comma-separated name prefix
    tier. Deterministic pure-Python row logic; at scale a UDTF runs
    per-partition like any generator. The oracle reproduces the expansion
    relationally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="r_regionkey int, tier int, prefix string")
    class Prefixes:
        def eval(self, r_regionkey: int, r_name: str):
            for tier in (1, 2, 3):
                yield r_regionkey, tier, r_name[:tier]

    spark.udtf.register("region_prefixes", Prefixes)
    load(spark, sf_dir, "region").createOrReplaceTempView("tvx_region_v")
    return spark.sql(
        "SELECT p.r_regionkey, p.tier, p.prefix "
        "FROM tvx_region_v r, "
        "LATERAL region_prefixes(r.r_regionkey, r.r_name) p")


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based frame, vs q_window_running's
    row-based frame): per customer, the sum of order totals within the
    trailing 30 days of each order — ordering on epoch days so the frame
    bound is numeric, the portable way to express a time-range frame."""
    from pyspark.sql import Window

    days = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = (Window.partitionBy("o_custkey").orderBy(days.cast("long"))
         .rangeBetween(-30, 0))
    return (load(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.round(F.sum("o_totalprice").over(w), 2)
                     .alias("trailing_30d_total")))


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (wide metrics → long (metric, value) rows — the shape
    feeding any generic metrics sink): per-returnflag aggregates unpivot
    into one row per (flag, metric). ``DataFrame.unpivot`` is a zero-
    shuffle projection on top of the aggregate — each input row expands
    to #metrics output rows map-side."""
    agg = (load(spark, sf_dir, "lineitem")
           .groupBy("l_returnflag")
           .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                F.count("*").cast("double").alias("n_items")))
    return agg.unpivot(["l_returnflag"],
                       ["sum_qty", "sum_price", "n_items"],
                       "metric", "val")


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond q_rollup/q_cube's fixed lattices):
    (flag, status), (flag), and grand total in ONE pass — Spark expands
    the sets in a single Expand+partial-agg plan, so the fact table is
    read and shuffled once no matter how many sets. ``grouping()`` flags
    disambiguate NULL-as-group from NULL-in-data."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tvx_li_gs")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping(l_returnflag) AS INT) AS g_flag, "
        "CAST(grouping(l_linestatus) AS INT) AS g_status, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n "
        "FROM tvx_li_gs GROUP BY GROUPING SETS "
        "((l_returnflag, l_linestatus), (l_returnflag), ())")


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift UNION — combining two extracts whose schemas have
    diverged (an old export without a column, a new one with an extra
    one), NULL-filling the gaps by NAME instead of by position:
    ``unionByName(allowMissingColumns=True)``, the DuckDB/modern-SQL
    ``UNION ALL BY NAME``. Positional UNION would silently misalign
    the shared columns; this is the append-log-of-heterogeneous-batches
    shape every long-lived ingestion hits. Zero shuffle — the union is
    a plan concatenation; each side NULL-pads map-side."""
    orders = load(spark, sf_dir, "orders")
    old = (orders.where(F.col("o_orderkey") % 2 == 0)
           .select("o_orderkey", "o_custkey", "o_totalprice"))
    new = (orders.where(F.col("o_orderkey") % 2 == 1)
           .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    return (old.unionByName(new, allowMissingColumns=True)
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderstatus"))


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (``PERCENTILE_DISC`` — the value actually
    present in the data, vs q_agg_median/q_quantiles' interpolated
    ``PERCENTILE_CONT``): per returnflag, the smallest l_extendedprice
    whose cumulative rank reaches p, for p ∈ {0.5, 0.9}. Spark has no
    discrete-percentile builtin, so this is the portable rank
    formulation — pick the first value whose cumulative row count
    reaches each threshold, all on integer counts: no interpolation,
    no float aggregation, bit-exact on any engine.

    Scale shape: a l_returnflag-partitioned window would sort a third
    of the fact table in ONE task (the tiny-partitionSpec scale-killer),
    so the plan first reduces to per-(group, value) counts — a map-side-
    combined groupBy that shrinks the prefix domain to DISTINCT values —
    and runs the cumulative count as :func:`distributed_prefix`'s
    two-phase range-partitioned scan. Value v's cumulative count equals
    the max row rank over v's rows, so "first value whose cum reaches
    the threshold" is exactly the window-rank answer (the oracle keeps
    the per-row window spelling)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag",
                                                "l_extendedprice")
    vals = (li.groupBy("l_returnflag", "l_extendedprice")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    cum = distributed_prefix(vals, ["l_extendedprice"], "cum",
                             group_cols=["l_returnflag"],
                             value=F.col("cnt"), kind="sum")
    totals = vals.groupBy("l_returnflag").agg(F.sum("cnt").alias("n"))
    picks = [F.min(F.when(F.col("cum") * 100 >= F.col("n") * p100,
                          F.col("l_extendedprice")))
             .alias(f"p{p100}_disc") for p100 in (50, 90)]
    return (cum.join(F.broadcast(totals), "l_returnflag")
            .groupBy("l_returnflag").agg(*picks))


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — the smallest value whose cumulative weight
    reaches half the group's total (here: l_extendedprice weighted by
    l_quantity per returnflag), the statistic behind "the price level
    where half the VOLUME sits" questions that an unweighted median
    answers wrongly.

    Scale shape: the per-row prefix sum would sort a third of the fact
    table in one task (tiny-partitionSpec window), so the plan reduces
    to per-(group, value) weight sums first — the median test only ever
    needs the cumulative weight AT a value boundary, which equals the
    max per-row running weight over that value's rows — and runs the
    prefix as :func:`distributed_prefix`'s two-phase scan over distinct
    values.

    Determinism note: l_quantity is integer-valued, so every per-value
    sum and prefix partial is an integer exactly representable in a
    double — both engines compare identical values at the threshold no
    matter the addition order (the oracle keeps the per-row ordered-
    window spelling)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity")
    vals = (li.groupBy("l_returnflag", "l_extendedprice")
            .agg(F.sum("l_quantity").alias("wt")))
    cum = distributed_prefix(vals, ["l_extendedprice"], "cw",
                             group_cols=["l_returnflag"],
                             value=F.col("wt"), kind="sum")
    totals = vals.groupBy("l_returnflag").agg(F.sum("wt").alias("tw"))
    return (cum.join(F.broadcast(totals), "l_returnflag")
            .where(F.col("cw") * 2 >= F.col("tw"))
            .groupBy("l_returnflag")
            .agg(F.min("l_extendedprice").alias("weighted_median")))


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG / string_agg — the report-building aggregate SQL
    warehouses expose as LISTAGG(... WITHIN GROUP (ORDER BY ...)). Spark
    has no ordered string aggregate, so the portable spelling is
    collect_list → array_sort → concat_ws: the collect is per-group
    bounded (nations per region ≤ 25 by schema), the sort runs inside
    the aggregation buffer, and the join side broadcasts. Deterministic
    by construction — the ORDER BY is total (names are unique)."""
    nations = (load(spark, sf_dir, "nation")
               .join(F.broadcast(load(spark, sf_dir, "region")),
                     F.col("n_regionkey") == F.col("r_regionkey")))
    return (nations.groupBy("r_name")
            .agg(F.count("*").alias("n_nations"),
                 F.concat_ws(",", F.array_sort(F.collect_list("n_name")))
                 .alias("nation_csv")))


def q_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` over a NULLABLE subquery column — the SQL
    trap with three-valued logic (one NULL in the subquery empties the
    whole result, because ``x <> NULL`` is UNKNOWN) and the surface
    Spark plans as a null-aware anti join (``BroadcastHashJoin …
    LeftAnti, BuildRight, true`` — the trailing flag; a plain anti join
    would silently return the wrong rows). The subquery key is wrapped
    in ``nullif`` so its TYPE is nullable and the null-aware plan is
    mandatory; the planted-NULL empty-result semantics are pinned in
    pytest (the corpus keys are never −1, so here the result is the
    meaningful segment rollup both engines agree on)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("tvx_cust_ni")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tvx_ord_ni")
    return spark.sql(
        "SELECT c_mktsegment, count(*) AS n_quiet "
        "FROM tvx_cust_ni WHERE c_custkey NOT IN "
        "(SELECT nullif(o_custkey, -1) FROM tvx_ord_ni "
        " WHERE o_totalprice > 300000) "
        "GROUP BY c_mktsegment")


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (the declarative semi/anti-join
    surface): per market segment, customers having at least one
    high-value order and no order stuck in status 'F'. Catalyst rewrites
    the two subqueries into a LeftSemi and a LeftAnti join — both
    broadcast- or shuffle-planned like any join, never a per-row
    re-execution — so the SQL shape a warehouse user writes gets the
    same physical plan as q_join_semi/q_join_anti."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("tvx_cust_ex")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tvx_ord_ex")
    return spark.sql(
        "SELECT c.c_mktsegment, count(*) AS n_active "
        "FROM tvx_cust_ex c "
        "WHERE EXISTS (SELECT 1 FROM tvx_ord_ex o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000) "
        "AND NOT EXISTS (SELECT 1 FROM tvx_ord_ex o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') "
        "GROUP BY c.c_mktsegment")


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries, uncorrelated and correlated: orders within 10%
    of the corpus-max total (the uncorrelated scalar plans as one
    broadcast value computed once), each carrying its distance from the
    max and its correlated lineitem count (Catalyst de-correlates into
    an aggregate + left join — no per-row re-execution). Max/count only:
    order-independent aggregates, so both engines agree bit-for-bit
    where an avg's summation order could differ in the last ulp."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("tvx_ord_sc")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tvx_li_sc")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice, "
        "ROUND((SELECT max(o_totalprice) FROM tvx_ord_sc) - o_totalprice,"
        " 2) AS below_max, "
        "(SELECT count(*) FROM tvx_li_sc l "
        " WHERE l.l_orderkey = o.o_orderkey) AS n_items "
        "FROM tvx_ord_sc o "
        "WHERE o_totalprice >= "
        "(SELECT max(o_totalprice) FROM tvx_ord_sc) * 0.9")


def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL table subquery with ORDER BY … LIMIT 1 — the
    SQL spelling of "top-1 row per key" (each customer's most expensive
    order). Spark 4 plans the correlated lateral as a de-correlated
    window/aggregate join, NOT a per-customer re-scan, so it costs one
    shuffle on the join key like the q_topk window formulation; the
    deterministic (price DESC, orderkey) ordering makes the pick
    engine-portable. Customers with no orders drop out (inner lateral);
    q_window_rank covers the keep-empty-groups shape."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("tvx_cust_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tvx_ord_lat")
    return spark.sql(
        "SELECT c.c_custkey, c.c_mktsegment, "
        "t.o_orderkey AS top_orderkey, t.o_totalprice AS top_price "
        "FROM tvx_cust_lat c, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM tvx_ord_lat o "
        "         WHERE o.o_custkey = c.c_custkey "
        "         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t")


# the null-safe dim: weekday buckets with slot 3 removed, plus one NULL
# catch-all row — the classic "unknown bucket" lookup shape
NULLSAFE_DIM = [(0, "b0"), (1, "b1"), (2, "b2"), (4, "b4"),
                (5, "b5"), (6, "b6"), (None, "unknown")]


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): events
    bucketed by a DERIVED NULLABLE key (user_id % 7, with slot 3 mapped
    to NULL = "unknown") look up a dimension that carries an explicit
    NULL catch-all row. A plain equi-join silently drops every unknown
    row; the null-safe operator routes them all to the one NULL dim row.
    Scale shape: the dim broadcasts, and because the NULL key exists
    ONCE on the build side the unknown rows stay a linear probe — the
    null-match blow-up only exists when both sides carry many NULLs."""
    dim = spark.createDataFrame(NULLSAFE_DIM, "k int, bucket string")
    ev = load_events(spark, sf_dir).withColumn(
        "fk", F.nullif(F.pmod("user_id", F.lit(7)).cast("int"), F.lit(3)))
    return (ev.join(F.broadcast(dim), F.expr("fk <=> k"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_events"),
                 F.sum("event_id").alias("sum_eid")))


QUERIES = {
    "q_string_agg": q_string_agg,
    "q_union_by_name": q_union_by_name,
    "q_percentile_disc": q_percentile_disc,
    "q_weighted_median": q_weighted_median,
    "q_not_in_null": q_not_in_null,
    "q_exists_subquery": q_exists_subquery,
    "q_scalar_subquery": q_scalar_subquery,
    "q_lateral_join": q_lateral_join,
    "q_null_safe_join": q_null_safe_join,
    "q_scan_parquet": q_scan_parquet,
    "q_scan_orc": q_scan_orc,
    "q_scan_table": q_scan_table,
    "q_scan_csv": q_scan_csv,
    "q_scan_json": q_scan_json,
    "q_project": q_project,
    "q_distinct": q_distinct,
    "q_filter_eq": q_filter_eq,
    "q_limit": q_limit,
    "q_union_all": q_union_all,
    "q_collect": q_collect,
    "q_create_ds": q_create_ds,
    "q_typed_cast": q_typed_cast,
    "q_join_inner": q_join_inner,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_outer": q_join_outer,
    "q_cogroup": q_cogroup,
    "q_agg_hash": q_agg_hash,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_median": q_agg_median,
    "q_array_funcs": q_array_funcs,
    "q_map_funcs": q_map_funcs,
    "q_agg_approx_distinct": q_agg_approx_distinct,
    "q_rollup": q_rollup,
    "q_cube": q_cube,
    "q_window_rank": q_window_rank,
    "q_window_running": q_window_running,
    "q_window_ntile": q_window_ntile,
    "q_sort": q_sort,
    "q_topk": q_topk,
    "q_set_intersect": q_set_intersect,
    "q_set_except": q_set_except,
    "q_set_bag_ops": q_set_bag_ops,
    "q_str_funcs": q_str_funcs,
    "q_regexp_funcs": q_regexp_funcs,
    "q_math_funcs": q_math_funcs,
    "q_date_funcs": q_date_funcs,
    "q_json_funcs": q_json_funcs,
    "q_udf_pandas": q_udf_pandas,
    "q_udaf_pandas": q_udaf_pandas,
    "q_udtf": q_udtf,
    "q_window_range_frame": q_window_range_frame,
    "q_date_from_ts": q_date_from_ts,
    "q_join_skew_salted": q_join_skew_salted,
    "q_unpivot": q_unpivot,
    "q_grouping_sets": q_grouping_sets,
}

_NULLSAFE_DIM_SQL = ("(VALUES " + ", ".join(
    f"({'NULL' if k is None else k}, '{b}')" for k, b in NULLSAFE_DIM)
    + ") AS dim(k, bucket)")

ORACLES = {
    "q_union_by_name": (
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM ("
        "(SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        " WHERE o_orderkey % 2 = 0) "
        "UNION ALL BY NAME "
        "(SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders "
        " WHERE o_orderkey % 2 = 1))"),
    "q_percentile_disc": (
        # same window formulation as the operator (NOT quantile_disc —
        # engines differ on its index convention; integer rank compare
        # is definition-free)
        "WITH r AS (SELECT l_returnflag, l_extendedprice, "
        "ROW_NUMBER() OVER (PARTITION BY l_returnflag "
        "ORDER BY l_extendedprice) AS rn, "
        "COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem) "
        "SELECT l_returnflag, "
        "MIN(CASE WHEN rn * 100 >= n * 50 THEN l_extendedprice END) "
        "AS p50_disc, "
        "MIN(CASE WHEN rn * 100 >= n * 90 THEN l_extendedprice END) "
        "AS p90_disc FROM r GROUP BY l_returnflag"),
    "q_weighted_median": (
        "WITH r AS (SELECT l_returnflag, l_extendedprice, "
        "SUM(l_quantity) OVER (PARTITION BY l_returnflag "
        "ORDER BY l_extendedprice, l_quantity "
        "ROWS UNBOUNDED PRECEDING) AS cw, "
        "SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw "
        "FROM lineitem) "
        "SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median "
        "FROM r WHERE cw * 2 >= tw GROUP BY l_returnflag"),
    "q_string_agg": (
        "SELECT r_name, count(*) AS n_nations, "
        "string_agg(n_name, ',' ORDER BY n_name) AS nation_csv "
        "FROM nation JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name"),
    "q_not_in_null": (
        "SELECT c_mktsegment, count(*) AS n_quiet "
        "FROM customer WHERE c_custkey NOT IN "
        "(SELECT nullif(o_custkey, -1) FROM orders "
        " WHERE o_totalprice > 300000) "
        "GROUP BY c_mktsegment"),
    "q_exists_subquery": (
        "SELECT c.c_mktsegment, count(*) AS n_active FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') "
        "GROUP BY c.c_mktsegment"),
    "q_scalar_subquery": (
        "SELECT o_orderkey, o_totalprice, "
        "ROUND((SELECT max(o_totalprice) FROM orders) - o_totalprice, 2) "
        "AS below_max, "
        "(SELECT count(*) FROM lineitem l "
        " WHERE l.l_orderkey = o.o_orderkey) AS n_items "
        "FROM orders o WHERE o_totalprice >= "
        "(SELECT max(o_totalprice) FROM orders) * 0.9"),
    "q_lateral_join": (
        "SELECT c.c_custkey, c.c_mktsegment, "
        "t.o_orderkey AS top_orderkey, t.o_totalprice AS top_price "
        "FROM customer c, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o "
        "         WHERE o.o_custkey = c.c_custkey "
        "         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t"),
    "q_null_safe_join": (
        "SELECT bucket, count(*) AS n_events, "
        "CAST(sum(event_id) AS BIGINT) AS sum_eid "
        "FROM (SELECT event_id, "
        "nullif(CAST(user_id % 7 AS INT), 3) AS fk FROM events) e "
        f"JOIN {_NULLSAFE_DIM_SQL} ON e.fk IS NOT DISTINCT FROM dim.k "
        "GROUP BY bucket"),
    "q_regexp_funcs": (
        "SELECT p_partkey, "
        "COALESCE(regexp_extract(p_name, '^([a-z]+)', 1), '') "
        "AS first_word, "
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled, "
        "regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words, "
        "COALESCE(regexp_extract(p_type, '([A-Z]+)$', 1), '') "
        "AS type_tail FROM part"),
    "q_join_outer": (
        "WITH co AS (SELECT c_nationkey, COUNT(*) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS sum_price FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1), "
        "s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers "
        "FROM supplier GROUP BY 1) "
        "SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, "
        "n_orders, sum_price, n_suppliers "
        "FROM co FULL OUTER JOIN s ON c_nationkey = s_nationkey"),
    "q_cogroup": (
        "WITH og AS (SELECT o_custkey AS k, COUNT(*) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS sum_price FROM orders GROUP BY 1), "
        "cg AS (SELECT c_custkey AS k, c_acctbal FROM customer) "
        "SELECT COALESCE(og.k, cg.k) AS custkey, "
        "COALESCE(n_orders, 0) AS n_orders, "
        "COALESCE(sum_price, 0.0) AS sum_price, "
        "c_acctbal AS acctbal, "
        "(c_acctbal IS NOT NULL AND COALESCE(sum_price, 0.0) > "
        "100.0 * c_acctbal) AS overspent "
        "FROM og FULL OUTER JOIN cg ON og.k = cg.k"),
    "q_map_funcs": (
        "WITH d AS (SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS q "
        "FROM lineitem GROUP BY 1, 2), "
        "g AS (SELECT l_orderkey, map_from_entries(list_sort(list("
        "{'key': l_linenumber, 'value': q}))) AS m FROM d GROUP BY 1) "
        "SELECT l_orderkey, CAST(cardinality(m) AS INT) AS n_keys, "
        "map_extract(m, 1)[1] AS q1, "
        "list_max(map_values(m)) AS q_max, "
        "list_max(map_keys(m)) AS k_max FROM g"),
    "q_set_bag_ops": (
        "WITH a AS (SELECT l_quantity, l_returnflag FROM lineitem "
        "WHERE l_linenumber <= 2), "
        "b AS (SELECT l_quantity, l_returnflag FROM lineitem "
        "WHERE l_linenumber >= 2) "
        "SELECT l_quantity, l_returnflag, 'intersect' AS op FROM "
        "(SELECT * FROM a INTERSECT ALL SELECT * FROM b) "
        "UNION ALL "
        "SELECT l_quantity, l_returnflag, 'except' AS op FROM "
        "(SELECT * FROM b EXCEPT ALL SELECT * FROM a)"),
    "q_agg_median": (
        "WITH med AS (SELECT l_returnflag, "
        "ROUND(median(l_quantity), 6) AS median_qty "
        "FROM lineitem GROUP BY 1), "
        "counts AS (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt "
        "FROM lineitem GROUP BY 1, 2), "
        "m AS (SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag "
        "ORDER BY cnt DESC, l_quantity) AS rn FROM counts) WHERE rn = 1) "
        "SELECT med.l_returnflag, median_qty, mode_qty, mode_n "
        "FROM med JOIN m ON med.l_returnflag = m.l_returnflag"),
    "q_array_funcs": (
        "WITH g AS (SELECT l_orderkey, "
        "list_sort(list(l_quantity)) AS arr FROM lineitem GROUP BY 1) "
        "SELECT l_orderkey, CAST(len(arr) AS BIGINT) AS n_items, "
        "arr[1] AS qty_min, arr[-1] AS qty_max, "
        "ROUND(list_sum(arr), 2) AS qty_sum, "
        "list_contains(arr, 1.0) AS has_single FROM g"),
    "q_window_ntile": (
        "SELECT o_orderkey, o_orderpriority, o_totalprice, "
        "CAST(ntile(10) OVER w AS INT) AS decile, "
        "ROUND(percent_rank() OVER w, 6) AS pr, "
        "ROUND(cume_dist() OVER w, 6) AS cd "
        "FROM orders WINDOW w AS "
        "(PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)"),
    "q_unpivot": (
        "WITH agg AS (SELECT l_returnflag, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "CAST(COUNT(*) AS DOUBLE) AS n_items FROM lineitem GROUP BY 1) "
        "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM agg "
        "UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM agg "
        "UNION ALL SELECT l_returnflag, 'n_items', n_items FROM agg"),
    "q_grouping_sets": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(GROUPING(l_returnflag) AS INT) AS g_flag, "
        "CAST(GROUPING(l_linestatus) AS INT) AS g_status, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n "
        "FROM lineitem GROUP BY GROUPING SETS "
        "((l_returnflag, l_linestatus), (l_returnflag), ())"),
    "q_scan_parquet": f"SELECT {', '.join(LINEITEM_COLS)} FROM lineitem",
    "q_scan_orc": "SELECT * FROM supplier",
    "q_scan_table": "SELECT * FROM nation",
    "q_scan_csv": "SELECT * FROM customer",
    "q_scan_json": ("SELECT o_orderkey, o_custkey, o_orderstatus, "
                    "o_totalprice, CAST(o_orderdate AS TIMESTAMP) "
                    "AS o_orderdate, o_orderpriority FROM orders"),
    "q_project": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q_distinct": "SELECT DISTINCT c_mktsegment FROM customer",
    "q_filter_eq": ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
                    "FROM lineitem WHERE l_returnflag = 'R'"),
    "q_limit": ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
                "ORDER BY o_orderkey LIMIT 100"),
    "q_union_all": ("SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' "
                    "UNION ALL "
                    "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0"),
    "q_collect": "SELECT COUNT(*) AS n FROM lineitem",
    "q_create_ds": ("SELECT CAST(id AS BIGINT) AS id, name FROM "
                    "(VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) AS t(id, name)"),
    "q_typed_cast": ("SELECT CAST(l_orderkey AS VARCHAR) AS okey_str, "
                     "CAST(l_linenumber AS BIGINT) AS lineno, "
                     "CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int FROM lineitem"),
    "q_join_inner": ("SELECT c_mktsegment, COUNT(*) AS n_orders, "
                     "ROUND(SUM(o_totalprice), 2) AS sum_price "
                     "FROM orders JOIN customer ON o_custkey = c_custkey "
                     "GROUP BY c_mktsegment"),
    "q_join_left": ("SELECT c_custkey, COUNT(o_orderkey) AS n_orders "
                    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
                    "GROUP BY c_custkey"),
    "q_join_semi": ("SELECT c_custkey, c_name FROM customer "
                    "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    "q_join_anti": ("SELECT c_custkey, c_name FROM customer "
                    "WHERE NOT EXISTS (SELECT 1 FROM orders "
                    "WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"),
    "q_agg_hash": ("SELECT l_returnflag, l_linestatus, "
                   "ROUND(SUM(l_quantity), 2) AS sum_qty, "
                   "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
                   "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
                   "ROUND(AVG(l_quantity), 6) AS avg_qty, "
                   "ROUND(AVG(l_discount), 6) AS avg_disc, "
                   "COUNT(*) AS count_order "
                   "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q_agg_distinct": ("SELECT l_returnflag, "
                       "COUNT(DISTINCT l_partkey) AS distinct_parts, "
                       "COUNT(DISTINCT l_suppkey) AS distinct_supps "
                       "FROM lineitem GROUP BY l_returnflag"),
    "q_rollup": ("SELECT l_returnflag, l_linestatus, "
                 "ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n "
                 "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "q_cube": ("SELECT l_returnflag, l_linestatus, "
               "ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n "
               "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "q_window_rank": ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
                      "SELECT o_custkey, o_orderkey, o_totalprice, "
                      "ROW_NUMBER() OVER (PARTITION BY o_custkey "
                      "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders"
                      ") WHERE rn <= 3"),
    "q_window_running": ("SELECT o_custkey, o_orderkey, "
                         "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
                         "ORDER BY o_orderdate, o_orderkey "
                         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) "
                         "AS running_total FROM orders"),
    "q_sort": ("SELECT s_suppkey, s_name, s_acctbal FROM supplier "
               "ORDER BY s_acctbal DESC, s_suppkey"),
    "q_topk": ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
               "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q_set_intersect": ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
                        "INTERSECT "
                        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"),
    "q_set_except": ("SELECT c_custkey FROM customer "
                     "EXCEPT SELECT o_custkey AS c_custkey FROM orders "
                     "WHERE o_orderstatus = 'O'"),
    "q_str_funcs": ("SELECT p_partkey, UPPER(p_brand) AS brand_u, "
                    "LOWER(p_type) AS type_l, "
                    "SUBSTRING(p_name, 1, 5) AS name5, "
                    "CAST(LENGTH(p_type) AS BIGINT) AS type_len, "
                    "CONCAT_WS('#', p_brand, p_type) AS brand_type, "
                    "TRIM('  x  ') AS trimmed FROM part"),
    "q_math_funcs": ("SELECT l_orderkey, ROUND(l_extendedprice, 4) AS price_r, "
                     "ABS(l_discount - 0.05) AS disc_diff, "
                     "CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor, "
                     "CAST(CEIL(l_tax * 100) AS BIGINT) AS tax_pct, "
                     "ROUND(SQRT(l_quantity), 6) AS qty_sqrt "
                     "FROM lineitem WHERE l_linenumber = 1"),
    "q_date_funcs": ("SELECT o_orderkey, "
                     "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month, "
                     "CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, "
                     "CAST(MONTH(o_orderdate) AS BIGINT) AS order_mon, "
                     "CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) "
                     "AS days_since_95 FROM orders"),
    "q_json_funcs": (
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
        "MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k, "
        "MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k, "
        "COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 "
        "THEN 1 END) AS n_div7 "
        "FROM events GROUP BY event_type"),
    "q_udf_pandas": ("SELECT l_orderkey, l_linenumber, "
                     "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS revenue "
                     "FROM lineitem"),
    "q_udaf_pandas": (
        "SELECT l_returnflag, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)) / "
        "SUM(1 - l_discount), 6) AS disc_weighted_price, "
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"),
    "q_udtf": (
        "SELECT r_regionkey, tier, substring(r_name, 1, tier) AS prefix "
        "FROM region CROSS JOIN (VALUES (1), (2), (3)) AS t(tier)"),
    "q_window_range_frame": (
        "SELECT o_custkey, o_orderkey, "
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY DATE_DIFF('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) "
        "RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) "
        "AS trailing_30d_total FROM orders"),
    "q_date_from_ts": "SELECT event_id, CAST(ts AS DATE) AS event_date FROM events",
    "q_join_skew_salted": (
        "SELECT CAST(s_nationkey AS BIGINT) AS nationkey, "
        "COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS sum_price "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "GROUP BY nationkey"),
    # q_agg_approx_distinct: intentionally no oracle (rows-only check)
}
