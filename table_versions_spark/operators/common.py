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
    """events with its ns-precision ``ts`` normalized to a microsecond
    timestamp column, plus the derived UTC ``event_date``.

    The parquet file carries TIMESTAMP(NANOS). How Spark surfaces that
    depends on the installed version, so branch on the *actual* read dtype:

    - ``bigint`` (``nanosAsLong=true`` honored): exact ns→µs via
      :func:`ts_from_nanos`.
    - ``timestamp_ntz`` / ``timestamp`` (Spark 4.1.2+ reads NANOS natively,
      µs-truncated; ``nanosAsLong`` is a no-op there): cast to session-TZ
      timestamp — the session TZ is UTC via :func:`ensure_compat`, so values
      equal the oracles' ``CAST(ts AS TIMESTAMP)``.
    """
    from pyspark.sql.types import LongType

    from ..functions.timestamps import ts_from_nanos

    df = load(spark, sf_dir, "events")
    ts_col = (ts_from_nanos("ts")
              if isinstance(df.schema["ts"].dataType, LongType)
              else F.col("ts").cast("timestamp"))
    return (df.withColumn("ts", ts_col)
              .withColumn("event_date", F.to_date("ts")))


# One lock for all first-time scratch-index builds in this process.
# Coarse on purpose: builds are rare (first touch of a corpus by a family),
# and one lock removes any chance of two threads racing the same dir while
# keeping lock-ordering trivial. RLock because a build closure may invoke
# another operator whose own index build re-enters from the same thread.
_INDEX_BUILD_LOCK = __import__("threading").RLock()


def build_once(spark: SparkSession, out_dir: str, build,
               marker: str = "_SUCCESS") -> None:
    """Build a content-pure scratch artifact exactly once per process:
    fast-path probe outside the lock, re-probe + build inside it.

    ``marker`` is the existence probe relative to ``out_dir`` — by default
    parquet's ``_SUCCESS``, but a build that lands multiple artifacts
    passes its LAST-written file so a crash mid-setup re-runs the whole
    build instead of leaving a half-built dir.

    PRECONDITION: ``out_dir`` must be content-pure — derived solely from
    the build's inputs. Derive it from :func:`corpus_tag` (which
    fingerprints the corpus listing), never from a bare path/basename, or
    an in-place rewrite of the inputs would silently serve a stale build.
    """
    import os

    marker_path = os.path.join(out_dir, marker)
    if fs_exists(spark, marker_path):
        return
    with _INDEX_BUILD_LOCK:
        if not fs_exists(spark, marker_path):
            build()


def corpus_tag(sf_dir: str) -> str:
    """Scratch-dir suffix identifying a corpus by PATH and CONTENT.

    Digests (a) the full corpus path — two corpora sharing a basename
    must not overwrite each other's lazily-read scratch tables — and
    (b) one local metadata listing of the corpus files (relative path,
    size, mtime_ns), so an in-place rewrite of the same path changes the
    tag and :func:`build_once` rebuilds instead of serving a stale index.
    The listing is one os.walk of file metadata (no data reads) per
    operator call — O(#files) stat calls, microseconds on any corpus
    layout that fits a driver.

    Non-local corpus URIs (s3a://, hdfs://) fall back to the path-only
    digest: there the immutability of a published corpus prefix is the
    documented precondition (rewrites land under a NEW prefix — the
    layout object stores force anyway, since their "directories" are key
    prefixes and in-place rewrites are multi-object races).
    """
    import hashlib
    import os

    h = hashlib.sha256(sf_dir.encode())
    root = os.path.normpath(sf_dir)
    if os.path.isdir(root):
        entries = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                fp = os.path.join(dirpath, fn)
                try:
                    st = os.stat(fp)
                except OSError:  # racing writer; treat as content change
                    entries.append((os.path.relpath(fp, root), -1, -1))
                    continue
                entries.append((os.path.relpath(fp, root),
                                st.st_size, st.st_mtime_ns))
        for e in sorted(entries):
            h.update(repr(e).encode())
    return (h.hexdigest()[:12]
            + "-" + os.path.basename(root))


_SCRATCH_NS = __import__("uuid").uuid4().hex[:8]


def scratch_dir(spark: SparkSession, name: str) -> str:
    """Cluster-visible scratch path for intermediate materializations
    (e.g. minhash signature tables).

    Resolution order: ``spark.tvx.scratch.dir`` conf (REQUIRED on a real
    cluster — point it at shared storage such as s3://bucket/scratch or an
    HDFS path so every executor sees the same files), else — local masters
    only — the machine temp dir. A driver-local temp path on a multi-node
    cluster would silently break executor reads, so that combination raises.

    Paths are namespaced per DRIVER PROCESS: scratch names are stable
    within a process (so in-process caching/alternation works), but two
    concurrent driver processes must never share a dir — one overwriting
    an intermediate while the other reads it corrupts both (observed as a
    flake when two local runs raced the BPE round tables).
    """
    import os
    import tempfile

    base = spark.conf.get("spark.tvx.scratch.dir", None)
    if base is None:
        if spark.sparkContext.master.startswith("local"):
            base = os.path.join(tempfile.gettempdir(), "tvx-scratch")
        else:
            raise ValueError(
                "Running on a cluster: set spark.tvx.scratch.dir to a "
                "shared-storage path visible to all executors")
    return os.path.join(base, _SCRATCH_NS, name)


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through Hadoop's FileSystem — works for ANY
    scratch URI (file:/, s3a://, hdfs://), unlike ``os.path.exists``,
    which silently returns False on remote URIs and defeats the
    cross-call setup caching built on these markers."""
    fs, p, _ = _hadoop_fs(spark, path)
    return fs.exists(p)


def fs_list_files(spark: SparkSession, path: str) -> list[str]:
    """Child file NAMES of a scratch dir via Hadoop's FileSystem."""
    fs, p, _ = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def fs_copy_file(spark: SparkSession, src: str, dst: str) -> None:
    """Copy one scratch file via Hadoop's FileUtil (any scheme);
    creates the destination's parent."""
    sfs, sp, jvm = _hadoop_fs(spark, src)
    dfs, dp, _ = _hadoop_fs(spark, dst)
    dfs.mkdirs(dp.getParent())
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        sfs, sp, dfs, dp, False, spark._jsc.hadoopConfiguration())


def _as_cols(cols) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _order_specs(order_cols) -> list[tuple]:
    """Normalize order entries to (Column, direction) pairs.

    Entries are a column name (ascending) or a ``(name, "desc"|"asc")``
    tuple — NOT bare ``F.desc(...)`` Columns, because the helper must
    know the direction to build the deterministic bucket expression.
    """
    specs = []
    for c in order_cols:
        if isinstance(c, tuple):
            name, d = c
            specs.append((F.col(name) if isinstance(name, str) else name,
                          d))
        else:
            specs.append((F.col(c) if isinstance(c, str) else c, "asc"))
    return specs


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame — driver-side only, no job.

    File-source relations report summed file bytes; projections scale
    by schema row-width ratio; filters/aggregates pass their child's
    size through unreduced (no CBO), so the estimate errs HIGH for
    anything data-sized — which is the safe direction for a
    load-balance decision (an over-estimate keeps the always-correct
    bucketed plan; only genuinely tiny inputs read as tiny). Returns a
    sentinel "huge" on any introspection failure so callers fall back
    to the scale shape.
    """
    try:
        v = (df._jdf.queryExecution().optimizedPlan()
             .stats().sizeInBytes())
        # py4j auto-converts small scala BigInts to int; huge ones come
        # through as objects whose decimal rendering is still exact
        return v if isinstance(v, int) else int(v.toString())
    except Exception:  # noqa: BLE001 — estimate unavailable: assume big
        return 1 << 62


def checkpoint_if_big(df: DataFrame) -> DataFrame:
    """Per-invocation ``localCheckpoint`` gated on Catalyst's input-size
    estimate (VERDICT r11 #4): materializing a shared intermediate only
    pays when the subtree it stops re-executing is expensive — the
    driver's bench showed the q_lm_score / q_pmi_bigrams checkpoints
    costing 25-30% at bench SF, where re-running the corpus tokenize
    twice more is cheaper than one materialization round-trip. Below
    ``spark.tvx.checkpoint.minInputBytes`` (default 64 MB — same bar as
    the prefix small-input floor) the frame is returned as-is and each
    consumer re-executes the (cheap) subtree; at scale the checkpoint
    fires and the pass collapse stands. Set the conf to 0 to always
    checkpoint. Purely a cost decision: results are identical either
    way (the plans are deterministic), and the checkpoint stays
    per-invocation — never cached across runs."""
    sess = df.sparkSession
    thr = int(sess.conf.get("spark.tvx.checkpoint.minInputBytes",
                            str(64 * 1024 * 1024)))
    if thr > 0 and _plan_size_bytes(df) < thr:
        return df
    return df.localCheckpoint()


def distributed_prefix(df: DataFrame, order_cols, out_name: str, *,
                       group_cols: tuple | list = (),
                       value=None, kind: str = "count",
                       inclusive: bool = True,
                       num_buckets: int | None = None,
                       extra_sums: dict | None = None,
                       total_name: str | None = None) -> DataFrame:
    """Exact grouped running aggregate (ROW_NUMBER / prefix SUM / prefix
    MIN) that scales — the two-phase replacement for a global or
    tiny-key ``Window``.

    Spark executes a Window whose partitionSpec is empty (or keyed on a
    handful of values) on ONE task per key: the whole input sorts on a
    single executor core — the scale-killer class a 100 TB plan cannot
    carry ("WindowExec: Moving all data to a single partition").  This
    helper is the classic local+carry decomposition instead:

    1. one bounded pre-pass computes ``num_buckets-1`` approximate
       quantile boundaries of the FIRST order column over a SAMPLE of
       the input (``spark.tvx.prefix.boundarySampleFraction``, default
       5 %); they embed in the plan as an array LITERAL, so the
       derived ``_b`` bucket id is a deterministic column — every
       branch and every re-execution assigns identical buckets.
       (``repartitionByRange`` + ``spark_partition_id`` does NOT have
       that property: range sampling is documented as run-varying and
       AQE may coalesce the two recomputed exchanges differently,
       silently misaligning the carry join — observed, hence the
       literal-boundary design.  Boundaries only affect load balance,
       never correctness, which is what makes the sampled estimate
       free: the pre-pass executes the input subtree eagerly, and
       because SampleExec's codegen defers the projection variables it
       does not use, rows the sampler drops never evaluate the
       (possibly text-heavy) order expression — the r10 pre-pass that
       re-ran the full expression tree cost the two-phase family ~2×,
       an entire duplicated corpus scan at 100 TB.);
    2. a LOCAL window per (bucket, group) — each task sorts only its
       own slice; parallelism = #buckets × #groups;
    3. per-(bucket, group) totals — an aggregate bounded by
       construction at #buckets rows per group — collect into ONE array
       per group (``sort_array(collect_list(...))``) and scan it with
       the ``aggregate``/``slice`` higher-order functions to produce
       each bucket's carry-in.  An array scan instead of a window keeps
       the whole helper free of empty-partitionSpec WindowExecs, and
       the O(#buckets²) HOF cost is over per-group scalars, not rows;
    4. the carry broadcast-joins back and combines with the local value.

    Exactness needs (group_cols + order_cols) to be a TOTAL order for
    ``kind="count"`` (row_number semantics); SUM/MIN carries are
    order-insensitive within ties.  ``inclusive=False`` gives the
    strict-preceding frame (``ROWS UNBOUNDED PRECEDING .. -1``); the
    first global row yields NULL for min, 0 for count, NULL for sum.

    ``order_cols`` entries are column names (ascending) or
    ``(name, "desc")`` tuples; the FIRST one must be numeric (it feeds
    ``percentile_approx``). ``group_cols`` are plain names (join keys).
    The boundary pre-pass executes the input subtree once eagerly —
    bounded output (#buckets-1 scalars), same class as the centroid /
    probe-block collects elsewhere in this package.

    ``extra_sums`` (``{out_name: value_column}``) piggybacks additional
    prefix SUMS on the same pass — same buckets, same local window,
    same carry array — so N running sums over one ordering cost ONE
    boundary pass and ONE shuffle instead of N chained helper calls
    (each of whose boundary pre-pass would re-execute its predecessor's
    whole plan).  Only meaningful with ``kind="sum"``.

    ``total_name`` additionally attaches each GROUP's whole-group
    aggregate (count / sum / min of the primary task) as a column — it
    folds the same per-bucket totals array the carries scan, so a
    caller that needs both the running value and the group total (a
    decile formula's ``n``, a nucleus filter's mass denominator) pays
    ZERO extra passes, where a separate ``groupBy(group)`` branch
    re-executes the whole input subtree.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols)
    specs = _order_specs(order_cols)
    ocols = [c.desc() if d == "desc" else c.asc() for c, d in specs]
    sess = df.sparkSession
    if extra_sums and kind != "sum":
        raise ValueError("extra_sums requires kind='sum'")
    tasks = [(out_name, value, kind)]
    tasks += [(en, ev, "sum") for en, ev in (extra_sums or {}).items()]
    # Small-input floor (VERDICT r11 #3): the two-phase shape pays a
    # boundary pre-pass + an extra exchange + a broadcast join that are
    # pure constant cost when the input fits comfortably in one task's
    # sort buffer — 3-4× the whole query at bench SF. Bucketing is load
    # balance only, never correctness, so when Catalyst's driver-side
    # size estimate (summed file bytes through width-scaled projections
    # — no job) says the input is below the threshold, degrade to the
    # plain per-group window the decomposition replaces. The threshold
    # is conf'd (`spark.tvx.prefix.smallInput.maxBytes`, default 64 MB
    # ≈ one healthy shuffle partition — guide §2.2): production tables
    # sit orders of magnitude above it, so the scale plan is unchanged;
    # set it to 0 to force the bucketed shape (the plan audit does,
    # since it judges the at-scale plan). Estimate error is asymmetric
    # by design: file-source stats never shrink below the scan's real
    # bytes except by projection width ratio, so a data-sized input
    # cannot slip under a 64 MB bar, while an over-estimate merely
    # keeps the (always-correct) bucketed plan.
    small_max = int(sess.conf.get(
        "spark.tvx.prefix.smallInput.maxBytes", str(64 * 1024 * 1024)))
    if num_buckets is None and small_max > 0 \
            and _plan_size_bytes(df) <= small_max:
        end = Window.currentRow if inclusive else -1
        w = (Window.partitionBy(*[F.col(c) for c in group_cols])
             .orderBy(*ocols)
             .rowsBetween(Window.unboundedPreceding, end))
        wg = Window.partitionBy(*[F.col(c) for c in group_cols])

        def over(kd, val, win):
            if kd == "count":
                return F.count(F.lit(1)).over(win).cast("long")
            if kd == "sum":
                return F.sum(val).over(win)
            if kd == "min":
                return F.min(val).over(win)
            raise ValueError(f"unsupported prefix kind: {kd}")

        out = df
        for name, val, kd in tasks:
            out = out.withColumn(name, over(kd, val, w))
        if total_name:
            _, val0, kd0 = tasks[0]
            out = out.withColumn(total_name, over(kd0, val0, wg))
        return out
    n = num_buckets or int(
        sess.conf.get("spark.sql.shuffle.partitions", "200"))
    bcol, bdir = specs[0]
    probs = [i / n for i in range(1, n)]
    # fixed seed: bounds are collected once and embedded as literals,
    # so run-to-run sample variation cannot misalign anything — the
    # seed only makes the chosen load split reproducible for debugging
    frac = float(sess.conf.get(
        "spark.tvx.prefix.boundarySampleFraction", "0.05"))
    sampled = df if frac >= 1.0 else df.sample(fraction=frac, seed=7)
    bounds = (sampled.select(F.percentile_approx(bcol, probs).alias("q"))
              .first()["q"]) if n > 1 else None
    if not bounds:
        bucket = F.lit(0)
    else:
        bset = sorted({b for b in bounds if b is not None})
        barr = F.array(*[F.lit(b) for b in bset])
        if bdir == "desc":
            # bucket ordinal increases ALONG the sort direction; NULLs
            # sort last under DESC, so they take the final bucket
            bucket = (F.when(bcol.isNull(), F.lit(len(bset)))
                      .otherwise(F.size(F.filter(barr,
                                                 lambda b: b > bcol))))
        else:
            # NULLs sort first under ASC -> filter yields 0 == smallest
            bucket = F.size(F.filter(barr, lambda b: b < bcol))
    # ONE explicit exchange on (_b, group) that BOTH consumers read.
    # Left to EnsureRequirements, the window branch gets a row exchange
    # while the totals groupBy plans its partial aggregate BELOW its own
    # exchange — two non-identical exchanges, so ReuseExchange cannot
    # fire and the (possibly text-heavy) input subtree executes twice,
    # an entire duplicated corpus scan at 100 TB. A user repartition is
    # an optimizer barrier the partial aggregate cannot sink below: the
    # window reads it (hash clustering on (_b, group) satisfies its
    # required distribution, no second exchange) and the totals branch
    # becomes ReusedExchange -> partial agg -> final agg with no sort —
    # the input scan, bucket projection and shuffle write all happen
    # once (guide: share one exchange between same-keyed operations).
    rp = (df.withColumn("_b", bucket)
          .repartition(F.col("_b"), *[F.col(c) for c in group_cols]))
    end = Window.currentRow if inclusive else -1
    w_loc = (Window.partitionBy("_b", *group_cols).orderBy(*ocols)
             .rowsBetween(Window.unboundedPreceding, end))

    def parts(k: int, kd: str, val):
        lc, cr = F.col(f"_loc{k}"), F.col(f"_carry{k}")
        if kd == "count":
            # count totals are never NULL, but the empty prefix (first
            # bucket) aggregates to the NULL init, so merge stays
            # null-safe
            return (F.count(F.lit(1)).over(w_loc).cast("long"),
                    F.count(F.lit(1)).cast("long").alias(f"_t{k}"),
                    f"coalesce(acc + y._t{k}, y._t{k}, acc)",
                    F.coalesce(cr, F.lit(0)) + lc)
        if kd == "sum":
            return (F.sum(val).over(w_loc),
                    F.sum(val).alias(f"_t{k}"),
                    f"coalesce(acc + y._t{k}, y._t{k}, acc)",
                    (F.when(cr.isNull(), lc)
                     .when(lc.isNull(), cr).otherwise(cr + lc)))
        if kd == "min":
            return (F.min(val).over(w_loc),
                    F.min(val).alias(f"_t{k}"),
                    f"least(acc, y._t{k})",
                    F.least(cr, lc))
        raise ValueError(f"unsupported prefix kind: {kd}")

    built = [parts(k, kd, val) for k, (_, val, kd) in enumerate(tasks)]
    local = rp
    for k, (loc, _, _, _) in enumerate(built):
        local = local.withColumn(f"_loc{k}", loc)
    # totals aggregate the explicit (_b, group) exchange above — the
    # same exchange the window consumes, so ReuseExchange dedupes the
    # two branches and the input subtree executes once. Reuse needs the
    # two branches to stay CANONICALLY IDENTICAL below the exchange,
    # but column pruning runs per branch: this aggregate only needs
    # (_b, group), so pruning would narrow its copy of the subtree and
    # the exchanges would no longer match — the input scan (and any
    # text-heavy derivation feeding it) would execute once per branch.
    # The `_pg` grouping key pins the width: it references every input
    # column but always evaluates to 0 (`CASE WHEN hash(cols) >=
    # Int.MinValue THEN 0` — a tautology Catalyst has no range
    # analysis to fold, unlike `hash * 0` which it folds outright),
    # and pruning can never remove a GROUPING key, so both branches
    # carry the full column set and the exchange dedupes. Map-typed
    # columns are unhashable and stay out; a frame carrying one falls
    # back to the per-branch plan.
    hashable = [c for c in df.columns
                if "map<" not in df.schema[c].dataType.simpleString()]
    pg = (F.when(F.hash(*[F.col(c) for c in hashable]) >=
                 F.lit(-2147483648), F.lit(0)).alias("_pg")
          if hashable else F.lit(0).alias("_pg"))
    sizes = rp.groupBy(F.col("_b"), *[F.col(c) for c in group_cols],
                       pg).agg(*[tot for _, tot, _, _ in built])
    # carry-in per bucket = aggregate over the strictly-earlier buckets'
    # totals, computed by scanning one sorted per-group array of
    # (bucket, totals...) — ≤ #buckets elements by construction
    carry_fields = ", ".join(
        f"aggregate(slice(_a, 1, i), CAST(NULL AS "
        f"{sizes.schema[f'_t{k}'].dataType.simpleString()}), "
        f"(acc, y) -> {merge}) AS _carry{k}"
        for k, (_, _, merge, _) in enumerate(built))
    scan = F.expr("transform(_a, (x, i) -> struct(x._b AS _b, "
                  + carry_fields + "))")
    tcols = [f"_t{k}" for k in range(len(built))]
    exploded = [*group_cols, F.explode(scan).alias("_s")]
    carry_cols = [*group_cols, "_s._b",
                  *[f"_s._carry{k}" for k in range(len(built))]]
    if total_name:
        # whole-group total = the same merge folded over the FULL
        # per-bucket totals array (the carries only fold prefixes) —
        # free relative to a separate groupBy branch over the input
        t0 = sizes.schema["_t0"].dataType.simpleString()
        exploded.append(F.expr(
            f"aggregate(_a, CAST(NULL AS {t0}), "
            f"(acc, y) -> {built[0][2]})").alias(total_name))
        carry_cols.append(total_name)
    carries = (sizes
               .groupBy(*group_cols)
               .agg(F.sort_array(F.collect_list(F.struct("_b", *tcols)))
                    .alias("_a"))
               .select(*exploded)
               .select(*carry_cols))
    out = local.join(F.broadcast(carries), ["_b", *group_cols])
    for k, ((name, _, _), (_, _, _, combine)) in enumerate(
            zip(tasks, built)):
        out = out.withColumn(name, combine)
    return out.drop("_b", *[f"_loc{k}" for k in range(len(built))],
                    *[f"_carry{k}" for k in range(len(built))])
