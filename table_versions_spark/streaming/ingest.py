"""Structured Streaming ingest into versioned tables.

The reference has no streaming surface (verified absence, SURVEY §2.E); this
is a mandated extension. Design:

- ``versioned_stream_writer``: lands each micro-batch as one versioned commit
  via ``foreachBatch`` → ``VersionedEngine.insert``. For a partitioned table
  this inherits the engine's Hive-overwrite semantics per batch: a batch that
  carries partitions (e.g. event dates) replaces exactly those partitions'
  versions — the natural idempotent-reprocess story for late data. The commit
  message records the batch id, so stream progress is auditable in
  ``history()`` and any batch is rollback-able via ``checkout``.
- ``windowed_counts``: watermarked tumbling-window aggregation (late rows
  beyond the watermark are dropped by Spark's state store; state is bounded).
- ``sessionize``: custom stateful operator via ``applyInPandasWithState`` —
  per-user session aggregation with processing-timeout-based session close.

At scale: ``foreachBatch`` gives exactly-once-per-batch snapshot isolation
(batch either commits to the log or doesn't); the state-store operators
shuffle by key once and keep state partitioned across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..engine import VersionedEngine


def versioned_stream_writer(stream_df: DataFrame, engine: VersionedEngine,
                            table: str, user_id: str, checkpoint_dir: str,
                            trigger_available_now: bool = True,
                            mode: str = "append"):
    """Write a streaming DataFrame into a versioned table, one commit per
    micro-batch. Returns the started ``StreamingQuery``.

    ``mode="append"`` (default) accumulates rows across batches (file-level
    linking, no rewrite); ``mode="overwrite"`` gives
    replace-touched-partitions-per-batch — the right choice when each batch
    reprocesses whole event-date partitions.

    Exactly-once: each batch commits with an idempotence token
    ``txn=(checkpoint_dir, batch_id)``, so a batch replayed after a crash
    between the engine commit and the streaming checkpoint write is skipped
    instead of double-applied (Delta's ``txnAppId``/``txnVersion`` recipe —
    foreachBatch alone is only at-least-once).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.insert(batch_df, table, user_id, f"stream batch {batch_id}",
                      mode=mode, txn=(checkpoint_dir, batch_id))

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(stream_df: DataFrame, ts_col: str = "ts",
                    window_duration: str = "1 hour",
                    watermark_delay: str = "10 minutes",
                    key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Watermarked tumbling-window counts — the canonical late-data-tolerant
    streaming aggregation. State per (window, key) is dropped once the
    watermark passes the window end. ``value_col`` names the summed metric
    (every other column knob is configurable; this one was silently
    hardcoded)."""
    return (stream_df
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.window(ts_col, window_duration).alias("win"), key_col)
            .agg(F.count("*").alias("n_events"),
                 F.sum(value_col).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    key_col, "n_events", "sum_value"))


SESSION_STATE_SCHEMA = "n_events bigint, sum_value double, first_ts timestamp, last_ts timestamp"
SESSION_OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, sum_value double, "
                         "first_ts timestamp, last_ts timestamp, closed boolean")


def sessionize(stream_df: DataFrame, timeout_ms: int = 30_000) -> DataFrame:
    """Custom stateful operator: per-user running session aggregates with a
    processing-time timeout, via ``applyInPandasWithState``.

    Emits the running session row on every update; when a user goes quiet for
    ``timeout_ms`` the session row is emitted once more with ``closed=true``
    and its state is freed.
    """

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, s, first, last = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "n_events": n, "sum_value": s,
                "first_ts": first, "last_ts": last, "closed": True}])
            return
        n, s, first, last = (state.get if state.exists else (0, 0.0, None, None))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first = lo if first is None or lo < first else first
            last = hi if last is None or hi > last else last
        state.update((n, s, first, last))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "sum_value": s,
            "first_ts": first, "last_ts": last, "closed": False}])

    return (stream_df
            .groupBy("user_id")
            .applyInPandasWithState(update,
                                    outputStructType=SESSION_OUTPUT_SCHEMA,
                                    stateStructType=SESSION_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
