"""Streaming ingest tests: file-source stream → versioned commits per batch;
watermarked windowed aggregation; stateful sessionization."""

import os

import pytest
from pyspark.sql import functions as F

from table_versions_spark.engine import VersionedEngine
from table_versions_spark.streaming.ingest import (
    sessionize,
    versioned_stream_writer,
    windowed_counts,
)

EVENTS_DDL = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def _write_batch(spark, src_dir, rows, batch):
    df = spark.createDataFrame(rows, EVENTS_DDL)
    df.coalesce(1).write.mode("append").parquet(src_dir)
    return df


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


ROWS1 = [(1, _ts("2024-01-01 10:00:00"), 7, "click", 1.0),
         (2, _ts("2024-01-01 10:05:00"), 7, "view", 2.0),
         (3, _ts("2024-01-02 09:00:00"), 8, "click", 3.0)]
ROWS2 = [(4, _ts("2024-01-02 12:00:00"), 8, "view", 4.0)]


class TestVersionedStreamIngest:
    def test_stream_batches_become_commits(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        _write_batch(spark, src, ROWS1, 1)

        engine = VersionedEngine(spark, str(tmp_path / "wh"))
        engine.create_table("st.events", schema_ddl=EVENTS_DDL + ", event_date date",
                            partition_columns=["event_date"])

        stream = (spark.readStream.schema(EVENTS_DDL).parquet(src)
                  .withColumn("event_date", F.to_date("ts")))
        q = versioned_stream_writer(stream, engine, "st.events", "streamer",
                                    str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert engine.read("st.events").count() == 3

        # second file → second run picks up only the new data (checkpointed)
        _write_batch(spark, src, ROWS2, 2)
        stream2 = (spark.readStream.schema(EVENTS_DDL).parquet(src)
                   .withColumn("event_date", F.to_date("ts")))
        q2 = versioned_stream_writer(stream2, engine, "st.events", "streamer",
                                     str(tmp_path / "ckpt"))
        q2.awaitTermination(120)
        df = engine.read("st.events")
        assert df.count() == 4
        # one commit per non-empty batch, auditable in history
        msgs = [r.message for r in engine.history("st.events").collect()]
        assert sum(m.startswith("stream batch") for m in msgs) == 2
        # partitions landed under versioned dirs
        parts = engine.current_version("st.events").partition_versions
        assert {p.render() for p in parts} == {
            "event_date=2024-01-01", "event_date=2024-01-02"}

    def test_windowed_counts(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        _write_batch(spark, src, ROWS1 + ROWS2, 1)
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        agg = windowed_counts(stream, window_duration="1 hour",
                              watermark_delay="10 minutes")
        q = (agg.writeStream.format("memory").queryName("win_counts")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        out = {(r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
               for r in spark.table("win_counts").collect()}
        assert out[("2024-01-01T10:00:00", "click")] == (1, 1.0)
        assert out[("2024-01-01T10:00:00", "view")] == (1, 2.0)
        assert out[("2024-01-02T09:00:00", "click")] == (1, 3.0)
        assert out[("2024-01-02T12:00:00", "view")] == (1, 4.0)

    def test_stream_late_drop_and_grace(self, spark, tmp_path):
        """Planted late-data pin for q_stream_late: a wave-2 row whose
        window the wave-1 watermark already sealed is DROPPED (its 100.0
        never appears), a late-but-in-grace wave-2 row still aggregates,
        and wave-2 rows advance the watermark that closes further windows.
        Wave membership is event_id % LATE_MOD == 0."""
        import datetime

        from table_versions_spark.operators.versioned import q_stream_late

        def ns(h, m=0):
            t = datetime.datetime(2024, 1, 1, h, m,
                                  tzinfo=datetime.timezone.utc)
            return int(t.timestamp()) * 1_000_000_000

        rows = [
            # wave 1 (ids % 7 != 0): wm1 = 13:00 - 10min = 12:50
            (1, ns(10), 1, "click", 1.0, ""),
            (2, ns(13), 1, "click", 2.0, ""),
            # wave 2 (ids % 7 == 0):
            (7, ns(10, 30), 1, "click", 100.0, ""),   # end 11:00 ≤ wm1 → DROP
            (14, ns(12, 55), 1, "click", 5.0, ""),    # end 13:00 > wm1 → keep
            (21, ns(14), 1, "view", 9.0, ""),         # advances wm2 to 13:50
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, "
                  "event_type string, value double, props string")
        d = str(tmp_path / "sf")
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
               for r in q_stream_late(spark, d).collect()}
        # run 1 sealed [10:00,11:00) from wave-1 only; run 2 admitted the
        # 12:55 row and wm2=13:50 closed [12:00,13:00); [13:00,14:00) and
        # [14:00,15:00) stay open (end > wm2) and must not appear
        assert out == {
            (datetime.datetime(2024, 1, 1, 10), "click"): (1, 1.0),
            (datetime.datetime(2024, 1, 1, 12), "click"): (1, 5.0),
        }

    def test_sessionize_stateful(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        _write_batch(spark, src, ROWS1 + ROWS2, 1)
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        sess = sessionize(stream)
        q = (sess.writeStream.format("memory").queryName("sessions")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {r.user_id: r for r in spark.table("sessions").collect()}
        assert rows[7].n_events == 2 and rows[7].sum_value == 3.0
        assert rows[8].n_events == 2 and rows[8].sum_value == 7.0
        assert rows[7].first_ts == _ts("2024-01-01 10:00:00")
        assert rows[7].last_ts == _ts("2024-01-01 10:05:00")


class TestVersionedStreamSource:
    def test_stream_reads_commits_incrementally(self, spark, engine, tmp_path):
        from table_versions_spark.streaming.source import register

        engine.create_table("db.feed", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a"), (2, "b")],
                                            "id bigint, d string"),
                      "db.feed", "u", "c1")
        engine.insert(spark.createDataFrame([(3, "c")], "id bigint, d string"),
                      "db.feed", "u", "c2")
        register(spark)
        loc = engine.definition("db.feed").location
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def run_batch():
            q = (spark.readStream.format("tvx")
                 .option("location", loc).load()
                 .writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(60)

        run_batch()
        got = {tuple(r) for r in spark.read.parquet(out).collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}
        # new commit; restart from checkpoint picks up ONLY the delta
        engine.insert(spark.createDataFrame([(4, "b")], "id bigint, d string"),
                      "db.feed", "u", "c3")
        run_batch()
        got2 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        # d=b was overwritten in c3: the delta batch contains only the new
        # version of d=b — untouched d=a / d=c are not re-emitted
        assert got2 == sorted([(1, "a"), (2, "b"), (3, "c"), (4, "b")])

    def test_batch_read_format_tvx(self, spark, engine):
        from table_versions_spark.streaming.source import register

        engine.create_table("db.batchfeed", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a"), (2, "b")],
                                            "id bigint, d string"),
                      "db.batchfeed", "u", "c1")
        c1 = engine.history("db.batchfeed").first()["commit_id"]
        engine.insert(spark.createDataFrame([(9, "b")], "id bigint, d string"),
                      "db.batchfeed", "u", "c2")
        register(spark)
        loc = engine.definition("db.batchfeed").location
        df = spark.read.format("tvx").option("location", loc).load()
        assert sorted(tuple(r) for r in df.collect()) == [(1, "a"), (9, "b")]
        # time travel through the reader option
        old = (spark.read.format("tvx").option("location", loc)
               .option("at_commit", c1).load())
        assert sorted(tuple(r) for r in old.collect()) == [(1, "a"), (2, "b")]

    def test_max_commits_per_trigger(self, spark, engine, tmp_path):
        from table_versions_spark.streaming.source import register

        engine.create_table("db.capped", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        for i, c in enumerate("abc"):
            engine.insert(spark.createDataFrame([(i, c)], "id bigint, d string"),
                          "db.capped", "u", f"c{i}")
        register(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            # availableNow snapshots its target from the first capped read,
            # so each run advances at most maxCommitsPerTrigger commits —
            # the incremental-job pattern the cap exists for
            q = (spark.readStream.format("tvx")
                 .option("location", engine.definition("db.capped").location)
                 .option("maxCommitsPerTrigger", "1").load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(60)

        for _ in range(4):  # init + 3 data commits, one per run
            run_once()
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        assert got == [(0, "a"), (1, "b"), (2, "c")]
        # progress was checkpointed one commit at a time
        offsets = os.listdir(os.path.join(ckpt, "offsets"))
        assert len([o for o in offsets if o.isdigit()]) >= 4


class TestSourcePartitionValueFidelity:
    def test_tvx_unescapes_and_nulls_partition_values(self, spark, tmp_path):
        """tvx batch/stream reads must surface partition values exactly as
        engine.read does: %XX-unescaped, __HIVE_DEFAULT_PARTITION__ -> NULL."""
        from table_versions_spark.streaming.source import register

        engine = VersionedEngine(spark, str(tmp_path / "wh"))
        ddl = "id bigint, d string"
        engine.create_table("st.pv", schema_ddl=ddl, partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "x:y"), (2, None), (3, "plain")], ddl), "st.pv", "u", "v1")
        register(spark)
        loc = engine.definition("st.pv").location
        got = sorted((r["id"], r["d"]) for r in
                     spark.read.format("tvx").option("location", loc)
                     .load().collect())
        assert got == [(1, "x:y"), (2, None), (3, "plain")]


class TestParallelStreamReader:
    def test_one_input_partition_per_changed_dir(self, spark, engine):
        """A commit touching N partitions plans N InputPartitions — the
        executor-parallel path for large commits."""
        from table_versions_spark.streaming.source import (
            VersionedTableParallelStreamReader)

        engine.create_table("db.par", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, d string"),
            "db.par", "u", "c1")
        engine.insert(spark.createDataFrame([(4, "b")], "id bigint, d string"),
                      "db.par", "u", "c2")
        loc = engine.definition("db.par").location
        r = VersionedTableParallelStreamReader(loc)
        assert r.initialOffset() == {"seq": -1}
        head = r.latestOffset()["seq"]
        assert head == 2  # init + 2 commits
        # full backfill: 3 dirs; delta c2: only d=b's new version dir
        assert len(r.partitions({"seq": -1}, {"seq": 1})) == 3
        delta = r.partitions({"seq": 1}, {"seq": 2})
        assert len(delta) == 1 and "d=b" in delta[0].directory
        assert r.partitions({"seq": 2}, {"seq": 2}) == []
        # read() yields Arrow RecordBatches (never per-row Python tuples),
        # already in the declared schema: dir rows + partition col attached
        import pyarrow as pa

        batches = list(r.read(delta[0]))
        assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
        tbl = pa.Table.from_batches(batches)
        assert tbl.schema == r.pa_schema
        assert sorted(map(tuple, tbl.to_pylist()[0].items())) == [
            ("d", "b"), ("id", 4)]

    def test_checkpoint_past_head_fails_loudly(self, spark, engine):
        """An offset beyond the log head (checkpoint replayed against a
        truncated/recreated table) must raise, not fold a clamped state
        that makes before==after and the stream silently emit nothing."""
        from table_versions_spark.core.log import UnknownCommitError
        from table_versions_spark.streaming.source import (
            VersionedTableParallelStreamReader)

        engine.create_table("db.trunc", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a")], "id bigint, d string"),
                      "db.trunc", "u", "c1")
        loc = engine.definition("db.trunc").location
        r = VersionedTableParallelStreamReader(loc)
        head = r.latestOffset()["seq"]
        with pytest.raises(UnknownCommitError):
            r.partitions({"seq": head}, {"seq": head + 7})
        with pytest.raises(UnknownCommitError):
            r.partitions({"seq": head + 3}, {"seq": head + 7})

    def test_parallel_reader_is_default_stream_path(self, spark, engine,
                                                    tmp_path):
        """readStream without maxCommitsPerTrigger goes through the
        partition-parallel reader and yields the same results."""
        from table_versions_spark.streaming.source import register

        engine.create_table("db.par2", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, "a"), (2, "b")], "id bigint, d string"), "db.par2", "u", "c1")
        register(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (spark.readStream.format("tvx")
             .option("location", engine.definition("db.par2").location).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        assert got == [(1, "a"), (2, "b")]


class TestTvxSink:
    """df.write.format("tvx") / writeStream.format("tvx") — the write-side
    face of the data source (streaming/sink.py)."""

    def test_batch_sink_overwrite_and_append(self, spark, engine):
        from table_versions_spark.streaming.source import register

        register(spark)
        ddl = "id bigint, v double, d string"
        engine.create_table("sk.pt", schema_ddl=ddl, partition_columns=["d"])
        loc = engine.definition("sk.pt").location
        spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, None)], ddl
        ).write.format("tvx").mode("overwrite").option("location", loc).save()
        got = sorted((r.id, r.d) for r in engine.read("sk.pt").collect())
        assert got == [(1, "a"), (2, "b"), (3, None)]
        # append accumulates (previous files hardlinked, no rewrite)
        spark.createDataFrame([(9, 9.0, "a")], ddl).write.format("tvx").mode(
            "append").option("location", loc).save()
        got = sorted((r.id, r.d) for r in engine.read("sk.pt").collect())
        assert got == [(1, "a"), (2, "b"), (3, None), (9, "a")]
        # overwrite replaces ONLY touched partitions (Hive-insert semantics)
        spark.createDataFrame([(7, 7.0, "a")], ddl).write.format("tvx").mode(
            "overwrite").option("location", loc).save()
        got = sorted((r.id, r.d) for r in engine.read("sk.pt").collect())
        assert got == [(2, "b"), (3, None), (7, "a")]
        # footer stats rode each commit: log-only ANALYZE agrees
        assert engine.table_stats("sk.pt")["rows"] == 3
        # round trip through the tvx SOURCE face
        rt = sorted((r.id, r.d) for r in spark.read.format("tvx")
                    .option("location", loc).load().collect())
        assert rt == got

    def test_batch_sink_snapshot(self, spark, engine):
        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("sk.sn", schema_ddl="id bigint, name string")
        loc = engine.definition("sk.sn").location
        spark.createDataFrame([(1, "x")], "id bigint, name string"
                              ).write.format("tvx").mode("overwrite").option(
            "location", loc).save()
        spark.createDataFrame([(2, "y")], "id bigint, name string"
                              ).write.format("tvx").mode("append").option(
            "location", loc).save()
        assert engine.read("sk.sn").count() == 2
        # each write is one commit; overwrite replaced, append accumulated
        assert engine.history("sk.sn").count() == 3  # init + 2 writes

    def test_sink_guards(self, spark, engine):
        """What the sink still refuses: bucket columns it cannot hash with
        HashPartitioning parity (float/double/decimal/timestamp) and
        constraints/derivations outside the faithful evaluation subset —
        supported features are covered by TestSinkCapabilities."""
        import pytest as _pytest

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("sk.bk", schema_ddl="id bigint, v double",
                            bucket_columns=["v"], bucket_count=4)
        with _pytest.raises(Exception, match="hash"):
            spark.createDataFrame([(1, 1.0)], "id bigint, v double"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("sk.bk").location
                                  ).save()
        # a constraint using a function call sits outside the
        # dialect-neutral grammar: refuse at construction, loudly
        engine.create_table("sk.ckf", schema_ddl="id bigint, s string",
                            check_constraints=["length(s) > 0"])
        with _pytest.raises(Exception, match="grammar"):
            spark.createDataFrame([(1, "x")], "id bigint, s string"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("sk.ckf").location
                                  ).save()
        # in-grammar but type-divergent: Spark coerces 's > 5' via implicit
        # cast, DuckDB's binder refuses — the construction-time probe turns
        # that into a loud refusal instead of a per-task crash
        engine.create_table("sk.ckt", schema_ddl="id bigint, s string",
                            check_constraints=["s > 5"])
        with _pytest.raises(Exception, match="faithfully"):
            spark.createDataFrame([(1, "9")], "id bigint, s string"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("sk.ckt").location
                                  ).save()
        # a derivation outside the Arrow catalogue likewise
        engine.create_table("sk.dvf", schema_ddl="id bigint, ts timestamp, "
                            "d string", partition_columns=["d"],
                            partition_derivations={
                                "d": "date_format(ts, 'yyyy-MM')"})
        with _pytest.raises(Exception, match="catalogue"):
            spark.createDataFrame(
                [(1, __import__("datetime").datetime(2026, 1, 2))],
                "id bigint, ts timestamp"
            ).write.format("tvx").mode("overwrite").option(
                "location", engine.definition("sk.dvf").location).save()

    def test_sink_accepts_declared_type_aliases(self, spark, engine):
        """A table declared with alias spellings ('id long',
        'c varchar(10)') must accept a frame carrying the canonical
        simpleString types (bigint, string): aliases in the same Murmur3
        hash class hash identically, so this is NOT type drift. Real drift
        (declared bigint, frame int — different hash widths) stays
        refused."""
        import pytest as _pytest

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("sk.alias", schema_ddl="id long, c varchar(10)",
                            bucket_columns=["id", "c"], bucket_count=4)
        loc = engine.definition("sk.alias").location
        spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, c string"
                              ).write.format("tvx").mode("overwrite"
                              ).option("location", loc).save()
        assert sorted((r.id, r.c) for r in engine.read("sk.alias").collect()
                      ) == [(1, "x"), (2, "y")]
        # genuine drift is still loud: int frame against declared long
        with _pytest.raises(Exception, match="type-sensitive"):
            spark.createDataFrame([(3, "z")], "id int, c string"
                                  ).write.format("tvx").mode("append"
                                  ).option("location", loc).save()

    def test_stream_sink_exactly_once(self, spark, engine, tmp_path):
        """One commit per epoch; a replayed epoch (same txnApp+batchId,
        fresh checkpoint) is absorbed by the idempotence token."""
        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("sk.st", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        loc = engine.definition("sk.st").location
        src = str(tmp_path / "src")
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, d string"
                              ).write.mode("overwrite").parquet(src)

        def run(ckpt):
            q = (spark.readStream.schema("id bigint, d string").parquet(src)
                 .writeStream.format("tvx").option("location", loc)
                 .option("txnApp", "t1")
                 .option("checkpointLocation", str(tmp_path / ckpt))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run("ckpt1")
        got = sorted((r.id, r.d) for r in engine.read("sk.st").collect())
        assert got == [(1, "a"), (2, "b")]
        run("ckpt2")  # replay epoch 0 under the same token stream
        got = sorted((r.id, r.d) for r in engine.read("sk.st").collect())
        assert got == [(1, "a"), (2, "b")]  # absorbed, not double-applied
        # staging fully drained
        import os
        staging = os.path.join(loc, "_staging")
        assert not os.path.isdir(staging) or os.listdir(staging) == []


class TestSinkCapabilities:
    """Capabilities the sink evaluates WITHOUT Spark on the write path —
    column mapping (pure rename), CHECK constraints (DuckDB over the Arrow
    batches, dialect-neutral grammar), generated partition columns (Arrow
    kernel catalogue) — each byte-identical with engine.insert."""

    def test_column_mapped_write_roundtrip(self, spark, engine):
        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.cm", schema_ddl="id bigint, v double")
        engine.insert(spark.createDataFrame([(1, 1.0)],
                                            "id bigint, v double"),
                      "skc.cm", "u", "v1")
        engine.rename_column("skc.cm", "v", "amount")
        loc = engine.definition("skc.cm").location
        spark.createDataFrame([(2, 2.0)], "id bigint, amount double"
                              ).write.format("tvx").mode("append"
                              ).option("location", loc).save()
        got = sorted((r.id, r.amount) for r in
                     engine.read("skc.cm").collect())
        assert got == [(1, 1.0), (2, 2.0)]
        via_src = sorted((r.id, r.amount) for r in
                         spark.read.format("tvx").option("location", loc)
                         .load().collect())
        assert via_src == got
        # on disk the new file carries the PHYSICAL name, like engine.insert
        import pyarrow.parquet as pq
        phys = {c for f in engine.read("skc.cm").inputFiles()
                for c in pq.read_schema(f.removeprefix("file:")).names}
        assert "v" in phys and "amount" not in phys

    def test_check_constraints_enforced(self, spark, engine):
        import pytest as _pytest

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.ck", schema_ddl="id bigint, v double",
                            check_constraints=["v >= 0"])
        loc = engine.definition("skc.ck").location
        spark.createDataFrame([(1, 0.5), (2, None)], "id bigint, v double"
                              ).write.format("tvx").mode("overwrite"
                              ).option("location", loc).save()
        # NULL passes (SQL CHECK semantics), engine.insert parity
        assert engine.read("skc.ck").count() == 2
        before = engine.history("skc.ck").count()
        with _pytest.raises(Exception, match="CHECK constraint"):
            spark.createDataFrame([(3, -1.0)], "id bigint, v double"
                                  ).write.format("tvx").mode("append"
                                  ).option("location", loc).save()
        # the violating job aborted before any commit; table unchanged
        assert engine.history("skc.ck").count() == before
        assert engine.read("skc.ck").count() == 2

    def test_derived_partitions_match_engine_insert(self, spark, engine):
        import datetime as dt
        import os

        from table_versions_spark.streaming.source import register

        register(spark)
        for t in ("skc.gp_e", "skc.gp_s"):
            engine.create_table(t,
                                schema_ddl="id bigint, ts timestamp, d date",
                                partition_columns=["d"],
                                partition_derivations={"d": "to_date(ts)"})
        df = spark.createDataFrame(
            [(1, dt.datetime(2019, 3, 13, 10)),
             (2, dt.datetime(2019, 3, 14, 2))],
            "id bigint, ts timestamp")
        engine.insert(df, "skc.gp_e", "u", "engine path")
        df.write.format("tvx").mode("overwrite").option(
            "location", engine.definition("skc.gp_s").location).save()
        renders = []
        for t in ("skc.gp_e", "skc.gp_s"):
            loc = engine.definition(t).location
            renders.append(sorted(p for p in os.listdir(loc)
                                  if p.startswith("d=")))
        assert renders[0] == renders[1]  # byte-identical partition dirs
        assert renders[0] == ["d=2019-03-13", "d=2019-03-14"]
        got = {(r.id, r.d) for r in engine.read("skc.gp_s").collect()}
        assert got == {(1, dt.date(2019, 3, 13)), (2, dt.date(2019, 3, 14))}

    def test_empty_string_partition_renders_default(self, spark, engine):
        """Spark's partitionBy maps an empty-string partition value to
        __HIVE_DEFAULT_PARTITION__; the sink's Arrow grouping must render
        identically or engine/sink writers would split one logical
        partition across two directories."""
        import os

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.es", schema_ddl="id bigint, d string",
                            partition_columns=["d"])
        loc = engine.definition("skc.es").location
        spark.createDataFrame([(1, ""), (2, "x")], "id bigint, d string"
                              ).write.format("tvx").mode("overwrite"
                              ).option("location", loc).save()
        dirs = sorted(p for p in os.listdir(loc) if p.startswith("d="))
        assert dirs == ["d=__HIVE_DEFAULT_PARTITION__", "d=x"]
        # engine.insert into the same partition lands in the SAME dir
        engine.insert(spark.createDataFrame([(3, "")], "id bigint, d string"),
                      "skc.es", "u", "engine write", mode="append")
        assert sorted(p for p in os.listdir(loc)
                      if p.startswith("d=")) == dirs

    def test_partition_value_render_parity(self, spark, engine):
        """Non-string partition values (bool, timestamp) must render the
        directory name exactly as Spark's partitionBy does — Python's
        str(True) is 'True' vs Spark's 'true', and a datetime's default
        str keeps trailing fractional zeros Spark trims — or one logical
        partition splits across two directories."""
        import datetime as dt
        import os

        from table_versions_spark.streaming.source import register

        register(spark)
        for t in ("skc.pv_e", "skc.pv_s"):
            engine.create_table(
                t, schema_ddl="id bigint, b boolean, ts timestamp",
                partition_columns=["b", "ts"])
        df = spark.createDataFrame(
            [(1, True, dt.datetime(2020, 5, 6, 7, 8, 9, 500000)),
             (2, False, dt.datetime(2020, 5, 6, 7, 8, 9))],
            "id bigint, b boolean, ts timestamp")
        engine.insert(df, "skc.pv_e", "u", "engine path")
        loc_s = engine.definition("skc.pv_s").location
        df.write.format("tvx").mode("overwrite").option(
            "location", loc_s).save()

        def pdirs(t):
            loc = engine.definition(t).location
            out = []
            for b in sorted(p for p in os.listdir(loc)
                            if p.startswith("b=")):
                out += [f"{b}/{ts}" for ts in
                        sorted(os.listdir(os.path.join(loc, b)))]
            return out

        assert pdirs("skc.pv_e") == pdirs("skc.pv_s")
        assert pdirs("skc.pv_e")[0].startswith("b=false/ts=")
        # and overwriting an engine-written partition through the sink
        # REPLACES it (same directory), never writes a doppelgänger dir
        engine.create_table("skc.pv_r", schema_ddl="id bigint, b boolean",
                            partition_columns=["b"])
        loc_r = engine.definition("skc.pv_r").location
        engine.insert(spark.createDataFrame([(1, True)],
                                            "id bigint, b boolean"),
                      "skc.pv_r", "u", "engine write")
        spark.createDataFrame([(2, True)], "id bigint, b boolean"
                              ).write.format("tvx").mode("overwrite"
                              ).option("location", loc_r).save()
        assert [(r.id, r.b) for r in engine.read("skc.pv_r").collect()] \
            == [(2, True)]

    def test_unrenderable_partition_type_refused(self, spark, engine):
        """float/double partition values have no Python rendering that
        matches Java's Double.toString — refused at DECLARATION since
        engine._validate_partition_types (every later partition render
        would address the wrong directory for some values)."""
        import pytest as _pytest

        with _pytest.raises(Exception, match="render"):
            engine.create_table("skc.fp", schema_ddl="id bigint, f double",
                                partition_columns=["f"])

    def test_identity_derived_float_partition_refused(self, spark, engine):
        """A bare-column partition derivation over a double source smuggles
        the unrenderable type past the incoming-schema check — the refusal
        must look at the EFFECTIVE type, source column included.
        Declaration-time validation catches the declared double p."""
        import pytest as _pytest

        with _pytest.raises(Exception, match="render"):
            engine.create_table(
                "skc.fpd", schema_ddl="id bigint, f double, p double",
                partition_columns=["p"],
                partition_derivations={"p": "f"})

    def test_sink_refuses_float_partition_on_ddl_less_table(
            self, spark, engine):
        """Tables declared WITHOUT schema_ddl skip the declaration-time
        partition-type check (nothing to check against), so the sink's
        own frame-side effective-type guard (sink._write_plan) is the
        live refusal path — both for a direct double partition column
        and for one smuggled in via an identity derivation."""
        import pytest as _pytest

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.fpn", partition_columns=["f"])
        with _pytest.raises(Exception, match="render"):
            spark.createDataFrame([(1, 1.5)], "id bigint, f double"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("skc.fpn").location
                                  ).save()
        engine.create_table("skc.fpdn", partition_columns=["p"],
                            partition_derivations={"p": "f"})
        with _pytest.raises(Exception, match="render"):
            spark.createDataFrame([(1, 1e-07)], "id bigint, f double"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("skc.fpdn").location
                                  ).save()

    def test_sink_bucketed_write(self, spark, engine):
        """Sink writes to bucketed tables: rows are split by the vectorized
        Murmur3 bucket id and the id rides the part-file name, so
        bucket-pruned point reads and bucketed_join see sink-written data
        exactly as engine-written data."""
        import re

        from table_versions_spark.streaming.source import register

        register(spark)
        rows = [(i, f"name-{i}", i % 7) for i in range(200)]
        ddl = "id bigint, name string, grp bigint"
        ddl_e = "id bigint, ename string, egrp bigint"
        engine.create_table("skb.s", schema_ddl=ddl,
                            bucket_columns=["id"], bucket_count=8)
        engine.create_table("skb.e", schema_ddl=ddl_e,
                            bucket_columns=["id"], bucket_count=8)
        df = spark.createDataFrame(rows, ddl)
        df.write.format("tvx").mode("overwrite").option(
            "location", engine.definition("skb.s").location).save()
        engine.insert(spark.createDataFrame(rows, ddl_e),
                      "skb.e", "u", "engine write")

        # every sink-written file carries a parseable bucket index
        loc = engine.definition("skb.s").location
        files = [f for d, _, fs in os.walk(loc) for f in fs
                 if f.startswith("part-")]
        assert files
        assert all(re.match(r"part-\d{5}-", f) for f in files)

        # bucket-pruned point read returns exactly the key's rows, and the
        # pruned file set is a strict subset (1/bucket_count-ish)
        got = engine.read("skb.s", bucket_filter={"id": 42})
        assert [(r.id, r.name) for r in
                got.where("id = 42").collect()] == [(42, "name-42")]
        # sink-written and engine-written buckets agree row-for-row
        for key in (0, 1, 42, 199):
            s = set(map(tuple, engine.read(
                "skb.s", bucket_filter={"id": key}).collect()))
            e = set(map(tuple, engine.read(
                "skb.e", bucket_filter={"id": key}).collect()))
            assert s == e and (key, f"name-{key}", key % 7) in s

        # co-bucketed join between an engine-written and a sink-written
        # table: zero-shuffle branch union, full row parity
        j = engine.bucketed_join("skb.s", "skb.e")
        assert j.count() == 200

        # append through the sink accumulates within the bucket contract
        spark.createDataFrame([(1000, "name-1000", 0)], ddl
                              ).write.format("tvx").mode("append").option(
            "location", loc).save()
        got = engine.read("skb.s", bucket_filter={"id": 1000})
        assert (1000, "name-1000", 0) in set(map(tuple, got.collect()))
        assert engine.read("skb.s").count() == 201

    def test_batch_reader_pushes_partition_filters(self, spark, engine):
        """spark.read.format('tvx').where(partition = x) prunes whole
        version dirs at planning time (pushFilters), while Spark still
        re-applies the predicate post scan (every filter is returned as
        partially pushed — the prune can only over-read, never
        under-read)."""
        from pyspark.sql.datasource import EqualTo, In, GreaterThan

        from table_versions_spark.streaming.source import (
            VersionedTableBatchReader,
            register,
        )

        register(spark)
        ddl = "id bigint, v double, d string"
        rows = [(i, float(i), ["a", "b", "c"][i % 3]) for i in range(30)]
        engine.create_table("skp.t", schema_ddl=ddl, partition_columns=["d"])
        engine.insert(spark.createDataFrame(rows, ddl), "skp.t", "u", "v1")
        loc = engine.definition("skp.t").location

        # reader-level: EqualTo prunes to one dir; In to two; a filter on
        # a non-partition column prunes nothing; all filters come back
        r = VersionedTableBatchReader(loc)
        assert len(r.dirs) == 3
        back = r.pushFilters([EqualTo(("d",), "a"), GreaterThan(("id",), 5)])
        assert len(list(back)) == 2
        assert len(r.dirs) == 1 and r.dirs[0][0].render() == "d=a"
        r2 = VersionedTableBatchReader(loc)
        r2.pushFilters([In(("d",), ["a", "c"])])
        assert sorted(p.render() for p, _ in r2.dirs) == ["d=a", "d=c"]
        r3 = VersionedTableBatchReader(loc)
        r3.pushFilters([GreaterThan(("d",), "a"), EqualTo(("id",), 1)])
        assert len(r3.dirs) == 3  # range filters on partitions: no prune

        # e2e: results unchanged, predicate still applied by Spark
        got = (spark.read.format("tvx").option("location", loc).load()
               .where("d = 'b' AND id >= 10"))
        assert sorted((x.id, x.d) for x in got.collect()) == \
            [(i, "b") for i in range(10, 30) if i % 3 == 1]

        # an unrenderable pushed value (float/bytes partition comparisons
        # render_partition_value refuses) must fall back to a full read
        # for that constraint, never fail the query — and other
        # constraints in the same push still prune
        r4 = VersionedTableBatchReader(loc)
        r4.pushFilters([EqualTo(("d",), 1.5), In(("d",), [b"x", "a"])])
        assert len(r4.dirs) == 3  # both constraints skipped, full read
        r5 = VersionedTableBatchReader(loc)
        r5.pushFilters([EqualTo(("d",), 1.5), EqualTo(("d",), "a")])
        assert len(r5.dirs) == 1 and r5.dirs[0][0].render() == "d=a"

    def test_batch_reader_pushes_bucket_point_lookup(self, spark, engine):
        """An equality on every bucket column computes the key's bucket id
        driver-side and reads only that bucket's files — the engine's
        read(bucket_filter=...) point lookup through the plain DataFrame
        reader."""
        from pyspark.sql.datasource import EqualTo

        from table_versions_spark.core.sparkhash import bucket_id
        from table_versions_spark.streaming.source import (
            VersionedTableBatchReader,
            register,
        )

        register(spark)
        ddl = "id bigint, name string"
        engine.create_table("skp.bk", schema_ddl=ddl,
                            bucket_columns=["id"], bucket_count=8)
        engine.insert(spark.createDataFrame(
            [(i, f"n{i}") for i in range(200)], ddl), "skp.bk", "u", "v1")
        loc = engine.definition("skp.bk").location

        r = VersionedTableBatchReader(loc)
        r.pushFilters([EqualTo(("id",), 42)])
        assert r.bucket_sel == bucket_id([42], ["bigint"], 8)
        # the pruned read yields only bucket-42's rows, 42 among them
        got = [row for part in r.partitions()
               for b in r.read(part) for row in b.to_pylist()]
        assert 0 < len(got) < 200
        assert any(row["id"] == 42 for row in got)
        assert all(bucket_id([row["id"]], ["bigint"], 8) == r.bucket_sel
                   for row in got)
        # partial bucket-key equality must NOT prune
        r2 = VersionedTableBatchReader(loc)
        r2.pushFilters([EqualTo(("name",), "n42")])
        assert r2.bucket_sel is None

        # e2e through Spark: exact point lookup
        got = (spark.read.format("tvx").option("location", loc).load()
               .where("id = 42"))
        assert [(x.id, x.name) for x in got.collect()] == [(42, "n42")]

    def test_sink_partitioned_bucketed_write(self, spark, engine):
        """Partition dirs AND bucket indices from one Arrow group_by:
        each task file lands under its partition render with its bucket
        id in the name, and partition-pruned + bucket-pruned reads
        compose."""
        import re

        from table_versions_spark.streaming.source import register

        register(spark)
        ddl = "id bigint, v double, d string"
        rows = [(i, float(i), "a" if i % 2 else "b") for i in range(100)]
        engine.create_table("skb.pb", schema_ddl=ddl,
                            partition_columns=["d"],
                            bucket_columns=["id"], bucket_count=4)
        loc = engine.definition("skb.pb").location
        spark.createDataFrame(rows, ddl).write.format("tvx").mode(
            "overwrite").option("location", loc).save()
        assert engine.read("skb.pb").count() == 100
        # composed pruning: one partition, one bucket
        got = engine.read("skb.pb", partition_filter={"d": "a"},
                          bucket_filter={"id": 13}).where("id = 13")
        assert [(r.id, r.v, r.d) for r in got.collect()] == [(13, 13.0, "a")]
        # every file under every partition dir carries its bucket index
        for base, _, files in os.walk(loc):
            for f in files:
                if f.startswith("part-") and "_staging" not in base:
                    assert re.match(r"part-\d{5}-", f), (base, f)

    def test_streaming_sink_bucketed_table(self, spark, engine, tmp_path):
        """The streaming face shares the batch writer's bucket split, and
        the epoch commit's stage→final MOVE must preserve the part-file
        names (the bucket index rides them)."""
        import re

        from table_versions_spark.streaming.source import register

        register(spark)
        ddl = "id bigint, name string"
        engine.create_table("skb.src", schema_ddl=ddl)
        engine.create_table("skb.dst", schema_ddl=ddl,
                            bucket_columns=["id"], bucket_count=4)
        src = engine.definition("skb.src").location
        dst = engine.definition("skb.dst").location
        engine.insert(spark.createDataFrame(
            [(i, f"n{i}") for i in range(50)], ddl), "skb.src", "u", "v1")
        q = (spark.readStream.format("tvx").option("location", src).load()
             .writeStream.format("tvx").option("location", dst)
             .option("txnApp", "bk-repl")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert engine.read("skb.dst").count() == 50
        files = [os.path.basename(f)
                 for f in engine.read("skb.dst").inputFiles()]
        assert files and all(re.match(r"part-\d{5}-", f) for f in files)
        got = engine.read("skb.dst", bucket_filter={"id": 42}) \
            .where("id = 42").collect()
        assert [(r.id, r.name) for r in got] == [(42, "n42")]

    def test_render_pvalue_pads_ancient_years(self):
        """glibc strftime renders year 1 as '1'; Spark pads to '0001' —
        the sentinel timestamp 0001-01-01 must not split a partition."""
        import datetime as dt

        from table_versions_spark.core.model import render_partition_value

        assert render_partition_value(
            dt.datetime(1, 1, 1)) == "0001-01-01 00:00:00"
        assert render_partition_value(
            dt.datetime(999, 12, 31, 1, 2, 3, 400000)) \
            == "0999-12-31 01:02:03.4"

    def test_value_dependent_cast_divergence_refused(self, spark, engine):
        """A partial-timestamp literal (ts >= '2020-01') binds in DuckDB
        but its vectorized cast only raises once rows are present; Spark
        casts it fine. The one-row construction probe must surface that
        as a loud refusal, not a per-task crash on the first write."""
        import pytest as _pytest

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.pt", schema_ddl="id bigint, ts timestamp",
                            check_constraints=["ts >= '2020-01'"])
        with _pytest.raises(Exception, match="faithfully"):
            spark.createDataFrame([(1, "2026-01-01 00:00:00")],
                                  "id bigint, ts string"
                                  ).selectExpr("id", "cast(ts as timestamp) ts"
                                  ).write.format("tvx").mode("overwrite"
                                  ).option("location",
                                           engine.definition("skc.pt").location
                                  ).save()

    def test_streaming_sink_applies_plan(self, spark, engine, tmp_path):
        """The streaming face shares the same write plan: derived
        partition columns materialize per micro-batch."""
        import datetime as dt
        import os

        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("skc.gst",
                            schema_ddl="id bigint, ts timestamp, d date",
                            partition_columns=["d"],
                            partition_derivations={"d": "to_date(ts)"})
        loc = engine.definition("skc.gst").location
        src = str(tmp_path / "src")
        spark.createDataFrame([(1, dt.datetime(2020, 5, 6, 3))],
                              "id bigint, ts timestamp"
                              ).write.mode("overwrite").parquet(src)
        q = (spark.readStream.schema("id bigint, ts timestamp").parquet(src)
             .writeStream.format("tvx").option("location", loc)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        assert sorted(p for p in os.listdir(loc)
                      if p.startswith("d=")) == ["d=2020-05-06"]
        got = {(r.id, r.d) for r in engine.read("skc.gst").collect()}
        assert got == {(1, dt.date(2020, 5, 6))}


class TestStreamingChangeFeed:
    def test_change_feed_emits_typed_rows(self, spark, engine, tmp_path):
        """readStream.format('tvx').option('changeFeed','true'): per span,
        dv commits diff exactly (vector delta + added files), rewrites and
        partition adds/removes emit coarse tombstone/insert rows."""
        from table_versions_spark.streaming.source import register

        register(spark)
        ddl = "id bigint, v double, d string"
        engine.create_table("cf.t", schema_ddl=ddl, partition_columns=["d"])
        engine.insert(spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "b")], ddl),
            "cf.t", "u", "v1")
        loc = engine.definition("cf.t").location
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            q = (spark.readStream.format("tvx").option("location", loc)
                 .option("changeFeed", "true").load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_once()  # initial state: everything is an insert
        got = sorted((r.id, r._change_type)
                     for r in spark.read.parquet(out).collect())
        assert got == [(1, "insert"), (2, "insert"), (3, "insert")]
        # dv delete + dv update + overwrite of partition b, then resume:
        # the next span diffs exactly for the dv commits and coarsely for
        # the rewrite
        engine.delete("cf.t", "id = 1", "u", "dvd", mode="dv")
        engine.update("cf.t", set={"v": "v * 10"}, predicate="id = 2",
                      user_id="u", message="dvu", mode="dv")
        engine.insert(spark.createDataFrame([(9, 9.0, "b")], ddl),
                      "cf.t", "u", "replace b")
        run_once()
        got = sorted((r.id, r.v, r._change_type)
                     for r in spark.read.parquet(out).collect())
        assert got == [
            (1, 1.0, "delete"), (1, 1.0, "insert"),
            (2, 2.0, "delete"), (2, 2.0, "insert"), (2, 20.0, "insert"),
            (3, 3.0, "delete"), (3, 3.0, "insert"),
            (9, 9.0, "insert")]
        # agreement with the batch row-level CDF for the same span
        pre = engine.history("cf.t").collect()[-2]["commit_id"]
        batch = engine.read_changes("cf.t", since_commit=pre,
                                    row_level=True)
        got_b = sorted((r.id, r.v, r._change_type)
                       for r in batch.collect())
        assert got_b == [(1, 1.0, "delete"), (2, 2.0, "delete"),
                         (2, 20.0, "insert"), (3, 3.0, "delete"),
                         (9, 9.0, "insert")]


class TestStreamSinkTxnGuard:
    def test_fresh_checkpoint_under_used_txn_app_fails_loudly(
            self, spark, engine, tmp_path):
        """A query restarted with a NEW checkpoint resets batchId to 0; if
        its txnApp already recorded later epochs, every batch would be
        silently skipped as a 'replay' — the sink must raise instead.
        Replaying the LATEST epoch (crash between log commit and
        checkpoint write) stays absorbed."""
        import pytest as _pytest

        from table_versions_spark.streaming.sink import (
            TvxCommitMessage,
            VersionedTableStreamWriter,
            _commit_versioned_write,
        )
        from table_versions_spark.core.model import Version

        engine.create_table("sk.guard", schema_ddl="id bigint")
        loc = engine.definition("sk.guard").location
        # record epoch 5 for app t9 (as a past run of the sink would)
        _commit_versioned_write(loc, Version.generate(), [None],
                                append=True, user_id="tvx-stream-writer",
                                message="epoch 5", txn=("t9", 5))
        w = VersionedTableStreamWriter(loc, overwrite=False, txn_app="t9")
        # replay of the latest epoch: absorbed silently
        w.commit([TvxCommitMessage(written=[], root=None)], 5)
        # fresh checkpoint (batchId back at 0): loud failure, not data loss
        with _pytest.raises(ValueError, match="new txnApp"):
            w.commit([TvxCommitMessage(written=[], root=None)], 0)


def test_sink_partition_grouping_is_vectorized():
    """The write path must never iterate rows in Python: grouping is
    Arrow-native (group_by + take); the only to_pylist is over per-GROUP
    distinct keys."""
    import inspect

    from table_versions_spark.streaming import sink

    src = inspect.getsource(sink._write_task_files)
    assert "group_by" in src
    assert "enumerate" not in src and "zip(*" not in src
    # two per-GROUP conversions: partition keys + bucket ids (both
    # O(#groups)); the per-ROW bucket hash is numpy (bucket_ids_arrow)
    assert src.count("to_pylist") <= 2


class TestTvxStorageBackends:
    def test_tvx_sink_and_source_on_object_store(self, spark, tmp_path):
        """format('tvx') with .option('storage', 'object'): the whole
        write/commit/read path runs through object-store semantics — no
        renames, no hardlinks (append carries files forward by COPY, so
        every data file has nlink == 1)."""
        import os as _os

        from table_versions_spark.core.storage import ObjectStoreStorage
        from table_versions_spark.engine import VersionedEngine
        from table_versions_spark.streaming.source import register

        register(spark)
        eng = VersionedEngine(spark, str(tmp_path / "wh"),
                              ObjectStoreStorage())
        ddl = "id bigint, d string"
        eng.create_table("osb.t", schema_ddl=ddl, partition_columns=["d"])
        loc = eng.definition("osb.t").location
        spark.createDataFrame([(1, "a"), (2, "b")], ddl).write.format(
            "tvx").mode("overwrite").option("location", loc).option(
            "storage", "object").save()
        spark.createDataFrame([(3, "a")], ddl).write.format("tvx").mode(
            "append").option("location", loc).option(
            "storage", "object").save()
        got = sorted((r.id, r.d) for r in eng.read("osb.t").collect())
        assert got == [(1, "a"), (2, "b"), (3, "a")]
        for f in eng.read("osb.t").inputFiles():
            p = f[len("file:"):] if f.startswith("file:") else f
            assert _os.stat(p).st_nlink == 1, f
        rt = sorted((r.id, r.d) for r in spark.read.format("tvx")
                    .option("location", loc).option("storage", "object")
                    .load().collect())
        assert rt == got
        # streaming sink epoch through the object backend
        src = str(tmp_path / "src")
        spark.createDataFrame([(9, "c")], ddl).write.parquet(src)
        q = (spark.readStream.schema(ddl).parquet(src)
             .writeStream.format("tvx").option("location", loc)
             .option("storage", "object").option("txnApp", "osb1")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted((r.id, r.d) for r in eng.read("osb.t").collect())
        assert got == [(1, "a"), (2, "b"), (3, "a"), (9, "c")]


class TestStreamingCdcSidecars:
    def test_change_feed_uses_cdc_sidecar_for_rewrites(self, spark, engine,
                                                       tmp_path):
        """On a change_data_feed table, the streaming change feed emits
        EXACT rows for a rewrite UPDATE (cdc partition kind) instead of
        the coarse delete-all+insert-all pair."""
        from table_versions_spark.streaming.source import register

        register(spark)
        ddl = "id bigint, v double, d string"
        engine.create_table("cfx.t", schema_ddl=ddl, partition_columns=["d"],
                            change_data_feed=True)
        engine.insert(spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "b")], ddl),
            "cfx.t", "u", "v1")
        loc = engine.definition("cfx.t").location
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            q = (spark.readStream.format("tvx").option("location", loc)
                 .option("changeFeed", "true").load()
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_once()  # initial snapshot: 3 inserts
        assert spark.read.parquet(out).count() == 3
        engine.update("cfx.t", set={"v": "v * 10"}, predicate="id = 1",
                      user_id="u", message="rewrite upd")
        run_once()
        rows = sorted((r.id, r.v, r._change_type)
                      for r in spark.read.parquet(out).collect())
        # coarse would emit 4 extra rows for partition a (delete 1,2 +
        # insert 1,2); exact emits only id=1's pair
        assert rows == [(1, 1.0, "delete"), (1, 1.0, "insert"),
                        (1, 10.0, "insert"),
                        (2, 2.0, "insert"), (3, 3.0, "insert")]


class TestStreamSchemaEvolution:
    def test_stream_across_evolution_commit(self, spark, engine, tmp_path):
        """The tvx source builds its Arrow schema from the CURRENT DDL and
        casts/null-fills old files: a stream started BEFORE an
        evolve_schema commit keeps its original schema for new batches; a
        fresh stream started AFTER sees the widened schema with NULLs for
        pre-evolution rows."""
        from table_versions_spark.streaming.source import register

        register(spark)
        engine.create_table("se.t", schema_ddl="id bigint")
        engine.insert(spark.createDataFrame([(1,)], "id bigint"),
                      "se.t", "u", "v1")
        loc = engine.definition("se.t").location
        out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")

        def run(out, ckpt):
            q = (spark.readStream.format("tvx").option("location", loc)
                 .load().writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run(out1, ck1)
        assert [r.id for r in spark.read.parquet(out1).collect()] == [1]
        # widen the schema mid-stream (append keeps row 1 via linking)
        engine.insert(spark.createDataFrame([(2, "x")],
                                            "id bigint, name string"),
                      "se.t", "u", "v2", mode="append", evolve_schema=True)
        # restarting the query (same checkpoint) re-resolves the source
        # schema from the CURRENT DDL, so the delta batch carries the new
        # column; the pre-evolution batch-1 files simply lack it
        run(out1, ck1)
        merged = spark.read.option("mergeSchema", "true").parquet(out1)
        assert sorted(r.id for r in merged.collect()) == [1, 1, 2]
        assert {(r.id, r.name) for r in merged.collect()} \
            >= {(2, "x"), (1, None)}
        # fresh stream: evolved schema, old row surfaces NULL
        out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")
        run(out2, ck2)
        rows = sorted((r.id, r.name)
                      for r in spark.read.parquet(out2).collect())
        assert rows == [(1, None), (2, "x")]


class TestSourceColumnMapping:
    """The tvx source must surface renamed columns under their LOGICAL
    names with real data — files keep physical names forever, and a
    reader that pruned by logical name alone would null-fill the column."""

    def test_batch_read_applies_mapping(self, spark, engine):
        from table_versions_spark.streaming.source import register

        ddl = "id bigint, v string"
        engine.create_table("db.cmfeed", schema_ddl=ddl)
        engine.insert(spark.createDataFrame([(1, "x")], ddl),
                      "db.cmfeed", "u", "c1")
        engine.rename_column("db.cmfeed", "v", "w")
        engine.insert(spark.createDataFrame([(2, "y")], "id bigint, w string"),
                      "db.cmfeed", "u", "c2", mode="append")
        register(spark)
        loc = engine.definition("db.cmfeed").location
        df = spark.read.format("tvx").option("location", loc).load()
        assert df.columns == ["id", "w"]
        assert sorted(tuple(r) for r in df.collect()) == [(1, "x"), (2, "y")]

    def test_stream_read_applies_mapping(self, spark, engine, tmp_path):
        from table_versions_spark.streaming.source import register

        ddl = "id bigint, v string"
        engine.create_table("db.cmstream", schema_ddl=ddl)
        engine.insert(spark.createDataFrame([(1, "x")], ddl),
                      "db.cmstream", "u", "c1")
        engine.rename_column("db.cmstream", "v", "w")
        register(spark)
        loc = engine.definition("db.cmstream").location
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (spark.readStream.format("tvx").option("location", loc).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(60)
        assert [(r.id, r.w) for r in spark.read.parquet(out).collect()] \
            == [(1, "x")]

    def test_batch_changefeed_option_rejected(self, spark, engine):
        from table_versions_spark.streaming.source import register

        engine.create_table("db.cfbatch", schema_ddl="id bigint")
        register(spark)
        loc = engine.definition("db.cfbatch").location
        with pytest.raises(Exception, match="changeFeed"):
            (spark.read.format("tvx").option("location", loc)
             .option("changeFeed", "true").load().collect())


class TestSinkConflictDetection:
    def test_sink_append_detects_concurrent_commit(self, spark, engine):
        """A commit landing between the sink's state read and its commit
        must fail the write, not silently drop the concurrent rows the
        stale append-link omits. (The writer's commit() runs in a Python
        worker subprocess, so the race is injected by driving the
        driver-side commit helper directly.)"""
        import table_versions_spark.engine as eng_mod
        from table_versions_spark.core.model import Version
        from table_versions_spark.streaming.sink import (
            _commit_versioned_write,
        )

        ddl = "id bigint, d string"
        engine.create_table("db.sinkcc", schema_ddl=ddl,
                            partition_columns=["d"])
        engine.insert(spark.createDataFrame([(1, "a")], ddl),
                      "db.sinkcc", "u", "base")
        loc = engine.definition("db.sinkcc").location

        orig = eng_mod._link_data_files
        done = {}

        def racing(prev_dir, new_dir, storage):
            if not done:
                done["x"] = True
                engine.insert(spark.createDataFrame([(5, "a")], ddl),
                              "db.sinkcc", "w2", "winner", mode="append")
            return orig(prev_dir, new_dir, storage)

        eng_mod._link_data_files = racing
        try:
            with pytest.raises(Exception, match="Concurrent"):
                _commit_versioned_write(
                    loc, Version.generate(), ["d=a"], append=True,
                    user_id="loser", message="stale append",
                    storage=engine.storage)
        finally:
            eng_mod._link_data_files = orig
        # the winner's row is intact, the loser never committed
        assert sorted(r.id for r in engine.read("db.sinkcc").collect()) \
            == [1, 5]


def test_dir_batches_raises_on_missing_dir(tmp_path):
    """A planned version dir that vanished before the task ran (vacuumed
    mid-query) must raise, not silently yield nothing — a silent empty
    commits the micro-batch MINUS those rows and a downstream replica
    diverges with no signal."""
    import pyarrow as pa
    import pytest as _pytest

    from table_versions_spark.core.storage import LocalStorage
    from table_versions_spark.streaming.source import _dir_batches

    schema = pa.schema([("id", pa.int64())])
    with _pytest.raises(ValueError, match="vacuumed"):
        list(_dir_batches(str(tmp_path / "gone"), None, schema, {},
                          "parquet", storage=LocalStorage()))
