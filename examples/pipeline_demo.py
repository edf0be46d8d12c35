"""End-to-end demo: the library as one coherent pipeline.

Mirrors the role of the reference's ``examples`` module
(``examples/src/main/scala/com/gu/tableversions/examples/TableLoader.scala``
and its three loader specs) — executable documentation of the product
surface — extended with the training-data-pipeline stages this engine adds.

Run: ``python examples/pipeline_demo.py [sf_dir] [warehouse]``
(defaults: /root/testdata/sf0.001, a temp dir).

Stages:
 1. versioned ingest of events, partitioned by event date
 2. late-data reprocess of one partition (Hive-overwrite semantics)
 3. time travel + rollback across the reprocess
 4. document dedup (exact) + quality scoring + train/test split
 5. near-dup candidates via MinHash-LSH
 6. vector similarity top-k over embeddings
 7. incremental consumption via read_changes
 8. maintenance: compact + vacuum
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str, warehouse: str) -> None:
    import table_versions_spark as tvx
    from table_versions_spark.operators import dedup, similarity, text
    from table_versions_spark.operators.common import load_events

    spark = tvx.get_spark(app_name="pipeline-demo")
    eng = tvx.VersionedEngine(spark, warehouse)

    # 1. versioned ingest --------------------------------------------------
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "event_date")
    eng.create_table(
        "demo.events",
        schema_ddl=("event_id bigint, user_id bigint, event_type string, "
                    "value double, event_date date"),
        partition_columns=["event_date"])
    r1 = eng.insert(ev, "demo.events", "demo", "initial load")
    print(f"[1] loaded {eng.read('demo.events').count()} events "
          f"as commit {r1.commit_id[:8]}…")

    # 2. late-data reprocess of the earliest day ---------------------------
    day0 = ev.agg(F.min("event_date")).first()[0]
    fixed = (ev.where(F.col("event_date") == F.lit(day0))
             .withColumn("value", F.col("value") * 1.1))
    r2 = eng.insert(fixed, "demo.events", "demo", f"reprocess {day0}")
    print(f"[2] reprocessed partition {day0} as commit {r2.commit_id[:8]}…")

    # 3. time travel + rollback -------------------------------------------
    before = eng.read("demo.events", at_commit=r1.commit_id) \
        .where(F.col("event_date") == F.lit(day0)) \
        .agg(F.round(F.sum("value"), 2)).first()[0]
    after = eng.read("demo.events") \
        .where(F.col("event_date") == F.lit(day0)) \
        .agg(F.round(F.sum("value"), 2)).first()[0]
    print(f"[3] {day0} sum(value): {before} before vs {after} after; "
          "rolling back…")
    eng.checkout("demo.events", r1.commit_id)
    assert eng.read("demo.events").where(
        F.col("event_date") == F.lit(day0)).agg(
        F.round(F.sum("value"), 2)).first()[0] == before
    eng.checkout("demo.events", r2.commit_id)  # forward again

    # 4. document pipeline -------------------------------------------------
    uniques = text.q_dedup_exact(spark, sf_dir).count()
    split = {r["split"]: r["n_docs"]
             for r in text.q_train_test_split(spark, sf_dir).collect()}
    print(f"[4] documents: {uniques} unique contents; split {split}")

    # 5. near-dup candidates ----------------------------------------------
    pairs = dedup.q_dedup_minhash(spark, sf_dir).count()
    print(f"[5] MinHash-LSH near-dup pairs (J≥0.5): {pairs}")

    # 6. similarity search -------------------------------------------------
    top = similarity.q_sim_search(spark, sf_dir).limit(3).collect()
    print("[6] top-3 cosine neighbours of vec 0: "
          + ", ".join(f"{r['vec_id']}({r['cos_sim']})" for r in top))

    # 7. incremental consumption ------------------------------------------
    delta = eng.read_changes("demo.events", since_commit=r1.commit_id)
    print(f"[7] change feed since commit 1: {delta.count()} rows "
          f"(only the reprocessed partition)")

    # 8. maintenance -------------------------------------------------------
    eng.compact("demo.events")
    # grace_hours=0: this demo just created every dir, and no other writer
    # can be in flight here (production callers keep the default grace)
    removed = eng.vacuum("demo.events", keep_commits=2, grace_hours=0)
    print(f"[8] compacted; vacuum removed {len(removed)} old version dir(s)")

    # 9. write-time quality gating (CHECK constraints) ---------------------
    eng.create_table("demo.gated", schema_ddl="id bigint, v double",
                     check_constraints=["v >= 0"])
    eng.insert(spark.range(5).select(F.col("id"),
                                     (F.col("id") * 1.0).alias("v")),
               "demo.gated", "demo", "clean rows")
    try:
        eng.insert(spark.createDataFrame([(9, -1.0)], "id bigint, v double"),
                   "demo.gated", "demo", "bad row")
        raise AssertionError("constraint should have rejected the commit")
    except tvx.ConstraintViolationError:
        print("[9] CHECK constraint rejected the bad commit; "
              f"table still has {eng.read('demo.gated').count()} rows")

    # 10. z-order clustering + multi-column file skipping ------------------
    eng.create_table("demo.zo", schema_ddl=(
        "event_id bigint, user_id bigint, value double"))
    eng.insert(load_events(spark, sf_dir)
               .select("event_id", "user_id", "value"),
               "demo.zo", "demo", "z-ordered load",
               cluster_by=["value", "user_id"], cluster_mode="zorder")
    skipped = eng.read("demo.zo", stats_filter={"value": (10.0, 20.0),
                                                "user_id": (1, 8)})
    total = len(eng.read("demo.zo").inputFiles())
    print(f"[10] z-order skipping read {len(skipped.inputFiles())}/{total} "
          "files for a two-column range probe")

    # 10b. row-level UPDATE + metadata-only rename -------------------------
    eng.update("demo.zo", set={"value": "value * 0"},
               predicate="value < 0", user_id="demo", message="clamp")
    eng.rename_column("demo.zo", "value", "amount")
    assert "amount" in eng.read("demo.zo").columns
    print("[10b] UPDATE + zero-rewrite column rename applied "
          f"({eng.history('demo.zo').count()} commits in history)")

    # 11. end-to-end corpus curation --------------------------------------
    from table_versions_spark.operators import cleaning

    kept = cleaning.q_curation_pipeline(spark, sf_dir).count()
    print(f"[11] curation pipeline kept {kept} documents "
          "(exact-dedup ∘ near-dup ∘ quality ∘ embedding gates)")

    # 12. deletion-vector delete (zero-rewrite purge) ----------------------
    files_before = {f for f in eng.read("demo.events").inputFiles()
                    if "/_dv/" not in f}
    eng.delete("demo.events", "event_type = 'error'", "demo",
               "purge errors", mode="dv")
    files_after = {os.path.basename(f)
                   for f in eng.read("demo.events").inputFiles()
                   if "/_dv/" not in f}
    assert files_after == {os.path.basename(f) for f in files_before}
    print(f"[12] dv-delete purged 'error' events without rewriting a "
          f"single data file; {eng.read('demo.events').count()} rows live")

    # 13. tvx data source both ways: versioned replication -----------------
    from table_versions_spark.streaming.source import register

    register(spark)
    eng.create_table(
        "demo.events_replica",
        schema_ddl=("event_id bigint, user_id bigint, event_type string, "
                    "value double, event_date date"),
        partition_columns=["event_date"])
    q = (spark.readStream.format("tvx")
         .option("location", eng.definition("demo.events").location).load()
         .writeStream.format("tvx")
         .option("location", eng.definition("demo.events_replica").location)
         .option("checkpointLocation", os.path.join(warehouse, "_repl_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    src_n = eng.read("demo.events").count()
    dst_n = eng.read("demo.events_replica").count()
    assert src_n == dst_n, (src_n, dst_n)
    print(f"[13] streamed the commit log into a replica table "
          f"(readStream→writeStream format('tvx')): {dst_n} rows, "
          "exactly-once per epoch")
    # 14. row-exact change data feed across rewrites -----------------------
    eng.create_table("demo.cdf", schema_ddl="id bigint, score double",
                     change_data_feed=True)
    base = eng.insert(spark.range(100).select(
        F.col("id"), (F.col("id") * 1.0).alias("score")),
        "demo.cdf", "demo", "load")
    eng.update("demo.cdf", set={"score": "score * 2"},
               predicate="id % 10 = 0", user_id="demo", message="boost")
    feed = eng.read_changes("demo.cdf", since_commit=base.commit_id,
                            row_level=True)
    n_del = feed.where("_change_type = 'delete'").count()
    n_ins = feed.where("_change_type = 'insert'").count()
    assert (n_del, n_ins) == (10, 10), (n_del, n_ins)
    print(f"[14] change_data_feed table: rewrite UPDATE emitted exactly "
          f"{n_del}+{n_ins} changed rows via the _cdc sidecar "
          "(not the 100-row coarse rewrite)")

    # 15. bucketed layout: sink writes + dv update + bucket-pruned read ----
    eng.create_table("demo.users_bk", schema_ddl="id bigint, name string",
                     bucket_columns=["id"], bucket_count=8)
    loc_bk = eng.definition("demo.users_bk").location
    (spark.range(1000).select("id", F.concat(F.lit("u"), "id").alias("name"))
     .write.format("tvx").mode("overwrite").option("location", loc_bk).save())
    eng.update("demo.users_bk", set={"name": "'renamed'"},
               predicate="id = 777", user_id="demo", message="fix one row",
               mode="dv")
    hit = eng.read("demo.users_bk", bucket_filter={"id": 777}) \
        .where("id = 777").collect()
    assert [(r.id, r.name) for r in hit] == [(777, "renamed")]
    print("[15] bucketed table written through df.write.format('tvx'), "
          "dv-updated in place, point read pruned to 1/8 of the files")

    # 15b. plain-DataFrame point lookup with partition+bucket pruning ------
    got = (spark.read.format("tvx").option("location", loc_bk).load()
           .where("id = 777").collect())
    assert [(r.id, r.name) for r in got] == [(777, "renamed")]
    print("[15b] spark.read.format('tvx').where(id = 777): pushFilters "
          "pruned the scan to one bucket's files before planning a task")

    # 16. IVF-PQ ANN over the embeddings ------------------------------------
    from table_versions_spark.operators.similarity import q_sim_ann_pq

    top = q_sim_ann_pq(spark, sf_dir).collect()
    print(f"[16] IVF-PQ ANN (residual-coded compact index, probe-2 cells, "
          f"ADC scan + exact re-rank) top-3 of vec 0: "
          + ", ".join(f"{r.vec_id}({r.cos_sim})" for r in top[:3]))

    # 17. exact duplicated-span pairs + Gopher quality gate ------------------
    spans = dedup.q_dedup_substring(spark, sf_dir).count()
    gate = {bool(r["pass_gopher"]): r["n"] for r in
            cleaning.q_gopher_rules(spark, sf_dir)
            .groupBy("pass_gopher").agg(F.count("*").alias("n")).collect()}
    print(f"[17] content-defined-chunking found {spans} duplicated-span "
          f"pair(s) at any alignment; Gopher gate keeps "
          f"{gate.get(True, 0)}/{gate.get(True, 0) + gate.get(False, 0)} docs")

    # 18. round-8 curation stages: fuzzy dedup, doc-in-doc containment, ----
    # entropy signals, nucleus selection
    from table_versions_spark.operators import text as textops

    fuzzy = dedup.q_dedup_fuzzy(spark, sf_dir).count()
    contain = dedup.q_dedup_containment(spark, sf_dir).count()
    ent = (cleaning.q_entropy(spark, sf_dir)
           .agg(F.round(F.avg("entropy"), 2).alias("h"),
                F.round(F.avg("ttr"), 2).alias("ttr")).first())
    kept = textops.q_top_p_quality(spark, sf_dir).count()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"[18] fuzzy(edit-distance) dup pairs: {fuzzy}; doc-in-doc "
          f"containment pairs: {contain}; mean entropy {ent['h']} bits/word "
          f"(TTR {ent['ttr']}); top-p quality nucleus keeps {kept}/{total}")

    # 19. round-9 additions: interval join, MaxSim retrieval, rank-fusion --
    # quality, snapshot reconciliation
    from table_versions_spark.operators import analytic, versioned
    from table_versions_spark.operators.similarity import q_maxsim

    overlaps = analytic.q_interval_join(spark, sf_dir).count()
    best = (q_maxsim(spark, sf_dir)
            .orderBy(F.desc("maxsim")).first())
    kept_ens = cleaning.q_quality_ensemble(spark, sf_dir).count()
    diff = {r["status"]: r["n"] for r in
            versioned.q_table_diff(spark, sf_dir)
            .groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(f"[19] interval join: {overlaps} error-windows overlap a "
          f"purchase window; MaxSim retrieval top doc: label {best.label} "
          f"(score {best.maxsim}); Borda quality fusion keeps {kept_ens} "
          f"docs; snapshot diff vs pre-mutation commit: {diff}")

    print("demo complete.")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="tvx-demo-")
    main(sf, wh)
