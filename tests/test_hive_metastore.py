"""Persistent-metastore parity test for sync_catalog.

The reference tests that its Hive-metastore sync survives a fresh session
(``spark/src/test/scala/com/gu/tableversions/spark/SparkHiveSuite.scala:53-88``
— partitions and locations read back from the metastore, not session state).
Mirror that here with a Derby-backed Hive metastore: phase "write" creates a
versioned table, commits twice, and syncs the Spark catalog; phase "read"
starts a brand-new JVM + SparkSession against the same metastore_db and
asserts vanilla ``spark.table()`` still resolves the current versioned
locations.

Each phase runs in its own subprocess because embedded Derby wants one JVM
at a time, and because "survives a restart" is only honest evidence when
nothing of the first session can leak into the second.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_PHASE_SCRIPT = textwrap.dedent("""
    import json, os, sys
    phase, base = sys.argv[1], sys.argv[2]
    sys.path.insert(0, "@@REPO@@")
    from pyspark.sql import SparkSession

    derby = os.path.join(base, "metastore")
    spark = (SparkSession.builder.master("local[4]")
             .appName("tvx-hive-" + phase)
             .config("spark.sql.catalogImplementation", "hive")
             .config("spark.sql.warehouse.dir", os.path.join(base, "spark-wh"))
             .config("javax.jdo.option.ConnectionURL",
                     "jdbc:derby:;databaseName=" + derby + ";create=true")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    if phase == "write":
        from table_versions_spark.engine import VersionedEngine
        eng = VersionedEngine(spark, os.path.join(base, "tvx-wh"))
        ddl = "id bigint, v string, d string"
        eng.create_table("hdb.t", schema_ddl=ddl, partition_columns=["d"])
        eng.insert(spark.createDataFrame(
            [(1, "x", "a"), (2, "y", "b")], ddl), "hdb.t", "u", "c1")
        # second commit overwrites d=b -> catalog must repoint that partition
        eng.insert(spark.createDataFrame([(3, "z", "b")], ddl),
                   "hdb.t", "u", "c2")
        n_ops = eng.sync_catalog("hdb.t")
        assert n_ops >= 2, n_ops
        got = sorted(tuple(r) for r in spark.table("hdb.t").collect())
        assert got == [(1, "x", "a"), (3, "z", "b")], got
    else:
        # brand-new JVM: catalog contents must come from Derby, not session
        got = sorted(tuple(r) for r in spark.table("hdb.t").collect())
        assert got == [(1, "x", "a"), (3, "z", "b")], got
        locs = {}
        for prow in spark.sql("SHOW PARTITIONS hdb.t").collect():
            col, val = prow[0].split("=", 1)
            loc = (spark.sql(
                "DESCRIBE FORMATTED hdb.t PARTITION (" + col + "='" + val + "')")
                .where("col_name = 'Location'").select("data_type").first()[0])
            locs[prow[0]] = loc
        from table_versions_spark.core.model import Version
        for p, loc in locs.items():
            label = loc.rstrip("/").rsplit("/", 1)[-1]
            assert Version.is_version_label(label), (p, loc)
    spark.stop()
    print("PHASE-" + phase + "-OK")
""")


@pytest.mark.slow
def test_catalog_sync_survives_new_session(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = str(tmp_path / "phase.py")
    with open(script, "w") as f:
        f.write(_PHASE_SCRIPT.replace("@@REPO@@", repo))
    env = dict(os.environ)
    for phase in ("write", "read"):
        proc = subprocess.run(
            [sys.executable, script, phase, str(tmp_path)],
            capture_output=True, text=True, timeout=420, env=env,
            cwd=str(tmp_path))
        assert f"PHASE-{phase}-OK" in proc.stdout, (
            f"{phase} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
