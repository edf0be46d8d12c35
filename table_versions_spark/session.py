"""SparkSession builder with the engine's recommended configuration.

Mirrors the useful flags from the reference's test harness
(``spark/src/test/scala/com/gu/tableversions/spark/SparkHiveSuite.scala:53-88``:
local master, tuned shuffle partitions, native ORC, committer algorithm v2)
updated for Spark 3/4 idiom: AQE on (runtime coalescing + skew-join handling),
Arrow enabled for Pandas UDF paths.

At cluster scale the same builder applies minus the ``local[...]`` master;
``shuffle_partitions`` should be sized to ~2-3× total cores with AQE left on
to coalesce small post-shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "table-versions-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the tvx batch reader prunes partition dirs via pushFilters —
        # gated by this flag (off by default in Spark 4.1)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS) which the Spark 4
        # parquet reader rejects by default; read as long (ns since epoch)
        # and convert explicitly (see functions.timestamps.ts_from_nanos)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Engine invariant: partition-column TYPE INFERENCE stays OFF.
        # Inference is lossy ('month=01' → int 1 → '1'), which corrupted
        # string partition values and made rewrite deletes duplicate
        # survivors into a phantom partition. The engine casts partition
        # columns to their DECLARED types after every load
        # (VersionedEngine._declared_types); with the invariant set here
        # the per-load conf toggle is a no-op, so concurrent engine calls
        # on one session can't interleave set/restore windows.
        .config("spark.sql.sources.partitionColumnTypeInference.enabled",
                "false")
        .config("spark.sql.orc.impl", "native")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
