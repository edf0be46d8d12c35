"""Batch source connectors.

The reference reads/writes Parquet and ORC only (``FileFormat`` constants,
reference ``core/.../model.scala:104-109``). As a general-purpose engine we
expose the full set of Spark file sources behind one dispatch, plus:

- ``read_binary_files``: ``binaryFile`` source for multimodal ingestion
  (images/audio/video as opaque bytes + path/length metadata) — pairs with
  ``operators.multimodal``.
- ``register_testdata_views``: registers the driver's testdata tables as temp
  views (events gets its ns-timestamp converted and ``event_date`` attached).

All readers accept an explicit schema; at 100 TB, schema inference is a full
extra pass over the data and is never implicit here — omit ``schema`` only
for self-describing formats (parquet/orc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.common import ensure_compat, load_events

FORMATS = ("parquet", "orc", "csv", "json", "text", "binaryFile")

TESTDATA_TABLES = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings"]


def read(spark: SparkSession, path: str, format: str = "parquet",
         schema: str | None = None, **options) -> DataFrame:
    if format not in FORMATS:
        raise ValueError(f"Unsupported format {format!r}; one of {FORMATS}")
    if format in ("csv", "json", "text") and schema is None:
        raise ValueError(f"{format} requires an explicit schema "
                         "(inference is a full extra pass at scale)")
    ensure_compat(spark)
    reader = spark.read.format(format)
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Multimodal ingestion: one row per file with (path, modificationTime,
    length, content: binary)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    ensure_compat(spark)
    for t in TESTDATA_TABLES:
        if t == "events":
            load_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
