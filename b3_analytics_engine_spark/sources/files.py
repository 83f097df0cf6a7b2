"""File-based sources: Parquet / CSV / JSON (S1, S6 analogs; K1/K2
read side).

The historical COTAHIST CSV reader mirrors
reference include/tasks/batch_ingestion.py:26 (`pd.read_csv(...,
encoding="latin-1")`) with an explicit schema — at 100 TB schema
inference is an extra full pass and a correctness hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import COTAHIST


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_cotahist_csv(spark: SparkSession, path: str) -> DataFrame:
    """COTAHIST historical CSV scan (S1): latin-1, header row, explicit
    schema with strings for the cast-with-coerce columns (the cast is
    a separate, testable operator — rowops.numeric_cast_coerce)."""
    return (
        spark.read.option("header", True)
        # pandas calls it latin-1; Spark's CSVOptions takes the
        # canonical charset name iso-8859-1 (same encoding)
        .option("encoding", "iso-8859-1")
        .schema(COTAHIST)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Line-delimited JSON scan (raw/processing zone objects, K2 read
    side). PERMISSIVE mode: malformed rows → nulls, matching the
    reference's tolerance of schemaless payloads."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def table_exists(spark: SparkSession, name: str) -> bool:
    """Catalog existence probe (S9, reference
    analytics_service/dashboard.py:29-34 information_schema query)."""
    return spark.catalog.tableExists(name)


def write_bucketed_table(
    df, name: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist a table bucketed (and optionally sorted) on a join key.

    The 100 TB co-location tool: two tables bucketed identically on
    their join key join WITHOUT a shuffle — the Exchange disappears
    from the plan (asserted in tests/test_bucketing.py). This is how
    the lineitem⋈orders-shaped fact⋈fact join avoids moving 100 TB.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream — the broker-free stand-in used by tests for
    Kafka topics; schema is mandatory for streaming reads.

    Pass ``max_files_per_trigger=1`` to force one file per micro-batch;
    without it an availableNow trigger folds every pending file into a
    single batch, so cross-batch properties are not exercised.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_media_dir(
    spark: SparkSession, path: str, glob: str = "*"
) -> DataFrame:
    """Ingest raw media files as opaque binary rows via Spark's
    built-in ``binaryFile`` source (path, modificationTime, length,
    content — content loaded lazily per task, so a 100 TB media lake
    scans in parallel with no driver involvement).

    Output matches the engine's media-row shape (operators/multimodal):
    ``media_id`` is the stable xxhash64 of the file path, ``media_type``
    derives from the extension, ``payload`` is the raw bytes. Pair with
    ``extract_features`` / ``frame_sample_plan`` downstream.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
        .alias("media_type"),
        F.col("content").alias("payload"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes_raw"),
    )
