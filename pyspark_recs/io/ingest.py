"""ELT ingest: CSV → JSON-envelope raw table (SURVEY §2.1 S1-S4,
§3.1).

The reference's driver-local, single-threaded CSV→JSON→gzip→PUT→COPY
chain (upload_to_snowflake.py:105-146) collapses into one distributed
job: ``read.csv`` → envelope projection → parquet write. Lineage
columns (etl_timestamp, etl_id, event_type) are constants per batch,
computed once on the driver exactly like the reference (:127-130).

Scale: no temp files, no driver bottleneck; the write parallelism is
the read parallelism. Batch-versioned appends (mode=append +
latest-batch filter downstream) reproduce the destructive-reload
semantics without losing history.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_recs.schemas import RAW_ENVELOPE


def csv_to_envelope(
    spark: SparkSession,
    path: str,
    table_name: str,
    etl_id: str | None = None,
    etl_timestamp: int | None = None,
) -> DataFrame:
    """Read a headered CSV (all values kept as strings, mirroring
    csv.DictReader) and wrap each row as a JSON envelope row."""
    df = spark.read.csv(path, header=True, quote='"', inferSchema=False)
    return envelope_rows(df, table_name, etl_id, etl_timestamp)


def envelope_rows(
    df: DataFrame,
    table_name: str,
    etl_id: str | None = None,
    etl_timestamp: int | None = None,
) -> DataFrame:
    """Wrap every row of ``df`` as a JSON string plus lineage columns
    (S2, upload_to_snowflake.py:127-144)."""
    batch_id = etl_id or str(uuid.uuid4())
    batch_ts = etl_timestamp if etl_timestamp is not None else int(
        time.time() * 1000
    )
    return df.select(
        F.lit(batch_ts).cast("long").alias("etl_timestamp"),
        F.lit(batch_id).alias("etl_id"),
        F.lit(table_name).alias("event_type"),
        F.to_json(F.struct(*df.columns)).alias("raw_data"),
    )


def write_raw(df: DataFrame, path: str, mode: str = "append") -> None:
    """Stage+COPY collapses into a single distributed write (S3/S4)."""
    df.write.mode(mode).parquet(path)


def read_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RAW_ENVELOPE).parquet(path)
