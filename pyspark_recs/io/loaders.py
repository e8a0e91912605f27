"""Parquet loaders for the driver testdata tables.

Handles the one physical-format wart in the testdata: ``events.ts`` is
stored as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), a type Spark's
vectorized reader refuses. We read nanos as LongType
(``spark.sql.legacy.parquet.nanosAsLong``) and floor-divide to micros —
bit-identical to DuckDB's nanos→micros truncation, verified by the oracle
harness.

At 100 TB these loaders are still the right shape: schema discovery via
parquet footers is O(files) metadata work, and the nanos conversion is a
single projected expression inside whole-stage codegen (no shuffle, no
Python).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_recs.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Column names stored as parquet timestamp[ns] (footer metadata only)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        f.name for f in schema if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with timestamps normalized to micros."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_cols(path):
        # Integer floor-div nanos -> micros, matching DuckDB/Arrow
        # truncation. (`/` would go through double and lose precision on
        # epoch-nanos magnitudes > 2^53.)
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
