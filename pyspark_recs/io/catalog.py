"""Session catalog registration: expose the testdata tables as temp
views so the WHOLE engine surface is reachable from plain ``spark.sql``
— the SQL-first entry point (the reference's users live in SQL; with
this, every query in the repo has a hand-written SQL counterpart the
user can adapt directly).

``register_tables(spark, sf_dir)`` registers each parquet table under
its bare name with timestamps normalized exactly like ``load_table``
(nanos → micros, NTZ → TIMESTAMP), so SQL results match the DataFrame
API bit for bit.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyspark_recs.io.loaders import TABLES, load_table


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    prefix: str = "",
) -> None:
    """Idempotent: re-registering replaces the existing temp views."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(
            f"{prefix}{name}"
        )
