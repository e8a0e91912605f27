"""Custom Python DataSource (Spark 4 DataSource API) — io/pysource.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from pyspark_recs.io.pysource import (
    SynthEventsReader,
    register,
    _splitmix64,
)


def test_synth_source_parallel_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("synth_events")
        .option("rows", 5000)
        .option("partitions", 16)
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 16  # one task per InputPartition
    # the SAME dataset at any partition count (splitmix64 keyed on the
    # global row index, not the partition)
    df3 = (
        spark.read.format("synth_events")
        .option("rows", 5000)
        .option("partitions", 3)
        .load()
    )
    assert set(map(tuple, df.collect())) == set(map(tuple, df3.collect()))


def test_synth_source_filter_pushdown_generates_less(spark):
    from pyspark.sql.datasource import EqualTo

    reader = SynthEventsReader({"rows": "1000", "partitions": "2"})
    remaining = reader.pushFilters([EqualTo(("event_type",), "click")])
    assert list(remaining) == []  # fully consumed by the source
    assert reader.type_filter == "click"
    part = reader.partitions()[0]
    rows = list(reader.read(part))
    assert rows and all(r[2] == "click" for r in rows)

    register(spark)
    df = (
        spark.read.format("synth_events")
        .option("rows", 1000)
        .option("partitions", 2)
        .load()
    )
    pushed = df.filter(F.col("event_type") == "click").count()
    # parity with the engine-side count of the unfiltered generator
    want = sum(
        1 for i in range(1000) if _splitmix64(i) % 5 == 1  # 'click' idx
    )
    assert pushed == want


def test_synth_source_feeds_engine_operators(spark):
    # The connector output composes with ordinary engine plans.
    register(spark)
    df = (
        spark.read.format("synth_events")
        .option("rows", 2000)
        .option("users", 10)
        .load()
    )
    agg = (
        df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("users"))
        .collect()[0]
    )
    assert agg.total == 2000 and agg.users == 10
