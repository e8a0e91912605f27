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


def test_stream_reader_matches_batch_rows(spark, tmp_path):
    """The streaming half must emit exactly the deterministic rows the
    batch reader generates for the same ids — offset replay included."""
    register(spark)
    batch = (
        spark.read.format("synth_events")
        .option("rows", 250)
        .option("partitions", 4)
        .load()
        .collect()
    )
    stream = (
        spark.readStream.format("synth_events")
        .option("batch_rows", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 90
        while time.time() < deadline:
            n = spark.sql(
                "SELECT count(*) FROM synth_stream_out WHERE event_id < 250"
            ).collect()[0][0]
            if n >= 250:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM synth_stream_out WHERE event_id < 250"
        ).collect()
    }
    want = {tuple(r) for r in batch}
    assert want <= got and len(got) == len(want)  # exact rows, no dups
