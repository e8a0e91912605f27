"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic event generator, registered as ``spark.read.format("synth_events")``.

The engine-extension point the JVM-connector story never had in Python:
``pyspark.sql.datasource.DataSource`` lets a connector declare schema,
PARTITIONS (so the scan parallelizes like any file source), and filter
pushdown — all from Python, running inside the executors. This module
demonstrates the full contract on a generator shaped like the driver's
``events`` table, useful for load tests at arbitrary row counts without
materializing parquet first.

Determinism: row values derive from (partition, offset) via splitmix64
(public-domain mixing constants), so the SAME dataset comes out at any
partition count × any executor placement — the Categorify/l24
reproducibility discipline applied to a source.

Scale: one ``InputPartition`` per requested slice; each executor
generates only its slice (no driver materialization, no single reader).
Filter pushdown (``pushFilters``) handles `event_type = 'x'` equality:
non-matching rows are never GENERATED, the source-side analog of
parquet row-group pruning.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


class _SynthPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_users = int(options.get("users", 100))
        self.type_filter: str | None = None

    def pushFilters(self, filters):
        kept = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and isinstance(f.value, str)
            ):
                self.type_filter = f.value
            else:
                kept.append(f)  # unsupported → Spark re-applies
        return kept

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _SynthPartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _SynthPartition):
        for i in range(partition.start, partition.end):
            h = _splitmix64(i)
            etype = _EVENT_TYPES[h % len(_EVENT_TYPES)]
            if self.type_filter is not None and etype != self.type_filter:
                continue
            yield (
                i,
                (h >> 3) % self.n_users,
                etype,
                float((h >> 17) % 10_000) / 100.0,
            )


class SynthEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return (
            "event_id long, user_id long, event_type string, value double"
        )

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(self.options)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (the Spark 4
    SimpleDataSourceStreamReader contract): the same deterministic
    generator exposed as an unbounded source — each micro-batch emits
    the next ``batch_rows`` event ids, offsets are plain row positions,
    and ``readBetweenOffsets`` REGENERATES any offset range exactly
    (splitmix64 is a pure function of the row id), which is what makes
    checkpoint replay exactly-once without a write-ahead row log.
    ``spark.readStream.format("synth_events")`` — the full
    batch + streaming + pushdown + partition connector surface, from
    Python."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.n_users = int(options.get("users", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        for i in range(start, end):
            h = _splitmix64(i)
            yield (
                i,
                (h >> 3) % self.n_users,
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                float((h >> 17) % 10_000) / 100.0,
            )

    def read(self, start: dict):
        pos = int(start["pos"])
        end = pos + self.batch_rows
        # Materialized list, not a generator: the runner's prefetch
        # cache copy.copy()s the returned iterator, and generators
        # don't pickle. Batches are bounded by batch_rows, so this is
        # O(batch) memory by construction.
        return list(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(int(start["pos"]), int(end["pos"])))


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("synth_events").option("rows", N).load()``."""
    spark.dataSource.register(SynthEventsSource)
