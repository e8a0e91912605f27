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


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("synth_events").option("rows", N).load()``."""
    spark.dataSource.register(SynthEventsSource)
