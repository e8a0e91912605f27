"""Streaming observability: a StreamingQueryListener that lands every
micro-batch's progress as a JSONL row — batch id, input rows,
process-rate, durations — the raw feed for the lag/throughput
dashboards every production stream runs with (and the programmatic
surface behind `spark.streams`). Pairs with the in-data monitors
(s13 lateness, s16 drift): those watch the DATA, this watches the
PIPELINE.

Usage:
    listener = attach_progress_log(spark, "/path/progress.jsonl")
    ... run queries ...
    spark.streams.removeListener(listener)

The sink is append-only JSONL on the driver (progress events are
driver-side and tiny — one row per micro-batch, not per record), so
the log itself never becomes a scale problem; ship it to your metrics
store with any log forwarder.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API casing)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "timestamp": p.timestamp,
        }
        with open(self.out_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach_progress_log(spark, out_path: str) -> ProgressLogListener:
    """Attach (and return) a progress-to-JSONL listener; detach with
    ``spark.streams.removeListener(listener)``."""
    listener = ProgressLogListener(out_path)
    spark.streams.addListener(listener)
    return listener
