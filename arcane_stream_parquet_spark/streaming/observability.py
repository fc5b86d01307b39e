"""Observability (SURVEY.md §2.9 ST11): the reference publishes
DataDog/statsd metrics per batch (main.scala:42,60-62,127-129, global
tags crd-parquet-stream.yaml:47-58); the Spark-native equivalent is a
``StreamingQueryListener`` over the engine's own progress events.

``MetricsListener`` turns each micro-batch progress report into a flat
``{metric_name: value}`` dict with the configured global tags and hands
it to a publisher callback — statsd/DataDog wiring is one callback away
(out of scope here, as in round-1 SURVEY; the metric extraction and the
hook ARE in scope and tested).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

MetricPublisher = Callable[[dict], None]


class MetricsListener(StreamingQueryListener):
    """Collects per-batch metrics (rows/sec, batch rows, durations) and
    forwards them to ``publish``; keeps the last N in memory for
    inspection/tests."""

    def __init__(
        self,
        publish: MetricPublisher | None = None,
        global_tags: dict[str, str] | None = None,
        keep_last: int = 100,
    ) -> None:
        self.publish = publish
        self.global_tags = dict(global_tags or {})
        self.keep_last = keep_last
        self.records: list[dict] = []

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        record = {
            **self.global_tags,
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
        }
        self.records.append(record)
        del self.records[: -self.keep_last]
        if self.publish is not None:
            self.publish(record)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
