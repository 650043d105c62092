"""Operational metrics for the streaming pipeline.

The reference logs per-message progress (consumer.py logging); the Spark
analogue is a StreamingQueryListener aggregating per-batch source rates
and row counts — queryable in-process and cheap enough to always attach.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class PipelineMetrics:
    batches: int = 0
    input_rows: int = 0
    last_batch_rows: int = 0
    queries_started: int = 0
    queries_stopped: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


class MetricsListener(StreamingQueryListener):
    """Collects batch counts / row totals across all streaming queries of
    the session. Attach with `spark.streams.addListener(listener)`."""

    def __init__(self) -> None:
        self.metrics = PipelineMetrics()

    def onQueryStarted(self, event) -> None:
        with self.metrics._lock:
            self.metrics.queries_started += 1

    def onQueryProgress(self, event) -> None:
        rows = int(event.progress.numInputRows)
        with self.metrics._lock:
            self.metrics.batches += 1
            self.metrics.input_rows += rows
            self.metrics.last_batch_rows = rows

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self.metrics._lock:
            self.metrics.queries_stopped += 1
