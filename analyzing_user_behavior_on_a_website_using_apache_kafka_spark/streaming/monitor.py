"""Streaming observability — the engine-grade replacement for the
reference's print-debugging (``Raport.py:44,66,84``, ``serwer.js:78-82``,
SURVEY §2.1 R27).

A ``StreamingQueryListener`` captures per-micro-batch metrics (rows in,
processing rate, batch duration, state rows) into a bounded in-memory
log; production would forward the same events to a metrics sink. Unlike
prints, listener events carry the numbers capacity planning needs:
state-store growth tells you whether watermarks actually bound state
(SCALE.md §Streaming).
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects QueryProgressEvent metrics, newest-last, bounded."""

    def __init__(self, max_events: int = 1000) -> None:
        self.progress: deque[dict[str, Any]] = deque(maxlen=max_events)
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state = p.stateOperators
        self.progress.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": p.batchDuration,
                "state_rows_total": sum(
                    s.numRowsTotal for s in state
                ) if state else 0,
                "state_rows_updated": sum(
                    s.numRowsUpdated for s in state
                ) if state else 0,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass


def attach(spark: SparkSession, max_events: int = 1000) -> MetricsListener:
    """Register a fresh metrics listener on the session; caller detaches
    with ``spark.streams.removeListener(listener)``."""
    listener = MetricsListener(max_events)
    spark.streams.addListener(listener)
    return listener


def audited(df, name: str, *metrics):
    """Attach free data-quality counters to a batch plan via the
    ``Observation`` API: the metrics (any aggregate expressions) are
    computed DURING the job's normal pass — no second scan, which at
    100 TB is the difference between auditing and not auditing.

    Returns ``(df, observation)``; read ``observation.get`` after the
    first action on ``df``. Typical use::

        df, obs = audited(curated, "curation",
                          F.count(F.lit(1)).alias("rows_out"),
                          F.sum(F.col("n_tokens")).alias("tokens_out"))
        df.write.parquet(out)
        assert obs.get["rows_out"] > 0

    Replaces the reference's count-by-print auditing (``Raport.py:84``)
    with metrics that ride the job itself.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
