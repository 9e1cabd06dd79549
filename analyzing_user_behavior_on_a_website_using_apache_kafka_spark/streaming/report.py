"""The reference's PDF report sink, Spark-side (SURVEY §2.1 R22–R24).

``Raport.py:101-213`` renders: a title page, an overall clicks-per-service
pie (label ``f'{service} ({count})'``, share %), then per service a
heading + three pies (age/city/gender value histograms). That is pure
presentation over a tiny aggregate, so the engine boundary is drawn the
same way here:

- :func:`report_model` — the *data* of the report, assembled from the
  clickstream aggregates via one driver-side ``collect()`` of the
  O(services × values) result. Deterministic, fully tested.
- :func:`render_pdf` — matplotlib/reportlab rendering, STUBBED behind an
  import-try (neither library exists in this container); the model→PDF
  mapping is documented 1:1 against Raport.py so the renderer is a
  mechanical fill-in.
- :func:`run_report_stream` — the 60 s processing-time trigger loop
  (``Raport.py:217-227``) as a Structured Streaming ``foreachBatch``:
  each epoch recomputes the aggregate *incrementally* (state store)
  instead of re-scanning the full log, and hands the model to a sink
  callback. Spark's epoch-transactional sink replaces the reference's
  psutil is-file-open guard (``Raport.py:91-98``).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clickstream import dimension_histograms, overall_clicks


def report_model(histograms: DataFrame) -> dict[str, Any]:
    """Assemble the reference report structure from (topic, value, cnt).

    Mirrors Raport.py ordering exactly: overall section first
    (``:144-162``), then services sorted (deterministic stand-in for
    dict order), each with its age/city/gender histograms
    (``:165-201``); ``home`` excluded, empty histograms skipped
    (``:169-183``).
    """
    overall = {
        r.service: r.total_clicks
        for r in overall_clicks(histograms).collect()
    }
    dims = dimension_histograms(histograms).collect()
    per_service: dict[str, dict[str, list[tuple[str, int, float]]]] = {}
    for r in sorted(dims, key=lambda r: (r.service, r.dimension, r.value)):
        per_service.setdefault(r.service, {}).setdefault(
            r.dimension, []
        ).append((r.value, r.cnt, r.share))
    return {
        "title": "Raport analizy zachowań użytkowników",
        "overall": [
            {
                "service": s,
                "clicks": c,
                "label": f"{s} ({c})",
                "share": c / total if (total := sum(overall.values())) else 0.0,
            }
            for s, c in sorted(overall.items())
        ],
        "services": [
            {"service": s, "histograms": hists}
            for s, hists in sorted(per_service.items())
        ],
    }


def render_pdf(model: dict[str, Any], path: str) -> str:
    """Render the report model to a pie-chart PDF (Raport.py:101-213).

    Layout parity: title → overall pie with count labels + % shares
    (``:151-162``) → per service: heading + one pie per dimension
    (``:168-201``). Requires matplotlib + reportlab, which this
    container does not ship — the model (all numbers, labels, shares,
    ordering) is fully computed by :func:`report_model`; only the
    drawing is stubbed.
    """
    try:
        import matplotlib  # noqa: F401
        import reportlab  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container lacks libs
        raise NotImplementedError(
            "PDF rendering requires matplotlib+reportlab (not in this "
            "container); report_model() provides the complete chart data"
        ) from exc
    raise NotImplementedError("renderer intentionally left to deployment")


def run_report_stream(
    messages: DataFrame,
    sink: Callable[[dict[str, Any], int], None],
    trigger_seconds: int = 60,
    available_now: bool = False,
):
    """The reference's report loop as an incremental streaming job.

    ``messages`` is a *streaming* (topic, value) DataFrame (see
    ``sources.file_stream.stream_table`` / ``sources.kafka``). Each
    trigger updates the per-(topic, value) histogram in the state store
    (complete output), re-assembles the report model, and calls
    ``sink(model, epoch_id)`` — where the reference writes raport.pdf
    every 60 s after re-reading the whole log (``Raport.py:217-227``),
    this touches only the new data per cycle.
    """
    agg = messages.groupBy("topic", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    def for_each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sink(report_model(batch_df), epoch_id)

    writer = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(for_each_batch)
        .option(
            "checkpointLocation",
            os.path.join(
                tempfile.gettempdir(), "aub_report_ckpt", uuid.uuid4().hex[:12]
            ),
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
