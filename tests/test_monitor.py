"""StreamingQueryListener observability (R27 print-debugging replaced
with structured per-batch metrics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
    run_to_memory,
    stream_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.streaming import (
    monitor,
)


def test_listener_captures_batch_metrics(spark, sf_dir):
    listener = monitor.attach(spark)
    try:
        agg = (
            stream_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        run_to_memory(agg, "complete")
        # listener events are delivered asynchronously; wait bounded
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not listener.progress:
            time.sleep(0.5)
        assert listener.started, "no start event"
        assert listener.progress, "no progress events"
        total_rows = sum(p["num_input_rows"] for p in listener.progress)
        assert total_rows > 0
        # the stateful agg reports state rows (one per event_type group)
        assert any(p["state_rows_total"] >= 5 for p in listener.progress)
    finally:
        spark.streams.removeListener(listener)
