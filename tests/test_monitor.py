"""StreamingQueryListener observability (R27 print-debugging replaced
with structured per-batch metrics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
    run_stream,
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
        run_stream(agg, "complete")
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


def test_audited_metrics_ride_the_job(spark, sf_dir):
    """Observation metrics must equal an independent aggregation, and
    cost no extra pass (they piggyback on the one action)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    df, obs = monitor.audited(
        li,
        "audit",
        F.count(F.lit(1)).alias("rows_out"),
        # DISTINCT aggregates are rejected in observed metrics — the
        # sketch path is the (scale-correct) alternative
        F.approx_count_distinct("l_orderkey").alias("orders_approx"),
    )
    out = df.groupBy("l_returnflag").count().collect()
    expected_rows = li.count()
    expected_orders = li.select("l_orderkey").distinct().count()
    assert obs.get["rows_out"] == expected_rows
    assert abs(obs.get["orders_approx"] - expected_orders) <= 0.1 * expected_orders
    assert sum(r["count"] for r in out) == expected_rows
