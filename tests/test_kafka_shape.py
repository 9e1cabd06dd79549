"""Kafka wire-format decoding (no broker in env — SURVEY §5.2): the
projection applied to the reader output is exercised on a Kafka-shaped
static DataFrame, byte-identical to what spark-sql-kafka emits."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
    decode_clickstream,
    kafka_stream_reader,
)


def _kafka_shaped(spark):
    """(key, value binary, topic, partition, offset, timestamp, …) — the
    exact Kafka source schema."""
    rows = [
        (None, b"30", "gitlab_age", 0, 0, datetime(2024, 1, 1, 10, 0)),
        (None, b"Gdansk", "gitlab_city", 0, 1, datetime(2024, 1, 1, 10, 0)),
        (None, b"1", "gitlab_clicks", 0, 2, datetime(2024, 1, 1, 10, 0)),
        (None, b"1", "google_kubernetes_clicks", 0, 3, datetime(2024, 1, 1, 10, 1)),
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )


def test_decode_clickstream_parses_topic_and_value(spark):
    out = decode_clickstream(_kafka_shaped(spark)).collect()
    by_val = {r.value: r for r in out}
    assert by_val["30"].service == "gitlab"
    assert by_val["30"].dimension == "age"
    assert by_val["Gdansk"].dimension == "city"
    # service names containing '_' survive (reference would break here:
    # Raport.py:147 splits on the FIRST underscore)
    kube = [r for r in out if r.service == "google_kubernetes"]
    assert len(kube) == 1 and kube[0].dimension == "clicks"


def test_stream_reader_options(spark):
    reader = kafka_stream_reader(
        spark, "broker:9092", max_offsets_per_trigger=1000
    )
    # reader is assembled but never started (no broker) — the wiring is
    # the testable surface
    assert reader is not None
