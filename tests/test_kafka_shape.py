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


def _kafka_full_schema(spark):
    """The COMPLETE spark-sql-kafka source row (includeHeaders=true):
    key, value, topic, partition, offset, timestamp, timestampType,
    headers — byte-identical to what a real broker read emits
    (VERDICT r3 item 7: pin the decode path beyond construction)."""
    rows = [
        (
            b"user-7",
            b"42",
            "gitlab_age",
            3,
            1001,
            datetime(2024, 1, 1, 10, 0, 30),
            0,  # CreateTime
            [("trace-id", b"abc123"), ("src", b"serwer.js")],
        ),
        (
            None,  # tombstone-style null key
            b"Warszawa",
            "google_kubernetes_city",
            0,
            5,
            datetime(2024, 1, 1, 10, 1, 0),
            1,  # LogAppendTime
            None,  # headers absent for this record
        ),
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int, "
        "headers array<struct<key: string, value: binary>>",
    )


def test_decode_full_kafka_schema_with_headers_and_timestamp(spark):
    """decode_clickstream over the full 8-column Kafka schema: values
    decode, multi-underscore services split correctly, and the record
    timestamp survives as event-time ts with the exact instant."""
    full = _kafka_full_schema(spark)
    out = decode_clickstream(full)
    assert [f.name for f in out.schema.fields] == [
        "service",
        "dimension",
        "value",
        "ts",
    ]
    rows = {r.value: r for r in out.collect()}
    assert rows["42"].service == "gitlab" and rows["42"].dimension == "age"
    assert rows["Warszawa"].service == "google_kubernetes"
    assert rows["Warszawa"].dimension == "city"
    # timestamps carry through untouched (event-time source for windows)
    assert rows["42"].ts == datetime(2024, 1, 1, 10, 0, 30)
    assert rows["Warszawa"].ts == datetime(2024, 1, 1, 10, 1, 0)


def test_decoded_stream_is_window_ready(spark):
    """End-to-end through the streaming machinery: a Kafka-shaped
    in-memory STREAM (same schema, headers included) must flow through
    decode_clickstream into withWatermark + a tumbling window — the
    exact downstream the report pipeline uses — proving the decoded ts
    is a watermarkable TIMESTAMP, not just present."""
    import os
    import tempfile
    import uuid

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
        run_stream,
    )

    full = _kafka_full_schema(spark)
    src_dir = os.path.join(
        tempfile.gettempdir(), f"kafka_shape_{uuid.uuid4().hex[:8]}"
    )
    full.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(full.schema).parquet(src_dir)
    windowed = (
        decode_clickstream(stream)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "1 minute"), "service")
        .count()
    )
    # complete mode: append would hold both windows open (the 5-minute
    # watermark never passes them on a 2-row fixture)
    got = {
        (r.service, r["count"])
        for r in run_stream(windowed, output_mode="complete").collect()
    }
    assert got == {("gitlab", 1), ("google_kubernetes", 1)}


# --- R7-R9 edge semantics (VERDICT r10 task 6 / r11 task 5) ---------------


def _offset_log(spark):
    """Two topics x two partitions x offsets 0..4 — the minimal log on
    which every offset-window corner (inclusive start, exclusive end,
    -2/-1 sentinels, unsubscribed topic) is distinguishable."""
    rows = [
        (None, str(o).encode(), t, p, o, datetime(2024, 1, 1, 10, 0, o))
        for t in ("gitlab_age", "google_kubernetes_clicks")
        for p in (0, 1)
        for o in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )


def test_offset_window_replay_bounds_inclusive_exclusive(spark):
    """Per-partition offset JSON semantics on a Kafka-shaped static log:
    start INCLUSIVE, end EXCLUSIVE, -2 = earliest, -1 = latest, and a
    topic absent from the dict is simply not subscribed."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        replay_offset_window,
    )

    log = _offset_log(spark)
    got = replay_offset_window(
        log,
        starting_offsets={"gitlab_age": {0: 1, 1: -2}},
        ending_offsets={"gitlab_age": {0: 3, 1: -1}},
    )
    rows = {(r.partition, r.offset) for r in got.collect()}
    assert rows == (
        {(0, 1), (0, 2)}  # [1, 3): start inclusive, end exclusive
        | {(1, o) for o in range(5)}  # -2..-1 = whole partition
    )
    assert {r.topic for r in got.collect()} == {"gitlab_age"}


def test_offset_window_keywords_are_the_whole_log(spark):
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        replay_offset_window,
    )

    log = _offset_log(spark)
    assert replay_offset_window(log, "earliest", "latest").count() == 20


def test_offset_window_missing_partition_fails_like_the_source(spark):
    """The real Kafka source fails a batch read whose offset JSON omits
    a partition of a subscribed topic — the replay helper enforces the
    same contract instead of silently dropping the partition."""
    import pytest

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        replay_offset_window,
    )

    with pytest.raises(ValueError, match="missing partition"):
        replay_offset_window(
            _offset_log(spark),
            starting_offsets={"gitlab_age": {0: 1}},  # partition 1 omitted
            ending_offsets={"gitlab_age": {0: 3}},
        )


def test_offset_window_rejects_mismatched_topic_sets(spark):
    import pytest

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        replay_offset_window,
    )

    with pytest.raises(ValueError, match="same"):
        replay_offset_window(
            _offset_log(spark),
            starting_offsets={"gitlab_age": {0: 0, 1: 0}},
            ending_offsets={"google_kubernetes_clicks": {0: 3, 1: 3}},
        )


def test_batch_reader_rejects_ill_defined_keyword_windows(spark):
    """Batch reads reject starting at 'latest' / ending at 'earliest' —
    the two corners the real source refuses (an empty or backwards
    window); the builder fails at construction, locally."""
    import pytest

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        kafka_batch_reader,
    )

    with pytest.raises(ValueError, match="latest"):
        kafka_batch_reader(spark, "b:9092", starting_offsets="latest")
    with pytest.raises(ValueError, match="earliest"):
        kafka_batch_reader(spark, "b:9092", ending_offsets="earliest")


def test_subscription_modes_are_mutually_exclusive(spark):
    """The Kafka source takes EXACTLY one of subscribe /
    subscribePattern; both-set fails at build time, and each single
    mode (plus the subscribe-everything default, Raport.py:43)
    assembles. A topic LIST joins to the comma form the option takes."""
    import pytest

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        _subscription,
        kafka_batch_reader,
        kafka_stream_reader,
    )

    for builder in (kafka_batch_reader, kafka_stream_reader):
        with pytest.raises(ValueError, match="exactly one"):
            builder(
                spark, "b:9092",
                subscribe_pattern="git.*",
                subscribe=["gitlab_age"],
            )
        assert builder(spark, "b:9092", subscribe="gitlab_age") is not None
        assert builder(spark, "b:9092", subscribe_pattern="git.*") is not None
        assert builder(spark, "b:9092") is not None
    assert _subscription(None, ["a_b", "c_d"]) == ("subscribe", "a_b,c_d")
    assert _subscription(None, None) == ("subscribePattern", ".*")


def test_offsets_option_serializes_partition_dict(spark):
    """Dict offsets serialize to the exact JSON shape the source parses:
    partition keys are STRINGS, offsets integers."""
    import json

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.kafka import (
        _offsets_option,
    )

    s = _offsets_option(
        {"gitlab_age": {0: 23, 1: -2}}, what="starting_offsets"
    )
    assert json.loads(s) == {"gitlab_age": {"0": 23, "1": -2}}
    assert _offsets_option("earliest", what="starting_offsets") == "earliest"


def test_decode_preserves_null_key_value_and_headers(spark):
    """Tombstone-style records (null key, NULL VALUE, absent headers)
    flow through decode_clickstream without being dropped or crashing:
    the null payload decodes to a NULL string and the topic split +
    timestamp still populate — the consumer decides tombstone policy,
    not the decoder."""
    rows = [
        (
            None,
            None,  # tombstone: no payload
            "gitlab_clicks",
            0,
            9,
            datetime(2024, 1, 1, 12, 0),
            0,
            None,
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int, "
        "headers array<struct<key: string, value: binary>>",
    )
    out = decode_clickstream(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.value is None
    assert r.service == "gitlab" and r.dimension == "clicks"
    assert r.ts == datetime(2024, 1, 1, 12, 0)
