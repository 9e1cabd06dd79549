"""Kafka source/sink wiring — the reference's ingest fabric, Spark-side.

The reference consumes ALL topics from offset 0 every cycle
(``Raport.py:41-43``: ``auto_offset_reset='earliest'``,
``enable_auto_commit=False``; SURVEY §2.1 R7–R9). The Spark equivalents:

- batch replay (literal reference semantics): ``spark.read.format("kafka")``
  with ``startingOffsets=earliest`` — full-log recompute per run;
- incremental (same results, O(new data) per trigger):
  ``spark.readStream.format("kafka")`` + checkpointing.

No broker exists in the test environment, so these builders only
assemble the reader; tests cover option construction and the
value-decoding projection applied to a Kafka-shaped static DataFrame.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PATTERN = ".*"  # reference subscribes to every topic (Raport.py:43)

# spark-sql-kafka offset sentinels (public contract): in per-partition
# offset JSON, -2 means "earliest" and -1 means "latest". Start offsets
# are INCLUSIVE, ending offsets EXCLUSIVE.
OFFSET_EARLIEST = -2
OFFSET_LATEST = -1


def _offsets_option(value, *, what: str) -> str:
    """Normalize a startingOffsets/endingOffsets argument to the option
    string the Kafka source takes: pass-through for the "earliest" /
    "latest" keywords, json.dumps for a {topic: {partition: offset}}
    dict (partition keys stringified — the JSON contract)."""
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        return json.dumps(
            {
                topic: {str(p): int(o) for p, o in parts.items()}
                for topic, parts in value.items()
            }
        )
    raise TypeError(
        f"{what} must be 'earliest'/'latest' or a "
        "{topic: {partition: offset}} dict, got "
        f"{type(value).__name__}"
    )


def _subscription(subscribe_pattern, subscribe):
    """Resolve the subscription mode: the Kafka source accepts EXACTLY
    one of subscribe / subscribePattern (assign not surfaced here); the
    real reader rejects both-set at start, this rejects it at build so
    the error is local. Neither set falls back to the reference's
    subscribe-everything pattern (Raport.py:43)."""
    if subscribe is not None and subscribe_pattern is not None:
        raise ValueError(
            "exactly one of subscribe / subscribe_pattern — the Kafka "
            "source takes a single subscription mode"
        )
    if subscribe is not None:
        topics = (
            subscribe if isinstance(subscribe, str) else ",".join(subscribe)
        )
        return "subscribe", topics
    return "subscribePattern", subscribe_pattern or DEFAULT_PATTERN


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str | None = None,
    subscribe: str | list[str] | None = None,
    starting_offsets="earliest",
    ending_offsets="latest",
):
    """Batch full-log read — the reference's per-cycle rescan (R8).

    ``starting_offsets``/``ending_offsets`` take the keywords or a
    per-partition offset dict (R7 offset-window replay: start inclusive,
    end exclusive, sentinels -2/-1). Batch reads reject the two keyword
    corners the real source rejects — starting at "latest" / ending at
    "earliest" both describe an empty or ill-defined window."""
    if starting_offsets == "latest":
        raise ValueError("batch read cannot start at 'latest'")
    if ending_offsets == "earliest":
        raise ValueError("batch read cannot end at 'earliest'")
    mode, topics = _subscription(subscribe_pattern, subscribe)
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option(mode, topics)
        .option(
            "startingOffsets",
            _offsets_option(starting_offsets, what="starting_offsets"),
        )
        .option(
            "endingOffsets",
            _offsets_option(ending_offsets, what="ending_offsets"),
        )
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str | None = None,
    max_offsets_per_trigger: int | None = None,
    subscribe: str | list[str] | None = None,
    starting_offsets="earliest",
):
    """Incremental stream read — the scalable upgrade of R8/R9.

    ``maxOffsetsPerTrigger`` bounds each micro-batch (the analog of the
    reference's 10 s poll window, ``Raport.py:47-53``) without losing
    data — unread offsets carry to the next trigger via the checkpoint.
    Streams take no ending bound (the log is unbounded); "latest" start
    IS legal here (begin at the tail), unlike batch.
    """
    mode, topics = _subscription(subscribe_pattern, subscribe)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option(mode, topics)
        .option(
            "startingOffsets",
            _offsets_option(starting_offsets, what="starting_offsets"),
        )
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def replay_offset_window(
    kafka_df: DataFrame,
    starting_offsets="earliest",
    ending_offsets="latest",
) -> DataFrame:
    """The batch reader's offset-window semantics applied to a
    Kafka-shaped STATIC frame — the broker-free parity harness for R7
    offset replay (no broker in env; a real read and this filter over
    the same log rows must agree by the public contract):

    - start offsets are inclusive, ending offsets exclusive;
    - sentinels: -2 = earliest (no lower bound), -1 = latest (for an
      ending bound: no upper bound; illegal as a batch start);
    - a per-partition dict IS the subscription: topics absent from the
      dict are not subscribed, and a subscribed topic must list every
      partition present in the log (the real source fails the read on a
      missing partition — this fails at build, same contract, local
      error);
    - the keywords bound nothing ("earliest".."latest" = whole log).

    Implementation is a broadcast join against the tiny bounds relation
    (O(topics × partitions) rows) — no driver-side row loop, so the
    same helper replays windows out of a 100 TB archived-log copy.
    """
    if starting_offsets == "latest":
        raise ValueError("batch replay cannot start at 'latest'")
    if ending_offsets == "earliest":
        raise ValueError("batch replay cannot end at 'earliest'")

    def bounds(value):
        if isinstance(value, str):
            return None  # keyword: unbounded on this side
        return {
            (topic, int(p)): int(o)
            for topic, parts in value.items()
            for p, o in parts.items()
        }

    lo = bounds(starting_offsets)
    hi = bounds(ending_offsets)
    if lo is None and hi is None:
        return kafka_df
    spark = kafka_df.sparkSession
    keys = sorted(set(lo or hi) | set(hi or lo))
    if lo is not None and hi is not None and set(lo) != set(hi):
        raise ValueError(
            "starting/ending offset dicts must cover the same "
            "(topic, partition) set"
        )
    rows = [
        (
            t,
            p,
            (lo or {}).get((t, p), OFFSET_EARLIEST),
            (hi or {}).get((t, p), OFFSET_LATEST),
        )
        for (t, p) in keys
    ]
    b = spark.createDataFrame(
        rows, "topic string, partition int, lo long, hi long"
    )
    subscribed_topics = {t for (t, _p) in keys}
    # a subscribed topic with a partition in the log but not in the
    # dict = the real source's "offsets missing for partition" failure
    missing = (
        kafka_df.filter(F.col("topic").isin(*subscribed_topics))
        .select("topic", "partition")
        .distinct()
        .join(F.broadcast(b.select("topic", "partition")), ["topic", "partition"], "left_anti")
        .limit(1)
        .collect()
    )
    if missing:
        r = missing[0]
        raise ValueError(
            f"offset dict missing partition {r.partition} of subscribed "
            f"topic {r.topic!r} — the real Kafka source fails this read"
        )
    lo_ok = (F.col("lo") == OFFSET_EARLIEST) | (
        F.col("offset") >= F.col("lo")
    )
    hi_ok = (F.col("hi") == OFFSET_LATEST) | (F.col("offset") < F.col("hi"))
    return (
        kafka_df.join(F.broadcast(b), ["topic", "partition"])
        .filter(lo_ok & hi_ok)
        .drop("lo", "hi")
    )


def decode_clickstream(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire format → normalized (service, dimension, value, ts).

    The reference encodes schema in topic names ``{service}_{dimension}``
    with bare-string payloads (``serwer.js:84-118``); parity transform:
    CAST(value AS STRING) (R10) + topic split (R14). Works identically
    on the batch and streaming reader output.
    """
    return kafka_df.select(
        F.substring_index(F.col("topic"), "_", -1).alias("dimension"),
        F.expr("substring(topic, 1, length(topic) - length(substring_index(topic, '_', -1)) - 1)").alias(
            "service"
        ),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
    ).select("service", "dimension", "value", "ts")
