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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PATTERN = ".*"  # reference subscribes to every topic (Raport.py:43)


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_PATTERN,
):
    """Batch full-log read — the reference's per-cycle rescan (R8)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = DEFAULT_PATTERN,
    max_offsets_per_trigger: int | None = None,
):
    """Incremental stream read — the scalable upgrade of R8/R9.

    ``maxOffsetsPerTrigger`` bounds each micro-batch (the analog of the
    reference's 10 s poll window, ``Raport.py:47-53``) without losing
    data — unread offsets carry to the next trigger via the checkpoint.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", "earliest")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


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
