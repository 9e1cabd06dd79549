"""Streaming state introspection — the statestore data source.

At 100 TB the streaming jobs' state store is an operational blind
spot: RocksDB holds millions of session/dedup/agg keys per partition,
and when a job's state balloons (a watermark stuck behind one slow
source, a hot key accumulating sessions) the only signals are coarse
progress metrics. Spark 4's `statestore` data source turns the
checkpoint itself into a readable table — every state row as (key,
value, partition_id) — so state debugging becomes ordinary DataFrame
work: group by partition for skew, filter keys for a stuck user,
diff two batch versions for growth attribution. Reads run against
checkpoint files with executor parallelism; nothing streams through
the driver and the live query keeps running.

The reference has no analog (its "state" is the full Kafka log,
rescanned per report — SURVEY §0.2); this is the ops surface the
rebuild's real state stores need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_coordinator(spark: SparkSession) -> None:
    """Materialize the driver's StateStoreCoordinator endpoint before a
    batch statestore read.

    The coordinator is created lazily by the FIRST streaming query a
    session runs; a fresh diagnostic session that goes straight to
    `read_state` (the realistic ops path — attach to a checkpoint left
    by a crashed or live job from a new process) has no endpoint, and
    every state-loading task then dies with CANNOT_LOAD_STATE_STORE /
    RpcEndpointNotFoundException(StateStoreCoordinator) — found r13
    driving exactly that path. StreamingQueryManager caches the ref in
    a lazy val, so touching its accessor is idempotent (same ref on
    repeat calls, verified) and a streaming query started afterwards
    reuses it rather than colliding on the endpoint name."""
    try:
        spark._jsparkSession.sessionState().streamingQueryManager().stateStoreCoordinator()
    except Exception:
        # private-API drift on a future Spark: fall back to the old
        # behavior (reads still work in any session that has run a
        # stream) rather than failing the diagnostic up front
        pass


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    batch_id: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """State rows of one operator's store at one batch version, as a
    DataFrame of (key struct, value struct, partition_id).

    Defaults follow the source: latest committed batch, operator 0,
    the `default` store. Multi-stateful-operator queries (stream-stream
    join + dedup in one plan) address each operator via `operator_id`
    from `state_metadata`; stream-stream joins keep four stores per
    operator (left/right × keyToNumValues/keyWithIndexToValue) selected
    by `store_name`. NOTE the value struct carries the operator's
    INTERNAL buffer field names (a `.agg(count(*).alias("cnt"))` state
    says `count` — the store sits before the final projection), so
    joins back to query output go through the key columns."""
    _ensure_coordinator(spark)
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The checkpoint's operator map: (operatorId, operatorName,
    stateStoreName, numPartitions, minBatchId, maxBatchId) — which
    stores exist, under which ids, and the batch-version range still
    readable (bounded by `minDeltasForSnapshot` retention)."""
    return spark.read.format("state-metadata").load(checkpoint)


def partition_skew(state: DataFrame) -> DataFrame:
    """Per-partition key counts plus each partition's share of the
    total — THE first diagnostic when one executor's RocksDB outgrows
    the rest. A healthy hash-partitioned store sits near share ≈
    1/numPartitions; a hot entity (one user accumulating sessions, one
    join key with unbounded matches) shows as a share spike on its
    partition."""
    total = state.count()
    return (
        state.groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .withColumn(
            "share",
            F.round(F.col("n_keys") / F.lit(max(total, 1)), 6),
        )
        .orderBy(F.col("n_keys").desc())
    )


def state_diff(
    spark: SparkSession,
    checkpoint: str,
    batch_a: int,
    batch_b: int,
    *,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Growth attribution between two batch versions of one store: per
    state KEY, one row with (key struct, change, value_a, value_b)
    where change ∈ {added, removed, updated} — unchanged keys are
    dropped. This is the module docstring's 'diff two batch versions'
    made a real operation: at 100 TB the question is never 'is state
    growing' (progress metrics say so) but WHICH keys grew between the
    batch where the job was healthy and the batch where it wasn't.

    Executor-parallel (a full-outer join of two statestore scans on the
    key columns); keys compare by their full struct, values by their
    serialized form so any buffer-field change counts as `updated`.
    Version availability is bounded by snapshot retention —
    `state_metadata` reports the readable [minBatchId, maxBatchId]
    window per store."""
    # Presence is derived from per-side MARKER columns, not value
    # nullness (ADVICE r13): a store row whose top-level value is
    # legitimately NULL in one batch would otherwise be mislabeled
    # added/removed, and struct `!=` returns NULL (dropping the row)
    # when either side is NULL — eqNullSafe is the change test that
    # treats NULL as a comparable state.
    a = read_state(
        spark, checkpoint, batch_id=batch_a,
        operator_id=operator_id, store_name=store_name,
    ).select(F.col("key"), F.col("value").alias("value_a"), F.lit(True).alias("_in_a"))
    b = read_state(
        spark, checkpoint, batch_id=batch_b,
        operator_id=operator_id, store_name=store_name,
    ).select(F.col("key"), F.col("value").alias("value_b"), F.lit(True).alias("_in_b"))
    joined = a.join(b, on="key", how="full_outer")
    return joined.select(
        "key",
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("updated"))
        .alias("change"),
        "value_a",
        "value_b",
        "_in_a",
        "_in_b",
    ).filter(
        F.col("_in_a").isNull()
        | F.col("_in_b").isNull()
        | ~F.col("value_a").eqNullSafe(F.col("value_b"))
    ).drop("_in_a", "_in_b")
