"""State-store introspection (streaming/state_inspect.py): the
checkpoint of a finished run read back as DataFrames and checked
against the batch ground truth on the same fixture."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    load_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
    stream_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.streaming.state_inspect import (
    partition_skew,
    read_state,
    state_metadata,
)


@pytest.fixture(scope="module")
def agg_checkpoint(spark, sf_dir):
    """A finished complete-mode tumbling aggregate with its checkpoint
    RETAINED (run_stream deletes checkpoints after success, so this
    builds its own writer — retention is the point here)."""
    name = f"inspect_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), "aub_ckpt", name)
    sink = os.path.join(tempfile.gettempdir(), "aub_streamsink", name)
    agg = (
        stream_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(sink)
        )
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert q.exception() is None
    return ckpt


def test_state_matches_batch_ground_truth(spark, sf_dir, agg_checkpoint):
    """Complete-mode agg state holds every group: key = (window,
    event_type), value carries the count — and must equal the batch
    groupBy on the same fixture exactly."""
    state = read_state(spark, agg_checkpoint)
    # value fields carry the INTERNAL aggregation-buffer names
    # (`count`), not the query's output aliases (`cnt`) — the store
    # predates the final projection (read_state docstring)
    got = {
        (r.key.window.start, r.key.event_type, r.value["count"])
        for r in state.collect()
    }
    want = {
        (r.window.start, r.event_type, r.cnt)
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_metadata_names_the_operator(spark, agg_checkpoint):
    meta = state_metadata(spark, agg_checkpoint).collect()
    assert len(meta) == 1
    m = meta[0]
    assert m.operatorName == "stateStoreSave"
    assert m.operatorId == 0 and m.maxBatchId >= 0


def test_partition_skew_accounts_for_every_key(spark, agg_checkpoint):
    state = read_state(spark, agg_checkpoint)
    skew = partition_skew(state).collect()
    assert sum(r.n_keys for r in skew) == state.count()
    assert abs(sum(r.share for r in skew) - 1.0) < 1e-4
    # ordered worst-first, so the head row IS the skew candidate
    assert skew[0].n_keys == max(r.n_keys for r in skew)


def test_state_readable_at_explicit_batch_version(spark, agg_checkpoint):
    meta = state_metadata(spark, agg_checkpoint).collect()[0]
    pinned = read_state(spark, agg_checkpoint, batch_id=meta.maxBatchId)
    latest = read_state(spark, agg_checkpoint)
    assert pinned.count() == latest.count()


def test_session_window_state_one_row_per_session(spark, sf_dir):
    """The state-heavy operator this engine actually worries about:
    session windows hold one state row PER (user, session) — exactly
    the O(users × sessions) footprint that made the old driver-side
    verification harness a scale hazard. Read that state directly and
    check it row-for-row against the registered query's own output:
    same session count, same per-session event counts. This is the
    production diagnosis path for 'why is this job's RocksDB growing'
    — the answer is countable sessions, not a black box."""
    name = f"inspect_sess_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), "aub_ckpt", name)
    sink = os.path.join(tempfile.gettempdir(), "aub_streamsink", name)
    agg = (
        stream_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(sink)
        )
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert q.exception() is None

    meta = {m.operatorName: m for m in state_metadata(spark, ckpt).collect()}
    assert "sessionWindowStateStoreSaveExec" in meta, meta.keys()
    state = read_state(
        spark, ckpt,
        operator_id=meta["sessionWindowStateStoreSaveExec"].operatorId,
    )
    # session-window state: key = (user_id, sessionStartTime), the
    # merged window itself travels in the VALUE struct
    got = {
        (r.key.user_id, r.value.session_window.start, r.value["count"])
        for r in state.collect()
    }
    want = {
        (r.user_id, r.w.start, r.n_events)
        for r in spark.read.parquet(sink)
        .select("user_id", "w", "n_events")
        .collect()
    }
    assert got == want
    assert len(got) > 100  # the fixture really is multi-session
