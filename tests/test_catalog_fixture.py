"""Fixture-schema tripwire (VERDICT r3 item 2).

The driver regenerates /root/testdata fixtures between rounds and has now
shipped events.ts in two physical parquet shapes:

- round ≤2: TIMESTAMP(NANOS)  -> read as int64 under nanosAsLong
- round 3:  timestamp[us], isAdjustedToUTC=false -> inferred TIMESTAMP_NTZ

Round 3 broke 7 queries because catalog.normalize only handled the first
shape. These tests write BOTH shapes to tmp synthetically and assert that
``load_table`` always yields ``ts: TimestampType`` carrying the same
instants — so the next driver-side fixture regeneration is caught here,
not by the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import catalog
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources import (
    file_stream,
)

# One known instant: 2024-03-05 06:07:08.123456 UTC.
_MICROS = 1_709_618_828_123_456


def _base_columns(ts_array: pa.Array, ts_field: pa.Field) -> pa.Table:
    n = len(ts_array)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    ).set_column(1, ts_field, ts_array)


def _write_events(tmp_path, shape: str) -> str:
    """Write a tiny events.parquet in the given physical shape; return sf_dir."""
    micros = [_MICROS + i * 1_000_000 for i in range(5)]
    if shape == "nanos":
        arr = pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
        field = pa.field("ts", pa.timestamp("ns"))
    elif shape == "us_ntz":
        arr = pa.array(micros, pa.timestamp("us"))  # isAdjustedToUTC=false
        field = pa.field("ts", pa.timestamp("us"))
    elif shape == "us_utc":
        arr = pa.array(micros, pa.timestamp("us", tz="UTC"))
        field = pa.field("ts", pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise ValueError(shape)
    sf_dir = str(tmp_path / f"sf_{shape}")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(_base_columns(arr, field), os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("shape", ["nanos", "us_ntz", "us_utc"])
def test_load_table_always_yields_timestamp_ts(spark, tmp_path, shape):
    sf_dir = _write_events(tmp_path, shape)
    df = catalog.load_table(spark, sf_dir, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, T.TimestampType), (
        f"events.ts read from a {shape} fixture must normalize to "
        f"TimestampType (got {dt}) — unix_millis/withWatermark reject "
        f"anything else"
    )
    # Same instants regardless of physical shape (UTC session tz).
    got = [r.ms for r in df.selectExpr("unix_millis(ts) AS ms").collect()]
    assert sorted(got) == [_MICROS // 1000 + i * 1000 for i in range(5)]


@pytest.mark.parametrize("shape", ["nanos", "us_ntz"])
def test_stream_table_ts_is_watermarkable(spark, tmp_path, shape):
    """withWatermark is the strictest consumer — it must accept ts directly
    off stream_table for every fixture shape (r3's driver failure mode)."""
    sf_dir = _write_events(tmp_path, shape)
    sdf = file_stream.stream_table(spark, sf_dir, "events")
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampType)
    wm = sdf.withWatermark("ts", "10 minutes")  # raises AnalysisException if NTZ
    out = file_stream.run_stream(
        wm.groupBy("event_type").count(), output_mode="complete"
    )
    rows = out.collect()
    assert [(r["event_type"], r["count"]) for r in rows] == [("click", 5)]


def test_normalize_handles_ntz_even_without_reader_conf(spark, tmp_path):
    """If inferTimestampNTZ can't be disabled (locked conf), normalize's
    NTZ branch must still rescue the schema."""
    sf_dir = _write_events(tmp_path, "us_ntz")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)
        fixed = catalog.normalize("events", raw)
        assert isinstance(fixed.schema["ts"].dataType, T.TimestampType)
        ms = [r.ms for r in fixed.selectExpr("unix_millis(ts) AS ms").collect()]
        assert sorted(ms) == [_MICROS // 1000 + i * 1000 for i in range(5)]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_stream_dir_isolates_same_basename_and_heals_dangling(tmp_path):
    """Two sf_dirs sharing a basename must not collide on one stream
    symlink, and a dangling link (target deleted) must be replaced —
    the stale-fixture flake class (pytest tmp dirs recycle basenames)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
        _stream_dir,
    )

    a = tmp_path / "runA" / "sfx"
    b = tmp_path / "runB" / "sfx"
    for d in (a, b):
        d.mkdir(parents=True)
        (d / "events.parquet").write_bytes(b"PAR1")
    da = _stream_dir(str(a), "events")
    db = _stream_dir(str(b), "events")
    assert da != db  # full-path hash keys the temp dir, not the basename
    assert os.path.realpath(os.path.join(da, "events.parquet")) == str(
        a / "events.parquet"
    )
    # dangling link heals: delete A's fixture, recreate, re-enter
    (a / "events.parquet").unlink()
    assert not os.path.exists(os.path.join(da, "events.parquet"))
    (a / "events.parquet").write_bytes(b"PAR1")
    da2 = _stream_dir(str(a), "events")
    assert da2 == da
    assert os.path.exists(os.path.join(da2, "events.parquet"))


def test_documents_are_ascii_for_levenshtein_oracle(spark, sf_dir):
    """Engine-parity tripwire for q_dedup_editdist: DuckDB's
    ``levenshtein`` is BYTE-based (measured: levenshtein('é','e') = 2
    while length('é') = 1) but Spark's is codepoint-based (= 1). The
    two agree only on ASCII text. The query now SELF-GUARDS (both
    engines restrict to byte-clean docs, parity-tested on a
    constructed non-ASCII corpus in test_properties), so a fixture
    regeneration with non-ASCII stays green — but this tripwire still
    reports the moment the corpus stops being fully covered by the
    edit-distance join, so the coverage loss is a visible decision,
    not a silent one."""
    from pyspark.sql import functions as F

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents")
    non_ascii = d.filter(
        F.length("text") != F.octet_length("text")
    ).count()
    assert non_ascii == 0, (
        f"{non_ascii} non-ASCII documents — DuckDB byte-based vs Spark "
        "codepoint-based levenshtein will diverge (see docstring)"
    )


def test_materialized_fixture_write_once_and_fingerprint(tmp_path, monkeypatch):
    """r9: source-format fixtures build ONCE per corpus state at a
    deterministic path (fixtures.materialized_fixture).  Pin the three
    behaviors the q_join_dpp review demanded: (a) a second call reuses
    the published dir without re-invoking the builder; (b) a corpus
    regenerated at the SAME path (fingerprint change) forces a
    rebuild — markers alone must never serve stale data; (c) the
    marker is `_SOURCE` (underscore-prefixed) so Spark's data-source
    file listing ignores it inside directory reads."""
    import os

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        fixtures,
    )

    monkeypatch.setattr(
        "tempfile.gettempdir", lambda: str(tmp_path / "work")
    )
    os.makedirs(tmp_path / "work")
    corpus = tmp_path / "corpus"
    os.makedirs(corpus)
    (corpus / "nation.parquet").write_bytes(b"v1")

    calls = []

    def build(tmp: str) -> None:
        calls.append(tmp)
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("payload")

    out1 = fixtures.materialized_fixture("t", str(corpus), ["nation"], build)
    assert len(calls) == 1
    assert open(os.path.join(out1, "data.txt")).read() == "payload"
    assert os.path.basename(out1).startswith("aub_fix_t_")
    assert os.path.isfile(os.path.join(out1, "_SOURCE"))
    # (a) reuse: same dir, builder NOT re-invoked
    assert fixtures.materialized_fixture(
        "t", str(corpus), ["nation"], build
    ) == out1
    assert len(calls) == 1
    # (b) regenerated corpus (size change -> new fingerprint): rebuild
    (corpus / "nation.parquet").write_bytes(b"v2-bigger")
    out2 = fixtures.materialized_fixture("t", str(corpus), ["nation"], build)
    assert out2 == out1 and len(calls) == 2
    # distinct kind -> distinct dir, no collision
    out3 = fixtures.materialized_fixture("u", str(corpus), ["nation"], build)
    assert out3 != out1 and len(calls) == 3


def test_materialized_fixture_serializes_concurrent_builders(tmp_path):
    """r9: the flock around check-build-publish must make racing
    builders serialize — exactly ONE build happens, everyone returns
    the same published dir, and no builder ever sees a half-written
    fixture.  Pinned with real processes (flock is per-open-file-
    description, so threads would not exercise the cross-process
    path the DPP review finding was about)."""
    import multiprocessing as mp
    import os

    # corpus created HERE, before any child: a child-side exists-check
    # would race and a re-write shifts mtime -> fingerprint mismatch ->
    # a legitimate second build that is not a lock failure
    os.makedirs(tmp_path / "work")
    corpus = tmp_path / "corpus"
    os.makedirs(corpus)
    (corpus / "nation.parquet").write_text("v1")
    ctx = mp.get_context("spawn")
    builds = ctx.Value("i", 0)
    results: mp.Queue = ctx.Queue()
    procs = [
        ctx.Process(
            target=_race_build_fixture,
            args=(str(tmp_path), builds, results),
        )
        for _ in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
    outs = [results.get(timeout=10) for _ in procs]
    assert len(set(outs)) == 1, outs
    assert builds.value == 1, f"{builds.value} builds — racers did not serialize"
    with open(os.path.join(outs[0], "data.txt")) as f:
        assert f.read() == "payload"


def _race_build_fixture(base, builds, results):
    """Child: point tempfile at the test dir, then build with a slow
    builder so overlap is guaranteed if the lock fails to serialize."""
    import os
    import tempfile
    import time

    tempfile.gettempdir = lambda: os.path.join(base, "work")
    corpus = os.path.join(base, "corpus")

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        fixtures,
    )

    def build(tmp):
        with builds.get_lock():
            builds.value += 1
        time.sleep(0.5)  # widen the race window
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("payload")

    results.put(fixtures.materialized_fixture("race", corpus, ["nation"], build))


def test_source_json_csv_fixtures_are_write_once(spark, sf_dir):
    """r10 (VERDICT r9 item 2): q_source_json / q_source_csv serve a
    write-once materialized fixture instead of a fresh mkdtemp per
    call.  A second call must read the SAME published files (mkdtemp
    would yield a new directory and re-pay the parquet→json/csv
    conversion on every sweep/bench invocation — the leak class the
    evolving-schema key closed in r9).  The `_SOURCE` fingerprint
    marker must live beside the data (underscore prefix keeps Spark's
    file listing from treating it as data)."""
    import os

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.operators.scans import (
        q_source_csv,
        q_source_json,
    )

    for fn in (q_source_json, q_source_csv):
        first = sorted(fn(spark, sf_dir).inputFiles())
        second = sorted(fn(spark, sf_dir).inputFiles())
        assert first and first == second, fn.__name__
        fixture_dir = os.path.dirname(first[0].removeprefix("file:"))
        assert os.path.basename(fixture_dir).startswith("aub_fix_src")
        assert os.path.isfile(os.path.join(fixture_dir, "_SOURCE"))
