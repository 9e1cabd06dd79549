"""Property-based tests (hypothesis) for the custom composed operators —
the ones Spark has no native primitive for, where a hand-rolled
composition could silently get edge cases wrong (SURVEY §7 hard parts):

- as-of join: composition (equi-join + ts filter + max reduction) must
  equal the obvious per-row Python definition, including tie and
  no-match cases;
- session windows: Spark's gap-merge semantics vs a direct Python
  gap-scan, including events exactly at the gap boundary.

Examples are kept small (Spark job per example); hypothesis explores the
structure space (duplicates, ties, boundaries) rather than data volume.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (user, minute)
    min_size=1,
    max_size=25,
)
orders_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (cust, minute)
    min_size=0,
    max_size=25,
)


@pytest.fixture(scope="module")
def pb_spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, orders=orders_strategy)
def test_asof_join_matches_python_reference(pb_spark, events, orders):
    spark = pb_spark
    ev = spark.createDataFrame(
        [
            (i, u, BASE + timedelta(minutes=m))
            for i, (u, m) in enumerate(events)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    od = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m)) for u, m in orders],
        "o_custkey long, o_orderdate timestamp",
    ) if orders else spark.createDataFrame([], "o_custkey long, o_orderdate timestamp")

    # the q_join_asof composition (joins.py): equi + range filter + max
    joined = ev.join(
        od, (ev.user_id == od.o_custkey) & (ev.ts >= od.o_orderdate), "inner"
    )
    got = {
        r.event_id: r.asof
        for r in joined.groupBy("event_id")
        .agg(F.max("o_orderdate").alias("asof"))
        .collect()
    }

    # per-row Python definition: latest order date <= event ts, same user
    for i, (u, m) in enumerate(events):
        ts = BASE + timedelta(minutes=m)
        cands = [
            BASE + timedelta(minutes=om)
            for ou, om in orders
            if ou == u and BASE + timedelta(minutes=om) <= ts
        ]
        if cands:
            assert got[i] == max(cands), (i, u, m)
        else:
            assert i not in got  # inner semantics: no match → no row


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_session_window_matches_gap_scan(pb_spark, events):
    spark = pb_spark
    gap_min = 10
    df = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m)) for u, m in events],
        "user_id long, ts timestamp",
    )
    got = sorted(
        (r.user_id, r.w.start, r.n)
        for r in df.groupBy(
            F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    # Python gap-scan: Spark merges an event exactly at last_ts + gap
    # (hypothesis counterexample [(0,0),(0,10)] pinned this) — a new
    # session starts only when the gap is STRICTLY greater
    sessions: list[tuple[int, datetime, int]] = []
    by_user: dict[int, list[datetime]] = {}
    for u, m in events:
        by_user.setdefault(u, []).append(BASE + timedelta(minutes=m))
    for u, tss in by_user.items():
        tss.sort()
        start, n, last = tss[0], 0, None
        for ts in tss:
            if last is not None and (ts - last) > timedelta(minutes=gap_min):
                sessions.append((u, start, n))
                start, n = ts, 0
            n += 1
            last = ts
        sessions.append((u, start, n))
    assert got == sorted(sessions)
