"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for semantics the built-in windowed aggregations can't
express (SURVEY §2.2): arbitrary per-key state evolved batch-by-batch.
Demonstrated as a per-user *behavior profile* — running event count,
first/last event time, and the count of distinct event types seen — the
kind of online feature the reference's batch recompute could never keep
incrementally.

Scale notes: state lives in the state store keyed by user_id — O(active
users), not O(events); a GroupStateTimeout would expire idle users in
production (kept NoTimeout here because the fixture replay is finite).
Each micro-batch ships only that batch's rows for updated keys through
Arrow into pandas.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from ..serialization import pickle_module_by_value
from ..sources.file_stream import run_stream, stream_table

# _update_profile ships to executor Python workers; by-value pickling
# makes it importable-path-independent (the driver harness may run from
# any cwd without this package on the workers' sys.path)
pickle_module_by_value(__name__)

_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_types bigint, "
    "first_ts timestamp, last_ts timestamp"
)
_STATE_SCHEMA = (
    "n_events bigint, types array<string>, first_ts timestamp, "
    "last_ts timestamp"
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this batch's events for one user into the running profile."""
    n, types, first_ts, last_ts = (
        state.get if state.exists else (0, [], None, None)
    )
    type_set = set(types)
    for pdf in pdfs:
        n += len(pdf)
        type_set.update(pdf["event_type"])
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, sorted(type_set), first_ts, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_types": [len(type_set)],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


@query(
    "q_stream_custom_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state streaming aggregation (applyInPandasWithState).

    With the whole log in one AvailableNow pass the final emitted profile
    per user equals the batch aggregate — the SQL oracle. (Timestamps
    compare exactly because both sides read the same ns→us-normalized
    instants.)
    """
    ev = stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    profiles = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_stream(profiles, "update")
