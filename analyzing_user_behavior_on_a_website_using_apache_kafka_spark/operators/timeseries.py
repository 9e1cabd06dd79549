"""Time-series rollup with gap fill — the hypertable-style continuous
aggregate the reference's report loop approximates by polling.

The reference redraws its whole report every 60 s from the complete
event log (``Raport.py:41-69``: re-consume from offset 0, recount,
re-render).  The warehouse-native form of that loop is a *time-bucket
rollup*: aggregate raw events into fixed time buckets once, and answer
"traffic per hour per type" from the bucketed relation.  Gap filling
(emitting zero rows for empty buckets) is what makes the rollup a
regular time series that downstream charts / anomaly detectors
(``q_event_anomaly``) can consume without special-casing missing hours
— the reference's matplotlib pies never face this because they always
rescan everything.

Scale notes (100 TB): the only pass over raw events is ONE partial
(map-side combined) aggregation down to O(hours × types) rows — every
later step (bucket grid generation, the gap-fill outer join) runs on
relations bounded by the calendar, not the data; the grid cross join
carries an explicitly broadcast, enum-sized type list. At petabyte
event volume this is the plan you want: no window over raw events, no
second scan, the shuffle keyed on (bucket, type) — high cardinality,
evenly hashed. Incremental maintenance (only re-aggregating buckets
touched by new data) is the streaming twin, already covered by
``q_stream_tumbling``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_time_rollup",
    oracle="""
    WITH ev AS (
      SELECT date_trunc('hour', ts) AS h, event_type, value
      FROM events
    ),
    agg AS (
      SELECT h, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 6) AS sum_value
      FROM ev GROUP BY h, event_type
    ),
    hours AS (
      SELECT unnest(generate_series((SELECT MIN(h) FROM ev),
                                    (SELECT MAX(h) FROM ev),
                                    INTERVAL 1 HOUR)) AS h
    ),
    grid AS (
      SELECT hours.h, t.event_type
      FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
    )
    SELECT strftime(g.h, '%Y-%m-%d %H:00') AS hour_iso,
           g.event_type,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a
      ON g.h = a.h AND g.event_type = a.event_type
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly (bucket × event_type) rollup of the event log, gap-filled
    to a dense grid: every hour between the corpus' first and last
    event appears for every event type, with 0 / 0.0 for empty cells.

    Plan shape: one partial-aggregated groupBy over raw events (the
    only full-data pass), a 1-row min/max bounds aggregate exploded
    through ``sequence(lo, hi, interval 1 hour)`` into the hour spine,
    a broadcast cross join against the enum-sized distinct type list,
    and a left join of that calendar-bounded grid onto the rollup.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    agg = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    bounds = ev.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    return (
        grid.join(agg, ["h", "event_type"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour_iso"),
            "event_type",
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias(
                "n_events"
            ),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )
