"""User-behavior analytics over the event log — the analyses the
reference exists to serve.

The reference's whole purpose is "analyzing user behavior on a website":
``serwer.js`` emits one message per click and ``Raport.py:41-69``
re-consumes the complete log to draw per-topic histograms
(``Raport.py:74-99``). These queries are the next page of that same
report — funnel conversion, cohort retention, event-transition
structure, dwell time, top paths, growth accounting — expressed as
single declarative Spark plans over the ``events`` table instead of a
driver-side ``Counter`` per topic.

Scale notes (the 100 TB shape of each):
- Every per-user computation (funnel layers, paths, dwell, first-seen)
  is a Window or groupBy partitioned on ``user_id`` — the natural,
  high-cardinality, evenly-hashed key; chained selects over the SAME
  partitioning collapse to one Exchange.
- Every *unpartitioned* window here runs over an already-aggregated
  input (per-day / per-source rows — O(days), O(types²) cardinality),
  the pattern tests/test_plans.py explicitly allows; raw events never
  pass through a global window.
- Final report relations are tiny (stages, type-pairs, day grid), so
  the joins that assemble them broadcast under AQE at any sf.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_ORD = ("ts", "event_id")  # total order within a user: ts alone has dups


@query(
    "q_funnel_conversion",
    oracle="""
    WITH l1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    l2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view
                         THEN ts END)
                    OVER (PARTITION BY user_id) AS t_click
      FROM l1
    ),
    l3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
                         THEN ts END)
                    OVER (PARTITION BY user_id) AS t_purchase
      FROM l2
    ),
    per_user AS (
      SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
             MAX(t_purchase) AS t_purchase
      FROM l3 GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(t_view) AS BIGINT) AS n_view,
             CAST(COUNT(t_click) AS BIGINT) AS n_click,
             CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase
      FROM per_user
    )
    SELECT 1 AS stage, 'view' AS stage_name, n_view AS n_users,
           ROUND(CASE WHEN n_total > 0
                      THEN CAST(n_view AS DOUBLE) / n_total END, 6)
               AS pct_of_prev
    FROM tot
    UNION ALL
    SELECT 2, 'click_after_view', n_click,
           ROUND(CASE WHEN n_view > 0
                      THEN CAST(n_click AS DOUBLE) / n_view END, 6)
    FROM tot
    UNION ALL
    SELECT 3, 'purchase_after_click', n_purchase,
           ROUND(CASE WHEN n_click > 0
                      THEN CAST(n_purchase AS DOUBLE) / n_click END, 6)
    FROM tot
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click strictly after the first view →
    purchase strictly after the first qualifying click.

    Three chained per-user MIN windows (each layer conditions on the
    previous layer's timestamp) share ONE user_id partitioning — Catalyst
    plans a single Exchange feeding three Window nodes — then a per-user
    reduce and a single-row global aggregate fan out into the 3-stage
    funnel report. Strictly-after (`>`) matches the session-gap
    convention verified for `q_stream_session`.
    """
    return funnel_stages(load_table(spark, sf_dir, "events"))


def funnel_stages(ev: DataFrame) -> DataFrame:
    """Core funnel over any ``(user_id, event_type, ts)`` relation —
    separated from the registered query so property tests can drive
    constructed tie-heavy streams: the strictly-after (``>``) layer
    conditions are exactly where a ``>=`` slip or a null-propagation
    mistake would hide, and the fixture's timestamps rarely collide."""
    per_user_w = W.partitionBy("user_id")
    l1 = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(
            per_user_w
        ).alias("t_view"),
    )
    l2 = l1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(per_user_w),
    )
    l3 = l2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(per_user_w),
    )
    per_user = l3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )

    def pct(num, den):
        return F.round(
            F.when(
                F.col(den) > 0,
                F.col(num).cast("double") / F.col(den),
            ),
            6,
        )

    stages = [
        ("view", 1, "n_view", "n_total"),
        ("click_after_view", 2, "n_click", "n_view"),
        ("purchase_after_click", 3, "n_purchase", "n_click"),
    ]
    # Fan the single-row aggregate out to one row per stage with ONE
    # explode — a 3-way union of `tot.select(...)` branches would
    # triplicate the whole scan+window subtree (no cross-branch plan
    # sharing in Catalyst).
    rows = F.array(
        *[
            F.struct(
                F.lit(stage).alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(num).alias("n_users"),
                pct(num, den).alias("pct_of_prev"),
            )
            for name, stage, num, den in stages
        ]
    )
    return tot.select(F.explode(rows).alias("s")).select(
        "s.stage", "s.stage_name", "s.n_users", "s.pct_of_prev"
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(FLOOR(date_diff('day', f.cohort_day,
                                  CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
                 AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    ),
    grid AS (
      SELECT cohort_day, week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM act GROUP BY cohort_day, week_offset
    )
    SELECT cohort_day, week_offset, n_users,
           ROUND(CAST(n_users AS DOUBLE) /
                 MAX(CASE WHEN week_offset = 0 THEN n_users END)
                     OVER (PARTITION BY cohort_day), 6) AS pct_of_cohort
    FROM grid
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    7-day offset, normalized by cohort size.

    Calendar-free offsets (day-diff // 7, explicit FLOOR on both engines
    — DuckDB's int cast ROUNDS while Spark's TRUNCATES, so a bare cast
    diverges) avoid week-truncation convention drift. The per-user
    first-seen aggregate and the activity join share the user_id
    partitioning; the cohort-size window runs over the aggregated grid
    (O(cohorts × offsets) rows). Week 0 always holds the full cohort, so
    pct_of_cohort's denominator exists by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.col("d"), F.col("cohort_day")) / F.lit(7.0)
            ).alias("week_offset"),
        )
        .distinct()
    )
    grid = act.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    cohort_w = W.partitionBy("cohort_day")
    return grid.select(
        "cohort_day",
        "week_offset",
        "n_users",
        F.round(
            F.col("n_users").cast("double")
            / F.max(
                F.when(F.col("week_offset") == 0, F.col("n_users"))
            ).over(cohort_w),
            6,
        ).alias("pct_of_cohort"),
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    pairs AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           ROUND(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY src), 6) AS p_transition
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the clickstream: for each
    (event_type → next event_type) pair, its count and conditional
    probability.

    One LEAD window on user_id (the only shuffle that sees raw events),
    a groupBy on the 25-cell pair space, and a share window over the
    aggregated matrix. (ts, event_id) is a total order, so dst is
    deterministic under concurrent identical timestamps.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORD)
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    src_w = W.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(src_w), 6
        ).alias("p_transition"),
    )


@query(
    "q_event_dwell",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_ms(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
                 - epoch_ms(ts) AS dwell_ms
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(dwell_ms), 4) AS avg_dwell_ms,
           ROUND(quantile_cont(dwell_ms, 0.5), 4) AS p50_dwell_ms,
           ROUND(quantile_cont(dwell_ms, 0.95), 4) AS p95_dwell_ms
    FROM seq
    WHERE dwell_ms IS NOT NULL
    GROUP BY event_type
    """,
)
def q_event_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time: how long a user lingers on each event type before
    their next action — avg / p50 / p95 of (next ts − ts) per type.

    LEAD over the user_id partition, then a 5-group aggregate; exact
    percentiles use the built-in JVM `percentile` (== DuckDB
    quantile_cont linear interpolation, the pairing verified by
    `q_agg_percentile`). Millisecond integers avoid float time
    arithmetic until the final rounded stats.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORD)
    seq = ev.select(
        "event_type",
        (
            F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")
        ).alias("dwell_ms"),
    )
    return (
        seq.filter(F.col("dwell_ms").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("dwell_ms"), 4).alias("avg_dwell_ms"),
            F.round(
                F.percentile("dwell_ms", F.lit(0.5)), 4
            ).alias("p50_dwell_ms"),
            F.round(
                F.percentile("dwell_ms", F.lit(0.95)), 4
            ).alias("p95_dwell_ms"),
        )
    )


@query(
    "q_path_topk",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
)
def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavior paths (event-type trigrams) by
    frequency — "what do users actually do" in one table.

    Two LEADs in one window pass (one shuffle), a groupBy over the ≤125
    possible paths, and a global top-k whose (n DESC, path ASC) ordering
    is total, so the LIMIT set is deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORD)
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(10)
    )


@query(
    "q_growth_accounting",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    ),
    firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    news AS (
      SELECT first_day AS d, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day
    )
    SELECT dau.d, dau.dau,
           COALESCE(news.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(news.new_users, 0))
                    OVER (ORDER BY dau.d
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_users
    FROM dau LEFT JOIN news ON dau.d = news.d
    """,
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day — active users, NEW users (first ever
    seen that day), and the running total of distinct users ever seen.

    The running-distinct-users metric needs no distinct-over-window
    (unsupported in Spark): cumulative distinct == running SUM of
    per-day first-sightings. Both inputs aggregate before the tiny
    O(days) join + unpartitioned window, which therefore runs over
    aggregated input (the allowed pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    dau = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    news = firsts.groupBy(F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    joined = dau.join(news, "d", "left").select(
        "d",
        "dau",
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
    )
    run = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        "d",
        "dau",
        "new_users",
        F.sum("new_users").over(run).cast("bigint").alias("cum_users"),
    )


@query(
    "q_event_anomaly",
    oracle="""
    WITH per_min AS (
      SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_ts,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT AVG(n_events) AS mu, stddev_samp(n_events) AS sd FROM per_min
    )
    SELECT minute_ts, n_events,
           ROUND((n_events - mu) / sd, 4) AS zscore,
           CAST(CASE WHEN ABS((n_events - mu) / sd) > 3.0
                     THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM per_min CROSS JOIN stats
    """,
)
def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly detection: z-score every minute's event count
    against the corpus-wide mean/stddev and flag |z| > 3 — the ops-
    monitoring view over the same click log the reference aggregates
    (spike = incident or bot, trough = outage).

    Plan shape: one count shuffle to per-minute rows (O(minutes), tiny
    regardless of event volume), a 1-ROW mean/stddev aggregate of that,
    and a broadcast cross join attaching the two scalars back — the
    same bounded-broadcast pattern as q_text_tfidf's corpus total, so
    no per-row shuffle beyond the first count. At 100 TB the minute
    count is a partial+final HashAggregate over the scan; everything
    after operates on O(minutes) rows. z rounds at 4 digits (engines'
    one-pass moment accumulation agrees to ~1e-9 relative).
    """
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        F.unix_timestamp(F.date_trunc("minute", "ts"))
        .cast("bigint")
        .alias("minute_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = per_min.agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sd"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sd")
    return per_min.crossJoin(F.broadcast(stats)).select(
        "minute_ts",
        "n_events",
        F.round(z, 4).alias("zscore"),
        F.when(F.abs(z) > 3.0, 1).otherwise(0).cast("int").alias("is_anomaly"),
    )


@query(
    "q_event_rfm",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM events),
    base AS (
      SELECT user_id,
             date_diff('day', MAX(CAST(ts AS DATE)),
                       (SELECT ad FROM anchor)) AS recency_days,
             COUNT(*) AS frequency,
             COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'),
                      0.0) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(recency_days AS INT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           ROUND(monetary, 2) AS monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INT)
             AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS INT)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY ROUND(monetary, 2) DESC, user_id)
                AS INT) AS m_score
    FROM base
    """,
)
def q_event_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user scoring — the classic
    marketing segmentation over the same click log the reference
    aggregates per event type: days since last activity (vs the log's
    anchor date), total events, and purchase revenue, each bucketed
    into quintiles.

    Plan shape: one groupBy(user_id) shuffle builds the per-user base
    (conditional purchase sum via FILTER-style aggregate); the anchor
    date is a 1-row aggregate broadcast back (the q_event_anomaly
    scalar pattern); the three quintile windows run over the
    POST-AGGREGATE user table — O(users), not O(events). Determinism:
    every NTILE ordering carries a user_id tie-break, monetary is
    rounded to cents BEFORE bucketing (a last-ulp double-sum delta
    between engines cannot reorder), and recency uses date-level
    integer arithmetic (no sub-second epoch mismatch).

    100 TB note: a global NTILE over billions of users serializes one
    sort partition; at that scale swap the exact quintile for
    approx-percentile cutoff joins (the aggregate base stays
    identical). At report scale — users that fit a sort — exact
    quintiles are the right default and match the SQL oracle exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
            F.lit(0.0),
        ).alias("monetary"),
    )
    anchor = base.agg(F.max("last_day").alias("ad"))
    scored = base.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("ad", "last_day").cast("int").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.round("monetary", 2).alias("monetary"),
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy("recency_days", "user_id"))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy(F.desc("frequency"), F.asc("user_id")))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy(F.desc("monetary"), F.asc("user_id")))
        .cast("int")
        .alias("m_score"),
    )


# probe-set size / top-k for the activity-profile similarity search
_TS_PROBES = 20
_TS_TOPK = 5

# (session, corpus) -> persisted O(users × 24) activity-profile relation
# shared by q_sim_timeseries' probe and scoring branches; memoized with
# the same (session, corpus) discipline as timeseries.hourly_base so
# repeated calls (oracle sweeps, bench reps) reuse one cache entry.
# session.evict_caches clears it (the _CACHE_OWNERSHIP contract in
# functions/dedup.py).
_TS_PROFILE_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def _ts_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE full-data pass of the activity-similarity search: raw
    events partial-aggregated to O(users × 24) rows, pivoted to a
    24-float profile vector + its L2 norm per user, then PERSISTED.

    The persist is load-bearing, not a micro-optimization (ADVICE r8):
    the probe relation (orderBy+limit over these profiles) and the
    scoring cross join both consume this subtree, and the higher-order
    array lambdas in the projection defeat Spark's exchange reuse — so
    unpersisted, Catalyst planned the full scan→agg→pivot chain TWICE
    (PLANS.md r8 captured both chains).  At 100 TB that is the
    difference between one corpus pass and two.  Pinned by
    tests/test_plans.py::test_sim_timeseries_reads_events_once."""
    key = (id(spark), os.path.abspath(sf_dir))
    hit = _TS_PROFILE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    prof = (
        cnt.groupBy("user_id")
        .pivot("h", list(range(24)))
        .sum("c")
        .na.fill(0.0)
    )
    vec = F.array(*[F.col(f"`{h}`") for h in range(24)])
    prof = prof.select(
        "user_id",
        vec.alias("v"),
        F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("l2"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _TS_PROFILE_CACHE[key] = (spark, prof)
    return prof


@query(
    "q_sim_timeseries",
    oracle="""
    WITH cnt AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS INT) AS h,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    nrm AS (
      SELECT user_id, sqrt(SUM(c * c)) AS l2 FROM cnt GROUP BY 1
    ),
    probes AS (
      SELECT user_id AS probe_user FROM nrm ORDER BY user_id LIMIT 20
    ),
    dots AS (
      SELECT a.user_id AS pu, b.user_id AS cu, SUM(a.c * b.c) AS dot
      FROM cnt a JOIN cnt b ON a.h = b.h AND a.user_id <> b.user_id
      WHERE a.user_id IN (SELECT probe_user FROM probes)
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT p.probe_user, n.user_id AS cand_user,
             COALESCE(d.dot, 0) / (np.l2 * n.l2) AS cos
      FROM probes p
      JOIN nrm np ON np.user_id = p.probe_user
      CROSS JOIN nrm n
      LEFT JOIN dots d ON d.pu = p.probe_user AND d.cu = n.user_id
      WHERE n.user_id <> p.probe_user
    ),
    ranked AS (
      SELECT probe_user, cand_user,
             ROUND(cos, 6) AS cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY probe_user
                                ORDER BY cos DESC, cand_user) AS rnk
      FROM pairs
    )
    SELECT probe_user, cand_user, cosine_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def q_sim_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-pattern similarity search: which users behave alike
    over time — the top-k cosine neighbors of each probe user's
    24-dim hourly-activity profile (the distributed time-series
    similarity-search pattern of EDBT'19-style systems, applied to the
    reference's clickstream domain: ``serwer.js`` tags each message
    with its click time; "users with the same daily rhythm" is the
    natural next question after its per-topic histograms).

    Plan shape (100 TB): ONE partial-aggregated pass over raw events
    down to O(users × 24) rows, pivoted to one 24-float profile row
    per user and PERSISTED (``_ts_profiles`` — the probe and scoring
    branches would otherwise each re-plan the full scan+pivot chain,
    the r8 double-scan ADVICE finding; both now read the one
    InMemoryRelation, plan-pinned) — raw events are never windowed or
    self-joined. The probe side is a broadcast 20-row relation (lowest
    user_ids — deterministic), so scoring is a single pass over the
    cached profiles, and top-k is the same two-phase window as
    q_sim_topk_bruteforce (partial top-k per physical partition,
    re-rank the O(partitions × k) survivors) — no single-reducer-per-
    probe skew wall. Exactness: profile vectors are integer counts, so
    dot products and squared norms are EXACT in double arithmetic
    regardless of summation order — the cosine is bit-identical
    between Spark's fixed-order array aggregate and the oracle's
    hour-join SUM, and the rank tie-break on cand_user is therefore
    stable across engines.
    """
    prof = _ts_profiles(spark, sf_dir)
    probes = (
        prof.orderBy("user_id")
        .limit(_TS_PROBES)
        .select(
            F.col("user_id").alias("probe_user"),
            F.col("v").alias("pv"),
            F.col("l2").alias("pl2"),
        )
    )
    dot = F.aggregate(
        F.zip_with("pv", "v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        prof.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("probe_user"))
        .select(
            "probe_user",
            F.col("user_id").alias("cand_user"),
            (dot / (F.col("pl2") * F.col("l2"))).alias("cos"),
        )
    )
    w_part = W.partitionBy("probe_user", "pid").orderBy(
        F.col("cos").desc(), F.col("cand_user")
    )
    survivors = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("prnk", F.row_number().over(w_part))
        .filter(F.col("prnk") <= _TS_TOPK)
    )
    w = W.partitionBy("probe_user").orderBy(
        F.col("cos").desc(), F.col("cand_user")
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TS_TOPK)
        .select(
            "probe_user",
            "cand_user",
            F.round("cos", 6).alias("cosine_sim"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# --------------------------------------------------------------------------
# Built and property/parity-tested in round 8, registered round 9: the
# driver verifies a 50-key window per round under a <=3-round staleness
# bound, so steady-state capacity is 3 x 50 = 150 keys and the r8 window
# was full — registering mid-r8 would have created a never-driver-checked
# key outside the window (a strict rotation violation).  The r9 window
# leads with it (registry._PRIORITY).
# --------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 24 * 3600 * 1_000_000  # 24 h, binds at ~p90 user gaps
_ATTR_CHANNELS = ("search", "social", "email", "ads")

_ATTRIBUTION_ORACLE = f"""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('view', 'click') THEN
               ['search', 'social', 'email', 'ads']
                 [(json_extract_string(props, '$.k')::INT % 4) + 1]
             END AS ch
      FROM events
    ),
    a AS (
      SELECT *,
             LAST_VALUE(ch IGNORE NULLS) OVER w AS lch,
             LAST_VALUE(CASE WHEN ch IS NOT NULL THEN epoch_us(ts) END
                        IGNORE NULLS) OVER w AS lts
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT COALESCE(
             CASE WHEN epoch_us(ts) - lts <= {_ATTR_LOOKBACK_US}
                  THEN lch END,
             'organic') AS channel,
           COUNT(*) AS conversions,
           CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS revenue
    FROM a
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY channel
    """


@query("q_event_attribution", oracle=_ATTRIBUTION_ORACLE)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution with a 24-hour lookback: every
    purchase is credited to the marketing channel of the most recent
    preceding touch (a ``view``/``click``, channel decoded from the
    event's ``props`` payload) by the same user, or to ``organic`` when
    no touch happened within the lookback — the per-channel
    conversion/revenue report a growth team runs daily on exactly the
    clickstream the reference collects (``serwer.js`` emits one Kafka
    message per site interaction; ``Raport.py:74-99`` charts raw
    per-topic volumes — this is the next report over the same log).

    Semantics pinned by tests: the LAST touch wins (not first), ties at
    identical timestamps break on ``event_id`` (the ``_ORD`` total
    order), a stale touch (older than the lookback) yields ``organic``,
    and the purchase row itself is never a touch (its channel is NULL,
    so the ignore-nulls running last skips it by construction).

    100 TB shape: ONE hash Exchange on ``user_id`` (high-cardinality,
    evenly distributed — the module's standard partitioning); the
    running last-touch is a map-side ignore-nulls window over that
    partitioning carrying two slim columns (channel enum + bigint
    micros), purchases (~20 % of rows) filter BEFORE the final
    aggregate, and the report relation is O(channels) — 5 rows at any
    scale.  Revenue sums exact ``decimal(18,6)`` then casts once to
    double: summation-order independent, so cross-engine parity holds
    at every SF (the r8 interpolation lesson).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    ch = F.when(
        F.col("event_type").isin("view", "click"),
        F.element_at(
            F.array(*[F.lit(c) for c in _ATTR_CHANNELS]), (k % 4) + 1
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(*_ORD)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touched = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        ch.alias("ch"),
        F.when(ch.isNotNull(), F.unix_micros("ts")).alias("tts"),
    ).select(
        "*",
        F.last("ch", ignorenulls=True).over(w).alias("lch"),
        F.last("tts", ignorenulls=True).over(w).alias("lts"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.unix_micros("ts") - F.col("lts")
                    <= _ATTR_LOOKBACK_US,
                    F.col("lch"),
                ),
                F.lit("organic"),
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("channel")
    )
