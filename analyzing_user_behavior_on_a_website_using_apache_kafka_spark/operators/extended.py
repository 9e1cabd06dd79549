"""Extended relational surface: pivot/unpivot, distribution windows,
collect aggregates, correlated subqueries, cross join.

The unpivot is the closest relative of the reference's click fan-out
(one `(age, city, gender)` tuple → 4 `(topic, value)` messages,
``serwer.js:84-118``, SURVEY §2.1 R3) — `stack()` is its engine form.
Pivot is the inverse report shape (dimension values as columns).

Scale notes: pivot with an explicit value list is one partial+final
aggregate (no extra pass to discover columns — always pass the list at
100 TB); unpivot is a map-only row expansion; collect_list/set
materialize whole groups — bounded here by the fixed event-type domain,
and at scale only ever used behind an explicit cap (slice/filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..registry import query

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               "CAST(SUM(CASE WHEN event_type = '%s' THEN 1 ELSE 0 END)"
               " AS BIGINT) AS n_%s" % (t, t) for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event types become columns (per-user behavior vector).

    The explicit value list keeps it a single partial+final aggregate —
    without it Spark runs an extra distinct pass to discover columns.
    The oracle spells the same thing as conditional aggregation (the
    relational definition of pivot).
    """
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, ROUND(c_acctbal, 2) AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE)
    FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via `stack()` — the reference's click fan-out shape (R3):
    one row becomes one row per (metric, value) pair, map-only."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', ROUND(c_acctbal, 2), "
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"
        ),
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    (the quantile-bucketing used for data-quality binning). Unique
    o_orderkey tie-break keeps every rank deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
               AS types_seen,
           CAST(len(list_distinct(list(event_type))) AS INT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set into a sorted, comma-joined label set per entity.

    Sorting makes the set deterministic — raw collect order is
    partition-dependent and never oracle-comparable. The array is
    projected to a scalar string (array_join) because differential
    harnesses canonicalize rows via hashing and array cells are
    unhashable; the array form remains available by dropping the join.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("types_seen"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


_SQL_CORRELATED = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total
FROM orders o
WHERE o_totalprice > 2 * (
    SELECT AVG(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


@query("q_subquery_scalar", oracle=_SQL_CORRELATED)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders > 2× their customer's average.

    Catalyst decorrelates this into an aggregate + join (SURVEY §4.2) —
    written as SQL to exercise the subquery front-end; the same string
    is the oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SQL_CORRELATED)


@query(
    "q_sessionize_batch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM seq
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM sess
    GROUP BY user_id, session_no
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): lag → boundary flag →
    running sum → per-session aggregate. The batch twin of
    `q_stream_session`, using the verified strict-gap semantics
    (> 30 min starts a session). One shuffle on user_id serves both
    windows and the final aggregate — the partitioning is reused.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-break makes the running sum a TOTAL order: with
    # duplicate (user_id, ts) rows at a session boundary, ts-only
    # ordering would assign session_no nondeterministically.
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    gap_ms = (
        F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            gap_ms > 30 * 60 * 1000, 1
        ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sess = flagged.withColumn(
        "session_no", F.sum("new_session").over(run)
    )
    return sess.groupBy(
        "user_id", F.col("session_no").cast("bigint").alias("session_no")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles with the BUILT-IN `percentile` aggregate (JVM,
    linear interpolation == DuckDB quantile_cont) — the codegen'd
    sibling of the applyInPandas version in `q_udaf_grouped`. At 100 TB
    exact percentiles sort within groups; prefer `approx_percentile`
    (t-digest-style sketch, mergeable) when error tolerance allows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_totalprice), 2) AS min_val,
           ROUND(MAX(o_totalprice), 2) AS max_val,
           ROUND(AVG(o_totalprice), 4) AS avg_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 2),
           ROUND(MAX(o_custkey), 2),
           ROUND(AVG(o_custkey), 4)
    FROM orders
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality pass a training pipeline runs
    before ingest): row/non-null/distinct counts + min/max/avg per
    column, all in ONE scan — every per-column stat is an aggregate
    expression in the same HashAggregate, then unpivoted to rows."""
    o = load_table(spark, sf_dir, "orders")

    def stats(col: str):
        return [
            F.count(F.lit(1)).alias(f"{col}__n_rows"),
            F.count(col).alias(f"{col}__n_nonnull"),
            F.countDistinct(col).alias(f"{col}__n_distinct"),
            F.round(F.min(col).cast("double"), 2).alias(f"{col}__min_val"),
            F.round(F.max(col).cast("double"), 2).alias(f"{col}__max_val"),
            F.round(F.avg(col), 4).alias(f"{col}__avg_val"),
        ]

    wide = o.agg(*stats("o_totalprice"), *stats("o_custkey"))
    # One explode fans the single wide row out to one row per column — a
    # union of per-column selects over `wide` would re-run the whole
    # scan+aggregate per branch (no cross-branch plan sharing), breaking
    # the single-pass claim.
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"{col}__n_rows").alias("n_rows"),
                F.col(f"{col}__n_nonnull").alias("n_nonnull"),
                F.col(f"{col}__n_distinct").alias("n_distinct"),
                F.col(f"{col}__min_val").alias("min_val"),
                F.col(f"{col}__max_val").alias("max_val"),
                F.col(f"{col}__avg_val").alias("avg_val"),
            )
            for col in ("o_totalprice", "o_custkey")
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select(
        "s.col", "s.n_rows", "s.n_nonnull", "s.n_distinct",
        "s.min_val", "s.max_val", "s.avg_val",
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (5 × 25 dims — the only legitimate cross join
    shape: both sides tiny and broadcastable)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")
