"""Window-function operators.

No direct reference analog (the reference has no ordered analytics), but
they generalize its per-group reporting (SURVEY §2.2). Scale notes: a
window partitioned by a key shuffles once on that key; ordering within
the partition is a per-partition sort. Never use a global (unpartitioned)
ordered window over raw data — the two global windows below run over
pre-aggregated O(groups) inputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ROUND(c_acctbal, 2) AS acctbal,
           CAST(RANK() OVER w AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per segment.

    Ordering includes the unique c_custkey tie-break so row_number is
    deterministic across engines.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS latest_type,
           NTH_VALUE(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an EXPLICIT growing
    frame: per event, the user's first-ever, latest-so-far, and second
    event types. The frame matters — last_value over the DEFAULT frame
    (range-to-current-row) silently equals the current row, the classic
    window-frame trap; pinning ROWS UNBOUNDED PRECEDING..CURRENT ROW
    makes 'latest so far' explicit and identical on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS BIGINT) AS ms_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — session step analysis over each user's event sequence.

    This is the clickstream operation the reference cannot express at all
    (it never records event time, SURVEY §1.2).
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
        ).cast("bigint").alias("ms_since_prev"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer (ROWS unbounded-preceding frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           CAST(COUNT(*) OVER (
             PARTITION BY p_brand
             ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS BIGINT) AS n_similar_size
    FROM part
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: same-brand parts within ±2 of each part's size.

    Value-based (RANGE) frame, not row-based — the frame holds every
    peer whose p_size is within the band, independent of row order. The
    window is PARTITIONED (by p_brand) — an unpartitioned ordered window
    would move the whole table through one reducer, the exact
    single-node wall tests/test_plans.py guards against. A *global*
    RANGE count needs no window at all at scale: it is a histogram
    convolution — groupBy(p_size).count(), self-join the tiny histogram
    on |Δsize| ≤ 2, broadcast the summed counts back — which is how the
    unpartitioned semantics should be expressed on 100 TB.
    """
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 2)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_similar_size"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — richest 5 customers per market segment.

    row_number ≤ k with a total order (unique tie-break). At scale Spark
    pushes a per-partition top-k (WindowGroupLimit) below the shuffle, so
    only k rows per group per mapper move.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
        )
    )
