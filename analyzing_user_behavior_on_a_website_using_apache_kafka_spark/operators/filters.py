"""Filter / predicate operators.

Reference parity: the drop-``home`` equality filter (``serwer.js:72-76``,
``Raport.py:169-170``; SURVEY §2.1 R4/R17), the ``endswith('_clicks')``
suffix predicate (``Raport.py:146``, R13), and the login point-lookup
(``app.py:78-80``, R25). All predicates are plain Catalyst expressions —
they push down to the parquet scan (``PushedFilters`` in ``.explain``),
which at 100 TB means row-group and page skipping via parquet min/max
stats before a single row is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import query


@query(
    "q_filter_eq",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type = 'click'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate — the drop-`home` / login-lookup shape (R4, R25)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND o_totalprice > 50000
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates on timestamp + number (pushed to parquet stats)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
        & (F.col("o_totalprice") > 50000)
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("total"))


@query(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%bolt' AND p_type LIKE 'PRO%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/suffix string predicates — the `endswith('_clicks')` shape (R13)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").endswith("bolt") & F.col("p_type").startswith("PRO")
    ).select("p_partkey", "p_name")


@query(
    "q_filter_null",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(evt) AS BIGINT) AS n_nonnull,
      CAST(SUM(CASE WHEN evt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM (
      SELECT NULLIF(event_type, 'error') AS evt FROM events
    )
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF injection + isNull/isNotNull counting.

    The fixture tables carry no physical NULLs, so the null domain is
    derived deterministically (NULLIF) — the point is Spark's three-valued
    logic matching ANSI, not the storage.
    """
    ev = load_table(spark, sf_dir, "events")
    withnull = ev.select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("evt")
    )
    return withnull.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("evt").alias("n_nonnull"),
        F.sum(F.when(F.col("evt").isNull(), 1).otherwise(0)).alias("n_null"),
    )


@query(
    "q_project_derive",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)), 2)
           AS DOUBLE) AS net_price,
      CASE WHEN l_quantity >= 40 THEN 'bulk'
           WHEN l_quantity >= 10 THEN 'mid'
           ELSE 'small' END AS qty_band,
      CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def q_project_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic, CASE WHEN, cast (R10/R14 generalized)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round through DECIMAL: the exact product has ≤4 decimal digits,
        # so both engines see the same decimal value before HALF_UP —
        # double-only ROUND diverges at the .005 boundary
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                T.DecimalType(38, 4)
            ),
            2,
        )
        .cast("double")
        .alias("net_price"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )
