"""Sort / limit / set-operation operators.

Reference parity: the fan-out merge of 4 dimension messages per click
(``serwer.js:84-118``, SURVEY §2.1 R3) is a UNION ALL shape; the distinct
service projection (``Raport.py:165``, R16) is UNION/DISTINCT territory.

Scale notes: a global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine for top-n because Spark plans TakeOrderedAndProject,
which keeps only n rows per partition and merges on the driver.
INTERSECT/EXCEPT are null-safe distinct joins under the hood — one
shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (top-n orders by price).

    The unique o_orderkey tie-break makes the selected set deterministic.
    Spark plans TakeOrderedAndProject — no full sort materializes.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "q_sort_multikey",
    oracle="""
    SELECT evt, user_id, event_id
    FROM (SELECT NULLIF(event_type, 'error') AS evt, user_id, event_id
          FROM events)
    ORDER BY evt ASC NULLS LAST, user_id DESC, event_id
    LIMIT 100
    """,
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST ordering + deterministic limit.

    NULLs injected via NULLIF (fixtures carry none) to pin down the
    nulls-ordering semantics; event_id makes the order total.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.nullif("event_type", F.lit("error")).alias("evt"),
            "user_id",
            "event_id",
        )
        .orderBy(
            F.col("evt").asc_nulls_last(),
            F.col("user_id").desc(),
            F.col("event_id"),
        )
        .limit(100)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT kind, entity_key, val FROM (
      SELECT 'customer' AS kind, c_custkey AS entity_key,
             ROUND(c_acctbal, 2) AS val FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_suppkey AS entity_key,
             ROUND(s_acctbal, 2) AS val FROM supplier
    )
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections — the R3 fan-out merge shape."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.round("c_acctbal", 2).alias("val"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_key"),
        F.round("s_acctbal", 2).alias("val"),
    )
    return c.unionByName(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    UNION
    SELECT c_nationkey AS k FROM customer
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    return n.unionByName(c).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers having both finished and open orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(op)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys that never appear in orders."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return c.exceptAll(o).distinct()
