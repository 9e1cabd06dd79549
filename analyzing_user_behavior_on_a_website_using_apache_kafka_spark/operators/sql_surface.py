"""The SQL entry point: queries expressed as SQL text, not DataFrame calls.

The reference has no query language (SURVEY §3.2 — the "plan" is
hard-coded Python); the rebuild exposes Spark SQL over the registered
fixture views as a first-class surface. Queries here are written in the
portable ANSI subset that parses identically in Spark SQL and DuckDB, so
the SAME string is both the engine query and its oracle — parity of the
SQL front-end itself, not just of a hand-matched pair.

Scale: identical to the DataFrame surface — SQL text and DataFrame calls
build the same logical plan and Catalyst optimizes them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query

# One string, two engines (ANSI subset: no backticks, no engine funcs).
_SQL_REPORT = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
FROM events
WHERE event_type <> 'home'
GROUP BY event_type
"""

_SQL_TOP_SEGMENTS = """
SELECT c_mktsegment, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment, o_orderpriority
HAVING COUNT(*) > 100
"""

_SQL_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS order_seq,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2)
         AS running_spend
FROM orders
"""


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


@query("q_sql_report", oracle=_SQL_REPORT)
def q_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference report aggregate as one SQL statement (R12+R17+R20):
    value histogram, drop-`home` filter, share-of-total — the oracle IS
    the query string."""
    return _run(spark, sf_dir, _SQL_REPORT)


@query("q_sql_join_having", oracle=_SQL_TOP_SEGMENTS)
def q_sql_join_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN + GROUP BY + HAVING through the SQL front-end."""
    return _run(spark, sf_dir, _SQL_TOP_SEGMENTS)


@query("q_sql_window", oracle=_SQL_WINDOW)
def q_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (row_number + running frame) through SQL text."""
    return _run(spark, sf_dir, _SQL_WINDOW)
