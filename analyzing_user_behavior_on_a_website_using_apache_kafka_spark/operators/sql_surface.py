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


_SQL_RECURSIVE = """
WITH RECURSIVE hops AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
  FROM hops
  WHERE nxt IS NOT NULL AND nxt <> event_type
  GROUP BY event_type, nxt
),
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY n DESC, dst) AS rk
    FROM trans
  ) ranked
  WHERE rk <= 2
),
reach (src, dst, n_hops) AS (
  SELECT src, dst, 1 AS n_hops FROM edges
  UNION ALL
  SELECT r.src, e.dst, r.n_hops + 1
  FROM reach r JOIN edges e ON e.src = r.dst
  WHERE r.n_hops < 5 AND e.dst <> r.src
)
SELECT src, dst AS reachable, CAST(MIN(n_hops) AS BIGINT) AS min_hops
FROM reach
GROUP BY src, dst
"""


@query("q_sql_recursive", oracle=_SQL_RECURSIVE)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front-end (r8 widening — Spark 4
    added ANSI ``WITH RECURSIVE``): transitive reachability over the
    TYPICAL navigation graph — each event type's top-2 most frequent
    next types (deterministic rank tie-break), then min-hop closure.
    Answers "from a signup, what does a user typically reach, and in
    how many steps" — the graph question q_event_transitions (one-hop
    frequencies) cannot answer without recursion. Cycle-safe without
    UNION-dedup support: the recursion is bounded at 5 hops (min-hop
    paths in a ≤5-type graph never exceed 4) and immediate A→B→A
    backtracking is pruned; MIN(n_hops) makes truncation invisible.
    The SAME string runs on both engines (the q_sql_* contract), so
    this key checks the recursion feature itself for cross-engine
    parity — verified identical at sf0.001/0.01/0.1 including the
    multi-hop rows.

    Scale: the recursion is WRITTEN aggregate-first (the `edges` CTE
    reduces the corpus to an O(types²) graph before any iteration —
    the same discipline as connected_components), but Spark 4.1's
    UnionLoop INLINES the non-recursive CTE into the loop body: the
    executed plan (plans/r16/q_sql_recursive_before.txt) re-runs the
    events window + aggregation subtree inside EVERY iteration's join,
    so the corpus is scanned once per hop (≤5×), not once. r16
    optimization audit: no CTE-materialization hook exists for
    UnionLoop, and hoisting `edges` out of the string (temp view /
    DataFrame cache) would break this family's same-string
    cross-engine contract — the recomputation is an engine limitation,
    recorded in OPTIMIZATION_r16.md "Not yet optimized". At scale,
    prefer materializing the edge relation explicitly ahead of a
    recursive query (connected_components shows that staging).
    """
    return _run(spark, sf_dir, _SQL_RECURSIVE)


_SQL_LATERAL = """
SELECT c.c_custkey,
       t.o_orderkey,
       ROUND(t.o_totalprice, 2) AS total_price
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@query("q_sql_lateral", oracle=_SQL_LATERAL)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LATERAL correlated subquery through the SQL front-end (r8
    widening): each customer's top-2 orders by value — the per-row
    subquery formulation of q_topk_per_group, deterministic via the
    (price DESC, orderkey) tie-break. The SAME string runs on both
    engines, so the key checks LATERAL decorrelation itself for
    cross-engine parity.

    Scale: Catalyst DECORRELATES this — the optimized plan is
    WindowGroupLimit (partial per-partition top-2, map-side) + one
    hash join on custkey, NOT a per-customer nested loop; i.e. the
    SQL feature lowers to exactly the scale-safe two-phase plan the
    DataFrame twin (q_topk_per_group) hand-writes. Verified in the
    optimized plan; no BNLJ (plan-guard covered like every key).
    """
    return _run(spark, sf_dir, _SQL_LATERAL)
