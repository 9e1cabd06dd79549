"""Skew mitigation: salted join (+ AQE's automatic variant).

At 100 TB a handful of hot keys (one bot user, one default topic) can
pin an entire shuffle join on one task. Two remedies, both demonstrated:

- AQE skew-join splitting is ON in the session (`session.py`) — the
  runtime fix, zero code.
- Explicit salting — the structural fix when even AQE's split granularity
  is too coarse: the fact side adds a deterministic salt in [0, N), the
  dimension side replicates N× with every salt value, and the join key
  becomes (key, salt), spreading each hot key over N tasks.

The salted plan must be *semantically invisible* — its oracle is the
plain unsalted join, which is exactly what makes it a declared query
worth checking rather than a code comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_N_SALT = 8


@query(
    "q_join_salted",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: events (salted on a hash of the row) ⋈ customer
    (replicated ×N with explode). Result is identical to the plain join —
    the salt only changes physical key distribution.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALT))
    )
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_N_SALT)]))
    )
    return (
        ev.join(
            cust,
            (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
