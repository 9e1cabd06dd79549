"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()`` / ``oracle_sql()`` — the declared operator surface
(SURVEY.md §2.2), served from the package registry: every operator
module registers its (query, DuckDB-oracle) pair at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    load_table,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's report aggregate, Spark-first —
    per-(event_type, mktsegment) click counts with share-of-total
    (SURVEY §2.1 R6+R12+R15+R20) over sf0.001."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    cust = load_table(spark, SMOKE_SF_DIR, "customer")
    counts = (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("event_type", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    share_w = W.partitionBy("event_type")
    return counts.select(
        "event_type",
        "c_mktsegment",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(share_w), 6).alias("share"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return registry.all_oracles()
