"""Focused guards for the r16 optimization-pass internals
(OPTIMIZATION_r16.md): each changed operator's rewrite rests on an
equivalence argument — these tests pin the argument itself, so a
future Spark/pandas/numpy/pyarrow bump that breaks the assumption
fails HERE with the reason, not in a driver hash mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    load_table,
)


def test_np_quantile_matches_pandas_series_quantile():
    """q_udaf_grouped's applyInArrow body computes np.quantile where the
    pandas body computed Series.quantile — the swap claims BIT-identical
    values (pandas delegates to numpy's linear interpolation). Exercise
    odd/even lengths, duplicates, negatives, and single-element groups."""
    rng = np.random.RandomState(7)
    cases = [
        rng.uniform(-1e3, 1e3, size=n)
        for n in (1, 2, 3, 10, 101, 1000)
    ]
    cases.append(np.array([5.0] * 17))  # all-duplicates group
    cases.append(np.array([0.1, 0.1, 0.2, 0.3, 0.3]))
    for v in cases:
        got = np.quantile(v, [0.5, 0.9])
        want = pd.Series(v).quantile([0.5, 0.9]).to_numpy()
        assert got[0] == want[0] and got[1] == want[1], v


def test_udaf_grouped_matches_jvm_percentile_twin(spark, sf_dir):
    """The Arrow grouped-UDAF output must equal Spark's own exact
    `percentile` aggregate (same linear-interpolation definition) —
    a JVM-side twin fully independent of the Python path."""
    q = registry.all_queries()["q_udaf_grouped"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    twin = ev.groupBy("user_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
        F.count(F.lit(1)).alias("cnt"),
    )
    assert sorted(map(tuple, q.collect())) == sorted(
        map(tuple, twin.collect())
    )


def test_cogroup_arrow_matches_join_twin(spark, sf_dir):
    """The Arrow cogroup profile must equal the pure-JVM aggregate +
    full-outer-join twin (the oracle's shape, built with DataFrame
    primitives so the check runs without DuckDB)."""
    from pyspark.sql import types as T

    q = registry.all_queries()["q_udf_cogroup"](spark, sf_dir)
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("spend"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    twin = (
        o.join(e, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(
                F.coalesce("spend", F.lit(0.0)).cast(T.DecimalType(38, 6)),
                2,
            )
            .cast("double")
            .alias("total_spend"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )
    assert sorted(map(tuple, q.collect())) == sorted(
        map(tuple, twin.collect())
    )


def test_hll_estimate_is_duplicate_insensitive(spark):
    """q_agg_approx_distinct's rewrite dedups (key, value) pairs BEFORE
    sketching; correctness rests on HLL++ registers being max-per-slot,
    i.e. the estimate over duplicated input equals the estimate over
    its distinct values — pin that on a skewed constructed input."""
    base = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 531).alias("v")
    )
    dup = base.union(base).union(base.filter(F.col("v") < 50))
    est_dup = dict(
        dup.groupBy("k")
        .agg(F.approx_count_distinct("v", rsd=0.01).alias("e"))
        .collect()
    )
    est_distinct = dict(
        dup.select("k", "v")
        .distinct()
        .groupBy("k")
        .agg(F.approx_count_distinct("v", rsd=0.01).alias("e"))
        .collect()
    )
    assert est_dup == est_distinct
