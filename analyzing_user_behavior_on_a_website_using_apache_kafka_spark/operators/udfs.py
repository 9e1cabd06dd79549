"""UDF / UDAF / UDTF surface.

The explicit slow-path hierarchy (SURVEY §2.2):

1. built-in functions (everything else in this package) — JVM, codegen;
2. ``pandas_udf`` — Arrow-batched, vectorized NumPy/pandas, ~10-100× the
   row-at-a-time path;
3. ``applyInArrow`` / ``applyInPandas`` — grouped custom aggregation
   (full group materialized per Python call; requires the group to fit
   in executor memory — at 100 TB that means aggregating/sampling per
   group first if groups are huge). r16: the two grouped surfaces here
   use the Arrow variant — same operator, no per-group pandas
   conversion tax (guide §4.2; 4.8×/7.6× measured);
4. row-at-a-time ``udf`` — demonstrated once, never used in a hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
# Explicit submodule import (ADVICE r16): `pa.compute` is only an
# attribute of the parent package after pyarrow.compute has been
# imported SOMEWHERE — today a lazy import inside pyspark's Arrow
# type-conversion happens to run first in every worker, but relying on
# that is a pyspark-internal refactor away from an AttributeError.
import pyarrow.compute as pc

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import query


@query(
    "q_udf_scalar",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(split_part(c_name, '#', 2) AS BIGINT) % 97 AS BIGINT)
             AS name_shard
    FROM customer
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deliberately the slow path, kept off hot
    paths): parse the numeric suffix of c_name and shard it mod 97."""

    @F.udf(returnType=T.LongType())
    def name_shard(name: str) -> int | None:
        if name is None or "#" not in name:
            return None
        return int(name.split("#")[-1]) % 97

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", name_shard("c_name").alias("name_shard"))


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(38,6)), 2) AS DOUBLE)
             AS charged
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches): the TPC-H charge
    expression computed in NumPy. Rounding happens JVM-side through
    DECIMAL(38,6): the exact product has ≤6 decimal digits, so the
    double→decimal cast is unambiguous and both engines then apply
    identical HALF_UP decimal rounding (double-only ROUND diverges at the
    .005 boundary: Spark rounds the exact binary value, DuckDB the scaled
    float)."""

    @F.pandas_udf(T.DoubleType())
    def charge(
        price: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            charge("l_extendedprice", "l_discount", "l_tax").cast(
                T.DecimalType(38, 6)
            ),
            2,
        )
        .cast("double")
        .alias("charged"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT user_id,
           ROUND(median(value), 6) AS med_value,
           ROUND(quantile_cont(value, 0.9), 6) AS p90_value,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation (full group materialized per Python
    call): exact median and p90 of event value per user (NumPy linear
    interpolation == DuckDB ``quantile_cont``). Shuffles once on the
    group key; each group materializes as one Arrow table in an
    executor.

    r16 (guide §4.2): ``applyInPandas`` → ``applyInArrow`` — the same
    grouped-UDAF operator (one shuffle, per-key Python call), but each
    of the ~10k per-user calls reads a zero-copy Arrow→NumPy view and
    builds a 4-cell ``pa.table`` instead of paying pandas DataFrame
    construction on input AND output. np.quantile IS what
    pandas.Series.quantile calls (linear interpolation) — bit-identical
    values, verified by output-hash equality at sf0.1 and the oracle
    sweep. Measured interleaved same-session: 4.7-5.5 s → ~1.0 s
    (≈4.8×) at sf0.1.

    The group key is deliberately HIGH-cardinality (user_id), so each
    per-group table holds one user's events — bounded by per-entity
    activity, not by corpus size. Keying a 100 TB corpus on a 5-value
    column (event_type) would put ~1/5 of all rows in a single group
    and OOM the executor; low-cardinality exact quantiles belong to a
    two-level reduction or approx_percentile instead.
    """

    def stats(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        # Null discipline (ADVICE r16): a NULL events.value arrives as
        # NaN here, and np.quantile PROPAGATES NaN where the r15 pandas
        # path (Series.quantile) and the JVM percentile twin both drop
        # it. Filter to keep the declared ignore-nulls semantics; an
        # all-null group yields NaN outputs explicitly (cnt still
        # counts every row, matching COUNT(*)).
        v = v[~np.isnan(v)]
        q = (
            np.quantile(v, [0.5, 0.9])
            if v.size
            else np.array([float("nan"), float("nan")])
        )
        return pa.table(
            {
                "user_id": pa.array(
                    [t.column("user_id")[0].as_py()], pa.int64()
                ),
                "med_value": pa.array([float(q[0])], pa.float64()),
                "p90_value": pa.array([float(q[1])], pa.float64()),
                "cnt": pa.array([t.num_rows], pa.int64()),
            }
        )

    ev = load_table(spark, sf_dir, "events")
    schema = "user_id bigint, med_value double, p90_value double, cnt bigint"
    raw = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInArrow(stats, schema=schema)
    )
    # round JVM-side so SQL ROUND semantics apply on both engines
    return raw.select(
        "user_id",
        F.round("med_value", 6).alias("med_value"),
        F.round("p90_value", 6).alias("p90_value"),
        "cnt",
    )


@query(
    "q_udf_cogroup",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(CAST(SUM(o_totalprice) AS DECIMAL(38,6)), 2)
                  AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    e AS (
      SELECT user_id AS custkey, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT COALESCE(o.custkey, e.custkey) AS custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_spend, 0.0) AS total_spend,
           COALESCE(e.n_events, 0) AS n_events
    FROM o FULL OUTER JOIN e ON o.custkey = e.custkey
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped per-entity UDF: orders AND events for the same
    customer arrive as two Arrow tables in one Python call — the escape
    hatch for per-entity logic that needs BOTH sides materialized
    (interleaved sequence alignment, per-entity reconciliation). Here
    the merge is a simple profile (counts + spend) so a SQL
    full-outer-join oracle can hash-check the plumbing: group
    alignment, empty-side handling (either side can be empty for a
    key), and one-shuffle-per-side co-partitioning.

    r16 (guide §4.2): ``applyInPandas`` → ``applyInArrow`` — the SAME
    cogroup operator (two shuffles, per-key Python call), but each of
    the ~15k per-key calls builds a 4-cell ``pa.table`` instead of a
    pandas DataFrame and reads zero-copy Arrow slices instead of paying
    a per-group Arrow→pandas conversion on BOTH inputs. Per-key
    function-call count is fixed by the semantics; the per-call
    constant was the whole cost: 22.8 s → 3.0 s at sf0.1 (7.6×),
    output hash identical (the round-through-DECIMAL below already
    guarantees summation-order independence, so Arrow's sum vs
    pandas' pairwise sum cannot move the rounded value).
    """

    def profile(key, orders_t: pa.Table, events_t: pa.Table):
        n_orders = orders_t.num_rows
        spend = (
            pc.sum(orders_t.column("o_totalprice")).as_py()
            if n_orders
            else 0.0
        )
        return pa.table(
            {
                "custkey": pa.array([key[0].as_py()], pa.int64()),
                "n_orders": pa.array([n_orders], pa.int64()),
                "total_spend": pa.array(
                    [float(spend or 0.0)], pa.float64()
                ),
                "n_events": pa.array([events_t.num_rows], pa.int64()),
            }
        )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey")
    )
    raw = (
        orders.groupBy("custkey")
        .cogroup(events.groupBy("custkey"))
        .applyInArrow(
            profile,
            schema="custkey bigint, n_orders bigint, "
            "total_spend double, n_events bigint",
        )
    )
    # Round through DECIMAL(38,6) on BOTH engines (repo convention for
    # oracle-compared doubles): pandas .sum() is pairwise, DuckDB SUM is
    # sequential, so the doubles can differ in the last bits and a
    # double-only ROUND(...,2) then diverges at the .005 boundary. The
    # exact sum has 2 decimal digits, so the double→DECIMAL(38,6) cast
    # is unambiguous and both engines apply identical HALF_UP rounding.
    return raw.select(
        "custkey",
        "n_orders",
        F.round(F.col("total_spend").cast(T.DecimalType(38, 6)), 2)
        .cast("double")
        .alias("total_spend"),
        "n_events",
    )


@query(
    "q_udtf_explode",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1 row → N rows): explode part-name words — the
    reference's click→4-message fan-out shape (``serwer.js:84-118``, R3)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "q_udtf_python",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             list_filter(string_split(p_name, ' '), x -> len(x) > 0) AS w
      FROM part
    )
    SELECT p_partkey,
           unnest(list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i + 1])) AS bigram
    FROM t
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark ≥3.5) invoked laterally per input row:
    part-name bigrams, 1 row → N−1 rows with arbitrary Python logic.

    This is the imperative-fan-out escape hatch — used when the
    expansion genuinely needs Python (stateful tokenizers, format
    parsers); for expansions expressible as array ops, `explode` over
    built-ins (q_udtf_explode) stays JVM-side and is strictly faster.
    Row-at-a-time like any Python UDTF — kept off hot paths.
    """
    from pyspark.sql.functions import udtf

    from ..catalog import register_views

    # empty tokens (doubled/leading spaces) are dropped on BOTH engines:
    # here via the `if w` guard, in the oracle via list_filter(len > 0)
    @udtf(returnType="p_partkey bigint, bigram string")
    class Bigrams:
        def eval(self, p_partkey: int, name: str):  # noqa: ANN001
            words = [w for w in (name or "").split(" ") if w]
            for a, b in zip(words, words[1:]):
                yield p_partkey, f"{a} {b}"

    spark.udtf.register("bigrams_udtf", Bigrams)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT b.p_partkey, b.bigram "
        "FROM part, LATERAL bigrams_udtf(p_partkey, p_name) b"
    )
