"""Scalar function packs: string / date / math / JSON / array / map.

Reference parity: topic parsing `split('_')[0]` (``Raport.py:147``, SURVEY
§2.1 R14) and label concat `f'{service} ({count})'` (``Raport.py:152``,
R21). All functions here are built-in ``pyspark.sql.functions`` — JVM-side
expressions inside whole-stage codegen, never Python. Cross-engine parity
pitfalls (int widths, ns-vs-us timestamps, DECIMAL contagion) are
neutralized by explicit casts on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_str_funcs",
    oracle="""
    SELECT
      c_custkey,
      split_part(c_name, '#', 1) AS name_prefix,
      CAST(CAST(split_part(c_name, '#', 2) AS BIGINT) AS BIGINT) AS name_num,
      lower(c_mktsegment) AS seg_lower,
      concat(c_mktsegment, ':', c_name) AS seg_label,
      CAST(length(c_name) AS BIGINT) AS name_len,
      substring(c_name, 1, 4) AS name_head,
      replace(c_name, 'Customer', 'C') AS name_short,
      trim('  x  ') AS trimmed,
      printf('%s (%d)', c_mktsegment, c_custkey) AS fmt_label
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: split/substring_index/concat/lower/length/replace/
    format_string — the topic-parse (R14) + label-concat (R21) family."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring_index("c_name", "#", 1).alias("name_prefix"),
        F.substring_index("c_name", "#", -1).cast("bigint").alias("name_num"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_label"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 4).alias("name_head"),
        F.regexp_replace("c_name", "Customer", "C").alias("name_short"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.format_string("%s (%d)", "c_mktsegment", "c_custkey").alias(
            "fmt_label"
        ),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      CAST(year(o_orderdate) AS BIGINT) AS order_year,
      CAST(month(o_orderdate) AS BIGINT) AS order_mon,
      CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
        AS days_to_2002,
      strftime(o_orderdate, '%Y-%m-%d') AS order_iso
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack: trunc, extract, diff, format.

    DuckDB ``dayofweek`` is 0=Sunday..6; Spark ``dayofweek`` is
    1=Sunday..7 — normalized by subtracting 1 on the Spark side.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_mon"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_iso"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      ROUND(abs(l_discount - 0.05), 6) AS abs_disc_gap,
      ROUND(ln(l_extendedprice), 6) AS ln_price,
      ROUND(sqrt(l_quantity), 6) AS sqrt_qty,
      ROUND(pow(1 - l_discount, 2), 6) AS disc_sq,
      CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
      CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod7
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack: abs/ln/sqrt/pow/floor/modulo with explicit casts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_gap"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 - F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias(
            "price_bucket"
        ),
        (F.col("l_quantity").cast("bigint") % 7).cast("bigint").alias("qty_mod7"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      json_extract_string(props, '$.missing') AS prop_missing,
      CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
           THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column.

    ``get_json_object`` is schema-on-read — the reference's dynamic
    topic-name schema (SURVEY §1.2) generalized to JSON payloads. For a
    hot path at scale, parse once with ``from_json`` + a static schema
    instead of repeated path extraction.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
        F.when(
            F.get_json_object("props", "$.k").cast("bigint") >= 50, "high"
        )
        .otherwise("low")
        .alias("k_band"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT
      vec_id,
      CAST(len(embedding) AS BIGINT) AS dim,
      ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
      ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS vec_sum,
      ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vec_max,
      CAST(length(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
           AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over embeddings: size / element_at / higher-order fns.

    ``aggregate``/``filter`` lambdas run JVM-side (Catalyst higher-order
    functions) — this is the built-in path for vector math before
    reaching for a Pandas UDF.
    """
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("bigint").alias(
            "n_positive"
        ),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT
      event_id,
      'type' AS k1,
      event_type AS v_type,
      ROUND(value, 6) AS v_value
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access round-trip.

    Builds a MapType column, reads it back via key access, and projects
    the scalars (map output itself is not portable across engines, so the
    oracle checks the round-tripped values).
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("value"),
        F.col("value").cast("string"),
    )
    withmap = ev.select("event_id", m.alias("props_map"))
    return withmap.select(
        "event_id",
        F.element_at(F.map_keys("props_map"), 1).alias("k1"),
        F.element_at(F.col("props_map"), "type").alias("v_type"),
        F.element_at(F.col("props_map"), "value").cast("double").alias("v_value"),
    ).withColumn("v_value", F.round("v_value", 6))


@query(
    "q_json_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type (r8
    widening): ``parse_json`` once into the shredded binary VARIANT
    encoding, then typed ``variant_get`` extraction — the fast path
    for JSON-heavy event payloads (the reference's dynamic topic
    payloads, SURVEY §1.2). Versus q_json_funcs' per-path
    ``get_json_object`` string re-parsing, VARIANT parses each
    payload ONCE and serves every later extraction from the binary
    form — at 100 TB of event JSON that is the difference between
    one parse per row and one per row×path. The oracle is DuckDB's
    ``json_extract`` (hand-matched pair — DuckDB has no VARIANT);
    aggregation down to O(types) rows keeps the comparison exact
    (integer sums; avg rounded identically).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )
