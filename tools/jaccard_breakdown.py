"""Stage-level breakdown of q_dedup_ngram_jaccard (VERDICT r16 item 4).

The pipeline has four cost centers that one wall number conflates:

  1. prefixes   — tokenize + freq agg + per-doc sort + posexplode
                  (the persisted relation; feeds both join sides)
  2. candidates — prefix self-join + positional/length filters +
                  dropDuplicates (partial agg, exchange, final agg)
  3. verify     — attach both word arrays (broadcast joins) + one
                  array_intersect per candidate pair + threshold
  4. (clusters consumes the persisted pairs — out of scope here)

This probe times the CUMULATIVE sub-plans cold (evict before each),
so stage cost = successive difference, median-of-N. The sub-plans are
rebuilt INLINE with the same code path as functions.dedup —
equivalence is guarded by comparing the final sub-plan's output hash
with the real registered query's output hash in the same session.

Usage: python tools/jaccard_breakdown.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    load_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
    dedup,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    evict_caches,
    get_spark,
)


def _consume(df):
    return df.select(
        F.sum(F.hash(*[F.col(c) for c in df.columns]))
    ).collect()[0][0]


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _subplans(docs, threshold):
    """Rebuild (prefixes, cand, final) exactly as
    dedup.prefix_filtered_jaccard_join does — keep in sync; the hash
    guard below fails loudly on drift."""
    from pyspark import StorageLevel

    t = Fraction(str(threshold))
    tok = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("words")
    )
    words_ex = tok.select("doc_id", F.explode("words").alias("token"))
    freq = words_ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    ordered = (
        words_ex.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("freq", "token"))).alias(
                "wf"
            )
        )
    )
    n = F.size("wf")
    ceil_tn = F.floor(
        (n * F.lit(t.numerator) + F.lit(t.denominator - 1))
        / F.lit(t.denominator)
    )
    p = (n - ceil_tn + 1).cast("int")
    prefixes = ordered.select(
        "doc_id",
        F.size("wf").alias("nt"),
        F.posexplode(
            F.slice(F.transform("wf", lambda s: s["token"]), F.lit(1), p)
        ).alias("pos0", "token"),
    ).select(
        "doc_id", "nt", (F.col("pos0") + 1).alias("pos"), "token"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    len_ok = F.least(F.col("pa.nt"), F.col("pb.nt")) * F.lit(
        t.denominator
    ) >= F.lit(t.numerator) * F.greatest(F.col("pa.nt"), F.col("pb.nt"))
    overlap_ub = F.least(F.col("pa.pos"), F.col("pb.pos")) + F.least(
        F.col("pa.nt") - F.col("pa.pos"), F.col("pb.nt") - F.col("pb.pos")
    )
    pos_ok = overlap_ub * F.lit(t.denominator + t.numerator) >= F.lit(
        t.numerator
    ) * (F.col("pa.nt") + F.col("pb.nt"))
    cand = (
        prefixes.alias("pa")
        .join(
            prefixes.alias("pb"),
            (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & len_ok
            & pos_ok,
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    a = tok.select(
        F.col("doc_id").alias("doc_a"),
        F.col("words").alias("wa"),
        F.size("words").alias("na"),
    )
    b = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("words").alias("wb"),
        F.size("words").alias("nb"),
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    survivors = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", "na", "nb", inter.alias("inter"))
        .filter(
            F.col("inter") * F.lit(t.denominator + t.numerator)
            >= F.lit(t.numerator) * (F.col("na") + F.col("nb"))
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    final = survivors.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return prefixes, cand, final


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("jaccard_breakdown")
    docs = load_table(spark, args.sf_dir, "documents")
    prefixes, cand, final = _subplans(docs, dedup._JACCARD_T)

    # drift guard: inline rebuild must hash-match the registered query
    evict_caches(spark)
    h_real = _consume(dedup.q_dedup_ngram_jaccard(spark, args.sf_dir))
    evict_caches(spark)
    prefixes.unpersist()
    h_inline = _consume(final)
    if h_real != h_inline:
        raise SystemExit(
            f"DRIFT: inline rebuild hash {h_inline} != real {h_real}"
        )

    stages = {"prefixes": prefixes, "candidates": cand, "full": final}
    counts = {}
    results: dict[str, list[float]] = {k: [] for k in stages}
    # warm-up pass
    for nm, df in stages.items():
        evict_caches(spark)
        prefixes.unpersist()
        _consume(df)
    for _ in range(args.reps):
        for nm, df in stages.items():
            evict_caches(spark)
            prefixes.unpersist()  # evict_caches only clears catalog cache
            spark.sparkContext.setJobDescription(f"breakdown:{nm}")
            t0 = time.time()
            _consume(df)
            results[nm].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for nm, df in stages.items():
        counts[nm] = df.count()
    med = {k: _median(v) for k, v in results.items()}
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "reps": results,
                "medians": med,
                "increments": {
                    "prefixes": med["prefixes"],
                    "candidates_minus_prefixes": round(
                        med["candidates"] - med["prefixes"], 3
                    ),
                    "verify_minus_candidates": round(
                        med["full"] - med["candidates"], 3
                    ),
                },
                "rows": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
