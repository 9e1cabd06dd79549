"""SimHash band-key candidate-volume audit (VERDICT r13 item 6): the
same volume-level decomposition the hyperplane LSH got in r13
(tools/lsh_candidate_audit.py), applied to the banded SimHash join —
so the r13 time exponent (0.90 across the 32→64-bit transition) gets
its candidate-count decomposition.

What a time probe cannot separate here, counts can. On the id-offset
replica corpora the candidate volume is OUTPUT-BOUND by construction
(every replica of a doc is hamming-0 with every other replica — the
corpus is ~100% true duplicates), so the join's Σ C(occupancy, 2) is
dominated by the SIGNAL term. This tool splits it:

  - identical-fingerprint pairs (all four band words equal — true
    hamming-0 signal, counted once per band they collide in, i.e. 4×),
  - CROSS-fingerprint collisions (same band word, different
    fingerprint): genuine hamming≤3-class neighbors PLUS the chance
    term the adaptive width bounds — compared against the closed form
    E[chance] = _SIMHASH_BANDS · C(n,2) / 2^band_bits that
    `_simhash_band_bits_for`'s 10k budget is computed from.

At every reachable scale the chance term is predicted ≪ signal (the
fuse matters at 10⁸–10¹⁰ docs); the audit's job is to MEASURE that the
cross-fingerprint volume matches the formula's order instead of
narrating it, and to print the band-key occupancy distribution that a
clustered real corpus would inflate first.

Usage: python tools/simhash_candidate_audit.py [K ...] (default 1000 10000)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.dedup import (
    _SIMHASH_BANDS,
    _simhash_band_bits_for,
    simhash_fingerprints,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)
import scale_probe


def audit(spark, sf_dir: str, band_bits: int) -> dict:
    sigs = simhash_fingerprints(spark, sf_dir, band_bits)
    sig_cols = [f"sh{j}" for j in range(_SIMHASH_BANDS)]
    banded = None
    for j in range(_SIMHASH_BANDS):
        b = sigs.select(
            F.lit(j).alias("band_id"), F.col(f"sh{j}").alias("band_key")
        )
        banded = b if banded is None else banded.unionByName(b)
    occ = banded.groupBy("band_id", "band_key").count()
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
        F.max("count").alias("occ_max"),
        (F.sum("count") / F.count(F.lit(1))).alias("occ_avg"),
        F.count(F.lit(1)).alias("buckets"),
        (F.sum("count") / F.lit(_SIMHASH_BANDS)).alias("n"),
    ).collect()[0]
    ident = (
        sigs.groupBy(*sig_cols)
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0]
    )
    n = int(row.n)
    total = int(row.pairs)
    signal = _SIMHASH_BANDS * int(ident)  # identical fp collides in all bands
    chance_formula = _SIMHASH_BANDS * n * (n - 1) / 2 / 2**band_bits
    return {
        "n": n,
        "band_bits": band_bits,
        "buckets": int(row.buckets),
        "occ_avg": round(float(row.occ_avg), 1),
        "occ_max": int(row.occ_max),
        "collide_pairs": total,
        "identical_fp_pairs": int(ident),
        "cross_fp_pairs": total - signal,
        "chance_formula": round(chance_formula, 2),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1000, 10000]
    spark = get_spark("simhash_candidate_audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| K | docs | band bits | band buckets | occ avg/max "
        "| collide pairs (per-band) | identical-fp pairs | cross-fp pairs "
        "| chance formula |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for k in sorted(ks):
        d = scale_probe.build_replica(k)
        from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
            table_rows,
        )

        n = table_rows(spark, d, "documents")
        w = _simhash_band_bits_for(n)
        rows = [audit(spark, d, w)]
        if w != 32:  # pinned-width control on the post-transition corpus
            rows.append(audit(spark, d, 32))
        for a in rows:
            print(
                f"| {k} | {a['n']} | {a['band_bits']} | {a['buckets']} "
                f"| {a['occ_avg']}/{a['occ_max']} | {a['collide_pairs']} "
                f"| {a['identical_fp_pairs']} | {a['cross_fp_pairs']} "
                f"| {a['chance_formula']} |"
            )
    print(
        "\nReading: collide pairs ≈ 4 × identical-fp pairs on the replica "
        "corpora (output-bound by construction — the replicas ARE "
        "hamming-0 duplicates); cross-fp pairs = hamming≤3-class "
        "neighbors + chance, bounded by the formula column's order. "
        "The adaptive band width (_simhash_band_bits_for) holds the "
        "formula term under its absolute 10k budget at every corpus "
        "size; the 32-bit control row on a post-transition corpus shows "
        "the chance inflation the widening removes."
    )


if __name__ == "__main__":
    main()
