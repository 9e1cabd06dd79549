"""Blocking-key degeneracy sweep (r11, the simhash lesson made a tool).

A blocking/LSH structure whose tests are all SELF-consistent can be
arbitrarily wrong: the pre-r11 simhash fingerprint collapsed every doc
into one band bucket for four rounds while determinism, band-
completeness-vs-own-sigs, and the one-sided oracle invariant all
passed. The independent-construction tests added in r11
(tests/test_northstar.py: test_simhash_hamming_bounds' pure-Python
sign-sum replay, test_minhash_signature_matches_python_reference)
catch that class at fixture scale; THIS sweep is the cheap field
check to run against any new corpus / scale factor: a collapsed key
space shows as distinct_keys ~ 1-2 or max_bucket ~ corpus size where
the data does not justify it. (Big buckets alone are NOT proof of a
bug — the synthetic fixture's 31-word vocabulary legitimately gives
minhash mh_0 only ~13 distinct minima — which is exactly why the
bit-exact construction tests, not this sweep, are the gate.)

Usage: python tools/degen_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
    dedup,
    similarity,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)


def stat(name: str, df, keycols: list[str]) -> None:
    n = df.count()
    agg = (
        df.groupBy(*keycols)
        .count()
        .agg(F.count("*").alias("d"), F.max("count").alias("mx"))
        .collect()[0]
    )
    print(
        f"{name}: rows={n} distinct_keys={agg.d} max_bucket={agg.mx}"
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("degen_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    sigs = dedup.simhash_fingerprints(spark, sf)
    for j in range(dedup._SIMHASH_BANDS):
        stat(f"simhash band {j}", sigs, [f"sh{j}"])

    mh = dedup.minhash_signatures(spark, sf)
    rows_per_band = dedup._N_HASHES // dedup._N_BANDS
    for band in (0, dedup._N_BANDS - 1):
        cols = [
            f"mh_{i}"
            for i in range(band * rows_per_band, (band + 1) * rows_per_band)
        ]
        stat(
            f"minhash band {band}",
            mh.select(F.xxhash64(*cols).alias("k")),
            ["k"],
        )

    v = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    stat(
        "hyperplane LSH buckets (all tables)",
        similarity.bucketed_all_tables(v),
        ["tbl", "bucket"],
    )
    spark.stop()


if __name__ == "__main__":
    main()
