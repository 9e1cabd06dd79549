"""Engaged-vs-dormant equality probe for the band-join salting cap.

Reproduces the two r16 SCALE.md evidence artifacts:

1. ``--sf-dir DIR`` (default /root/testdata/sf0.1): run the registered
   ``q_dedup_near`` and ``q_dedup_simhash`` twice each — production
   cap, then cap forced to 10**9 (the provably-dormant historical band
   join) — with evict_caches between runs, and compare the full
   sorted-output sha256. At sf0.1 the production cap genuinely engages
   (minhash 8 cells s=6, simhash 1 cell s=2), so this is the direct
   end-to-end losslessness check at the engaged scale.

2. ``--mega``: build a 200k-doc corpus with one planted 5,000-member
   near-dup cluster (band occupancy ~4.5k → s=9 at cap 500), then run
   the full minhash_lsh_pairs stage A/B/A/B interleaved, consumed via
   Spark-side count + sum-of-hash (no driver transfer) — equality at
   ~12.5M pairs plus a controlled wall comparison in one session.

Walls from mode 1 are NOT a cost comparison (run order pays the
session cold component); use the A/B/A/B walls from ``--mega`` or the
interleaved measurements in SCALE.md's band-join salting section.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEGA_DIR = "/tmp/aub_megacluster"
N_UNIQUE = 195_000
N_CLUSTER = 5_000


def _out_hash(df):
    rows = sorted(map(lambda r: tuple(map(str, r)), df.collect()))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return len(rows), h.hexdigest()[:16]


def _build_mega(spark):
    rng = random.Random(42)
    vocab = [f"w{i:06d}" for i in range(400_000)]
    base = [vocab[rng.randrange(len(vocab))] for _ in range(50)]

    def make(doc_id):
        if doc_id < N_CLUSTER:
            toks = list(base)
            toks[rng.randrange(50)] = vocab[rng.randrange(len(vocab))]
        else:
            toks = [vocab[rng.randrange(len(vocab))] for _ in range(50)]
        return " ".join(toks)

    rows = [
        (i, make(i), "en", "probe", 50)
        for i in range(N_UNIQUE + N_CLUSTER)
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).repartition(32).write.mode("overwrite").parquet(
        MEGA_DIR + "/documents.parquet"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--sf-dir", default="/root/testdata/sf0.1", help="registered-query mode"
    )
    ap.add_argument(
        "--mega",
        action="store_true",
        help="planted mega-cluster mode (builds a 200k-doc corpus in /tmp)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        registry,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions import (
        dedup,
        similarity,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        evict_caches,
        get_spark,
    )

    spark = get_spark("salting_probe")
    out: dict = {}

    if args.mega:
        _build_mega(spark)
        sigs = dedup.minhash_signatures(spark, MEGA_DIR)
        banded = dedup.minhash_banded(sigs)
        occ = (
            banded.groupBy("band_id", "band_key")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.sum(
                    F.when(F.col("count") > 500, 1).otherwise(0)
                ).alias("hot"),
            )
            .collect()[0]
        )
        evict_caches(spark)
        runs = []
        for mode in ("engaged", "dormant", "engaged", "dormant"):
            evict_caches(spark)
            old = similarity._SALT_MAX_OCC
            if mode == "dormant":
                similarity._SALT_MAX_OCC = 10**9
            try:
                t0 = time.time()
                r = (
                    dedup.minhash_lsh_pairs(spark, MEGA_DIR)
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(F.hash("doc_a", "doc_b")).alias("h"),
                    )
                    .collect()[0]
                )
                runs.append(
                    {
                        "mode": mode,
                        "rows": int(r["n"]),
                        "agg_hash": int(r["h"]),
                        "wall": round(time.time() - t0, 1),
                    }
                )
            finally:
                similarity._SALT_MAX_OCC = old
        out["mega"] = {
            "occ_max": int(occ["mx"]),
            "hot_cells": int(occ["hot"]),
            "runs": runs,
            "all_equal": len({(r["rows"], r["agg_hash"]) for r in runs})
            == 1,
        }
    else:
        qs = registry.all_queries()
        for key in ("q_dedup_near", "q_dedup_simhash"):
            res = {}
            for mode, cap in (("engaged", None), ("dormant", 10**9)):
                evict_caches(spark)
                old = similarity._SALT_MAX_OCC
                if cap is not None:
                    similarity._SALT_MAX_OCC = cap
                try:
                    t0 = time.time()
                    n, h = _out_hash(qs[key](spark, args.sf_dir))
                    res[mode] = {
                        "rows": n,
                        "hash": h,
                        "wall": round(time.time() - t0, 1),
                    }
                finally:
                    similarity._SALT_MAX_OCC = old
            res["equal"] = (
                res["engaged"]["rows"] == res["dormant"]["rows"]
                and res["engaged"]["hash"] == res["dormant"]["hash"]
            )
            out[key] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
