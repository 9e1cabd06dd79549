"""LSH candidate-volume audit: is the adaptive bucket width actually
candidate-LINEAR, and what quadratic does it remove?

The r12 fix (similarity.n_planes_for) argued q_dedup_embed_cosine's
cost is candidate-linear once per-table occupancy pins at
_TARGET_BUCKET — but the measured 1.22 exponent conflated the 5→8
plane transition with the asymptote (VERDICT r12 item 5). Time
exponents can't decompose that (any 10× decade crosses ~3.3 adaptive
widths, and a WIDTH-STABLE decade is Θ(n²/buckets) in candidates by
arithmetic — there is no geometry under which a fixed width is linear
across a decade). Candidate COUNTS can: the self-join's pre-dedup work
is exactly Σ_{table,bucket} C(occupancy, 2), computable from a
groupBy(tbl, bucket).count() with no pair join at all. This tool
prints, per sign-replica scale:

  - the adaptive width and measured per-table occupancy,
  - total candidate pairs and candidates PER VECTOR under the adaptive
    width — the claim is the per-vector number stays ≤ about
    _N_TABLES · _TARGET_BUCKET / 2 (= 2000) at every scale, which IS
    candidate-linearity;
  - the same numbers with the width PINNED to the smallest scale's
    value (the fixed-geometry control): per-vector candidates grow ~K
    per decade — the quadratic the adaptive rule removes, measured as
    volume rather than re-paying the r12 probe's 1261 s wall time.

Usage: python tools/lsh_candidate_audit.py [K ...]   (default 10 100 1000)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.functions.similarity import (
    _N_TABLES,
    _TARGET_BUCKET,
    bucketed_all_tables,
    n_planes_for,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)
from scale_probe import build_sign_replica


def audit(spark, sf_dir: str, n_planes: int) -> dict:
    v = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    occ = (
        bucketed_all_tables(v, n_planes=n_planes)
        .groupBy("tbl", "bucket")
        .count()
    )
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
        F.max("count").alias("occ_max"),
        (F.sum("count") / F.countDistinct("tbl", "bucket")).alias("occ_avg"),
        F.sum("count").alias("total_rows"),
    ).collect()[0]
    # corpus size for free from the aggregate already computed (every
    # vector lands in exactly one bucket per table) — no second scan
    # (r13 review: the audit was re-paying the eager count this change
    # removed from the query constructors)
    n = int(row.total_rows) // _N_TABLES
    return {
        "n": n,
        "planes": n_planes,
        "occ_avg": round(float(row.occ_avg), 1),
        "occ_max": int(row.occ_max),
        "pairs": int(row.pairs),
        "per_vec": round(row.pairs / n, 1),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [10, 100, 1000]
    base = os.environ.get("SCALE_PROBE_PAIRS_BASE", "/root/testdata/sf0.01")
    dirs = {k: build_sign_replica(base, k) for k in ks}
    spark = get_spark("lsh_candidate_audit")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = None  # smallest scale's adaptive width = the control width
    print(
        "| K | vectors | width | occ avg/max | candidates | cand/vec "
        "| control width | control cand/vec |"
    )
    print("|---|---|---|---|---|---|---|---|")
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
        table_rows,
    )

    for k in sorted(ks):
        # footer read, not a scan — the same statistic the width rule
        # itself consumes
        w = n_planes_for(table_rows(spark, dirs[k], "embeddings"))
        if pinned is None:
            pinned = w
        a = audit(spark, dirs[k], w)
        c = audit(spark, dirs[k], pinned) if w != pinned else a
        print(
            f"| {k} | {a['n']} | {a['planes']} | {a['occ_avg']}/{a['occ_max']} "
            f"| {a['pairs']} | {a['per_vec']} | {pinned} | {c['per_vec']} |"
        )
    bound = _N_TABLES * _TARGET_BUCKET / 2
    print(
        f"\nuniform-occupancy reference: cand/vec ~ {bound:.0f} "
        f"(_N_TABLES*_TARGET_BUCKET/2); the measured excess over it is "
        f"the bucket-occupancy SKEW factor E[occ²]/E[occ]² (read it off "
        f"occ max vs avg above) — the honest asymptote is "
        f"O(n · target · skew), so a corpus whose embeddings cluster "
        f"hard enough to blow the skew up needs more tables at a "
        f"narrower target, not a wider single code."
    )


if __name__ == "__main__":
    main()
