"""Measured scaling probe: how do the plan-bound operators actually
scale when the corpus grows 1× → 10×?

SCALE.md's design notes argue each plan is linear (or output-bound);
this tool MEASURES it, replacing argument with evidence ("measure,
don't guess"). It replicates the sf0.1 `documents` / `embeddings` /
`events` tables K× (id-offset copies, text/vectors unchanged) into
/tmp, runs a fixed set of PLAN-BOUND queries at each K, and prints a
markdown table of wall-times plus the fitted scaling exponent
log(t_K / t_1) / log(K) for the largest K.

Only plan-bound queries are probed: output-bound pair joins (jaccard,
containment, near-dup, editdist) are excluded BY DESIGN — replicating
the corpus K× turns every document into a K-way exact-duplicate group,
so their true-pair OUTPUT grows ~K², and measuring them on a replica
corpus would report the fixture's artifact, not the plan's shape.

Methodology (first attempt measured pure noise — negative exponents):
local-mode fixed overhead (JIT, scheduler, first-parquet-footer reads)
is ~0.3–6 s per query, which swamps data cost at small K. So the probe
(a) WARMS UP by running every probe query once at the smallest K and
discarding, (b) uses decade multipliers (default 1×/10×/100× — 500 k
docs / 200 k vectors / 10 M events at the top), and (c) takes the MIN
of 2 reps per cell (min, not mean: noise on this rig is one-sided —
stragglers, never speedups).

Usage: python tools/scale_probe.py [K ...]   (default: 1 10 100)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/aub_scale_probe"
_OFF = 100_000_000  # id offset per replica — far above any fixture id

# (table, id column(s) to offset). Text/vectors/timestamps unchanged:
# the probe measures plan shape, not data variety.
_TABLES = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}

# Plan-bound probe set (query key -> why it should be linear):
PROBES = {
    "q_dedup_exact": "hash-groupBy on md5(text)",
    "q_text_tokens": "map-only tokenize + agg",
    "q_text_quality": "map-only quality scores",
    "q_text_fingerprint": "map-only rolling hash",
    "q_sim_ann": "16-table LSH bucket probe, fixed probe set",
    "q_sim_ivf": "centroid routing + probed cells, fixed probe set",
    "q_embed_pq": "map-only PQ encode",
    "q_sample_hash": "hash-bucket filter",
    "q_time_rollup": "partial agg to O(hours×types) + calendar grid",
    "q_sessionize_batch": "per-user window, user-partitioned",
    # r6 addition, with the funnel's promotion to the bench headline:
    # per-user conditional-min windows after one shuffle on user_id
    "q_funnel_conversion": "per-user ordered-step windows, user-partitioned",
}


def build_replica(k: int) -> str:
    # Replica dirs are keyed by the BASE fixture path (hashed into the
    # dir name) and built tmp-then-atomic-rename: a bare /tmp/...​/x{k}
    # reused unconditionally could be a partial dir from an interrupted
    # COPY, or built from a DIFFERENT SPARK_GRAFT_SF_DIR — either one
    # silently skews the published scaling exponents.
    import hashlib

    base_tag = hashlib.md5(
        os.path.abspath(BASE_SF).encode()
    ).hexdigest()[:8]
    out = os.path.join(WORK, f"{base_tag}_x{k}")
    if os.path.isdir(out):
        return out  # rename is atomic, so an existing dir is complete
    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    con = duckdb.connect()
    for table, id_cols in _TABLES.items():
        src = os.path.join(BASE_SF, f"{table}.parquet")
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        proj = ", ".join(
            f"{c} + i * {_OFF} AS {c}" if c in id_cols else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{src}', range({k}) t(i)) "
            f"TO '{tmp}/{table}.parquet' (FORMAT PARQUET)"
        )
    # small dims pass through untouched (some queries join them)
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
        src = os.path.join(BASE_SF, f"{table}.parquet")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(tmp, f"{table}.parquet"))
    try:
        os.rename(tmp, out)
    except OSError:
        # Either we lost a race to a concurrent builder (theirs won and
        # `out` now exists — fine) or the rename genuinely failed
        # (cross-device WORK dir, permissions). Only the first case may
        # be swallowed: returning a path that does not exist would
        # surface later as a confusing parquet-read error (ADVICE r6).
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(out):
            raise
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    probes = PROBES
    subset = os.environ.get("SCALE_PROBE_QUERIES")
    if subset:  # e.g. SCALE_PROBE_QUERIES=q_dedup_exact,q_text_tokens
        probes = {n: PROBES[n] for n in subset.split(",")}
    dirs = {k: build_replica(k) for k in ks}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # wide shuffles for the big replicas — measured 3.3× on the 1000×
    # window sort (see session.py initialPartitionNum note); AQE
    # coalesces the small-K runs back down
    os.environ.setdefault("SPARK_GRAFT_INITIAL_PARTITIONS", str(cpus * 8))
    spark = get_spark("scale_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    kmin = min(ks)
    for name in probes:  # warmup: JIT + parquet footers, discarded
        qs[name](spark, dirs[kmin]).count()
    times: dict[str, dict[int, float]] = {}
    for name in probes:
        times[name] = {}
        for k in ks:
            reps = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, dirs[k]).count()
                reps.append(time.time() - t0)
            times[name][k] = round(min(reps), 2)
    kmax = max(ks)
    # exponent fitted between the two LARGEST Ks — the decade where
    # data cost dominates fixed overhead
    k2 = sorted(ks)[-2] if len(ks) > 1 else kmin
    print(f"\n| query | " + " | ".join(f"{k}× (s)" for k in ks)
          + " | exponent | plan |")
    print("|---|" + "---|" * (len(ks) + 2))
    for name, ts in times.items():
        ta, tb = ts[k2], ts[kmax]
        exp = (math.log(tb / ta) / math.log(kmax / k2)
               if ta > 0 and kmax > k2 else float("nan"))
        row = " | ".join(f"{ts[k]:.2f}" for k in ks)
        print(f"| {name} | {row} | {exp:.2f} | {probes[name]} |")
    # GB-scale replicas evict the fixture page cache and leave the rig
    # under memory-compaction load for minutes — measured to inflate a
    # subsequent bench ~1.5×. Drop them unless explicitly kept.
    if os.environ.get("SCALE_PROBE_KEEP") != "1":
        for k in ks:
            if k >= 100:
                shutil.rmtree(dirs[k], ignore_errors=True)


if __name__ == "__main__":
    main()
