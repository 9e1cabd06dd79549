"""Quiet-rig watch-key medians, with host canaries interleaved.

The round-close discipline pins per-key quiet medians for the keys a
round changed (SCALE.md watch bands). A full bench draw is the wrong
instrument for that when the rig is breathing — it serializes ~30
keys behind warm-ups, so a minutes-scale contention phase lands on
whichever keys it lands on, and a band breach can't be attributed
(r16 close: seven draws, headline 11.5-17.5 s, uniform per-key
inflation with zero plan changes). This probe measures ONLY the named
keys, median-of-N with bench-identical methodology (untimed warm-up
pass, evict_caches cold reps, the sum(hash(*)) consumer), and times
the bench's scalar-CPU canary at every key boundary so each median
carries its own host-speed context.

Usage:
    python tools/quiet_medians.py q_dedup_embed_cosine q_dedup_near
    python tools/quiet_medians.py --reps 7 --sf-dir /root/testdata/sf0.1 q_dedup_simhash

Prints one JSON object: per-key rep lists, medians, and the canary
series. Keys default to the r16 watch set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "q_dedup_embed_cosine",
    "q_dedup_semantic",
    "q_dedup_simhash",
    "q_dedup_near",
    "q_dedup_ngram_jaccard",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    keys = args.keys or DEFAULT_KEYS

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        registry,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        evict_caches,
        get_spark,
    )
    from bench import (
        _REPS_KEEP_CACHE,
        _consume as consume,
        _host_canary,
        _median,
    )

    spark = get_spark("quiet_medians")
    qs = registry.all_queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    qs["q_agg_count_by"](spark, args.sf_dir).count()

    out: dict = {
        "sf_dir": args.sf_dir,
        "n_reps": args.reps,
        "canary_start_sec": _host_canary(),
        "reps": {},
        "median": {},
        "canary_after_sec": {},
    }
    for name in keys:
        consume(qs[name](spark, args.sf_dir))  # untimed warm-up
        reps = []
        for _ in range(args.reps):
            # same cold-rep rule as bench.py's extended loop: keys in
            # _REPS_KEEP_CACHE (q_dedup_clusters) time CC over the warm
            # session memo — evicting would silently switch what the
            # median measures to pairs+CC (bench.py's in-line comment)
            if name not in _REPS_KEEP_CACHE:
                evict_caches(spark)
            t0 = time.time()
            consume(qs[name](spark, args.sf_dir))
            reps.append(round(time.time() - t0, 3))
        out["reps"][name] = reps
        out["median"][name] = round(_median(reps), 3)
        out["canary_after_sec"][name] = _host_canary()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
