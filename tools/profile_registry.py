"""Full-registry profiling sweep for the optimization rounds.

For EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1):

- time build+consume with the bench's sum(hash(*)) consumer (the same
  boundary bench.py measures — full plan, no driver row transfer),
  cold (evict_caches before each timed run, after one untimed warm-up
  of the whole set has populated JVM/codegen/page-cache state);
- optionally dump `.explain("formatted")` to a plans directory
  (--plans-dir), one `<key>_<tag>.txt` per query, so before/after plan
  evidence is reviewable without a Spark session.

The bench keys already have methodology-v4 numbers; this sweep exists
to rank the OTHER ~120 keys, which the driver also measures, and to
catch any pathological plan the headline/extended sets never covered.

Usage:
    python tools/profile_registry.py                      # time everything
    python tools/profile_registry.py --plans-dir plans/r16 --tag before
    python tools/profile_registry.py --keys q_pivot,q_agg_cube --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.plans import (
    formatted_plan,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    evict_caches,
    get_spark,
)


def _consume(df) -> None:
    df.select(F.sum(F.hash(*[F.col(c) for c in df.columns]))).collect()


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keys", default=None, help="comma-separated subset (default: all)")
    ap.add_argument("--reps", type=int, default=1, help="timed cold reps per key (median reported)")
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') per key here")
    ap.add_argument("--tag", default="before", help="suffix for plan files: <key>_<tag>.txt")
    ap.add_argument("--no-warmup", action="store_true", help="skip the untimed first pass per key")
    args = ap.parse_args()

    spark = get_spark("profile_registry")
    qs = registry.all_queries()
    keys = args.keys.split(",") if args.keys else list(qs)
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in keys:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        try:
            if args.plans_dir:
                df = qs[name](spark, args.sf_dir)
                with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(formatted_plan(df))
            if not args.no_warmup:
                _consume(qs[name](spark, args.sf_dir))
            reps = []
            for _ in range(args.reps):
                evict_caches(spark)
                t0 = time.time()
                _consume(qs[name](spark, args.sf_dir))
                reps.append(round(time.time() - t0, 3))
            results[name] = round(_median(reps), 3)
            print(f"{name}: {results[name]} {reps if len(reps) > 1 else ''}", file=sys.stderr)
        except Exception as exc:  # record and continue — a sweep, not a gate
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name}: ERROR {errors[name]}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)
    ranked = dict(sorted(results.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": args.sf_dir, "reps": args.reps,
                      "total_sec": round(sum(results.values()), 3),
                      "timings": ranked, "errors": errors}))


if __name__ == "__main__":
    main()
