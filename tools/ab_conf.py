"""Interleaved same-session conf A/B — the honest instrument on a
breathing host (SCALE.md r16 adjudication: walls inflate ±40-200%
uniformly on minute timescales, so cross-draw comparisons are void;
alternating A/B reps inside ONE session cancel the host mode).

For each named query key, alternates reps between conf value A and
conf value B (``--conf key=valA,valB``; multiple --conf flags flip
together as one treatment), evict_caches before every rep, bench's
sum(hash(*)) consumer, scalar host canary at every boundary so each
rep carries its own host-speed context.

Usage:
    python tools/ab_conf.py --conf spark.sql.files.openCostInBytes=65536,4194304 \
        q_stream_static_join q_win_rank --reps 4
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
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    evict_caches,
    get_spark,
)


def _consume(df) -> None:
    df.select(F.sum(F.hash(*[F.col(c) for c in df.columns]))).collect()


def _canary() -> float:
    t = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return round(time.time() - t, 3)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("keys", nargs="+")
    ap.add_argument(
        "--conf",
        action="append",
        required=True,
        help="sqlconf=valA,valB — all --conf flags flip together",
    )
    ap.add_argument("--reps", type=int, default=4, help="reps PER ARM")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    arms: dict[str, tuple[str, str]] = {}
    for c in args.conf:
        k, vals = c.split("=", 1)
        va, vb = vals.split(",", 1)
        arms[k] = (va, vb)

    spark = get_spark("ab_conf")
    qs = registry.all_queries()

    out: dict[str, dict] = {}
    for name in args.keys:
        fn = qs[name]
        # untimed warm-up under each arm so codegen/page-cache state is
        # established for both plans before any timed rep
        for arm in (0, 1):
            for k, v in arms.items():
                spark.conf.set(k, v[arm])
            evict_caches(spark)
            _consume(fn(spark, args.sf_dir))
        reps_a: list[float] = []
        reps_b: list[float] = []
        canaries: list[float] = [_canary()]
        for _ in range(args.reps):
            for arm, sink in ((0, reps_a), (1, reps_b)):
                for k, v in arms.items():
                    spark.conf.set(k, v[arm])
                evict_caches(spark)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:arm{arm}"
                )
                t0 = time.time()
                _consume(fn(spark, args.sf_dir))
                sink.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            canaries.append(_canary())
        out[name] = {
            "a_reps": reps_a,
            "b_reps": reps_b,
            "a_median": _median(reps_a),
            "b_median": _median(reps_b),
            "b_over_a": round(
                _median(reps_b) / max(_median(reps_a), 1e-9), 3
            ),
            "canaries": canaries,
        }
        print(f"{name}: {json.dumps(out[name])}", file=sys.stderr)
    print(
        json.dumps(
            {"sf_dir": args.sf_dir, "conf": arms, "reps_per_arm": args.reps,
             "results": out}
        )
    )


if __name__ == "__main__":
    main()
