"""Shuffle-volume audit: measured shuffle read/write bytes per query.

SCALE.md's core claims are about SHUFFLE SHAPE — "the shuffle carries
16-byte keys, not documents", "window input is O(groups)", "grid is
calendar-bounded". This tool measures them: it runs each headline +
extended query at $SPARK_GRAFT_SF_DIR on a UI-enabled session and sums
per-stage shuffle write / read bytes and peak single-stage input bytes
via the Spark UI REST API, printing a markdown table for SCALE.md.

A query whose shuffle bytes rival its input bytes is moving raw data
through an exchange — the first thing to fix before any 100 TB run.

Usage: python tools/shuffle_audit.py [query ...]   (default: bench set)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stages(spark) -> list[dict]:
    # Read the BOUND UI address + app id from the session itself: if
    # another Spark UI already holds 4040, this session binds 4041 and a
    # hardcoded localhost:4040 would silently sum a FOREIGN application's
    # stages (typically reporting zero new stages per query).
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("session has no UI — run in a fresh process")
    app_id = spark.sparkContext.applicationId
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
    )
    assert any(a["id"] == app_id for a in apps), (app_id, apps)
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )


def _fmt(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def main() -> None:
    from bench import EXTENDED, HEADLINE

    names = sys.argv[1:] or (HEADLINE + EXTENDED)
    spark = get_spark(
        "shuffle_audit",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spark.conf.get("spark.ui.enabled") != "true":
        raise SystemExit(
            "session pre-existed with UI disabled — run in a fresh process"
        )
    qs = registry.all_queries()
    print(
        "| query | shuffle write | shuffle read | input "
        "| mem spill | disk spill | rows |"
    )
    print("|---|---|---|---|---|---|---|")
    from pyspark.sql import functions as F

    for name in names:
        if name.startswith("q_stream_"):
            continue  # streaming: state-store traffic, not exchanges
        seen = {s["stageId"] for s in _stages(spark)}
        # ONE honest consuming pass yields both the plan metrics and
        # the row count (ADVICE r12 — the count() re-run doubled audit
        # wall time and leaned on count() blocking for stage
        # isolation): same sum(hash(*)) consumer as bench._consume —
        # computing every output column so Catalyst can't eliminate
        # joins or prune expensive projections (the r10 bench-consumer
        # bug under-measured shuffles exactly that way) — with
        # count(1) folded into the same single-row aggregate.
        df = qs[name](spark, SF_DIR)
        row = df.select(
            F.sum(F.hash(*[F.col(c) for c in df.columns])),
            F.count(F.lit(1)),
        ).collect()[0]
        n = row[1]
        new = [s for s in _stages(spark) if s["stageId"] not in seen]
        w = sum(s.get("shuffleWriteBytes", 0) for s in new)
        r = sum(s.get("shuffleReadBytes", 0) for s in new)
        inp = sum(s.get("inputBytes", 0) for s in new)
        # spills: non-zero here means a partition outgrew its memory
        # budget — the exact signal that caught the 1000×-replica
        # window sort before raising initialPartitionNum
        ms = sum(s.get("memoryBytesSpilled", 0) for s in new)
        ds = sum(s.get("diskBytesSpilled", 0) for s in new)
        print(
            f"| {name} | {_fmt(w)} | {_fmt(r)} | {_fmt(inp)} "
            f"| {_fmt(ms)} | {_fmt(ds)} | {n} |"
        )


if __name__ == "__main__":
    main()
