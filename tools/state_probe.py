"""Streaming STATE-SIZE scaling probe: does retained state grow with
the rate, or with the stream?

The time-based probes (scale_probe --pairs / streaming PROBES) measure
wall-clock; this one measures the quantity that actually kills a
100 TB streaming job — state-store ROWS — by reading the checkpoint
back through the statestore source after an AvailableNow run on
id-offset replicas (users and events multiply K×, the event-time range
is fixed). Two operators:

  - symmetricHashJoin (the r13 introspection surface): the
    click→purchase interval join buffers each side until the watermark
    passes its match horizon. Claim: retained rows per store scale ~K
    (rate × fixed horizon), NOT with stream length — the property that
    distinguishes a viable streaming join from one whose RocksDB grows
    until the job dies. Both sides' keyWithIndexToValue row counts and
    the per-partition max share (skew) are printed per K.
  - sessionWindowStateStoreSaveExec: session state is O(users ×
    sessions); id-offset replicas multiply users, so rows scale ~K by
    construction — the control row that proves the harness measures
    what it claims.

Usage: python tools/state_probe.py [K ...]   (default 1 10 100)
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.file_stream import (
    run_stream,
    stream_table,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.streaming.jobs import (
    click_purchase_join_plan,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.streaming.state_inspect import (
    partition_skew,
    read_state,
    state_metadata,
)
from scale_probe import build_replica


def _retained_ckpt() -> str:
    return os.path.join(
        tempfile.gettempdir(), "aub_ckpt",
        f"state_probe_{uuid.uuid4().hex[:10]}",
    )


def join_checkpoint(spark, sf_dir: str) -> str:
    """The SAME plan q_stream_stream_join serves (one shared builder —
    r13 review), run through run_stream with a retained checkpoint."""
    ckpt = _retained_ckpt()
    run_stream(
        click_purchase_join_plan(spark, sf_dir),
        "append",
        timeout_sec=600,
        checkpoint_dir=ckpt,
    )
    return ckpt


def session_checkpoint(spark, sf_dir: str) -> str:
    agg = (
        stream_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    ckpt = _retained_ckpt()
    run_stream(agg, "complete", timeout_sec=600, checkpoint_dir=ckpt)
    return ckpt


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    dirs = {k: build_replica(k) for k in ks}
    spark = get_spark("state_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, dict[int, int]] = {}
    skews: dict[int, float] = {}
    for k in sorted(ks):
        ck_j = join_checkpoint(spark, dirs[k])
        meta = {m.stateStoreName for m in state_metadata(spark, ck_j).collect()}
        assert "left-keyWithIndexToValue" in meta, meta
        for store in ("left-keyWithIndexToValue", "right-keyWithIndexToValue"):
            n = read_state(spark, ck_j, store_name=store).count()
            rows.setdefault(f"join {store}", {})[k] = n
        skews[k] = float(
            partition_skew(
                read_state(spark, ck_j, store_name="left-keyToNumValues")
            )
            .limit(1)
            .collect()[0]
            .share
        )
        ck_s = session_checkpoint(spark, dirs[k])
        rows.setdefault("session window", {})[k] = read_state(
            spark,
            ck_s,
            operator_id=[
                m.operatorId
                for m in state_metadata(spark, ck_s).collect()
                if m.operatorName == "sessionWindowStateStoreSaveExec"
            ][0],
        ).count()
        print(f"# K={k} done", file=sys.stderr)
    kmax, kmin = max(ks), min(ks)
    k2 = sorted(ks)[-2] if len(ks) > 1 else kmin
    print("\n| state store | " + " | ".join(f"{k}× rows" for k in sorted(ks))
          + " | exponent | top-partition share |")
    print("|---|" + "---|" * (len(ks) + 2))
    for name, ts in rows.items():
        ta, tb = ts[k2], ts[kmax]
        exp = (math.log(tb / ta) / math.log(kmax / k2)
               if ta > 0 and kmax > k2 else float("nan"))
        cells = " | ".join(str(ts[k]) for k in sorted(ks))
        share = f"{skews[kmax]:.4f}" if name.startswith("join left") else ""
        print(f"| {name} | {cells} | {exp:.2f} | {share} |")


if __name__ == "__main__":
    main()
