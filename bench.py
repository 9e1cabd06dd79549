"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the operator families that dominate a 100 TB run: wide
agg, multiway join, window, top-k, as-of, text tokenize, tfidf, dedup,
similarity (brute-force AND the bucketed ANN path), one stateful
streaming job (stream-static join) so the state-store path has a tracked
wall-time, and one behavior-analytics query (ordered-step funnel — the
reference's user-analytics workload generalized). Each query executes
to completion via ``_consume`` — a sum-of-hash over every output
column, so the FULL plan materializes (a bare count() lets Catalyst
eliminate outer joins — six keys under-measured through r9) while
nothing but one row reaches the driver.

EXTENDED set = the two most expensive LLM-pipeline plans (exact jaccard
self-join and connected components), tracked separately because on this
deliberately self-similar fixture their runtime is OUTPUT-bound — 8.9 M
true pairs = 71% of all doc pairs at sf0.1 (SCALE.md) — so folding them
into the headline total would swamp the round-over-round signal of the
other 15 plans. Their wall-times land in "extended"/"extended_total_sec"
of the same JSON line.

Methodology v3 (r15, VERDICT r14 item 2): the extended set gets the
same rig-proofing the headline set got in v2 — an UNTIMED warm-up pass
(ratio reported as `warmup_ext_over_total`) plus median-of-3 for the
four volatile keys BENCH_r14's dirty draw spiked (stream_session,
simhash, semantic, vocab). Extended single-shot numbers read slightly
LOWER than the v1/v2 series (the first-draw cold component is now
absorbed by the warm-up instead of landing in the one recorded draw);
SCALE.md r15 records the version break.

Methodology v4 (r16, VERDICT r15 item 1): the headline settle gate
ACTS instead of only flagging. Four consecutive driver draws recorded
flagged-dirty headline totals as-is (r12 load 5.22 … r15
warmup_over_median 1.65 + load 10.28); now, when the gate trips
(`warmup_over_median` > _SETTLE_GATE after the timed loop), the full
timed headline loop runs ONCE more and the file reports the better
pass, with both passes' totals recorded under `headline_retry` and a
top-level `dirty` verdict: false when the two passes agree within the
gate (the reported number is corroborated even though the start was
dirty), true when they still disagree (whichever is lower may remain
contaminated — compare with the quiet-rig close). Headline values are
unchanged on quiet rigs (the retry never runs there), so v4 is
v3-comparable for clean draws.

Host canaries (r16 close): retry agreement corroborates
REPRODUCIBILITY, not host speed — the r16 close recorded a draw whose
two passes agreed to 1.00 at a total 41% above the same day's best
draw, on a rig with load 0.0 and <1% steal. Adjudicating that took a
controlled A/B (same 17 keys, 1.08-1.44x uniform inflation, zero
headline plan changes) plus two host probes, so the file now carries
both probes itself: `host_canary_start_sec`/`host_canary_end_sec`
time a fixed single-thread 20M-iteration integer loop (~1.2 s
steady-state on this rig; function-scoped — module-level timings of
the same loop read ~2x from dict-based global access, an artifact
that briefly misread as a host phase during the r16 close), and
`host_canary_bw_gbps_start`/`_end` time a sequential numpy sum over
an 800 MB array. The pair separates the failure modes: scalar canary
degraded = CPU-level contention (steal, sharing); scalar clean but
bandwidth/walls degraded = shared-memory-bandwidth contention — the
mode this rig's ±40% multi-thread breathing showed at the r16 close,
which load, steal, and scalar CPU all read clean through. Costs ~4 s
against a ~8 min run.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
    get_spark,
)

HEADLINE = [
    "q_agg_sum_avg",
    "q_agg_count_by",
    "q_join_multiway",
    "q_join_asof",
    "q_win_running",
    "q_topk_per_group",
    "q_agg_grouping_sets",
    "q_text_tokens",
    "q_text_tfidf",
    "q_dedup_exact",
    "q_sim_topk_bruteforce",
    "q_sim_ann",
    "q_join_range_binned",
    "q_stream_static_join",
    # round-6 addition (VERDICT r5 item 8), tracked from its first
    # round: ordered-step funnel conversion — the reference's actual
    # user-analytics workload generalized (per-user event sequencing:
    # one shuffle on user_id, conditional min-over-window per step)
    "q_funnel_conversion",
    # round-8 addition, tracked from its first round (like-for-like
    # comparisons vs r7 should drop this row): activity-pattern
    # similarity — hourly-profile pivot + broadcast-probe two-phase
    # cosine top-k over the events table
    "q_sim_timeseries",
    # round-9 addition, tracked from its registration round
    # (like-for-like vs r8 drops this row): last-touch attribution —
    # one shuffle on user_id, ignore-nulls running-last window,
    # O(channels) final aggregate with exact-decimal revenue
    "q_event_attribution",
]

EXTENDED = [
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
    # round-5 addition: the containment (overlap-coefficient) join is
    # the third output-bound pair plan — tracked from its first round
    "q_dedup_containment",
    # round-3 training-pipeline additions whose plans shuffle the
    # corpus (decontaminate: gram flatMap + broadcast semi-join;
    # unigram LM: vocab agg + exchange-reused word join; packing:
    # two-phase prefix sum) — tracked here so their wall-times are
    # visible without disturbing the 14-query headline series.
    "q_text_decontaminate",
    "q_text_unigram_logprob",
    "q_pack_sequences",
    # late-round-5 additions, tracked from their first round: span-level
    # exact dedup (shingle postings — corpus-sized explode + two
    # shuffles), SemDeDup (centroid assignment + within-cell pair
    # scan), vocabulary induction (bucketed two-phase prefix sum).
    "q_dedup_substring",
    "q_dedup_semantic",
    "q_text_vocab",
    # latest-round-5 addition, tracked from its first round: the
    # q-gram-blocked edit-distance join (prefix equi-join + banded
    # levenshtein verify; ~10 s clean at sf0.1, rig-noise band to ~45 s)
    "q_dedup_editdist",
    # round-7 additions, tracked from the round their shared-subtree
    # persists landed (VERDICT r6 items 2-3): the SimHash band join and
    # the LSH embedding near-dup — visibility that the 20/14-scan
    # recompute fix holds round-over-round.
    "q_dedup_simhash",
    "q_dedup_embed_cosine",
    # round-13 addition (VERDICT r12 item 7), tracked from its first
    # round: the session-window job through the r12 foreachBatch→
    # parquet harness — the streaming-state path whose scale fix
    # (exponent 1.06 → 0.47 at 100× users) previously had no
    # round-over-round number. Single-shot: its wall is dominated by
    # micro-batch orchestration (trigger setup + checkpoint + sink
    # read-back), which the variance study measured as narrow-banded;
    # SCALE.md r13 notes the expected band.
    "q_stream_session",
]

def _check_extended_order() -> None:
    """ADVICE r12/r13: _REPS_KEEP_CACHE's correctness for
    q_dedup_clusters depends on jaccard directly preceding it (the memo
    it measures CC over) with no evicting multi-rep key between them.
    An explicit RuntimeError (not a module-level ``assert``, which
    ``python -O`` strips and which fired on every import of this module
    from tools) — called from main() so the invariant guards exactly
    the runs it protects."""
    if (
        EXTENDED.index("q_dedup_clusters")
        != EXTENDED.index("q_dedup_ngram_jaccard") + 1
    ):
        raise RuntimeError(
            "q_dedup_clusters must directly follow q_dedup_ngram_jaccard "
            "(warm memo) — see _REPS_KEEP_CACHE"
        )


N_REPS = 3  # headline repetitions; reported value = median total

# Contamination threshold shared by every settle gate in the file:
# warm-up ≳1.3× the reported number means the draw started on a
# cold/contended rig (the empirical line from the r12-r15 dirty-draw
# adjudications — quiet rigs read 0.9-1.2). v4 makes the HEADLINE gate
# act on it (auto-retry); the extended gate still only flags, because
# a full extended re-run (~2× the bench wall) buys less than the
# median-of-3 reps the volatile keys already get.
_SETTLE_GATE = 1.3

# Extended queries whose sf0.1 wall-time band is too wide for a
# single-shot number to be comparable round-over-round. Containment's
# recorded band is 17–44.7 s (SCALE.md variance study) — the widest in
# the suite — so one draw cannot distinguish a real regression from rig
# noise; median-of-3 pins it (VERDICT r5 item 7, accepting ~2 extra
# runs of this one query per bench). ngram_jaccard and embed_cosine
# joined r12 after an isolation study measured first-draw swings of
# 2.7×/4.0× on a fresh-boot rig (7.4–19.8 s / 3.2–12.6 s; SCALE.md r12
# variance note) — large enough to read as a phantom regression of the
# two most-watched pair plans. substring and decontaminate joined r13
# after BENCH_r12 drew exactly that phantom: 8.61 s / 4.30 s on a
# load-5.22 rig (1.73× / 1.70× r11) with zero code change, both back
# at r11 levels on the quiet-rig closing bench (VERDICT r12 item 3).
# Remaining single-shot extended plans are output-bound and
# comparatively narrow-banded TODAY (editdist 3.6–3.7 s in the same
# study).
# q_dedup_clusters CANNOT be multi-repped under eviction: its declared
# semantics is "CC rounds over the session-persisted jaccard pair
# memo" (see the pairs→clusters order note below), and evict_caches
# before rep 2 would drop that memo, silently switching what the
# median measures to pairs+CC. It stays single-shot; jaccard's
# multi-rep is memo-safe because each rep re-persists the memo, so the
# LAST rep leaves it warm exactly as the single-shot run did.
# The Spark cache is CLEARED before each rep (ADVICE r6 medium): the
# query's internal persist() survives across reps via CacheManager
# canonical-plan matching, so without the clear, reps 2+ measure a
# warm-cache run (BENCH_r06 reps 5.901/4.088/3.616 show the systematic
# cold->warm drop) and the median conflates plan cost with cache reuse.
# With the clear, every rep is a cold end-to-end run — the number a
# fresh pipeline stage would pay. Safe here: the clear runs after
# q_dedup_clusters has already consumed the memoized jaccard pair
# table, and every later extended query builds (and re-persists) its
# own relations.
EXTENDED_REPS = {
    "q_dedup_containment": 3,
    "q_dedup_ngram_jaccard": 3,
    "q_dedup_embed_cosine": 3,
    "q_dedup_editdist": 3,
    "q_dedup_clusters": 3,
    # r13 (VERDICT r12 item 3): the two keys the loaded r12 driver rig
    # drew 1.7× high with zero code change — the round's variance study
    # had proven first draws run 2–4× but left these single-shot, so
    # the phantom regression had no median to correct it.
    "q_dedup_substring": 3,
    "q_text_decontaminate": 3,
    # r15 (VERDICT r14 item 2): the four keys BENCH_r14's contaminated
    # draw spiked 14–182% while the same-day quiet rig read them
    # IMPROVING — all were single-shot, so the v2 settle gate could
    # flag the dirty draw but nothing in the file corrected it.
    # q_stream_session's wall is micro-batch orchestration with a
    # documented 2.7× first-draw band (SCALE.md r13); each rep runs a
    # fresh streaming query (new checkpoint/sink dirs), so a median is
    # honest. Remaining single-shot keys (unigram_logprob,
    # pack_sequences) stayed inside their bands even on the r14 dirty
    # draw and are now additionally covered by the extended warm-up.
    "q_stream_session": 3,
    "q_dedup_simhash": 3,
    "q_dedup_semantic": 3,
    "q_text_vocab": 3,
}

# Multi-rep keys that must NOT evict between reps. q_dedup_clusters'
# declared number is "CC rounds over the warm session-persisted
# jaccard pair memo" (the staged-pipeline cost); evicting would drop
# the memo and silently remeasure pairs+CC. Repetition without
# eviction is still honest here: connected_components truncates each
# round with localCheckpoint (executor storage, freed per invocation,
# never a CacheManager entry), so reps 2-3 re-run the full CC work —
# only the memo input stays warm, exactly as in rep 1.
_REPS_KEEP_CACHE = {"q_dedup_clusters"}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _host_canary() -> float:
    """Fixed single-thread CPU workload (~1.2 s steady-state on this
    rig). Pure-Python integer loop in function scope (locals, not
    globals — module-level runs ~2x on dict access): no allocation, no
    vector units, no page-cache dependence, so it reads scalar host
    CPU speed and nothing else."""
    t = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return round(time.time() - t, 3)


def _host_canary_bw() -> float | None:
    """Sequential-read memory bandwidth in GB/s: three numpy sums over
    an 800 MB array (first pass untimed — it pays the page faults).
    The probe that detects the contention mode the scalar canary is
    blind to (see module docstring); None if numpy is unavailable."""
    try:
        import numpy as np
    except ImportError:  # bandwidth field degrades, bench still runs
        return None
    a = np.ones(100_000_000)
    a.sum()
    t = time.time()
    for _ in range(3):
        a.sum()
    return round(3 * 0.8 / max(time.time() - t, 1e-9), 2)


def _consume(df) -> None:
    """Execute the query computing EVERY output column.

    ``.count()`` — the consumer through r9 — is NOT that: Catalyst
    eliminates a (left-)outer join under a count when the other side's
    join keys are provably distinct and none of its columns survive
    pruning, so six keys timed a cheaper plan than the one the driver's
    collect() executes (r10 census find; worst: q_dedup_semantic lost
    all 4 joins, q_dedup_simhash its whole banded candidate side).
    ``sum(hash(*))`` defeats the pruning at a one-row result cost —
    unlike collect(), it still excludes driver-side row transfer, which
    is the boundary a throughput number should stop at.  The r10
    BENCH discontinuity on the affected keys is documented in SCALE.md
    ("bench consumer fixed").
    """
    df.select(F.sum(F.hash(*[F.col(c) for c in df.columns]))).collect()


def emit(compact: dict, detail: dict) -> None:
    """Print the driver-contract output: per-rep detail to STDERR, the
    ONE compact JSON line to STDOUT — LAST, so a byte-limited tail
    capture always contains it whole (BENCH_r06.json recorded
    `parsed: null` when verbose blobs pushed the metric out of the
    window). tests/test_registry.py pins the shape."""
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(compact, separators=(",", ":")))


def main() -> None:
    _check_extended_order()
    # Load averages at bench START (1/5/15 min): this rig's walls read
    # 1.5-2x high for minutes after any 32-thread run (suite, sweep,
    # replica build — SCALE.md variance study), so the recorded numbers
    # let a reader judge whether a BENCH_r{N} draw was quiet-rig
    # (load1 ≲ 0.5) or contended before comparing rounds. load5/load15
    # added r14 (VERDICT r13 item 3): a low load1 with elevated
    # load5/15 is exactly the "big job just finished, page cache not
    # settled" state that produced the adjudicated bad load-0.15 draw.
    try:
        load1, load5, load15 = (round(x, 2) for x in os.getloadavg())
    except OSError:  # platform without getloadavg
        load1 = load5 = load15 = None
    canary_start = _host_canary()
    canary_bw_start = _host_canary_bw()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    qs = registry.all_queries()
    # warm the JVM + parquet footers once so timings measure the plans
    qs["q_agg_count_by"](spark, sf_dir).count()
    # ...and the Python worker pool: spark.python.worker.reuse (default
    # true) keeps workers alive across queries, so steady state — not
    # the one-time 32-process spawn (~2 s locally) — is what a cluster
    # pays per pandas-UDF query. Without this, q_sim_ann's timing is
    # ~70% interpreter fork, ~30% plan.
    _warm = F.pandas_udf(lambda s: s + 1, T.LongType())
    spark.range(1000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).count()
    # SETTLE GATE (r14, VERDICT r13 item 3 — methodology v2): one
    # UNTIMED pass of the full headline set before the timed reps, its
    # total recorded as `warmup_total_sec`. Two jobs in one: (a) it
    # absorbs the first-draw cold component (page cache, JIT, codegen
    # compilation) that r12/r13 showed runs 2-4× even at load ~0.15
    # when a previous 32-thread job's VM state hasn't settled, so the
    # timed reps measure plans, not rig history; (b) its RATIO to the
    # reported median is the contamination signal the BENCH file itself
    # now carries — warmup ≫ 1.3× median means the draw started on a
    # cold/contended rig, and a reader comparing rounds discounts
    # accordingly (with load1/5/15 giving the ambient-load side).
    # Headline medians read slightly LOWER than the v1 methodology
    # (rep 1 previously absorbed the cold start and the median
    # discarded it only when reps 2-3 agreed); SCALE.md r14 notes the
    # version break for round-over-round comparisons.
    t0 = time.time()
    for name in HEADLINE:
        _consume(qs[name](spark, sf_dir))
    warmup_total = round(time.time() - t0, 3)
    # N_REPS repetitions of the whole headline set (VERDICT r4 item 3):
    # the rig shows multi-x single-query outliers under background load
    # (SCALE.md variance study), so a single-shot total is one bad
    # scheduling window away from a phantom regression. Per-query value
    # = median across reps; headline value = median of per-rep totals.
    def _timed_headline_loop():
        loop_reps: list[dict[str, float]] = []
        for _ in range(N_REPS):
            rep: dict[str, float] = {}
            for name in HEADLINE:
                t0 = time.time()
                _consume(qs[name](spark, sf_dir))
                rep[name] = round(time.time() - t0, 3)
            loop_reps.append(rep)
        loop_timings = {
            name: round(_median([r[name] for r in loop_reps]), 3)
            for name in HEADLINE
        }
        loop_totals = [round(sum(r.values()), 3) for r in loop_reps]
        return loop_reps, loop_timings, loop_totals, round(
            _median(loop_totals), 3
        )

    per_rep, timings, rep_totals, total = _timed_headline_loop()
    # `warmup_over_median` keeps its historical meaning — did the rig
    # START dirty — so it is computed against the FIRST pass and never
    # recomputed against a retry total (warmup_total is fixed, so a
    # faster retry would inflate the ratio and misread as dirtier).
    warmup_over_median = round(warmup_total / max(total, 1e-9), 2)
    # HEADLINE RETRY (methodology v4, r16 — VERDICT r15 item 1): a
    # tripped gate triggers ONE full re-run of the timed loop; the
    # reported headline numbers are the better (lower-total) pass, and
    # both totals stay in the file so a reader can audit the choice.
    # `dirty` is the post-retry verdict: the two passes agreeing within
    # the gate corroborates the reported number (a cold START the
    # warm-up failed to fully absorb); disagreement means contention
    # persisted through at least one pass and even the better number
    # may be inflated — weigh the quiet-rig close instead.
    retry_info = None
    retry_discarded = None
    dirty = False
    if warmup_over_median > _SETTLE_GATE:
        per_rep2, timings2, rep_totals2, total2 = _timed_headline_loop()
        agreement = round(
            max(total, total2) / max(min(total, total2), 1e-9), 2
        )
        retry_info = {
            "first_total_sec": total,
            "retry_total_sec": total2,
            "agreement": agreement,
        }
        if total2 < total:
            retry_discarded = per_rep  # the discarded (slower) pass
            per_rep, timings, rep_totals, total = (
                per_rep2,
                timings2,
                rep_totals2,
                total2,
            )
        else:
            retry_discarded = per_rep2  # retry was slower; discarded
        dirty = agreement > _SETTLE_GATE
    extended: dict[str, float] = {}
    # SPARK_GRAFT_SKIP_EXTENDED=1 → headline-only run, for quick
    # repetition when characterizing variance (the driver never sets it)
    skip_ext = os.environ.get("SPARK_GRAFT_SKIP_EXTENDED") == "1"
    # extended keys default to ONE run; the wide-band keys in
    # EXTENDED_REPS take a median-of-3 instead (see its comment).
    # NOTE the pairs→clusters order is intentional: q_dedup_clusters
    # reuses the session-persisted verified-pairs edge set built by
    # q_dedup_ngram_jaccard (functions/dedup.py), exactly as a staged
    # pipeline would — its time here is CC rounds, not the pair join.
    # jaccard's reps each re-persist that memo, so the LAST rep leaves
    # it warm for clusters exactly as the old single-shot run did.
    extended_reps: dict[str, list[float]] = {}
    # EXTENDED SETTLE GATE (r15, VERDICT r14 item 2 — methodology v3):
    # the v2 warm-up covered only the headline set, so BENCH_r14's
    # extended total read +28.6% on a rig whose own gate said the draw
    # was dirty (warmup_over_median 2.04) while the quiet rig read
    # −15%. One UNTIMED pass of the full extended set (same key order —
    # the jaccard→clusters memo chain behaves exactly as a timed pass)
    # absorbs the cold component for the extended plans too, and its
    # ratio to the reported extended total (`warmup_ext_over_total`)
    # gives the extended series its own in-file contamination signal.
    # evict_caches after the pass establishes a CLEAN starting cache
    # state for the timed loop (nothing persisted) — clean, not
    # v2-identical: v2's extended loop started with headline-era
    # persisted caches present, so v3 single-shot keys start colder
    # than they did under v2. That shift is part of the documented v3
    # version break (SCALE.md r15); what carries over here is only the
    # JVM/codegen/page-cache warmth — the rig-history component —
    # exactly like the headline gate.
    warmup_ext_total = None  # None (not 0.0) when the set is skipped
    if not skip_ext:
        from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
            evict_caches,
        )

        t0 = time.time()
        for name in EXTENDED:
            _consume(qs[name](spark, sf_dir))
        warmup_ext_total = round(time.time() - t0, 3)
        evict_caches(spark)
    for name in [] if skip_ext else EXTENDED:
        n_reps = EXTENDED_REPS.get(name, 1)
        reps = []
        for _ in range(n_reps):
            if n_reps > 1 and name not in _REPS_KEEP_CACHE:
                # cold rep: drop every cached relation (incl. the
                # query's own persist from the previous rep) AND every
                # module memo so the median measures the plan, not
                # CacheManager reuse — see session.evict_caches for
                # why memo + clearCache must move together.
                from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
                    evict_caches,
                )

                evict_caches(spark)
            t0 = time.time()
            _consume(qs[name](spark, sf_dir))
            reps.append(round(time.time() - t0, 3))
        extended[name] = round(_median(reps), 3)
        if len(reps) > 1:
            extended_reps[name] = reps
    canary_end = _host_canary()
    canary_bw_end = _host_canary_bw()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    emit(
        compact={
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "extended": extended,
            "extended_total_sec": round(sum(extended.values()), 3),
            "sf": sf_val,
            "load_avg_start": load1,
            "load_avg_5m": load5,
            "load_avg_15m": load15,
            # settle-gate fields (methodology v2, r14): the discarded
            # warm-up pass total and its ratio to the FIRST timed
            # pass's median — >~1.3 flags a cold/contended start in the
            # file itself (and, since v4, triggers the headline retry)
            "warmup_total_sec": warmup_total,
            "warmup_over_median": warmup_over_median,
            # headline-retry fields (methodology v4, r16): null when
            # the gate passed; otherwise both passes' totals and their
            # agreement ratio — the reported headline numbers are the
            # better pass. `dirty` is the post-retry verdict (true =
            # the passes still disagree past the gate).
            "headline_retry": retry_info,
            "dirty": dirty,
            # extended settle-gate fields (methodology v3, r15): same
            # contract for the extended series — ratio ≳1.3 means the
            # extended numbers started cold/contended; compare with the
            # quiet-rig close before reading a regression. Both fields
            # are null (not 0.0) when SPARK_GRAFT_SKIP_EXTENDED=1.
            "warmup_ext_total_sec": warmup_ext_total,
            "warmup_ext_over_total": round(
                warmup_ext_total / max(sum(extended.values()), 1e-9), 2
            )
            if extended
            else None,
            # host canaries (r16): scalar CPU loop + sequential memory
            # bandwidth, each before the JVM started and after the
            # extended loop — the contamination evidence retry
            # agreement cannot carry (see module docstring)
            "host_canary_start_sec": canary_start,
            "host_canary_end_sec": canary_end,
            "host_canary_bw_gbps_start": canary_bw_start,
            "host_canary_bw_gbps_end": canary_bw_end,
        },
        detail={
            "detail": "per_rep",
            "reps": rep_totals,
            "queries_per_rep": per_rep,
            "extended_reps": extended_reps,
            # per-key detail of whichever v4 pass was NOT reported
            # (compact carries only the totals); null when no retry ran
            "retry_discarded_pass": retry_discarded,
        },
    )


if __name__ == "__main__":
    main()
