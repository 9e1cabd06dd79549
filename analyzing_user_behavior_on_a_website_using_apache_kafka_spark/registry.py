"""Query/oracle registry.

Every operator in SURVEY.md §2.2 registers here as a named query:

    @query("q_agg_count_by", oracle="SELECT ... ")
    def q_agg_count_by(spark, sf_dir): ...

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin reads
of this registry. The oracle string is ANSI SQL runnable by DuckDB on the
same parquet tables; queries whose semantics are not SQL-expressible
(streaming state, approximate ops) register with ``oracle=None`` and get
the driver's weaker rows-only check.

Parity rules encoded as convention (SURVEY.md §7 "hard parts"):
- alias every computed column identically on both engines;
- explicitly cast aggregate integer results (DuckDB SUM(int)->HUGEINT vs
  Spark ->BIGINT) and round floating aggregates so summation order cannot
  flip the driver's value hash;
- avoid raw timestamp outputs (ns-vs-us precision) — project epoch
  seconds or ISO strings instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The external correctness harness checks queries in registration order and
# may cap how many it verifies per run (round 1 checked exactly the first
# 50).  Emission order is therefore part of the driver contract: this list
# pins the first entries so that EVERY query family (windows, UDFs,
# streaming, dedup, similarity, text, multimodal, SQL surface) plus any
# previously-failing rows sit inside a 50-entry window.  Names not listed
# here follow in module registration order.
_PRIORITY: tuple[str, ...] = (
    # Round-6 window (VERDICT r5 items 1, 2, 4, 6).  Composition:
    #   (a) the 2 keys last driver-checked in r2 — at the 3-round
    #       staleness bound, they rotate FIRST (the one red test in r5
    #       was tools/rotation_check.py flagging exactly these);
    #   (b) every key whose implementation CHANGED in r6 and so needs a
    #       fresh CORRECTNESS row: the de-hinted vocabulary-sized
    #       broadcast(freq) joins (jaccard / containment — VERDICT r5
    #       item 2 — plus q_text_tfidf, same Heaps'-law pattern in its
    #       df join) which also gained a shared-subtree persist (the
    #       lambda lineage defeats exchange reuse — see SCALE.md r6
    #       notes; q_dedup_clusters consumes the SAME memoized pair
    #       sub-plan and is covered by jaccard's in-window row, the r5
    #       precedent in reverse), the Arrow-matmul centroid-routing
    #       default flip (q_sim_ivf / q_dedup_semantic — item 4), and
    #       q_sim_ann (empty-Arrow-batch guard added to its shared
    #       _lsh_bucket_ids UDF — ADVICE r5; q_dedup_embed_cosine
    #       shares that UDF but stays r7: the guard is unreachable on
    #       non-empty batches and ann's fresh row exercises the path);
    #   (c) ALL 41 remaining keys last driver-checked in r3 (the full
    #       staleness backlog — item 6: after this window runs, no key
    #       outside it is older than r4, so rotation_check projects
    #       zero violations for r7);
    #   (d) q_udaf_grouped — sole member of the q_uda* family, pinned
    #       in-window by test_registry's family-coverage invariant.
    # (Steady state: 142 keys / 50-key windows makes a strict
    # <=2-round cycle infeasible — tools/rotation_check.py enforces the
    # feasible <=3-round bound plus never-stale-new-keys.)
    # --- (a) r2-stale, rotate first ---
    "q_text_langstats",
    "q_text_normalize",
    # --- (b) changed in r6 ---
    "q_dedup_ngram_jaccard",
    "q_dedup_containment",
    "q_text_tfidf",
    "q_sim_ivf",
    "q_dedup_semantic",
    "q_sim_ann",
    # --- (c) r3-stale backlog, all 41 remaining ---
    "q_agg_approx_quantile",
    "q_agg_sketch_merge",
    "q_agg_stats",
    "q_cohort_retention",
    "q_dedup_incremental",
    "q_dedup_near",
    "q_embed_normquant",
    "q_event_transitions",
    "q_funnel_conversion",
    "q_growth_accounting",
    "q_join_range_binned",
    "q_multimodal_features",
    "q_multimodal_framesample",
    "q_pack_sequences",
    "q_path_topk",
    "q_pipeline_curate",
    "q_sample_mixture",
    "q_sample_stratified",
    "q_sim_topk_bruteforce",
    "q_sink_bucketed",
    "q_sink_upsert",
    "q_source_evolving_schema",
    "q_sql_window",
    "q_stream_complete_agg",
    "q_stream_custom_state",
    "q_stream_session",
    "q_stream_static_join",
    "q_stream_tumbling",
    "q_text_chunk",
    "q_text_decontaminate",
    "q_text_entropy",
    "q_text_fingerprint",
    "q_text_ngram_counts",
    "q_text_pii_scrub",
    "q_text_repetition",
    "q_text_rollhash",
    "q_text_token_bpe",
    "q_text_unigram_logprob",
    "q_udf_cogroup",
    "q_udtf_explode",
    "q_win_first_last",
    # --- (d) family pin ---
    "q_udaf_grouped",
    # Every key outside this window has a driver check from r04/r05
    # (<=3 rounds old after r06 runs). r7 plan: the 45 r4-checked keys
    # (48 minus tfidf/ivf/ann, re-checked here) lead the next window —
    # q_dedup_embed_cosine first — and the queued shared-subtree
    # persists land with their keys in-window: q_dedup_editdist
    # (20-scan plan, note at its `ordered` definition), q_dedup_simhash
    # (20-scan signature recompute, same fix minhash got in r6),
    # q_dedup_embed_cosine (14-scan bucketed_all_tables recompute).
)


def _ordered(names: list[str]) -> list[str]:
    known = set(names)
    head = [n for n in _PRIORITY if n in known]
    tail = [n for n in names if n not in set(head)]
    return head + tail


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: _QUERIES[n] for n in _ordered(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: _ORACLES[n] for n in _ordered(list(_ORACLES))}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        behavior,
        extended,
        filters,
        joins,
        scans,
        scalar_funcs,
        skew,
        sorts_setops,
        sql_surface,
        timeseries,
        udfs,
        windows,
    )
    from .functions import (  # noqa: F401
        dedup,
        langid,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from .streaming import jobs, stateful  # noqa: F401
    # NOTE: a transformWithStateInPandas twin of q_stream_custom_state
    # (Spark 4 arbitrary-state v2: ValueState/MapState/timers) was built
    # and is environment-blocked: pyspark 4.1.2's TwS state-server
    # protocol imports google.protobuf, absent from this container
    # (verified: the driver-side schema worker crashes on the import;
    # installs are off-limits). Re-probed r6 (2026-08-14):
    #   python -c "import google.protobuf"
    #     -> ModuleNotFoundError: No module named 'google'
    #   (grpc likewise absent) — still blocked. Revisit each round;
    # the applyInPandasWithState operator above covers the
    # arbitrary-state semantics meanwhile.

    _LOADED = True
