"""Registry emission-order contract.

The external correctness harness verifies queries in emission order and
caps how many it checks per run (round 1 recorded exactly the first 50).
These tests pin the contract: the priority window is exactly 50 names,
emitted first, and covers every query family — so no family can silently
fall outside the externally-verified window when queries are added.
"""

from __future__ import annotations

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.registry import (
    _PRIORITY,
)

FAMILIES = (
    "q_win_",
    "q_udf_",
    "q_uda",  # udaf/udtf
    "q_dedup_",
    "q_text_",
    "q_multimodal_",
    "q_sim_",
    "q_stream_",
    "q_sql_",
    "q_agg_",
    "q_join_",
    "q_source_",
    "q_sample_",
    "q_sink_",
)


def test_priority_window_is_exactly_50():
    assert len(_PRIORITY) == 50, (
        f"_PRIORITY has {len(_PRIORITY)} entries — the external harness "
        "checks exactly 50; adding a query means demoting another"
    )


def test_priority_names_emit_first_and_exist():
    names = list(registry.all_queries())
    assert names[: len(_PRIORITY)] == list(_PRIORITY)
    assert len(set(_PRIORITY)) == len(_PRIORITY)


def test_every_family_inside_checked_window():
    first50 = list(registry.all_queries())[:50]
    for fam in FAMILIES:
        assert any(n.startswith(fam) for n in first50), (
            f"family {fam} has no representative in the externally-"
            "checked window"
        )


def test_oracles_subset_of_queries_and_aligned():
    qs = registry.all_queries()
    os_ = registry.all_oracles()
    assert set(os_) <= set(qs)
    # oracle emission respects the same priority order
    qnames = [n for n in qs if n in os_]
    assert qnames == list(os_)


def test_survey_declares_exactly_the_served_surface():
    """SURVEY.md §2.2 is the declared contract; the registry is the
    served one. They must be the same key set (VERDICT r2 item 6)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import gen_coverage

    gen_coverage.assert_survey_declares_served_surface()


def test_rotation_staleness_invariant():
    """VERDICT r4 item 8: the next 50-key driver window must cover every
    never-checked key and keep worst-case staleness within the feasible
    bound (see tools/rotation_check.py docstring)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import rotation_check

    problems = rotation_check.check_rotation("/root/repo")
    assert not problems, "\n".join(problems)


def test_rotation_checker_logic_on_synthetic_history(tmp_path, monkeypatch):
    """Unit-pin the checker itself (the repo-state test above only
    proves the CURRENT window is legal, not that the checker would
    catch an illegal one): a key never driver-checked and a key past
    the staleness bound must both be flagged when outside the window;
    fixing the history clears both."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import rotation_check

    names = [f"q_{i:03d}" for i in range(120)]  # >100 keys -> bound 3
    monkeypatch.setattr(
        rotation_check.registry,
        "all_queries",
        lambda: {n: None for n in names},
    )
    # q_118 never checked, q_119 last checked r1; everything else r4.
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"q_119": {}}))
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({n: {} for n in names if n not in ("q_118", "q_119")})
    )
    problems = rotation_check.check_rotation(str(tmp_path))
    assert any("q_118" in p and "never" in p for p in problems), problems
    assert any("q_119" in p and "stale" in p for p in problems), problems
    assert len(problems) == 2, problems
    # same history with both keys freshly checked -> invariant holds
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({n: {} for n in names})
    )
    assert rotation_check.check_rotation(str(tmp_path)) == []
