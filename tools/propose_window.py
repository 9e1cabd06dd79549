"""Propose the next round's 50-key driver window (registry._PRIORITY).

The composition rules that were applied by hand in rounds 4-7:

1. keys that have NEVER been driver-checked must be in-window;
2. keys whose served plan CHANGED this round must be in-window
   (the process rule: a plan change lands the same round its key is
   re-verified) — pass them via --changed, they are placed FIRST;
3. every key that would exceed the <=3-round staleness bound after the
   next round runs must be in-window (tools/rotation_check.py enforces
   this invariant post-hoc; this tool satisfies it constructively);
4. remaining slots fill with the OLDEST-checked keys (thins the next
   round's backlog);
5. every query family (tests/test_registry.py FAMILIES) keeps at least
   one representative in-window — if rules 1-4 left a family out, its
   oldest-checked member replaces the youngest filler.

Output: the proposed window as Python tuple source, with composition
comments, ready to paste into registry._PRIORITY. The tool only
PROPOSES — review the composition comments before pasting, and keep
rotation_check green after.

Usage: python tools/propose_window.py [--changed k1,k2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from tools.rotation_check import WINDOW, latest_checks

# mirror of tests/test_registry.py FAMILIES (import would drag pytest
# fixtures; the registry test cross-checks the real list anyway)
FAMILIES = (
    "q_win_", "q_udf_", "q_uda", "q_dedup_", "q_text_",
    "q_multimodal_", "q_sim_", "q_stream_", "q_sql_", "q_agg_",
    "q_join_", "q_source_", "q_sample_", "q_sink_",
)


def propose(
    names: list[str],
    last: dict[str, int],
    latest_round: int,
    changed: list[str],
    window: int = WINDOW,
) -> tuple[list[tuple[str, str]], list[str]]:
    """Return ([(key, reason), ...] of length <= window, warnings)."""
    warnings: list[str] = []
    next_round = latest_round + 1
    picked: list[tuple[str, str]] = []
    taken: set[str] = set()

    def take(key: str, reason: str) -> None:
        if key not in taken:
            picked.append((key, reason))
            taken.add(key)

    for k in changed:
        if k not in names:
            warnings.append(f"--changed key {k!r} is not registered")
            continue
        take(k, "changed this round")
    for k in names:
        if k not in last:
            take(k, "never driver-checked")
    # stale after next round: latest check older than next_round - 3
    must = sorted(
        (k for k in names if k in last and last[k] <= next_round - 3),
        key=lambda k: (last[k], k),
    )
    for k in must:
        take(k, f"at staleness bound (last r{last[k]})")
    if len(picked) > window:
        warnings.append(
            f"{len(picked)} mandatory keys exceed the {window}-key "
            "window — the bound WILL be violated; split changes across "
            "rounds or re-derive the feasible bound"
        )
        return picked, warnings
    # fillers: oldest-checked first
    fillers = sorted(
        (k for k in names if k not in taken and k in last),
        key=lambda k: (last[k], k),
    )
    while len(picked) < window and fillers:
        k = fillers.pop(0)
        take(k, f"backlog thinning (last r{last[k]})")
    # family pins
    for fam in FAMILIES:
        if any(k.startswith(fam) for k in taken):
            continue
        member = next(
            (
                k
                for k in sorted(
                    names, key=lambda k: (last.get(k, -1), k)
                )
                if k.startswith(fam)
            ),
            None,
        )
        if member is None:
            continue  # family not in registry at all
        # evict the youngest filler to make room — but never one that is
        # the SOLE in-window representative of its own family, or the pin
        # for B would silently strip A's representation (ADVICE r7)
        def _sole_rep(key: str) -> bool:
            return any(
                key.startswith(f)
                and sum(1 for t in taken if t.startswith(f)) == 1
                for f in FAMILIES
            )

        evict = next(
            (
                (key, why)
                for key, why in reversed(picked)
                if why.startswith("backlog thinning")
                and not _sole_rep(key)
            ),
            None,
        )
        if evict is None:
            warnings.append(
                f"family {fam} unrepresented and no evictable filler"
            )
            continue
        picked.remove(evict)
        taken.discard(evict[0])
        take(member, f"family pin ({fam})")
    # belt-and-braces: re-check every family after all pins/evictions
    for fam in FAMILIES:
        if any(k.startswith(fam) for k in names) and not any(
            k.startswith(fam) for k in taken
        ):
            warnings.append(
                f"family {fam} left unrepresented after pin loop"
            )
    return picked, warnings


def main() -> None:
    changed: list[str] = []
    args = sys.argv[1:]
    if args and args[0] == "--changed":
        changed = [k for k in args[1].split(",") if k]
        args = args[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last, latest_round = latest_checks(repo)
    names = list(registry.all_queries())
    picked, warnings = propose(names, last, latest_round, changed)
    for w in warnings:
        print(f"# WARNING: {w}")
    print(
        f"# proposed r{latest_round + 1} window "
        f"({len(picked)}/{WINDOW} keys) — review, then replace "
        "registry._PRIORITY"
    )
    print("_PRIORITY: tuple[str, ...] = (")
    reason_prev = None
    for key, reason in picked:
        if reason != reason_prev:
            print(f"    # --- {reason} ---")
            reason_prev = reason
        print(f'    "{key}",')
    print(")")


if __name__ == "__main__":
    main()
