"""Rotation-staleness invariant for the driver's 50-key CORRECTNESS window.

The external harness verifies the FIRST 50 emitted queries each round
(registry._PRIORITY pins that window).  This check fails if the currently
pinned window would leave any registered key's latest driver check too
stale after the next round runs:

* a key that has NEVER been driver-checked must be in the window;
* after the next round, no key outside the window may be staler than the
  feasible bound — 2 rounds when the registry fits in two windows
  (<=100 keys), 3 rounds otherwise (130 keys / 50-per-round means a
  strict 2-round cycle would need 65 checks/round, which the driver
  does not provide);
* exception (r9, ADVICE r8): a key declared in
  ``registry.NEXT_WINDOW_LEADS`` (an at-bound slip the last window
  could not fit) may read staleness bound+1 for exactly one round —
  the instant between the driver committing a round's results and the
  next session rotating ``_PRIORITY``.  The allowance self-expires at
  bound+2.

Run standalone (``python tools/rotation_check.py``) or via
tests/test_registry.py, which imports :func:`check_rotation`.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)

WINDOW = 50


def staleness_bound(n_keys: int) -> int:
    """Feasible staleness bound for the registry size: 2 when the
    registry fits in two windows, else 3.  Single source of truth —
    check_rotation, the proposer's slip computation, and the
    declared-slip honesty test all reuse it (three hand-copies of
    this formula drifted once already; r9 review finding)."""
    return 2 if n_keys <= 2 * WINDOW else 3


def latest_checks(repo_root: str) -> tuple[dict[str, int], int]:
    """Map query key -> latest round it appeared in CORRECTNESS_r*.json."""
    last: dict[str, int] = {}
    rounds = [0]
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        base = os.path.basename(f)
        try:
            rnd = int(base.split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            continue
        rounds.append(rnd)
        for key in json.load(open(f)):
            last[key] = rnd
    return last, max(rounds)


def check_rotation(repo_root: str = None) -> list[str]:
    """Return a list of violation messages (empty == invariant holds)."""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last, latest_round = latest_checks(repo_root)
    if not last:  # no driver files yet (fresh clone) — nothing to enforce
        return []
    next_round = latest_round + 1
    names = list(registry.all_queries())
    window = set(names[:WINDOW])
    bound = staleness_bound(len(names))
    leads = set(getattr(registry, "NEXT_WINDOW_LEADS", ()))
    problems: list[str] = []
    for key in names:
        if key in window:
            continue
        if key not in last:
            problems.append(
                f"{key}: never driver-checked and NOT in the next "
                f"{WINDOW}-key window"
            )
            continue
        staleness = next_round - last[key]
        if staleness > bound:
            # One-round allowance for DECLARED slips (ADVICE r8): an
            # at-bound key the last window couldn't fit reads bound+1
            # in the instant between the driver committing that
            # window's results and the next session rotating
            # _PRIORITY.  Legal iff it is pre-declared as a next-window
            # lead AND the overshoot is exactly one round — a second
            # missed rotation pushes it to bound+2 and fails for real.
            if key in leads and staleness == bound + 1:
                continue
            problems.append(
                f"{key}: last checked r{last[key]}, would be {staleness} "
                f"rounds stale after r{next_round} (bound {bound}) and is "
                "not in the window"
                + (
                    " (declared a next-window lead, but the allowance "
                    "is one round and has expired)"
                    if key in leads
                    else ""
                )
            )
    return problems


def main() -> int:
    problems = check_rotation()
    if problems:
        for p in problems:
            print("ROTATION VIOLATION:", p)
        return 1
    last, latest_round = latest_checks(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    names = list(registry.all_queries())
    window = set(names[:WINDOW])
    outside = {
        k: (latest_round + 1) - last[k] for k in names if k not in window and k in last
    }
    worst = max(outside.values()) if outside else 0
    print(
        f"rotation OK: {len(names)} keys, window {WINDOW}, worst staleness "
        f"outside window after r{latest_round + 1} = {worst}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
