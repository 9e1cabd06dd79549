"""Propose the next round's 50-key driver window (registry._PRIORITY).

The composition rules that were applied by hand in rounds 4-7:

1. keys that have NEVER been driver-checked must be in-window;
2. keys whose served plan CHANGED this round must be in-window
   (the process rule: a plan change lands the same round its key is
   re-verified) — pass them via --changed, they are placed FIRST;
3. every key that would exceed the <=3-round staleness bound after the
   next round runs must be in-window (tools/rotation_check.py enforces
   this invariant post-hoc; this tool satisfies it constructively) —
   keys that would sit at staleness EXACTLY 3 are taken too, but may
   slip (rule 6) because the bound allows exactly 3;
4. every query family (registry.FAMILIES) keeps at least one
   representative in-window — a pin is as mandatory as a bound key,
   so pins are taken before fillers;
5. remaining slots fill with the OLDEST-checked keys (thins the next
   round's backlog);
6. when rules 1-4 overflow the window, AT-bound keys slip to the next
   round (they sit at staleness exactly 3 — legal — and become hard
   leads there; the r8 q_agg_collect/q_agg_cube resolution, now
   mechanical).  Only keys that are not --changed and whose families
   keep another in-window member are eligible; a slip load larger
   than one whole window is reported as a capacity violation instead.

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
from tools.rotation_check import (
    WINDOW,
    latest_checks,
    staleness_bound,
)

# Single source of truth for the family taxonomy (name -> prefix tuple);
# tests/test_registry.py consumes the same dict.
FAMILIES = registry.FAMILIES


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
    # PAST the bound after next round (staleness > 3): cannot slip.
    # AT the bound (staleness exactly 3): legal to leave out — the key
    # then becomes a hard-mandatory lead the round after (the r8
    # q_agg_collect/q_agg_cube resolution, now mechanical, below).
    hard = sorted(
        (k for k in names if k in last and last[k] < next_round - 3),
        key=lambda k: (last[k], k),
    )
    for k in hard:
        take(k, f"past staleness bound (last r{last[k]})")
    soft = sorted(
        (k for k in names if k in last and last[k] == next_round - 3),
        key=lambda k: k,
    )
    for k in soft:
        take(k, f"at staleness bound (last r{last[k]})")
    # family pins BEFORE fillers/overflow: coverage is an invariant
    # (tests/test_registry.py), so a pin is as mandatory as a bound key
    for fam, prefixes in FAMILIES.items():
        if any(k.startswith(prefixes) for k in taken):
            continue
        member = next(
            (
                k
                for k in sorted(
                    names, key=lambda k: (last.get(k, -1), k)
                )
                if k.startswith(prefixes)
            ),
            None,
        )
        if member is None:
            continue  # family not in registry at all
        take(member, f"family pin ({fam})")
    if len(picked) > window:
        # Resolve by slipping AT-bound keys to the next round, where
        # they become hard leads.  Eligible: at-bound, not --changed,
        # and every family the key represents keeps another in-window
        # member (so the coverage invariant survives the slip).  The
        # slipped load lands on the next window whole, so more slips
        # than one window can absorb is a genuine capacity violation.
        overflow = len(picked) - window
        changed_set = set(changed)
        slipped: list[str] = []
        if overflow <= window:
            while len(picked) > window:
                in_window = [k for k, _ in picked]

                def _fam_count(key: str) -> int:
                    # family-less keys (q_event_*, q_pipeline_*, ...)
                    # can never break coverage -> slip them first
                    return min(
                        (
                            sum(1 for t in in_window if t.startswith(p))
                            for p in FAMILIES.values()
                            if key.startswith(p)
                        ),
                        default=len(in_window),
                    )

                eligible = [
                    k
                    for k, why in picked
                    if why.startswith("at staleness bound")
                    and k not in changed_set
                    and _fam_count(k) >= 2
                ]
                if not eligible:
                    break
                # slip from the best-covered family first (safest),
                # lexicographic within it (deterministic)
                victim = max(eligible, key=lambda k: (_fam_count(k), k))
                picked[:] = [(k, w) for k, w in picked if k != victim]
                taken.discard(victim)
                slipped.append(victim)
        if len(picked) > window:
            warnings.append(
                f"{len(picked) + len(slipped)} mandatory keys exceed "
                f"the {window}-key window — the bound WILL be "
                "violated; split changes across rounds or re-derive "
                "the feasible bound"
            )
            return picked, warnings
        if slipped:
            warnings.append(
                "NOTE: at-bound keys slipped to "
                f"r{next_round + 1} (staleness exactly 3 after "
                f"r{next_round} — legal) and MUST lead that window: "
                + ", ".join(sorted(slipped))
            )
    # fillers: oldest-checked first
    fillers = sorted(
        (k for k in names if k not in taken and k in last),
        key=lambda k: (last[k], k),
    )
    while len(picked) < window and fillers:
        k = fillers.pop(0)
        take(k, f"backlog thinning (last r{last[k]})")
    # belt-and-braces: re-check every family after pins + slips
    for fam, prefixes in FAMILIES.items():
        if any(k.startswith(prefixes) for k in names) and not any(
            k.startswith(prefixes) for k in taken
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
    # The rule-6 slips: at-bound keys the window could not fit.  Paste
    # this alongside _PRIORITY — rotation_check grants exactly these
    # keys the one-round boundary allowance (see NEXT_WINDOW_LEADS in
    # registry.py); an empty rotation prints an empty tuple, clearing
    # any previous round's allowance.
    picked_keys = {k for k, _ in picked}
    slipped = sorted(
        k
        for k in names
        if k in last
        and last[k] == latest_round + 1 - staleness_bound(len(names))
        and k not in picked_keys
    )
    print("NEXT_WINDOW_LEADS: tuple[str, ...] = (")
    for key in slipped:
        print(f'    "{key}",')
    print(")")


if __name__ == "__main__":
    main()
