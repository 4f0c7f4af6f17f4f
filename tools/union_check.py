"""Mechanical driver-green-union tracker (VERDICT r6 "What's wrong" #2).

The driver value-checks 50 queries per round (the CHECKED_FIRST window
in ``__spark_entry__.py``); the union of green rows across rounds is
the hard coverage signal. Round 1 proved the failure mode this tool
closes: three queries hash-failed, were fixed the next round, passed
the local gate ever after — and were never rotated back into a window,
so they silently lacked a driver-green row for five rounds.

``green_union()`` recomputes the union from the committed
``CORRECTNESS_r*.json`` files (a row is green iff rows+schema+hash all
match with no error). ``forgotten()`` is the enforcement: every
registered query must either be driver-green in some round's file or
sit in the CURRENT window (i.e. scheduled for its check this round).
Anything else is a fixed-but-never-regreened slip and fails the suite
(``tests/test_union_check.py``). Run as a script for the human report:

    python -m tools.union_check
"""

from __future__ import annotations

import glob
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def correctness_files(repo_root: str = REPO_ROOT) -> list[str]:
    return sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))


def green_union(repo_root: str = REPO_ROOT) -> dict[str, str]:
    """query name -> LATEST round whose driver row is green.

    Membership ("ever driver-green") is what the coverage gates use;
    the tag is the most recent green round so staleness-ranked window
    rotation (``propose_window``) actually ages queries OUT after a
    re-green. (Through r8 this recorded the FIRST green round, which
    made re-greens invisible to the staleness sort — r9 fix.)"""
    union: dict[str, str] = {}
    for path in correctness_files(repo_root):
        round_tag = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _is_green(row):
                union[name] = round_tag
    return union


def forgotten(
    registry: list[str],
    window: list[str],
    overflow: list[str] = (),
    repo_root: str = REPO_ROOT,
) -> list[str]:
    """Registered queries with NO driver-green row in any committed
    round AND no slot in the current window AND no place in the
    declared next-round overflow queue — the r1 slip class. The
    overflow queue (``__spark_entry__.WINDOW_OVERFLOW``) counts as
    scheduled because the next rotation consumes it FIRST."""
    union = green_union(repo_root)
    scheduled = set(window) | set(overflow)
    return [q for q in registry if q not in union and q not in scheduled]


def report(repo_root: str = REPO_ROOT) -> dict:
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    window = list(entrymod.CHECKED_FIRST)
    overflow = list(getattr(entrymod, "WINDOW_OVERFLOW", []))
    union = green_union(repo_root)
    unchecked = [q for q in registry if q not in union]
    return {
        "registry": len(registry),
        "green_union": len([q for q in union if q in registry]),
        "rounds": [os.path.basename(p) for p in correctness_files(repo_root)],
        "not_yet_green": unchecked,
        "in_current_window": [q for q in unchecked if q in set(window)],
        "queued_next_round": [q for q in unchecked if q in set(overflow)],
        # registration freeze headroom (VERDICT r10 #3): how many MORE
        # queries may register before the awaiting set outgrows one
        # driver round's 50-slot check budget
        "registration_budget": max(0, 50 - len(unchecked)),
        "forgotten": forgotten(registry, window, overflow, repo_root),
    }


def propose_schedule(
    size: int = 50, repo_root: str = REPO_ROOT
) -> dict[str, list[str]]:
    """Mechanical draft of the NEXT round's check schedule.

    ``window``: every query still awaiting a green row first
    (slip-proof by construction), then anchor slots filled with the
    LEAST-recently-regreened green queries (max-min staleness keeps
    every family's green row fresh over time).

    ``overflow``: when MORE queries await a green row than the window
    holds (the registry outgrew one round's driver check budget),
    the excess is returned as an explicit queue instead of an error.
    Priority is FIFO seniority: awaiting members of the CURRENT
    window keep their slots (the committed, rehearsed plan doesn't
    churn mid-round), then the DECLARED overflow queue in queue
    order, then newcomers in registration order. Queue order (not
    registry order) is what prevents starvation: with registry-order
    tie-breaking, import-order-late queries lost their slot to every
    later registration wave and could be deferred indefinitely (r10
    code review: two queries spent two consecutive rounds queued)."""
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    union = green_union(repo_root)
    current = set(entrymod.CHECKED_FIRST)
    queued = {q: i for i, q in enumerate(entrymod.WINDOW_OVERFLOW)}
    awaiting = [q for q in registry if q not in union]
    awaiting = (
        [q for q in awaiting if q in current]
        + sorted(
            (q for q in awaiting if q not in current and q in queued),
            key=queued.__getitem__,
        )
        + [q for q in awaiting if q not in current and q not in queued]
    )
    stale_order = sorted(
        (q for q in registry if q in union), key=lambda q: (union[q], q)
    )
    window = awaiting[:size] + stale_order[: max(0, size - len(awaiting))]
    return {"window": window, "overflow": awaiting[size:]}


def propose_window(size: int = 50, repo_root: str = REPO_ROOT) -> list[str]:
    """The ``window`` half of ``propose_schedule`` (kept for callers
    that only fill slots; the overflow queue is the other half)."""
    return propose_schedule(size, repo_root)["window"]


def main() -> int:
    import sys

    if "--propose-window" in sys.argv:
        sched = propose_schedule()
        for q in sched["window"]:
            print(q)
        for q in sched["overflow"]:
            print(f"# overflow (next round): {q}")
        return 0
    r = report()
    print(
        f"driver-green union: {r['green_union']}/{r['registry']} "
        f"across {len(r['rounds'])} rounds; registration budget "
        f"{r['registration_budget']}/50 before the awaiting set "
        "outgrows one driver round"
    )
    if r["not_yet_green"]:
        print(f"awaiting a green row ({len(r['not_yet_green'])}):")
        for q in r["not_yet_green"]:
            if q in set(r["in_current_window"]):
                tag = "WINDOWED"
            elif q in set(r["queued_next_round"]):
                tag = "QUEUED-NEXT-ROUND"
            else:
                tag = "FORGOTTEN"
            print(f"  [{tag}] {q}")
    if r["forgotten"]:
        print(
            "FAIL: queries above marked FORGOTTEN have no driver-green row "
            "and no slot in the current CHECKED_FIRST window — rotate them in."
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
