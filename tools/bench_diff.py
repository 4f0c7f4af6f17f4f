"""Round-over-round bench comparison (mechanizes the PERF_NOTES hand
derivation): given two bench JSON records, report the carried-subtotal
delta, per-query wall deltas over the shared query set, and — the hard
signal — task-count fingerprint changes. A wall-time delta with an
unchanged fingerprint is ambient load; a fingerprint change is a plan
change and must be explained in PERF_NOTES.

    python -m tools.bench_diff BENCH_r06.json BENCH_r07.json
"""

from __future__ import annotations

import json


def diff(old: dict, new: dict) -> dict:
    old_q, new_q = old.get("queries", {}), new.get("queries", {})
    old_t, new_t = old.get("tasks", {}), new.get("tasks", {})
    shared = sorted(set(old_q) & set(new_q))
    fingerprint_changes = {
        q: (old_t[q], new_t[q])
        for q in sorted(set(old_t) & set(new_t))
        if old_t[q] != new_t[q]
    }
    wall = {q: round(new_q[q] - old_q[q], 3) for q in shared}
    return {
        "carried_subtotal": (
            old.get("carried_subtotal"),
            new.get("carried_subtotal"),
        ),
        "total": (old.get("value"), new.get("value")),
        "n_queries": (
            old.get("n_queries", len(old_q)),
            new.get("n_queries", len(new_q)),
        ),
        "shared_timed_queries": len(shared),
        "new_queries": sorted(set(new_q) - set(old_q)),
        "dropped_queries": sorted(set(old_q) - set(new_q)),
        "fingerprint_changes": fingerprint_changes,
        "wall_delta_by_query": wall,
        "plan_regression": bool(fingerprint_changes),
    }


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    with open(argv[0]) as f:
        old = json.load(f)
    with open(argv[1]) as f:
        new = json.load(f)
    d = diff(old, new)
    o_c, n_c = d["carried_subtotal"]
    print(f"carried_subtotal: {o_c} -> {n_c}")
    print(f"headline total:   {d['total'][0]} -> {d['total'][1]} "
          f"({d['n_queries'][0]} -> {d['n_queries'][1]} queries)")
    if d["new_queries"]:
        print(f"new queries: {', '.join(d['new_queries'])}")
    if d["dropped_queries"]:
        print(f"dropped queries: {', '.join(d['dropped_queries'])}")
    if d["fingerprint_changes"]:
        print("PLAN CHANGES (task-count fingerprints):")
        for q, (a, b) in d["fingerprint_changes"].items():
            print(f"  {q}: {a} -> {b} tasks")
        return 1
    print("fingerprints: unchanged for all shared queries (no plan change)")
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
