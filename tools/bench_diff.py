"""Round-over-round bench comparison (mechanizes the PERF_NOTES hand
derivation): given two bench JSON records, report the carried-subtotal
delta, per-query wall deltas over the shared query set, and — the hard
signal — task-count fingerprint changes. A wall-time delta with an
unchanged fingerprint is ambient load; a fingerprint change is a plan
change and must be explained in PERF_NOTES.

When both records carry per-query min-of-repeats walls
(``queries_min``) and ``env.canary_sec`` (the fixed pure-CPU
machine-speed yardstick bench.py records since r13), the diff also
attributes drift mechanically. The robust engine signal is the MEDIAN
per-query min ratio, not the carried-subtotal ratio: aggregate sums
are dominated by a handful of heavy tail queries, and the r13
cross-host datapoint showed a median of 1.008 (engine flat) while the
carried sum moved +28% on eight tail queries. The canary ratio is the
CPU-speed context; the verdict cross-checks the two rather than
dividing one by the other, because a host change can move CPU speed
and I/O/fork cost in OPPOSITE directions (r13: canary 1.8x faster,
walls flat-to-slower), making any single normalized scalar lie:

- median ratio within the ±15% band of 1.0 -> ``flat`` (walls flat,
  whatever the CPU did);
- median tracks the canary (normalized median inside the band) ->
  ``flat (tracks machine)``;
- median and canary-normalized median agree in direction ->
  ``slower`` / ``faster`` (a real engine movement);
- they disagree -> ``ambiguous-host-change``: the host's CPU/I-O
  balance shifted; adjudicate with the task fingerprints + code diff.

    python -m tools.bench_diff BENCH_r06.json BENCH_r07.json
"""

from __future__ import annotations

import json

# Median min-ratio within this band of 1.0 is "engine flat": the
# residual is inside run-to-run measurement noise.
ENGINE_DRIFT_BAND = 0.15


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
    out = {
        "carried_subtotal": (
            old.get("carried_subtotal"),
            new.get("carried_subtotal"),
        ),
        "carried_subtotal_min": (
            old.get("carried_subtotal_min"),
            new.get("carried_subtotal_min"),
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
    # Drift attribution (see module docstring): median per-query min
    # ratio is the robust engine signal; the canary is CPU context.
    o_qm, n_qm = old.get("queries_min") or {}, new.get("queries_min") or {}
    # floor at 50 ms: sub-noise queries produce wild ratios
    min_shared = sorted(
        q for q in set(o_qm) & set(n_qm) if o_qm[q] > 0.05 and n_qm[q] > 0.05
    )
    o_can = (old.get("env") or {}).get("canary_sec")
    n_can = (new.get("env") or {}).get("canary_sec")
    o_min, n_min = out["carried_subtotal_min"]
    if o_can and n_can:
        out["canary_sec"] = (o_can, n_can)
        out["canary_ratio"] = round(n_can / o_can, 3)
    if o_min and n_min:
        out["carried_min_ratio"] = round(n_min / o_min, 3)
    if min_shared:
        ratios = sorted((n_qm[q] / o_qm[q], q) for q in min_shared)
        med = ratios[len(ratios) // 2][0]
        out["median_min_ratio"] = round(med, 3)
        out["min_ratio_outliers"] = {
            q: round(r, 2)
            for r, q in ratios[-5:][::-1]
            if abs(r - 1.0) > 2 * ENGINE_DRIFT_BAND
        }
    if min_shared and o_can and n_can:
        med = out["median_min_ratio"]
        normalized = med / out["canary_ratio"]
        out["median_min_ratio_normalized"] = round(normalized, 3)
        band = ENGINE_DRIFT_BAND
        canary_ratio = out["canary_ratio"]
        if abs(med - 1.0) <= band:
            verdict = "flat"
        elif abs(normalized - 1.0) <= band:
            verdict = "flat (tracks machine)"
        elif (med - 1.0) * (canary_ratio - 1.0) < 0:
            # walls moved OPPOSITE to the CPU canary: the host's
            # CPU/I-O balance changed; no scalar can attribute this —
            # adjudicate with task fingerprints + the code diff
            verdict = "ambiguous-host-change"
        elif med > 1.0:
            verdict = "slower"
        else:
            verdict = "faster"
        out["engine_drift"] = verdict
    return out


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
    o_m, n_m = d["carried_subtotal_min"]
    if o_m is not None and n_m is not None:
        print(f"carried_subtotal_min: {o_m} -> {n_m}")
    if "canary_ratio" in d:
        print(
            f"canary: {d['canary_sec'][0]} -> {d['canary_sec'][1]} s "
            f"(CPU ratio {d['canary_ratio']})"
        )
    if "median_min_ratio" in d:
        print(f"median per-query min ratio: {d['median_min_ratio']}")
        if d.get("min_ratio_outliers"):
            outl = ", ".join(
                f"{q} x{r}" for q, r in d["min_ratio_outliers"].items()
            )
            print(f"tail outliers: {outl}")
    if "engine_drift" in d:
        print(f"engine drift verdict: {d['engine_drift']}")
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
