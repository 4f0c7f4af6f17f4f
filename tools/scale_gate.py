"""The repeatable per-round SCALE GATE (VERDICT r12 #3): one command
that (a) regenerates the git-ignored sf0.3 fixture if absent, (b)
strict-sweeps the WHOLE registry against the DuckDB oracles at sf0.3
— the 3x scale where the r12 sweep caught a real int64 OLS overflow
that sf0.01 rehearsal can never see — and (c) writes ``SCALE_GATE.json``
with a registry fingerprint so ``tests/test_scale_gate.py`` can fail
the suite whenever the committed record is missing, stale against the
current registry, or not fully green. The expensive sweep runs once
per round via this command; pytest enforces (cheaply, every run) that
it DID run and was green for exactly this registry.

Usage:
    PYTHONPATH=. python tools/scale_gate.py          # sf0.3 gate (the default)
    PYTHONPATH=. python tools/scale_gate.py 1.0      # optional sf1.0 deep pass
                                                     # (~75 min; not gated)

Only the sf0.3 record is written to SCALE_GATE.json; an sf1.0 pass is
a deeper one-off probe and prints its summary without touching the
gate record.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_SF = "0.3"
GATE_PATH = os.path.join(REPO, "SCALE_GATE.json")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def registry_sha() -> str:
    """Fingerprint of the oracle-paired registry: sorted query names +
    their oracle SQL. Any registration, removal, or oracle edit changes
    it, so a committed gate record can't silently cover a different
    registry than the one under test."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    h = hashlib.sha256()
    for name in sorted(oracles):
        h.update(name.encode())
        h.update(b"\x00")
        h.update(oracles[name].encode())
        h.update(b"\x01")
    return h.hexdigest()[:16]


def fixture_ready(sf: str) -> bool:
    d = os.path.join(REPO, "scale_fixtures", f"sf{sf}")
    return all(
        os.path.exists(os.path.join(d, f"{t}.parquet", "_SUCCESS"))
        for t in TABLES
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else GATE_SF
    fixture_dir = os.path.join(REPO, "scale_fixtures", f"sf{sf}")
    if not fixture_ready(sf):
        print(f"fixture sf{sf} absent/incomplete — generating (one-time)")
        # subprocess, not import: the generator builds its own Spark
        # session with write-sized confs; keep it out of the sweep JVM
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "gen_scale_fixtures.py"), sf],
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        if rc != 0 or not fixture_ready(sf):
            print(f"ERROR: fixture generation for sf{sf} failed")
            return 2

    from pyspark.sql import SparkSession

    from tools.oracle_check import run_sweep

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("scale-gate")
        .config("spark.ui.enabled", "false")
        # capacity, not semantics (same note as sf_sweep.py): the
        # default 1g driver heap OOMs a full-registry sweep above
        # sf0.1 once 336 queries' caches and replay states accumulate
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    failures = run_sweep(spark, fixture_dir, label=f"scale-gate-sf{sf}")
    import __spark_entry__ as entrymod

    n = len(entrymod.oracle_sql())
    if sf == GATE_SF:
        record = {
            "metric": "scale_gate",
            "sf": sf,
            "n_queries": n,
            "failures": failures,
            "all_match": failures == 0,
            "registry_sha": registry_sha(),
            "duration_sec": round(time.time() - t0, 1),
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }
        with open(GATE_PATH, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"wrote {GATE_PATH}: {json.dumps(record)}")
    else:
        print(f"sf{sf} deep pass: {n - failures}/{n} (gate record untouched)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
