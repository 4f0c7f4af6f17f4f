"""The repeatable TINY GATE — the low-scale pole of the per-round
verification pair (``tools/scale_gate.py`` is the high pole): one
command that (a) regenerates the git-ignored 1-row and 5-row fixtures
if absent (``tools/gen_tiny_fixture.py``), (b) strict-sweeps the WHOLE
registry against the DuckDB oracles on BOTH, and (c) writes
``TINY_GATE.json`` with the registry fingerprint so
``tests/test_scale_gate.py`` can fail the suite whenever the committed
record is missing, stale, or not fully green.

Why it exists: growing aggregates expose overflow (the r12 sf0.3 find);
SHRINKING groups expose the opposite class — NULL-vs-0 divergence when
an aggregate runs over an empty set, underdetermined sort ties, modulo
splits that select nothing, n-1 = 0 denominators. Its first run caught
a real one: ``embedding_centroid_margin_profile`` returned NULL counts
(Spark bare boolean cast) where the oracle's CASE ... ELSE 0 returned 0
whenever a slice holds a single label. The empty-input sweep
(tests/test_empty_inputs.py) only proves no CRASH at zero rows; this
gate proves both engines agree on the VALUES at near-zero rows.

Usage:
    PYTHONPATH=. python tools/tiny_gate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_PATH = os.path.join(REPO, "TINY_GATE.json")
# (rows, null-flood?) — the 1-row and 5-row fixtures exercise
# shrunk-group edges; the 5-row null-flood variant forces every
# nullable-by-contract column NULL (its first run caught 22 real
# divergences: bare boolean casts, DuckDB concat() NULL-skipping,
# NULL payloads crashing pack/decode paths)
FIXTURES = ((1, False), (5, False), (5, True))


def _suffix(rows: int, nulls: bool) -> str:
    return f"sf{rows}r" + ("N" if nulls else "")


def fixture_ready(rows: int, nulls: bool) -> bool:
    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

    d = os.path.join(REPO, "tiny_fixtures", _suffix(rows, nulls))
    return all(
        os.path.exists(os.path.join(d, f"{t}.parquet")) for t in TABLE_NAMES
    )


def main() -> int:
    from tools.gen_tiny_fixture import build

    for rows, nulls in FIXTURES:
        if not fixture_ready(rows, nulls):
            print(f"tiny fixture {_suffix(rows, nulls)} absent — generating")
            build(rows, nulls=nulls)

    from pyspark.sql import SparkSession

    from tools.oracle_check import run_sweep
    from tools.scale_gate import registry_sha

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("tiny-gate")
        .config("spark.ui.enabled", "false")
        # capacity, not semantics (same note as scale_gate.py): the
        # default 1g driver heap OOMed the 3-fixture sweep partway
        # through sf5rN once ~1000 queries' caches and replay states
        # accumulated in one session (r13: Java heap OOM at o100308)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    failures = 0
    for rows, nulls in FIXTURES:
        fixture_dir = os.path.join(REPO, "tiny_fixtures", _suffix(rows, nulls))
        failures += run_sweep(
            spark, fixture_dir, label=f"tiny-gate-{_suffix(rows, nulls)}"
        )
        # drop the finished fixture's cached frames before the next
        # sweep — the per-sf_dir session caches are never re-read
        # once the sweep moves on, they only hold heap
        spark.catalog.clearCache()

    import __spark_entry__ as entrymod

    record = {
        "metric": "tiny_gate",
        "fixtures": [_suffix(r, n) for r, n in FIXTURES],
        "n_queries": len(entrymod.oracle_sql()),
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
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
