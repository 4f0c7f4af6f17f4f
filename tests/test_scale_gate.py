"""Enforces the per-round scale gate (VERDICT r12 #3) without paying
its runtime inside pytest: ``tools/scale_gate.py`` runs the whole
registry strictly at sf0.3 once per round and commits ``SCALE_GATE.json``
with a registry fingerprint; this test fails the suite whenever that
record is missing, not green, or stale against the CURRENT registry
(any query registration/removal or oracle edit changes the sha).

The division of labor: the r12 sf0.3 sweep caught a real int64 OLS
overflow that sf0.01 rehearsal structurally cannot see, so the sweep
must fire every round — but it costs ~20 min, so the suite asserts the
committed evidence instead of re-running it."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_PATH = os.path.join(REPO, "SCALE_GATE.json")


def test_scale_gate_record_green_and_current():
    assert os.path.exists(GATE_PATH), (
        "SCALE_GATE.json missing — run `PYTHONPATH=. python "
        "tools/scale_gate.py` (regenerates the sf0.3 fixture if absent, "
        "strict-sweeps the whole registry, writes the record)"
    )
    with open(GATE_PATH) as f:
        record = json.load(f)
    assert record["all_match"] and record["failures"] == 0, record
    assert record["sf"] == "0.3", record

    from tools.scale_gate import registry_sha
    import __spark_entry__ as entrymod

    assert record["n_queries"] == len(entrymod.oracle_sql()), (
        "registry size changed since the last scale-gate run — re-run "
        "tools/scale_gate.py",
        record["n_queries"],
        len(entrymod.oracle_sql()),
    )
    assert record["registry_sha"] == registry_sha(), (
        "registry contents changed since the last scale-gate run "
        "(a query or oracle was added/edited) — re-run tools/scale_gate.py"
    )


def test_tiny_gate_record_green_and_current():
    """The low-scale pole (tools/tiny_gate.py): whole registry strict
    at the 1-row, 5-row, and 5-row-null-flood fixtures once per round,
    evidence committed. First runs caught a NULL-vs-0 divergence
    (embedding_centroid_margin_profile, single-label slice) and then
    22 null-semantics divergences across the registry."""
    gate = os.path.join(REPO, "TINY_GATE.json")
    assert os.path.exists(gate), (
        "TINY_GATE.json missing — run `PYTHONPATH=. python "
        "tools/tiny_gate.py` (regenerates the 1/5-row fixtures if "
        "absent, strict-sweeps the whole registry on both)"
    )
    with open(gate) as f:
        record = json.load(f)
    assert record["all_match"] and record["failures"] == 0, record
    assert record["fixtures"] == ["sf1r", "sf5r", "sf5rN"], record

    from tools.scale_gate import registry_sha
    import __spark_entry__ as entrymod

    assert record["n_queries"] == len(entrymod.oracle_sql()), (
        "registry size changed since the last tiny-gate run — re-run "
        "tools/tiny_gate.py",
        record["n_queries"],
        len(entrymod.oracle_sql()),
    )
    assert record["registry_sha"] == registry_sha(), (
        "registry contents changed since the last tiny-gate run — "
        "re-run tools/tiny_gate.py"
    )
