"""The union-tracker gate (VERDICT r6 #2): the r1 "fixed but never
re-windowed" slip class must be mechanically impossible. Every
registered query either has a driver-green CORRECTNESS row in some
committed round or holds a slot in the CURRENT window."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools import union_check


def test_no_forgotten_queries():
    registry = list(entrymod.queries())
    missing = union_check.forgotten(registry, list(entrymod.CHECKED_FIRST))
    assert not missing, (
        "queries with no driver-green row and no current-window slot "
        f"(rotate into CHECKED_FIRST): {missing}"
    )


def test_union_math_matches_committed_files():
    """Window closure arithmetic: green union + current window must
    cover the whole registry (the r7 design point — a green r7 run
    closes the union to 178/178)."""
    registry = set(entrymod.queries())
    union = set(union_check.green_union()) & registry
    window = set(entrymod.CHECKED_FIRST)
    assert union | window == registry
    # and the committed files are internally sane: no green row for a
    # name that was never registered (catches registry renames that
    # would silently orphan history)
    orphans = set(union_check.green_union()) - registry
    assert not orphans, orphans


def test_green_row_definition_strict():
    row_ok = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    assert union_check._is_green(row_ok)
    for k in ("rows_match", "schema_match", "hash_match"):
        assert not union_check._is_green({**row_ok, k: False})
    assert not union_check._is_green({**row_ok, "err": "boom"})
