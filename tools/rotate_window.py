"""Rotate the driver check window AND regenerate the catalog in one
run (VERDICT r8 #1: the two must never land in separate commits, or
the catalog gate goes red for a round).

Rewrites the ``CHECKED_FIRST = [...]`` block in ``__spark_entry__.py``
with the mechanical ``tools/union_check.py --propose-window`` output
(every query awaiting a driver-green row first, then the
least-recently-regreened anchors), then regenerates CATALOG.md against
the NEW window. Run after registering new queries, as the last
registry-touching step of a round:

    PYTHONPATH=. python tools/rotate_window.py --write
"""

from __future__ import annotations

import importlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")

BLOCK_RE = re.compile(r"CHECKED_FIRST = \[\n(?:    \"[^\"]+\",\n)*\]")
OVERFLOW_RE = re.compile(
    r"WINDOW_OVERFLOW: list\[str\] = \[(?:\]|\n(?:    \"[^\"]+\",\n)*\])"
)


def render_block(window: list[str]) -> str:
    body = "".join(f'    "{q}",\n' for q in window)
    return f"CHECKED_FIRST = [\n{body}]"


def render_overflow(overflow: list[str]) -> str:
    if not overflow:
        return "WINDOW_OVERFLOW: list[str] = []"
    body = "".join(f'    "{q}",\n' for q in overflow)
    return f"WINDOW_OVERFLOW: list[str] = [\n{body}]"


def rotate(write: bool = False) -> list[str]:
    from tools.union_check import propose_schedule

    sched = propose_schedule(50)
    window, overflow = sched["window"], sched["overflow"]
    if overflow:
        # registration freeze (VERDICT r10 #3, enforced by
        # tests/test_union_check.py): the whole awaiting set must fit
        # ONE driver round, so an overflow queue means registrations
        # outran the check budget — surface it at rotation time, when
        # the author can still trim the wave.
        print(
            f"WARNING: {len(overflow)} awaiting queries exceed the "
            "50-slot window (registration freeze breached; the union "
            "cannot re-close in one round)"
        )
    with open(ENTRY) as f:
        src = f.read()
    if not BLOCK_RE.search(src):
        raise RuntimeError("CHECKED_FIRST block not found in __spark_entry__.py")
    if not OVERFLOW_RE.search(src):
        raise RuntimeError(
            "WINDOW_OVERFLOW block not found in __spark_entry__.py"
        )
    new_src = BLOCK_RE.sub(render_block(window), src, count=1)
    new_src = OVERFLOW_RE.sub(render_overflow(overflow), new_src, count=1)
    if write:
        with open(ENTRY, "w") as f:
            f.write(new_src)
        # the entry module is cached from propose_window's import —
        # reload so the catalog renders against the NEW window
        import __spark_entry__ as entrymod

        importlib.reload(entrymod)
        from tools import gen_catalog

        text = gen_catalog.render()
        with open(os.path.join(REPO, "CATALOG.md"), "w") as f:
            f.write(text)
        print(
            f"rotated window (50, overflow {len(overflow)}) "
            f"+ wrote CATALOG.md ({text.count(chr(10))} lines)"
        )
        print(
            "REMINDER: re-align the family map in tests/"
            "test_oracle_parity.py::test_checked_window_contract to the "
            "new window (it asserts the CURRENT window, not a "
            "historical one), then run that test."
        )
    else:
        changed = new_src != src
        print("window would " + ("CHANGE" if changed else "stay identical"))
        for q in window:
            print(f"  {q}")
        for q in overflow:
            print(f"  # overflow (next round): {q}")
    return window


if __name__ == "__main__":
    rotate(write="--write" in sys.argv)
