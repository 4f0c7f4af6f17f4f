"""Frame-sum lint (VERDICT r9 #4): SUM over an EMPTY window frame is
NULL in BOTH Spark and DuckDB, so the dual-engine hash oracle cannot
catch a missing COALESCE — the attribution operator silently dropped
every untouched purchase until a Python replay test flagged it
(r9, operators/temporal.py:338). This sweep makes the class
mechanically impossible to reintroduce: every ``F.sum(...).over(w)``
whose window frame can be empty (upper bound strictly before the
current row) must sit inside ``F.coalesce(...)``, in DataFrame code
and in embedded oracle SQL alike."""

from __future__ import annotations

import ast
import pathlib
import re

SRC = pathlib.Path(__file__).resolve().parent.parent / "end2end_data_pipeline_spark"


def _is_negative_const(node: ast.expr) -> bool:
    """True for an upper frame bound that excludes the current row:
    a negative literal (-1) or any expression whose outermost op is
    unary minus (e.g. ``-ATTR_WINDOW_S * 1_000_000`` stays negative
    only by convention, but a USub root is the signal we key on)."""
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return True
    return isinstance(node, ast.Constant) and isinstance(node.value, (int, float)) and node.value < 0


def _empty_capable_windows(tree: ast.AST) -> set[str]:
    """Names assigned a Window spec whose rows/rangeBetween upper
    bound is a negative literal — the frame is empty on the first
    row(s) of every partition."""
    names: set[str] = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign) or len(node.targets) != 1:
            continue
        target = node.targets[0]
        if not isinstance(target, ast.Name):
            continue
        for call in ast.walk(node.value):
            if (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Attribute)
                and call.func.attr in ("rowsBetween", "rangeBetween")
                and len(call.args) == 2
                and _is_negative_const(call.args[1])
            ):
                names.add(target.id)
    return names


def _risky_sum_overs(tree: ast.AST, windows: set[str]) -> list[ast.Call]:
    """Calls of shape F.sum(...).over(<empty-capable window>)."""
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "over"
            and isinstance(node.func.value, ast.Call)
            and isinstance(node.func.value.func, ast.Attribute)
            and node.func.value.func.attr == "sum"
            and len(node.args) == 1
            and isinstance(node.args[0], ast.Name)
            and node.args[0].id in windows
        ):
            out.append(node)
    return out


def _coalesced_descendants(tree: ast.AST) -> set[int]:
    """id()s of every node living inside an F.coalesce(...) call."""
    ids: set[int] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "coalesce"
        ):
            for child in ast.walk(node):
                ids.add(id(child))
    return ids


def test_dataframe_frame_sums_are_coalesced():
    offenders = []
    for path in sorted(SRC.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        # scope per function: window names like ``w`` are reused
        # across operators, and one function's empty-capable frame
        # must not taint another's current-row frame of the same name
        scopes = [
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for fn in scopes:
            windows = _empty_capable_windows(fn)
            if not windows:
                continue
            safe = _coalesced_descendants(fn)
            for call in _risky_sum_overs(fn, windows):
                if id(call) not in safe:
                    offenders.append(f"{path}:{call.lineno}")
    assert not offenders, (
        "F.sum(...).over(<frame that can be empty>) without "
        f"F.coalesce — NULL in both engines, the oracle is blind: {offenders}"
    )


# SQL side: a named WINDOW whose frame ends strictly before the
# current row ("... AND <n> PRECEDING") makes SUM(...) OVER w NULL on
# the first row(s). Require COALESCE( immediately around each use.
_SQL_EXCLUSIVE_WINDOW = re.compile(
    r"WINDOW\s+(\w+)\s+AS\s*\([^)]*\d+\s+PRECEDING\s*\)", re.I
)
_SQL_SUM_OVER = re.compile(r"SUM\s*\((?:[^()]|\([^()]*\))*\)\s+OVER\s+(\w+)", re.I)


def test_sql_frame_sums_are_coalesced():
    offenders = []
    for path in sorted(SRC.rglob("*.py")):
        text = path.read_text()
        exclusive = {m.group(1) for m in _SQL_EXCLUSIVE_WINDOW.finditer(text)}
        if not exclusive:
            continue
        for m in _SQL_SUM_OVER.finditer(text):
            if m.group(1) not in exclusive:
                continue
            prefix = text[max(0, m.start() - 12) : m.start()].upper()
            if "COALESCE(" not in prefix:
                line = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{path}:{line}")
    assert not offenders, (
        "SQL SUM(...) OVER <exclusive-frame window> without COALESCE "
        f"(NULL in both engines on the first rows): {offenders}"
    )
