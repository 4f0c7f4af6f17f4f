"""Frame-sum lint (VERDICT r9 #4): SUM over an EMPTY window frame is
NULL in BOTH Spark and DuckDB, so the dual-engine hash oracle cannot
catch a missing COALESCE — the attribution operator silently dropped
every untouched purchase until a Python replay test flagged it
(r9, operators/temporal.py:338). This sweep guards the shapes the
codebase uses (named window variables — function- or module-level,
single or chained assigns — inline Window specs passed straight to
``.over``, and SQL frames both as named ``WINDOW w AS (...)`` clauses
and inline ``OVER (...)``): every ``F.sum(...).over(<frame that can
be empty>)`` must sit inside ``F.coalesce(...)``, and every SQL
``SUM(...) OVER`` with an exclusive frame must sit inside
``COALESCE(...)``. A genuinely novel construction can still slip
through (this is a lint, not a prover) — pair new window shapes with
a replay test."""

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


def _contains_empty_between(node: ast.AST) -> bool:
    """Any rows/rangeBetween call under ``node`` whose upper bound is
    negative — the frame is empty on the first row(s)."""
    for call in ast.walk(node):
        if (
            isinstance(call, ast.Call)
            and isinstance(call.func, ast.Attribute)
            and call.func.attr in ("rowsBetween", "rangeBetween")
            and len(call.args) == 2
            and _is_negative_const(call.args[1])
        ):
            return True
    return False


def _empty_capable_windows(scope: ast.AST) -> set[str]:
    """Names assigned (directly in this scope's statements, including
    chained multi-target assigns) a Window spec with an empty-capable
    frame."""
    names: set[str] = set()
    for node in ast.walk(scope):
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
            value = node.value
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
            value = node.value
        else:
            continue
        if _contains_empty_between(value):
            for t in targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
    return names


def _risky_sum_overs(
    scope: ast.AST, windows: set[str]
) -> list[ast.Call]:
    """Calls of shape F.sum(...).over(<empty-capable window>), where
    the window is a known name OR an inline Window spec."""
    out = []
    for node in ast.walk(scope):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "over"
            and isinstance(node.func.value, ast.Call)
            and isinstance(node.func.value.func, ast.Attribute)
            and node.func.value.func.attr == "sum"
            and len(node.args) == 1
        ):
            continue
        arg = node.args[0]
        risky = (isinstance(arg, ast.Name) and arg.id in windows) or (
            not isinstance(arg, ast.Name) and _contains_empty_between(arg)
        )
        if risky:
            out.append(node)
    return out


def _coalesced_descendants(scope: ast.AST) -> set[int]:
    """id()s of every node living inside an F.coalesce(...) call."""
    ids: set[int] = set()
    for node in ast.walk(scope):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "coalesce"
        ):
            for child in ast.walk(node):
                ids.add(id(child))
    return ids


def _module_level_windows(tree: ast.Module) -> set[str]:
    """Windows assigned at module top level (visible to every
    function in the file)."""
    names: set[str] = set()
    for stmt in tree.body:
        names |= _empty_capable_windows_shallow(stmt)
    return names


def _empty_capable_windows_shallow(stmt: ast.stmt) -> set[str]:
    if isinstance(stmt, (ast.Assign, ast.AnnAssign)):
        wrapper = ast.Module(body=[stmt], type_ignores=[])
        return _empty_capable_windows(wrapper)
    return set()


def _file_offenders(tree: ast.Module, path: str) -> list[str]:
    offenders = []
    module_windows = _module_level_windows(tree)
    # scope per function: window names like ``w`` are reused across
    # operators, and one function's empty-capable frame must not
    # taint another's current-row frame of the same name. Function
    # locals SHADOW a module-level name of the same spelling.
    scopes: list[ast.AST] = [
        n
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    for fn in scopes:
        local = _empty_capable_windows(fn)
        assigned_here = {
            t.id
            for n in ast.walk(fn)
            if isinstance(n, ast.Assign)
            for t in n.targets
            if isinstance(t, ast.Name)
        }
        windows = local | (module_windows - assigned_here)
        safe = _coalesced_descendants(fn)
        for call in _risky_sum_overs(fn, windows):
            if id(call) not in safe:
                offenders.append(f"{path}:{call.lineno}")
    return offenders


def test_dataframe_frame_sums_are_coalesced():
    offenders = []
    for path in sorted(SRC.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        offenders.extend(_file_offenders(tree, str(path)))
    assert not offenders, (
        "F.sum(...).over(<frame that can be empty>) without "
        f"F.coalesce — NULL in both engines, the oracle is blind: {offenders}"
    )


# SQL side, two shapes:
# - a named WINDOW whose frame ends strictly before the current row
#   ("... AND <n> PRECEDING"): SUM(...) OVER w is NULL on the first
#   row(s) — require COALESCE( immediately around each use;
# - an inline OVER (... <n> PRECEDING) frame on the SUM itself.
_SQL_EXCLUSIVE_WINDOW = re.compile(
    r"WINDOW\s+(\w+)\s+AS\s*\([^)]*\d+\s+PRECEDING\s*\)", re.I
)
_SQL_SUM_OVER = re.compile(r"SUM\s*\((?:[^()]|\([^()]*\))*\)\s+OVER\s+(\w+)", re.I)
_SQL_SUM_OVER_INLINE = re.compile(
    r"SUM\s*\((?:[^()]|\([^()]*\))*\)\s+OVER\s*\([^()]*\d+\s+PRECEDING\s*\)",
    re.I,
)


def _coalesced_at(text: str, start: int) -> bool:
    return "COALESCE(" in text[max(0, start - 12) : start].upper()


def test_sql_frame_sums_are_coalesced():
    offenders = []
    for path in sorted(SRC.rglob("*.py")):
        text = path.read_text()
        exclusive = {m.group(1) for m in _SQL_EXCLUSIVE_WINDOW.finditer(text)}
        for m in _SQL_SUM_OVER.finditer(text):
            if m.group(1) in exclusive and not _coalesced_at(text, m.start()):
                line = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{path}:{line}")
        for m in _SQL_SUM_OVER_INLINE.finditer(text):
            if not _coalesced_at(text, m.start()):
                line = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{path}:{line}")
    assert not offenders, (
        "SQL SUM(...) OVER <exclusive frame> without COALESCE "
        f"(NULL in both engines on the first rows): {offenders}"
    )


def test_lint_fires_on_every_guarded_shape():
    """The lint's own regression test: each shape the docstring
    claims to guard must actually produce an offender, and the
    coalesced forms must not."""
    bad = """
def op_named():
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    return df.select(F.sum("x").over(w))

def op_inline():
    return df.select(
        F.sum("x").over(
            Window.orderBy("d").rangeBetween(Window.unboundedPreceding, -1)
        )
    )

def op_chained():
    w = base = Window.orderBy("d").rowsBetween(-5, -1)
    return df.select(F.sum("x").over(base))

def op_ok():
    w2 = Window.orderBy("d").rangeBetween(-5, -1)
    return df.select(F.coalesce(F.sum("x").over(w2), F.lit(0)))

def op_ok_current_row():
    w3 = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return df.select(F.sum("x").over(w3))

MODW = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)

def op_module_window():
    return df.select(F.sum("x").over(MODW))

def op_shadows_module_window():
    MODW = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return df.select(F.sum("x").over(MODW))
"""
    tree = ast.parse(bad)
    offenders = _file_offenders(tree, "<test>")
    assert len(offenders) == 4, offenders

    sql = (
        'x = """COALESCE(SUM(a) OVER w, 0), SUM(b) OVER w, '
        "SUM(c) OVER (ORDER BY d ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), "
        "COALESCE(SUM(e) OVER (ORDER BY d ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0) "
        "FROM t WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING "
        'AND 1 PRECEDING)"""'
    )
    exclusive = {m.group(1) for m in _SQL_EXCLUSIVE_WINDOW.finditer(sql)}
    named_bad = [
        m
        for m in _SQL_SUM_OVER.finditer(sql)
        if m.group(1) in exclusive and not _coalesced_at(sql, m.start())
    ]
    inline_bad = [
        m
        for m in _SQL_SUM_OVER_INLINE.finditer(sql)
        if not _coalesced_at(sql, m.start())
    ]
    assert len(named_bad) == 1, [m.group(0) for m in named_bad]
    assert len(inline_bad) == 1, [m.group(0) for m in inline_bad]
