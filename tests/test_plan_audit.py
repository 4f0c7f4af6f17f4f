"""Unit tests for the plan-audit heuristics (pure function — no Spark)."""

from tools.plan_audit import audit_plan


def test_flags_cartesian():
    assert "cartesian-product" in audit_plan("+- CartesianProduct\n   +- Scan parquet")


def test_flags_python_eval():
    assert "row-at-a-time-python" in audit_plan("+- BatchEvalPython [f(x)]")


def test_flags_bnlj_only_with_two_scans():
    one = "BroadcastNestedLoopJoin\n+- Scan parquet t1\n+- LocalTableScan"
    two = "BroadcastNestedLoopJoin\n+- Scan parquet t1\n+- Scan parquet t2"
    assert audit_plan(one) == []
    assert "bnlj-over-two-scans" in audit_plan(two)


def test_flags_wide_scan():
    wide = "ReadSchema: struct<a:int,b:int,c:int,d:int,e:int,f:int,g:int,h:int,i:int>"
    narrow = "ReadSchema: struct<a:int,b:int>"
    assert any(f.startswith("wide-scan") for f in audit_plan(wide))
    assert audit_plan(narrow) == []


def test_clean_plan():
    assert audit_plan("*(3) HashAggregate\n+- Exchange hashpartitioning\n+- Scan parquet") == []
