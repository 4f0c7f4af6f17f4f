"""Invariants of degree assortativity and the FD audit beyond the
hash oracle: Python recomputations from raw rows."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.graph import KCORE_MIN_SUPPORT
from end2end_data_pipeline_spark.operators.quality import FD_CANDIDATES

SF = "/root/testdata/sf0.001"


def test_assortativity_matches_python(spark):
    rows = entrymod.queries()["part_copurchase_assortativity"](
        spark, SF
    ).collect()
    assert len(rows) == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    p0 = con.execute(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}
        """
    ).fetchall()
    edges = [(u, v) for u, v in p0] + [(v, u) for u, v in p0]
    deg: Counter = Counter()
    for u, _ in edges:
        deg[u] += 1
    xs = [deg[u] for u, _ in edges]
    ys = [deg[v] for _, v in edges]
    n = len(edges)
    r = rows[0]
    assert r["n_directed_edges"] == n
    assert r["n_nodes"] == len(deg)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    if den == 0:
        assert r["assortativity_r"] is None
    else:
        assert abs(r["assortativity_r"] - (n * sxy - sx * sy) / den) < 1e-9
        assert -1.0 - 1e-9 <= r["assortativity_r"] <= 1.0 + 1e-9
    # symmetric edge list: x- and y-degree sums coincide
    assert sx == sy and sxx == syy


def test_fd_audit_matches_python(spark):
    rows = entrymod.queries()["orders_fd_audit"](spark, SF).collect()
    assert len(rows) == len(FD_CANDIDATES)
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    got = {
        r["candidate"]: (
            r["n_determinants"],
            r["n_violating"],
            r["n_rows_affected"],
            r["holds"],
        )
        for r in rows
    }
    for det, dep in FD_CANDIDATES:
        vals: dict = defaultdict(lambda: [set(), 0])
        for r in orders:
            e = vals[str(r[det])]
            e[0].add(str(r[dep]))
            e[1] += 1
        n_viol = sum(1 for deps, _ in vals.values() if len(deps) > 1)
        n_rows = sum(c for deps, c in vals.values() if len(deps) > 1)
        assert got[f"{det}->{dep}"] == (
            len(vals),
            n_viol,
            n_rows,
            int(n_viol == 0),
        )
    # the key dependencies hold; the behavioral ones are violated
    assert got["o_orderkey->o_custkey"][3] == 1
    assert got["o_orderkey->o_orderstatus"][3] == 1
