"""Semantic invariants of the exact group percentiles, the repurchase
hazard curve, and bounded k-core peeling beyond the hash oracle: each
must equal an independent Python recomputation from raw rows."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.graph import (
    KCORE_K,
    KCORE_MIN_SUPPORT,
    KCORE_ROUNDS,
)
from end2end_data_pipeline_spark.operators.stats_ext import HAZARD_MAX_GAP

SF = "/root/testdata/sf0.001"


def _nearest_rank(sorted_vals, q):
    n = len(sorted_vals)
    idx = -(-q * n // 100)  # ceil(q*n/100)
    return sorted_vals[idx - 1]


def test_percentiles_match_python_nearest_rank(spark):
    rows = entrymod.queries()["ship_latency_percentiles_by_nation"](
        spark, SF
    ).collect()
    assert rows
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    raw = con.execute(
        """
        SELECT n_name,
               CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 86400)
                    AS BIGINT)
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        """
    ).fetchall()
    per = defaultdict(list)
    for nat, d in raw:
        per[nat].append(d)
    got = {
        r["nation"]: (r["n_lineitems"], r["p50_days"], r["p95_days"], r["p99_days"])
        for r in rows
    }
    expect = {}
    for nat, vals in per.items():
        vals.sort()
        expect[nat] = (
            len(vals),
            _nearest_rank(vals, 50),
            _nearest_rank(vals, 95),
            _nearest_rank(vals, 99),
        )
    assert got == expect


def test_hazard_matches_python_lifetable(spark):
    rows = entrymod.queries()["customer_repurchase_hazard"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    gaps = Counter()
    for seq in by_cust.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            gaps[int((b - a).total_seconds() // 86400)] += 1
    total = sum(gaps.values())
    expect = []
    seen = 0
    for g in sorted(gaps):
        at_risk = total - seen
        if g <= HAZARD_MAX_GAP:
            expect.append((g, gaps[g], at_risk, gaps[g] / at_risk))
        seen += gaps[g]
    got = [
        (r["gap_days"], r["n_events"], r["n_at_risk"], r["hazard"])
        for r in rows
    ]
    assert got == expect
    # the at-risk set shrinks monotonically and hazards are proper
    assert all(0 < h <= 1 for *_, h in got)


def test_kcore_matches_python_peeling(spark):
    rows = entrymod.queries()["part_copurchase_kcore"](spark, SF).collect()
    assert len(rows) == KCORE_ROUNDS
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    e0 = con.execute(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}
        """
    ).fetchall()
    edges = {(u, v) for u, v in e0}
    expect = []
    for r in range(KCORE_ROUNDS):
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
        nodes = {n for e in edges for n in e}
        expect.append((r + 1, len(nodes), len(edges)))
    got = [(r["round"], r["n_nodes"], r["n_edges"]) for r in rows]
    assert got == expect
    # peeling is monotone: censuses never grow
    for (r1, n1, e1), (r2, n2, e2) in zip(got, got[1:]):
        assert n2 <= n1 and e2 <= e1
