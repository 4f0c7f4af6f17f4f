"""Semantic invariants of BM25 ranked retrieval and label-propagation
communities beyond the hash oracle: BM25 scores must equal a Python
recomputation of the Robertson formula, and the community partition
must match a reference synchronous LPA."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.affinity import (
    LPA_ITERS,
    LPA_TOP,
    MIN_SUPPORT,
)
from end2end_data_pipeline_spark.operators.reporting_ext import (
    BM25_TOP,
    SEARCH_TERMS,
)

SF = "/root/testdata/sf0.001"


def test_bm25_scores_match_python_recomputation(spark):
    rows = entrymod.queries()["docs_bm25_search"](spark, SF).collect()
    assert rows, "BM25 returned no rows at sf0.001"
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    N = len(toks)
    S = sum(len(t) for t in toks.values())
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in SEARCH_TERMS}

    def score(doc_id):
        ts = toks[doc_id]
        dl = len(ts)
        c = Counter(ts)
        s = 0.0
        for t in SEARCH_TERMS:
            tf = c.get(t, 0)
            s += (
                float(2 * (N - df[t]) + 1)
                / (2 * df[t] + 1)
                * (44 * tf * S)
                / (20 * S * tf + 6 * S + 18 * dl * N)
            )
        return s

    scored = [
        (d, score(d))
        for d, ts in toks.items()
        if any(t in ts for t in SEARCH_TERMS)
    ]
    expect = sorted(scored, key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
    assert [(r["doc_id"], r["score"]) for r in rows] == expect
    for r in rows:
        assert sum(r[f"tf_{t}"] for t in SEARCH_TERMS) > 0
        assert r["dl"] == len(toks[r["doc_id"]])
        assert r["score"] > 0


def test_lpa_matches_reference_propagation(spark):
    rows = entrymod.queries()["part_copurchase_communities"](
        spark, SF
    ).collect()
    assert rows
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
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
        """
    ).fetchall()
    nbrs = defaultdict(list)
    for u, v in e0:
        nbrs[u].append(v)
        nbrs[v].append(u)
    label = {n: n for n in nbrs}
    for _ in range(LPA_ITERS):
        nxt = {}
        for n, ns in nbrs.items():
            c = Counter(label[m] for m in ns)
            nxt[n] = min(
                c, key=lambda lab: (-c[lab], lab)
            )  # most frequent, tie -> smallest
        label = nxt
    comm = defaultdict(list)
    for n, lab in label.items():
        comm[lab].append(n)
    expect = sorted(
        ((lab, len(ns), min(ns), max(ns)) for lab, ns in comm.items()),
        key=lambda t: (-t[1], t[0]),
    )[:LPA_TOP]
    got = [
        (r["community"], r["n_parts"], r["min_part"], r["max_part"])
        for r in rows
    ]
    assert got == expect
    # a community's representative label is one of its members
    assert all(r["min_part"] <= r["community"] <= r["max_part"] for r in rows)


def test_cohort_ltv_curve_invariants(spark):
    rows = entrymod.queries()["orders_cohort_ltv"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    first = {}
    for r in orders:
        midx = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
        first[r["o_custkey"]] = min(first.get(r["o_custkey"], midx), midx)
    from collections import Counter

    sizes = Counter(first.values())
    # cohort sizes partition the buying customers
    assert sum(sizes.values()) == len(first)
    per_cohort = defaultdict(list)
    for r in rows:
        y, m = r["cohort_month"].split("-")
        cidx = int(y) * 12 + int(m) - 1
        assert r["cohort_size"] == sizes[cidx]
        assert 1 <= r["n_active"] <= r["cohort_size"]
        per_cohort[r["cohort_month"]].append(r)
    for label, cells in per_cohort.items():
        # rows arrive ordered by age; cumulative revenue reconciles
        # with the per-period column and the LTV division
        run = 0
        assert cells[0]["age_months"] == 0
        for c in cells:
            run += c["revenue_cents"]
            assert c["cum_revenue_cents"] == run
            assert (
                c["ltv_per_customer"]
                == float(run) / c["cohort_size"] / 100
            )
