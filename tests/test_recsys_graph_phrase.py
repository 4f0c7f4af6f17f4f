"""Semantic invariants of the item-item CF, weighted shortest-path,
and positional phrase-search operators beyond the hash oracle: CF
scores must equal a Python recomputation of the capped incidence,
distances must match a reference Bellman-Ford, and phrase counts must
count overlapping occurrences."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.affinity import (
    CF_DEGREE_CAP,
    CF_MIN_CO,
    CF_TOP_K,
)
from end2end_data_pipeline_spark.operators.graph import (
    SP_ITERS,
    SP_SOURCE,
    _SP_EDGES_SQL,
)
from end2end_data_pipeline_spark.operators.reporting_ext import PHRASE

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_cf_scores_match_python_recomputation(spark):
    rows = entrymod.queries()["part_itemitem_cosine_topk"](spark, SF).collect()
    assert rows, "CF returned no rows at sf0.001"
    con = _duck()
    buys = con.execute(
        """
        SELECT o_custkey, l_partkey, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per_cust = defaultdict(list)
    for c, p, n in buys:
        per_cust[c].append((-n, p))
    sets = defaultdict(set)
    for c, items in per_cust.items():
        for _, p in sorted(items)[:CF_DEGREE_CAP]:
            sets[c].add(p)
    cust_of_part = defaultdict(set)
    for c, parts in sets.items():
        for p in parts:
            cust_of_part[p].add(c)
    seen_ranks = defaultdict(list)
    for r in rows:
        a, b = r["part_a"], r["part_b"]
        co = len(cust_of_part[a] & cust_of_part[b])
        assert co == r["co"] >= CF_MIN_CO, (a, b, co, r["co"])
        assert len(cust_of_part[a]) == r["n_a"]
        assert len(cust_of_part[b]) == r["n_b"]
        expect = r["co"] / math.sqrt(r["n_a"] * r["n_b"])
        assert r["cosine"] == expect, (a, b)
        assert 1 <= r["nbr_rank"] <= CF_TOP_K
        seen_ranks[a].append(r["nbr_rank"])
    # within a part's emitted neighbors, ranks are distinct
    for a, ranks in seen_ranks.items():
        assert len(ranks) == len(set(ranks)), a


def test_shortest_paths_match_reference_bellman_ford(spark):
    rows = entrymod.queries()["nation_supply_latency_paths"](spark, SF).collect()
    assert rows
    edges = _duck().execute(_SP_EDGES_SQL).fetchall()
    dist = {SP_SOURCE: 0}
    for _ in range(SP_ITERS):
        nxt = dict(dist)
        for src, dst, w in edges:
            if src in dist and dist[src] + w < nxt.get(dst, float("inf")):
                nxt[dst] = dist[src] + w
        dist = nxt
    got = {r["node"]: r["dist_days"] for r in rows}
    assert got == dist
    assert got[SP_SOURCE] == 0
    assert sorted(r["node"] for r in rows) == [r["node"] for r in rows]


def test_phrase_counts_overlapping_occurrences(spark):
    rows = entrymod.queries()["docs_phrase_search"](spark, SF).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    counts = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE[0] and toks[i + 1] == PHRASE[1]
        )
        if n:
            counts[doc_id] = n
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["doc_id"], r["phrase_tf"]) for r in rows] == expect


def test_phrase_combinator_counts_adjacent_repeats(spark):
    """'x x x' contains 'x x' twice (overlapping) — the shape a
    substring-replace counter undercounts."""
    import tempfile

    d = tempfile.mkdtemp(prefix="phrase_edge_")
    p0, p1 = PHRASE
    df = spark.createDataFrame(
        [
            (0, f"{p0} {p1} {p0} {p1}"),  # 2 occurrences, shared middle
            (1, f"{p0} {p0} {p1}"),  # 1 — first p0 doesn't pair
            (2, f"{p1} {p0}"),  # 0 — reversed
            (3, p0),  # 0 — single token
        ],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = entrymod.queries()["docs_phrase_search"](spark, d)
    got = {r["doc_id"]: r["phrase_tf"] for r in rows.collect()}
    assert got == {0: 2, 1: 1}
