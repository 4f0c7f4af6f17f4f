"""Replicates the driver's DuckDB-oracle gate at sf0.001 for every
registered query that declares an oracle: row count, column names and
order-insensitive value hash must all match."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import compare_query, duckdb_connection

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    result = compare_query(df, con, ORACLE[name])
    assert result["rows_match"], result
    assert result["cols_match"], result
    assert result["values_match"], {k: v for k, v in result.items() if k != "cols_spark"}
    assert result["types_safe"], result["unsafe_types"]


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_output_types_driver_safe(name, con):
    """Every oracle must emit only types the driver's renderer is
    trusted on (BIGINT/INTEGER/VARCHAR/DOUBLE) — e.g. DuckDB's
    SUM(BIGINT) returns HUGEINT, which the driver stringifies
    differently and hash-FAILs even when values are identical."""
    from tools.oracle_check import unsafe_oracle_types

    assert unsafe_oracle_types(con, ORACLE[name]) == []


def test_checked_window_contract():
    """The driver value-checks only the first 50 of ``queries()``.
    ``queries()`` is constructed FROM ``CHECKED_FIRST``, so comparing
    the two would be tautological (r5 ADVICE); assert the independent
    invariants instead: the window is 50 unique, registered,
    oracle-paired names; ``queries()`` loses no registered query while
    reordering; and the core operator families are represented. The
    family map must be re-aligned whenever CHECKED_FIRST rotates (it
    asserts the CURRENT window, not a historical one)."""
    window = entrymod.CHECKED_FIRST
    assert len(window) == len(set(window)) == 50
    missing = [n for n in window if n not in QUERIES]
    assert not missing, missing
    unoracled = [n for n in window if n not in ORACLE]
    assert not unoracled, unoracled
    # the driver-visible dict must cover the whole registry exactly
    from end2end_data_pipeline_spark.registry import QUERIES as RAW

    assert list(QUERIES)[: len(window)] == window
    assert set(QUERIES) == set(RAW)
    assert callable(entrymod.queries) and callable(entrymod.oracle_sql)
    families = {
        # round-12 window composition: the 15 queries registered in
        # r11 that had never been driver-checked (closing the union
        # at 336/336), rotated to the head by tools/rotate_window.py,
        # plus 35 staleness anchors — map re-aligned to THIS window
        # per the rotation rule.
        "source_shingle_overlap_matrix": "exact source overlap matrix",
        "source_shingle_overlap_kmv": "KMV theta-sketch algebra",
        "source_sketch_stream_replay": "KMV streaming merge replay",
        "source_ablation_deltas": "leave-one-out source ablations",
        "source_budget_apportionment": "Hamilton budget apportionment",
        "training_order_runs_audit": "shuffle-order runs audit",
        "length_bucket_batch_plan": "length-bucket batch plan",
        "curriculum_phase_plan": "curriculum phase plan",
        "bpe_vocab_prune_sweep": "BPE vocab prune sweep",
        "kmeans_silhouette_profile": "k-means silhouette eval",
        "ann_dim_truncation_recall": "ANN dim-truncation recall",
        "q2_min_cost_supplier": "TPC-H Q2 (partsupp)",
        "q9_product_type_profit": "TPC-H Q9 (partsupp)",
        "q11_important_stock": "TPC-H Q11 (partsupp)",
        "q20_excess_inventory_suppliers": "TPC-H Q20 (partsupp)",
        # staleness anchors still representing their families
        "nation_trade_pagerank": "iterative graph (pagerank)",
        "tfidf_top_terms": "text analysis (TF-IDF)",
        "boilerplate_prefix_groups": "dedup-adjacent text grouping",
        "event_funnel_conversion": "event analytics",
        "event_pairs_within_window": "self-join within window",
        "q8_market_share": "TPC-H-like relational",
        "order_priority_cube": "CUBE/rollup grouping",
        "user_value_intervals": "interval/window analytics",
        "props_k_distribution": "semistructured JSON",
        # cross-cutting families still represented in this window
        "event_": "event analytics prefix",
        "orders_": "orders analytics prefix",
        "lineitem_": "lineitem analytics prefix",
        "q1": "TPC-H tens (q10..q19)",
    }
    for prefix, family in families.items():
        assert any(n.startswith(prefix) for n in window), family


@pytest.mark.slow
def test_checked_window_parity_at_driver_sf(spark):
    """The driver's gate, replicated EXACTLY: the first 50 of
    ``queries()`` against their oracles at sf0.01 (the driver's scale
    factor, vs the sf0.001 the per-query parametrized tests use).
    Catches scale-dependent divergence — e.g. the r4 TIMESTAMP_NTZ
    breakage surfaced only on regenerated fixtures — one round early,
    on the exact query set the driver will hash."""
    sf = "/root/testdata/sf0.01"
    con = duckdb_connection(sf)
    try:
        bad = []
        for name in list(QUERIES)[:50]:
            r = compare_query(QUERIES[name](spark, sf), con, ORACLE[name])
            if not (
                r["rows_match"]
                and r["cols_match"]
                and r["values_match"]
                and r["types_safe"]
            ):
                bad.append((name, {k: r[k] for k in ("rows_match", "cols_match", "values_match", "types_safe")}))
        assert not bad, bad
    finally:
        con.close()


def test_every_query_runs(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
