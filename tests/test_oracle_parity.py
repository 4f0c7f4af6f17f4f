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
        # round-10 window composition: the 50 never-driver-checked
        # queries (r9's WINDOW_OVERFLOW backlog), rotated to the head
        # by tools/rotate_window.py — map re-aligned to THIS window
        # per the rotation rule.
        "markov_backtest_hitrate": "Markov next-event backtest",
        "markov_reliability": "Markov calibration reliability",
        "user_ab_experiment_audit": "deterministic A/B bucketing audit",
        "event_arrival_burstiness": "Fano-factor burstiness",
        "embedding_triplet_mining": "triplet mining",
        "knn_ranking_eval": "kNN ranking eval (integer MRR)",
        "embedding_split_drift": "embedding split-drift audit",
        "part_itemitem_cosine_topk": "item-item CF cosine top-k",
        "part_copurchase_communities": "LPA communities",
        "part_copurchase_kcore": "k-core peeling",
        "part_copurchase_assortativity": "degree assortativity",
        "docs_quantile_norm_by_lang": "per-language quantile normalization",
        "dedup_lsh_recall_eval": "LSH recall eval",
        "dedup_lsh_scurve_eval": "LSH S-curve validation",
        "nation_supply_latency_paths": "supply latency path rollup",
        "parquet_schema_evolution_parity": "schema-evolution merge parity",
        "orders_capacity_queue_sim": "capacity queue simulation",
        "event_minute_value_lerp": "linear interpolation densify",
        "event_minute_crosscorr_lags": "lagged cross-correlation",
        "customer_kanonymity_profile": "k-anonymity histogram",
        "orders_fd_audit": "functional-dependency audit",
        "orders_total_reconciliation": "header-detail reconciliation",
        "brand_return_rates": "brand return-rate hotspots",
        "orders_cohort_ltv": "cohort LTV curves",
        "suppliers_serving_all_regions": "relational division",
        "customer_revenue_gini": "revenue Gini coefficient",
        "docs_phrase_search": "positional phrase search",
        "docs_bm25_search": "BM25 ranked search",
        "docs_hybrid_rrf_search": "hybrid RRF fusion search",
        "orders_fiscal_445_rollup": "4-4-5 fiscal calendar rollup",
        "revenue_mom_waterfall": "MoM revenue waterfall",
        "orders_ht_estimate_audit": "Horvitz-Thompson estimate audit",
        "orders_weekly_mann_kendall": "Mann-Kendall trend test",
        "orders_weekly_kendall_tau": "Kendall tau",
        "segment_price_ks_distance": "KS distance",
        "returnflag_quantity_mwu": "Mann-Whitney U / AUC",
        "orders_daily_runs_test": "Wald-Wolfowitz runs test",
        "partkey_selfjoin_cms_estimate": "CMS join-size estimate",
        "orders_daily_drawdown_records": "drawdown records",
        "orders_weekly_theilsen_trend": "Theil-Sen slope",
        "orders_daily_mad_anomalies": "MAD anomaly bands",
        "ship_latency_percentiles_by_nation": "exact group percentiles",
        "customer_repurchase_hazard": "repurchase hazard lifetable",
        "orders_weekly_isotonic_fit": "weighted isotonic regression",
        "event_value_conformal_bands": "split-conformal bands",
        "orders_revenue_bootstrap_ci": "Poisson bootstrap CI",
        "customer_censored_lifetable": "right-censored lifetable",
        "purchase_linear_attribution": "linear multi-touch attribution",
        "nation_median_spend_udaf": "pandas UDAF exact median",
        "docs_pmi_collocations": "PMI collocations",
        # cross-cutting families still represented in this window
        "dedup_": "dedup",
        "event_": "event analytics",
        "doc": "text/corpus analysis",
        "part_": "graph/affinity analytics",
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
