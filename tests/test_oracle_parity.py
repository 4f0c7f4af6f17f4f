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
        # round-13 window composition: the union closed at 336/336 in
        # r12, so this rotation is pure staleness refresh — the 50
        # rows whose last green check is oldest (~r9 vintage) — map
        # re-aligned to THIS window per the rotation rule.
        "q4_order_priority": "TPC-H Q4 (EXISTS semi-join)",
        "q5_local_supplier_volume": "TPC-H Q5 (multi-join)",
        "q3_shipping_priority": "TPC-H Q3 (+ bucketed twin)",
        "sql_region_summary": "parameterized SQL surface",
        "training_corpus_filter": "quality-gate corpus filter",
        "token_count_histogram": "token-count text stats",
        "vocab_top_tokens": "vocabulary extraction",
        "bigram_surprise_profile": "bigram-LM surprise",
        "ann_recall_eval": "ANN recall eval",
        "ann_ivf_topk_nprobe": "IVF multi-probe ANN",
        "knn_bruteforce": "brute-force kNN baseline",
        "knn_label_confusion": "kNN label confusion eval",
        "kmeans_assignments": "k-means assignment",
        "dedup_band_stats": "MinHash-LSH band diagnostics",
        "dedup_containment_pairs": "containment near-dup pairs",
        "docs_chunk_overlap": "chunking with overlap",
        "corpus_pack_chunks": "sequence packing",
        "eval_contamination": "eval-set contamination",
        "embedding_lsh_buckets": "embedding LSH bucketing",
        "embedding_quantization_profile": "embedding quantization",
        "customer_rfm_segments": "RFM segmentation (+ bucketed twin)",
        "customer_rolling_30d_spend": "rolling window frame",
        "customer_spend_tier_transitions": "lag/tier transitions",
        "user_retention_cohorts": "cohort retention",
        "asof_last_view_before_purchase": "as-of join",
        "part_copurchase_lift": "co-purchase lift self-join",
        "part_name_typo_pairs": "edit-distance typo pairs",
        "key_skew_profile": "skew diagnostics",
        "minute_anomaly_ratio": "anomaly-ratio analytics",
        "doc_length_gini_by_lang": "Gini concentration by language",
        "docs_split_assign": "deterministic split assignment",
        # cross-cutting families still represented in this window
        "event_": "event analytics prefix",
        "events_approx_": "approx sketch aggregates",
        "orders_": "orders analytics prefix",
        "lineitem_": "lineitem analytics prefix",
        "docs_": "documents-table prefix",
        "embedding_": "embeddings-table prefix",
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
