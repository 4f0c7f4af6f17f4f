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
        # round-9 second-window composition: ALL 32 awaiting r9
        # registrations first (tools/rotate_window.py puts every
        # awaiting query at the head), then the stalest greens — map
        # re-aligned to THIS window per the rotation rule.
        "docs_shard_skew_profile": "distributed shard-writer audit",
        "avro_ocf_roundtrip": "Avro OCF serde parity",
        "orc_roundtrip": "ORC format parity",
        "xml_roundtrip": "XML format parity",
        "csv_": "csv quarantine ingest parity (batch + stream)",
        "image_png_parity": "image codec parity",
        "ann_pq_topk": "PQ asymmetric-distance search",
        "ann_ivfpq_topk": "IVF-PQ composed search",
        "warehouse_compaction_audit": "small-file compaction audit",
        "event_dedup_stream_replay": "streaming dedup replay",
        "view_purchase_stream_join_replay": "stream-stream join replay",
        "error_streak_stream_replay": "custom stateful streak replay",
        "first_seen_stream_replay": "stateful first-seen replay",
        "sliding_window_stream_replay": "sliding-window replay",
        "enrich_stream_static_replay": "stream-static join replay",
        "upsert_sink_stream_replay": "foreachBatch upsert sink",
        "state_store_audit": "state-store introspection",
        "vocab_heavy_hitters": "Misra-Gries heavy hitters",
        "part_copurchase_triangles": "oriented triangle counting",
        "dedup_prefixfilter_pairs": "prefix-filter near-dup join",
        "lineitem_zorder_zonemap": "z-order zone-map audit",
        "lineitem_corr_matrix": "correlation profiling",
        "orders_daily_ols_trend": "OLS trend",
        "props_variant_profile": "VARIANT semi-structured tier",
        "python_datasource_parity": "custom Python source (batch)",
        "python_datasource_stream_parity": "custom Python source (stream)",
        "nation_cosupply_bfs_recursive": "recursive CTE",
        "nation_top2_customers_lateral": "LATERAL subquery",
        "snapshot_reconcile_audit": "digest-diff snapshot reconcile",
        "bloom_prefilter_audit": "bloom semi-join prefilter",
        "order_allocation_proration": "largest-remainder allocation",
        "udtf_token_runs": "Arrow Python UDTF",
        "scd2_customer_tier_history": "SCD Type-2 dimension build",
        "region_nation_revenue_share": "share-of-parent rollup",
        "scd2_point_in_time_join": "SCD2 as-of consumption join",
        "customer_spend_rank_bands": "ntile/percent_rank/cume_dist",
        "orders_daily_ewma16": "exact EWMA smoother",
        # round-9 third window: the reporting/serving tier fills the
        # last 9 slots (all 50 now await their first driver green —
        # a green run closes the union at 249/249)
        "session_concurrency_timeline": "sweep-line concurrency",
        "user_activity_bitmap": "day-activity bitmap index",
        "user_count_cms_audit": "count-min sketch audit",
        "part_price_size_skyline": "2-D Pareto skyline",
        "orders_keyset_pagination": "keyset pagination parity",
        "nation_customer_listagg": "deterministic LISTAGG",
        "segment_nation_chisq": "chi-square contingency",
        "customer_order_gap_median": "exact median order gap",
        "docs_conjunctive_search": "conjunctive posting search",
        # cross-cutting families still represented in this window
        # (the image_png_parity entry above carries the
        # multimodal-codec family)
        "dedup_": "dedup",
        "event_": "event analytics",
        "ann_": "similarity",
        "doc": "text/corpus analysis",
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
