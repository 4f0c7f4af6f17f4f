"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline's
per-event-type SUCCESS/ERROR pivot — ``airflow/dags/spark.py:17-46`` —
re-expressed over the driver ``events`` table) at sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator registry;
every operator module in ``end2end_data_pipeline_spark/operators/``
registers its queries + DuckDB oracle SQL on import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import end2end_data_pipeline_spark.operators  # noqa: F401  (registers queries)
from end2end_data_pipeline_spark.registry import ORACLE, QUERIES, QueryFn

SF0001_DIR = "/root/testdata/sf0.001"

# The driver's correctness gate checks the FIRST 50 registered queries
# (registration order); the rest are covered by the identical local
# gate (tests/test_oracle_parity.py runs all of them). The window
# ROTATES per round so the union of driver-green rows converges on the
# whole registry: round 3 keeps one proven anchor per operator family
# (all 50/50 green in CORRECTNESS_r02) and fills the other 35 slots
# with queries the driver has never checked — the round-2 families
# that shipped outside the window (sampling, CDC/SCD, gap-fill /
# transition, set-ops / rollup / cube, window functions, formats,
# TPC-H Q7/Q8/Q15/Q17/Q21, IVF multi-probe, TF-IDF) plus every
# round-3 query (scrubbing, k-means, incremental dedup).
CHECKED_FIRST = [
    # proven family anchors (driver-green in CORRECTNESS_r02)
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "event_status_pivot",
    "event_sessionization",
    "multimodal_decode_features",
    "props_k_extract",
    "knn_bruteforce",
    "asof_last_view_before_purchase",
    "text_quality_scores",
    "nation_trade_pagerank",
    "q3_shipping_priority",
    "corpus_pack_chunks",
    "top_revenue_orders",
    "customer_running_spend",
    "lineitem_pricing_summary",
    # round 3: PII scrubbing + normalization
    "docs_scrubbed",
    "docs_scrubbed_stats",
    "docs_normalized_profile",
    # round 3: Lloyd's k-means (exact fixed-point)
    "kmeans_assignments",
    "kmeans_cluster_profile",
    # round 3: incremental cross-snapshot dedup
    "incr_dedup_decisions",
    "incr_dedup_stats",
    # sampling / splits (never driver-checked before round 3)
    "docs_split_assign",
    "docs_stratified_sample",
    "docs_per_source_sample",
    # CDC / SCD / windowed dedup
    "latest_event_per_user",
    "user_value_intervals",
    "event_dedup_within_window",
    # time-series gap-fill / transitions / sliding windows
    "event_minute_gapfill",
    "event_transition_matrix",
    "event_sliding_window_counts",
    # set ops / rollup / cube / grouping sets
    "shared_nations",
    "customer_only_nations",
    "order_priority_cube",
    "orders_grouping_sets",
    "region_customer_rollup",
    # window functions / unpivot
    "customer_order_bookends",
    "orders_moving_revenue",
    "lineitem_charge_unpivot",
    # formats / timezone / epoch round-trip
    "string_munging_props",
    "epoch_ms_roundtrip",
    "event_tehran_display",
    # TPC-H shapes never driver-checked
    "q7_volume_shipping",
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # ANN multi-probe + centroids, TF-IDF
    "ann_ivf_topk_nprobe",
    "label_centroids",
    "tfidf_top_terms",
]


def _ordered_queries() -> dict[str, QueryFn]:
    missing = [n for n in CHECKED_FIRST if n not in QUERIES]
    assert not missing, f"CHECKED_FIRST names not registered: {missing}"
    assert len(CHECKED_FIRST) == len(set(CHECKED_FIRST)) == 50
    unoracled = [n for n in CHECKED_FIRST if n not in ORACLE]
    assert not unoracled, f"checked-window queries lack oracles: {unoracled}"
    rest = [n for n in QUERIES if n not in set(CHECKED_FIRST)]
    return {n: QUERIES[n] for n in [*CHECKED_FIRST, *rest]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["event_status_pivot"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted entries get the
    driver's weaker rows-only check)."""
    return dict(ORACLE)
