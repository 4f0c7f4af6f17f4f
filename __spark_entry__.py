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
# whole registry. Round 5: (a) the 6 queries repaired after the
# Spark-4 TIMESTAMP_NTZ fixture change must re-prove green to the
# driver, (b) 22 queries never driver-checked in r1-r4 get their first
# check, (c) 22 proven anchors keep one green row per operator family.
CHECKED_FIRST = [
    # (a) repaired after the TIMESTAMP_NTZ fixture regeneration
    "event_sessionization",
    "asof_last_view_before_purchase",
    "epoch_ms_roundtrip",
    "event_error_streaks",
    "event_funnel_conversion",
    "event_pairs_within_window",
    # (b) first driver check: event analytics + distributions
    "event_hour_dow_heatmap",
    "event_interarrival_histogram",
    "props_k_distribution",
    "order_value_distribution",
    "lineitem_quantity_quartiles",
    "lineitem_profile",
    "sql_region_summary",
    # (b) first driver check: TPC-H shapes
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q16_parts_supplier_breadth",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_dormant_high_balance",
    # (b) first driver check: text / corpus / similarity
    "vocab_top_tokens",
    "boilerplate_prefix_groups",
    "training_corpus_filter",
    "token_count_histogram",
    "embedding_lsh_buckets",
    "centroid_separation",
    # (c) proven per-family anchors (driver-green in r1-r4)
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "event_status_pivot",
    "multimodal_decode_features",
    "props_k_extract",
    "ann_ivf_topk_nprobe",
    "knn_bruteforce",
    "text_quality_scores",
    "q3_shipping_priority",
    "lineitem_pricing_summary",
    "salted_user_event_counts",
    "corpus_pack_chunks",
    "eval_contamination",
    "docs_scrubbed_stats",
    "kmeans_assignments",
    "incr_dedup_decisions",
    "docs_split_assign",
    "latest_event_per_user",
    "event_minute_gapfill",
    "order_priority_cube",
    "customer_order_bookends",
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
