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
# ROTATES per round so the union of driver-green rows converges on —
# and now stays on — the whole registry. The union claim is
# MECHANICAL: ``tools/union_check.py`` recomputes it from the
# committed CORRECTNESS_r*.json files every test run. The r1-r7 union
# closed at 188/188, so from round 8 the window's job flips (VERDICT
# r7 #2): first every NEWLY registered query (eleven this round — the
# q8/q15 bucketed twins, the three ingest-tier parity queries making
# the r7 WebDataset/JSONL/WAV front doors driver-visible, the GE(2)
# inequality index, the persisted partition-pruned IVF probe with
# its occupancy audit, the streaming-engine replays of the shard
# roundtrip AND the JSONL quarantine, and the AVI
# container-metadata parity), then the LEAST-recently-regreened
# queries
# (max-min staleness: all 39 were last driver-checked in r1 or r2,
# carrying 6+ rounds of code drift). This list IS the output
# of ``tools/union_check.py --propose-window`` — mechanical, not
# hand-picked.
CHECKED_FIRST = [
    "q8_market_share_bucketed",
    "q15_top_supplier_bucketed",
    "webdataset_roundtrip_by_shard",
    "jsonl_quarantine_stats",
    "audio_pcm_parity",
    "order_value_ge2_index",
    "ann_ivf_persisted_topk",
    "ivf_cell_occupancy_audit",
    "webdataset_stream_replay",
    "video_container_parity",
    "jsonl_stream_replay",
    "acctbal_tiers",
    "all_party_nations",
    "customer_only_nations",
    "customers_above_avg_balance",
    "customers_without_orders",
    "dedup_cluster_survivors",
    "dedup_clusters",
    "dedup_exact_stats",
    "dedup_exact_survivors",
    "dedup_minhash_pairs",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_pairs",
    "dedup_simhash_signatures",
    "epoch_ms_roundtrip",
    "event_error_rate",
    "event_error_streaks",
    "event_minute_counts",
    "event_report_totals",
    "event_sessionization",
    "event_status_pivot",
    "event_tehran_display",
    "event_top_event_type_daily",
    "high_volume_parts",
    "multimodal_meta",
    "order_status_rollup",
    "param_sql_minute_extract",
    "part_brand_stats",
    "priority_discounted_orders",
    "projection_filter_pushdown",
    "salted_user_event_counts",
    "segment_active_customers",
    "segment_distinct_buyers",
    "shared_nations",
    "status_extreme_orders",
    "string_munging_props",
    "top_orders_global",
    "top_orders_per_customer",
    "ann_ivf_cells",
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
