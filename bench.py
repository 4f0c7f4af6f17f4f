"""Benchmark runner — times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized through the `noop` sink (full execution,
no driver-side collection cost, no disk write) — the honest measure of
plan execution time. Reference baseline for context: the original
pipeline's Spark job took 22.16 s for a ~5.8k-row pivot on a 2x2-core
standalone cluster (BASELINE.md); this engine's target is the full
headline set in low single-digit seconds at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end2end_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# Representative, scale-meaningful subset of the registry: the
# reference's flagship analytics, the relational heavy-hitters, and the
# LLM-pipeline extensions. (Excluded: dedup_ngram_jaccard_pairs — the
# exact ground-truth check whose inverted-index blowup on this
# small-vocabulary synthetic corpus is intentionally quadratic; and
# dedup_clusters — the iterative component loop is bounded by
# propagation ROUNDS (driver-coordinated latency), not data
# throughput, so it measures scheduler overhead rather than engine
# speed at bench scale.)
HEADLINE = [
    "event_status_pivot",
    "event_minute_counts",
    "event_error_rate",
    "event_sessionization",
    "event_error_streaks",
    "asof_last_view_before_purchase",
    "event_pairs_within_window",
    "props_k_distribution",
    "lineitem_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "top_revenue_orders",
    "nation_supplier_revenue",
    "top_orders_per_customer",
    "segment_distinct_buyers",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_simhash_signatures",
    "text_quality_scores",
    "token_stats_by_lang",
    "tfidf_top_terms",
    "docs_split_assign",
    "knn_bruteforce",
    "embedding_lsh_buckets",
    "dedup_embedding_neardup",
    "ann_ivf_topk_nprobe",
    "q5_local_supplier_volume",
    "q13_customer_distribution",
    "q8_market_share",
    "corpus_pack_chunks",
    "eval_contamination",
    "shingle_novelty_curve",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # untimed warmup: absorbs JVM/codegen/parquet-footer warmup so the
    # first timed query isn't charged for JIT compilation
    queries["event_report_totals"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
