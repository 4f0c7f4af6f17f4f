"""Physical-plan hygiene audit for the query registry.

For every registered query, inspect the executed (AQE-final where
possible) plan at the bench scale factor and flag the anti-patterns
that stop mattering only when data is small:

- CartesianProduct / BroadcastNestedLoopJoin on two LARGE sides
  (fine when one side is a literal dim — the band-join pattern);
- parquet scans that read every column while the query projects few
  (missing column pruning — usually a UDF or a star passed downstream);
- missing PushedFilters on scans under a selective predicate;
- row-at-a-time Python evaluation (BatchEvalPython) — the slow path
  this engine bans in favor of Arrow-batched pandas evaluation.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one line per query: OK or the list of flags, then a nonzero
exit if any query regressed. The point is to make plan review a
habitual gate, not a one-off (SURVEY.md §4).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def audit_plan(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python")
    # BNLJ is legitimate only against a tiny broadcast side; flag it
    # for eyeball review when both inputs are file scans.
    if "BroadcastNestedLoopJoin" in plan and plan.count("Scan parquet") > 1:
        flags.append("bnlj-over-two-scans")
    # full-width scans: ReadSchema listing >8 fields is suspicious for
    # queries that aggregate to a handful of columns. Match within one
    # line only — plan toString() truncates long schemas without a
    # closing '>', and a multi-line match would swallow the rest of
    # the plan and miscount.
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", plan):
        n_fields = m.group(1).count(",") + 1 if m.group(1) else 0
        if n_fields > 8:
            flags.append(f"wide-scan({n_fields}cols)")
    return flags


# Queries whose flagged pattern is the DESIGNED plan, with the reason.
# An exemption here still prints, as "ok (waived)".
WAIVERS: dict[str, str] = {
    # the query side is filtered to ~2% and explicitly broadcast; the
    # non-equi (vec_id != query_id) BNLJ against a broadcast side that
    # small is the correct brute-force top-k shape — the corpus scan
    # never shuffles.
    "knn_bruteforce": "bnlj-over-two-scans",
    # same shape as knn_bruteforce: the 2% query sample broadcasts and
    # the non-equi (vec_id != query_id) BNLJ scans the corpus once;
    # the second "scan" is the broadcast-rank/full-k self-reference on
    # the already-melted pair frame, not a corpus re-read.
    "ann_dim_truncation_recall": "bnlj-over-two-scans",
    # recall eval composes knn_bruteforce + ann_ivf_topk_nprobe and
    # inherits their (waived) broadcast BNLJ shapes; the eval's own
    # join is an O(queries x k) broadcast equi-join.
    "ann_recall_eval": "bnlj-over-two-scans",
    "knn_label_confusion": "bnlj-over-two-scans",
    # ranking eval composes knn_bruteforce (waived broadcast-query
    # BNLJ); its own joins are broadcast label lookups.
    "knn_ranking_eval": "bnlj-over-two-scans",
    # reliability shares the backtest's cached roll and inherits its
    # waived broadcast 1-row split-point crossJoin.
    "markov_reliability": "bnlj-over-two-scans",
    # hybrid fusion composes docs_bm25_search (waived broadcast-totals
    # crossJoin) and the knn-style single-query cosine scan (the query
    # row is a 1-row broadcast; the corpus side never shuffles) — both
    # inherited shapes are the designed plans of their sources.
    "docs_hybrid_rrf_search": "bnlj-over-two-scans",
    # WAU band join: the broadcast side is the O(|days|) date spine and
    # the range condition fans each (user, day) row into at most 7
    # spine days — a bounded-expansion broadcast band join, not a
    # quadratic surface.
    "user_stickiness_daily": "bnlj-over-two-scans",
    # the sources x langs ablation grid is a broadcast crossJoin of two
    # frames already reduced to O(|sources|) and O(|langs|) rows off
    # the session-cached source x lang matrix; the parquet scans the
    # counter sees are inside the InMemoryRelation printout (the corpus
    # is materialized exactly once).
    "source_ablation_deltas": "bnlj-over-two-scans",
    # the KMV sketch-pair join is non-equi (src_a < src_b) over
    # O(|sources|) rows of k-element sketch arrays, both sides off the
    # session-cached distinct (source, shingle-hash) frame — a
    # broadcast BNLJ over fixed-size mergeable sketches is the designed
    # theta-sketch algebra; the corpus itself never pairwise-joins for
    # the estimates.
    "source_shingle_overlap_kmv": "bnlj-over-two-scans",
    # the stream replay reads the drained O(|sources| x k) sketch state
    # and runs the same (waived) non-equi sketch-pair join; the second
    # scan the counter sees is the state parquet, not a corpus re-read.
    "source_sketch_stream_replay": "bnlj-over-two-scans",
    # IVF coarse quantizer: every vector scores against the N_IVF_CELLS
    # (=16) broadcast centroids — an intentional O(n x K) broadcast
    # cross join; the corpus side never shuffles.
    "ann_ivf_cells": "bnlj-over-two-scans",
    "ann_ivf_topk": "bnlj-over-two-scans",
    "ann_ivf_topk_nprobe": "bnlj-over-two-scans",
    # the persisted-index probe inherits the same waived O(q x K)
    # broadcast centroid scoring on its QUERY side; the index side is
    # a DPP-pruned equi-join (asserted in tests/test_plan_audit.py).
    "ann_ivf_persisted_topk": "bnlj-over-two-scans",
    # IVF-PQ inherits the waived O(n x 16) broadcast centroid scoring
    # (fused cell assignment + query probes); its own joins — codes,
    # the probe semi-filter, the ADC table lookups — are all broadcast
    # equi-joins (asserted in tests/test_plan_audit.py).
    "ann_ivfpq_topk": "bnlj-over-two-scans",
    # the residual twin: same centroid scoring, plus the ADC join
    # carries the vec_id != query_id non-equi guard beside its three
    # equi keys — still a broadcast join against the O(|Q| x nprobe x
    # M x K) distance table.
    "ann_ivfpq_residual_topk": "bnlj-over-two-scans",
    # r14: the shared PQ corpus encode (_pq_codes_op) fuses the IVF
    # cell assignment — the SAME waived O(n x 16) broadcast centroid
    # scoring as the ann_ivf_* family above — into its once-per-session
    # cached build, so the flat-PQ consumers now show that intentional
    # BNLJ in their (unmaterialized) build lineage; their own joins
    # are broadcast equi-joins against codes/codebook/dtable.
    "ann_pq_topk": "bnlj-over-two-scans",
    "embedding_pq_codebook": "bnlj-over-two-scans",
    # 1-row broadcast scalar attach (global aggregate cross-joined back
    # onto the distributed side) — the standard way to apply a global
    # total/max without collecting to the driver; nothing large moves.
    "q22_dormant_high_balance": "bnlj-over-two-scans",
    "customer_rfm_segments_bucketed": "bnlj-over-two-scans",
    "event_type_cooccurrence": "bnlj-over-two-scans",
    "source_mix_rebalance": "bnlj-over-two-scans",
    "docs_dsir_domain_affinity": "bnlj-over-two-scans",
    # the funnel composes docs_dsir_domain_affinity and inherits its
    # (waived) 1-row broadcast totals crossJoin; the funnel's own
    # joins are doc_id/h-keyed equi-joins.
    "corpus_curation_funnel": "bnlj-over-two-scans",
    "source_temperature_mix": "bnlj-over-two-scans",
    "typo_blocking_recall_eval": "bnlj-over-two-scans",
    # t-closeness spine: classes x bands cross join of two bounded
    # rollups plus the 1-row (total_g, m) attach — nothing data-sized.
    "customer_tcloseness_profile": "bnlj-over-two-scans",
    "nation_trade_pagerank": "bnlj-over-two-scans",
    # lift denominator: the 1-row n_orders aggregate cross-joined onto
    # the (already support-filtered, top-k-bound) pair table.
    "part_copurchase_lift": "bnlj-over-two-scans",
    # time-split midpoint: the 1-row (min+max)/2 epoch aggregate
    # cross-joined onto the pair stream before the side rollup — the
    # standard scalar attach; the model/test branches join the cached
    # O(|types|^2 x 3) rollup.
    "markov_backtest_hitrate": "bnlj-over-two-scans",
    # median and MAD scalar attaches: two successive 1-row broadcast
    # rank-picks applied to the cached O(|days|) daily rollup.
    "orders_daily_mad_anomalies": "bnlj-over-two-scans",
    # quantile-norm inverse-CDF lookup: a band join (idx lands in one
    # (cum-n, cum] slab) against the BROADCAST global value-domain
    # histogram — both sides are bounded rollups, the corpus rows
    # never reach the join (same class as the user_stickiness_daily
    # date-spine band join).
    "docs_quantile_norm_by_lang": "bnlj-over-two-scans",
    # BM25 corpus statistics: the 1-row (N, sum_dl, df_t) aggregate of
    # the cached per-doc profile cross-joined back onto that profile
    # for scoring — the same 1-row scalar-attach pattern; the second
    # "Scan parquet" is the cache-build subtree printed twice.
    "docs_bm25_search": "bnlj-over-two-scans",
    # pareto denominator: the 1-row total-spend aggregate cross-joined
    # onto the 10-row decile rollup.
    "customer_pareto_share": "bnlj-over-two-scans",
    # corpus-horizon attach: the 1-row max(ts) aggregate cross-joined
    # onto the O(users) last-seen rollup.
    "user_inactivity_bands": "bnlj-over-two-scans",
    # bucket-bounds attach: the 1-row min/max aggregate cross-joined
    # back onto the fact scan for exact integer bucketing.
    "lineitem_zorder_zonemap": "bnlj-over-two-scans",
    # day-zero anchor attach: the 1-row min(day) aggregate cross-joined
    # back onto the fact scan so day indexes are corpus-relative and
    # engine-portable; the per-user bitmap reduce never re-shuffles.
    "user_activity_bitmap": "bnlj-over-two-scans",
    # heavy-hitter threshold attach: the 1-row total-token aggregate
    # (read from the cached O(MG_COUNTERS x partitions) MG summary)
    # cross-joined onto the candidate-only exact counts.
    "vocab_heavy_hitters": "bnlj-over-two-scans",
    # nearest-centroid scoring: corpus scanned once against the
    # O(|labels|) broadcast centroid-sum table — the same intentional
    # O(n x K) shape as the waived IVF quantizer.
    "embedding_centroid_margin_profile": "bnlj-over-two-scans",
    # Laplace grid completion: the from x to matrix is the crossJoin
    # of two O(|event_types|) broadcast distinct lists (plus the 1-row
    # V attach) — matrix size is independent of corpus size.
    "sessions_markov_transitions": "bnlj-over-two-scans",
    # set-bit census attach: the 1-row count over the session-cached
    # O(BLOOM_M)-row set-bit relation cross-joined onto the 1-row
    # confusion tally — a 1 x 1 join.
    "bloom_prefilter_audit": "bnlj-over-two-scans",
}


def main() -> int:
    from end2end_data_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = entrymod.queries()
    names = sys.argv[2:] or sorted(queries)

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = audit_plan(plan)
        if flags and WAIVERS.get(name) in flags:
            flags.remove(WAIVERS[name])
            print(f"ok   {name} (waived: {WAIVERS[name]})")
            if not flags:
                continue
        if flags:
            bad += 1
            print(f"FLAG {name}: {', '.join(flags)}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(names) - bad}/{len(names)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
