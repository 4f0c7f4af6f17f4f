"""Unit tests for the plan-audit heuristics (pure function — no Spark),
plus the slow registry-wide physical-plan gate."""

import pytest

from tools.plan_audit import WAIVERS, audit_plan


def test_flags_cartesian():
    assert "cartesian-product" in audit_plan("+- CartesianProduct\n   +- Scan parquet")


def test_flags_python_eval():
    assert "row-at-a-time-python" in audit_plan("+- BatchEvalPython [f(x)]")


def test_flags_bnlj_only_with_two_scans():
    one = "BroadcastNestedLoopJoin\n+- Scan parquet t1\n+- LocalTableScan"
    two = "BroadcastNestedLoopJoin\n+- Scan parquet t1\n+- Scan parquet t2"
    assert audit_plan(one) == []
    assert "bnlj-over-two-scans" in audit_plan(two)


def test_flags_wide_scan():
    wide = "ReadSchema: struct<a:int,b:int,c:int,d:int,e:int,f:int,g:int,h:int,i:int>"
    narrow = "ReadSchema: struct<a:int,b:int>"
    assert any(f.startswith("wide-scan") for f in audit_plan(wide))
    assert audit_plan(narrow) == []


def test_clean_plan():
    assert audit_plan("*(3) HashAggregate\n+- Exchange hashpartitioning\n+- Scan parquet") == []


@pytest.mark.slow
def test_registry_plans_are_clean(executed_plans):
    """Audit EVERY registered query's executed plan at sf0.01 (built
    once in the session-scoped ``executed_plans`` fixture) and fail on
    any unwaived flag. Doubles as an analysis gate: a query that no
    longer resolves against the current fixtures (e.g. a type change
    in regenerated testdata) fails here at plan-build time instead of
    surfacing a round later in the driver's correctness report."""
    plans, errors = executed_plans
    failures = dict(errors)
    for name, plan in plans.items():
        flags = audit_plan(plan)
        if WAIVERS.get(name) in flags:
            flags.remove(WAIVERS[name])
        if flags:
            failures[name] = ", ".join(flags)
    assert not failures, failures


@pytest.mark.slow
def test_dynamic_partition_pruning_on_warehouse(spark, tmp_path):
    """Scale capability proof: a join between the minute-partitioned
    warehouse and a FILTERED dimension of minutes must plan a
    dynamicpruning subquery on the partition column, so at 100 TB the
    fact scan reads only the joined minutes' directories instead of
    the whole table — partition pruning decided at runtime from the
    dim side, not from a literal predicate."""
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.sources.generator import (
        generate_events,
        write_warehouse,
    )

    path = str(tmp_path / "dpp_warehouse")
    df = generate_events(spark, 2000, n_users=20, seed=11, events_per_second=10)
    write_warehouse(df, path)

    fact = spark.read.parquet(path)
    # dim: a small minute list with a selective filter — the DPP build side
    minutes = (
        fact.select("event_minute").distinct().limit(3).withColumn("keep", F.lit(1))
    )
    dim_path = str(tmp_path / "dpp_dim")
    minutes.write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("keep") == 1)

    joined = fact.join(dim, "event_minute").groupBy("event_minute").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_registered_dpp_query_plans_dynamic_pruning(spark):
    """The REGISTRY now reads the partitioned layout end-to-end
    (VERDICT r6 #5): ``warehouse_minute_dpp_extract`` must carry the
    dynamicpruning subquery on its partition column — the runtime-dim
    join, not a literal predicate, decides which minute directories
    the fact scan touches."""
    from end2end_data_pipeline_spark.operators.warehouse_ops import (
        warehouse_minute_dpp_extract,
    )

    df = warehouse_minute_dpp_extract(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_r7_plan_improvements_hold(spark):
    """Regression guards for the round-7 plan work: the one-scan
    co-activity pipeline, the broadcast-only pagerank iteration, and
    the coalesced Markov type cache must not silently revert."""
    import re

    import __spark_entry__ as entrymod

    q = entrymod.queries()

    def executed(name):
        df = q[name](spark, "/root/testdata/sf0.001")
        return df._jdf.queryExecution().executedPlan().toString()

    cos = executed("user_cosession_degree")
    # one real events scan, no rank window (WindowGroupLimit included)
    assert len(re.findall(r"FileScan parquet", cos)) == 1
    assert "Window [" not in cos

    pr = executed("nation_trade_pagerank")
    assert "SortMergeJoin" not in pr  # every iteration join broadcasts

    mk = executed("sessions_markov_transitions")
    # the type-list cache builds as ONE partition (coalesce(1)), so no
    # 200-partition InMemoryRelation for the 5-row frame
    assert "Coalesce 1" in mk


def test_persisted_ivf_probe_plans_dynamic_pruning(spark):
    """``ann_ivf_persisted_topk`` must probe the cell-partitioned
    index with a dynamicpruning subquery on cell_id — the scan
    touches only the probed cells' directories, the vector-search
    analog of the warehouse minute extract above."""
    from end2end_data_pipeline_spark.operators.similarity import (
        ann_ivf_persisted_topk,
    )

    df = ann_ivf_persisted_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_ann_pq_topk_plan_shape(spark):
    """ADC search must stay index-shaped: the query-side distance
    table BROADCASTS (no corpus-corpus shuffle join), the codebook
    scans carry the pushed ``vec_id < PQ_K`` bootstrap filter
    (row-group pruned at scale), and scoring needs no
    full-dimension vector math — no dot product over the 64-d array
    appears after the code-assignment aggregate."""
    import re

    from end2end_data_pipeline_spark.operators.similarity import ann_pq_topk

    df = ann_pq_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]
    # the bootstrap filter reaches the PARQUET scan — unless an
    # earlier test in the session already cached the embeddings table
    # (the S11 cache-across-actions behavior), in which case the scan
    # is an InMemoryTableScan and parquet pushdown is moot
    assert "LessThan(vec_id,8)" in plan or "InMemoryTableScan" in plan, (
        plan[:2000]
    )


def test_kmv_sketch_plans_mapside_topk(spark):
    """``_kmv_sketches``' docstring claims "map-side top-k, one tiny
    shuffle of <= k rows per source per partition" — true only while
    the ``row_number() <= k`` filter keeps triggering Spark's
    WindowGroupLimit pushdown (a PARTIAL group-limit below the
    exchange). A regression — e.g. an extra projected column breaking
    the pushdown pattern — would silently shuffle EVERY distinct
    (source, shingle) row into |sources| hot partitions, so pin the
    operator in the executed plan (VERDICT r11 #3)."""
    from end2end_data_pipeline_spark.operators.dedup import (
        _kmv_shingle_rows,
        _kmv_sketches,
    )
    from end2end_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sk = _kmv_sketches(_kmv_shingle_rows(docs))
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    # both phases: Partial (map-side, below the source exchange) and
    # Final — Partial is the one that caps the shuffle volume
    assert "Partial" in plan.split("WindowGroupLimit", 2)[-1] or (
        plan.count("WindowGroupLimit") >= 2
    ), plan[:2000]
