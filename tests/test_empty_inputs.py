"""Empty-input robustness: at 100 TB, empty slices (a new tenant, a
quiet minute, a filtered-out partition) are routine, and an operator
that crashes on zero rows is a paged on-call. Every registered query
must plan and execute against fully EMPTY copies of all tables.

This sweep found (and now guards) two real bugs: schema inference over
an empty partitioned warehouse (``warehouse_ops``) and the untyped
argmin expression when k-means has no seed centroids (``kmeans``)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

SF_SOURCE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        (
            spark.read.parquet(f"{SF_SOURCE}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(path / f"{t}.parquet"))
        )
    return str(path)


# The operator families the sweep caught, kept fast so the guard
# runs every suite invocation. parquet_footer_health joined in r10:
# its manifest walk must descend into directory-shaped tables (the
# empty fixture writes Spark directories, not single files) and
# tolerate zero row groups.
REGRESSION_QUERIES = [
    "warehouse_minute_dpp_extract",
    "kmeans_assignments",
    "kmeans_cluster_profile",
    "parquet_footer_health",
]


@pytest.mark.parametrize("name", REGRESSION_QUERIES)
def test_fixed_queries_survive_empty_inputs(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    assert df.collect() == []


@pytest.mark.slow
def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    # CONSTRUCTION stays sequential — a handful of builders run
    # first-call side effects at construction (bucketed saveAsTable,
    # the Python data-source registration, replay drains) and racing
    # them corrupts their shared scratch (caught by this very test
    # when the whole probe was threaded). Only the independent
    # EXECUTIONS overlap on the pool (guide §2.6) — r14: 242 s -> ~90 s.
    from concurrent.futures import ThreadPoolExecutor

    failures = []
    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = []
        for name, fn in entrymod.queries().items():
            try:
                df = fn(spark, empty_sf_dir)
            except Exception as exc:  # noqa: BLE001 — collecting a report
                failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:100]}")
                continue
            futures.append(
                (name, pool.submit(lambda d=df: d.limit(5).collect()))
            )
        for name, fut in futures:
            try:
                fut.result()
            except Exception as exc:  # noqa: BLE001 — collecting a report
                failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:100]}")
    assert not failures, "queries crash on empty inputs:\n" + "\n".join(failures)
