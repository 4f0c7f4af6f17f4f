from __future__ import annotations

import os

import pytest

from end2end_data_pipeline_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="e2e-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def executed_plans(spark):
    """(plans, errors): name -> executedPlan string for EVERY
    registered query at sf0.01, built ONCE per test session and shared
    by the registry-wide plan gates (plan audit, the Python-node
    sweep, the schema-resolution sweep) — r14: the three gates each
    re-built all ~336 plans (~6 min each with the eager materializers
    running at construction); one build serves all three.
    CONSTRUCTION stays sequential — a handful of builders run
    first-call side effects at construction (bucketed saveAsTable,
    data-source registration) and racing them corrupts their shared
    scratch; only the thread-safe physical-planning calls overlap on
    a small pool (guide §2.6)."""
    from concurrent.futures import ThreadPoolExecutor

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    plans: dict[str, str] = {}
    errors: dict[str, str] = {}
    built = []
    for name, fn in entrymod.queries().items():
        try:
            built.append((name, fn(spark, sf)))
        except Exception as exc:  # noqa: BLE001 — collected as findings
            errors[name] = f"plan build failed: {str(exc).splitlines()[0][:200]}"

    def physical(item):
        name, df = item
        try:
            return name, df._jdf.queryExecution().executedPlan().toString(), None
        except Exception as exc:  # noqa: BLE001 — collected as findings
            return name, None, f"plan build failed: {str(exc).splitlines()[0][:200]}"

    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, plan, err in pool.map(physical, built):
            if err is not None:
                errors[name] = err
            else:
                plans[name] = plan
    return plans, errors
