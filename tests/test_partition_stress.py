"""Partition-stress tripwire (r10): a fixed set of the most
partition-sensitive registered queries, strict-checked against their
DuckDB oracles under hostile runtime conf — tiny shuffle fan-out, no
implicit broadcasts, 7-row Arrow batches. The full-registry sweep
lives in ``tools/partition_stress.py`` (run per-round); this subset
keeps the invariant in every pytest run.

All four knobs are runtime-settable SQL confs, so the shared session
is reconfigured and restored around the sweep. Caveat: queries that
``session_cached`` an intermediate may serve a pre-stress
InMemoryRelation if another test built it first — the standalone tool
(fresh session) is the authority; this test is the regression
tripwire."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import compare_query, duckdb_connection

SF_DIR = "/root/testdata/sf0.01"

# One representative per partition-sensitivity class: per-partition
# sketch state (Misra-Gries), pandas UDAF, Arrow UDTF, banded
# self-join, per-key ordered window chain, RANGE-frame attribution,
# single-pass corpus explode, broadcast-eligible kNN.
STRESS_QUERIES = [
    "vocab_heavy_hitters",
    "nation_median_spend_udaf",
    "udtf_token_runs",
    "dedup_minhash_pairs",
    "event_sessionization",
    "purchase_linear_attribution",
    "docs_pmi_collocations",
    "knn_bruteforce",
]

HOSTILE = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
}


@pytest.mark.slow
def test_stress_queries_match_oracle_under_hostile_partitioning(spark):
    saved = {k: spark.conf.get(k, None) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection(SF_DIR)
    failures = []
    try:
        for name in STRESS_QUERIES:
            r = compare_query(queries[name](spark, SF_DIR), con, oracles[name])
            if not (
                r["rows_match"]
                and r["cols_match"]
                and r["values_match"]
                and r["types_safe"]
            ):
                failures.append((name, {k: r[k] for k in
                                        ("rows_match", "cols_match",
                                         "values_match", "types_safe")}))
    finally:
        con.close()
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert not failures, failures
