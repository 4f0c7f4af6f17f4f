"""Skew-stress sweep — the whole registry strict-checked on a
DETERMINISTICALLY SKEWED copy of the fixtures, because at 100 TB the
whale key is the norm, not the anomaly.

The fixture generator draws keys near-uniformly, so every per-key
shuffle in the driver gate sees balanced partitions — a query whose
logic silently depends on that (a per-key state blowup, a capped
candidate generator that starts dropping, an aggregation that
overflows on one hot group) stays invisible. This sweep rewrites the
fixtures once with a hot key injected, points BOTH engines at the
same rewritten files, and re-runs the strict comparator — answers
must be identical however lopsided the key distribution.

Skew injected (pure deterministic column arithmetic, applied while
copying — both engines read the same bytes):

- ``events``:  ~10% of rows reassigned to one whale ``user_id``
  (event_id % 10 = 3), stressing per-user sessionization windows,
  streak state, and stream-replay key state;
- ``orders``:  ~10% of rows reassigned to one whale ``o_custkey``
  (o_orderkey % 10 = 3), stressing customer rollups, CF degree caps,
  and cohort/LTV grouping;
- every other table copied unchanged.

Usage:
    python tools/skew_stress.py                 # sf0.01, whole registry
    python tools/skew_stress.py /root/testdata/sf0.001 q1 q2 ...
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = "/root/testdata/sf0.01"
WHALE_USER = 1
WHALE_CUST = 1


def build_skewed_fixture(sf_dir: str) -> str:
    """Rewrite events/orders with the whale keys; copy the rest."""
    import duckdb

    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

    out = tempfile.mkdtemp(prefix="spark_graft_skew_fixture_")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN event_id % 10 = 3 THEN {WHALE_USER}
                      ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{sf_dir}/events.parquet')
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 10 = 3 THEN {WHALE_CUST}
                      ELSE o_custkey END AS o_custkey,
                 * EXCLUDE (o_orderkey, o_custkey)
          FROM read_parquet('{sf_dir}/orders.parquet')
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for name in TABLE_NAMES:
        if name in ("events", "orders"):
            continue
        shutil.copy(f"{sf_dir}/{name}.parquet", f"{out}/{name}.parquet")
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    from tools.oracle_check import run_sweep

    args = sys.argv[1:]
    src = args[0] if args and os.path.isdir(args[0]) else DEFAULT_SF_DIR
    names = args[1:] if args and os.path.isdir(args[0]) else args

    sf_dir = build_skewed_fixture(src)
    print(f"skewed fixture at {sf_dir} (from {src})")

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("skew-stress")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        n_bad = run_sweep(
            spark, sf_dir, names, label="skew-stress(whale keys) strict"
        )
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
