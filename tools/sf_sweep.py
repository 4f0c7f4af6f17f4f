"""Full-registry strict sweep at an arbitrary scale factor — the 10×
check that catches what driver-scale rehearsal can't: int64 products
that overflow only on bigger aggregates (the r8 seasonality/GE(2)
class), HUGEINT widenings, and any plan that silently degrades with
row count. ``tools/driver_rehearsal.py`` pins sf0.01 (the driver's
gate); this runs the same strict comparator at any fixture scale.

Usage:
    python tools/sf_sweep.py                  # sf0.1, whole registry
    python tools/sf_sweep.py /root/testdata/sf0.01 q1 q2 ...

Round-8 result for the record: 199/199 strict-match at sf0.1 (480 s,
local[16], final 199-query registry).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from pyspark.sql import SparkSession

    from tools.oracle_check import run_sweep

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else DEFAULT_SF_DIR
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf-sweep")
        .config("spark.ui.enabled", "false")
        # NOT a semantics conf (the comparator still runs on an
        # otherwise-plain session): the default 1g driver heap OOMs a
        # full-registry sweep above sf0.1 once 336 queries' caches and
        # replay states accumulate in the single local-mode JVM
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return 1 if run_sweep(spark, sf_dir, names, label="strict") else 0


if __name__ == "__main__":
    raise SystemExit(main())
