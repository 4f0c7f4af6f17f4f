"""Partition-stress sweep — the whole registry strict-checked under
HOSTILE partitioning, because correct results must not depend on how
Spark happens to split the data.

The driver gate (sf0.01) and the sf sweep (sf0.1) both run on
single-row-group fixture files: every scan is one task, every pandas
op sees one big Arrow batch, and AQE broadcasts every join — which
means plain rehearsal structurally CANNOT catch logic that is
accidentally partition-dependent. On a 1000-executor cluster reading
100 TB none of those accidents hold. This sweep re-runs every
registered query with:

- ``spark.sql.shuffle.partitions=5`` (vs the engine's 32): group-by,
  window, and join results must be invariant to shuffle layout;
- ``spark.sql.autoBroadcastJoinThreshold=-1``: every implicit
  broadcast becomes a shuffle join — same rows or the query was
  relying on a single-partition build side (explicit ``F.broadcast``
  hints still apply, as they would at scale);
- ``spark.sql.execution.arrow.maxRecordsPerBatch=7``: every
  mapInPandas / applyInPandas / pandas-UDF sees hundreds of tiny
  batches — any state carried incorrectly across batch boundaries
  (Misra-Gries merge, incremental decoders, per-partition sketches)
  changes the answer;
- ``spark.sql.files.maxPartitionBytes=64k`` + zero open cost: scans
  fan out into many partitions where all but one are EMPTY — every
  per-partition sentinel/summary path must tolerate empty input.

Results are compared with the SAME strict comparator the driver gate
uses (rows + column names + value hash + driver-safe types), against
the DuckDB oracle, which does not partition at all.

Usage:
    python tools/partition_stress.py                 # sf0.01, whole registry
    python tools/partition_stress.py /root/testdata/sf0.001 q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import SparkSession

    from tools.oracle_check import run_sweep

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else DEFAULT_SF_DIR
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("partition-stress")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "5")
        .config("spark.default.parallelism", "5")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return 1 if run_sweep(spark, sf_dir, names, label="partition-stress strict") else 0


if __name__ == "__main__":
    raise SystemExit(main())
