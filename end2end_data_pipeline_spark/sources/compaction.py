"""Small-file compaction for the minute-partitioned warehouse — the
Spark-side analog of the reference warehouse's background merges
(``db/clickhouse_table_schema.sql:15-20``: MergeTree continuously
merges small insert parts into larger sorted parts; a parquet
warehouse written by streaming micro-batches accretes the same
small-file debt and needs an explicit OPTIMIZE pass, cf. the public
Delta Lake / Iceberg bin-packing compaction pattern).

Contract: a partition holding N files totalling B bytes is rewritten
into ``ceil(B / target_bytes)`` files, rows clustered by the sort
columns so row-group min/max skipping keeps working. Partitions
already at-or-below the target file count are left untouched (no
write amplification on healthy partitions).

Scale notes: the per-partition loop is driver-side CONTROL FLOW only
(the standard compaction-job shape — Delta's OPTIMIZE schedules
per-partition bin-packs the same way); each partition's rewrite is a
distributed read→repartition→write. Partitions are independent, so a
100 TB run fans the loop out across jobs. This implementation targets
a local filesystem (os.listdir / os.replace swap); on HDFS/S3 the
listing and the atomic swap go through the FileSystem API / a commit
protocol instead — the planning math is unchanged.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def plan_compaction(part_dir: str, target_bytes: int) -> tuple[int, int, int]:
    """(n_files, n_bytes, n_target_files) for one partition directory."""
    files = [
        f
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    n_bytes = sum(os.path.getsize(os.path.join(part_dir, f)) for f in files)
    n_target = max(1, math.ceil(n_bytes / target_bytes))
    return len(files), n_bytes, n_target


def _swap_paths(part_dir: str) -> tuple[str, str]:
    """Staging/old sibling paths whose basenames are dot-prefixed so
    Spark's partition discovery ignores them: a suffix-named sibling
    (``event_minute=X._compact_staging``) still matches the
    ``{col}={value}`` pattern, so a crash between the staging write and
    cleanup would surface a phantom partition; ``._compact_*`` dirs are
    invisible to readers no matter when the process dies."""
    parent, base = os.path.split(part_dir.rstrip("/"))
    return (
        os.path.join(parent, f"._compact_staging_{base}"),
        os.path.join(parent, f"._compact_old_{base}"),
    )


def _check_no_leftovers(paths: tuple[str, ...], context: str) -> None:
    leftovers = sorted(p for p in paths if os.path.exists(p))
    if leftovers:
        raise RuntimeError(
            f"leftover compaction staging dirs for {context!r}: {leftovers}; "
            "a prior compaction crashed mid-swap — they hold a superseded "
            "or partial copy, so inspect and remove before rerunning"
        )


def compact_partition(
    spark: SparkSession,
    part_dir: str,
    target_bytes: int,
    sort_cols: tuple[str, ...] = ("event_type",),
) -> int:
    """Rewrite one partition directory to ``ceil(bytes/target)`` files
    (staging write + atomic directory swap). Returns the resulting
    file count; a no-op (returns current count) when the partition is
    already at or below the target count. Fails fast on leftover
    ``._compact_*`` siblings from a crashed prior run (same contract
    as ``compact_warehouse``, so direct callers get the curated error
    instead of a raw ENOTEMPTY from ``os.rename``)."""
    _check_no_leftovers(_swap_paths(part_dir), part_dir)
    n_files, _, n_target = plan_compaction(part_dir, target_bytes)
    if n_target >= n_files:
        return n_files
    df = spark.read.parquet(part_dir)
    out = df.repartition(n_target)
    cols = [c for c in sort_cols if c in df.columns]
    if cols:
        out = out.sortWithinPartitions(*cols)
    staging, old = _swap_paths(part_dir)
    out.write.mode("overwrite").parquet(staging)
    os.rename(part_dir, old)
    os.rename(staging, part_dir)
    shutil.rmtree(old)
    return plan_compaction(part_dir, target_bytes)[0]


def compact_warehouse(
    spark: SparkSession,
    root: str,
    target_bytes: int,
    partition_col: str = "event_minute",
    sort_cols: tuple[str, ...] = ("event_type",),
) -> dict[str, int]:
    """Compact every ``{partition_col}=...`` directory under ``root``.
    Returns {partition_name: resulting_file_count}.

    Fails fast on leftover ``._compact_*`` staging/old dirs from a
    crashed prior run — they hold a superseded or partial copy of a
    partition, so silent cleanup could discard the only good copy;
    an operator must inspect and remove them."""
    leftovers = [n for n in os.listdir(root) if n.startswith("._compact_")]
    if leftovers:
        raise RuntimeError(
            f"leftover compaction staging dirs under {root!r}: {sorted(leftovers)}; "
            "a prior compaction crashed mid-swap — inspect and remove before rerunning"
        )
    result: dict[str, int] = {}
    for name in sorted(os.listdir(root)):
        pdir = os.path.join(root, name)
        if name.startswith(f"{partition_col}=") and os.path.isdir(pdir):
            result[name] = compact_partition(
                spark, pdir, target_bytes, sort_cols
            )
    return result
