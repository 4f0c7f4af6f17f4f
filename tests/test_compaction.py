"""Small-file compaction: N small files -> ceil(bytes/target) files,
identical row contents, healthy partitions untouched."""

from __future__ import annotations

import math
import os

from end2end_data_pipeline_spark.sources.compaction import (
    compact_warehouse,
    plan_compaction,
)
from end2end_data_pipeline_spark.sources.generator import generate_events


def _fragmented_warehouse(spark, path: str, files_per_partition: int = 6):
    df = generate_events(spark, n=3000, n_users=20, seed=7)
    (
        df.repartition(files_per_partition)
        .write.mode("overwrite")
        .partitionBy("event_minute")
        .parquet(path)
    )
    return spark.read.parquet(path)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_compaction_hits_target_and_preserves_rows(spark, tmp_path):
    root = str(tmp_path / "warehouse")
    before = _rows(_fragmented_warehouse(spark, root))

    parts = [d for d in os.listdir(root) if d.startswith("event_minute=")]
    assert parts
    # every partition starts fragmented
    frag = {p: plan_compaction(os.path.join(root, p), 1)[0] for p in parts}
    assert all(n > 1 for n in frag.values())

    # target = total partition bytes -> exactly 1 file per partition
    sizes = {p: plan_compaction(os.path.join(root, p), 1)[1] for p in parts}
    result = compact_warehouse(spark, root, target_bytes=max(sizes.values()))
    assert set(result) == set(parts)
    assert all(n == 1 for n in result.values())
    for p in parts:
        n_files, n_bytes, _ = plan_compaction(os.path.join(root, p), 1)
        assert n_files == 1

    # contents byte-for-byte identical (modulo row order)
    assert _rows(spark.read.parquet(root)) == before


def test_compaction_file_count_is_ceil_bytes_over_target(spark, tmp_path):
    root = str(tmp_path / "warehouse2")
    _fragmented_warehouse(spark, root)
    parts = sorted(d for d in os.listdir(root) if d.startswith("event_minute="))
    p = os.path.join(root, parts[0])
    _, n_bytes, _ = plan_compaction(p, 1)
    target = n_bytes // 3 + 1  # -> ceil gives 3 (or fewer) output files
    expect = max(1, math.ceil(n_bytes / target))
    got = compact_warehouse(spark, root, target_bytes=target)[parts[0]]
    assert got == expect


def test_healthy_partitions_are_left_alone(spark, tmp_path):
    root = str(tmp_path / "warehouse3")
    _fragmented_warehouse(spark, root, files_per_partition=2)
    parts = sorted(d for d in os.listdir(root) if d.startswith("event_minute="))
    p = os.path.join(root, parts[0])
    before_files = sorted(os.listdir(p))
    # a tiny target makes the current layout already at-or-below the
    # target count -> no rewrite, same physical files
    n_files, n_bytes, n_target = plan_compaction(p, 1)
    assert n_target >= n_files
    compact_warehouse(spark, root, target_bytes=1)
    assert sorted(os.listdir(p)) == before_files


def test_staging_dirs_invisible_to_partition_discovery(spark, tmp_path):
    """A crash between the staging write and the swap must not surface
    a phantom partition: staging/old dirs are dot-prefixed so Spark's
    partition discovery skips them."""
    import pytest

    from end2end_data_pipeline_spark.sources.compaction import _swap_paths

    root = str(tmp_path / "warehouse4")
    before = _rows(_fragmented_warehouse(spark, root))
    parts = sorted(d for d in os.listdir(root) if d.startswith("event_minute="))
    p = os.path.join(root, parts[0])

    # simulate the crash: a staged copy exists alongside the partition
    staging, old = _swap_paths(p)
    assert os.path.basename(staging).startswith("._compact_")
    assert os.path.basename(old).startswith("._compact_")
    spark.read.parquet(p).write.parquet(staging)

    # readers see the exact pre-crash rows — no duplicates, no phantom
    assert _rows(spark.read.parquet(root)) == before

    # and a rerun fails fast instead of silently discarding a copy
    with pytest.raises(RuntimeError, match="_compact_"):
        compact_warehouse(spark, root, target_bytes=1)

    # a DIRECT compact_partition call on the crashed partition gets the
    # same curated fail-fast (not a raw ENOTEMPTY mid-swap)
    from end2end_data_pipeline_spark.sources.compaction import compact_partition

    with pytest.raises(RuntimeError, match="_compact_"):
        compact_partition(spark, p, target_bytes=1)
