"""Persisted IVF index lifecycle: build once, append deltas against
the frozen quantizer, probe with partition pruning — and the
incremental path must be indistinguishable from a full rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from end2end_data_pipeline_spark.operators.similarity import (
    IVF_NPROBE,
    N_IVF_CELLS,
    _ivf_assign_frame,
    _ivf_centroids,
    _ivf_probes,
    _qbase,
    append_ivf_index,
    probe_ivf_index,
)

SF = "/root/testdata/sf0.001"


def test_incremental_append_equals_full_build(spark, tmp_path):
    """Build the index on an initial slice (which holds the centroid
    vectors), append the rest as a delta with the FROZEN centroids,
    and probe: results must equal probing a full one-shot build.
    The standing index is never rewritten — the delta write touches
    only the delta's cell partitions."""
    base = _qbase(spark, SF)
    centroids = _ivf_centroids(base)
    # initial corpus: centroids + every even vector; delta: odd vectors
    initial = base.where(
        (F.col("vec_id") < N_IVF_CELLS) | (F.col("vec_id") % 2 == 0)
    )
    delta = base.where(
        (F.col("vec_id") >= N_IVF_CELLS) & (F.col("vec_id") % 2 == 1)
    )

    incr_dir = str(tmp_path / "incr")
    _ivf_assign_frame(initial, centroids).write.partitionBy(
        "cell_id"
    ).parquet(incr_dir)
    append_ivf_index(incr_dir, delta, centroids)

    full_dir = str(tmp_path / "full")
    _ivf_assign_frame(base, centroids).write.partitionBy("cell_id").parquet(
        full_dir
    )

    schema = _ivf_assign_frame(base, centroids).schema
    incr = spark.read.schema(schema).parquet(incr_dir)
    full = spark.read.schema(schema).parquet(full_dir)
    assert incr.count() == full.count() == base.count()

    queries = _ivf_probes(spark, SF, IVF_NPROBE)
    got = probe_ivf_index(incr, queries).collect()
    want = probe_ivf_index(full, queries).collect()
    assert list(map(tuple, got)) == list(map(tuple, want))
    assert len(got) > 0


def test_append_only_touches_delta_cells(spark, tmp_path):
    """A delta landing in a strict subset of cells must leave every
    other cell partition byte-identical (file listing unchanged) —
    the no-rewrite guarantee that makes appends safe to run while
    probes are reading."""
    import os

    base = _qbase(spark, SF)
    centroids = _ivf_centroids(base)
    initial = base.where(F.col("vec_id") < 100)
    one_vec = base.where(F.col("vec_id") == 200)

    out = str(tmp_path / "idx")
    _ivf_assign_frame(initial, centroids).write.partitionBy(
        "cell_id"
    ).parquet(out)

    def files_per_cell():
        return {
            d: sorted(os.listdir(os.path.join(out, d)))
            for d in os.listdir(out)
            if d.startswith("cell_id=")
        }

    before = files_per_cell()
    append_ivf_index(out, one_vec, centroids)
    after = files_per_cell()

    target = {
        r["cell_id"]
        for r in _ivf_assign_frame(one_vec, centroids)
        .select("cell_id")
        .collect()
    }
    assert len(target) == 1
    changed = {
        d for d in after if after[d] != before.get(d, [])
    }
    assert changed == {f"cell_id={c}" for c in target}
