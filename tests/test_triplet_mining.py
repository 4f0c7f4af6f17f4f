"""Semantic invariants of contrastive triplet mining beyond the hash
oracle: sides must have the right labels, margins must reconcile, and
every eligible query (both sides present in its bucket) must appear
exactly once."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.functions import vectors as vec
from end2end_data_pipeline_spark.operators.similarity import QUERY_STRIDE

SF = "/root/testdata/sf0.001"


def test_triplet_mining_invariants(spark):
    rows = entrymod.queries()["embedding_triplet_mining"](spark, SF).collect()
    assert rows, "triplet mining returned no rows at sf0.001"
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    prev_margin = None
    for r in rows:
        assert r["query_id"] % QUERY_STRIDE == 0
        assert labels[r["query_id"]] == r["query_label"]
        assert labels[r["pos_id"]] == r["query_label"]
        assert labels[r["neg_id"]] != r["query_label"]
        assert r["margin"] == r["pos_cosine"] - r["neg_cosine"]
        if prev_margin is not None:
            assert r["margin"] >= prev_margin
        prev_margin = r["margin"]
    # every query whose LSH bucket holds BOTH a same-label and a
    # different-label candidate appears exactly once
    q = vec.quantize("embedding", th.DUCK)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    (n_eligible,) = con.execute(
        f"""
        WITH qbase AS (
          SELECT vec_id, label, {q} AS qv FROM embeddings
        ), b AS (
          SELECT vec_id, label, {vec.lsh_bucket('qv', th.DUCK)} AS bucket
          FROM qbase
        )
        SELECT count(*) FROM b q
        WHERE q.vec_id % {QUERY_STRIDE} = 0
          AND EXISTS (SELECT 1 FROM b c WHERE c.bucket = q.bucket
                      AND c.vec_id <> q.vec_id AND c.label = q.label)
          AND EXISTS (SELECT 1 FROM b c WHERE c.bucket = q.bucket
                      AND c.vec_id <> q.vec_id AND c.label <> q.label)
        """
    ).fetchone()
    assert len(rows) == n_eligible
    assert len({r["query_id"] for r in rows}) == len(rows)
