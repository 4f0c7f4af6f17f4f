"""Similarity search over the ``embeddings`` table (array<float>, 64-d):
brute-force exact top-k as the baseline, random-hyperplane LSH
bucketing as the scale path (BASELINE.json north star).

Scale design:
- the query set is SMALL (sampled ids) and the corpus is BIG — the
  brute-force top-k broadcasts the queries against the corpus scan, so
  the corpus never shuffles; per-partition candidates reduce via the
  rank window on the (small) query key space;
- the LSH variant buckets the corpus once (per-row math), then joins
  within buckets — O(n x bucket) instead of O(n x m);
- all vector math is integer-quantized (functions/vectors.py): exact,
  order-insensitive, engine-portable, and 2x cheaper to move than
  doubles. No UDFs — dot products are codegen'd array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.functions import vectors as vec
from end2end_data_pipeline_spark.registry import ORACLE, query
from end2end_data_pipeline_spark.sources.tables import (
    fan_out,
    frame_memo_tag,
    input_scaled_partitions,
    load_table,
    session_cached,
    session_checkpointed,
    sf_tag,
)

QUERY_STRIDE = 50  # vec_id % 50 == 0 -> 2% of vectors are queries
TOP_K = 3


def _qbase_sql() -> str:
    q = vec.quantize("embedding", th.DUCK)
    return f"""
    WITH qbase AS (
      SELECT vec_id, label, {q} AS qv,
             {vec.dot_q(q, q, th.DUCK)} AS norm2
      FROM embeddings
    )"""


def _qbase(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    q = vec.quantize("embedding", th.SPARK)
    return emb.select(
        "vec_id",
        "label",
        F.expr(q).alias("qv"),
    ).withColumn("norm2", F.expr(vec.dot_q("qv", "qv", th.SPARK)))


@query(
    "embedding_norms",
    oracle=_qbase_sql()
    + """
    SELECT vec_id, label, CAST(norm2 AS BIGINT) AS norm2 FROM qbase
    ORDER BY vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized self-dot per vector — validates the quantization and
    integer dot-product machinery value-exactly."""
    return _qbase(spark, sf_dir).select("vec_id", "label", "norm2").orderBy("vec_id")


@query(
    "knn_bruteforce",
    oracle=_qbase_sql()
    + f""", pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)} AS cosine
      FROM qbase q JOIN qbase c ON c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a sampled query set. The query
    side is broadcast; the corpus is scanned once, never shuffled —
    the correct brute-force shape at 100 TB."""
    base = _qbase(spark, sf_dir)
    queries = F.broadcast(
        base.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("norm2").alias("q_norm2"),
        )
    )
    pairs = queries.join(base, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(vec.cosine_q("q_qv", "qv", "q_norm2", "norm2", th.SPARK)).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_lsh_buckets",
    oracle=_qbase_sql()
    + f"""
    SELECT {vec.lsh_bucket('qv', th.DUCK)} AS bucket,
           count(*) AS n_vectors,
           count(DISTINCT label) AS n_labels
    FROM qbase GROUP BY 1 ORDER BY 1
    """,
)
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket census (8 planes -> 256 buckets).
    Bucketing is per-row math; the only shuffle is the O(256) rollup."""
    base = _qbase(spark, sf_dir)
    return (
        base.withColumn("bucket", F.expr(vec.lsh_bucket("qv", th.SPARK)))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count_distinct("label").alias("n_labels"),
        )
        .orderBy("bucket")
    )


@query(
    "ann_lsh_topk",
    oracle=_qbase_sql()
    + f""", bucketed AS (
      SELECT *, {vec.lsh_bucket('qv', th.DUCK)} AS bucket FROM qbase
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)} AS cosine
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id), then exact cosine rank within the
    bucket — the O(n x bucket) ANN shape."""
    base = _qbase(spark, sf_dir).withColumn(
        "bucket", F.expr(vec.lsh_bucket("qv", th.SPARK))
    )
    queries = base.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = queries.join(
        base,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(vec.cosine_q("q_qv", "qv", "q_norm2", "norm2", th.SPARK)).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


NEARDUP_COSINE = 0.30  # driver corpus is near-orthogonal random; real
# near-dup corpora use ~0.95 — the plan shape is threshold-independent

# Hot-bucket guard, mirroring dedup.LSH_BUCKET_CAP: an LSH bucket of f
# vectors yields f^2/2 candidate pairs, so degenerate buckets (e.g.
# zero-vectors all landing in bucket 0) are dropped from candidate
# generation on BOTH engines before the self-join.
EMB_BUCKET_CAP = 200


@query(
    "dedup_embedding_neardup",
    oracle=_qbase_sql()
    + f""", bucketed AS (
      SELECT *, {vec.lsh_bucket('qv', th.DUCK)} AS bucket FROM qbase
    ), ok_buckets AS (
      SELECT bucket FROM bucketed GROUP BY bucket
      HAVING count(*) <= {EMB_BUCKET_CAP}
    ), capped AS (
      SELECT bucketed.* FROM bucketed JOIN ok_buckets USING (bucket)
    )
    SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           {vec.cosine_q('a.qv', 'b.qv', 'a.norm2', 'b.norm2', th.DUCK)} AS cosine
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {vec.cosine_q('a.qv', 'b.qv', 'a.norm2', 'b.norm2', th.DUCK)}
          >= {NEARDUP_COSINE}
    ORDER BY left_id, right_id
    """,
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-candidate-generated:
    candidate pairs come from an equi-join on the LSH bucket (never the
    O(n^2) cross join), then the exact quantized cosine verifies each
    candidate. The oracle replays the identical bucketing + verify, so
    the comparison is exact. The recall/throughput dial is N_PLANES
    (fewer planes -> bigger buckets -> higher recall, more compare
    work) — at 100 TB you'd also OR multiple independent plane sets,
    exactly like MinHash banding."""
    base = _qbase(spark, sf_dir).withColumn(
        "bucket", F.expr(vec.lsh_bucket("qv", th.SPARK))
    )
    oversize = (
        base.groupBy("bucket")
        .count()
        .where(F.col("count") > EMB_BUCKET_CAP)
        .select("bucket")
    )
    base = base.join(F.broadcast(oversize), ["bucket"], "left_anti")
    left = base.select(
        F.col("vec_id").alias("left_id"),
        F.col("qv").alias("l_qv"),
        F.col("norm2").alias("l_norm2"),
        F.col("bucket").alias("l_bucket"),
    )
    right = base.select(
        F.col("vec_id").alias("right_id"),
        F.col("qv").alias("r_qv"),
        F.col("norm2").alias("r_norm2"),
        F.col("bucket").alias("r_bucket"),
    )
    pairs = left.join(
        right,
        (F.col("l_bucket") == F.col("r_bucket"))
        & (F.col("left_id") < F.col("right_id")),
    ).select(
        "left_id",
        "right_id",
        F.expr(
            vec.cosine_q("l_qv", "r_qv", "l_norm2", "r_norm2", th.SPARK)
        ).alias("cosine"),
    )
    return (
        pairs.where(F.col("cosine") >= NEARDUP_COSINE)
        .orderBy("left_id", "right_id")
    )


N_IVF_CELLS = 16


def _ivf_assign_sql() -> str:
    """DuckDB: assign every vector to its max-cosine centroid
    (centroids = the first N_IVF_CELLS vectors — a deterministic
    coarse quantizer both engines derive identically)."""
    cos = vec.cosine_q("v.qv", "c.qv", "v.norm2", "c.norm2", th.DUCK)
    return f""", centroids AS (
      SELECT vec_id AS cell_id, qv, norm2 FROM qbase
      WHERE vec_id < {N_IVF_CELLS}
    ), assigned AS (
      SELECT vec_id, label, qv, norm2, cell_id FROM (
        SELECT v.vec_id, v.label, v.qv, v.norm2, c.cell_id,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cos} DESC, c.cell_id) AS rn
        FROM qbase v CROSS JOIN centroids c
      ) WHERE rn = 1
    )"""


def _ivf_centroids(base: DataFrame) -> DataFrame:
    """The deterministic coarse quantizer: the first N_IVF_CELLS
    vectors of a quantized base frame, shaped for broadcast."""
    return base.where(F.col("vec_id") < N_IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("qv").alias("c_qv"),
        F.col("norm2").alias("c_norm2"),
    )


def _ivf_assign_frame(base: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector of ``base`` to its max-cosine centroid —
    frame-parameterized so the SAME pass serves both a full build and
    an incremental delta (``append_ivf_index``)."""
    centroids = F.broadcast(centroids)
    scored = base.crossJoin(centroids).select(
        "vec_id",
        "label",
        "qv",
        "norm2",
        "cell_id",
        F.expr(vec.cosine_q("qv", "c_qv", "norm2", "c_norm2", th.SPARK)).alias(
            "c_cos"
        ),
    )
    # argmax via max(struct(...)): lexicographic struct-max IS the
    # (cosine DESC, cell_id ASC) pick — negated cell_id turns the
    # ascending tie-break into a max — but partial-aggregates
    # map-side, so the K-way fan-out collapses before the shuffle
    # instead of sorting n x K rows inside a per-vector window (the
    # r13 family profile showed this window's Exchange+Sort repeated
    # in every IVF/IVF-PQ composition; same trick as _pq_assigned).
    # NULL cosines (NULL embedding) land below every non-NULL in the
    # struct order and fall through to the smallest cell id — exactly
    # the window's NULLS-LAST + cell_id tie-break pick.
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("c_cos"),
                (-F.col("cell_id")).alias("negc"),
                F.col("cell_id"),
                F.col("label"),
                F.col("qv"),
                F.col("norm2"),
            )
        ).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.label").alias("label"),
        F.col("b.qv").alias("qv"),
        F.col("b.norm2").alias("norm2"),
        F.col("b.cell_id").alias("cell_id"),
    )


def _ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus cell assignment. Deliberately NOT session-cached
    (r14, measured): the assignment is a map-side argmax riding the
    scan — cheap per execution — and putting an InMemoryRelation here
    destabilized the ann_ivf_topk candidate join (the unmaterialized
    cache's inflated size estimate flipped the probe join to
    sort-merge depending on which family member ran first; nprobe
    0.94 s -> 2.4 s). The PQ encoders fuse this derivation into their
    own one-time cached builds instead (_pq_codes_op /
    _pq_resid_codes_op)."""
    base = _qbase(spark, sf_dir)
    return _ivf_assign_frame(base, _ivf_centroids(base))


@query(
    "ann_ivf_cells",
    oracle=_qbase_sql()
    + _ivf_assign_sql()
    + """
    SELECT cell_id, count(*) AS n_vectors, count(DISTINCT label) AS n_labels
    FROM assigned GROUP BY cell_id ORDER BY cell_id
    """,
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer census: every vector assigned to its
    max-cosine centroid (the inverted-file partition). Assignment is
    an O(n x K) broadcast pass — the corpus never shuffles until the
    O(K) rollup."""
    return (
        _ivf_assign(spark, sf_dir)
        .groupBy("cell_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count_distinct("label").alias("n_labels"),
        )
        .orderBy("cell_id")
    )


@query(
    "ann_ivf_topk",
    oracle=_qbase_sql()
    + _ivf_assign_sql()
    + f""", pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)} AS cosine
      FROM assigned q JOIN assigned c
        ON q.cell_id = c.cell_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1): queries search only their own centroid cell
    — candidates shrink ~K-fold vs brute force. The recall dial is
    nprobe (``ann_ivf_topk_nprobe`` searches the 2 nearest cells); the
    complementary scale path to the LSH variant (``ann_lsh_topk``).
    Same equi-join shape either way."""
    return _ivf_topk(spark, sf_dir, nprobe=1)


def _ivf_probes(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """Query-side probe list: each query vector paired with its
    ``nprobe`` nearest centroid cells (same broadcast O(n x K) pass as
    the corpus assignment, keeping the top-nprobe ranks instead of 1)."""
    base = _qbase(spark, sf_dir)
    centroids = F.broadcast(_ivf_centroids(base))
    scored = (
        base.where(F.col("vec_id") % QUERY_STRIDE == 0)
        .crossJoin(centroids)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("norm2").alias("q_norm2"),
            "cell_id",
            F.expr(
                vec.cosine_q("qv", "c_qv", "norm2", "c_norm2", th.SPARK)
            ).alias("c_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), "cell_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "q_qv", "q_norm2", F.col("cell_id").alias("q_cell"))
    )


def _ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """Shared IVF search: corpus stays in its rn=1 cell; each query
    probes its ``nprobe`` nearest cells. A corpus vector lives in
    exactly one cell, so multi-probe never duplicates a candidate
    pair and needs no distinct."""
    assigned = _ivf_assign(spark, sf_dir)
    queries = _ivf_probes(spark, sf_dir, nprobe)
    pairs = queries.join(
        assigned,
        (F.col("cell_id") == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(vec.cosine_q("q_qv", "qv", "q_norm2", "norm2", th.SPARK)).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


IVF_NPROBE = 2


@query(
    "ann_ivf_topk_nprobe",
    oracle=_qbase_sql()
    + _ivf_assign_sql()
    + f""", probes AS (
      SELECT query_id, qv, norm2, cell_id FROM (
        SELECT v.vec_id AS query_id, v.qv, v.norm2, c.cell_id,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {vec.cosine_q('v.qv', 'c.qv', 'v.norm2', 'c.norm2', th.DUCK)} DESC, c.cell_id) AS rn
        FROM qbase v CROSS JOIN centroids c
        WHERE v.vec_id % {QUERY_STRIDE} = 0
      ) WHERE rn <= {IVF_NPROBE}
    ), pairs AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)} AS cosine
      FROM probes q JOIN assigned c
        ON q.cell_id = c.cell_id AND c.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-probe (nprobe={IVF_NPROBE}): each query
    searches its 2 nearest cells, recovering the recall lost when a
    true neighbor sits just across a cell boundary. Candidate volume
    scales linearly with nprobe (still ~K/nprobe-fold below brute
    force); the corpus-side layout is unchanged, so the probe dial is
    purely query-side — the property that makes recall tunable per
    query class at 100 TB without re-sharding the index."""
    return _ivf_topk(spark, sf_dir, nprobe=IVF_NPROBE)


# (applicationId, abs sf_dir) -> (persisted index directory, schema)
_IVF_INDEX: dict[tuple[str, str], tuple[str, object]] = {}


def persisted_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted file AS STORAGE: the cell assignment materialized
    once per (session, sf_dir) as parquet PARTITIONED BY cell_id —
    the build-once/probe-many layout real vector serving uses. Every
    probe then touches only its nprobe cell directories instead of
    the whole corpus (dynamic partition pruning; asserted in
    ``tests/test_plan_audit.py``). At 100 TB the cell count would be
    sized so a cell is a few files (~sqrt(n) cells), and this
    one-time write plays the same amortized role as the bucketed
    orderkey tables. Read back with an explicit schema so an empty
    corpus round-trips as an empty frame (no inference pass)."""
    import os as _os
    import tempfile as _tempfile

    sf_abs = _os.path.abspath(sf_dir)
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_abs)
    cached = _IVF_INDEX.get(key)
    if cached is not None and _os.path.isdir(cached[0]):
        out, schema = cached
    else:
        # the assignment DAG is built only on the (re)build path; hot
        # calls reuse the memoized path+schema without re-analyzing it
        assigned = _ivf_assign(spark, sf_dir)
        out = _os.path.join(
            _tempfile.gettempdir(), "spark_graft_ivf", app_id,
            sf_abs.strip("/").replace("/", "_"),
        )
        assigned.write.mode("overwrite").partitionBy("cell_id").parquet(out)
        schema = assigned.schema
        _IVF_INDEX[key] = (out, schema)
    return spark.read.schema(schema).parquet(out)


@query(
    # IDENTICAL oracle to ann_ivf_topk_nprobe: persistence is a
    # layout choice and must be value-invisible.
    "ann_ivf_persisted_topk",
    oracle=ORACLE["ann_ivf_topk_nprobe"],
)
def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF search over the PERSISTED inverted file: the
    corpus is not re-assigned per query — probes join the
    cell-partitioned index on its partition column, so dynamic
    partition pruning limits the scan to the probed cells (the
    vector-search analog of the minute-partitioned warehouse
    extract). Results must hash-match the in-memory
    ``ann_ivf_topk_nprobe`` exactly."""
    index = persisted_ivf_index(spark, sf_dir)
    queries = _ivf_probes(spark, sf_dir, IVF_NPROBE)
    return probe_ivf_index(index, queries)


def probe_ivf_index(index: DataFrame, queries: DataFrame) -> DataFrame:
    """Top-k search of a (possibly persisted) IVF index frame by a
    probe frame (query_id, q_qv, q_norm2, q_cell): DPP-prunable
    equi-join on the cell, exact cosine re-rank inside the probed
    cells."""
    pairs = index.join(
        F.broadcast(queries),
        (F.col("cell_id") == F.col("q_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(vec.cosine_q("q_qv", "qv", "q_norm2", "norm2", th.SPARK)).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def append_ivf_index(
    index_dir: str, delta: DataFrame, centroids: DataFrame
) -> None:
    """Incremental index maintenance: assign ONLY the delta against
    the FROZEN coarse quantizer (the centroids the index was built
    with — re-deriving them from a grown corpus would silently
    re-shard every existing cell) and append the new rows to their
    cell partitions. The standing index is never read or rewritten —
    the same prior-corpus-never-re-read posture as the incremental
    dedup family (``operators/incremental.py``). ``delta`` and
    ``centroids`` are quantized frames shaped like ``_qbase`` output.
    """
    assigned = _ivf_assign_frame(delta, centroids)
    assigned.write.mode("append").partitionBy("cell_id").parquet(index_dir)


@query(
    "docs_embedding_profile",
    oracle=_qbase_sql()
    + f""", bucketed AS (
      SELECT vec_id, label, {vec.lsh_bucket('qv', th.DUCK)} AS bucket FROM qbase
    )
    SELECT b.bucket,
           count(*) AS n_docs,
           count(DISTINCT d.lang) AS n_langs,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           count(DISTINCT b.label) AS n_labels
    FROM bucketed b JOIN documents d ON d.doc_id = b.vec_id
    GROUP BY b.bucket ORDER BY b.bucket
    """,
)
def docs_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text metadata (documents) x embedding-space
    structure (LSH buckets), 1:1 on doc_id=vec_id. The shape of
    'profile each vector-space cluster by its source text' — at scale
    both sides shuffle once on the shared key (or co-bucketed storage
    makes it free)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    bucketed = _qbase(spark, sf_dir).select(
        "vec_id",
        "label",
        F.expr(vec.lsh_bucket("qv", th.SPARK)).alias("bucket"),
    )
    return (
        bucketed.join(docs, bucketed.vec_id == docs.doc_id)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("label").alias("n_labels"),
        )
        .orderBy("bucket")
    )


@query(
    "label_centroids",
    oracle=f"""
    WITH q AS (
      SELECT label, {vec.quantize('embedding', vec.DUCK)} AS qv
      FROM embeddings
    ), e AS (
      SELECT label,
             unnest(range(1, len(qv) + 1)) AS pos,
             unnest(qv) AS v
      FROM q
    )
    SELECT label,
           CAST(pos AS BIGINT) AS pos,
           count(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_q,
           SUM(v) / (count(*) * {vec.SCALE}.0) AS centroid_component
    FROM e
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids (the training step of
    nearest-centroid classification / k-means-style partitioning):
    component-wise mean vector per label, accumulated in exact
    quantized-integer arithmetic so both engines agree bit-for-bit
    (vectors.py contract); the single float division happens at the
    output boundary.

    Scale: posexplode turns the corpus into (label, pos, v) triples
    that partially aggregate map-side — the shuffle carries at most
    |labels| x dim rows of int sums, not vectors; no collect, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.expr(vec.quantize("embedding", vec.SPARK)).alias("qv")
    )
    e = q.select("label", F.posexplode("qv").alias("pos0", "v"))
    return (
        e.groupBy("label", (F.col("pos0") + 1).cast("bigint").alias("pos"))
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sum_q"),
            (F.sum("v") / (F.count("*") * F.lit(float(vec.SCALE)))).alias(
                "centroid_component"
            ),
        )
        .orderBy("label", "pos")
    )


@query(
    "centroid_separation",
    oracle=f"""
    WITH q AS (
      SELECT label, {vec.quantize('embedding', vec.DUCK)} AS qv
      FROM embeddings
    ), e AS (
      SELECT label,
             unnest(range(1, len(qv) + 1)) AS pos,
             unnest(qv) AS v
      FROM q
    ), sums AS (
      SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
      FROM e GROUP BY label, pos
    ), norms AS (
      SELECT label, SUM(CAST(s AS HUGEINT) * s) AS n2
      FROM sums GROUP BY label
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(SUM(CAST(a.s AS HUGEINT) * b.s) AS DOUBLE) AS dot
      FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, dot,
           dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS cosine
    FROM dots
    JOIN norms na ON label_a = na.label
    JOIN norms nb ON label_b = nb.label
    ORDER BY label_a, label_b
    """,
)
def centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine separation between class centroids — the
    confusion-structure diagnostic run after computing
    ``label_centroids`` (close centroids = classes a nearest-centroid
    model will confuse). Works on the per-label SUM vectors: the 1/n
    mean factors cancel inside cosine, so the whole computation stays
    exact — int64 component sums, DECIMAL(38,0)/HUGEINT for their
    squares/products (s^2 crosses int64 near 3.8e4 vectors/label) —
    until the final sqrt division (vectors.py contract); ``dot``
    itself is reported as DOUBLE since its exact value outgrows int64
    at scale.

    Scale: reuses the label_centroids aggregation (|labels| x dim int
    rows), then an O(|labels|^2 x dim) self-join on pos — tiny
    however large the corpus; nothing re-touches the raw vectors."""
    import os

    emb = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.select("label", F.expr(vec.quantize("embedding", vec.SPARK)).alias("qv"))
    # |labels| x dim frame feeding the norms and BOTH self-join sides —
    # session-cached so repeats share ONE InMemoryRelation
    sums = session_cached(
        spark,
        f"centroid_sums_{sf_tag(os.path.abspath(sf_dir))}",
        q.select("label", F.posexplode("qv").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.sum("v").alias("s")),
    )
    # norms/dots accumulate in DECIMAL(38,0) / HUGEINT and `dot`
    # crosses the output boundary as DOUBLE (r13 overflow audit): the
    # per-(label,pos) sums s grow with members-per-label, so s^2
    # crosses int64 near 3.8e4 vectors/label (~sf19) — and at sf1000
    # the dot VALUE itself (~1e22) outgrows any int64 output column.
    norms = sums.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(19,0)") * F.col("s")).alias("n2")
    )
    a = sums.select(F.col("label").alias("label_a"), "pos", F.col("s").alias("sa"))
    b = sums.select(F.col("label").alias("label_b"), "pos", F.col("s").alias("sb"))
    dots = (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa").cast("decimal(19,0)") * F.col("sb"))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            "dot",
            (
                F.col("dot")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


# --- scalar quantization audit --------------------------------------

QUANT_BITS_MAX = 127  # int8 symmetric quantization range


def _quant_exprs(dialect: str) -> dict[str, str]:
    """Shared Spark/DuckDB expression set for the int8 scalar
    quantization audit. All per-dimension arithmetic is IEEE double
    ops (float32 widens exactly), reductions are exact-integer sums —
    a float reduction's summation order is engine-dependent, so the
    per-dim reconstruction error is floored into integer micro-units
    BEFORE summing."""
    c127 = f"CAST({QUANT_BITS_MAX} AS DOUBLE)"
    if dialect == th.SPARK:
        maxabs = "array_max(transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
        q = f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * {c127} / maxabs) AS BIGINT))"
        q_sum = "aggregate(q, 0L, (acc, x) -> acc + x)"
        q_min, q_max = "array_min(q)", "array_max(q)"
        n_sat = f"size(filter(q, x -> abs(x) >= {QUANT_BITS_MAX}))"
        err = (
            f"aggregate(zip_with(embedding, q, (v, x) -> "
            f"CAST(floor(abs(CAST(v AS DOUBLE) * {c127} / maxabs - x) * CAST(1000000 AS DOUBLE)) AS BIGINT)), "
            f"0L, (acc, e) -> acc + e)"
        )
    else:
        maxabs = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
        q = f"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * {c127} / maxabs) AS BIGINT))"
        q_sum = "CAST(list_sum(q) AS BIGINT)"
        q_min, q_max = "list_min(q)", "list_max(q)"
        n_sat = f"len(list_filter(q, x -> abs(x) >= {QUANT_BITS_MAX}))"
        err = (
            f"CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> "
            f"CAST(floor(abs(CAST(embedding[i] AS DOUBLE) * {c127} / maxabs - q[i]) * CAST(1000000 AS DOUBLE)) AS BIGINT))) AS BIGINT)"
        )
    return {
        "maxabs": maxabs,
        "q": q,
        "q_sum": q_sum,
        "q_min": q_min,
        "q_max": q_max,
        "n_sat": n_sat,
        "err": err,
    }


_QD = _quant_exprs(th.DUCK)


@query(
    "embedding_quantization_profile",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id, label, embedding, {_QD['maxabs']} AS maxabs
      FROM embeddings WHERE {_QD['maxabs']} > 0
    ), quantized AS (
      SELECT vec_id, label, embedding, maxabs, {_QD['q']} AS q FROM scaled
    )
    SELECT vec_id, CAST(label AS INT) AS label, maxabs,
           {_QD['q_sum']} AS q_sum,
           CAST({_QD['q_min']} AS BIGINT) AS q_min,
           CAST({_QD['q_max']} AS BIGINT) AS q_max,
           CAST({_QD['n_sat']} AS BIGINT) AS n_sat,
           {_QD['err']} AS err_micro
    FROM quantized ORDER BY vec_id
    """,
)
def embedding_quantization_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar-quantization audit per vector — the
    compression step an ANN index applies before storing 100 TB of
    embeddings, with the information it needs to budget: per-vector
    scale (maxabs), quantized checksum/extremes, saturated-dimension
    count, and total reconstruction error in exact integer micro-units
    (floored per dimension before summing, so the reduction order an
    engine picks cannot change the answer).

    Scale: pure per-row array math over codegen'd higher-order
    builtins — embarrassingly parallel, zero shuffles beyond the
    presentation sort."""
    e = _quant_exprs(th.SPARK)
    emb = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    return (
        emb.withColumn("maxabs", F.expr(e["maxabs"]))
        .where(F.col("maxabs") > 0)
        .withColumn("q", F.expr(e["q"]))
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            "maxabs",
            F.expr(e["q_sum"]).alias("q_sum"),
            F.expr(e["q_min"]).cast("bigint").alias("q_min"),
            F.expr(e["q_max"]).cast("bigint").alias("q_max"),
            F.expr(e["n_sat"]).cast("bigint").alias("n_sat"),
            F.expr(e["err"]).alias("err_micro"),
        )
        .orderBy("vec_id")
    )


# --- ANN recall evaluation ------------------------------------------


def _recall_oracle() -> str:
    """Compose the brute-force and IVF oracles (already registered
    above) into a recall@k evaluation — the oracle reuses the exact
    SQL of both sides as derived tables, so the eval can never drift
    from the operators it measures."""
    return f"""
    WITH truth AS (
      SELECT query_id, neighbor_id FROM ({ORACLE["knn_bruteforce"]}) t
    ), approx AS (
      SELECT query_id, neighbor_id FROM ({ORACLE["ann_ivf_topk_nprobe"]}) a
    )
    SELECT t.query_id,
           CAST(count(*) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) AS recall
    FROM truth t
    LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id ORDER BY t.query_id
    """


@query("ann_recall_eval", oracle=_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF multi-probe index against the brute-force
    ground truth, per query — the measure-don't-guess harness for the
    nprobe/cells recall dial: run it after any index-parameter change
    and read the recall column instead of trusting intuition.

    Scale: the expensive side (brute force) is already sampled to the
    query stride; the eval itself joins two O(queries x k) result sets
    — trivially broadcastable at any corpus size."""
    truth = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = (
        ann_ivf_topk_nprobe(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        truth.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.count("*").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# --- kNN-as-classifier evaluation -----------------------------------


@query(
    "knn_label_confusion",
    oracle=f"""
    WITH knn AS (
      SELECT query_id, neighbor_id FROM ({ORACLE["knn_bruteforce"]}) t
    ), labels AS (
      SELECT vec_id, label FROM embeddings
    ), votes AS (
      SELECT k.query_id, l.label, count(*) AS n_votes
      FROM knn k JOIN labels l ON l.vec_id = k.neighbor_id
      GROUP BY k.query_id, l.label
    ), predicted AS (
      SELECT query_id, label AS pred_label FROM (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT CAST(t.label AS INT) AS true_label,
           CAST(p.pred_label AS INT) AS pred_label,
           count(*) AS n_queries
    FROM predicted p JOIN labels t ON t.vec_id = p.query_id
    GROUP BY t.label, p.pred_label
    ORDER BY true_label, pred_label
    """,
)
def knn_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search as a classifier, evaluated: majority-vote the
    top-k neighbors' labels per query (ties broken to the smallest
    label — a total order both engines share) and cross-tabulate
    predicted vs true label. The confusion matrix is the standard
    embedding-space health check: labels that bleed into each other
    here will also co-mingle in ANN buckets and dedup clusters.

    Scale: reuses knn_bruteforce's result (O(queries x k) rows); label
    lookups broadcast; every aggregate is exact integers."""
    knn = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    labels = F.broadcast(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    )
    votes = (
        knn.join(labels, knn.neighbor_id == labels.vec_id)
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label")
    )
    predicted = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    return (
        predicted.join(labels, predicted.query_id == labels.vec_id)
        .groupBy(
            F.col("label").cast("int").alias("true_label"),
            F.col("pred_label").cast("int").alias("pred_label"),
        )
        .agg(F.count("*").alias("n_queries"))
        .orderBy("true_label", "pred_label")
    )


@query(
    "embedding_centroid_margin_profile",
    # cosine is scale-invariant, so centroids are represented by their
    # exact INTEGER component-sum vectors (no rational mean needed):
    # dot/norms stay exact bigints and the per-vector cosines/margins
    # are fixed-shape double ops — bit-stable cross-engine. (At a
    # corpus where per-label sums square past 2^63, integer-divide the
    # sum vector by n first — same direction, documented trade.)
    oracle=_qbase_sql()
    + f""", comp AS (
      SELECT label,
             unnest(range(1, len(qv) + 1)) AS pos,
             unnest(qv) AS v
      FROM qbase
    ), sums AS (
      SELECT label AS c_label, list(s ORDER BY pos) AS cvec
      FROM (
        SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
        FROM comp GROUP BY label, pos
      ) GROUP BY label
    ), cn AS (
      SELECT c_label, cvec,
             {vec.dot_q('cvec', 'cvec', th.DUCK)} AS cnorm2
      FROM sums
    ), scored AS (
      SELECT q.vec_id, q.label,
             MAX(CASE WHEN s.c_label = q.label THEN
               {vec.cosine_q('q.qv', 's.cvec', 'q.norm2', 's.cnorm2', th.DUCK)}
             END) AS own_cos,
             MAX(CASE WHEN s.c_label <> q.label THEN
               {vec.cosine_q('q.qv', 's.cvec', 'q.norm2', 's.cnorm2', th.DUCK)}
             END) AS best_other
      FROM qbase q CROSS JOIN cn s
      GROUP BY q.vec_id, q.label
    )
    SELECT label, count(*) AS n_vectors,
           CAST(SUM(CASE WHEN own_cos - best_other < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neg_margin,
           CAST(SUM(CASE WHEN own_cos - best_other < 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS share_neg
    FROM scored GROUP BY label ORDER BY label
    """,
)
def embedding_centroid_margin_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Label-noise audit via nearest-centroid margins: for every
    vector, cosine to its OWN label's centroid minus the best cosine
    to any OTHER label's centroid; a negative margin means the vector
    sits closer to a foreign class — the per-label negative-margin
    share is the 'how mislabeled is this slice' gauge that decides
    whether ``knn_label_confusion``'s disagreements are noise or
    structure.

    Scale: centroid sum-vectors build exactly like ``label_centroids``
    (map-side partial sums, |labels| x dim rows through the shuffle);
    scoring is the corpus scanned once against the O(|labels|)
    broadcast centroid table (same waived O(n x K) shape as the IVF
    quantizer); the profile is an O(|labels|) rollup."""
    base = _qbase(spark, sf_dir)
    comp = base.select("label", F.posexplode("qv").alias("pos", "v"))
    sums = (
        comp.groupBy("label", "pos")
        .agg(F.sum("v").cast("bigint").alias("s"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"],
            ).alias("cvec")
        )
        .withColumn("cnorm2", F.expr(vec.dot_q("cvec", "cvec", th.SPARK)))
    )
    # Gather the O(|labels|) centroids into ONE broadcast row and take
    # the own/best-other maxima with array higher-order functions in a
    # single map-only projection — the r12 shape (crossJoin + n x K
    # rows through a (vec_id, label) re-aggregation shuffle) paid a
    # corpus-sized exchange purely to undo the expansion it created
    # (guide §2.3/§2.4: aggregate before you shuffle / remove the
    # shuffle outright). array_max == MAX over the same double set
    # (NULLs ignored, empty -> NULL), so values are bit-identical.
    # The .where(size > 0) guard keeps the no-centroids case (all
    # embeddings NULL) returning ZERO rows exactly like the oracle's
    # CROSS JOIN against an empty cn.
    cents = sums.agg(
        F.collect_list(F.struct("c_label", "cvec", "cnorm2")).alias("cents")
    ).where(F.size("cents") > 0)
    cos_c = vec.cosine_q("qv", "c.cvec", "norm2", "c.cnorm2", th.SPARK)
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        F.expr(
            f"array_max(transform(filter(cents, c -> c.c_label = label),"
            f" c -> {cos_c}))"
        ).alias("own_cos"),
        F.expr(
            f"array_max(transform(filter(cents, c -> c.c_label <> label),"
            f" c -> {cos_c}))"
        ).alias("best_other"),
    )
    # when(...).otherwise(0), not a bare boolean cast: with a single
    # label in the slice best_other is MAX over an empty set (NULL),
    # and NULL < 0 must count as NOT-negative (0) exactly as the
    # oracle's CASE ... ELSE 0 END does — a bare cast propagates the
    # NULL into sum() and returns NULL counts (found by the 1-row
    # tiny-fixture strict sweep, r13)
    neg = F.when(F.col("own_cos") - F.col("best_other") < 0, 1).otherwise(0)
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(neg).cast("bigint").alias("n_neg_margin"),
            (F.sum(neg).cast("double") / F.count("*")).alias("share_neg"),
        )
        .orderBy("label")
    )


PQ_M = 4  # subspaces (EMBED_DIM 64 -> 16 dims each)
PQ_K = 8  # codewords per subspace (first PQ_K vectors' subvectors)
PQ_SUBDIM = vec.EMBED_DIM // PQ_M


def _pq_sqdist(a: str, b: str, dialect: str) -> str:
    """Exact integer squared L2 between two quantized subvectors."""
    if dialect == th.SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"0L, (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform({a}, "
        f"(x, i) -> (x - ({b})[i]) * (x - ({b})[i]))) AS BIGINT)"
    )


def _pq_subs(base: DataFrame) -> DataFrame:
    """(vec_id, subspace, sv): every embedding exploded into its PQ_M
    quantized subvectors — the shared front end of codebook census,
    corpus encoding, and query distance tables."""
    slices = F.array(
        *[F.slice("qv", i * PQ_SUBDIM + 1, PQ_SUBDIM) for i in range(PQ_M)]
    )
    return base.select(
        "vec_id", F.posexplode(slices).alias("subspace", "sv")
    ).select("vec_id", F.col("subspace").cast("int").alias("subspace"), "sv")


def _pq_codebook(subs: DataFrame) -> DataFrame:
    """Broadcast (subspace, code, cv) codewords — the first PQ_K
    vectors' subvectors, the same deterministic bootstrap as the IVF
    coarse quantizer, so both engines derive identical codebooks."""
    return F.broadcast(
        subs.where(F.col("vec_id") < PQ_K).select(
            "subspace",
            F.col("vec_id").alias("code"),
            F.col("sv").alias("cv"),
        )
    )


def _pq_codes_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id, subspace, code, d): the raw-vector PQ corpus
    ENCODE, session-cached once per (session, sf_dir) and shared by
    embedding_pq_codebook (subspace/code/d census), ann_pq_topk
    (vec/subspace/code lookup table) and ann_ivfpq_topk (the same
    codes plus the IVF cell) — before r14 each of the three re-ran
    the corpus-scale explode + broadcast-codebook argmin per
    execution. argmin via min(struct(d, code)): lexicographic
    struct-min is exactly the (distance, code-id) tie-broken
    assignment the oracle ranks, but partial-aggregates map-side.
    cell_id rides along from the session-cached IVF assignment (one
    int per row; functionally dependent on vec_id, so grouping by it
    changes nothing) — one encode serves both the flat-PQ and IVF-PQ
    shapes."""
    assigned = _ivf_assign(spark, sf_dir)
    slices = F.array(
        *[F.slice("qv", i * PQ_SUBDIM + 1, PQ_SUBDIM) for i in range(PQ_M)]
    )
    subs = assigned.select(
        "vec_id", "cell_id", F.posexplode(slices).alias("subspace", "sv")
    ).select(
        "vec_id",
        "cell_id",
        F.col("subspace").cast("int").alias("subspace"),
        "sv",
    )
    scored = subs.join(_pq_codebook(subs), "subspace").withColumn(
        "d", F.expr(_pq_sqdist("sv", "cv", th.SPARK))
    )
    return session_cached(
        spark,
        frame_memo_tag(sf_dir, "pq_codes"),
        scored.groupBy("vec_id", "cell_id", "subspace")
        .agg(F.min(F.struct("d", "code")).alias("best"))
        .select(
            "vec_id",
            "cell_id",
            "subspace",
            F.col("best.code").alias("code"),
            F.col("best.d").alias("d"),
        )
        .coalesce(input_scaled_partitions(sf_dir, "embeddings")),
    )


@query(
    "embedding_pq_codebook",
    # Codewords are the first PQ_K vectors' subvectors — the same
    # deterministic bootstrap as the IVF coarse quantizer, so both
    # engines derive identical codebooks from nothing. Distances are
    # exact integer squared L2 on quantized components; assignment
    # tie-breaks on code id. mean_sqdist is one division of exact
    # integers.
    oracle=_qbase_sql()
    + f""", subs AS (
      SELECT vec_id, CAST(v.sub AS INT) AS subspace,
             list_slice(qv, v.sub * {PQ_SUBDIM} + 1,
                        v.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM qbase, (VALUES (0), (1), (2), (3)) v(sub)
    ), codebook AS (
      SELECT subspace, vec_id AS code, sv AS cv
      FROM subs WHERE vec_id < {PQ_K}
    ), assigned AS (
      SELECT subspace, code, d FROM (
        SELECT s.subspace, c.code,
               {_pq_sqdist('s.sv', 'c.cv', th.DUCK)} AS d,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.subspace
                 ORDER BY {_pq_sqdist('s.sv', 'c.cv', th.DUCK)}, c.code
               ) AS rn
        FROM subs s JOIN codebook c USING (subspace)
      ) WHERE rn = 1
    )
    SELECT subspace, CAST(code AS BIGINT) AS code,
           count(*) AS n_vectors,
           CAST(SUM(d) AS BIGINT) AS total_sqdist,
           CAST(SUM(d) AS DOUBLE) / count(*) AS mean_sqdist
    FROM assigned GROUP BY subspace, code ORDER BY subspace, code
    """,
)
def embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization census: split every embedding into {M}
    16-dim subvectors, assign each to its nearest of {K} per-subspace
    codewords (exact integer squared L2 on the quantized components),
    and report per-cell population and distortion — the codebook
    health check behind PQ-compressed ANN indexes (Jégou et al. 2011),
    where 64 floats become {M} byte codes and mean_sqdist is the
    reconstruction error you trade for the 64x compression.

    Scale: the corpus never shuffles for assignment — each vector
    explodes to {M} subvector rows and equi-joins the O({M}x{K})
    broadcast codebook on the subspace key; the census is an
    O({M}x{K})-key partial aggregate. The codebook bootstrap
    (vec_id < {K}) is a filter, not a collect."""
    assigned = _pq_codes_op(spark, sf_dir).select("subspace", "code", "d")
    return (
        assigned.groupBy("subspace", F.col("code").cast("bigint").alias("code"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("d").cast("bigint").alias("total_sqdist"),
            (F.sum("d").cast("double") / F.count("*")).alias("mean_sqdist"),
        )
        .orderBy("subspace", "code")
    )


embedding_pq_codebook.__doc__ = embedding_pq_codebook.__doc__.replace(
    "{M}", str(PQ_M)
).replace("{K}", str(PQ_K))


@query(
    "ann_pq_topk",
    # ADC search composed from the codebook query's own pieces: corpus
    # codes (same tie-broken argmin), a query-side distance TABLE
    # (query subvector x every codeword), and the table-lookup sum —
    # all exact integers, rank tie-broken on neighbor id.
    oracle=_qbase_sql()
    + f""", subs AS (
      SELECT vec_id, CAST(v.sub AS INT) AS subspace,
             list_slice(qv, v.sub * {PQ_SUBDIM} + 1,
                        v.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM qbase, (VALUES (0), (1), (2), (3)) v(sub)
    ), codebook AS (
      SELECT subspace, vec_id AS code, sv AS cv
      FROM subs WHERE vec_id < {PQ_K}
    ), codes AS (
      SELECT vec_id, subspace, code FROM (
        SELECT s.vec_id, s.subspace, c.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.subspace
                 ORDER BY {_pq_sqdist('s.sv', 'c.cv', th.DUCK)}, c.code
               ) AS rn
        FROM subs s JOIN codebook c USING (subspace)
      ) WHERE rn = 1
    ), dtable AS (
      SELECT q.vec_id AS query_id, c.subspace, c.code,
             {_pq_sqdist('q.sv', 'c.cv', th.DUCK)} AS qd
      FROM subs q JOIN codebook c USING (subspace)
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), adc AS (
      SELECT d.query_id, x.vec_id AS neighbor_id,
             CAST(SUM(d.qd) AS BIGINT) AS adc_sqdist
      FROM codes x
      JOIN dtable d ON d.subspace = x.subspace AND d.code = x.code
      WHERE x.vec_id <> d.query_id
      GROUP BY d.query_id, x.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, adc_sqdist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sqdist, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, adc_sqdist, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (Jégou et al. 2011's ADC) — the
    SEARCH side the codebook census prepares for: corpus vectors are
    encoded once as {M} byte codes, each query precomputes its {M}x{K}
    distance table against the codewords, and a vector's approximate
    distance is {M} table lookups summed — no full-dimension math per
    candidate, which is the whole point of PQ-compressed serving.

    Spark shape at 100 TB: corpus encoding is the codebook query's
    broadcast-join argmin (one shuffle keyed (vec, subspace)); the
    distance table is queries x codewords, O(|Q| x {M} x {K}) rows,
    BROADCAST; ADC is then a broadcast equi-join on (subspace, code)
    with a map-side partial SUM down to |Q| x corpus candidate rows,
    and the rank window runs on the small query key space — the
    corpus never shuffles with itself and never re-reads full vectors
    during scoring (same brute-force-vs-index contract as
    ``ann_ivf_persisted_topk``; accuracy vs exact search is
    ``ann_recall_eval``'s job)."""
    # corpus codes from the family-shared session cache (one encode
    # per session for pq/ivfpq/codebook — r14); the query-side
    # distance table below stays a FRESH tiny scan: its vec_id filter
    # pushes into the parquet read and it must not drag the corpus
    # encode lineage into the broadcast branch.
    codes = _pq_codes_op(spark, sf_dir).select("vec_id", "subspace", "code")
    subs = _pq_subs(_qbase(spark, sf_dir))
    codebook = _pq_codebook(subs)
    qsubs = subs.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("subspace").alias("q_subspace"),
        F.col("sv").alias("q_sv"),
    )
    dtable = F.broadcast(
        qsubs.join(
            codebook, F.col("q_subspace") == F.col("subspace")
        ).select(
            "query_id",
            "subspace",
            "code",
            F.expr(_pq_sqdist("q_sv", "cv", th.SPARK)).alias("qd"),
        )
    )
    adc = (
        codes.join(dtable, ["subspace", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qd")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").cast("bigint").alias("adc_sqdist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_sqdist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_sqdist", "rank")
        .orderBy("query_id", "rank")
    )


ann_pq_topk.__doc__ = ann_pq_topk.__doc__.replace("{M}", str(PQ_M)).replace(
    "{K}", str(PQ_K)
)


@query(
    "ann_ivfpq_topk",
    # IVF coarse quantizer + PQ fine codes composed from their own
    # queries' pieces: candidates limited to each query's IVF_NPROBE
    # nearest cells, scored by the same ADC table-lookup sum as
    # ann_pq_topk. PQ here encodes RAW vectors (not residuals) — the
    # residual refinement is a quantizer variant, not a search-shape
    # change, and raw codes keep both engines' derivations identical.
    oracle=_qbase_sql()
    + _ivf_assign_sql()
    + f""", subs AS (
      SELECT a.vec_id, a.cell_id, CAST(v.sub AS INT) AS subspace,
             list_slice(a.qv, v.sub * {PQ_SUBDIM} + 1,
                        v.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM assigned a, (VALUES (0), (1), (2), (3)) v(sub)
    ), codebook AS (
      SELECT subspace, vec_id AS code, sv AS cv
      FROM subs WHERE vec_id < {PQ_K}
    ), codes AS (
      SELECT vec_id, cell_id, subspace, code FROM (
        SELECT s.vec_id, s.cell_id, s.subspace, c.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.subspace
                 ORDER BY {_pq_sqdist('s.sv', 'c.cv', th.DUCK)}, c.code
               ) AS rn
        FROM subs s JOIN codebook c USING (subspace)
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT v.vec_id AS query_id, c.cell_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {vec.cosine_q('v.qv', 'c.qv', 'v.norm2', 'c.norm2', th.DUCK)} DESC, c.cell_id) AS rn
        FROM qbase v CROSS JOIN centroids c
        WHERE v.vec_id % {QUERY_STRIDE} = 0
      ) WHERE rn <= {IVF_NPROBE}
    ), dtable AS (
      SELECT q.vec_id AS query_id, c.subspace, c.code,
             {_pq_sqdist('q.sv', 'c.cv', th.DUCK)} AS qd
      FROM subs q JOIN codebook c USING (subspace)
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), adc AS (
      SELECT p.query_id, x.vec_id AS neighbor_id,
             CAST(SUM(d.qd) AS BIGINT) AS adc_sqdist
      FROM codes x
      JOIN probes p ON p.cell_id = x.cell_id AND x.vec_id <> p.query_id
      JOIN dtable d ON d.query_id = p.query_id
                   AND d.subspace = x.subspace AND d.code = x.code
      GROUP BY p.query_id, x.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, adc_sqdist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sqdist, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, adc_sqdist, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition real vector indexes ship (Jégou et
    al. 2011; the FAISS `IVFx,PQy` default): the coarse quantizer
    prunes the corpus to each query's {NPROBE} nearest cells, and the
    survivors are scored by PQ asymmetric distance — {M} table
    lookups per candidate, never full-dimension math. Recall loses to
    exact search twice (cell pruning + code quantization), which is
    exactly the dial pair (nprobe, codebook size) serving systems
    tune; `ann_recall_eval` owns the accuracy measurement.

    Spark shape at 100 TB: ONE corpus pass fuses cell assignment (the
    broadcast O(n x cells) argmax) with PQ encoding (subvector explode
    + broadcast codebook argmin — one (vec, subspace)-keyed shuffle);
    the query side (probe list + distance tables) is O(|Q|) work
    BROADCAST; candidate generation is a broadcast semi-filter to the
    probed cells, so the scored fan-out is |Q| x (corpus/cells x
    nprobe) x {M} rows collapsing through a map-side partial SUM; the
    rank window runs on the query key space. The corpus never joins
    itself and never re-reads full vectors after encoding."""
    # cell-tagged corpus codes from the family-shared session cache
    # (one fused assign+encode per session — r14); the raw codebook
    # for the query-side distance table is the same first-PQ_K-vector
    # derivation either way, rebuilt from a pushdown-filtered scan.
    codes = _pq_codes_op(spark, sf_dir).select(
        "vec_id", "cell_id", "subspace", "code"
    )
    codebook = _pq_codebook(_pq_subs(_qbase(spark, sf_dir)))
    probes = F.broadcast(
        _ivf_probes(spark, sf_dir, IVF_NPROBE).select("query_id", "q_cell")
    )
    # Deliberately a FRESH scan + explode for the query side, not a
    # filter on `subs`: reusing the frame object would not dedup the
    # scan (no cache, no shared exchange) but WOULD drag the centroid
    # cross-join + assignment window into the query branch — strictly
    # more work for the same 2-scan total (r9 review, declined).
    qsubs = _pq_subs(_qbase(spark, sf_dir)).where(
        F.col("vec_id") % QUERY_STRIDE == 0
    )
    dtable = F.broadcast(
        qsubs.select(
            F.col("vec_id").alias("query_id"),
            F.col("subspace").alias("q_subspace"),
            F.col("sv").alias("q_sv"),
        )
        .join(codebook, F.col("q_subspace") == F.col("subspace"))
        .select(
            "query_id",
            "subspace",
            "code",
            F.expr(_pq_sqdist("q_sv", "cv", th.SPARK)).alias("qd"),
        )
    )
    cand = codes.join(
        probes,
        (F.col("cell_id") == F.col("q_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    adc = (
        cand.join(dtable, ["query_id", "subspace", "code"])
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qd")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").cast("bigint").alias("adc_sqdist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_sqdist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_sqdist", "rank")
        .orderBy("query_id", "rank")
    )


ann_ivfpq_topk.__doc__ = (
    ann_ivfpq_topk.__doc__.replace("{M}", str(PQ_M))
    .replace("{K}", str(PQ_K))
    .replace("{NPROBE}", str(IVF_NPROBE))
)


@query(
    # IDENTICAL oracle to ann_ivf_cells: the audit must see exactly
    # the census the in-memory assignment produces — a drifted
    # persisted index is the failure this query exists to catch.
    "ivf_cell_occupancy_audit",
    oracle=ORACLE["ann_ivf_cells"],
)
def ivf_cell_occupancy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index health check over the PERSISTED inverted file: per-cell
    vector and label counts read from the cell-partitioned store —
    the page-on-this metric for a serving team (an empty or bloated
    cell means a bad quantizer or a hot shard) and the post-append
    verification for ``append_ivf_index``. Scan-side cost is one
    column-pruned pass over the index; at 100 TB the same rollup runs
    per cell directory. Hash-matching ``ann_ivf_cells``'s oracle
    proves the persisted layout lost nothing."""
    index = persisted_ivf_index(spark, sf_dir)
    return (
        index.groupBy("cell_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count_distinct("label").alias("n_labels"),
        )
        .orderBy("cell_id")
    )


def _pq_resid_subs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id, subspace, sv): every vector's RESIDUAL
    (vector − its cell centroid) exploded into PQ subvectors — the
    front end of the residual encode and of the residual codebook
    derivation. Reads the session-cached IVF assignment, so the only
    per-call work is a broadcast centroid join + zip_with + explode
    (and a vec_id filter on the cache when only codebook rows are
    wanted)."""
    assigned = _ivf_assign(spark, sf_dir)
    cents = _ivf_centroids(_qbase(spark, sf_dir))
    resid = assigned.join(F.broadcast(cents), "cell_id").withColumn(
        "rv", F.expr(vec.sub_q("qv", "c_qv", th.SPARK))
    )
    slices = F.array(
        *[F.slice("rv", i * PQ_SUBDIM + 1, PQ_SUBDIM) for i in range(PQ_M)]
    )
    return resid.select(
        "vec_id", "cell_id", F.posexplode(slices).alias("subspace", "sv")
    ).select(
        "vec_id",
        "cell_id",
        F.col("subspace").cast("int").alias("subspace"),
        "sv",
    )


def _pq_resid_codes_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id, subspace, code): the residual-PQ corpus
    encode, session-cached once per (session, sf_dir) — the residual
    twin of ``_pq_codes_op`` (different codebook, so the two caches
    cannot merge)."""
    rsubs = _pq_resid_subs(spark, sf_dir)
    scored = rsubs.join(_pq_codebook(rsubs), "subspace").withColumn(
        "d", F.expr(_pq_sqdist("sv", "cv", th.SPARK))
    )
    return session_cached(
        spark,
        frame_memo_tag(sf_dir, "pq_resid_codes"),
        scored.groupBy("vec_id", "cell_id", "subspace")
        .agg(F.min(F.struct("d", "code")).alias("best"))
        .select(
            "vec_id", "cell_id", "subspace", F.col("best.code").alias("code")
        )
        .coalesce(input_scaled_partitions(sf_dir, "embeddings")),
    )


@query(
    "ann_ivfpq_residual_topk",
    # The RESIDUAL refinement of ann_ivfpq_topk — what FAISS's
    # IVFx,PQy actually encodes: each vector's PQ codes quantize
    # (vector − its cell centroid), which concentrates the code
    # distribution near zero and is why residual PQ beats raw-vector
    # PQ at equal code budget. Residuals are exact integer
    # differences of quantized components, so the whole derivation
    # stays hash-stable.
    oracle=_qbase_sql()
    + _ivf_assign_sql()
    + f""", resid AS (
      SELECT a.vec_id, a.cell_id,
             {vec.sub_q('a.qv', 'c.qv', th.DUCK)} AS rv
      FROM assigned a JOIN centroids c ON c.cell_id = a.cell_id
    ), rsubs AS (
      SELECT vec_id, cell_id, CAST(v.sub AS INT) AS subspace,
             list_slice(rv, v.sub * {PQ_SUBDIM} + 1,
                        v.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM resid, (VALUES (0), (1), (2), (3)) v(sub)
    ), codebook AS (
      SELECT subspace, vec_id AS code, sv AS cv
      FROM rsubs WHERE vec_id < {PQ_K}
    ), codes AS (
      SELECT vec_id, cell_id, subspace, code FROM (
        SELECT s.vec_id, s.cell_id, s.subspace, c.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.subspace
                 ORDER BY {_pq_sqdist('s.sv', 'c.cv', th.DUCK)}, c.code
               ) AS rn
        FROM rsubs s JOIN codebook c USING (subspace)
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT v.vec_id AS query_id, c.cell_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {vec.cosine_q('v.qv', 'c.qv', 'v.norm2', 'c.norm2', th.DUCK)} DESC, c.cell_id) AS rn
        FROM qbase v CROSS JOIN centroids c
        WHERE v.vec_id % {QUERY_STRIDE} = 0
      ) WHERE rn <= {IVF_NPROBE}
    ), qres AS (
      SELECT p.query_id, p.cell_id,
             {vec.sub_q('q.qv', 'c.qv', th.DUCK)} AS rv
      FROM probes p
      JOIN qbase q ON q.vec_id = p.query_id
      JOIN centroids c ON c.cell_id = p.cell_id
    ), qsubs AS (
      SELECT query_id, cell_id, CAST(v.sub AS INT) AS subspace,
             list_slice(rv, v.sub * {PQ_SUBDIM} + 1,
                        v.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM qres, (VALUES (0), (1), (2), (3)) v(sub)
    ), dtable AS (
      SELECT q.query_id, q.cell_id, c.subspace, c.code,
             {_pq_sqdist('q.sv', 'c.cv', th.DUCK)} AS qd
      FROM qsubs q JOIN codebook c USING (subspace)
    ), adc AS (
      SELECT d.query_id, x.vec_id AS neighbor_id,
             CAST(SUM(d.qd) AS BIGINT) AS adc_sqdist
      FROM codes x
      JOIN dtable d ON d.cell_id = x.cell_id
                   AND d.subspace = x.subspace AND d.code = x.code
      WHERE x.vec_id <> d.query_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, adc_sqdist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sqdist, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, adc_sqdist, rank FROM ranked
    WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
)
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ — the production encoding (FAISS `IVFx,PQy`
    quantizes vector − centroid, not the raw vector): residuals
    cluster near zero, so the same code budget spends its resolution
    where the data actually is; the query side builds one distance
    table PER PROBED CELL against its own residual. Raw-vector twin:
    ``ann_ivfpq_topk`` (same search shape, different quantizer —
    exactly the variant pair a serving team A/Bs with
    ``ann_recall_eval``).

    Spark shape: identical shuffle inventory to the raw twin — the
    residual subtraction is a broadcast centroid join + ``zip_with``
    (exact integer math, no extra pass), the per-(query, cell)
    distance tables are still O(|Q| x nprobe x {M} x {K}) broadcast
    rows, and the ADC join on (cell, subspace, code) fuses the probe
    semi-filter with the table lookup."""
    base = _qbase(spark, sf_dir)
    cents = _ivf_centroids(base)
    # residual corpus codes from the family-shared session cache (one
    # residual encode per session — r14); the residual CODEBOOK for
    # the query-side distance tables rebuilds from the same rsubs
    # derivation, whose vec_id < PQ_K filter prunes the cached
    # assignment scan to a handful of rows.
    codes = _pq_resid_codes_op(spark, sf_dir)
    codebook = _pq_codebook(_pq_resid_subs(spark, sf_dir))
    qres = (
        _ivf_probes(spark, sf_dir, IVF_NPROBE)
        .join(F.broadcast(cents), F.col("q_cell") == F.col("cell_id"))
        .withColumn("q_rv", F.expr(vec.sub_q("q_qv", "c_qv", th.SPARK)))
    )
    qslices = F.array(
        *[F.slice("q_rv", i * PQ_SUBDIM + 1, PQ_SUBDIM) for i in range(PQ_M)]
    )
    qsubs = qres.select(
        "query_id", "q_cell", F.posexplode(qslices).alias("q_subspace", "q_sv")
    ).select(
        "query_id",
        "q_cell",
        F.col("q_subspace").cast("int").alias("q_subspace"),
        "q_sv",
    )
    dtable = F.broadcast(
        qsubs.join(codebook, F.col("q_subspace") == F.col("subspace")).select(
            "query_id",
            "q_cell",
            F.col("subspace").alias("d_subspace"),
            F.col("code").alias("d_code"),
            F.expr(_pq_sqdist("q_sv", "cv", th.SPARK)).alias("qd"),
        )
    )
    adc = (
        codes.join(
            dtable,
            (F.col("cell_id") == F.col("q_cell"))
            & (F.col("subspace") == F.col("d_subspace"))
            & (F.col("code") == F.col("d_code"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qd")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").cast("bigint").alias("adc_sqdist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_sqdist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_sqdist", "rank")
        .orderBy("query_id", "rank")
    )


ann_ivfpq_residual_topk.__doc__ = (
    ann_ivfpq_residual_topk.__doc__.replace("{M}", str(PQ_M)).replace(
        "{K}", str(PQ_K)
    )
)


# --- contrastive triplet mining ---------------------------------------


@query(
    "embedding_triplet_mining",
    oracle=_qbase_sql()
    + f""", bucketed AS (
      SELECT *, {vec.lsh_bucket('qv', th.DUCK)} AS bucket FROM qbase
    ), pairs AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS cand_id,
             CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS is_pos,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)}
               AS cosine
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id, is_pos
                                   ORDER BY cosine DESC, cand_id) AS rk
      FROM pairs
    ), best AS (
      SELECT query_id, query_label,
             max(CASE WHEN is_pos = 1 THEN cand_id END) AS pos_id,
             max(CASE WHEN is_pos = 1 THEN cosine END) AS pos_cosine,
             max(CASE WHEN is_pos = 0 THEN cand_id END) AS neg_id,
             max(CASE WHEN is_pos = 0 THEN cosine END) AS neg_cosine
      FROM ranked WHERE rk = 1 GROUP BY query_id, query_label
    )
    SELECT query_id, query_label, pos_id, pos_cosine, neg_id, neg_cosine,
           pos_cosine - neg_cosine AS margin
    FROM best
    WHERE pos_id IS NOT NULL AND neg_id IS NOT NULL
    ORDER BY margin, query_id
    """,
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining — the training-data op behind every
    embedding fine-tune: per query vector, the BEST in-bucket positive
    (highest-cosine same-label candidate) and the HARDEST in-bucket
    negative (highest-cosine different-label candidate), with the
    triplet margin pos-neg. Queries sorted hardest-first (smallest or
    negative margin = the pairs a trainer should mine); queries whose
    bucket lacks either side drop out, exactly like an in-batch miner
    with too-small batches.

    Scale: one bucket-keyed candidate join (the ``ann_lsh_topk``
    shape — O(queries x bucket), corpus never self-joins all-pairs);
    positives and negatives rank inside the SAME pair table via a
    (query, side) window, then collapse to one row per query with
    conditional aggregates — no second candidate-generation subtree
    for the second side."""
    base = _qbase(spark, sf_dir).withColumn(
        "bucket", F.expr(vec.lsh_bucket("qv", th.SPARK))
    )
    queries = base.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = queries.join(
        base,
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("cand_id"),
        F.when(F.col("label") == F.col("query_label"), 1)
        .otherwise(0)
        .alias("is_pos"),
        F.expr(
            vec.cosine_q("q_qv", "qv", "q_norm2", "norm2", th.SPARK)
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id", "is_pos").orderBy(
        F.col("cosine").desc(), "cand_id"
    )
    best = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy("query_id", "query_label")
        .agg(
            F.max(F.when(F.col("is_pos") == 1, F.col("cand_id"))).alias(
                "pos_id"
            ),
            F.max(F.when(F.col("is_pos") == 1, F.col("cosine"))).alias(
                "pos_cosine"
            ),
            F.max(F.when(F.col("is_pos") == 0, F.col("cand_id"))).alias(
                "neg_id"
            ),
            F.max(F.when(F.col("is_pos") == 0, F.col("cosine"))).alias(
                "neg_cosine"
            ),
        )
    )
    return (
        best.where(
            F.col("pos_id").isNotNull() & F.col("neg_id").isNotNull()
        )
        .select(
            "query_id",
            "query_label",
            "pos_id",
            "pos_cosine",
            "neg_id",
            "neg_cosine",
            (F.col("pos_cosine") - F.col("neg_cosine")).alias("margin"),
        )
        .orderBy("margin", "query_id")
    )


# --- ranking-quality eval: precision@k + MRR ----------------------------

# lcm(1..TOP_K): scaling reciprocal ranks by it makes every per-query
# reciprocal an exact INTEGER, so the MRR numerator accumulates with
# no float addition at all — the sum order cannot matter.
RR_SCALE = 6
assert all(RR_SCALE % r == 0 for r in range(1, TOP_K + 1))

_RANKEVAL_TAIL = f"""
    , knn AS (
      SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
    ), rel AS (
      SELECT k.query_id, k.rank,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
      FROM knn k
      JOIN qbase ln ON k.neighbor_id = ln.vec_id
      JOIN qbase lq ON k.query_id = lq.vec_id
    ), perq AS (
      SELECT query_id,
             CAST(SUM(rel) AS BIGINT) AS n_rel,
             CAST(MIN(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
               AS first_rel
      FROM rel GROUP BY 1
    )
    SELECT CAST(lq.label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(SUM(n_rel) AS BIGINT) AS n_rel_total,
           CAST(SUM(CASE WHEN first_rel IS NULL THEN 0
                         ELSE {RR_SCALE} // first_rel END) AS BIGINT)
             AS rr_sum,
           CAST(SUM(n_rel) AS DOUBLE)
             / CAST(count(*) * {TOP_K} AS DOUBLE) AS precision_at_k,
           CAST(SUM(CASE WHEN first_rel IS NULL THEN 0
                         ELSE {RR_SCALE} // first_rel END) AS DOUBLE)
             / CAST({RR_SCALE} * count(*) AS DOUBLE) AS mrr
    FROM perq JOIN qbase lq ON perq.query_id = lq.vec_id
    GROUP BY 1 ORDER BY 1
    """


@query(
    "knn_ranking_eval",
    oracle=_qbase_sql()
    + f""", pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_q('q.qv', 'c.qv', 'q.norm2', 'c.norm2', th.DUCK)} AS cosine
      FROM qbase q JOIN qbase c ON c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    ){_RANKEVAL_TAIL}""",
)
def knn_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the exact cosine retriever per
    query label: precision@{K} (label-match rate inside the top-{K})
    and MRR, the mean reciprocal rank of the FIRST relevant hit — the
    two metrics a retrieval eval harness reports before NDCG. MRR is
    computed EXACTLY: every reciprocal rank is scaled by
    lcm(1..{K}) = {S} into an integer, summed as integers (no float
    accumulation, so no order sensitivity), and divided once at the
    output boundary; the exact integer numerators (n_rel_total,
    rr_sum) ride along for auditability.

    Scale: reuses knn_bruteforce's result shape (O(queries x k) rows
    from a broadcast-query corpus scan); relevance labels broadcast;
    the per-query and per-label rollups are exact-integer aggregates
    over that bounded frame."""
    knn = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ln = F.broadcast(
        lab.select(
            F.col("vec_id").alias("n_vid"), F.col("label").alias("n_label")
        )
    )
    lq = F.broadcast(
        lab.select(
            F.col("vec_id").alias("q_vid"), F.col("label").alias("q_label")
        )
    )
    rel = (
        knn.join(ln, F.col("neighbor_id") == F.col("n_vid"))
        .join(lq, F.col("query_id") == F.col("q_vid"))
        .select(
            "query_id",
            "rank",
            F.when(F.col("n_label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    perq = rel.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rank")))
        .cast("bigint")
        .alias("first_rel"),
    )
    rr = F.expr(
        f"CASE WHEN first_rel IS NULL THEN 0"
        f" ELSE {RR_SCALE} div first_rel END"
    )
    return (
        perq.join(lq, F.col("query_id") == F.col("q_vid"))
        .groupBy(F.col("q_label").cast("bigint").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum("n_rel").cast("bigint").alias("n_rel_total"),
            F.sum(rr).cast("bigint").alias("rr_sum"),
        )
        .select(
            "label",
            "n_queries",
            "n_rel_total",
            "rr_sum",
            F.expr(
                f"CAST(n_rel_total AS DOUBLE)"
                f" / CAST(n_queries * {TOP_K} AS DOUBLE)"
            ).alias("precision_at_k"),
            F.expr(
                f"CAST(rr_sum AS DOUBLE)"
                f" / CAST({RR_SCALE} * n_queries AS DOUBLE)"
            ).alias("mrr"),
        )
        .orderBy("label")
    )


knn_ranking_eval.__doc__ = (
    (knn_ranking_eval.__doc__ or "")
    .replace("{K}", str(TOP_K))
    .replace("{S}", str(RR_SCALE))
)


# --- embedding split-drift audit -------------------------------------------

DRIFT_SALT = 909  # half-split salt


def _drift_split(dialect: str) -> str:
    key = (
        "CAST(vec_id AS STRING)"
        if dialect == th.SPARK
        else "CAST(vec_id AS VARCHAR)"
    )
    return f"({th.salted_md5h(DRIFT_SALT, key, dialect)} % 2 = 0)"


_DRIFT_ORACLE = f"""
    WITH q AS (
      SELECT label, {_drift_split(th.DUCK)} AS in_a,
             {vec.quantize("embedding", th.DUCK)} AS qv
      FROM embeddings
    ), sums AS (
      SELECT label, pos,
             CAST(SUM(CASE WHEN in_a THEN v ELSE 0 END) AS BIGINT) AS sa,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE v END) AS BIGINT) AS sb,
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
      FROM (
        SELECT label, in_a, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
        FROM q
      ) GROUP BY 1, 2
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CASE WHEN SUM(CAST(sa AS HUGEINT) * sa) = 0
                  OR SUM(CAST(sb AS HUGEINT) * sb) = 0 THEN NULL
                ELSE CAST(SUM(CAST(sa AS HUGEINT) * sb) AS DOUBLE)
                  / (sqrt(CAST(SUM(CAST(sa AS HUGEINT) * sa) AS DOUBLE))
                     * sqrt(CAST(SUM(CAST(sb AS HUGEINT) * sb) AS DOUBLE)))
                END
             AS centroid_cosine
    FROM sums GROUP BY label ORDER BY label
    """


@query("embedding_split_drift", oracle=_DRIFT_ORACLE)
def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space stability audit: split each label's vectors
    into two deterministic hash halves and report the cosine between
    the half-centroids — a homogeneous, well-labeled cluster scores
    ~1.0, while label noise, multimodal clusters, or an upstream
    encoder change drag it down. The two-half self-consistency check
    run before trusting per-label centroids for routing or drift
    baselines. The 1/n mean factors cancel inside cosine, so the
    whole computation stays in exact integer SUM vectors (the
    ``centroid_separation`` contract) with one sqrt-division at the
    boundary.

    Scale: one pass over vectors, posexploded to (label, dim) partial
    sums — O(labels x dim) rows after the map-side combine; the
    cosine reduces those per label. No vector ever crosses the
    shuffle un-aggregated."""
    emb = fan_out(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.select(
        "label",
        F.expr(_drift_split(th.SPARK)).alias("in_a"),
        F.expr(vec.quantize("embedding", th.SPARK)).alias("qv"),
    )
    sums = (
        q.select(
            "label", "in_a", F.posexplode("qv").alias("pos0", "v")
        )
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.sum(F.when(F.col("in_a"), F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("sa"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(F.col("v")))
            .cast("bigint")
            .alias("sb"),
            F.sum(F.when(F.col("in_a"), 1).otherwise(0))
            .cast("bigint")
            .alias("na"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1))
            .cast("bigint")
            .alias("nb"),
        )
    )
    return (
        sums.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            # empty-half guard: a label whose vectors all hash to one
            # half has a zero norm on the other side — NULL, not a
            # divide-by-zero (ANSI Spark raises where DuckDB NULLs).
            # Norm/dot sums accumulate in DECIMAL(38,0)/HUGEINT (r13
            # overflow audit, the centroid_separation contract): the
            # half-sums sa/sb grow with vectors-per-label, so sa^2
            # crosses int64 near 3.8e4 vectors/label (~sf19).
            F.when(
                (F.sum(F.col("sa").cast("decimal(19,0)") * F.col("sa")) == 0)
                | (F.sum(F.col("sb").cast("decimal(19,0)") * F.col("sb")) == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.sum(F.col("sa").cast("decimal(19,0)") * F.col("sb")).cast(
                    "double"
                )
                / (
                    F.sqrt(
                        F.sum(
                            F.col("sa").cast("decimal(19,0)") * F.col("sa")
                        ).cast("double")
                    )
                    * F.sqrt(
                        F.sum(
                            F.col("sb").cast("decimal(19,0)") * F.col("sb")
                        ).cast("double")
                    )
                )
            )
            .alias("centroid_cosine"),
        )
        .orderBy("label")
    )


# Matryoshka-style dimension budgets: retrieval quality when only the
# first d of EMBED_DIM dims are stored/scanned (Kusupati et al. 2022)
MRL_DIMS = (16, 32, 48, 64)


def _mrl_slice(col: str, d: int, dialect: str) -> str:
    if dialect == th.SPARK:
        return f"slice({col}, 1, {d})"
    return f"{col}[1:{d}]"


@query(
    "ann_dim_truncation_recall",
    oracle=_qbase_sql()
    + f""", pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {", ".join(
                 vec.cosine_q(
                     _mrl_slice('q.qv', d, th.DUCK),
                     _mrl_slice('c.qv', d, th.DUCK),
                     vec.dot_q(_mrl_slice('q.qv', d, th.DUCK),
                               _mrl_slice('q.qv', d, th.DUCK), th.DUCK),
                     vec.dot_q(_mrl_slice('c.qv', d, th.DUCK),
                               _mrl_slice('c.qv', d, th.DUCK), th.DUCK),
                     th.DUCK,
                 ) + f" AS cos_{d}"
                 for d in MRL_DIMS
             )}
      FROM qbase q JOIN qbase c ON c.vec_id <> q.vec_id
      WHERE q.vec_id % {QUERY_STRIDE} = 0
    ), melted AS (
      {" UNION ALL ".join(
          f"SELECT CAST({d} AS INT) AS dim_budget, query_id, neighbor_id, "
          f"cos_{d} AS cosine FROM pairs"
          for d in MRL_DIMS
      )}
    ), ranked AS (
      SELECT dim_budget, query_id, neighbor_id
      FROM (SELECT dim_budget, query_id, neighbor_id,
                   row_number() OVER (PARTITION BY dim_budget, query_id
                                      ORDER BY cosine DESC, neighbor_id)
                       AS rank
            FROM melted)
      WHERE rank <= {TOP_K}
    ), full_k AS (
      SELECT query_id, neighbor_id FROM ranked
      WHERE dim_budget = {MRL_DIMS[-1]}
    ), hits AS (
      SELECT r.dim_budget, count(*) AS n_hits
      FROM ranked r JOIN full_k f
        ON f.query_id = r.query_id AND f.neighbor_id = r.neighbor_id
      GROUP BY r.dim_budget
    ), nq AS (
      SELECT count(DISTINCT query_id) AS n FROM full_k
    )
    SELECT h.dim_budget,
           CAST(nq.n AS BIGINT) AS n_queries,
           CAST(h.n_hits AS BIGINT) AS n_hits,
           h.n_hits / CAST(nq.n * {TOP_K} AS DOUBLE) AS recall_at_k
    FROM hits h CROSS JOIN nq
    ORDER BY h.dim_budget
    """,
)
def ann_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / dimension-truncation retrieval eval (Kusupati et
    al. 2022): top-{K} cosine recall when ranking uses only the first
    d of {DIM} embedding dimensions, against the full-dimension exact
    top-{K} — the storage/recall tradeoff curve a serving team reads
    before truncating a vector index (the dimension analog of the PQ
    and int8 evals already in the registry; the d = {DIM} row is the
    definitional recall-1.0 anchor).

    Scale: ONE corpus pass computes all dimension budgets — the
    per-pair cosines at every d are slices of the same integer
    arrays, melted to (dim_budget, pair) rows, so adding a budget
    adds per-row math, not a scan; the query side stays a 2%
    broadcast (the knn_bruteforce shape) and the only shuffle is the
    per-(budget, query) rank."""
    base = _qbase(spark, sf_dir)
    queries = F.broadcast(
        base.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("q_qv"),
        )
    )
    cos_cols = [
        F.expr(
            vec.cosine_q(
                _mrl_slice("q_qv", d, th.SPARK),
                _mrl_slice("qv", d, th.SPARK),
                vec.dot_q(
                    _mrl_slice("q_qv", d, th.SPARK),
                    _mrl_slice("q_qv", d, th.SPARK),
                    th.SPARK,
                ),
                vec.dot_q(
                    _mrl_slice("qv", d, th.SPARK),
                    _mrl_slice("qv", d, th.SPARK),
                    th.SPARK,
                ),
                th.SPARK,
            )
        ).alias(f"cos_{d}")
        for d in MRL_DIMS
    ]
    pairs = queries.join(base, F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), *cos_cols
    )
    melted = pairs.select(
        "query_id",
        "neighbor_id",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct(CAST({d} AS INT) AS dim_budget, "
                    f"cos_{d} AS cosine)"
                    for d in MRL_DIMS
                )
                + ")"
            )
        ).alias("m"),
    ).select("query_id", "neighbor_id", "m.dim_budget", "m.cosine")
    w = Window.partitionBy("dim_budget", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    ranked = (
        melted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("dim_budget", "query_id", "neighbor_id")
        # Materialize ONCE: three consumers (full-dim anchor, the hits
        # join, and the query-count scalar) otherwise re-execute the
        # whole O(n x q x dims) pair/melt/rank pipeline each (r13 plan
        # review). ranked is |budgets| x |queries| x K rows — tiny,
        # but DISK_ONLY anyway (r14 consistency audit, tables.py note).
    )
    # memoized per (session, sf_dir): the bare checkpoint re-ran the
    # whole O(n x q x dims) pipeline eagerly on every construction
    ranked = session_checkpointed(
        spark, frame_memo_tag(sf_dir, "mrl_ranked"), ranked
    )
    full_k = ranked.where(F.col("dim_budget") == MRL_DIMS[-1]).select(
        "query_id", "neighbor_id"
    )
    hits = ranked.join(F.broadcast(full_k), ["query_id", "neighbor_id"]).groupBy(
        "dim_budget"
    ).agg(F.count("*").cast("bigint").alias("n_hits"))
    # query count as a 1-row broadcast scalar attach (the waived
    # totals-crossJoin pattern) — a driver-side .count() would
    # eagerly re-execute the whole pair/melt/rank pipeline
    nq = full_k.agg(
        F.count_distinct("query_id").cast("bigint").alias("n_queries")
    )
    return (
        hits.crossJoin(F.broadcast(nq))
        .select(
            "dim_budget",
            "n_queries",
            "n_hits",
            (
                F.col("n_hits")
                / (F.col("n_queries") * TOP_K).cast("double")
            ).alias("recall_at_k"),
        )
        .orderBy("dim_budget")
    )


ann_dim_truncation_recall.__doc__ = ann_dim_truncation_recall.__doc__.replace(
    "{K}", str(TOP_K)
).replace("{DIM}", str(vec.EMBED_DIM))
