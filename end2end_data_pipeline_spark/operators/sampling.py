"""Deterministic sampling & dataset-split operators over ``documents``.

A training-data pipeline needs reproducible sampling: the same corpus
must yield the same sample on every run, on every engine, regardless
of partitioning — so all sampling here is CONTENT-KEYED (portable md5
of the stable doc_id, ``functions/texthash.py``), never ``rand()`` or
partition-dependent ``TABLESAMPLE``. That makes each operator exactly
DuckDB-oracle-checkable and, at 100 TB, embarrassingly parallel: the
sample predicate is a per-row filter the scanner evaluates — no
shuffle, no coordination, prunes at the parquet scan.

Reference scope note: the reference engine has no sampling surface;
these extend SURVEY.md's LLM-pipeline layer (its event generator
seeds randomness the same deterministic way, `generator.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table

SAMPLE_PCT = 20  # stratified-sample keep rate, percent
SPLIT_TRAIN_PCT = 80  # train/val/test = 80/10/10
SPLIT_VAL_PCT = 10
PER_KEY_K = 5  # per-source uniform sample size


def _hash_pct(salt: str, key_col: str, dialect: str) -> str:
    """Portable per-row percentile in [0, 100): md5 of the salted key
    column, reduced mod 100. Content-keyed -> stable across runs,
    engines, and partitionings. ONE recipe for every hash-sampled
    surface (doc sampling, the HT audit) so the scheme cannot
    diverge."""
    cast = "STRING" if dialect == th.SPARK else "VARCHAR"
    key = f"concat('{salt}:', CAST({key_col} AS {cast}))"
    return f"({th.md5h(key, dialect)} % 100)"


def _doc_hash_pct(salt: str, dialect: str) -> str:
    return _hash_pct(salt, "doc_id", dialect)


def split_case_sql(dialect: str) -> str:
    """The canonical train/val/test CASE over the content-keyed hash —
    ONE builder for every split-aware surface (assignment rollup,
    leakage audits) so the split rule cannot diverge between them."""
    pct = _doc_hash_pct("split", dialect)
    return (
        f"CASE WHEN {pct} < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {pct} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


@query(
    "docs_stratified_sample",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN {_doc_hash_pct('sample', th.DUCK)} < {SAMPLE_PCT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN {_doc_hash_pct('sample', th.DUCK)} < {SAMPLE_PCT}
                         THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ~{SAMPLE_PCT}% sample audit per language stratum.
    The keep-predicate is a pure per-row hash filter — at scale it
    rides the parquet scan (no shuffle beyond the O(|langs|) rollup),
    and the sample is identical on every rerun."""
    docs = load_table(spark, sf_dir, "documents")
    keep = F.expr(_doc_hash_pct("sample", th.SPARK)) < SAMPLE_PCT
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("sampled_chars"),
        )
        .orderBy("lang")
    )


@query(
    "docs_split_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, {split_case_sql(th.DUCK)} AS split, n_chars
      FROM documents
    )
    SELECT lang, split,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM assigned GROUP BY lang, split ORDER BY lang, split
    """,
)
def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment ({SPLIT_TRAIN_PCT}/{SPLIT_VAL_PCT}/
    {100 - SPLIT_TRAIN_PCT - SPLIT_VAL_PCT}) by content-keyed hash —
    a document NEVER changes split when the corpus grows (the property
    random assignment loses), and the split needs no stored state."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(split_case_sql(th.SPARK))
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("lang", "split")
    )


@query(
    "docs_per_source_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_doc_hash_pct('persrc', th.DUCK)}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {PER_KEY_K}
    ORDER BY source, rk
    """,
)
def docs_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-key sample (the distributed stand-in for per-key
    reservoir sampling): rank each source's docs by content-keyed hash
    with a doc_id tie-break and keep the first {PER_KEY_K}. One
    shuffle on the key; skewed keys cost only their own partition. At
    100 TB swap row_number for a bounded per-partition top-k combine
    (min-heap aggregate) if a single key outgrows an executor."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(_doc_hash_pct("persrc", th.SPARK)), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= PER_KEY_K)
        .orderBy("source", "rk")
    )


PRIORITY_K = 50  # weighted-sample size


def _priority(dialect: str) -> str:
    """Priority-sampling key (Duffield, Lund & Thorup, JACM 2007):
    q_i = w_i / u_i with u_i uniform in (0, 1]; the k largest
    priorities form a weighted-without-replacement sample. u_i is the
    portable 60-bit content hash scaled into (0, 1] — deterministic
    across engines and partitionings, and each q_i is two
    IEEE-correctly-rounded divisions, so both engines produce
    bit-identical doubles. The 2^60 divisor must be an explicit DOUBLE
    cast: a ``...976.0`` literal parses as DECIMAL in DuckDB and its
    decimal division rounds differently in the last ulp."""
    if dialect == th.SPARK:
        key = "concat('prio:', CAST(doc_id AS STRING))"
    else:
        key = "concat('prio:', CAST(doc_id AS VARCHAR))"
    two60 = "CAST(1152921504606846976 AS DOUBLE)"
    u = f"(({th.md5h(key, dialect)} + 1) / {two60})"
    return f"(CAST(n_chars AS DOUBLE) / {u})"


@query(
    "docs_priority_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             {_priority(th.DUCK)} AS priority,
             row_number() OVER (
               ORDER BY {_priority(th.DUCK)} DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           priority, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {PRIORITY_K}
    ORDER BY rk
    """,
)
def docs_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted sample without replacement via priority sampling:
    long documents are proportionally more likely to be kept, yet the
    sample is fully deterministic (content-keyed uniforms, no rand()).
    The global top-k executes as TakeOrderedAndProject — each partition
    keeps only its k best candidates, so no full sort and no shuffle of
    the corpus; at 100 TB the data moved is O(k x partitions)."""
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr(_priority(th.SPARK)).alias("priority"),
    ).orderBy(F.col("priority").desc(), "doc_id")
    return (
        ranked.limit(PRIORITY_K)
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("priority").desc(), "doc_id"))
            .cast("int"),
        )
        .orderBy("rk")
    )


# --- Horvitz-Thompson estimation audit -------------------------------------

HT_PCT = 20  # inclusion probability, percent
HT_SALT = "ht"


def _order_hash_pct(salt: str, dialect: str) -> str:
    return _hash_pct(salt, "o_orderkey", dialect)


_HT_ORACLE = f"""
    WITH base AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             ({_order_hash_pct(HT_SALT, th.DUCK)} < {HT_PCT}) AS sampled
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_population,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(cents) AS BIGINT) AS true_cents,
           CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100
                // {HT_PCT} AS BIGINT) AS ht_estimate_cents,
           CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100
                // {HT_PCT} - SUM(cents) AS BIGINT) AS error_cents,
           CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100
                // {HT_PCT} - SUM(cents) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE) AS rel_error
    FROM base
    """


@query("orders_ht_estimate_audit", oracle=_HT_ORACLE)
def orders_ht_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation audit: estimate total revenue from
    the deterministic {PCT}% hash sample by inverse-probability
    weighting (each sampled order counts 100/{PCT} times), and report
    the exact error against the true total — the design-based
    estimator every sampling pipeline owes its users, and the audit
    that tells you whether the hash sample is trustworthy for sums,
    not just row counts. The estimate is exact integer arithmetic
    (scale-then-floor-divide, both engines identical); the one double
    is the relative error.

    Scale: a single fact pass into a 1-row aggregate — the sampled
    and population sums ride the same map-side combine, so auditing
    the estimator costs one scan, not a sample materialization plus a
    second pass."""
    orders = load_table(spark, sf_dir, "orders")
    sampled = F.expr(f"{_order_hash_pct(HT_SALT, th.SPARK)} < {HT_PCT}")
    base = orders.select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        sampled.alias("sampled"),
    )
    s_cents = F.sum(F.when(F.col("sampled"), F.col("cents")).otherwise(0))
    return base.agg(
        F.count("*").cast("bigint").alias("n_population"),
        F.sum(F.col("sampled").cast("int")).cast("bigint").alias("n_sampled"),
        F.sum("cents").cast("bigint").alias("true_cents"),
        F.expr(
            f"CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100"
            f" div {HT_PCT} AS BIGINT)"
        ).alias("ht_estimate_cents"),
        F.expr(
            f"CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100"
            f" div {HT_PCT} - SUM(cents) AS BIGINT)"
        ).alias("error_cents"),
        F.expr(
            f"CAST(SUM(CASE WHEN sampled THEN cents ELSE 0 END) * 100"
            f" div {HT_PCT} - SUM(cents) AS DOUBLE)"
            f" / CAST(SUM(cents) AS DOUBLE)"
        ).alias("rel_error"),
    )


orders_ht_estimate_audit.__doc__ = (
    orders_ht_estimate_audit.__doc__ or ""
).replace("{PCT}", str(HT_PCT))
