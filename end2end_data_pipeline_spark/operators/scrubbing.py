"""PII / URL scrubbing and text normalization over ``documents`` —
the redaction pass an LLM-training pipeline runs before tokenization
(strip emails, URLs, phone numbers; collapse whitespace; casefold).

The driver fixture's synthetic corpus contains no PII by design, so
each query first AUGMENTS the text with deterministic PII-shaped
tokens derived from ``doc_id`` (email on ``doc_id % 7 = 0``, URL on
``% 11``, phone on ``% 13``, whitespace/case mess on ``% 5``), then
scrubs the augmented text. The injection is pure column arithmetic,
replicated verbatim in the DuckDB oracle, so the scrub regexes are
exercised against known-nonzero hit counts and the comparison stays
exact.

Scale shape: embarrassingly parallel per-row ``regexp_replace`` /
``regexp_count`` (JVM-side, whole-stage codegen) with one O(#sources)
rollup — at 100 TB this is a pure scan, no skew surface, no Python.

Regex portability: patterns avoid backslash classes (``[.]`` not
``\\.``, ``[^ ]`` not ``\\S``) so the same pattern text is valid Java
regex (Spark) and RE2 (DuckDB); DuckDB ``regexp_replace`` gets the
``'g'`` flag to match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table

SPARK = "spark"
DUCK = "duck"

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
URL_RE = "https?://[^ ]+"
PHONE_RE = "[+]1-555-[0-9]{4}"


def _aug(dialect: str) -> str:
    """Deterministic PII injection, identical in both engines."""
    s = "CAST(doc_id AS STRING)" if dialect == SPARK else "CAST(doc_id AS VARCHAR)"
    s4 = (
        "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        if dialect == SPARK
        else "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    # coalesce(text, '') — EXPLICIT null-as-empty on both engines: a
    # NULL text doc still receives its injected PII and scrubs like an
    # empty doc. Without it the two concats diverge (DuckDB's variadic
    # concat SKIPS NULL arguments, Spark's returns NULL — the r13
    # null-flood sweep caught exactly that split).
    return (
        "concat(coalesce(text, ''),"
        f" CASE WHEN doc_id % 7 = 0 THEN concat(' contact user', {s},"
        " '@example.com') ELSE '' END,"
        f" CASE WHEN doc_id % 11 = 0 THEN concat(' see"
        f" https://example.org/page/', {s}, '?ref=corpus') ELSE '' END,"
        f" CASE WHEN doc_id % 13 = 0 THEN concat(' call +1-555-', {s4})"
        " ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN '   Trailing   MESS   ' ELSE '' END)"
    )


def _count(expr: str, pattern: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"CAST(regexp_count({expr}, '{pattern}') AS BIGINT)"
    return f"CAST(len(regexp_extract_all({expr}, '{pattern}')) AS BIGINT)"


def _replace(expr: str, pattern: str, token: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"regexp_replace({expr}, '{pattern}', '{token}')"
    return f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"


def _scrub_exprs(dialect: str) -> dict[str, str]:
    """Per-document scrub columns shared by both dialects."""
    aug = _aug(dialect)
    scrubbed = _replace(
        _replace(
            _replace(aug, EMAIL_RE, "<EMAIL>", dialect),
            URL_RE,
            "<URL>",
            dialect,
        ),
        PHONE_RE,
        "<PHONE>",
        dialect,
    )
    return {
        "email_hits": _count(aug, EMAIL_RE, dialect),
        "url_hits": _count(aug, URL_RE, dialect),
        "phone_hits": _count(aug, PHONE_RE, dialect),
        "chars_delta": f"CAST(length({aug}) - length({scrubbed}) AS BIGINT)",
        "scrub_md5": f"md5({scrubbed})",
    }


def _scrub_doc_sql(dialect: str) -> str:
    cols = ",\n           ".join(
        f"{v} AS {k}" for k, v in _scrub_exprs(dialect).items()
    )
    return f"SELECT doc_id, source,\n           {cols}\n    FROM documents"


@query("docs_scrubbed", oracle=_scrub_doc_sql(DUCK) + "\n    ORDER BY doc_id")
def docs_scrubbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document redaction: emails/URLs/phones replaced by typed
    placeholder tokens; outputs hit counts, the char delta, and the md5
    of the scrubbed text (full-content proof without shipping the
    text through the comparator)."""
    docs = load_table(spark, sf_dir, "documents")
    e = _scrub_exprs(SPARK)
    return docs.select(
        "doc_id", "source", *[F.expr(v).alias(k) for k, v in e.items()]
    ).orderBy("doc_id")


@query(
    "docs_scrubbed_stats",
    oracle=f"""
    WITH scrub AS ({_scrub_doc_sql(DUCK)})
    SELECT source,
           count(*) AS docs,
           CAST(SUM(email_hits) AS BIGINT) AS email_hits,
           CAST(SUM(url_hits) AS BIGINT) AS url_hits,
           CAST(SUM(phone_hits) AS BIGINT) AS phone_hits,
           CAST(SUM(CASE WHEN email_hits + url_hits + phone_hits > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_touched,
           CAST(SUM(chars_delta) AS BIGINT) AS chars_delta
    FROM scrub GROUP BY source ORDER BY source
    """,
)
def docs_scrubbed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction audit rollup per source: how many documents carried
    each PII class and how many characters the scrub removed — the
    report a data-governance review asks for."""
    docs = load_table(spark, sf_dir, "documents")
    e = _scrub_exprs(SPARK)
    per_doc = docs.select(
        "source", *[F.expr(v).alias(k) for k, v in e.items()]
    )
    touched = (F.col("email_hits") + F.col("url_hits") + F.col("phone_hits")) > 0
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("email_hits").cast("bigint").alias("email_hits"),
            F.sum("url_hits").cast("bigint").alias("url_hits"),
            F.sum("phone_hits").cast("bigint").alias("phone_hits"),
            F.sum(touched.cast("int")).cast("bigint").alias("docs_touched"),
            F.sum("chars_delta").cast("bigint").alias("chars_delta"),
        )
        .orderBy("source")
    )


def _norm_exprs(dialect: str) -> dict[str, str]:
    aug = _aug(dialect)
    norm = f"trim(lower({_replace(aug, ' +', ' ', dialect)}))"
    return {
        "chars_before": f"CAST(length({aug}) AS BIGINT)",
        "chars_after": f"CAST(length({norm}) AS BIGINT)",
        "changed": (
            f"CAST(CASE WHEN {norm} <> {aug} THEN 1 ELSE 0 END AS INT)"
        ),
    }


@query(
    "docs_normalized_profile",
    oracle=f"""
    WITH n AS (SELECT source,
                      {_norm_exprs(DUCK)['chars_before']} AS chars_before,
                      {_norm_exprs(DUCK)['chars_after']} AS chars_after,
                      {_norm_exprs(DUCK)['changed']} AS changed
               FROM documents)
    SELECT source,
           count(*) AS docs,
           CAST(SUM(changed) AS BIGINT) AS docs_changed,
           CAST(SUM(chars_before) AS BIGINT) AS chars_before,
           CAST(SUM(chars_after) AS BIGINT) AS chars_after
    FROM n GROUP BY source ORDER BY source
    """,
)
def docs_normalized_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-collapse + casefold + trim normalization audit per
    source: documents changed and characters before/after — the
    normalization step that precedes tokenization and dedup (dedup on
    un-normalized text under-merges)."""
    docs = load_table(spark, sf_dir, "documents")
    e = _norm_exprs(SPARK)
    per_doc = docs.select(
        "source", *[F.expr(v).alias(k) for k, v in e.items()]
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("changed").cast("bigint").alias("docs_changed"),
            F.sum("chars_before").cast("bigint").alias("chars_before"),
            F.sum("chars_after").cast("bigint").alias("chars_after"),
        )
        .orderBy("source")
    )


# Right-to-be-forgotten cascade: share of each table a deletion
# request set would remove. The request set is a deterministic
# content-keyed sample of customers (the shared _hash_pct recipe from
# operators/sampling.py — ONE hashing scheme for every sampled
# surface), so both engines and every partitioning elect the same
# keys. 2% models a realistic erasure-request backlog.
from end2end_data_pipeline_spark.operators.sampling import _hash_pct

FORGET_PCT = 2
_FORGET_DUCK = _hash_pct("forget", "c_custkey", DUCK)


@query(
    "gdpr_delete_cascade_audit",
    oracle=f"""
    WITH keys AS (
      SELECT c_custkey FROM customer WHERE {_FORGET_DUCK} < {FORGET_PCT}
    ), del_o AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM keys)
    ), per_table AS (
      SELECT 'customer' AS table_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_forget
      FROM customer
      UNION ALL
      SELECT 'orders', CAST(count(*) AS BIGINT),
             CAST((SELECT count(*) FROM del_o) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(count(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_o)
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
    )
    SELECT table_name, n_rows, n_forget,
           CAST(n_forget AS DOUBLE) / CAST(n_rows AS DOUBLE) AS forget_share
    FROM per_table ORDER BY table_name
    """,
)
def gdpr_delete_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR / right-to-be-forgotten impact audit: given the customer
    erasure keyset, count the rows each table loses through the
    foreign-key cascade (customer -> orders -> lineitem) plus the
    share of the table affected — the planning query a pipeline runs
    BEFORE executing deletes, to size rewrite cost and pick rewrite
    granularity (events is excluded: its user_id is a separate
    identity domain in this fixture).

    Scale: the keyset predicate is pure column arithmetic (md5 mod
    100) — no keyset materialization for the orders pass at all; the
    lineitem pass joins on the deleted ORDER keys (left join against
    the unique o_orderkey side, so no row duplication), the standard
    shuffle-on-fk shape. Each table is scanned exactly once; output
    is O(3) rows."""
    forget = F.expr(_hash_pct("forget", "c_custkey", SPARK)) < FORGET_PCT

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    c_row = cust.agg(
        F.lit("customer").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(forget, 1).otherwise(0)).cast("bigint").alias("n_forget"),
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    keys = cust.where(forget)
    o_flag = orders.join(
        keys.withColumn("f", F.lit(1)),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    o_row = o_flag.agg(
        F.lit("orders").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.coalesce(F.col("f"), F.lit(0))).cast("bigint").alias("n_forget"),
    )

    del_orders = (
        orders.join(
            keys, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .select("o_orderkey")
        .withColumn("f", F.lit(1))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    l_row = li.join(
        del_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).agg(
        F.lit("lineitem").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.coalesce(F.col("f"), F.lit(0))).cast("bigint").alias("n_forget"),
    )

    return (
        c_row.unionByName(o_row)
        .unionByName(l_row)
        .select(
            "table_name",
            "n_rows",
            "n_forget",
            (F.col("n_forget").cast("double") / F.col("n_rows").cast("double"))
            .alias("forget_share"),
        )
        .orderBy("table_name")
    )
