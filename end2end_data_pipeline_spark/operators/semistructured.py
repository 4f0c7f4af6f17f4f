"""Semi-structured (JSON-in-string) extraction over ``events.props``
(SURVEY.md §2.6 F8). The reference's JSON surface is driver-side
``json.dumps``/``json.loads`` of the report (``airflow/dags/spark.py:90``,
``airflow/dags/pipeline.py:227``); here JSON is a first-class column.

Two APIs, both JVM-side (no Python in the row path):

- ``from_json`` with an explicit schema — the bulk path: parse once,
  get a typed struct, let Catalyst prune fields;
- ``get_json_object`` — the ad-hoc path: single-field extraction
  without declaring a schema.

At 100 TB prefer ``from_json`` + a real schema: it parses each row
once for all fields, and the parsed struct columns participate in
codegen and pushdown, while N ``get_json_object`` calls re-parse the
string N times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table


@query(
    "props_k_extract",
    oracle="""
    SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
    FROM events WHERE event_id % 211 = 0
    ORDER BY event_id
    """,
)
def props_k_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed single-pass JSON parse: ``from_json(props, 'k INT')``."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 211 == 0)
    return (
        ev.select(
            "event_id",
            F.from_json("props", "k INT").getField("k").alias("k"),
        ).orderBy("event_id")
    )


@query(
    "props_k_distribution",
    oracle="""
    SELECT event_type,
           CAST(props->>'k' AS INTEGER) // 10 AS k_decade,
           count(*) AS n,
           min(CAST(props->>'k' AS INTEGER)) AS k_min,
           max(CAST(props->>'k' AS INTEGER)) AS k_max
    FROM events
    GROUP BY event_type, k_decade
    ORDER BY event_type, k_decade
    """,
)
def props_k_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc path extraction (``get_json_object``) feeding a grouped
    aggregate: distribution of the JSON ``k`` field per event type,
    bucketed by decade."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).alias("k_decade"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type", "k_decade")
    )


@query(
    "props_variant_profile",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(count(props) AS BIGINT) AS n_props,
           CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           min(CAST(props->>'k' AS INTEGER)) AS k_min,
           max(CAST(props->>'k' AS INTEGER)) AS k_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def props_variant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third semi-structured tier: Spark 4's VARIANT type.
    ``parse_json`` decodes each props string ONCE into the shredded
    binary variant encoding; ``variant_get`` then extracts typed paths
    without re-parsing — the open-table-format answer to repeated
    ``get_json_object`` string parsing (one decode amortizes across
    every path extraction, and the binary form is columnar-shreddable
    at rest). Rollup matches the plain-JSON oracle, proving the
    variant path is value-identical to string-JSON semantics, NULL
    propagation included.

    Scale: parse-once beats N string re-parses per row exactly where
    100 TB hurts; everything stays JVM-side whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", F.col("props").isNotNull().alias("has"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("has").cast("bigint")).cast("bigint").alias("n_props"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )
