"""Bucketed (co-partitioned) table layout for repeated fact-fact joins
(SCALE.md "what we'd add first"; SURVEY.md §7 Phase 5).

The orders⋈lineitem family joins on the order key in several queries.
As plain parquet each join sort-merge-shuffles BOTH sides every time.
Writing the two tables bucketed by the join key (same bucket count)
makes every future equi-join on that key shuffle-free: Spark reads
matching buckets pairwise — at 100 TB this converts the dominant
repeated cost into a one-time write-side investment.

``tests/test_bucketing.py`` proves the claim mechanically: the join
plan over the bucketed tables contains no Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed table (bucket pruning + shuffle-free
    joins on ``bucket_col``). Bucketed writes require the table catalog
    — plain ``.parquet(path)`` cannot carry bucket metadata. Pass
    ``path`` to create an EXTERNAL bucketed table there instead of the
    session warehouse directory."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def cobucket_orders_lineitem(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    prefix: str = "bkt",
) -> tuple[str, str]:
    """Write orders and lineitem co-bucketed on the order key under
    ``out_dir``; returns the (orders, lineitem) table names."""
    from end2end_data_pipeline_spark.sources.tables import load_table

    o_name, l_name = f"{prefix}_orders", f"{prefix}_lineitem"
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        o_name,
        "o_orderkey",
        n_buckets,
        path=f"{out_dir}/{o_name}",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        l_name,
        "l_orderkey",
        n_buckets,
        sort_col="l_orderkey",
        path=f"{out_dir}/{l_name}",
    )
    return o_name, l_name
