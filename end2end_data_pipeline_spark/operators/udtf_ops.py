"""Python UDTF tier — the table-function face of the engine's Python
surface (the scalar/grouped faces are the Arrow ``mapInPandas`` decode
path in ``operators/multimodal.py`` and the stateful handlers in
``streaming/stateful.py``).

A UDTF is the right tool when one input row expands into a
variable-length, imperatively-derived row set that no built-in
generator expresses directly. It stays on the engine's fast path only
as the ARROW variant (``useArrow=True`` → ``ArrowEvalPythonUDTF`` in
the physical plan — batch-transferred, not row-pickled); the plan
audit would flag the pickled form (``BatchEvalPython``).

The demonstration op is run-length encoding of repeated tokens —
maximal runs, an intrinsically sequential per-document loop — over the
``documents`` table. The DuckDB oracle reproduces it with the classic
gaps-and-islands window (pos − row_number per (doc, token)), so the
imperative UDTF is value-checked against pure SQL.

Scale: the UDTF is embarrassingly parallel over documents (no state
across rows, no shuffle before it; one Arrow batch in, one out). The
LATERAL join is Spark's native UDTF application — no driver-side
anything.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import fan_out, load_table

MIN_RUN = 2


@udtf(returnType="token string, start_pos bigint, run_len bigint", useArrow=True)
class TokenRunsUDTF:
    """Maximal runs of the same whitespace token, 1-based start
    positions, runs shorter than MIN_RUN suppressed."""

    def eval(self, text):  # noqa: ANN001 — UDTF signature is untyped
        toks = text.split(" ") if text else []
        i, n = 0, len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= MIN_RUN:
                yield toks[i], i + 1, j - i
            i = j


_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split(text,' ')) AS token,
             UNNEST(range(1, len(string_split(text,' ')) + 1)) AS pos
      FROM documents),
    isl AS (
      SELECT doc_id, token, pos,
             pos - ROW_NUMBER() OVER (
               PARTITION BY doc_id, token ORDER BY pos) AS grp
      FROM toks)
    SELECT doc_id, token, CAST(min(pos) AS BIGINT) AS start_pos,
           CAST(count(*) AS BIGINT) AS run_len
    FROM isl GROUP BY doc_id, token, grp HAVING count(*) >= {MIN_RUN}
    ORDER BY doc_id, start_pos
"""


@query("udtf_token_runs", oracle=_ORACLE)
def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token run-length encoding via a LATERAL Python UDTF (Arrow
    batch transfer), cross-checked against the pure-SQL
    gaps-and-islands form. Repetition runs are the degenerate-document
    signal ``doc_repetition_profile`` aggregates; this exposes the raw
    run rows.

    The UDTF input rides ``fan_out`` (guide §4/§2.6): the boundary is
    the surface under test, but a single-row-group parquet scan fed
    the per-document Python loop on ONE core — the same degenerate
    small-file case every other CPU-heavy per-row pass guards
    against; on a real multi-file table the guard is a no-op."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    docs.createOrReplaceTempView("udtf_token_runs_docs")
    spark.udtf.register("token_runs", TokenRunsUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, tr.token, tr.start_pos, tr.run_len
        FROM udtf_token_runs_docs d, LATERAL token_runs(d.text) tr
        ORDER BY d.doc_id, tr.start_pos
        """
    )


# --- grouped-aggregate pandas UDAF ------------------------------------
#
# The last Arrow entry point the engine had not exercised: a GROUPED_AGG
# pandas_udf (ArrowAggregatePython in the Spark 4 physical plan —
# Arrow-batched, never row-pickled). The demonstration aggregate is the exact LOWER
# MEDIAN — a genuine custom aggregate (order statistics do not
# decompose into Spark's built-in commutative aggregates without a
# window detour), value-checked against the pure-SQL rank-pick oracle.

_UDAF_ORACLE = """
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), tagged AS (
      SELECT n_name AS nation, cents
      FROM spend
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ), ranked AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY nation) AS n
      FROM tagged
    )
    SELECT nation, CAST(n AS BIGINT) AS n_customers,
           CAST(cents AS BIGINT) AS median_spend_cents
    FROM ranked WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
    ORDER BY nation
    """


@query("nation_median_spend_udaf", oracle=_UDAF_ORACLE)
def nation_median_spend_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median customer spend per nation, computed by a
    GROUPED_AGG pandas UDAF (ArrowAggregatePython) — completing the engine's Arrow API
    matrix (mapInPandas decode, applyInPandas simulation,
    applyInPandasWithState streaks, Arrow UDTF runs, and now the
    custom aggregate). The aggregate itself is the honest UDAF case:
    an exact order statistic has no commutative-monoid decomposition,
    so Spark's built-ins can't fuse it and the alternatives are a
    window detour or this. Value-checked against the pure-SQL
    rank-pick oracle; the VALUE at the median rank is well-defined
    under duplicate spends, so Arrow batch order cannot matter.

    Scale: per-customer spend reduces map-side BEFORE the UDAF (the
    only fact shuffle); the grouped aggregate then sees one Arrow
    batch per nation of O(|customers|/|nations|) ints — the group
    payload, never raw orders. A per-group order statistic
    fundamentally needs the group's values in one place; the rollup
    ahead of it is what keeps that payload minimal."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from end2end_data_pipeline_spark.sources.tables import load_table

    @pandas_udf("long")
    def lower_median(v: pd.Series) -> int:
        s = v.sort_values().reset_index(drop=True)
        return int(s.iloc[(len(s) + 1) // 2 - 1])

    # Spark refuses to mix a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg(), so the count is a second Arrow UDAF
    @pandas_udf("long")
    def arrow_count(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = o.groupBy("o_custkey").agg(F.sum("cents").cast("bigint").alias("cents"))
    tagged = spend.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        tagged.groupBy(F.col("n_name").alias("nation"))
        .agg(
            arrow_count(F.col("cents")).alias("n_customers"),
            lower_median(F.col("cents")).alias("median_spend_cents"),
        )
        .orderBy("nation")
    )
