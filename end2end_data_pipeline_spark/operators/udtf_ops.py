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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import register_views

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
    run rows."""
    register_views(spark, sf_dir, "documents")
    spark.udtf.register("token_runs", TokenRunsUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, tr.token, tr.start_pos, tr.run_len
        FROM documents d, LATERAL token_runs(d.text) tr
        ORDER BY d.doc_id, tr.start_pos
        """
    )
