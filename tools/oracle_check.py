"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark DataFrame and the oracle SQL
on the same parquet tables, then compare row count, column-name set,
and an order-insensitive value hash (columns sorted by name, rows
sorted by their string rendering). Mirrors the contract described in
``__spark_entry__.py`` so mismatches surface in pytest before the
driver ever runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        # driver fixtures are single files; generated scale fixtures
        # (tools/gen_scale_fixtures.py) are Spark-written directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


# The driver's value renderer is only trusted on these DuckDB output
# types. Anything else (HUGEINT from SUM(BIGINT), DECIMAL, TIMESTAMP,
# lists, ...) may stringify differently driver-side than here, turning
# a locally-green query into a driver hash-FAIL — so the local gate
# flags them as failures outright (round-1 lesson: 9 queries failed the
# driver on HUGEINT while this replica said green).
SAFE_ORACLE_TYPES = {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE"}


def unsafe_oracle_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[tuple[str, str]]:
    """(column, type) pairs in the oracle's output whose DuckDB type is
    outside the driver-proof set — empty means driver-safe."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in SAFE_ORACLE_TYPES
    ]


def _norm(v: Any) -> str:
    """Render a cell deterministically across engines."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr() is the shortest round-trip form — identical for
        # bit-identical doubles, and surfaces any FP divergence.
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, then rows by rendered value."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    rendered = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    return cols, rendered


def compare_query(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> dict[str, Any]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    unsafe = unsafe_oracle_types(con, sql)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    out: dict[str, Any] = {
        "rows_spark": len(sr),
        "rows_oracle": len(dr),
        "cols_spark": sc,
        "cols_oracle": dc,
        "rows_match": len(sr) == len(dr),
        "cols_match": sc == dc,
        "values_match": sr == dr,
        "unsafe_types": unsafe,
        "types_safe": not unsafe,
    }
    if not out["values_match"] and out["rows_match"] and out["cols_match"]:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
        out["first_diffs"] = diffs[:3]
    return out


def run_sweep(spark, sf_dir: str, names: list[str] | None = None,
              label: str = "strict") -> int:
    """The shared sweep harness behind ``tools/sf_sweep.py``,
    ``tools/partition_stress.py`` and ``tools/skew_stress.py`` (one
    comparator contract, one report shape — r10 code review: three
    near-verbatim copies had already diverged in what they checked).
    Runs every named (default: all oracle-paired) registered query
    through ``compare_query`` against the DuckDB views on ``sf_dir``
    and prints MISMATCH/ERROR lines plus a one-line summary. Returns
    the number of failures."""
    import time

    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    todo = names or [n for n in queries if n in oracles]
    con = duckdb_connection(sf_dir)
    t0 = time.time()
    bad: list[tuple[str, object]] = []
    try:
        for name in todo:
            try:
                r = compare_query(queries[name](spark, sf_dir), con, oracles[name])
                ok = (
                    r["rows_match"]
                    and r["cols_match"]
                    and r["values_match"]
                    and r["types_safe"]
                )
                if not ok:
                    keys = ("rows_match", "cols_match", "values_match", "types_safe")
                    bad.append((name, {k: r[k] for k in keys}))
                    print(f"MISMATCH {name}: {bad[-1][1]}")
            except Exception as exc:  # noqa: BLE001 — sweeping for a report
                bad.append((name, f"{type(exc).__name__}: {str(exc)[:200]}"))
                print(f"ERROR {name}: {bad[-1][1]}")
    finally:
        con.close()
    print(
        f"{len(todo) - len(bad)}/{len(todo)} {label}-match "
        f"at {sf_dir} in {int(time.time() - t0)}s"
    )
    return len(bad)
