"""Build a TINY fixture (default 5 rows per table) for the low-end
strict sweep — the opposite pole of ``tools/gen_scale_fixtures.py``.

The sf0.3/sf1.0 sweeps catch what only shows up when aggregates grow
(the r12 int64 OLS overflow); a tiny fixture catches what only shows
up when groups shrink to nothing: sort-order ties that make a query's
output underdetermined (a reproducibility bug at any scale, most
likely to DIVERGE between engines when rows are few), modulo-based
splits that select zero rows, windows over a single row, variance
denominators of n-1 = 0, and empty join sides. The empty-input sweep
(tests/test_empty_inputs.py) proves no query CRASHES at zero rows;
this fixture lets ``tools/sf_sweep.py`` prove both engines agree on
the VALUES at near-zero rows.

Rows are taken by each parquet file's natural order (``LIMIT k`` over
a single-file read is deterministic in DuckDB), so the fixture is
reproducible without any RNG. Referential integrity is NOT preserved
— both engines see the same orphaned keys, so parity still must hold;
orphan-heavy shapes (empty join results) are exactly the point.

A second variant (``--nulls``) builds the NULL-FLOOD fixture: the same
rows but every NULLABLE-by-contract column forced NULL. Optional
attributes going NULL is routine at 100 TB (a schema migration, a
source that never filled the field), and NULL propagation is where SQL
dialects genuinely diverge (e.g. concat-with-NULL yields NULL in Spark
but skips the NULL in DuckDB), so the oracle pair must be proven to
agree on it, not assumed.

The null contract (what can legitimately arrive NULL):
- TPC-H tables (region..lineitem): NOTHING — the TPC-H spec declares
  every column NOT NULL, and relational queries may rely on it.
- events: ``value`` and ``props`` only — the reference's own generator
  emits conditional nulls for exactly these (producer payloads with
  absent fields); ``event_id``/``ts``/``user_id``/``event_type`` are
  the identity plus the warehouse partition/order keys (the reference's
  MergeTree DDL partitions by minute(ts) and orders by type — a NULL
  there is a rejected insert, not a row).
- documents: everything but ``doc_id`` (text/lang/source/n_chars are
  scraped attributes; any can be missing).
- embeddings: everything but ``vec_id`` (a vector not yet computed, a
  label not yet assigned).

Usage:
    python tools/gen_tiny_fixture.py            # 5 rows -> tiny_fixtures/sf5r
    python tools/gen_tiny_fixture.py 1          # 1 row  -> tiny_fixtures/sf1r
    python tools/gen_tiny_fixture.py 5 --nulls  # -> tiny_fixtures/sf5rN
Then:
    python tools/sf_sweep.py tiny_fixtures/sf5r
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE_SF = "/root/testdata/sf0.001"

# Columns the --nulls variant forces NULL: exactly the
# nullable-by-contract set (see module docstring). Both engines see
# the same NULLs, so strict parity must hold on every query that
# touches these columns.
NULLABLE = {
    "events": ("value", "props"),
    "documents": ("text", "lang", "source", "n_chars"),
    "embeddings": ("embedding", "label"),
}


def build(rows: int, nulls: bool = False) -> str:
    import duckdb

    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

    suffix = f"sf{rows}r" + ("N" if nulls else "")
    out_dir = os.path.join(REPO, "tiny_fixtures", suffix)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            src = os.path.join(SOURCE_SF, f"{t}.parquet")
            dst = os.path.join(out_dir, f"{t}.parquet")
            if nulls:
                flood = set(NULLABLE.get(t, ()))
                cols = con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}')"
                ).fetchall()
                select = ", ".join(
                    f'CAST(NULL AS {typ}) AS "{name}"' if name in flood else name
                    for name, typ, *_ in cols
                )
            else:
                select = "*"
            con.execute(
                f"COPY (SELECT {select} FROM read_parquet('{src}') LIMIT {rows}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()[0]
            print(f"{t}: {n} rows -> {dst}")
    finally:
        con.close()
    return out_dir


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--nulls"]
    nulls = "--nulls" in sys.argv[1:]
    rows = int(args[0]) if args else 5
    if rows < 1:
        print("rows must be >= 1 (the zero-row case is the empty-input sweep)")
        return 2
    build(rows, nulls=nulls)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
