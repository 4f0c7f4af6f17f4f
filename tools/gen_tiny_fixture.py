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

Usage:
    python tools/gen_tiny_fixture.py            # 5 rows -> tiny_fixtures/sf5r
    python tools/gen_tiny_fixture.py 1          # 1 row  -> tiny_fixtures/sf1r
Then:
    python tools/sf_sweep.py tiny_fixtures/sf5r
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE_SF = "/root/testdata/sf0.001"


def build(rows: int) -> str:
    import duckdb

    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

    out_dir = os.path.join(REPO, "tiny_fixtures", f"sf{rows}r")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            src = os.path.join(SOURCE_SF, f"{t}.parquet")
            dst = os.path.join(out_dir, f"{t}.parquet")
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT {rows}) "
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
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if rows < 1:
        print("rows must be >= 1 (the zero-row case is the empty-input sweep)")
        return 2
    build(rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
