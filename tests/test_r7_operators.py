"""Degenerate-corpus and reference-implementation checks for the
round-7 operators — the behaviors the driver fixtures never exercise
(exact-gap session boundaries, over-cap co-presence minutes) plus
independent Python re-computations of the trickier identities
(CUSUM's running-min form, the winsorize rank clamp)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.event_analytics import (
    CUSUM_TARGET_PCT,
)
from end2end_data_pipeline_spark.operators.graph import (
    COSESSION_MINUTE_CAP,
)
from end2end_data_pipeline_spark.operators.similarity import PQ_M
from end2end_data_pipeline_spark.registry import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def test_cusum_matches_recursive_reference(spark):
    """The running-sum-minus-running-min window form must equal the
    textbook recursion S_t = max(0, S_{t-1} + dev_t) computed in
    plain Python from an independently-derived hourly rollup."""
    con = duckdb.connect()
    hourly = con.execute(
        f"""
        SELECT date_trunc('hour', ts) AS h, count(*) AS n,
               SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                        < 25 THEN 1 ELSE 0 END) AS err
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    s, expected = 0, {}
    for h, n, err in hourly:
        s = max(0, s + (100 * err - CUSUM_TARGET_PCT * n))
        expected[h.strftime("%Y-%m-%d %H:00")] = s
    got = {
        r["hour"]: r["cusum_units"]
        for r in QUERIES["events_cusum_drift"](spark, SF).collect()
    }
    assert got == expected


def test_winsorized_matches_python_reference(spark):
    """Per-brand clamp recomputed with a plain-Python rank cut."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT p.p_brand, CAST(l.l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey
        """
    ).fetchall()
    import math
    from collections import defaultdict

    by_brand = defaultdict(list)
    for brand, q in rows:
        by_brand[brand].append(q)
    expected = {}
    for brand, qs in by_brand.items():
        qs.sort()
        n = len(qs)
        lo = qs[max(math.ceil(0.01 * n), 1) - 1]
        hi = qs[math.ceil(0.99 * n) - 1]
        expected[brand] = (
            n,
            lo,
            hi,
            sum(qs),
            sum(min(max(q, lo), hi) for q in qs),
        )
    got = {
        r["brand"]: (
            r["n_lines"],
            r["p01"],
            r["p99"],
            r["sum_qty"],
            r["sum_qty_winsorized"],
        )
        for r in QUERIES["lineitem_quantity_winsorized"](spark, SF).collect()
    }
    assert got == expected


def test_markov_grid_is_complete_and_stochastic(spark):
    """Grid completion: |types|^2 cells, every row of the matrix sums
    to exactly 1 (Laplace smoothing guarantees a proper distribution
    even for never-observed from-states)."""
    rows = QUERIES["sessions_markov_transitions"](spark, SF).collect()
    froms = {r["from_type"] for r in rows}
    tos = {r["to_type"] for r in rows}
    assert froms == tos and len(rows) == len(froms) ** 2
    from collections import defaultdict

    row_sum = defaultdict(float)
    for r in rows:
        assert r["smoothed_prob"] > 0  # Laplace: no zero-probability cell
        row_sum[r["from_type"]] += r["smoothed_prob"]
    for t, s in row_sum.items():
        assert s == pytest.approx(1.0, abs=1e-12), t


def _write_events(spark, path, rows):
    """Synthetic events table in the driver fixture shape — ONE file
    named events.parquet, exactly like the testdata layout (the
    streaming replay's file source globs on that file name)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")


def test_cosession_minute_cap_degenerate(spark, tmp_path):
    """A flash-crowd minute (cap+10 users) degrades to the capped
    prefix by user_id order; a small minute is untouched. Dropped
    users simply don't appear in the histogram."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 30)
    t1 = dt.datetime(2024, 1, 1, 13, 0, 30)
    rows = [
        (i, t0, i, "view", 1.0, "{}")
        for i in range(COSESSION_MINUTE_CAP + 10)
    ] + [(1000 + i, t1, 1000 + i, "view", 1.0, "{}") for i in range(3)]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["degree"]: r["n_users"]
        for r in QUERIES["user_cosession_degree"](spark, str(tmp_path)).collect()
    }
    assert got == {2: 3, COSESSION_MINUTE_CAP - 1: COSESSION_MINUTE_CAP}


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """session_window's merge boundary is INCLUSIVE: an event at
    EXACTLY last_ts + gap still merges; one microsecond past it opens
    a new session. The DuckDB oracle's d > gap convention reproduces
    both bit-for-bit. The driver fixtures never hit this boundary
    (verified: zero exact-gap pairs); this pins it — and it caught
    the original d >= gap oracle as wrong on first run."""
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 7, "view", 1.0, "{}"),  # == gap: merges
        (
            3,
            t0 + dt.timedelta(minutes=60, microseconds=1),  # gap + 1us: new
            7,
            "view",
            1.0,
            "{}",
        ),
    ]
    _write_events(spark, str(tmp_path), rows)
    name = "session_window_stream_replay"
    got = sorted(
        tuple(r) for r in QUERIES[name](spark, str(tmp_path)).collect()
    )
    assert [g[1] for g in got] == ["2024-01-01 10:00:00", "2024-01-01 11:00:00"]
    assert [g[3] for g in got] == [2, 1]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = sorted(tuple(r) for r in con.execute(ORACLE[name]).fetchall())
    assert [tuple(str(x) for x in g) for g in got] == [
        tuple(str(x) for x in o) for o in oracle
    ]


def test_pq_assignment_is_total(spark):
    """Every vector lands in exactly one cell of every subspace."""
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    rows = QUERIES["embedding_pq_codebook"](spark, SF).collect()
    from collections import defaultdict

    per_sub = defaultdict(int)
    for r in rows:
        per_sub[r["subspace"]] += r["n_vectors"]
    assert per_sub == {i: n_vecs for i in range(PQ_M)}


def test_seasonality_indices_weight_to_one(spark):
    """The order-share-weighted mean of the seasonality index is 1 by
    construction; verify with exact integer cross-multiplication."""
    rows = QUERIES["orders_seasonality_dow"](spark, SF).collect()
    n_total = sum(r["n_orders"] for r in rows)
    total_cents = sum(r["cents"] for r in rows)
    assert sorted(r["dow"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert r["seasonality_index"] == pytest.approx(
            (r["cents"] * n_total) / (r["n_orders"] * total_cents), abs=0
        )


def test_two_pass_percentiles_match_exact(spark):
    """The scale-path (approx-bracket -> exact-rank-inside-bracket)
    percentile must be BIT-IDENTICAL to the full-sort rank identity
    that the registered winsorize query uses."""
    from end2end_data_pipeline_spark.operators.relational_ext import (
        exact_percentiles_two_pass,
    )
    from end2end_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("q"),
        "l_orderkey",
        "l_linenumber",
    )
    p = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    pq = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    got = {
        (r["p_brand"], r["p"]): r["percentile_value"]
        for r in exact_percentiles_two_pass(
            pq, "p_brand", "q", (0.01, 0.5, 0.99), ("l_orderkey", "l_linenumber")
        ).collect()
    }
    # full-sort reference
    exact = {}
    winsor = QUERIES["lineitem_quantity_winsorized"](spark, SF).collect()
    for r in winsor:
        exact[(r["brand"], 0.01)] = r["p01"]
        exact[(r["brand"], 0.99)] = r["p99"]
    import math

    rows = pq.select("p_brand", "q").collect()
    from collections import defaultdict

    by_brand = defaultdict(list)
    for r in rows:
        by_brand[r["p_brand"]].append(r["q"])
    for brand, qs in by_brand.items():
        qs.sort()
        exact[(brand, 0.5)] = qs[max(math.ceil(0.5 * len(qs)), 1) - 1]
    assert got == exact


def test_two_pass_percentiles_property(spark):
    """Property check on adversarial value multisets (boundary
    duplicates, constant runs, tiny groups): the two-pass result must
    equal the plain sorted-rank cut for every requested percentile."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from end2end_data_pipeline_spark.operators.relational_ext import (
        exact_percentiles_two_pass,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
        ),
        st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
    )
    def check(values, p):
        df = spark.createDataFrame(
            [("g", v, i) for i, v in enumerate(values)], "k string, v long, i long"
        )
        got = {
            r["p"]: r["percentile_value"]
            for r in exact_percentiles_two_pass(df, "k", "v", (p,), ("i",)).collect()
        }
        qs = sorted(values)
        expected = qs[max(math.ceil(p * len(qs)), 1) - 1]
        assert got == {p: expected}, (values, p)

    check()
