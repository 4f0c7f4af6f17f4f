"""Property-style cross-engine check of the overflow-hardened
aggregate shapes (VERDICT r12 #4): the r12 sf0.3 sweep caught an int64
overflow in the OLS slope numerator that sf0.01 testing structurally
cannot see, and the r13 audit fixed seven more sites of the same class
(Pearson/variance numerators computed cast-first in DOUBLE;
squared/product SUMs accumulated in DECIMAL(38,0) where the exact
value must survive). This test drives those exact expression shapes —
imported from the operators where they are factored (``_corr_r``,
``_corr_sums``), restated verbatim where inline — through BOTH engines
on synthetic component values far beyond anything a fixture reaches
(seeded-random sweeps up to ~int64-max plus the named corner cases),
asserting bit-identical doubles and exact decimal sums.

The adversarial magnitudes matter: every case here would overflow the
NAIVE int64 form (``n*sxy - sx*sy`` as BIGINT products, ``SUM(x*x)``
as a BIGINT accumulator), which a companion case proves by asserting
Spark's ANSI mode actually raises on it — so a regression back to the
naive shape fails this suite loudly rather than corrupting at sf300+.
"""

from __future__ import annotations

import numpy as np
import pytest

import duckdb

from end2end_data_pipeline_spark.operators.quality import (
    CORR_COLS,
    CORR_PAIRS,
    _corr_r,
    _corr_sums,
)

I64 = 9_223_372_036_854_775_807
SEED = 20260816
N_RANDOM = 300


def _component_rows():
    """Seeded-random Pearson component rows that are REALIZABLE (built
    as exact Python-int sums over an actual sample, optionally
    replicated m times — so Cauchy-Schwarz holds and n*ss - s*s >= 0,
    the domain real data can produce; unconstrained random sums can
    violate it, where DuckDB raises on sqrt(negative) while Spark
    yields NaN). Each component stays inside int64 — the audited
    invariant — while the replication factor pushes the CROSS PRODUCTS
    (n*ss, s*s) up to ~9 decimal orders past the int64 cliff."""
    rng = np.random.RandomState(SEED)
    rows = []
    while len(rows) < N_RANDOM:
        k = rng.randint(2, 30)
        mag = 10.0 ** rng.uniform(1, 8.5)
        xs = [int(rng.uniform(-mag, mag)) for _ in range(k)]
        ys = [int(rng.uniform(-mag, mag)) for _ in range(k)]
        ss_x1 = sum(v * v for v in xs)
        ss_y1 = sum(v * v for v in ys)
        if ss_x1 == 0 or ss_y1 == 0:
            continue
        # replicate the sample m times: all sums scale by m exactly
        # and stay realizable; cap m so every COMPONENT fits int64
        m_cap = I64 // max(ss_x1, ss_y1, 1)
        m = max(1, int(10.0 ** rng.uniform(0, np.log10(max(m_cap, 2)))))
        rows.append(
            (
                k * m,
                m * sum(xs),
                m * sum(ys),
                m * ss_x1,
                m * ss_y1,
                m * sum(a * b for a, b in zip(xs, ys)),
            )
        )
    # max replication of the exact sample x=(2,3), y=(1,-2): sums
    # (5,-1,13,5,-4) scale by m = I64//13 so ss_x rides the int64
    # ceiling itself while n*ss_x ~ 1.3e37 and s_x*s_y ~ -4e36
    m = I64 // 13
    corners = [
        (2 * m, 5 * m, -1 * m, 13 * m, 5 * m, -4 * m),
        # zero-variance arm: constant x -> den = 0 -> NULL on both
        (3, 15, 6, 75, 14, 30),
    ]
    return rows + corners


def test_corr_r_shape_bit_identical_at_adversarial_magnitudes(spark):
    """``_corr_r`` (the shared Pearson final expression — used by
    lineitem_corr_matrix, event_minute_crosscorr_lags, and restated by
    hourly_count_autocorr_24h / part_copurchase_assortativity /
    embedding_dim_variance_profile / orders_daily_ols_trend) must be
    loss-identical across engines on component sums whose naive int64
    products overflow by up to 9 decimal orders."""
    rows = _component_rows()
    schema = (
        "n bigint, s_x bigint, s_y bigint, ss_x bigint, ss_y bigint,"
        " sp_x_y bigint"
    )
    expr = _corr_r("x", "y")
    got = [
        r["r"]
        for r in spark.createDataFrame(rows, schema)
        .selectExpr(f"{expr} AS r")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s (n BIGINT, s_x BIGINT, s_y BIGINT, ss_x BIGINT,"
        " ss_y BIGINT, sp_x_y BIGINT)"
    )
    con.executemany("INSERT INTO s VALUES (?,?,?,?,?,?)", rows)
    want = [r[0] for r in con.execute(f"SELECT {expr} AS r FROM s").fetchall()]
    assert len(got) == len(rows)
    for i, (g, w) in enumerate(zip(got, want)):
        if w is None:
            assert g is None, (i, rows[i], g)
        else:
            # bit-identical, not approx: both engines run the same
            # cast-first double tree, so any ULP drift means the
            # shapes diverged
            assert g == w, (i, rows[i], g, w)
    # the zero-variance corner actually exercised the NULL arm
    assert want[-1] is None


def test_corr_sums_decimal_accumulation_exact_past_int64(spark):
    """``_corr_sums`` accumulates squared/product sums in
    DECIMAL(38,0) on both engines; with per-row products at ~int64-max
    the SUM's exact value crosses int64 after 2 rows. Both engines
    must agree EXACTLY (string compare of the decimal), not just in
    double."""
    # price 3.04e9 -> price^2 ~ 9.2e18 ~ int64-max per row; 8 rows
    # push the accumulated sum ~8x past the cliff
    big_price = 3_037_000_499.0  # floor(sqrt(int64 max))
    rows = [
        (27.0, big_price, 0.05, 0.08),
        (13.0, big_price, 0.10, 0.02),
    ] * 4
    schema = (
        "l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double"
    )
    sums_sql = ", ".join(_corr_sums())
    got = (
        spark.createDataFrame(rows, schema)
        .selectExpr(*_corr_sums())
        .collect()[0]
        .asDict()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?,?,?,?)", rows)
    cur = con.execute(f"SELECT {sums_sql} FROM lineitem")
    want = dict(zip([d[0] for d in cur.description], cur.fetchone()))
    assert set(got) == set(want)
    for k in got:
        assert str(got[k]) == str(want[k]), (k, got[k], want[k])
    # and the sum really does exceed int64 (the test would be vacuous
    # otherwise)
    assert int(got["ss_price"]) > I64


def test_naive_int64_shape_actually_overflows(spark):
    """Regression tripwire: the NAIVE forms this audit replaced must
    still raise under Spark's ANSI mode at these magnitudes — if this
    stops failing, the adversarial inputs above are no longer
    adversarial and the suite lost its teeth."""
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        SparkRuntimeException,
    )

    rows = [(4_000_000_000, I64 - 1, I64 - 2)]
    df = spark.createDataFrame(rows, "n bigint, ss bigint, s bigint")
    with pytest.raises((ArithmeticException, SparkRuntimeException)):
        # the pre-fix variance-numerator shape: int64 product first,
        # double cast after
        df.selectExpr("CAST(n * ss - s * s AS DOUBLE) AS v").collect()

    big = 3_037_000_499
    df2 = spark.createDataFrame(
        [(big,), (big,)], "x bigint"
    )
    with pytest.raises((ArithmeticException, SparkRuntimeException)):
        # the pre-fix BIGINT sum-of-squares accumulator
        df2.selectExpr("SUM(x * x) AS ss").collect()


def test_corr_cols_projections_are_shared_text():
    """The per-column projections feeding _corr_sums are single shared
    SQL strings (any Spark/DuckDB dialect fork would silently break
    the exactness contract that the decimal accumulation relies on)."""
    for c, expr in CORR_COLS.items():
        assert expr.startswith("CAST(round("), (c, expr)
    assert CORR_PAIRS == [
        ("qty", "price"),
        ("qty", "disc"),
        ("qty", "tax"),
        ("price", "disc"),
        ("price", "tax"),
        ("disc", "tax"),
    ]
