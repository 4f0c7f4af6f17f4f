"""Property tests for the round-8 parity instruments — the parts that
must hold for ARBITRARY inputs, not just the fixture corpus.

Spark-free (pure Python + numpy + duckdb) so the suite stays fast:
the Spark side of these components is exercised end-to-end by the
registered queries in ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from end2end_data_pipeline_spark.operators.ingest_parity import (
    AUDIO_RATE,
    _make_wav,
)
from end2end_data_pipeline_spark.operators.multimodal import audio_features

# --- WAV codec: encode -> decode is the identity on the stats -------

PCM16 = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=2048
)


@given(samples=PCM16, rate=st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_arbitrary_pcm(samples, rate):
    """Any PCM16 signal written by the stdlib wave writer must decode
    to exact header fields and exact integer energy stats."""
    pcm = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    f = audio_features(buf.getvalue())
    assert f["codec"] == "pcm16"
    assert (f["n_channels"], f["sample_rate"]) == (1, rate)
    assert f["n_frames"] == len(samples)
    assert f["duration_ms"] == len(samples) * 1000 // rate
    assert f["sum_abs_pcm"] == int(np.abs(pcm.astype(np.int64)).sum())
    assert f["peak_pcm"] == int(np.abs(pcm.astype(np.int64)).max())


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_fixture_wav_matches_arithmetic_regeneration(doc_id):
    """_make_wav(doc_id) decoded must equal the module's documented
    waveform formula for any doc_id — the exact identity the DuckDB
    oracle relies on."""
    n = 400 + (doc_id % 5) * 100
    i = np.arange(n, dtype=np.int64)
    expected = ((doc_id * 7919 + i * 104729) % 65536) - 32768
    f = audio_features(_make_wav(doc_id))
    assert f["n_frames"] == n
    assert f["sample_rate"] == AUDIO_RATE
    assert f["sum_abs_pcm"] == int(np.abs(expected).sum())
    assert f["peak_pcm"] == int(np.abs(expected).max())


# --- GE(2) index: decomposition invariants over arbitrary corpora ---


def _ge2(n: int, a: int, s: int) -> float:
    return (float(n) * float(a) - float(s) * float(s)) / (
        2.0 * float(s) * float(s)
    )


GROUPS = st.lists(
    st.lists(st.integers(min_value=1, max_value=500_000), min_size=1, max_size=30),
    min_size=1,
    max_size=8,
)


@given(groups=GROUPS)
@settings(max_examples=100, deadline=None)
def test_ge2_decomposition_invariants(groups):
    """For any positive integer corpus: GE2 >= 0, an all-equal corpus
    scores ~0, the floor-mean between-term never exceeds total (up to
    the documented sub-unit floor slack), and within = total - between
    by construction."""
    n = sum(len(g) for g in groups)
    s = sum(sum(g) for g in groups)
    ssq = sum(v * v for g in groups for v in g)
    b = sum(len(g) * (sum(g) // len(g)) ** 2 for g in groups)
    total = _ge2(n, ssq, s)
    between = _ge2(n, b, s)
    within = total - between

    assert total >= -1e-12  # Cauchy-Schwarz: n*ssq >= s^2
    # floor slack: replacing members by floored group means can only
    # reduce the sum of squares below ssq
    assert b <= ssq
    assert between <= total + 1e-12
    assert within == total - between  # definitional, exact in floats


def test_ge2_zero_on_equal_corpus():
    vals = [[7, 7, 7], [7, 7]]
    n, s = 5, 35
    ssq = 5 * 49
    b = sum(len(g) * (sum(g) // len(g)) ** 2 for g in vals)
    assert _ge2(n, ssq, s) == 0.0
    assert _ge2(n, b, s) == 0.0


def test_ge2_oracle_matches_python_reference():
    """The registered oracle's DuckDB arithmetic must equal the pure
    Python reference on a hand corpus (pins the SQL shape to the
    definition, the same pattern as test_texthash_properties)."""
    import duckdb

    groups = {"A": [100, 200, 300], "B": [50, 50], "C": [999]}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE y AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {v})" for g, vs in groups.items() for v in vs)
        + ") t(n_name, d)"
    )
    rows = con.execute(
        """
        WITH g AS (
          SELECT n_name, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(SUM(d) AS BIGINT) AS s_g,
                 CAST(SUM(d*d) AS BIGINT) AS ssq_g
          FROM y GROUP BY n_name
        ), t AS (
          SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                 CAST(SUM(s_g) AS BIGINT) AS s,
                 CAST(SUM(ssq_g) AS BIGINT) AS ssq,
                 CAST(SUM(n_g * (s_g // n_g) * (s_g // n_g)) AS BIGINT) AS b
          FROM g
        )
        SELECT * FROM t
        """
    ).fetchall()
    n, s, ssq, b = rows[0]
    flat = [v for vs in groups.values() for v in vs]
    assert n == len(flat) and s == sum(flat)
    assert ssq == sum(v * v for v in flat)
    assert b == sum(
        len(vs) * (sum(vs) // len(vs)) ** 2 for vs in groups.values()
    )
    py_total = _ge2(n, ssq, s)
    db_total = con.execute(
        f"""SELECT (CAST({n} AS DOUBLE)*CAST({ssq} AS DOUBLE)
                    - CAST({s} AS DOUBLE)*CAST({s} AS DOUBLE))
                   / (CAST(2 AS DOUBLE)*CAST({s} AS DOUBLE)*CAST({s} AS DOUBLE))"""
    ).fetchone()[0]
    assert db_total == pytest.approx(py_total, abs=0.0)  # bit-identical


# --- AVI container codec ---------------------------------------------


@given(
    width=st.integers(min_value=1, max_value=8192),
    height=st.integers(min_value=1, max_value=8192),
    n_frames=st.integers(min_value=0, max_value=10_000_000),
    usec=st.integers(min_value=1, max_value=1_000_000),
)
@settings(max_examples=100, deadline=None)
def test_avi_header_roundtrip(width, height, n_frames, usec):
    """Any container parameters written by the encoder must parse back
    exactly, including the derived integer duration."""
    from end2end_data_pipeline_spark.functions.avi_min import (
        encode_avi_stub,
        parse_avi,
    )

    meta = parse_avi(encode_avi_stub(width, height, n_frames, usec))
    assert meta is not None
    assert (meta["width"], meta["height"]) == (width, height)
    assert meta["n_frames"] == n_frames
    assert meta["usec_per_frame"] == usec
    assert meta["duration_ms"] == n_frames * usec // 1000
    assert meta["n_streams"] == 1


@given(junk=st.binary(min_size=0, max_size=256))
@settings(max_examples=50, deadline=None)
def test_avi_parser_rejects_non_avi(junk):
    """Arbitrary bytes (including RIFF-prefixed non-AVI) must return
    None, never a half-parsed dict — the stub-fallback contract."""
    from end2end_data_pipeline_spark.functions.avi_min import parse_avi

    if junk[:4] == b"RIFF" and junk[8:12] == b"AVI ":
        return  # astronomically unlikely; not the case under test
    assert parse_avi(junk) is None


def test_avi_truncated_header_is_none():
    from end2end_data_pipeline_spark.functions.avi_min import (
        encode_avi_stub,
        parse_avi,
    )

    whole = encode_avi_stub(320, 240, 100, 33333)
    # keep the RIFF/AVI magic but cut inside the avih payload
    assert parse_avi(whole[:40]) is None
