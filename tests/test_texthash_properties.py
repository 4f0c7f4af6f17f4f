"""Property-based tests for the portable hashing layer
(functions/texthash.py) — the contract every oracle comparison rests
on: the DuckDB-dialect expressions must agree with an independent
pure-Python evaluation of the same definition for ARBITRARY inputs,
not just the fixture corpus. (The Spark dialect is exercised against
DuckDB across the whole registry by tests/test_oracle_parity.py; this
file pins the DuckDB side to the definition itself.)

DuckDB-only — no SparkSession, so the suite stays fast.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from end2end_data_pipeline_spark.functions import texthash as th

# tokens mirror the corpus alphabet; hashing must hold for any string,
# so a second strategy throws unicode at the md5 layer via parameters
TOKEN = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
ANY_TEXT = st.text(min_size=0, max_size=64)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _py_md5h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(s=ANY_TEXT)
@settings(max_examples=200, deadline=None)
def test_md5h_matches_python(s):
    con = duckdb.connect()
    got = con.execute(f"SELECT {th.md5h('?', th.DUCK)}", [s]).fetchone()[0]
    assert got == _py_md5h(s)
    con.close()


@given(toks=st.lists(TOKEN, min_size=0, max_size=12), n=st.integers(2, 4))
@settings(max_examples=100, deadline=None)
def test_shingles_match_reference(toks, n):
    """DuckDB shingle windows == the definition: space-joined word
    n-grams over 1-based windows, empty below n tokens."""
    con = duckdb.connect()
    expr = th.shingles("t", n, th.DUCK)
    got = con.execute(f"SELECT {expr} FROM (SELECT ?::VARCHAR[] AS t)", [toks]).fetchone()[0]
    expect = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert (got or []) == expect
    con.close()


@given(toks=st.lists(TOKEN, min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_fingerprint_matches_reference(toks):
    """Position-weighted polynomial fingerprint == pure-Python eval of
    the documented definition (1-based positions, TOKEN_MOD-reduced
    token hashes, FINGERPRINT_MOD-reduced sum)."""
    con = duckdb.connect()
    text = " ".join(toks)
    expr = th.fingerprint(th.tokens("?", th.DUCK), th.DUCK)
    # the tokens expression references the parameter twice (list_transform
    # over range(len)) — bind it once per placeholder occurrence
    n_params = expr.count("?")
    got = con.execute(f"SELECT {expr}", [text] * n_params).fetchone()[0]
    split = text.split(" ")
    expect = (
        sum((i + 1) * (_py_md5h(t) % th.TOKEN_MOD) for i, t in enumerate(split))
        % th.FINGERPRINT_MOD
    )
    assert got == expect
    con.close()


@given(toks=st.lists(TOKEN, min_size=2, max_size=10, unique=True))
@settings(max_examples=50, deadline=None)
def test_minhash_affine_matches_reference(toks):
    """k=4 affine MinHash signature over base hashes == pure Python."""
    con = duckdb.connect()
    base = th.base_hashes("s", th.DUCK)
    py_base = [_py_md5h(t) % th.BASE_MOD for t in toks]
    for a, b in th.affine_coeffs(4):
        expr = th.minhash_affine(base, a, b, th.DUCK)
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ?::VARCHAR[] AS s)", [toks]
        ).fetchone()[0]
        assert got == min((a * h + b) % th.MINHASH_P for h in py_base)
    con.close()


@given(toks=st.lists(TOKEN, min_size=2, max_size=8))
@settings(max_examples=50, deadline=None)
def test_simhash_matches_reference(toks):
    """8-bit SimHash over token hashes == pure-Python bit votes."""
    con = duckdb.connect()
    hashes = th.token_hashes("s", th.DUCK)
    expr = th.simhash(hashes, 8, th.DUCK)
    got = con.execute(
        f"SELECT {expr} FROM (SELECT ?::VARCHAR[] AS s)", [toks]
    ).fetchone()[0]
    py_hashes = [_py_md5h(t) for t in toks]
    expect = 0
    for bit in range(8):
        vote = sum(1 if (h >> bit) & 1 else -1 for h in py_hashes)
        if vote > 0:
            expect |= 1 << bit
    assert got == expect
    con.close()


@given(toks=st.lists(TOKEN, min_size=0, max_size=12), n=st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_shingle_hashes_pos_matches_reference(toks, n):
    """Positional shingle hashes: the DuckDB expression must equal the
    from-definition Python recompute, and its distinct set must equal
    shingle_combine's output (the shared-constants contract the
    dedup/DSIR consumers rely on)."""
    con = duckdb.connect()
    text = " ".join(toks) if toks else ""
    t = th.tokens("'" + text.replace("'", "''") + "'", th.DUCK)
    th_arr = th.reduced_token_hashes(t, th.DUCK)
    pos = th.shingle_hashes_pos("th_arr", n, th.DUCK)
    comb = th.shingle_combine("th_arr", n, th.DUCK)
    got_pos, got_comb = con.execute(
        f"SELECT {pos}, {comb} FROM (SELECT {th_arr} AS th_arr)"
    ).fetchone()

    base = [_py_md5h(tok) % th.BASE_MOD for tok in (text.split(" ") if text else [""])]
    cs = th.shingle_coeffs(n)
    want = [
        sum(c * base[i + k] for k, c in enumerate(cs)) % th.MINHASH_P
        for i in range(len(base) - n + 1)
    ]
    assert list(got_pos) == want
    # distinct-preserving relationship with the combiner (order-free)
    assert set(got_pos) == set(got_comb)
    con.close()
