"""Embedding vector math, engine-portable via integer quantization.

Floating-point dot products are order-sensitive, so a cosine computed
by Spark and by the DuckDB oracle can differ in the last ulps and fail
a value-hash comparison. The engine therefore quantizes embedding
components to integers once (``round(x * SCALE)`` — deterministic
per-component IEEE math), accumulates dot products and norms in EXACT
integer arithmetic (order-insensitive), and performs a single
float division at the end — bit-identical in both engines.

This mirrors the int8-quantization trick production ANN systems use;
at 100 TB the quantized arrays are also 2x smaller to shuffle. All
expressions are built-in (whole-stage codegen'd); no UDFs.
"""

from __future__ import annotations

from end2end_data_pipeline_spark.functions.texthash import DUCK, SPARK  # noqa: F401

SCALE = 10_000

# Random-hyperplane LSH (Charikar 2002): plane p's d-th component is a
# deterministic pseudo-random integer in [-1000, 1000] derived from the
# portable hash — both engines materialize identical planes from
# nothing but (p, d), so no literal weight matrices are shipped.
N_PLANES = 8
PLANE_MOD = 2001
PLANE_OFFSET = 1000


def quantize(vec_expr: str, dialect: str) -> str:
    """array<float> -> array<bigint> at SCALE."""
    body = "CAST(ROUND(CAST(x AS DOUBLE) * {s}) AS BIGINT)".format(s=SCALE)
    if dialect == SPARK:
        return f"transform({vec_expr}, x -> {body})"
    return f"list_transform({vec_expr}, x -> {body})"


def dot_q(a_expr: str, b_expr: str, dialect: str) -> str:
    """Exact integer dot product of two quantized vectors."""
    if dialect == SPARK:
        return (
            f"aggregate(zip_with({a_expr}, {b_expr}, (x, y) -> x * y), "
            f"0L, (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform({a_expr}, (x, i) -> x * ({b_expr})[i])) "
        f"AS BIGINT)"
    )


def sub_q(a_expr: str, b_expr: str, dialect: str) -> str:
    """Exact elementwise difference of two quantized vectors (the
    residual a - b that IVF-PQ encodes; integer math, order-free)."""
    if dialect == SPARK:
        return f"zip_with({a_expr}, {b_expr}, (x, y) -> x - y)"
    return f"list_transform({a_expr}, (x, i) -> x - ({b_expr})[i])"


def cosine_q(a_expr: str, b_expr: str, na_expr: str, nb_expr: str, dialect: str) -> str:
    """Cosine from exact integer dot + precomputed integer self-dots."""
    d = dot_q(a_expr, b_expr, dialect)
    return (
        f"(CAST({d} AS DOUBLE) / "
        f"(sqrt(CAST({na_expr} AS DOUBLE)) * sqrt(CAST({nb_expr} AS DOUBLE))))"
    )


EMBED_DIM = 64


def _py_md5_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def plane_weights(plane: int, dim: int = EMBED_DIM) -> list[int]:
    """w[plane][d] in [-1000, 1000], derived from the portable md5 hash
    in Python (hashlib md5 == Spark md5 == DuckDB md5) and embedded as
    integer literals — zero per-row hashing at execution time, and both
    engines see identical planes by construction."""
    return [
        _py_md5_int(f"plane{plane}_{d}") % PLANE_MOD - PLANE_OFFSET
        for d in range(dim)
    ]


def lsh_bucket(qvec_expr: str, dialect: str) -> str:
    """Random-hyperplane LSH bucket id in [0, 2^N_PLANES).

    bit_p = [dot(q, plane_p) >= 0]; bucket = sum bit_p << p.
    Exact integer arithmetic over literal plane weights -> cheap,
    constant-folded, engine-portable.
    """
    terms = []
    for p in range(N_PLANES):
        ws = plane_weights(p)
        if dialect == SPARK:
            lit = "array(" + ", ".join(f"{w}L" for w in ws) + ")"
            d = (
                f"aggregate(zip_with({qvec_expr}, {lit}, (x, w) -> x * w), "
                f"0L, (acc, v) -> acc + v)"
            )
        else:
            lit = "[" + ", ".join(f"{w}::BIGINT" for w in ws) + "]"
            d = (
                f"CAST(list_sum(list_transform({qvec_expr}, "
                f"(x, i) -> x * ({lit})[i])) AS BIGINT)"
            )
        terms.append(f"(CASE WHEN ({d}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
