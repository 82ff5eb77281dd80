"""Portable deterministic hashing, identical in Spark SQL and DuckDB SQL.

Why not ``F.hash``/``F.xxhash64``? Those are Spark-internal algorithms the
DuckDB oracle cannot reproduce. Instead we derive a 60-bit integer from the
first 15 hex digits of md5 — both engines ship md5 and the arithmetic is
exact:

    Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

60 bits < 63 keeps the value positive in a signed BIGINT, so modular
arithmetic matches across engines. MinHash permutations are the classic
universal-hash family h_i(x) = (a_i * x + b_i) mod p with a large prime
p < 2^31 so products stay inside 94 bits — except we keep x itself in
[0, p) first, making every intermediate < 2^62 (no overflow in either
engine's BIGINT).

These run as Catalyst expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: big enough for hash dispersion, small enough
# that (a*x + b) with a,b,x < p fits comfortably in a signed 64-bit int.
MERSENNE_P = 2_147_483_647

# Deterministic permutation coefficients (seeded, fixed — reproducible
# across rounds and engines). Generated once from a fixed LCG; hardcoded
# so the oracle SQL can embed the same constants.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def _perm_coeffs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(n):
        state = (_LCG_A * state + _LCG_C) % _LCG_M
        a = state % (MERSENNE_P - 1) + 1  # a in [1, p-1]
        state = (_LCG_A * state + _LCG_C) % _LCG_M
        b = state % MERSENNE_P  # b in [0, p-1]
        out.append((a, b))
    return out


PERM_COEFFS = _perm_coeffs(64)


def hash60(col: Column | str) -> Column:
    """60-bit non-negative integer hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """Same hash as :func:`hash60`, as DuckDB SQL over ``expr``."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_perm(hash_col: Column, i: int) -> Column:
    """i-th MinHash permutation of an already-hashed value (Spark side)."""
    a, b = PERM_COEFFS[i]
    return (hash_col % MERSENNE_P * F.lit(a) + F.lit(b)) % MERSENNE_P


def minhash_perm_sql(expr: str, i: int) -> str:
    """Same permutation as :func:`minhash_perm`, as DuckDB SQL."""
    a, b = PERM_COEFFS[i]
    return f"(({expr}) % {MERSENNE_P} * {a} + {b}) % {MERSENNE_P}"
