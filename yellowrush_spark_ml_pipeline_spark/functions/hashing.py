"""Cross-engine deterministic hashing.

Spark's `xxhash64` is the right production hash (JVM-side, codegen, fast),
but it is engine-internal: no other SQL engine reproduces it, so any
operator built on it can only be verified by planted-data tests, never by
a differential oracle. This module provides a second, slower hash with an
EXACT cross-engine contract — the top 60 bits of the MD5 digest read as a
big-endian integer:

    Spark : ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to long
    DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``

15 hex chars = 60 bits, which fits a signed 64-bit integer in both engines
(no unsigned wraparound edge), and MD5 itself is bit-identical everywhere.
Dedup operators take ``hash_fn="md5"`` to switch onto this hash, making
the WHOLE MinHash/SimHash path replayable in DuckDB SQL — signatures,
banding, candidate generation, verify — not just smoke-testable.
Production default stays ``xxhash64``; the md5 mode costs one string MD5
per hashed value (measured ~1.3-2x on the signature stage) and is the
verification configuration.

MinHash permutations use the classic universal-hash family
``h_i(x) = (a_i * x + b_i) mod p`` with p = 2^31 - 1 (Mersenne). Inputs
are first reduced mod p, so ``a_i * x`` stays under 2^62 — no overflow in
either engine's BIGINT arithmetic, hence bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1 — the minhash permutation modulus.
MINHASH_P = 2_147_483_647

#: DuckDB expression template for `md5_hash60` (format with the column/expr).
DUCKDB_MD5_HASH60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def md5_hash60(col: Column | str) -> Column:
    """Top 60 bits of md5(col) as a non-negative BIGINT (cross-engine:
    see module docstring for the DuckDB twin expression)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the permutation family, from a
    64-bit SplitMix-style mixer — pure integer arithmetic, reproducible
    forever (no PRNG library drift), and the same literals embed into the
    DuckDB oracle SQL. a_i in [1, p), b_i in [0, p)."""
    out = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    def nxt() -> int:
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)
    for _ in range(num_hashes):
        a = nxt() % (MINHASH_P - 1) + 1
        b = nxt() % MINHASH_P
        out.append((a, b))
    return out


def minhash_value(x: Column, a: int, b: int) -> Column:
    """One permutation ``(a * (x mod p) + b) mod p`` over a non-negative
    64-bit input. The same arithmetic in DuckDB:
    ``(a * (x % 2147483647) + b) % 2147483647``."""
    return (F.lit(a) * (x % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)
