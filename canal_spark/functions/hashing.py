"""Portable 60-bit hashing: identical values in Spark AND DuckDB.

Round 1 left 4 driver queries (minhash LSH, simhash, ANN LSH, near-pairs)
rows-only because their signatures were ``xxhash64``-seeded — a Spark-only
function. This module re-derives every pseudo-random quantity from md5,
which both engines implement bit-identically over UTF-8 bytes, so the
DuckDB oracle can verify them value-for-value (VERDICT.md "What's missing"
item 4).

Primitives
----------
``h60``: the first 15 hex chars of md5 parsed base-16 → BIGINT in [0, 2^60).
  Spark:  CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

``perm_k``: the k-th MinHash permutation of an h60 value via 2-universal
hashing over the value's 30-bit halves — pure int64 arithmetic (products
< 2^61, no overflow), identical ``%`` on positive operands in both engines:

  perm_k(h) = (a_k * (h >> 30) + b_k * (h & MASK30) + c_k) % P31

The (a, b, c) coefficients come from ``coeffs`` — md5-derived on the
DRIVER (plain hashlib) and embedded as literals in both the Spark plan and
the oracle SQL, so neither engine hashes at runtime for them.

This replaces K chained xxhash64 calls per shingle with K fused
multiply-adds — cheaper AND portable. The reference's equivalent role is
the deterministic pk-hash partitioning contract (SURVEY.md §2 #22).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = (1 << 31) - 1       # Mersenne prime modulus for permutations
MASK30 = (1 << 30) - 1


def _driver_h60(s: str) -> int:
    """The same 60-bit md5 hash, computed driver-side (for constants)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def coeffs(k: int, seed: int = 0) -> tuple[int, int, int]:
    """Deterministic (a, b, c) for permutation k — each in [1, P31-1]."""
    def d(tag: str) -> int:
        return 1 + _driver_h60(f"perm:{seed}:{k}:{tag}") % (P31 - 1)
    return d("a"), d("b"), d("c")


def plane_weights(n_planes: int, dim: int, table: int = 0,
                  seed: int = 0) -> list[list[int]]:
    """Integer hyperplane weights in [-500000, 500000) for LSH bucketing.

    Derived driver-side and embedded as literals in both engines; with
    vectors fixed-pointed to e6 ints the projection is EXACT integer
    arithmetic (|Σ| < dim·1e6·5e5 ≈ 2^45) — no float-sum associativity
    hazard between engines."""
    return [
        [_driver_h60(f"plane:{seed}:{table}:{p}:{j}") % 1_000_000 - 500_000
         for j in range(dim)]
        for p in range(n_planes)
    ]


# ----------------------------------------------------------------- Spark

def h60(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def perm(h: Column, k: int, seed: int = 0) -> Column:
    a, b, c = coeffs(k, seed)
    hi = F.shiftright(h, 30)
    lo = h.bitwiseAND(F.lit(MASK30).cast("long"))
    return F.pmod(F.lit(a) * hi + F.lit(b) * lo + F.lit(c), F.lit(P31))


# ---------------------------------------------------------------- DuckDB

def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def perm_sql(h_expr: str, k: int, seed: int = 0) -> str:
    a, b, c = coeffs(k, seed)
    return (f"(({a} * ({h_expr} >> 30) + {b} * ({h_expr} & {MASK30})"
            f" + {c}) % {P31})")
