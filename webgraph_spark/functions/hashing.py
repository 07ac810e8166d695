"""Portable deterministic hashing expressible identically in Spark SQL
and ANSI/DuckDB SQL — the foundation for oracle-checkable MinHash/
fingerprint operators.

``md5_long(x)``: first 15 hex chars of md5 as a non-negative int64
(60 bits). Spark: conv(substr(md5(x),1,15),16,10) cast to long.
DuckDB twin: ('0x' || substr(md5(x),1,15))::BIGINT.

Universal-hash family h_i(x) = (a_i * (x mod p) + b_i) mod p with
p = 2^31 - 1 (Mersenne), a_i/b_i seeded constants: products stay below
2^62, so int64 arithmetic is exact in both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

MERSENNE_P = (1 << 31) - 1


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as long (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def hash_family(n: int, seed: int = 12345) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficient lists for n universal hashes."""
    rng = np.random.RandomState(seed)
    a = [int(x) for x in rng.randint(1, MERSENNE_P, size=n)]
    b = [int(x) for x in rng.randint(0, MERSENNE_P, size=n)]
    return a, b


def universal_hash(hcol: Column, a: int, b: int, p: int = MERSENNE_P) -> Column:
    """(a * (h mod p) + b) mod p — exact in int64."""
    return (F.lit(a) * (hcol % F.lit(p)) + F.lit(b)) % F.lit(p)


def universal_hash_sql(hexpr: str, a: int, b: int, p: int = MERSENNE_P) -> str:
    return f"(({a} * (({hexpr}) % {p}) + {b}) % {p})"
