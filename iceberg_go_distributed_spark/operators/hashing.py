"""Deterministic cross-engine hashing primitives.

Everything downstream (MinHash, SimHash, fingerprints) needs a hash
that Spark and the DuckDB oracle compute identically. md5 is the one
digest both engines expose with identical output, so the base primitive
is: first 15 hex chars of md5 → 60-bit non-negative BIGINT. 60 bits
keeps every intermediate (``a*h + b`` with a,b < 2^31) inside signed
64-bit arithmetic on both engines.

Spark's own ``hash()``/``xxhash64()`` are faster but seed- and
engine-specific; they are fine for shuffle keys, never for values that
must match an external oracle. (cf. reference transforms.go:228-340,
which pins bucket hashing to murmur3 for the same
cross-engine-stability reason.)
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: (a*h + b) % P stays < 2^62 for h < P.
MERSENNE31 = 2_147_483_647


def hex15(c: Column) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hex15_sql(expr: str) -> str:
    """Same 60-bit hash as a DuckDB SQL expression."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perms(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n universal-hash (a, b) pairs, deterministic across runs."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(n)
    ]
