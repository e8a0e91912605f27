"""Multi-dimensional data layout for scan pruning: Morton (Z-order)
clustering before write.

Why this exists at 100 TB: parquet readers skip files and row groups by
min/max statistics. A table sorted by ONE key prunes scans on that key
only; queries filtering a second dimension read everything. Interleaving
the bits of two (bucketized) keys into a single Morton code and
range-partitioning on it gives every output file a small rectangle in
(x, y) space — filters on EITHER dimension prune most files. This is
the same layout DELTA's `OPTIMIZE ZORDER BY` and Iceberg's sort-order
z-columns produce; here it is plain Spark: a pure-projection code
column + `repartitionByRange` + per-task parquet writes.

Everything is JVM-side integer bit arithmetic — no UDFs, no shuffle
beyond the single range exchange that the clustered write requires
anyway.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i is x's bit i, bit 2i+1 is y's bit i. Callers bucket
    raw values into [0, 2^bits) first (quantile or fixed-width — rank
    preserving is all that matters for locality)."""
    terms = []
    for i in range(bits):
        xbit = F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        ybit = F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        terms.append(xbit)
        terms.append(ybit)
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def fixed_width_bucket(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits): the cheap bucketizer for
    roughly-uniform keys. Skewed keys should use quantile buckets
    (e.g. via Bucketizer / approx quantiles) — locality only needs a
    monotone map."""
    n = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return (clamped * n).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet parts clustered by the Morton
    code of (x, y): range-partition on the code (one exchange, sampled
    split points), sort within each task, drop the helper column, write.
    Each file then covers a compact Z-curve segment — a small rectangle
    in (x, y) — so min/max pruning works for filters on either key."""
    code = morton_code(x, y, bits)
    (
        df.withColumn("__zcode", code)
        .repartitionByRange(n_files, "__zcode")
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
        .write.mode("overwrite")
        .parquet(path)
    )
