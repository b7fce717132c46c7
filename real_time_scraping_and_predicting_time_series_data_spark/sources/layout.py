"""Z-order (Morton) data layout for multi-dimensional file pruning.

Partition pruning and parquet min/max skipping are one-dimensional: sorting
by `a` makes `WHERE a BETWEEN ...` cheap and `WHERE b BETWEEN ...` a full
scan. Interleaving the bits of both columns into one Morton key and
range-partitioning + sorting on it keeps rows that are close in (a, b)
space close on disk, so every file covers a small RECTANGLE of the value
space and a 2-D box predicate intersects few files — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, built here from pure Catalyst
expressions (bit ops only, no UDFs).

At 100 TB this is a one-shuffle write-side investment
(`repartitionByRange` on the z-value + in-partition sort) that every
subsequent selective scan amortizes; the reader needs NO code change —
parquet row-group stats do the skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rank_scale", "zvalue", "write_zordered"]


def rank_scale(
    df: DataFrame, col: str, bits: int = 16, method: str = "minmax"
) -> Column:
    """Scale ``col`` to an integer in [0, 2^bits) — monotone, so
    z-locality in scaled space is locality in value space.

    ``method="minmax"`` (default): linear position between the column
    bounds (one 1-row aggregate). Right for RAW-RANGE predicates
    (``BETWEEN x AND y``): file rectangles live in the same space the
    predicates do.

    ``method="quantile"``: equi-depth codes from 2^bits−1 approximate
    percentile boundaries — every code carries ~equal row mass. Right for
    rank/percentile-shaped predicates and heavy skew, but on sparse tails
    it WIDENS raw-space rectangles (a tail code spans a huge value range),
    which measurably hurts raw-range pruning — measured 70 vs 56 files
    touched on the events box workload in tests/test_layout.py."""
    if method == "quantile":
        n = (1 << bits) - 1
        fracs = [i / (n + 1) for i in range(1, n + 1)]
        bounds = df.agg(
            F.percentile_approx(F.col(col).cast("double"), fracs, 10000).alias("_b")
        ).collect()[0]._b
        arr = F.array(*[F.lit(float(x)) for x in bounds])
        return F.size(
            F.filter(arr, lambda x: x <= F.col(col).cast("double"))
        ).cast("long")
    b = df.agg(
        F.min(col).cast("double").alias("_lo"), F.max(col).cast("double").alias("_hi")
    ).collect()[0]
    lo, hi = b._lo, b._hi
    span = (hi - lo) or 1.0
    top = (1 << bits) - 1
    return F.least(
        F.lit(top),
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 0.2)),
    ).cast("long")


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two ``bits``-wide non-negative integer columns
    into one long: a's bit i lands at position 2i, b's at 2i+1. Pure
    shift/mask expression tree — whole-stage-codegen friendly."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet z-ordered on (col_a, col_b): one
    range-shuffle on the Morton key + an in-partition sort, so each output
    file covers a compact rectangle of (a, b) space and carries tight
    row-group min/max stats on BOTH columns."""
    za = rank_scale(df, col_a, bits)
    zb = rank_scale(df, col_b, bits)
    (
        df.withColumn("_z", zvalue(za, zb, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
