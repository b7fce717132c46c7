"""Vector math as Catalyst expressions (no UDFs).

Higher-order functions (``zip_with`` + ``aggregate``) keep the dot product /
cosine entirely JVM-side and sequential (deterministic summation order —
important for oracle parity). Inputs are cast to double first so float32
embeddings accumulate in double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "norm", "cosine", "hamming64"]


def as_double(v: Column | str) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then left-to-right sum (order-deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
