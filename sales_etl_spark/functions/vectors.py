"""Vector expression library over ``array<float>`` embedding columns.

Dot products / norms / cosine are sequential left folds
(``F.aggregate``) over double-cast elements — deterministic IEEE
evaluation order, so the same vectors give bit-identical results on
any cluster layout (and match a single-threaded oracle doing the same
fold). All codegen'd JVM expressions; no UDF, no Arrow hop.

For very wide vectors (≥1k dims) a vectorized pandas_udf with numpy
becomes competitive; at the 64-dim testdata scale the fold wins (no
serialization) — see operators/similarity.py for the scale notes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    prods = F.zip_with(to_double(a), to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0 (ANSI-safe)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_rounded(a: Column | str, b: Column | str, digits: int = 6) -> Column:
    """Cosine quantized for hash-stable comparison across engines.

    The fold order is pinned, but the *oracle* engine's fold must match
    bit-for-bit too; rounding to 1e-6 collapses any residual last-ulp
    difference while keeping full ranking power."""
    return F.round(cosine(a, b), digits)
