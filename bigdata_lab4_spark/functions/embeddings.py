"""Embedding math as Catalyst higher-order functions.

No Python UDFs: dot products / norms / cosine over ``array<float>``
columns run JVM-side via ``aggregate`` + ``zip_with`` (SURVEY §2 L6).
At 100 TB these expressions vectorize inside whole-stage codegen and
never cross the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _colify(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with a double accumulator (float32 inputs upcast per
    element, summed sequentially — deterministic order)."""
    a, b = _colify(a), _colify(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column | str) -> Column:
    a = _colify(a)
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_col(a: Column | str, b: Column | str) -> Column:
    a, b = _colify(a), _colify(b)
    return dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))
