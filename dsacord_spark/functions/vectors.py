"""Vector math over `array<float>` embedding columns as pure Column
expressions (F.zip_with / F.aggregate run JVM-side and evaluate strictly
left-to-right, so results are deterministic and bit-reproducible by a
sequential SQL oracle).

All arithmetic is promoted to double before any accumulation: float32
accumulation would diverge between engines; double accumulation of the
same float32 inputs in the same order is exact-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    products = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; NULL if either norm is 0."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
