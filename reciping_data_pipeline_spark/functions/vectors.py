"""Vector math over ``array<float>`` embedding columns.

Built on Spark higher-order functions (``zip_with`` + ``aggregate``)
so dot products and norms execute JVM-side per-row without UDF
overhead. Elements are cast to double before multiply so the
summation matches a double-precision oracle bit-for-bit in index
order (float32 accumulation would diverge from DuckDB).

For very wide vectors or very hot paths a Pandas-UDF (numpy matmul)
variant exists in ``operators/similarity.py`` — measured, the HOF
path wins below ~256 dims because it avoids Arrow transfer entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product; sums in index order (deterministic)."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
