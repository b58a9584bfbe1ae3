"""Vector math over ``array<float>`` embedding columns — pure built-ins.

``zip_with`` + ``aggregate`` compile to codegen'd loops over the array;
no Python crossing, no UDF. Accumulation is an ordered left fold in
double precision, which keeps results deterministic (same input order →
bit-identical output on every executor).

For very hot paths (brute-force top-k over millions of candidates) a
vectorized Pandas-UDF matmul variant lives in operators/similarity.py;
these expressions are the portable default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))
