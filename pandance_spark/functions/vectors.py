"""Vector column functions over ``array<float|double>`` embeddings.

Pure Column expressions (JVM-side, codegen'd) — no UDFs.  Higher-order
function lambdas here reference ONLY their lambda variables and
literals (outer column references inside lambda bodies break Catalyst
constraint inference across joins — see operators/ineq.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity", "l2_distance"]


def _as_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns (sequential left fold —
    deterministic summation order)."""
    prod = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    arr = _as_double_array(a)
    sq = F.transform(arr, lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(
        _as_double_array(a), _as_double_array(b), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))
