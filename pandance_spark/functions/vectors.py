"""Vector column functions over ``array<float|double>`` embeddings.

Pure Column expressions (JVM-side, codegen'd) — no UDFs.  Higher-order
function lambdas here reference ONLY their lambda variables and
literals (outer column references inside lambda bodies break Catalyst
constraint inference across joins — see operators/ineq.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "l2_distance",
    "l2_normalize",
    "const_vectors",
    "embedding_centroids",
    "quantize_embedding",
    "dequantize_embedding",
    "projection_signs",
    "project_embedding",
]


def const_vectors(vectors) -> Column:
    """Literal ``array<array<double>>`` from a Python list of vectors.

    Built as ``from_json`` of a literal JSON string, which Catalyst
    CONSTANT-FOLDS into a single array literal at optimization time —
    the plan carries ONE literal node instead of ``n * dim`` unrolled
    ``F.lit`` elements.  With 8 centroids x 64 dims the unrolled form
    puts 512 literal nodes (plus one lambda per centroid) through
    analysis and whole-stage codegen, costing seconds of compile time
    per query; the folded form compiles a single generic loop.  Use
    with ``F.transform``/``F.zip_with`` to scan centroid / hyperplane
    tables inside row expressions without a join.
    """
    import json

    payload = json.dumps([[float(x) for x in v] for v in vectors])
    return F.from_json(F.lit(payload), "array<array<double>>")


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


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through as-is).
    Normalizing once upstream turns every cosine into a plain dot
    product — the standard prep step before ANN indexing."""
    arr = _as_double_array(a)
    nrm = l2_norm(arr)
    # zip against a repeated-norm array so the lambda touches only its
    # own variables (outer-column capture breaks Catalyst — see header)
    unit = F.zip_with(
        arr, F.array_repeat(nrm, F.size(arr)), lambda x, n: x / n
    )
    return F.when(nrm > 0.0, unit).otherwise(arr)


def embedding_centroids(df, group_col: str, vec_col: str):
    """Per-group element-wise mean of an embedding column, in long form:
    ``(group, pos, centroid, n)`` — one row per (group, dimension).

    posexplode -> groupBy(group, pos) avg: the aggregation combines
    partially map-side, so the shuffle carries one partial sum per
    (group, dimension, input partition) — never the raw vectors.  This
    is the building block for IVF coarse quantizers, per-source
    embedding drift monitoring, and cluster summarization.

    Long form (not array-typed) keeps the output joinable/filterable by
    plain relational ops; pivot back with ``collect_list`` over
    ``pos``-sorted rows when an array is needed.
    """
    ex = df.select(
        F.col(group_col),
        F.posexplode(_as_double_array(F.col(vec_col))).alias("pos", "__v"),
    )
    return ex.groupBy(group_col, "pos").agg(
        F.avg("__v").alias("centroid"),
        F.count("*").alias("n"),
    )


def quantize_embedding(v: Column, bits: int = 8) -> Column:
    """Symmetric linear quantization of an embedding to small ints.

    Returns ``struct(codes: array<tinyint|smallint>, scale: double)``
    with ``value ~= code * scale`` and ``scale = max(|v|) / (2^(bits-1)
    - 1)``.  At 8 bits a float32 embedding column shrinks 4x on disk
    and in shuffle — the difference between a 100 TB and a 25 TB
    embedding table — while cosine top-k over dequantized vectors is
    near-lossless (per-element error <= scale/2).  Pure Column
    expressions; round() is half-up, matching the dequantize side.

    Zero vectors quantize to all-zero codes with scale 0.
    """
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16 (tinyint / smallint codes)")
    qmax = (1 << (bits - 1)) - 1
    itype = "tinyint" if bits == 8 else "smallint"
    arr = _as_double_array(v)
    amax = F.array_max(F.transform(arr, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(float(qmax))).otherwise(F.lit(0.0))
    codes = F.transform(
        arr,
        lambda x: F.when(scale > 0, F.round(x / scale, 0))
        .otherwise(F.lit(0.0))
        .cast(itype),
    )
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize_embedding(qv: Column) -> Column:
    """Inverse of :func:`quantize_embedding`: ``codes * scale`` back to
    ``array<double>``."""
    return F.transform(
        qv["codes"], lambda c: c.cast("double") * qv["scale"]
    )


def projection_signs(in_dim: int, out_dim: int, seed: int = 42):
    """Deterministic ±1 sign matrix for :func:`project_embedding`:
    ``signs[j][i] = +1`` iff the first hex digit of
    ``md5("{seed}:{i}:{j}")`` is even.  A documented closed form any
    engine (or an oracle) can regenerate — no RNG state to ship."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def project_embedding(
    v: Column, in_dim: int, out_dim: int, seed: int = 42
) -> Column:
    """Johnson-Lindenstrauss random projection to ``out_dim`` via a
    deterministic ±1 sign matrix: ``y_j = (1/sqrt(out_dim)) * sum_i
    x_i * s_ij``.  The dimensionality-reduction front end for ANN /
    clustering at scale — JL preserves pairwise distances within
    (1±eps) for out_dim = O(ln n / eps^2), and a sign matrix (Achlioptas
    2001) needs no dense Gaussian.

    Pure Column expression, MAP-ONLY — zero shuffle; cost is
    ``in_dim * out_dim`` multiply-adds per row, expressed as
    ``out_dim`` fold loops so the PLAN stays O(out_dim) nodes (an
    unrolled form would put in_dim*out_dim Catalyst nodes through
    analysis — ~98k at 768x128, blowing past the JVM method-size
    limit and falling out of codegen; each sign row rides in as ONE
    constant-folded ``from_json`` literal instead, the const_vectors
    trick).

    Exactness: inputs are snapped to integer micro-units
    (``round(x * 2^20)``) so the per-output sums are exact integer
    arithmetic — bit-identical across engines and summation orders;
    the single trailing ``sum * (1 / (2^20 * sqrt(out_dim)))`` double
    multiply is one IEEE op, identical everywhere.  Inputs must have
    exactly ``in_dim`` elements; arrays of any other length yield
    NULL outputs (zip_with pads the short side with NULLs, which
    poison the fold — never a silent wrong answer).
    """
    import json
    import math

    if in_dim < 1 or out_dim < 1:
        raise ValueError("in_dim and out_dim must be >= 1")
    signs = projection_signs(in_dim, out_dim, seed)
    q = F.transform(
        v, lambda x: F.round(x.cast("double") * F.lit(1048576.0)).cast("long")
    )
    # enforce exact length: any other length must yield NULLs, and a
    # LONGER input would otherwise zip its tail against sign-NULLs
    # without affecting the guard, so check size explicitly
    q = F.when(F.size(q) == in_dim, q).otherwise(F.lit(None))
    scale = 1.0 / (1048576.0 * math.sqrt(out_dim))
    outs = []
    for j in range(out_dim):
        sj = F.from_json(F.lit(json.dumps(signs[j])), "array<bigint>")
        total = F.aggregate(
            F.zip_with(q, sj, lambda a, s: a * s),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        outs.append(total.cast("double") * F.lit(scale))
    return F.array(*outs)
