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
    "quantized_moments",
    "top_component",
    "pc1_projection",
    "remove_top_component",
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


# --- dominant principal component (all-but-the-top) ---------------------
# Mu & Viswanath 2018 ("All-but-the-Top") subtract the corpus mean and
# the top principal component(s) from embeddings before similarity
# work.  Everything below is engineered for ENGINE-EXACT replay: inputs
# snap to 2^20 micro-units (the project_embedding convention), first
# and second moments are EXACT integer sums, and the driver-side power
# iteration rounds every iterate to 9 dp — a binary double is never an
# exact multiple of 1e-10, so the rounding is tie-free and any engine
# that replays the same iteration count reproduces the component
# bit-for-bit.

_PC1_DP = 9


def _power_iteration(cov, iters: int, dp: int = _PC1_DP):
    """Dominant eigenvector of ``cov`` (list of row lists) by power
    iteration with per-step ``dp``-rounding; sequential inner sums
    (plain Python loops) so a SQL replay with sequential folds agrees.
    Deterministic sign: the coordinate of largest magnitude (first
    index on ties) is made positive."""
    import math

    d = len(cov)
    x = [round(1.0 / math.sqrt(d), dp)] * d
    for _ in range(iters):
        y = []
        for r in cov:
            acc = 0.0
            for a, b in zip(r, x):
                acc += a * b
            y.append(acc)
        nrm = 0.0
        for v in y:
            nrm += v * v
        nrm = math.sqrt(nrm)
        if nrm == 0.0:
            return x
        x = [round(v / nrm, dp) for v in y]
    k = max(range(d), key=lambda i: abs(x[i]))
    if x[k] < 0:
        x = [-v for v in x]
    return x


def quantized_moments(df, vec_col: str, dim: int):
    """Exact integer first/second moments of the 2^20-snapped vectors:
    ``(n, s, P)`` with ``s[i] = Σ q_i`` and ``P[(i, j)] = Σ q_i q_j``
    (upper triangle, 0-based).  Vectors whose length differs from
    ``dim`` are excluded (the project_embedding NULL-guard rule).

    Spark-first shape: one two-level posexplode produces (i, j, q_i,
    q_j) pair rows; the groupBy keys are the ``dim*(dim+1)/2`` index
    pairs, so map-side partial aggregation collapses each input
    partition to at most that many rows before the shuffle — the
    shuffle never carries per-vector data.  Sums accumulate as
    ``decimal(38,0)`` (exact at any corpus size; the collected driver
    values become Python ints)."""
    q = F.transform(
        _as_double_array(F.col(vec_col)),
        lambda x: F.round(x * F.lit(1048576.0)).cast("long"),
    )
    q = F.when(F.size(q) == dim, q).otherwise(F.lit(None))
    qdf = df.select(q.alias("__q")).filter(F.col("__q").isNotNull())
    base = qdf.select(
        F.posexplode("__q").alias("__i", "__qi"), F.col("__q")
    )
    pairs = base.select(
        "__i",
        "__qi",
        F.posexplode(
            F.slice("__q", F.col("__i") + 1, F.lit(dim))
        ).alias("__jo", "__qj"),
    )
    # cast each FACTOR to decimal before multiplying: a long*long
    # product of two ~2^20-scaled micro-unit values can silently wrap
    # int64 under non-ANSI mode when input magnitudes exceed the
    # ~unit convention (ADVICE r8); decimal(19,0)x(19,0) -> (38,0)
    # keeps the product exact for any |x| < ~9.5e12
    # ONE aggregation + ONE collect for both moment families (r11
    # optimization — two separate jobs re-evaluated the quantize +
    # first-explode subtree and serialized two driver round-trips):
    # the diagonal groups (__jo == 0, where __qj is __qi itself —
    # posexplode positions are 0-based) carry the first moments and
    # the row count alongside their pair sum.
    mom = (
        pairs.groupBy("__i", "__jo")
        .agg(
            F.sum(
                F.col("__qi").cast("decimal(19,0)")
                * F.col("__qj").cast("decimal(19,0)")
            ).alias("__p"),
            F.sum(
                F.when(F.col("__jo") == 0, F.col("__qi")).cast(
                    "decimal(38,0)"
                )
            ).alias("__s"),
            F.count("*").alias("__n"),
        )
        .collect()
    )
    if not mom:
        raise ValueError(f"no vectors of length {dim} in {vec_col!r}")
    n = int(mom[0]["__n"])
    s = [0] * dim
    P = {}
    for r in mom:
        P[(r["__i"], r["__i"] + r["__jo"])] = int(r["__p"])
        if r["__jo"] == 0:
            s[r["__i"]] = int(r["__s"])
    return n, s, P


def top_component(df, vec_col: str, dim: int, iters: int = 30):
    """Corpus mean (micro-units) and dominant principal component of
    an embedding column.  Returns ``(n, s, pc1)`` where ``pc1`` is the
    9-dp-rounded unit eigenvector (Python floats).  The covariance is
    assembled on the driver from the EXACT integer moments —
    ``C[i][j] = (P/n - (s_i/n)(s_j/n)) / 2^40`` with each division a
    single IEEE op any engine reproduces — so the whole estimate is
    independent of partitioning and summation order."""
    n, s, P = quantized_moments(df, vec_col, dim)
    S2 = 1048576.0 * 1048576.0
    fn = float(n)
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        si = float(s[i]) / fn
        for j in range(i, dim):
            c = (float(P[(i, j)]) / fn - si * (float(s[j]) / fn)) / S2
            cov[i][j] = c
            cov[j][i] = c
    return n, s, _power_iteration(cov, iters)


def pc1_projection(
    df,
    vec_col: str,
    dim: int,
    keep_cols=("vec_id",),
    iters: int = 30,
):
    """Per-row scalar projection onto the corpus' dominant principal
    component (the quantity "all-but-the-top" removes):
    ``pc1_proj = (v - mean) · pc1`` rounded to 9 dp, computed in
    integer space — ``q · p`` with ``p = round(pc1 * 1e9)`` is an
    exact fold (1e9 recovers the 9-dp iterate integers tie-free), and
    only the final centering/rescale touches doubles.  Map-only after
    the two moment aggregates; the component rides in as a literal."""
    n, s, pc1 = top_component(df, vec_col, dim, iters)
    p = [int(round(v * 1e9)) for v in pc1]
    spmu = sum(pi * si for pi, si in zip(p, s))  # exact Python int
    import json

    q = F.transform(
        _as_double_array(F.col(vec_col)),
        lambda x: F.round(x * F.lit(1048576.0)).cast("long"),
    )
    q = F.when(F.size(q) == dim, q).otherwise(F.lit(None))
    plit = F.from_json(F.lit(json.dumps(p)), "array<bigint>")
    # decimal factors: q ~ 2^20*|x| and p ~ 1e9, so the long product
    # wraps int64 once |x| exceeds ~8.8e3 — cast BEFORE multiplying
    # and accumulate in decimal(38,0) (exact; ADVICE r8)
    dq = F.aggregate(
        F.zip_with(
            q,
            plit,
            lambda a, b: a.cast("decimal(19,0)") * b.cast("decimal(19,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: (acc + t).cast("decimal(38,0)"),
    )
    t = (dq.cast("double") - F.lit(float(spmu) / float(n))) / F.lit(
        1048576.0 * 1.0e9
    )
    return df.select(*keep_cols, F.round(t, _PC1_DP).alias("pc1_proj"))


def remove_top_component(
    df, vec_col: str, dim: int, out_col: str = "vec_abtt", iters: int = 30
):
    """All-but-the-top embedding post-processing (Mu & Viswanath
    2018): subtract the corpus mean and the projection onto the
    dominant principal component — the cheap fix for the anisotropy
    that makes raw embedding cosines saturate.  Adds ``out_col``
    (array<double>).  Map-only per row once the component literal is
    estimated; float output (pipeline use — the ORACLE-exact scalar
    path is :func:`pc1_projection`)."""
    import json

    from pandance_spark._kernel import stage_expr

    n, s, pc1 = top_component(df, vec_col, dim, iters)
    mu = [si / float(n) / 1048576.0 for si in s]
    mulit = F.from_json(F.lit(json.dumps(mu)), "array<double>")
    pclit = F.from_json(F.lit(json.dumps(pc1)), "array<double>")
    centered = F.zip_with(
        _as_double_array(F.col(vec_col)), mulit, lambda a, b: a - b
    )
    t = F.aggregate(
        F.zip_with(centered, pclit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # stage (centered, t): t captured inside the output lambda would
    # otherwise re-evaluate per ELEMENT (captured subtrees evaluate per
    # lambda call), and centered feeds both t and the output
    staged = stage_expr(
        df, F.struct(centered.alias("c"), t.alias("t")), "__abtt"
    )
    out = F.zip_with(
        F.col("__abtt.c"),
        pclit,
        lambda c, w: c - F.col("__abtt.t") * w,
    )
    return staged.withColumn(out_col, out).drop("__abtt")
