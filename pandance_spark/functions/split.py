"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is nondeterministic across partitionings; training-data
pipelines need splits that are stable across runs, engines and cluster
sizes — a pure function of the row's key.  ``hash_split_bucket`` maps a
key column to a bucket in [0, buckets) via md5 (portable: the DuckDB /
any-engine oracle computes the identical bucket), so "bucket < 80" is a
stable 80/20 train split.

For the hot path, ``hash_split_bucket_fast`` uses xxhash64 — cheaper,
engine-specific (no cross-engine oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_split_bucket",
    "hash_split_bucket_fast",
    "split_train_test",
    "cap_per_group",
    "stratified_sample",
    "pack_documents",
    "emit_packs",
    "interleave_sources",
    "length_buckets",
    "chunk_documents",
    "temperature_sample",
    "exact_sample",
    "epoch_mixture",
    "shuffle_shards",
    "token_budget_cap",
    "weighted_sample",
    "mixture_rates",
    "temperature_shares",
    "temperature_rates",
    "weighted_sample_per_group",
]


def hash_split_bucket(key: Column, buckets: int = 100) -> Column:
    """Portable deterministic bucket in [0, buckets): the first 8 hex
    chars of md5(key) parsed as an integer, mod buckets.  Identical in
    any engine with md5 + string ops (the DuckDB oracle recomputes it)."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_split_bucket_fast(key: Column, buckets: int = 100, seed: int = 42) -> Column:
    """xxhash64 variant — faster, engine-specific."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(buckets))


def cap_per_group(df, group_cols, n: int, key_col: str):
    """Keep at most ``n`` rows per group, chosen deterministically by
    hash order of ``key_col`` (an unbiased, stable "random" sample —
    the standard cap for over-represented domains/languages in a
    training corpus).  One shuffle on the group key; rows beyond the
    cap are dropped before they'd ever be materialized downstream."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_sample(
    df,
    strata_col: str,
    rates: dict,
    key_col: str,
    default_rate: float = 0.0,
):
    """Deterministic stratified sampling: keep each row with its
    stratum's rate, decided by the row's portable hash bucket — the
    standard rebalancing move for over/under-represented languages or
    sources in a training corpus.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed use ``default_rate``.  Selection is a pure function of
    ``key_col`` (md5 bucket in [0, 10000)), so the sample is identical
    across runs, engines, partitionings and cluster sizes, and the same
    key is kept or dropped consistently across strata-preserving
    re-processing.  Pure per-row filter — no shuffle, fully pushed into
    the scan pipeline.
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    bucket = hash_split_bucket(F.col(key_col), 10000)
    cut = F.lit(int(round(default_rate * 10000)))
    for stratum, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(stratum),
            F.lit(int(round(rate * 10000))),
        ).otherwise(cut)
    return df.filter(bucket < cut)


def pack_documents(
    df,
    key_col: str,
    size_col: str,
    budget: int,
    n_buckets: int = 1024,
):
    """Assign documents to token-budget packs — the grouping step of
    sequence packing for training batches.

    Within each of ``n_buckets`` deterministic hash buckets, documents
    are ordered by ``key_col`` and packed by running token total:
    ``pack = floor(exclusive_cumsum / budget)``.  Packs average to the
    budget; a boundary document may straddle into the next multiple
    (the standard approximate packing — exact greedy packing is a
    sequential scan, which cannot scale past one partition).

    Output adds ``pack_bucket`` and ``pack_id``; a pack is identified
    by (pack_bucket, pack_id).  Work: ONE shuffle (window over the
    bucket), parallel across buckets — at 100 TB pick ``n_buckets`` >>
    cores so buckets stay memory-sized.

    ``key_col`` must be unique per row: the running total orders by it,
    and duplicate keys would make pack assignment nondeterministic
    across runs/partitionings.
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    bucket = hash_split_bucket(F.col(key_col), n_buckets)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("pack_bucket", bucket)
        .withColumn(
            "pack_id",
            F.floor(
                F.coalesce(F.sum(F.col(size_col)).over(w), F.lit(0))
                / F.lit(budget)
            ),
        )
    )


def split_train_test(df, key_col: str, train_fraction: float = 0.8):
    """(train_df, test_df) split deterministically by ``key_col``.

    Rows with the same key always land in the same side — the property
    that prevents train/test leakage of near-identical records sharing
    a key (url, doc id, user id)."""
    if not 0.0 < train_fraction < 1.0:
        raise ValueError("train_fraction must be in (0, 1)")
    bucket = hash_split_bucket(F.col(key_col), 1000)
    cut = int(train_fraction * 1000)
    return df.filter(bucket < cut), df.filter(bucket >= cut)


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
    overlap: int = 16,
):
    """Split documents into overlapping token-budgeted chunks — the
    windowing step that turns variable-length documents into
    training-window-sized pieces.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)``
    with ``stride = max_tokens - overlap``; the last chunk may be
    shorter but always retains at least ``overlap`` carried tokens.
    Documents whose token count fits one window yield exactly one
    chunk; documents with zero tokens yield none.

    Output: ``(id_col, chunk_id, chunk_text, n_tokens)``.  Pure
    per-row Column work (tokenize -> sequence -> explode -> slice ->
    join): no shuffle, no UDF — at 100 TB this is a flat map fused
    into the scan.
    """
    from pandance_spark.functions.text import tokenize

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    toks = df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.when(F.col("__n") <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(stride)).cast("int"),
        )
    )
    # sequence(0, -1) would COUNT DOWN (Spark infers step -1), so the
    # zero-chunk case must be an empty array, not an empty sequence
    ids = F.when(
        F.col("__nc") > 0, F.sequence(F.lit(0), F.col("__nc") - 1)
    ).otherwise(F.array().cast("array<int>"))
    exploded = toks.withColumn("__nc", n_chunks).select(
        id_col,
        "__toks",
        F.explode(ids).alias("chunk_id"),
    )
    chunk_toks = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(chunk_toks, " ").alias("chunk_text"),
        F.size(chunk_toks).alias("n_tokens"),
    )


def temperature_sample(
    df,
    domain_col: str,
    key_col: str,
    target_rows: int,
    alpha: float = 0.5,
):
    """Deterministic temperature-based domain rebalancing: sample
    ~``target_rows`` rows with per-domain quotas proportional to
    ``n_domain ** alpha`` — the multilingual/multi-source mixing rule
    (alpha < 1 flattens the distribution, up-weighting rare domains;
    alpha = 1 is proportional, alpha = 0 uniform-over-domains).

    Each domain's keep rate is ``min(1, target_rows * w_d / (sum_w *
    n_d))`` with ``w_d = n_d ** alpha``; rows are kept by their
    portable md5 hash bucket (``hash_split_bucket``), so membership is
    a pure function of the row key — stable across runs, engines and
    cluster sizes, and an independent engine reproduces the exact row
    set.  With ``alpha = 0.5`` the weight is computed via ``sqrt``
    (IEEE correctly-rounded, hence bit-identical in any engine);
    other alphas go through ``pow``, where a last-ulp divergence
    between libm implementations is theoretically possible on rate
    boundaries.

    Plan: one small per-domain count agg, its 1-row weight total
    broadcast back over the counts, and a broadcast join of the tiny
    (domain, rate) table onto the corpus — the 100 TB side is filtered
    in its scan stage and never shuffles.  Actual sample size deviates
    from ``target_rows`` only by per-domain hash granularity
    (binomial-like, ~sqrt(n) per domain).

    A NULL domain is treated as its own stratum (null-safe join).
    Rows with a NULL ``key_col`` have no hash bucket and are dropped —
    use a non-null row key.
    """
    if target_rows < 1:
        raise ValueError("target_rows must be >= 1")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    # domains-sized, but derived from a full corpus scan; it feeds both
    # the weight total and the rate table — checkpoint to scan once
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    w = (
        F.sqrt(F.col("__n"))
        if alpha == 0.5
        else F.pow(F.col("__n"), F.lit(float(alpha)))
    )
    weighted = counts.withColumn("__w", w)
    total = weighted.agg(F.sum("__w").alias("__tw"))
    rates = (
        weighted.crossJoin(F.broadcast(total))
        .select(
            domain_col,
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.col("__w")
                / (F.col("__tw") * F.col("__n")),
            ).alias("__rate"),
        )
    )
    bucket = hash_split_bucket(F.col(key_col), 1_000_000)
    # null-safe join: a NULL domain is a real stratum ("unknown
    # source" is common in scraped metadata) — a plain equi-join would
    # silently drop those rows while their count still deflated every
    # other domain's rate through the weight total
    rates = rates.withColumnRenamed(domain_col, "__dom")
    return (
        df.join(
            F.broadcast(rates),
            F.col(domain_col).eqNullSafe(F.col("__dom")),
            "inner",
        )
        .filter(bucket < F.col("__rate") * 1_000_000)
        .select(*df.columns)
    )


def exact_sample(df, key_col: str, n: int):
    """Exactly ``min(n, count)`` rows, chosen deterministically by md5
    hash order of ``key_col`` — a fixed-SIZE companion to the
    rate-based samplers (``stratified_sample``/``temperature_sample``
    hit a target only in expectation; eval sets and debugging slices
    often need an exact count).  Hash order makes the selection an
    unbiased, stable "random" sample: the same keys are chosen on
    every run, on any engine, at any partitioning, and adding new rows
    only perturbs the selection where new hashes displace old ones.

    Plan: ``orderBy(md5(key), key).limit(n)`` compiles to
    TakeOrderedAndProject — each partition keeps its local top-n by
    hash and the driver merges k*n candidate rows; no global sort
    shuffle, so it survives any corpus size with driver memory O(n).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    return df.orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    ).limit(n)


def epoch_mixture(
    df,
    domain_col: str,
    key_col: str,
    epochs: dict,
    default: float = 1.0,
):
    """Fractional-EPOCH mixing: replicate or thin each domain by a
    real-valued epoch count — the data recipe knob of LLaMA/GPT-style
    training mixes ("Wikipedia x 2.5, CommonCrawl x 0.67").  A row in
    a domain with epoch ``e`` appears ``floor(e)`` times, plus once
    more for the deterministic md5 fraction of rows selected at rate
    ``frac(e)`` — so ``e = 0.3`` is a 30% downsample, ``e = 2.5``
    emits every row twice and half the rows a third time.  Appends an
    ``epoch`` column (1..copies) so downstream shuffling can interleave
    replicas instead of streaming each epoch back-to-back.

    Determinism and portability: epochs are converted to integer
    micro-units in the DRIVER (no float row math); the fractional
    membership is the portable md5 bucket of ``key_col`` — the same
    row is replicated the same number of times on any engine, run or
    partitioning, and an oracle reproduces the exact multiset.

    Scale plan: pure projection + ``explode`` — the corpus never
    shuffles; replication multiplies bytes exactly by the mixture
    weight, and the per-row copy count is bounded by max(epochs).
    Unlisted domains take ``default``.  NULL domains take ``default``
    (match them explicitly via a key in ``epochs`` is not supported —
    CASE on NULL never matches).  Rows with NULL ``key_col`` have no
    hash bucket: their fractional copy never fires (they still get
    ``floor(e)`` copies).
    """
    if any(e < 0 for e in epochs.values()) or default < 0:
        raise ValueError("epoch counts must be >= 0")
    unit = 1_000_000
    micro = {d: round(e * unit) for d, e in epochs.items()}
    dmicro = round(default * unit)
    e_micro = F.lit(dmicro)
    for d, m in micro.items():
        e_micro = F.when(F.col(domain_col) == d, F.lit(m)).otherwise(e_micro)
    whole = (e_micro / unit).cast("long")  # floor: micro-units / 1e6
    frac = e_micro - whole * unit
    # coalesce: a NULL key has no hash bucket, so the comparison is
    # NULL — without the coalesce `copies` would be NULL and the row
    # silently DROPPED instead of getting its floor(e) copies
    extra = F.coalesce(
        (hash_split_bucket(F.col(key_col), unit) < frac).cast("long"),
        F.lit(0),
    )
    copies = (whole + extra).alias("__copies")
    out = df.withColumn("__copies", copies)
    return (
        out.filter(F.col("__copies") >= 1)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(1), F.col("__copies").cast("int"))),
        )
        .drop("__copies")
    )


def shuffle_shards(df, key_col: str, n_shards: int, seed: int = 42):
    """Deterministic GLOBAL training-order shuffle: every row gets a
    ``(shard, pos)`` address that is a pure function of its key — the
    "shuffle the corpus before training" step, reproducible across
    runs, engines, cluster sizes and partitionings (``orderBy(rand())``
    is none of those).

    ``shard`` is the first-8-hex md5 bucket of ``seed:key`` mod
    ``n_shards`` (balanced in expectation); ``pos`` is the row's
    0-based rank WITHIN its shard ordered by the full md5 hex (key as
    tie-break).  Reading shards in index order, each sorted by pos,
    replays one fixed pseudo-random permutation of the corpus.

    Scale plan: ONE shuffle (the per-shard rank window).  A single
    global rank would serialize on one reducer; per-shard ranking
    keeps every reducer at ~N/n_shards rows — ``n_shards`` is the
    parallelism knob, so pick it to make a shard fit a task (training
    shards want that anyway).  To materialize:
    ``out.repartition("shard").sortWithinPartitions("pos")`` then
    ``partitionBy("shard")`` on write.

    NULL keys hash as the empty string (deterministic, never dropped).
    The md5 order is portable — the DuckDB oracle replays the exact
    permutation.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ks = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    h = F.md5(F.concat(F.lit(f"{seed}:"), ks))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    out = df.withColumn("__ss_h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(
        F.col("__ss_h").asc(), F.col(key_col).asc_nulls_first()
    )
    return out.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__ss_h")


def token_budget_cap(
    df,
    group_col: str,
    budgets,
    key_col: str,
    tokens_col: Column,
):
    """Cap each group at a TOKEN budget instead of a document count —
    the unit data recipes are actually written in ("40B tokens of
    code, 5B of forum text").  Documents are admitted in deterministic
    md5(key) order until the group's cumulative token count would
    exceed its budget; the first document that would cross the line
    (and everything after it in hash order) is dropped.

    ``budgets`` is an int (every group gets the same budget) or a dict
    mapping group value -> budget; groups absent from the dict are NOT
    capped.  ``tokens_col`` is any integer Column (a token-count
    expression or a precomputed column), evaluated in the same pass;
    a NULL token count is treated as 0 (the row is admitted and
    consumes no budget — without the coalesce a leading NULL would
    poison the running sum and silently drop rows even from uncapped
    groups).

    One shuffle on the group key (the running-sum window); selection
    is a pure function of (key, tokens), so the same corpus yields the
    same sample on any engine, partitioning or cluster size.  At
    100 TB the window's per-group sort is the cost — the same shape as
    cap_per_group, with skewed groups bounded by the budget itself.
    """
    if isinstance(budgets, bool):
        raise ValueError("budgets must be an int or a dict")
    if isinstance(budgets, int):
        if budgets < 0:
            raise ValueError("budget must be >= 0")
        cut = F.lit(budgets)
    elif isinstance(budgets, dict):
        cut = F.lit(None).cast("long")
        for g, b in sorted(budgets.items()):
            if b < 0:
                raise ValueError(f"budget for {g!r} must be >= 0")
            cut = F.when(F.col(group_col) == F.lit(g), F.lit(b)).otherwise(cut)
    else:
        raise ValueError("budgets must be an int or a dict")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    cum = F.sum("__tokens").over(w)
    return (
        df.withColumn("__tokens", F.coalesce(tokens_col.cast("long"), F.lit(0)))
        .withColumn("__cum", cum)
        .filter(F.col("__cum") <= F.coalesce(cut, F.col("__cum")))
        .drop("__tokens", "__cum")
    )


def weighted_sample(df, key_col: str, weight_col: Column, k: int):
    """Weighted sampling WITHOUT replacement: ``k`` rows where each
    row's inclusion odds are proportional to its weight — the
    Efraimidis-Spirakis A-ES scheme (Inf. Proc. Letters 97(5), 2006):
    draw u ~ U(0,1) per row, rank by u^(1/w), keep the top k.  The
    curation move for "sample 1M docs, longer/higher-quality ones
    more often" where stratified rates are too coarse.

    Deterministic: u is the portable md5 fraction of the key
    ((bucket + 0.5) / 2^32 — never 0 or 1), and the rank key is the
    GUMBEL form of the A-ES order, ``ln(w) - ln(-ln(u))`` (monotone in
    u^(1/w)), snapped to integer MICRO-units with ties broken by key —
    the same sample on any engine, partitioning or cluster size, and
    reproducible run-over-run.  The log-space key is the part that
    makes the snap SCALE-FREE: rescaling every weight by c shifts all
    keys by the same ln(c), so relative odds survive the snap at any
    weight magnitude (snapping ln(u)/w directly would collapse large
    weights onto a handful of integers and overflow on tiny ones),
    and the key is bounded by |ln w| + 23, so the long cast can never
    overflow for finite positive w.  Rows with non-positive, NaN,
    infinite or NULL weight are excluded (zero-weight rows must never
    win; non-finite weight is malformed input, not a lottery ticket).

    Plan: pure per-row projection + ``TakeOrderedAndProject`` (top-k
    without a global sort) — one scan, no shuffle beyond the k-row
    gather.  At 100 TB the cost is the scan itself.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = weight_col.cast("double")
    # ln(w) + standard Gumbel noise from u; LARGER is better
    rank_key = F.round(
        (F.log(w) - F.log(-F.log(u))) * 1_000_000
    ).cast("long")
    finite = (
        w.isNotNull()
        & ~F.isnan(w)
        & (w > 0)
        & (w < F.lit(float("inf")))
    )
    return (
        df.withColumn("__es_key", rank_key)
        .filter(finite)
        .orderBy(F.col("__es_key").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__es_key")
    )


def mixture_rates(available: dict, targets: dict, budget: int) -> dict:
    """Solve a data recipe: given per-source AVAILABLE token counts
    and TARGET mixture shares (fractions summing to <= 1), return the
    per-source keep rate that hits ``budget`` tokens at the target
    proportions — ``rate_s = min(1, targets_s * budget /
    available_s)``.  A rate that clips at 1 means the source cannot
    fill its share (the standard under-supply situation for
    high-quality sources); the caller sees it directly in the
    returned dict and can re-weight.

    Pure driver-side arithmetic over a sources-sized dict (the
    per-source counts come from one map-side-combined aggregate —
    sources are few by construction).  Feed the result to
    ``stratified_sample`` (rates are exactly its contract) for a
    zero-shuffle deterministic apply.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    unknown = set(targets) - set(available)
    if unknown:
        raise ValueError(f"targets reference unknown sources: {sorted(unknown)}")
    total_share = sum(targets.values())
    if total_share > 1 + 1e-9 or any(v < 0 for v in targets.values()):
        raise ValueError("target shares must be >= 0 and sum to <= 1")
    rates = {}
    for s, share in targets.items():
        n = available[s]
        if n < 0:
            raise ValueError(f"available[{s!r}] must be >= 0")
        rates[s] = 1.0 if n == 0 else min(1.0, share * budget / n)
    return rates


def temperature_shares(available: dict, alpha: float) -> dict:
    """Temperature-scaled mixture shares (mT5 arXiv:2010.11934 §3.1 /
    XLM-R arXiv:1911.02116 §3.1): sample source ``s`` with probability
    ``p_s ∝ n_s^alpha``.  ``alpha=1`` is proportional-to-size (big
    sources dominate), ``alpha=0`` is uniform (small sources
    over-sampled); production multilingual recipes sit at 0.2-0.7.

    This is the TOKEN-budget solver counterpart of
    :func:`temperature_sample` (which applies row quotas fully
    in-plan): recipes are written in tokens, and the dict form
    composes with :func:`mixture_rates` / :func:`stratified_sample` /
    ``epoch_mix``.  Pure driver-side arithmetic over the sources-sized
    dict.  Sources
    with zero available tokens get share 0 (they cannot contribute).
    Feed the result to :func:`mixture_rates` to turn shares + a token
    budget into per-source keep rates.
    """
    if not 0 <= alpha <= 1:
        raise ValueError("alpha must be in [0, 1]")
    if any(n < 0 for n in available.values()):
        raise ValueError("available counts must be >= 0")
    pw = {s: float(n) ** alpha for s, n in available.items() if n > 0}
    z = sum(pw.values())
    return {s: (pw.get(s, 0.0) / z if z else 0.0) for s in available}


def temperature_rates(available: dict, alpha: float, budget: int) -> dict:
    """:func:`temperature_shares` composed with :func:`mixture_rates`:
    the complete mT5-style recipe solve from per-source token counts
    to per-source keep rates for a ``budget``-token mixture.  Clipped
    rates (exactly 1.0) mark sources whose temperature share exceeds
    what they can supply — the standard signal to either re-weight or
    allow repetition (see ``epoch_mix`` for fractional epochs).
    Zero-available sources get rate 0.0 (their share is 0 — they are
    EMPTY, not under-supplied, and must not trip the clip signal or
    keep their token-less rows).
    """
    shares = temperature_shares(available, alpha)
    nonempty = {s: n for s, n in available.items() if n > 0}
    rates = mixture_rates(
        nonempty, {s: shares[s] for s in nonempty}, budget
    )
    return {s: rates.get(s, 0.0) for s in available}


def weighted_sample_per_group(
    df, group_cols, key_col: str, weight_col: Column, k: int
):
    """:func:`weighted_sample` within each group: ``k`` rows per group
    with inclusion odds proportional to weight (per-language /
    per-domain weighted picks).  Same Gumbel-form md5 rank key —
    scale-free, engine-portable, deterministic — ranked by a window
    per group instead of a global top-k.  ONE shuffle on the group
    key, the cap_per_group cost class.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = weight_col.cast("double")
    rank_key = F.round((F.log(w) - F.log(-F.log(u))) * 1_000_000).cast("long")
    finite = w.isNotNull() & ~F.isnan(w) & (w > 0) & (w < F.lit(float("inf")))
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("__es_key").desc(), F.col(key_col).asc()
    )
    return (
        df.filter(finite)
        .withColumn("__es_key", rank_key)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__es_key", "__rn")
    )


def emit_packs(df, key_col: str, size_col: str, budget: int, n_buckets: int = 1024):
    """Materialize TRAINING PACKS from :func:`pack_documents`
    assignments: one row per (pack_bucket, pack_id) carrying the
    key-ordered document list and the boundary metadata a
    packed-sequence trainer consumes — ``doc_ids``, per-doc ``sizes``,
    EXCLUSIVE ``offsets`` (where each document starts inside the
    pack's token stream; the attention-mask reset points),
    ``n_docs``, ``total_tokens`` and ``fill`` (total/budget, 9 dp;
    boundary documents may straddle past 1.0 — the documented
    approximate-packing contract).

    One groupBy on the pack key after pack_documents' single window
    shuffle; the collect_list is pack-bounded (~budget tokens), never
    corpus-bounded.  Offsets come from ONE linear fold over the sizes
    (struct accumulator), not a per-index re-sum.
    """
    packed = pack_documents(df, key_col, size_col, budget, n_buckets)
    entries = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(key_col).alias("k"),
                F.col(size_col).cast("long").alias("s"),
            )
        )
    )
    g = packed.groupBy("pack_bucket", "pack_id").agg(
        entries.alias("__e")
    )
    sizes = F.transform(F.col("__e"), lambda e: e["s"])
    offs = F.aggregate(
        sizes,
        F.struct(
            F.array().cast("array<bigint>").alias("offs"),
            F.lit(0).cast("long").alias("run"),
        ),
        lambda acc, s: F.struct(
            F.concat(acc["offs"], F.array(acc["run"])).alias("offs"),
            (acc["run"] + s).alias("run"),
        ),
    )
    return g.select(
        "pack_bucket",
        "pack_id",
        F.size("__e").cast("long").alias("n_docs"),
        F.transform(F.col("__e"), lambda e: e["k"]).alias("doc_ids"),
        sizes.alias("sizes"),
        offs["offs"].alias("offsets"),
        offs["run"].alias("total_tokens"),
        F.round(offs["run"] / F.lit(float(budget)), 9).alias("fill"),
    )


def interleave_sources(df, source_col: str, key_col: str):
    """Deterministic SOURCE-INTERLEAVED training order: rank rows
    within each source by ``key_col``, then order globally by
    (rank, source) — round-robin across sources, so a consumer
    reading packs/shards in ``order_idx`` order sees every source at
    its natural proportion from the first batch onward instead of
    source-sized runs (the classic mixing failure when datasets are
    concatenated).  Adds ``source_rank`` (0-based within source) and
    ``order_idx`` (0-based global).

    Two windows: one partitioned shuffle on source (rank), one global
    rank over (rank, source).  The global window is the honest cost —
    a total training order IS a total order; at 100 TB assign
    ``order_idx`` per (rank-block, source) arithmetic instead when
    sources have known sizes, or write ``sort_within_partitions``
    shards keyed by (rank, source) and let the consumer merge.
    ``key_col`` must be unique within a source (same contract as
    pack_documents).
    """
    from pyspark.sql.window import Window

    ws = Window.partitionBy(source_col).orderBy(F.col(key_col))
    ranked = df.withColumn(
        "source_rank", (F.row_number().over(ws) - 1).cast("long")
    )
    wg = Window.orderBy(F.col("source_rank"), F.col(source_col))
    return ranked.withColumn(
        "order_idx", (F.row_number().over(wg) - 1).cast("long")
    )


def interleave_shards(df, source_col: str, key_col: str):
    """:func:`interleave_sources` WITHOUT the global window — the
    100 TB form its docstring promises.  Semantics are identical
    (same ``source_rank``/``order_idx``, pinned by the oracle replay
    of the two-window definition); the total order is computed in
    CLOSED FORM from the per-source sizes:

        order_idx(r, s) = Σ_s' min(size_s', r)          (full rounds)
                        + |{s' < s : size_s' > r}|      (this round)

    One tiny aggregate collects the per-source sizes (bounded by the
    number of SOURCES, not rows — training mixes have tens), which
    ride back in as a constant-folded literal; the per-row index is
    then a pure map-side fold over that literal.  Total shuffle: the
    per-source rank window only — the single-partition global
    row_number that serializes interleave_sources at scale is gone.
    """
    import json

    from pyspark.sql import types as _T
    from pyspark.sql.window import Window

    # the size table rides in as a JSON string literal and the
    # "earlier source" test compares against it — only STRING sources
    # keep their ordering through that encoding ("10" < "9" for ints)
    if not isinstance(df.schema[source_col].dataType, _T.StringType):
        raise ValueError(
            f"interleave_shards requires a string source column; "
            f"{source_col!r} is {df.schema[source_col].dataType.simpleString()} "
            f"(cast it, or use interleave_sources)"
        )
    sizes = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(source_col).alias("__s"))
        .agg(F.count("*").alias("__n"))
        .collect()
    }
    # NULL is a legitimate source partition for interleave_sources
    # (window semantics: its own group, sorting FIRST under Spark's
    # ASC nulls-first) — the closed form must agree, so the size
    # table carries it as a null struct field and the "earlier
    # source this round" test below is null-aware
    table = [
        {"s": s, "n": int(sizes[s])}
        for s in sorted(sizes, key=lambda x: (x is not None, x))
    ]
    lit = F.from_json(
        F.lit(json.dumps(table)), "array<struct<s:string,n:bigint>>"
    )
    ws = Window.partitionBy(source_col).orderBy(F.col(key_col))
    ranked = df.withColumn(
        "source_rank", (F.row_number().over(ws) - 1).cast("long")
    )
    r = F.col("source_rank")
    s = F.col(source_col)
    full_rounds = F.aggregate(
        lit,
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.least(e["n"], r),
    )
    this_round = F.aggregate(
        lit,
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + F.when(
            # e.s sorts before s under ASC nulls-first: NULL beats
            # any non-null; two NULLs are the same group (not before)
            (
                (e["s"].isNull() & s.isNotNull())
                | (e["s"].isNotNull() & s.isNotNull() & (e["s"] < s))
            )
            & (e["n"] > r),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return ranked.withColumn("order_idx", full_rounds + this_round)


def length_buckets(
    df,
    key_col: str,
    size_col: str,
    batch_size: int,
    min_bucket: int = 5,
):
    """Length-bucketed BATCHING for inference/scoring runs: assign each
    row a power-of-two length bucket (``len_bucket = max(ceil(log2(
    size)), min_bucket)`` — exact at powers of two in any IEEE engine)
    and a deterministic ``batch_id`` within the bucket (key order,
    ``batch_size`` rows per batch).  Batching similar lengths together
    is the standard padding-waste fix: a batch pads to ITS OWN max,
    not the corpus max, so bucket width bounds waste at ~2x worst
    case.  Sizes < 1 (empty docs) land in the minimum bucket.

    One window shuffle on the bucket key; at 100 TB add a hash
    sub-bucket below the window (the ``pack_documents`` pattern) so no
    single bucket serializes through one partition.  ``key_col`` must
    be unique (same determinism contract as pack_documents).
    """
    from pyspark.sql.window import Window

    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    s = F.greatest(F.col(size_col).cast("double"), F.lit(1.0))
    bucket = F.greatest(
        F.ceil(F.log2(s)), F.lit(int(min_bucket))
    ).cast("long")
    w = Window.partitionBy("len_bucket").orderBy(F.col(key_col))
    return (
        df.withColumn("len_bucket", bucket)
        .withColumn(
            "batch_id",
            F.floor(
                (F.row_number().over(w) - 1) / F.lit(int(batch_size))
            ).cast("long"),
        )
    )


def fair_share_alloc(df, group_col: str, demand_col: str, budget):
    """Max-min fair (water-filling) allocation of ``budget`` across
    groups with the given demands — the crawl-politeness / per-source
    quota shape: every group gets its full demand if affordable,
    otherwise the budget's water level ``L`` (all unsaturated groups
    get the SAME amount, the defining max-min property).

    Closed form over the demand table sorted ascending (ties by
    group): group at rank ``r`` is saturated iff
    ``prefix(r-1) + d_r * (n - r + 1) <= budget`` (serving everyone
    from it onward at its demand still fits); with ``r*`` the largest
    saturated rank, ``L = (budget - prefix(r*)) / (n - r*)``.  The
    saturation test runs in decimal(38,0) — long demands times group
    counts overflow int64 exactly in the 100 TB regime this targets —
    and only the final level is one double division, replayed in the
    same operation order by the oracle.

    The global sort window runs over the DEMAND table (one row per
    group, post-aggregation cardinality), not the corpus — same
    honest-total-order class as ``interleave_sources``.  Returns
    ``(group, demand, alloc)``; negative budgets allocate 0.
    """
    from pyspark.sql import Window

    b_dec = F.lit(int(budget)).cast("decimal(38,0)")
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    w_ord = Window.orderBy("demand", "group")
    w_all = Window.partitionBy()
    d_dec = F.col("demand").cast("decimal(38,0)")
    ranked = base.select(
        "group",
        "demand",
        F.row_number().over(w_ord).alias("rn"),
        F.sum(d_dec)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pfx"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).withColumn(
        "sat",
        d_dec * (F.col("n") - F.col("rn") + 1)
        + (F.col("pfx") - d_dec)
        <= b_dec,
    )
    lvl = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("sat"), F.struct("rn", "pfx"))),
            F.struct(
                F.lit(0).alias("rn"),
                F.lit(0).cast("decimal(38,0)").alias("pfx"),
            ),
        ).alias("s"),
        F.count(F.lit(1)).alias("n_all"),
    ).select(
        F.when(
            F.col("n_all") > F.col("s.rn"),
            (b_dec.cast("double") - F.col("s.pfx").cast("double"))
            / (F.col("n_all") - F.col("s.rn")).cast("double"),
        ).alias("lvl")
    )
    return ranked.crossJoin(F.broadcast(lvl)).select(
        "group",
        "demand",
        F.when(F.col("sat"), F.col("demand").cast("double"))
        .otherwise(
            F.round(F.greatest(F.col("lvl"), F.lit(0.0)), 9)
        )
        .alias("alloc"),
    )
