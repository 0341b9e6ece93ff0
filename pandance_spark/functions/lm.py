"""N-gram language-model scoring for corpus quality filtering.

Extension surface (SURVEY.md §2.4 — text analysis).  Perplexity under
a simple LM trained on a trusted corpus is the classic
training-data quality signal (the CCNet / KenLM-filter recipe): text
whose token distribution diverges from the reference — gibberish,
boilerplate floods, wrong-language spans — scores high cross-entropy
and is dropped or down-weighted.  A unigram model with add-k smoothing
keeps the whole thing exact, engine-portable relational algebra (no
model binary, no UDF) while preserving the signal's shape; the
reference engine has no analog (pandance is joins-only), so this is
pure extension surface.

Spark-first shape
-----------------
Training is one tokenize projection + explode + hash aggregation with
map-side partial combine (shuffle carries one partial count per
(token, input partition), never raw tokens).  Scoring re-explodes the
docs, equi-joins token counts, and averages -log2 p per document — one
shuffle on doc id.  The (N, V) totals are a single broadcast row.  At
100 TB the count table is vocabulary-sized; cap it with ``vocab_size``
(top-V by frequency, OOV falls into the smoothing bucket) to keep the
probability table broadcastable no matter how large the corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandance_spark.functions.text import tokenize

__all__ = [
    "oov_stats",
    "vocab_coverage_curve",
    "ppl_buckets",
    "unigram_counts",
    "lm_cross_entropy",
    "bigram_counts",
    "lm_cross_entropy_bigram",
    "lm_cross_entropy_kn",
]


def unigram_counts(
    docs: DataFrame, text_col: str, vocab_size: Optional[int] = None
) -> DataFrame:
    """Token frequency table ``(token, cnt)`` over a corpus.

    ``vocab_size`` keeps only the top-V tokens by count (ties broken by
    token string, so the truncation is deterministic and an independent
    engine reproduces it exactly); everything else becomes out-of-
    vocabulary at scoring time and is absorbed by the smoothing bucket.
    The cap is what keeps the model broadcastable when the training
    corpus is 100 TB: V is a constant, corpus size only sharpens the
    counts.  ``orderBy + limit`` compiles to TakeOrderedAndProject —
    per-partition top-V and a driver-side merge, no global sort.
    """
    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if vocab_size is not None:
        if vocab_size < 1:
            raise ValueError("vocab_size must be >= 1")
        counts = counts.orderBy(
            F.col("cnt").desc(), F.col("token").asc()
        ).limit(vocab_size)
    return counts


def lm_cross_entropy(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    counts: Optional[DataFrame] = None,
    add_k: float = 1.0,
    carry=(),
) -> DataFrame:
    """Per-document cross-entropy (and perplexity) under an add-k
    unigram LM.

    ``counts`` is a ``(token, cnt)`` table from :func:`unigram_counts`
    — typically trained on a TRUSTED reference corpus and reused to
    score candidate data; omitted, the model is fit on ``docs`` itself
    (self-perplexity: outlier documents within a corpus).  With
    ``N = sum(cnt)`` and ``V`` the vocabulary size, each token scores

        p(t) = (c(t) + k) / (N + k * (V + 1))

    — add-k smoothing over the vocabulary plus ONE out-of-vocabulary
    bucket (c = 0 for unseen tokens), so cross-corpus scoring is
    well-defined.  Returns ``(id_col, n_tokens, cross_entropy,
    perplexity)``: cross_entropy = mean -log2 p(t) in bits/token,
    perplexity = 2^cross_entropy, both rounded to 6 decimals.
    Documents with zero tokens are omitted (no distribution to score).

    The count join is left-outer (OOV must survive to be smoothed) and
    broadcast — the vocabulary table is small by construction, so the
    exploded 100 TB token stream never shuffles for it; the only wide
    shuffle is the per-document average, with map-side partial combine.

    ``carry``: extra per-document columns (constant per id — e.g. a
    language key) carried THROUGH the scoring aggregate via first(),
    so downstream grouping needs no rejoin against the corpus (a
    rejoin would rescan the table and add a join shuffle).
    """
    if add_k <= 0:
        raise ValueError("add_k must be > 0 (unsmoothed zeros diverge)")
    if counts is None:
        # the count table feeds BOTH broadcasts below (totals + the
        # token join); un-staged, each would re-run the full corpus
        # tokenize + count — checkpoint the vocab-sized result once
        counts = unigram_counts(docs, text_col).localCheckpoint(eager=True)
    totals = counts.agg(
        F.sum("cnt").alias("__N"), F.count(F.lit(1)).alias("__V")
    )
    # internals are __-prefixed (repo convention) so an id_col named
    # 'token' or 'cnt' cannot collide with the model columns
    model = counts.select(
        F.col("token").alias("__token"), F.col("cnt").alias("__cnt")
    )
    carry = list(carry)
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(tokenize(F.col(text_col))).alias("__token"),
    )
    scored = (
        toks.join(F.broadcast(model), "__token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            *carry,
            (
                -F.log2(
                    (F.coalesce(F.col("__cnt"), F.lit(0)) + F.lit(add_k))
                    / (F.col("__N") + F.lit(add_k) * (F.col("__V") + 1))
                )
            ).alias("__bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in carry],
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__bits"), 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.avg("__bits")), 6).alias("perplexity"),
    )


_BOS = "<s>"  # cannot collide: tokenize() emits only [a-z0-9]+ tokens


def _bigram_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, token) pairs per document — the previous token is
    computed INSIDE the token array (shift + zip) before exploding, so
    deriving contexts needs no per-document window/shuffle; the first
    token's context is the ``<s>`` sentinel."""
    toks = tokenize(F.col(text_col))
    # empty docs must yield an EMPTY prev array, not ['<s>'] —
    # arrays_zip pads to the longer input, which would fabricate a
    # (prev='<s>', token=NULL) pair for zero-token documents
    prevs = F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.concat(
            F.array(F.lit(_BOS)),
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        )
    )
    return docs.select(
        F.col(id_col),
        F.explode(F.arrays_zip(prevs.alias("prev"), toks.alias("token"))).alias(
            "__pair"
        ),
    ).select(
        id_col,
        F.col("__pair.prev").alias("__prev"),
        F.col("__pair.token").alias("__token"),
    )


def bigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Bigram frequency table ``(prev, token, cnt)`` with a ``<s>``
    document-start context.  Size is O(observed pairs), not |V|² —
    natural text keeps it a few times the unigram vocabulary, still
    broadcastable; one hash aggregation with map-side combine."""
    return (
        _bigram_pairs(docs.select(F.lit(0).alias("__id"), text_col), "__id", text_col)
        .groupBy(
            F.col("__prev").alias("prev"), F.col("__token").alias("token")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_cross_entropy_bigram(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: Optional[DataFrame] = None,
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document cross-entropy under an add-k BIGRAM LM — the
    context-sensitive upgrade of :func:`lm_cross_entropy` (closer to
    the KenLM models the CCNet recipe actually uses): token t after
    context p scores

        p(t | p) = (c(p, t) + k) / (c_ctx(p) + k * (V + 1))

    with ``c_ctx(p) = sum_t c(p, t)`` derived from the bigram table
    itself (so contexts and numerators are always consistent), ``V``
    the distinct-token vocabulary, and one OOV slot as in the unigram
    form.  Unseen contexts back off to pure smoothing mass — exact,
    deterministic, engine-reproducible.

    Returns the same schema as :func:`lm_cross_entropy`.  Both count
    joins are broadcast; the only wide shuffle is the per-document
    average.
    """
    if add_k <= 0:
        raise ValueError("add_k must be > 0 (unsmoothed zeros diverge)")
    if bigrams is None:
        # r12 (guide §2.4): training and scoring derive from the SAME
        # (id, prev, token) pair stream — checkpoint it once, so the
        # tokenize + bigram explode runs ONE corpus pass instead of
        # one per phase (bigram_counts is definitionally the groupBy
        # count of this very stream; the doc id is not in its keys, so
        # the trained table is identical).  The model aggregation is
        # checkpointed too: it feeds the pair join, the context totals
        # and the vocab count, and is vocabulary-sized.
        pairs = _bigram_pairs(docs, id_col, text_col).localCheckpoint(
            eager=True
        )
        bigrams = (
            pairs.groupBy(
                F.col("__prev").alias("prev"),
                F.col("__token").alias("token"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
    else:
        pairs = _bigram_pairs(docs, id_col, text_col)
    # __-prefixed internal copies so an id_col named 'prev'/'token'/
    # 'cnt' cannot collide with the public model schema
    model = bigrams.select(
        F.col("prev").alias("__prev"),
        F.col("token").alias("__token"),
        F.col("cnt").alias("__cnt"),
    )
    ctx = model.groupBy("__prev").agg(F.sum("__cnt").alias("__ctx"))
    vocab = model.agg(F.countDistinct("__token").alias("__V"))
    scored = (
        pairs.join(F.broadcast(model), ["__prev", "__token"], "left")
        .join(F.broadcast(ctx), "__prev", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log2(
                    (F.coalesce(F.col("__cnt"), F.lit(0)) + F.lit(add_k))
                    / (
                        F.coalesce(F.col("__ctx"), F.lit(0))
                        + F.lit(add_k) * (F.col("__V") + 1)
                    )
                )
            ).alias("__bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__bits"), 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.avg("__bits")), 6).alias("perplexity"),
    )


def lm_cross_entropy_kn(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: Optional[DataFrame] = None,
    discount: float = 0.75,
    add_k: float = 1.0,
    carry=(),
) -> DataFrame:
    """Per-document cross-entropy under an interpolated KNESER-NEY
    bigram LM (Kneser & Ney 1995; the smoothing KenLM builds, hence
    what the CCNet filter this module emulates actually scores with —
    VERDICT r10 next-round #5).  Add-k backoff (the ``_bigram`` form)
    redistributes mass by FREQUENCY, so "francisco" — frequent but
    only ever after "san" — gets a large unseen-context probability;
    KN redistributes by CONTEXT DIVERSITY: token t after context p
    scores

        p(t | p) = (max(c(p,t) - D, 0) + D * n1p(p) * P_cont(t))
                   / c_ctx(p)                          if c_ctx(p) > 0
                 = P_cont(t)                           otherwise

        P_cont(t) = (n1c(t) + k) / (T + k * (V + 1))

    with ``D`` the absolute discount, ``n1p(p)`` the number of
    distinct tokens seen after p, ``n1c(t)`` the number of distinct
    contexts t follows (the continuation count), ``T`` the number of
    distinct bigram TYPES and ``V`` the vocabulary; the ``add_k``
    floor on the continuation distribution keeps OOV tokens finite
    (textbook KN leaves them zero), the same one-extra-slot convention
    as the other scorers.  Every model quantity is a plain aggregate
    of the bigram table — counts, type counts, one sum — so the whole
    retrain-and-rescore replays in any engine (the driver oracle
    does), unlike a KenLM binary.

    Returns the same schema as :func:`lm_cross_entropy`
    (+ ``carry``).  Both model joins broadcast (the model is
    vocabulary-sized by construction); the only wide shuffle is the
    per-document average.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    if add_k <= 0:
        raise ValueError("add_k must be > 0 (OOV continuation diverges)")
    if bigrams is None:
        # same single-pass trade as lm_cross_entropy_bigram (r12,
        # guide §2.4): the scoring pair stream IS the training input,
        # so one checkpointed tokenize + explode feeds both phases
        pairs = _bigram_pairs(docs, id_col, text_col).localCheckpoint(
            eager=True
        )
        bigrams = (
            pairs.groupBy(
                F.col("__prev").alias("prev"),
                F.col("__token").alias("token"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
    else:
        pairs = _bigram_pairs(docs, id_col, text_col)
    carry = list(carry)
    model = bigrams.select(
        F.col("prev").alias("__prev"),
        F.col("token").alias("__token"),
        F.col("cnt").alias("__cnt"),
    )
    # per-context: total count and distinct-continuation count (each
    # (prev, token) row IS a distinct type, so count(*) == countDistinct)
    ctx = model.groupBy("__prev").agg(
        F.sum("__cnt").alias("__ctx"),
        F.count(F.lit(1)).alias("__n1p"),
    )
    # per-token continuation count + the two scalars (T, V)
    cont = model.groupBy("__token").agg(
        F.count(F.lit(1)).alias("__n1c")
    )
    scalars = model.agg(
        F.count(F.lit(1)).alias("__T"),
        F.countDistinct("__token").alias("__V"),
    )
    pcont = (F.coalesce(F.col("__n1c"), F.lit(0)) + F.lit(add_k)) / (
        F.col("__T") + F.lit(add_k) * (F.col("__V") + 1)
    )
    seen_ctx = F.coalesce(F.col("__ctx"), F.lit(0)) > 0
    p_kn = F.when(
        seen_ctx,
        (
            F.greatest(
                F.coalesce(F.col("__cnt"), F.lit(0)) - F.lit(discount),
                F.lit(0.0),
            )
            + F.lit(discount) * F.col("__n1p") * pcont
        )
        / F.col("__ctx"),
    ).otherwise(pcont)
    scored = (
        pairs.join(F.broadcast(model), ["__prev", "__token"], "left")
        .join(F.broadcast(ctx), "__prev", "left")
        .join(F.broadcast(cont), "__token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(id_col, *carry, (-F.log2(p_kn)).alias("__bits"))
    )
    return scored.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in carry],
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__bits"), 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.avg("__bits")), 6).alias("perplexity"),
    )


def ppl_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    group_col: Optional[str] = None,
    counts: Optional[DataFrame] = None,
    n_buckets: int = 3,
    scorer: str = "unigram",
) -> DataFrame:
    """CCNet-style perplexity bucketing: rank documents by LM
    cross-entropy and cut into ``n_buckets`` equal-count tiers —
    per ``group_col`` (the paper buckets per language) or globally.
    Bucket 1 = lowest perplexity ("head" in CCNet's head/middle/tail
    thirds at the default 3): the tier label that data recipes then
    sample by.

    Returns ``(id_col, [group_col], n_tokens, cross_entropy,
    perplexity, bucket)``.  ``scorer``: ``"unigram"`` (default,
    ``counts`` = unigram table) or ``"kn"`` (interpolated Kneser-Ney
    bigram, ``counts`` = bigram table) — KN moves the tier boundary
    wherever context diversity and raw frequency disagree, which is
    the point of using it.  Determinism: the ntile orders by the
    6-dp-ROUNDED cross-entropy with the id as tie-breaker, so the cut
    is identical on any engine/partitioning (ordering raw doubles
    would let sub-rounding noise flip near-boundary documents).

    Plan: lm_cross_entropy's shape (broadcast vocab join + one
    per-doc combine shuffle, the group key carried THROUGH that
    aggregate — no rejoin, no second corpus scan) plus ONE ntile
    window partitioned by group — at 100 TB the window sorts within
    language partitions, the same cost class as cap_per_group; skewed
    languages are bounded by their own share of the corpus.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if scorer not in ("unigram", "kn"):
        raise ValueError("scorer must be 'unigram' or 'kn'")
    carry = [group_col] if group_col is not None else []
    if scorer == "kn":
        # counts is the (prev, token, cnt) bigram table in kn mode
        keyed = lm_cross_entropy_kn(
            docs, id_col, text_col, bigrams=counts, carry=carry
        )
    else:
        keyed = lm_cross_entropy(
            docs, id_col, text_col, counts=counts, carry=carry
        )
    if group_col is not None:
        w = Window.partitionBy(group_col)
    else:
        w = Window.partitionBy()
    w = w.orderBy(F.col("cross_entropy").asc(), F.col(id_col).asc())
    return keyed.withColumn("bucket", F.ntile(n_buckets).over(w))


def oov_stats(
    docs: DataFrame,
    text_col: str,
    vocab: DataFrame,
    token_col: str = "token",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-vocabulary coverage per document: ``n_tokens``,
    ``n_oov`` (tokens absent from ``vocab``) and ``oov_rate``
    (rounded to 9 dp; 0.0 for tokenless documents) — the standard
    report for sizing a tokenizer against a corpus (a vocabulary that
    OOVs a language or domain silently shreds it into bytes).

    ``vocab`` is one ``token_col`` row per vocabulary entry (e.g. a
    ``unigram_counts``/``learn_bpe`` product).  Spark-first shape:
    tokenize + explode fuse into the scan; the vocab side is
    tokenizer-sized (bounded, ~1M rows) so Catalyst broadcasts the
    membership join — no corpus shuffle for the lookup; the per-doc
    aggregate partially combines map-side (a document's exploded
    tokens stay within their input partition), so the one real
    shuffle carries one counter row per document.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokenize(F.col(text_col))).alias("__t"),
    )
    v = vocab.select(
        F.col(token_col).alias("__t"), F.lit(True).alias("__in_v")
    ).distinct()
    joined = toks.join(F.broadcast(v), "__t", "left")
    return (
        joined.groupBy("__id")
        .agg(
            F.count("__t").alias("n_tokens"),
            F.sum(
                (F.col("__t").isNotNull() & F.col("__in_v").isNull())
                .cast("long")
            ).alias("n_oov"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_oov",
            F.round(
                F.when(F.col("n_tokens") > 0,
                       F.col("n_oov") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                9,
            ).alias("oov_rate"),
        )
    )


def vocab_coverage_curve(
    docs: DataFrame,
    text_col: str,
    top_v: Optional[int] = None,
) -> DataFrame:
    """Token-frequency coverage curve for tokenizer sizing: rank
    tokens by corpus frequency and report, per rank, the cumulative
    fraction of all token OCCURRENCES a vocabulary of that size would
    cover — read off "what V covers 99%?" directly.  Deterministic
    rank order: count desc, token asc (ties are real in Zipf tails).

    Returns ``(rank, token, n_occurrences, cum_occurrences,
    coverage)`` with coverage rounded to 9 dp; ``top_v`` truncates the
    curve (the full head is what matters — the tail is the OOV mass).

    Spark-first: one tokenize+explode aggregation (map-side combined,
    shuffle carries one partial per token per partition), then a
    single-partition window over the VOCABULARY-sized aggregate — the
    window never sees corpus rows, so the one-partition sort is over
    distinct tokens only (cap with ``top_v`` upstream of the sort at
    truly huge vocabularies).
    """
    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("__t"))
        .groupBy("__t")
        .agg(F.count("*").alias("n_occurrences"))
    )
    total = counts.agg(F.sum("n_occurrences").alias("__tot"))
    w = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("__t").asc()
    )
    curve = counts.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("__t").alias("token"),
        "n_occurrences",
        F.sum("n_occurrences")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_occurrences"),
    ).crossJoin(F.broadcast(total))
    out = curve.select(
        "rank",
        "token",
        "n_occurrences",
        "cum_occurrences",
        F.round(F.col("cum_occurrences") / F.col("__tot"), 9).alias(
            "coverage"
        ),
    )
    if top_v is not None:
        out = out.filter(F.col("rank") <= int(top_v))
    return out
