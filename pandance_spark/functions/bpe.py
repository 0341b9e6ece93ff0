"""Distributed BPE tokenizer learning and application.

Byte-pair-encoding vocabularies are learned from a WORD-FREQUENCY
table, not from the raw corpus — that is how production trainers
(SentencePiece, HuggingFace tokenizers, the original Sennrich et al.
subword-nmt) work, and it is what makes the operation tractable at
100 TB: the only corpus-size-dependent work is ONE distributed
word-count pass (map-side combine; shuffle volume ∝ distinct words,
never total tokens).  The counted table is capped at ``vocab_cap``
rows with a deterministic order (count desc, word asc), collected —
a CONTRACT-BOUNDED collect, same pattern as the vocab-capped LM
models in ``functions/lm.py`` — and the merge loop runs driver-side
over that bounded table with an indexed pair-count update (touching
only the words containing the merged pair, the standard fast
Sennrich implementation).

Application broadcasts the learned merge ranks inside an
Arrow-batched ``pandas_udf``; pre-tokenization stays JVM-side
(``functions.text.tokenize``) and the UDF memoizes per distinct word
within each batch, so hot words (Zipf head) are encoded once per
batch, not once per occurrence.

Engine extension beyond the reference (SURVEY.md §2.4); the
reference has no tokenizer surface.  The merge loop is deterministic
(count-desc / lexicographic tie-break / fixed stop rule), which makes
it SQL-replayable by unrolling: the ``bpe_tokens`` driver query has a
full DuckDB oracle (``__spark_entry__._bpe_oracle``) that replays
training and application as 120 materialized CTE steps, alongside the
pure-Python reference parity tests in tests/test_bpe.py.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from pandance_spark.functions.text import tokenize

__all__ = ["END_OF_WORD", "word_counts", "learn_bpe", "bpe_segment"]

# Terminal marker appended as its own symbol so merges distinguish
# word-final from word-internal contexts ("est</w>" vs "est").
END_OF_WORD = "</w>"

Pair = Tuple[str, str]


def word_counts(
    df: DataFrame, text_col: str = "text", limit: int | None = None
) -> DataFrame:
    """Corpus word-frequency table: ``(word, cnt)``.

    The one distributed pass of BPE training.  groupBy partial-
    aggregates map-side, so the shuffle carries one row per distinct
    word per mapper — at 100 TB the Zipf head collapses before the
    exchange.  ``limit`` applies the deterministic vocab cap
    (count desc, word asc — ties cannot reorder across runs); Spark
    plans orderBy+limit as TakeOrdered, no full sort materialization.
    """
    wc = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if limit is not None:
        wc = wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(int(limit))
    return wc


def _count_pairs(sym: Sequence[str]) -> Dict[Pair, int]:
    out: Dict[Pair, int] = {}
    for a, b in zip(sym, sym[1:]):
        out[(a, b)] = out.get((a, b), 0) + 1
    return out


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    vocab_cap: int = 50_000,
    min_pair_count: int = 2,
) -> List[Pair]:
    """Learn up to ``num_merges`` BPE merges from the corpus.

    Deterministic: the vocab cap orders (count desc, word asc) and
    each round merges the highest-count pair, breaking count ties by
    lexicographically smallest pair — independent of partitioning,
    hash seeds, and dict iteration order.  Stops early when the best
    pair's weighted count drops below ``min_pair_count`` (merging a
    pair seen once per corpus creates a token that will never
    generalize).

    Driver cost is bounded by the vocab contract, not the corpus:
    the indexed update re-scans only words CONTAINING the merged
    pair, so total work is O(vocab_cap · avg_word_len + touched
    symbols per merge) — a 50k-word table trains thousands of merges
    in seconds regardless of corpus size.
    """
    rows = word_counts(df, text_col, vocab_cap).collect()
    words: List[List[str]] = [list(r["word"]) + [END_OF_WORD] for r in rows]
    counts: List[int] = [int(r["cnt"]) for r in rows]

    pair_counts: Dict[Pair, int] = {}
    pair_words: Dict[Pair, set] = {}
    for wi, sym in enumerate(words):
        for p, k in _count_pairs(sym).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * counts[wi]
            pair_words.setdefault(p, set()).add(wi)

    merges: List[Pair] = []
    for _ in range(int(num_merges)):
        if not pair_counts:
            break
        best_cnt = max(pair_counts.values())
        if best_cnt < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_cnt)
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in sorted(pair_words.get(best, ())):
            sym = words[wi]
            cnt = counts[wi]
            for p, k in _count_pairs(sym).items():
                pair_counts[p] -= k * cnt
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop(p, None)
            merged: List[str] = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    merged.append(new_sym)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            words[wi] = merged
            for p, k in _count_pairs(merged).items():
                pair_counts[p] = pair_counts.get(p, 0) + k * cnt
                pair_words.setdefault(p, set()).add(wi)
    return merges


def _encode_word(
    word: str, ranks: Dict[Pair, int], merge_list: List[Pair]
) -> List[str]:
    """GPT-2-style rank-greedy application: repeatedly merge ALL
    occurrences of the lowest-rank pair present.  Equivalent to
    replaying the merges in learned order (a merge's inputs can only
    be produced by strictly earlier merges) — pinned by
    tests/test_bpe.py against the in-order replay."""
    sym: List[str] = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        a, b = merge_list[best_rank]
        out: List[str] = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_segment(words: Column, merges: Sequence[Pair]) -> Column:
    """Encode an ``array<string>`` of pre-tokenized words into the
    flat BPE token array (``array<string>``; word-final pieces carry
    the ``</w>`` suffix symbol as learned).

    Arrow-batched ``pandas_udf``; the merge table rides the task
    closure (fine up to ~100k merges — beyond that, ship it with
    ``SparkContext.broadcast`` and resolve inside the UDF).  A
    per-batch memo means each DISTINCT word is encoded once per
    batch — under a Zipf distribution that converts the per-token
    Python cost into a per-distinct-word cost.
    """
    merge_list: List[Pair] = [tuple(p) for p in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def _seg(batch: pd.Series) -> pd.Series:
        ranks = {p: i for i, p in enumerate(merge_list)}
        memo: Dict[str, List[str]] = {}
        out = []
        for ws in batch:
            toks: List[str] = []
            for w in ws if ws is not None else []:
                enc = memo.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks, merge_list)
                    memo[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _seg(words)
