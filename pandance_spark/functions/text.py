"""Text-analysis functions for large-scale training-data pipelines.

All hot-path functions are pure Column expressions (JVM-side,
whole-stage codegen) — language ID, quality scoring, token counting and
fingerprinting run at parquet-scan speed with no Python in the loop.
These are engine extensions beyond the reference (SURVEY.md §2.4);
the reference's only text capability is an arbitrary Python predicate
via ``theta_join`` (e.g. substring containment,
``pandance/pandance.py:431-454``).
"""

from __future__ import annotations

import math


from pyspark.sql import Column, Window
from pyspark.sql import functions as F

__all__ = [
    "strip_html",
    "extract_main_text",
    "luhn_sum",
    "luhn_valid",
    "iban_mod97",
    "iban_valid",
    "find_ibans",
    "find_card_numbers",
    "scan_card_numbers",
    "redact_card_numbers",
    "tokenize",
    "token_count",
    "bpe_token_count",
    "word_shingles",
    "word_shingle_hashes",
    "quality_score",
    "hashed_quality_score",
    "hashed_token_weights",
    "gopher_signals",
    "lang_id",
    "fingerprint_md5",
    "char_ngram_fingerprints",
    "normalize_text",
    "normalize_unicode",
    "clean_text",
    "split_sentences",
    "dedup_lines",
    "fingerprint_xxhash",
    "tag_topics",
    "c4_kept_lines",
    "c4_clean",
]

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(text: Column) -> Column:
    """Lowercased word tokens (whitespace/punctuation split), empties
    removed.  A BPE-ish approximation good enough for token budgeting."""
    toks = F.split(F.lower(text), _TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


# GPT-2-style pre-tokenizer pieces: contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs, residual whitespace.  The
# lookahead clause of the original (`\s+(?!\S)`) is dropped so the
# pattern stays RE2-portable (no lookarounds) — any engine with
# \p{L}/\p{N} classes reproduces the count.  Leftmost-first alternation
# semantics agree between Java regex and RE2.
_BPE_PRETOKEN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Token-budget estimate via the GPT-2/BPE pre-tokenizer regex —
    counts the pre-merge pieces a byte-pair encoder would start from.
    Tracks real tokenizer budgets far closer than whitespace counting
    (punctuation and digit runs become their own pieces).  Note this
    is a LOWER bound on the final BPE token count: each piece encodes
    to >= 1 tokens (merges happen within a piece, never across), so
    budget-sizing from it should over-provision, not under.  Pure
    projection, codegen'd; no vocabulary needed.
    """
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_BPE_PRETOKEN), F.lit(0))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles ('a b c' strings) per row.

    Per-row computation — no shuffle; the scale cost is the array
    memory, proportional to the document length.
    """
    return word_shingles_from_tokens(tokenize(text), n)


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """``word_shingles`` over an already-tokenized array column — use
    when the token array is staged behind a projection so several
    derived signals share ONE tokenize evaluation (Catalyst inlines
    repeated Column references; staging is the caller's lever)."""
    if n < 1:
        raise ValueError("shingle size must be >= 1")
    if n <= 4:
        # zip_with chain over n aligned slices (r11 optimization): the
        # transform-over-index form pays slice(toks, i, n) (an array
        # allocation) + concat_ws per shingle inside an interpreted
        # lambda — measured 3.4 s/pass over the sf0.1 eval corpus vs
        # 0.68 s for this form at n=3 (5x), bit-identical output.
        # Each zip_with pairs equal-length slices (no null padding)
        # and the lambdas reference only their own variables
        # (outer-capture rule, see module header).  Only for SMALL n:
        # the chain re-copies the growing prefix string at each of the
        # n-1 steps (~n/2 x the string bytes of the one-shot concat),
        # and the 13-gram consumers (contamination_spans,
        # decontam_composed) measured 1.4-1.5x SLOWER under it in situ
        # — so large n keeps the one-shot concat_ws form below.
        m = F.size(toks) - (n - 1)  # shingle count
        z = F.slice(toks, 1, m)
        for j in range(1, n):
            z = F.zip_with(
                z,
                F.slice(toks, 1 + j, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(z)
    # large n: slice windows [i, i+n) over the token array; build via
    # index sequence so each lambda references only its own variable
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


# PII patterns restricted to syntax shared by Java regex (Spark) and
# RE2 (DuckDB, Go, Rust engines): no lookarounds, no backrefs — the
# redaction is reproducible bit-for-bit in any engine
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def redact_pii(text: Column, patterns=None, replacement: str = "[PII]") -> Column:
    """Replace every match of each PII pattern with ``replacement``.

    Patterns apply sequentially in list order (deterministic, so
    overlapping matches resolve identically everywhere).  Pure per-row
    Column expression — the 100 TB cost is a regex scan per document
    inside whole-stage codegen, no shuffle.
    """
    out = text
    for p in patterns or [PII_EMAIL, PII_PHONE]:
        out = F.regexp_replace(out, p, replacement)
    return out


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of a PII pattern in the document."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def luhn_sum(digits: Column) -> Column:
    """Luhn digit sum of a digits-only string as pure integer Column
    arithmetic (no UDF): doubling every second digit from the right
    with the 9-subtraction.  Exposed separately from
    :func:`luhn_valid` so check DIGITS can be computed in closed form
    (``(10 - luhn_sum(base || '0') % 10) % 10``) instead of trying ten
    candidates — the higher-order fold is interpreted, not codegen'd,
    so each avoided fold matters at corpus scale."""
    n = F.length(digits)
    digit = lambda i: F.substring(digits, i, F.lit(1)).cast("int")  # noqa: E731

    def term(acc, i):
        d = digit(i)
        doubled = d * 2
        dd = F.when(doubled > 9, doubled - 9).otherwise(doubled)
        return acc + F.when(((n - i) % 2) == 1, dd).otherwise(d)

    return F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term)


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum validity: ``luhn_sum ≡ 0 (mod 10)`` over a
    non-empty digits-only string.  Engine-exact — DuckDB replays the
    same per-position lambda, so checksum-VALIDATED detection is
    oracle-checkable."""
    return (F.length(digits) > 0) & (luhn_sum(digits) % 10 == 0)


_IBAN_RE = r"\b([A-Z]{2}[0-9]{2}[A-Z0-9 -]{10,48})"


def iban_mod97(iban: Column) -> Column:
    """ISO 13616 / ISO 7064 MOD-97-10 remainder of a separator-free
    UPPERCASE IBAN candidate, as pure integer Column arithmetic: the
    first four chars move to the end, letters expand to two digits
    (A=10..Z=35), and the resulting number is reduced mod 97 by a
    left-to-right fold — ``acc*10 + d`` per digit, ``acc*100 + v``
    per letter, each step mod 97, so every intermediate stays < 9700
    (exact in any engine; the full number can be 60+ digits, which no
    native integer type holds).  Valid IBANs leave remainder 1."""
    rearranged = F.concat(
        F.substring(iban, 5, F.length(iban)),
        F.substring(iban, 1, 4),
    )
    chars = F.split(rearranged, "")

    def step(acc, c):
        code = F.ascii(c)
        is_digit = (code >= 48) & (code <= 57)
        return F.when(
            is_digit, F.pmod(acc * 10 + (code - 48), F.lit(97))
        ).otherwise(F.pmod(acc * 100 + (code - 55), F.lit(97)))

    return F.aggregate(chars, F.lit(0), step)


def iban_valid(iban: Column) -> Column:
    """MOD-97 validity of an uppercase, separator-free IBAN candidate
    (shape must already match country-code + check-digit + BBAN;
    length-per-country is NOT checked — checksum-only, the same
    contract class as :func:`luhn_valid`)."""
    return (
        iban.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")
        & (iban_mod97(iban) == 1)
    )


def find_ibans(text: Column) -> Column:
    """Array of distinct MOD-97-VALID IBANs in the document
    (normalized: uppercase, separators removed).  Candidates are
    maximal ``CC##`` + alnum/space/dash runs; each normalized run is
    PREFIX-scanned at every legal IBAN length (15-34) and the
    checksum-valid prefixes kept — the :func:`find_card_numbers`
    window-scan precedent, which survives a trailing word glued onto
    the run ("... 7654 32 TODAY") where a single greedy regex would
    poison the candidate.  Chance mod-97 hits on longer prefixes pass
    at ~1/97 per length — over-DETECTION, the safe direction for PII.
    The checksum kills ~99% of shape-only false positives.
    Documented bound (the :func:`find_card_numbers` 40-digit-run
    precedent): two IBANs separated ONLY by spaced uppercase-able
    words merge into one capped run and the second is missed — any
    punctuation or newline between them breaks the run; prose
    separates accounts with punctuation.  Pure
    Column expressions, zero shuffle, zero UDF — regex extraction,
    normalization and the mod-97 fold all replay in DuckDB, so
    detection is oracle-checkable."""
    runs = F.transform(
        F.regexp_extract_all(F.upper(text), F.lit(_IBAN_RE), 1),
        lambda c: F.regexp_replace(c, "[ -]", ""),
    )
    # r12 (guide §1.2 per-task work): widths are bounded by the run's
    # length — substring CLAMPS, so every width beyond len(run) used
    # to yield the same full-run prefix and re-ran the mod-97 fold on
    # an identical string (a 22-char IBAN paid 20 folds where 8
    # suffice; the duplicates were then discarded by array_distinct).
    # Runs shorter than 15 never pass iban_valid's shape gate, so the
    # empty width list for them is equally lossless.
    prefixes = F.flatten(
        F.transform(
            runs,
            lambda r: F.transform(
                F.when(
                    F.length(r) >= 15,
                    F.sequence(
                        F.lit(15), F.least(F.lit(34), F.length(r))
                    ),
                ).otherwise(F.array().cast("array<int>")),
                lambda w: r.substr(F.lit(1), w),
            ),
        )
    )
    valid = F.filter(prefixes, iban_valid)
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))
        .otherwise(F.array_distinct(valid))
    )


def _valid_pan_windows(digits: Column) -> Column:
    """All distinct Luhn-valid 13-19-digit windows of a digits-only
    string — how a PAN embedded in a longer digit run (phone + card,
    ref + card sharing separators) is still found."""
    n = F.length(digits)

    # NB: a two-parameter lambda would make F.transform pass
    # (element, index) and silently bind the window width to the array
    # index — capture w in a closure instead (pinned by tests)
    def window_at(w: int):
        return lambda i: F.substring(digits, i, F.lit(w))

    wins = F.flatten(
        F.array(
            *[
                F.when(
                    n >= w,
                    F.transform(
                        F.sequence(F.lit(1), n - (w - 1)), window_at(w)
                    ),
                ).otherwise(F.array().cast("array<string>"))
                for w in range(13, 20)
            ]
        )
    )
    return F.array_distinct(F.filter(wins, luhn_valid))


# digit runs longer than this many digits skip the embedded-PAN window
# scan (interpreted folds; a run this long is a data table, not prose)
_PAN_SCAN_MAX_DIGITS = 40


def _card_runs(text: Column) -> Column:
    """Maximal digit[-space-dash] runs with their normalized digits —
    struct(raw, d) per run.  MAXIMAL spans (no length cap): a capped
    pattern truncates 19-digit separated PANs and lets an adjacent
    digit run merge a PAN out of its length gate — both silent
    misses (review finding, pinned by tests)."""
    runs = F.regexp_extract_all(text, F.lit(r"\d[\d\- ]*\d"), F.lit(0))
    return F.transform(
        runs,
        lambda s: F.struct(
            s.alias("raw"),
            F.regexp_replace(s, "[^0-9]", "").alias("d"),
        ),
    )


def _run_pans(run: Column) -> Column:
    """Luhn-valid PANs inside one run struct: the run itself when its
    13-19 digits validate, else every valid window when the run is
    20-40 digits (merged spans)."""
    d = run["d"]
    n = F.length(d)
    return (
        F.when(
            (n >= 13) & (n <= 19) & luhn_valid(d), F.array(d)
        )
        .when(
            (n >= 20) & (n <= _PAN_SCAN_MAX_DIGITS), _valid_pan_windows(d)
        )
        .otherwise(F.array().cast("array<string>"))
    )


# cheap codegen'd pregate for the interpreted PAN machinery: a Luhn
# candidate needs >= 13 digits, and a run with >= 13 digits is >= 13
# chars — so a document with no 13+-char digit[-space-dash] run can
# skip every fold.  Identity on results (runs shorter than 13 digits
# produce nothing in _run_pans); measured ~5x on candidate-sparse
# corpora, same pattern as fix_mojibake's RLIKE pregate.
_PAN_PREGATE_RE = r"\d[\d\- ]{11,}\d"


def find_card_numbers(text: Column) -> Column:
    """Array of distinct Luhn-VALID payment-card numbers in the
    document (digits only, 13-19 digits) — the checksum cuts the
    false-positive rate of shape-only regexes from 'every long number'
    to ~10% residual.  Candidates are MAXIMAL digit/space/dash runs;
    a run of 20-40 digits (a PAN sharing separators with a phone or
    order ref) is window-scanned so embedded PANs are still found —
    at the cost of also surfacing chance Luhn-valid windows of the
    merged run (~10% of windows; over-DETECTION is the safe direction
    for PII, and run-level redaction never leaks either way).  Runs
    beyond 40 digits are skipped (documented bound — data tables, not
    prose).  Pure Column expressions; zero shuffle, zero UDF."""
    pans = F.flatten(F.transform(_card_runs(text), _run_pans))
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))
        .when(text.rlike(_PAN_PREGATE_RE), F.array_distinct(pans))
        .otherwise(F.array().cast("array<string>"))
    )


def scan_card_numbers(
    text: Column, replacement: str = "[CARD]"
) -> Column:
    """One-pass PAN scan: ``struct(found array<string>, redacted
    string)`` — :func:`find_card_numbers` and
    :func:`redact_card_numbers` fused so the run extraction and the
    per-run Luhn machinery appear ONCE in the plan (one shared
    subtree instead of two parallel copies; Spark's subexpression
    elimination then evaluates it once per row).  Callers needing
    both outputs — every PII pipeline does — should use this."""
    rp = F.transform(
        _card_runs(text),
        lambda r: F.struct(
            r["raw"].alias("raw"), _run_pans(r).alias("pans")
        ),
    )
    found = F.array_distinct(
        F.flatten(F.transform(rp, lambda x: x["pans"]))
    )
    redacted = F.aggregate(
        F.filter(rp, lambda x: F.size(x["pans"]) > 0),
        text,
        lambda acc, x: F.replace(acc, x["raw"], F.lit(replacement)),
    )
    out_t = "struct<found:array<string>,redacted:string>"
    return (
        F.when(text.isNull(), F.lit(None).cast(out_t))
        .when(
            text.rlike(_PAN_PREGATE_RE),
            F.struct(found.alias("found"), redacted.alias("redacted")),
        )
        .otherwise(
            F.struct(
                F.array().cast("array<string>").alias("found"),
                text.alias("redacted"),
            )
        )
    )


def redact_card_numbers(text: Column, replacement: str = "[CARD]") -> Column:
    """Redact every digit run that CONTAINS a Luhn-valid PAN (the
    whole run is replaced — partial redaction of a merged
    phone+card span would leak the remainder); runs without a valid
    PAN, e.g. order ids sharing the 16-digit shape, survive
    untouched.  Normalization runs once per run (struct candidates),
    and the fold replaces raw run strings literally."""
    hit_runs = F.filter(
        _card_runs(text), lambda r: F.size(_run_pans(r)) > 0
    )
    folded = F.aggregate(
        hit_runs,
        text,
        lambda acc, r: F.replace(acc, r["raw"], F.lit(replacement)),
    )
    # pregated: no 13+-char digit run means no redactable PAN — the
    # text passes through without running the interpreted fold
    return F.when(text.rlike(_PAN_PREGATE_RE), folded).otherwise(text)


def distinct_token_ratio(text: Column) -> Column:
    """|distinct tokens| / |tokens| in (0, 1]; 0.0 for tokenless rows.
    Low values = heavy token repetition (Gopher-style repetition
    signal).  Pure per-row Column expression — no shuffle."""
    toks = tokenize(text)
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))


def longest_equal_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal neighbors in a SORTED array —
    i.e. the count of its most frequent element.  Single aggregate
    fold, fully inside whole-stage codegen."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def top_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of the document's word n-grams taken by the single most
    frequent n-gram (Gopher-style "top-2-gram fraction": boilerplate and
    template spam score high).  0.0 when the document has no n-grams.

    Per-row: sort the n-gram array, then a single aggregate fold finds
    the longest run of equal neighbors (= the max n-gram count).  No
    explode, no shuffle — the 100 TB cost is O(tokens log tokens) per
    row, all inside whole-stage codegen.

    NOTE for hot paths: this Column form re-evaluates the tokenize +
    shingle chain wherever the expression tree references it; use
    :func:`repetition_profile` (staged projections) when computing
    several signals over the same documents.
    """
    grams = F.sort_array(word_shingles(text, n))
    return F.when(
        F.size(grams) > 0, longest_equal_run(grams) / F.size(grams)
    ).otherwise(F.lit(0.0))


def repetition_profile(df, id_col: str, text_col: str, n: int = 2):
    """(id, n_tokens, distinct_ratio, top_bigram_ratio) for every row —
    the staged-projection form of the repetition signals.

    Tokenization, the distinct count and the sorted n-gram array are
    each computed ONCE behind projection boundaries (Catalyst inlines
    repeated Column references; an unstaged select re-runs the whole
    tokenize chain per reference — ~10x slower measured at sf0.1).
    """
    toks = df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    )
    staged = toks.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("__n_distinct"),
        F.sort_array(word_shingles_from_tokens(F.col("__toks"), n)).alias(
            "__grams"
        ),
    )
    return staged.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0, F.col("__n_distinct") / F.col("n_tokens")
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_ratio"),
        F.when(
            F.size("__grams") > 0,
            longest_equal_run(F.col("__grams")) / F.size("__grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1] from cheap surface stats:
    length band, alphabetic ratio, mean token length band, stopword hit.

    Deterministic and SQL-expressible (the DuckDB oracle recomputes it
    verbatim); weights are fixed, not learned.
    """
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    toks = tokenize(text)
    n_toks = F.size(toks)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_toks > 0, n_alpha / n_toks).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    tok_len_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(
        0.0
    )
    has_stop = F.when(
        F.lower(text).rlike("\\b(the|a|of|and|to|in)\\b"), 1.0
    ).otherwise(0.0)
    score = 0.3 * len_ok + 0.3 * alpha_ratio + 0.2 * tok_len_ok + 0.2 * has_stop
    return F.round(score, 4)


# tiny per-language stopword panels; counts of hits decide the language.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def _lang_scores(lowered: Column):
    """(lang, score-expr) pairs over an already-lowered text column.
    Each score is 5 regexp_replace length-diffs (marker hit counts)."""
    return [
        (
            lang,
            sum(
                (
                    F.length(lowered)
                    - F.length(F.regexp_replace(lowered, f"\\b{w}\\b", ""))
                )
                / len(w)
                for w in words
            ),
        )
        for lang, words in sorted(_LANG_MARKERS.items())
    ]


def _lang_winner(score_cols) -> Column:
    """Winner from per-language score columns: greatest hit count wins,
    ties broken by language code order, no hits -> 'und'."""
    best_score = F.greatest(*[s for _, s in score_cols])
    result = F.lit("und")
    # reversed so earlier language codes win ties (when() chains
    # evaluate first-match; build last-to-first)
    for lang, s in reversed(score_cols):
        result = F.when((best_score > 0) & (s == best_score), lang).otherwise(result)
    return result


def lang_id(text: Column) -> Column:
    """N-gram/stopword-panel language guess: greatest hit count wins,
    ties broken by language code order, no hits -> 'und' (undetermined).

    This is the classic cheap heuristic (real pipelines plug in a
    trained model via the same column-in/column-out shape).

    NOTE for hot paths: as a single Column the winner chain references
    every per-language score (itself a 5-regex scan) up to twice plus
    once inside the shared ``greatest`` — worst case ~100 full-document
    regex scans per row if subexpression elimination doesn't collapse
    them.  Use :func:`with_lang_id` (staged projection) for bulk work —
    measured ~4x faster at sf0.1.
    """
    return _lang_winner(_lang_scores(F.lower(text)))


def with_lang_id(df, text_col: str, out_col: str = "lang_pred"):
    """Append a language-guess column via STAGED projections — the
    scale form of :func:`lang_id` (same ``repetition_profile`` pattern).

    The lowered text, then the four per-language scores (5 regex scans
    each), are computed exactly ONCE behind projection boundaries; the
    winner chain compares the staged score columns, which is pure
    arithmetic.  Output schema: ``df.columns + [out_col]``.
    """
    score_names = [(lang, f"__s_{lang}") for lang in sorted(_LANG_MARKERS)]
    lowered_df = df.select("*", F.lower(F.col(text_col)).alias("__lowered"))
    staged = lowered_df.select(
        "*",
        *[
            s.alias(name)
            for (_, s), (_, name) in zip(
                _lang_scores(F.col("__lowered")), score_names
            )
        ],
    )
    winner = _lang_winner([(lang, F.col(name)) for lang, name in score_names])
    return staged.select(*df.columns, winner.alias(out_col))


# Unicode script ranges as LITERAL character classes (the codepoints
# are embedded in the pattern string, so the same bytes compile under
# Java regex AND RE2 — no \\u/\\x{...} dialect split).  BMP base
# blocks only: the route-first pass, not a full confusables table.
_SCRIPT_PATTERNS = {
    "arabic": "[؀-ۿ]",
    "cyrillic": "[Ѐ-ӿ]",
    "devanagari": "[ऀ-ॿ]",
    "greek": "[Ͱ-Ͽ]",
    "han": "[一-鿿]",
    "hangul": "[가-힯]",
    "kana": "[぀-ヿ]",
    "latin": "[A-Za-z]",
}


def script_counts(text: Column):
    """(script, count-expr) pairs: how many characters of ``text``
    fall in each major Unicode script block.  The multilingual
    pipeline's route-first signal — BEFORE any stopword-panel or
    model language ID runs, a 100 TB crawl splits by script so the
    Latin-only heuristics (``lang_id``) never scan CJK pages.  Each
    count is one regexp_replace length-diff; both Spark and DuckDB
    count codepoints, so the numbers replay exactly."""
    return [
        (
            name,
            F.length(text)
            - F.length(F.regexp_replace(text, pat, "")),
        )
        for name, pat in sorted(_SCRIPT_PATTERNS.items())
    ]


def _script_winner(score_cols, text: Column) -> Column:
    """Winner from per-script score COLUMNS: greatest count wins, ties
    to the alphabetically first script name, zero everywhere ->
    'none', NULL text -> NULL."""
    best = F.greatest(*[s for _, s in score_cols])
    result = F.lit("none")
    for name, s in reversed(score_cols):
        result = F.when((best > 0) & (s == best), name).otherwise(result)
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(result)


def dominant_script(text: Column) -> Column:
    """Script with the greatest character count; ties break to the
    alphabetically first script name; no script characters at all
    (digits/punctuation-only, empty) -> 'none'.  NULL text -> NULL
    (regexp_replace propagates it).

    NOTE for hot paths: as a single Column the winner chain references
    each count expression (a full regex scan) up to twice plus once
    inside ``greatest`` — the same hazard :func:`lang_id` documents.
    Use :func:`with_dominant_script` (staged projection) for bulk
    work."""
    return _script_winner(script_counts(text), text)


def with_dominant_script(df, text_col: str, out_col: str = "script"):
    """Append per-script counts (``n_<script>`` long columns) AND the
    dominant-script pick via STAGED projections — each regex scan
    runs exactly once per row, the winner chain reads the
    materialized count columns (the ``with_lang_id`` pattern;
    measured ~4x over the single-Column form on the synth fixture)."""
    text = F.col(text_col)
    staged = df.select(
        "*",
        *[
            cnt.cast("long").alias(f"n_{name}")
            for name, cnt in script_counts(text)
        ],
    )
    score_cols = [
        (name, F.col(f"n_{name}")) for name, _ in sorted(_SCRIPT_PATTERNS.items())
    ]
    return staged.select(
        "*", _script_winner(score_cols, text).alias(out_col)
    )


def _mojibake_table():
    """(mojibake, repaired) pairs for the classic UTF-8-read-as-cp1252
    double encoding ('cafÃ©' -> 'café', 'â€”' -> '—'): every Latin-1
    supplement char plus the common cp1252 punctuation, built by
    round-tripping each target through encode('utf-8')/
    decode('cp1252') — the table is COMPUTED, so the Spark chain and
    the generated DuckDB oracle can never drift.  Targets whose UTF-8
    bytes hit cp1252's five unmapped slots (0x81 8D 8F 90 9D) are
    skipped (their mojibake form is not representable).  Ordered
    3-byte-first then lexicographic: 3-char patterns start with 'â',
    2-char ones with 'Ã'/'Â', so the order is deterministic rather
    than load-bearing."""
    targets = [chr(c) for c in range(0xA0, 0x100)] + list("–—‘’“”…€•™„‚")
    out = []
    for ch in targets:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        out.append((moji, ch))
    out.sort(key=lambda p: (-len(p[0]), p[0]))
    return out


def fix_mojibake(text: Column) -> Column:
    """Repair UTF-8-as-cp1252 double-encoded text via the fixed
    replacement table (:func:`_mojibake_table`) — the cheap,
    fully-replayable subset of what ftfy does, applied as chained
    ``replace`` calls (left-to-right, identical in Spark and DuckDB).
    A row with none of the three mojibake lead bytes ('Ã', 'Â', 'â')
    exits at one cheap RLIKE instead of running the ~100-replace
    chain (unlike the PII fold, the chain really does scan the string
    ~100x, so the pregate pays for itself).  NULL propagates."""
    fixed = text
    for moji, ch in _mojibake_table():
        fixed = F.replace(fixed, F.lit(moji), F.lit(ch))
    return F.when(text.rlike("[ÃÂâ]"), fixed).otherwise(text)


def npmi_phrases(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top: int = 100,
) -> DataFrame:
    """Collocation / phrase mining by normalized pointwise mutual
    information (Bouma 2009; the word2vec-preprocessing "New_York"
    detector): adjacent token pairs scored

        npmi(a, b) = ln( p(ab) / (p(a) p(b)) ) / -ln p(ab)

    with ``p(ab)`` over all adjacent pairs and ``p(a)`` over all
    tokens — +1 = the pair ALWAYS co-occurs (a phrase), 0 =
    independent, negative = repulsion.  Returns the ``top`` pairs with
    ``n_pair >= min_count`` as ``(w1, w2, n_pair, npmi, rank)``, npmi
    rounded to 6 dp and ranked (npmi desc, w1, w2) so the cut is
    deterministic and engine-replayable; the degenerate single-pair
    corpus (p(ab) = 1, denominator 0) pins npmi = 1.

    Shape: two hash aggregations over the exploded pair/token streams
    (map-side combined) + two broadcast joins of pair rows against the
    vocabulary-sized unigram table; the only wide work is
    corpus-proportional counting — the 100 TB cost is the scan, as it
    should be.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top < 1:
        raise ValueError("top must be >= 1")
    toks = tokenize(F.col(text_col))
    pairs_arr = F.when(
        F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    )
    pair_rows = df.select(F.explode(pairs_arr).alias("__p")).select(
        F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )
    tok_rows = df.select(F.explode(toks).alias("tok"))
    # the unigram/bigram tables each feed two consumers (counts +
    # totals); totals are derived FROM the aggregated tables so the
    # corpus scans once per stream
    uni = tok_rows.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    uni = uni.localCheckpoint(eager=False)
    big = pair_rows.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    big = big.localCheckpoint(eager=False)
    t1 = uni.agg(F.sum("c1").alias("__t1"))
    t2 = big.agg(F.sum("n_pair").alias("__t2"))
    ua = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("__ca"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("__cb"))
    j = (
        big.filter(F.col("n_pair") >= min_count)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
    )
    p_ab = F.col("n_pair") / F.col("__t2")
    p_a = F.col("__ca") / F.col("__t1")
    p_b = F.col("__cb") / F.col("__t1")
    npmi = F.when(F.col("n_pair") == F.col("__t2"), F.lit(1.0)).otherwise(
        F.round(F.log(p_ab / (p_a * p_b)) / -F.log(p_ab), 6)
    )
    scored = j.select("w1", "w2", "n_pair", npmi.alias("npmi"))
    w = Window.orderBy(
        F.col("npmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
    )


def top_tokens(df, text_col: str, k: int = 100, by_doc_freq: bool = False):
    """Global top-``k`` tokens: ``(token, n)`` ordered by count desc,
    token asc (deterministic at the cut).  ``by_doc_freq`` counts each
    token once per document instead of every occurrence.

    Explode -> hash aggregate (map-side partial combine carries one
    partial count per distinct token per partition, never raw tokens)
    -> TakeOrdered top-k on the driver.  The classic vocabulary /
    heavy-hitter sweep.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = tokenize(F.col(text_col))
    if by_doc_freq:
        toks = F.array_distinct(toks)
    exploded = df.select(F.explode(toks).alias("token"))
    counts = exploded.groupBy("token").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def fingerprint_md5(text: Column) -> Column:
    """Portable deterministic document fingerprint (md5 hex).  Used for
    exact dedup keys; identical in any engine (the DuckDB oracle's md5
    matches bit-for-bit)."""
    return F.md5(text)


def fingerprint_xxhash(text: Column) -> Column:
    """Fast 64-bit fingerprint (xxhash64) — the scale path for exact
    dedup keys; engine-specific, so oracle checks use fingerprint_md5."""
    return F.xxhash64(text)


# Gopher-style rule panel (Rae et al. 2021, "Scaling Language Models",
# appendix A1.1 quality heuristics) — the standard pretraining-corpus
# quality gate.  Fixed thresholds, pure Column expressions, one map
# stage over the corpus; every signal is SQL-expressible so the DuckDB
# oracle recomputes the panel verbatim.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(df, id_col: str, text_col: str):
    """Per-document Gopher rule signals + the combined keep flag.

    Columns: n_words, mean_word_len, frac_alpha_words, symbol_ratio,
    bullet_line_frac, stop_hits, gopher_keep.  ``gopher_keep`` is the
    conjunction of the published bounds (50 <= words <= 100k, mean word
    length in [3, 10], >= 80% alphabetic words, < 10% symbol marks,
    < 90% bullet lines, >= 2 distinct stopwords).

    Scale shape: no shuffle, no UDF — a projection over the corpus scan;
    at 100 TB this pipelines with whatever runs next.
    """
    text = F.col(text_col)
    toks = tokenize(text)
    n = F.size(toks)
    nd = n.cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    mean_word_len = F.round(
        F.when(n > 0, sum_len.cast("double") / nd).otherwise(F.lit(0.0)), 6
    )
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    frac_alpha = F.round(
        F.when(n > 0, n_alpha_words.cast("double") / nd).otherwise(F.lit(0.0)), 6
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.round(
        F.when(n > 0, (n_hash + n_ellipsis).cast("double") / nd).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike("^\\s*[-*•]")))
    bullet_frac = F.round(
        F.when(n_lines > 0, n_bullet.cast("double") / n_lines).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    keep = (
        (n >= 50)
        & (n <= 100_000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (frac_alpha >= 0.8)
        & (symbol_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (stop_hits >= 2)
    ).cast("int")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        keep.alias("gopher_keep"),
    )


def char_ngram_fingerprints(
    text: Column, k: int = 8, mod: int = 16
) -> Column:
    """Rolling-hash document fingerprints (mod-p k-gram selection).

    Classic fingerprinting for copy detection (the selection rule of
    Manber 1994 / the baseline winnowing compares against, Schleimer et
    al. 2003 §2): hash EVERY character k-gram, keep the ~1/mod subset
    whose hash ≡ 0 (mod ``mod``).  Two documents sharing any run of
    ≥ k chars share fingerprints with probability ~1 - (1-1/mod)^runlen
    — robust to small edits in a way whole-document hashes are not.

    Portable hash (md5-derived 56-bit int) so an independent engine can
    recompute the selection bit-for-bit.  Pure Column expressions: the
    k-gram walk is a per-row ``transform`` over an index sequence — no
    shuffle, no UDF; output is the sorted distinct fingerprint array.
    """
    lowered = F.lower(text)
    n = F.length(lowered)
    # guard: Spark sequence(1, stop) DESCENDS when stop < 1 — short
    # texts must yield the empty array, not [1, 0]
    grams = F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.substring(lowered, i, k),
        )
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 14), 16, 10).cast("long"),
    )
    return F.array_sort(
        F.array_distinct(F.filter(hashes, lambda h: h % mod == 0))
    )


# long-gram (k > 8) winnowing hash: two independent Horner
# polynomials mod 31-bit primes, combined h1 * P2 + h2 (< 2^62).
# Shared by the Column and table forms AND replayable in plain SQL
# (all arithmetic non-negative, % == pmod) — unlike the pre-r11
# md5-of-substring fallback, it composes from per-char codes, so the
# table form never ships the document string per char row.
_WINNOW_P1 = 2147483647  # 2^31 - 1 (Mersenne)
_WINNOW_P2 = 2147483629
_WINNOW_B1 = 131
_WINNOW_B2 = 137


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
    MOSS algorithm): the GUARANTEED-detection upgrade of
    :func:`char_ngram_fingerprints`'s mod-p selection.  Text is
    normalized to its alphanumeric stream, every char k-gram is
    hashed, and from each window of ``w`` consecutive hashes the
    minimum is selected (rightmost on ties — the paper's rule, which
    makes selection positions consistent across documents).  Any
    shared substring of length >= k + w - 1 is then PROVABLY caught by
    a shared fingerprint, while expected density stays ~2/(w+1) — the
    property mod-p selection lacks (it can miss arbitrarily long
    overlaps whose grams all hash != 0).

    Returns the distinct selected ``(h, p)`` pairs sorted by (hash,
    position) — ``p`` is the 1-based k-gram position in the normalized
    stream, kept because positional fingerprints are what plagiarism /
    contamination span-matching consumes.  For ``k <= 8`` the "hash"
    is the exact base-128 ASCII encoding of the gram (fits 2^56,
    collision-free, portable by construction — every engine agrees on
    integer arithmetic); ``k > 8`` uses two independent Horner
    polynomial hashes mod 31-bit primes combined into one ~62-bit
    value (collision odds ~ g^2/2^62; identical arithmetic in the
    table form and replayable in plain SQL).  Pure Column expressions — the per-window scan is
    ``zip_with`` over an O(w) slice (O(g*w) per doc, never the
    O(g*w*n) an ``element_at`` walk would cost), no shuffle, no UDF.
    This single-Column form is the readable REFERENCE; corpus-scale
    use goes through :func:`winnow_fingerprint_table` (staged, no
    re-evaluation blowup).
    """
    # NULL text behaves like '' (empty fps array) — same contract as
    # winnow_fingerprint_table, which coalesces before exploding
    s = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))),
                         "[^a-z0-9]", "")
    n = F.length(s)
    g = n - (k - 1)  # number of k-grams
    if k <= 8:
        hashes = F.transform(
            F.sequence(F.lit(1), g),
            lambda i: F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc * 128
                + F.ascii(F.substring(s, i + j, 1)),
            ),
        )
    else:
        # long grams: the shared double Horner polynomial hash — the
        # SAME arithmetic as winnow_fingerprint_table's k > 8 path, so
        # the two forms stay interchangeable at any k
        def _poly(i, base, prime):
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: F.pmod(
                    acc * F.lit(base) + F.ascii(F.substring(s, i + j, 1)),
                    F.lit(prime),
                ),
            )

        hashes = F.transform(
            F.sequence(F.lit(1), g),
            lambda i: _poly(i, _WINNOW_B1, _WINNOW_P1)
            * F.lit(_WINNOW_P2)
            + _poly(i, _WINNOW_B2, _WINNOW_P2),
        )
    init = F.struct(
        F.lit((1 << 62)).cast("long").alias("h"),
        F.lit(0).cast("long").alias("p"),
    )
    sel = F.transform(
        F.sequence(F.lit(1), g - (w - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                F.slice(hashes, j, w),
                F.transform(
                    F.sequence(F.lit(0), F.lit(w - 1)), lambda o: j + o
                ),
                lambda h, p: F.struct(
                    h.alias("h"), p.cast("long").alias("p")
                ),
            ),
            init,
            # <= keeps the RIGHTMOST minimum (later equal wins)
            lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
        ),
    )
    empty = F.array().cast("array<struct<h:bigint,p:bigint>>")
    # sequence(1, stop) DESCENDS for stop < 1: short texts must yield
    # the empty array (same guard as char_ngram_fingerprints)
    return F.when(g < F.lit(w), empty).otherwise(
        F.array_sort(F.array_distinct(sel))
    )


def winnow_fingerprint_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """DataFrame form of :func:`winnow_fingerprints` — the one to use
    on a corpus.  The single-Column form pays interpreted-HOF cost per
    gram per pass (and would re-inline the hash array into every
    window without staging); here the char stream is EXPLODED and the
    whole selection runs as codegen'd window functions:

    - gram "hash" assembled from ``lead(code, j)`` over the doc
      partition: k <= 8 is the exact base-128 encoding (fits 2^56,
      collision-free); k > 8 composes TWO independent Horner
      polynomial hashes mod 31-bit primes into one ~62-bit value —
      every char row carries O(1) bytes at ANY k (the pre-r11
      md5-of-substring fallback shipped the whole document per char
      row, O(n^2) shuffle bytes per doc — VERDICT r10 Missing #4);
    - window minimum with the paper's rightmost tie-break = ONE
      ``min(struct(h, BIG - pos))`` over a ``rowsBetween(0, w-1)``
      frame (struct ordering: h ascending, then pos DESCENDING via the
      complement — no second pass);
    - dedup via groupBy on the selected (h, p) pairs.

    Measured 4x over the staged-HOF form at sf0.1 (16 s -> ~4 s for
    13.5M grams): the per-element work moves from interpreted lambda
    evaluation into whole-stage codegen, at the cost of one shuffle of
    the char rows (doc-partitioned windows), which is the right trade
    on every corpus bigger than a driver toy.  Returns ``(id, n_grams,
    fps)`` with ``fps`` the sorted distinct (h, p) structs."""
    from pyspark.sql import Window

    s = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]", ""
    )
    base = df.select(F.col(id_col).alias("id"), s.alias("__s"))
    codes = F.transform(
        F.split(F.col("__s"), ""),
        lambda c: F.ascii(c).cast("long"),
    )
    rows = base.select(
        "id", F.posexplode(codes).alias("pos", "c")
    )
    wlead = Window.partitionBy("id").orderBy("pos")
    if k <= 8:
        # exact base-128 gram encoding (fits 2^56, collision-free)
        h = F.col("c") * F.lit(128 ** (k - 1)).cast("long")
        for j in range(1, k):
            h = h + F.lead("c", j).over(wlead) * F.lit(
                128 ** (k - 1 - j)
            ).cast("long")
    else:
        # long grams: TWO independent Horner polynomial hashes mod
        # 31-bit primes, combined as h1 * p2 + h2 (< 2^62).  Composed
        # from lead(code) columns, so each char row carries O(1) bytes
        # — never the document string (the pre-r11 md5-of-substring
        # fallback shipped the whole doc on every char row, O(n^2)
        # shuffle bytes per doc).  Collision odds ~ g^2 / 2^62 over
        # the ~62-bit pair — negligible at any realistic corpus; the
        # winnowing guarantee (shared substrings share a fingerprint)
        # is unconditional, only spurious EXTRA matches are possible.
        h1 = F.col("c")
        h2 = F.col("c")
        for j in range(1, k):
            cj = F.lead("c", j).over(wlead)
            h1 = F.pmod(h1 * F.lit(_WINNOW_B1) + cj, F.lit(_WINNOW_P1))
            h2 = F.pmod(h2 * F.lit(_WINNOW_B2) + cj, F.lit(_WINNOW_P2))
        h = h1 * F.lit(_WINNOW_P2) + h2
    grams = rows.select(
        "id", "pos", h.alias("h")
    ).filter(F.col("h").isNotNull())
    # rightmost-tie window min in one frame aggregate: struct ordering
    # is (h asc, BIG - pos asc) = (h asc, pos desc)
    BIG = 1 << 40
    wmin = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    )
    wall = Window.partitionBy("id")
    sel = (
        grams.select(
            "id",
            "pos",
            F.min(
                F.struct(
                    F.col("h").alias("h"),
                    (F.lit(BIG) - F.col("pos")).alias("np"),
                )
            )
            .over(wmin)
            .alias("m"),
            F.max("pos").over(wall).alias("__gmax"),
        )
        # only FULL windows select a fingerprint
        .filter(F.col("pos") <= F.col("__gmax") - (w - 1))
        .select(
            "id",
            F.col("m.h").alias("h"),
            (F.lit(BIG) - F.col("m.np") + 1).cast("long").alias("p"),
        )
        .distinct()
    )
    agg = sel.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.array_sort(
            F.collect_list(F.struct(F.col("h"), F.col("p")))
        ).alias("fps"),
    )
    n_grams = base.select(
        "id",
        F.greatest(
            F.length("__s") - F.lit(k - 1), F.lit(0)
        ).cast("long").alias("n_grams"),
    )
    empty = F.array().cast("array<struct<h:bigint,p:bigint>>")
    return n_grams.join(agg, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce(F.col("fps"), empty).alias("fps"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for dedup keys: lowercase, collapse
    all whitespace runs to single spaces, trim.  The standard prep step
    before exact-hash dedup so formatting variants collapse to one key.
    Pure Column expression; engine-portable (same regex semantics in
    Java regex and RE2).
    """
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


# entity map shared by the Spark implementation and the DuckDB oracle:
# chained literal replaces, applied AFTER tag removal, numeric last
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: '&amp;lt;' must become '&lt;' literally
]


def strip_html(text: Column) -> Column:
    """Boilerplate text extraction for web corpora: remove
    ``<script>``/``<style>`` blocks wholesale, strip remaining tags
    and HTML comments, decode the common entities, and collapse
    whitespace runs.  Pure projection (three regexp_replace passes +
    literal replaces) — zero shuffle, whole-stage codegen; the regexes
    avoid lookarounds so any RE2-class engine (and the DuckDB oracle)
    replays them byte-identically.

    This is the cheap deterministic layer of HTML cleaning (what C4
    did); DOM-aware readability extraction (trafilatura/jusText) is a
    Pandas-UDF plug-in on top, like the multimodal codecs.
    """
    # (?is): case-insensitive, dot matches newline.  script/style are
    # two separate passes (a backreference form would not be
    # RE2-portable, breaking oracle replay)
    out = F.regexp_replace(text, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, repl in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


# block-level elements whose tags delimit candidate text blocks for
# readability extraction (br included: it is how nav bars separate
# link runs)
_BLOCK_TAG_RE = (
    r"(?is)</?(p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    r"aside|header|footer|nav|blockquote|br)\b[^>]*>"
)
_ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>([^<]*)</a\s*>"


def _clean_block(line: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse ONE block (the
    per-line tail of :func:`strip_html`'s pipeline)."""
    t = F.regexp_replace(line, r"(?s)<[^>]*>", " ")
    for ent, repl in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _link_chars(line: Column) -> Column:
    """Characters of anchor text in ONE block (nested inline tags cut
    a link's measured text at the first child tag — a documented
    simplification that keeps the regex RE2-portable, no backrefs)."""
    return F.aggregate(
        F.regexp_extract_all(line, F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
        F.lit(0),
        lambda acc, s: acc + F.length(s),
    )


def _stopword_density(text: Column, stopwords) -> Column:
    """Fraction of a cleaned block's tokens that are stopwords —
    jusText's linguistic prose signal.  Token = maximal [a-z]+ run of
    the lowercased text; empty blocks score 0."""
    toks = F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda t: t != F.lit("")
    )
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def extract_main_text(
    html: Column,
    min_chars: int = 40,
    max_link_density: float = 0.3,
    stopwords=None,
    min_stopword_density: float = 0.2,
) -> Column:
    """Readability-style MAIN-CONTENT extraction (the jusText/Arc90
    core heuristic, simplified to a closed form): split the page into
    blocks at block-level tags, keep blocks that carry at least
    ``min_chars`` of cleaned text AND whose link density (anchor-text
    chars / cleaned-text chars) is at most ``max_link_density``, and
    join the survivors.  Navigation bars, related-links boxes, footers
    and share buttons are short and/or link-dense — exactly what the
    two thresholds drop; article paragraphs survive.

    With a ``stopwords`` list the full jusText criterion applies:
    surviving blocks must ALSO have stopword density (stopword tokens /
    tokens) of at least ``min_stopword_density`` — this is what drops
    link-free non-prose chrome (copyright footers, byline stubs,
    spec tables) that length and link density alone let through.

    Pure Column expressions end to end (regexes are RE2-portable — no
    backreferences or lookaround — so the DuckDB oracle replays the
    pipeline byte-identically): zero shuffle, zero UDF, runs in the
    scan stage at any corpus size.  This is the closed-form layer of
    the extraction stack sketched in :func:`strip_html`'s docstring;
    a DOM-aware extractor (trafilatura) remains a Pandas-UDF plug-in
    for pages whose structure defeats the block heuristic.
    """
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    if not 0 <= max_link_density <= 1:
        raise ValueError("max_link_density must be in [0, 1]")
    if not 0 <= min_stopword_density <= 1:
        raise ValueError("min_stopword_density must be in [0, 1]")
    # materialize ONCE up front: a generator input would be exhausted
    # by this emptiness guard and the later per-word filter would see
    # an empty stopword list — exactly the silent-drop the guard exists
    # to prevent (r6 advice)
    stopwords = list(stopwords) if stopwords is not None else None
    if stopwords is not None and not stopwords:
        raise ValueError(
            "stopwords must be a non-empty list (an empty list makes "
            "every block's density 0 and silently drops the whole "
            "corpus); pass stopwords=None to disable the criterion"
        )
    x = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, _BLOCK_TAG_RE, "\n")
    # clean each block ONCE: the lambdas are interpreted (no codegen),
    # so re-deriving the cleaned text per criterion would multiply the
    # regex/replace work ~4x (review finding) — stage struct(raw, t)
    pairs = F.transform(
        F.split(x, "\n"),
        lambda l: F.struct(l.alias("raw"), _clean_block(l).alias("t")),
    )

    def good(p):
        t = p["t"]
        cond = (F.length(t) >= F.lit(int(min_chars))) & (
            _link_chars(p["raw"]).cast("double")
            <= F.lit(float(max_link_density)) * F.length(t)
        )
        if stopwords is not None:
            cond = cond & (
                _stopword_density(t, list(stopwords))
                >= F.lit(float(min_stopword_density))
            )
        return cond

    keep = F.filter(pairs, good)
    return F.array_join(F.transform(keep, lambda p: p["t"]), "\n")


# Knuth's multiplicative constant (2654435761 = 2^32 * golden ratio):
# spreads consecutive bucket ids over the weight modulus.  The weight
# modulus 10007 (prime) keeps every intermediate an exact int64, so
# the score is bit-reproducible in any engine before the single final
# float expression.
_HQ_MULT = 2654435761
_HQ_MOD = 10007


def hashed_token_weights(
    toks: Column, n_buckets: int = 4096, seed: int = 13
) -> Column:
    """Integer weight per token (the classifier's lookup, exposed so
    dashboards aggregate the SAME weights the scorer uses): md5 bucket
    -> ``(bucket * _HQ_MULT + seed) % _HQ_MOD``.  All int64."""
    return F.transform(
        toks,
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % n_buckets * F.lit(_HQ_MULT) + F.lit(seed)
        ) % _HQ_MOD,
    )


def hashed_quality_score(
    text: Column,
    n_buckets: int = 4096,
    seed: int = 13,
    scale: float = 8.0,
) -> Column:
    """fastText-style linear quality classifier score in [0, 1]: hash
    each token into one of ``n_buckets`` buckets (md5-derived, engine-
    portable), look up a deterministic pseudo-random weight per bucket,
    and squash the mean weight through a sigmoid.  The exact shape of
    the production quality filters (CCNet's fastText classifier, the
    GPT-3/LLaMA quality LR models): a hashed bag-of-words dot a weight
    vector.  Here the weights are derived from the bucket id by a
    multiplicative-hash LCG instead of being learned — swap
    ``bucket_weight`` for a trained broadcast array and the plan is
    unchanged.

    Pure Column expression — per-row transform/aggregate fold, no
    shuffle, no UDF, no model file to distribute: the "weight lookup"
    is arithmetic on the bucket id, so a 100 TB scoring pass is a
    map-only scan.  The token weight sum is INTEGER (exact in any
    engine); only the final mean/sigmoid is float, rounded by the
    caller.  Empty token lists score NULL (no tokens -> no signal).

    Returns ``sigmoid(scale * (mean_weight/_HQ_MOD - 0.5))`` where
    ``mean_weight`` is the average of ``(bucket * _HQ_MULT + seed)
    % _HQ_MOD`` over tokens.
    """
    toks = tokenize(text)
    s = F.aggregate(
        hashed_token_weights(toks, n_buckets, seed),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size(toks)
    mean = s / (float(_HQ_MOD) * n) - F.lit(0.5)
    return F.when(
        n > 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(float(scale)) * mean))
    )


# C0/C1-ish control characters (keeping \t \n \r, which are whitespace
# semantics, not noise); identical character-class semantics in Java
# regex and RE2
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_unicode(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column.

    The one text-cleaning step Spark has no built-in for — composition
    tables need the UCD, so this is an Arrow-batched ``pandas_udf``
    over ``unicodedata.normalize`` (vectorized transfer, no
    row-at-a-time pickling; the slow path, but a narrow one: a pure
    per-row projection that fuses into the scan stage, no shuffle).
    NFC is stable across Unicode versions for assigned codepoints, so
    the result is reproducible against any conformant engine
    (DuckDB's ``nfc_normalize`` agrees bit-for-bit).
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return _norm(text)


def clean_text(text: Column, form: str = "NFC") -> Column:
    """Canonical ingest cleaning: strip control characters, Unicode-
    normalize (``form``), collapse whitespace runs to single spaces,
    trim.  The mojibake-adjacent prep every web-scraped corpus needs
    before hashing or tokenizing — two variants of the same page that
    differ only in combining-character encoding or stray control bytes
    collapse to one dedup key.  Control strip and whitespace collapse
    are JVM-side regexes; only the normalization itself crosses to
    Python (see ``normalize_unicode``).
    """
    stripped = F.regexp_replace(text, _CONTROL_CLASS, "")
    return F.trim(
        F.regexp_replace(normalize_unicode(stripped, form), "\\s+", " ")
    )


# sentence pieces: greedy runs of non-terminators plus their trailing
# terminator run.  No lookarounds, so Java regex (Spark) and RE2
# (DuckDB et al.) tokenize identically.
_SENTENCE_PIECE = "[^.!?]+[.!?]*"


def split_sentences(text: Column) -> Column:
    """Array of sentences (terminator-attached, trimmed, empties
    dropped).  The chunking boundary every training pipeline prefers
    over blind token windows; pure per-row projection, no shuffle.
    Heuristic by design (no abbreviation model) but engine-portable:
    the piece regex avoids lookarounds, so an oracle reproduces the
    split byte-for-byte.
    """
    pieces = F.regexp_extract_all(text, F.lit(_SENTENCE_PIECE), 0)
    # NOT F.transform(pieces, F.trim): transform inspects callable
    # arity and F.trim is binary (col, trim_chars) since Spark 4, so
    # it would be called as trim(x, i) — trimming the INDEX character
    trimmed = F.transform(pieces, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: s != "")


def dedup_lines(
    text: Column,
    sep_regex: str = "\\n+",
    join_sep: str = "\n",
) -> Column:
    """WITHIN-document repeated-line removal: keep each distinct line
    at its first occurrence, preserving order — the C4-style heuristic
    that strips nav menus and footers repeated inside one page.  (The
    cross-corpus variant is ``operators.dedup.dedup_paragraphs``.)

    Pure Column expression: split, first-occurrence filter via
    ``array_position``, rejoin — no shuffle, no UDF.  The position
    scan is O(lines²) per document, a per-row cost bounded by page
    size, not corpus size; at 100 TB it stays embarrassingly parallel.
    """
    arr = F.filter(F.split(text, sep_regex), lambda x: x != "")
    kept = F.filter(
        arr, lambda x, i: F.array_position(arr, x) == i + F.lit(1)
    )
    return F.array_join(kept, join_sep)


def tag_topics(text: Column, topics: dict) -> Column:
    """Dictionary-based taxonomy tagging: per-document hit counts for
    each topic's term list, as a sorted ``array<struct<topic, n_hits>>``
    with zero-hit topics omitted.

    The keyword-dictionary classifier (FlashText / curated-taxonomy
    tagging) every corpus triages with before any model-based labeling.
    ``topics`` maps topic name -> list of lowercase terms.  Pure Column
    expression — the dictionary is compiled into the plan as array
    literals, so tagging is MAP-ONLY: zero shuffle, zero joins, scales
    to any corpus size (the dictionary is small by construction; for a
    100k+-term gazetteer, explode tokens and broadcast-join a term ->
    topic table instead — that path costs one shuffle on the doc key).

    Matching is exact-token (the tokenize() tokens), so multi-word
    terms are not matched — split them into their tokens or pre-fuse
    n-grams upstream.
    """
    if not topics:
        raise ValueError("topics must be non-empty")
    for name, terms in topics.items():
        if not terms:
            raise ValueError(f"topic {name!r} has no terms")
    toks = tokenize(text)
    entries = []
    for name in sorted(topics):
        terms_lit = F.array(*[F.lit(t) for t in sorted(set(topics[name]))])
        n = F.size(F.filter(toks, lambda t: F.array_contains(terms_lit, t)))
        entries.append(
            F.struct(F.lit(name).alias("topic"), n.cast("long").alias("n_hits"))
        )
    arr = F.array(*entries)
    # NULL text propagates NULL (without the guard, size(NULL) = -1
    # would silently produce an empty tag list instead)
    return F.when(text.isNull(), F.lit(None)).otherwise(
        F.filter(arr, lambda e: e["n_hits"] > 0)
    )


# --- C4 corpus cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning", §2.2) ---------------------------------------------
# The canonical web-corpus heuristic filter set.  Line rules: keep only
# lines ending in a terminal punctuation mark, with at least
# ``min_words`` words, and not mentioning "javascript".  Page rules:
# drop pages containing "lorem ipsum", a curly brace, or any badword,
# and pages whose retained text has fewer than ``min_sentences``
# sentence terminators.  Everything below is a pure Column expression
# (map-only, whole-stage codegen, zero shuffle) and every regex is
# RE2-portable so an independent engine can replay it byte-identically.

# ASCII terminal punctuation (C4 also accepts the closing quotation
# mark; the ASCII double quote stands in for its Unicode variants)
_C4_TERMINAL_RE = '[.!?"]$'


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """The C4 LINE filter: split ``text`` on newlines and keep the
    (trimmed) lines that end in terminal punctuation, contain at least
    ``min_words`` whitespace-separated words, and do not contain
    "javascript" (case-insensitive).  Returns the array of kept lines.
    """

    def _keep(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.filter(F.split(t, "\\s+"), lambda w: w != F.lit(""))
        return (
            t.rlike(_C4_TERMINAL_RE)
            & (F.size(words) >= F.lit(int(min_words)))
            & ~F.lower(t).contains("javascript")
        )

    # explicit one-arg lambda: passing F.trim directly would bind the
    # HOF's element INDEX to trim()'s optional trim-chars argument.
    # Split on \r?\n (not bare \n): Java's '$' matches BEFORE a final
    # '\r' while RE2's does not, and F.trim strips only spaces — a
    # CRLF corpus would otherwise diverge from a strict-RE2 replay
    # and keep stray '\r' bytes in text_c4
    return F.transform(
        F.filter(F.split(text, "\\r?\\n"), _keep), lambda ln: F.trim(ln)
    )


def c4_clean(
    df,
    text_col: str,
    badwords=(),
    min_words: int = 5,
    min_sentences: int = 3,
):
    """Apply the full C4 cleaning pass to ``df[text_col]``.

    Adds columns:

    - ``text_c4``      — retained lines joined by newline
    - ``n_lines_kept`` / ``n_lines_dropped`` (long)
    - ``n_sentences``  — terminal-mark count (``.!?``) in the retained
      text, C4's sentence proxy (long)
    - ``c4_keep``      — page survives (boolean)
    - ``c4_drop_reason`` — first matching page rule in the fixed order
      ``lorem_ipsum`` > ``curly_brace`` > ``bad_words`` >
      ``too_few_sentences``, else NULL

    Page-level content rules (lorem ipsum / brace / badwords) test the
    ORIGINAL page text — a page advertising placeholder or code content
    is dropped even if the offending line would have been filtered —
    while the sentence floor tests the RETAINED text, per the paper's
    pipeline order.  Map-only: at 100 TB this runs at parquet-scan
    speed with zero shuffle and full predicate pushdown upstream.
    """
    text = F.col(text_col)
    kept = c4_kept_lines(text, min_words=min_words)
    text_c4 = F.array_join(kept, "\n")
    n_kept = F.size(kept)
    n_total = F.size(F.split(text, "\\r?\\n"))
    # global replace is Spark's default; the DuckDB replay needs 'g'
    n_sent = F.length(text_c4) - F.length(
        F.regexp_replace(text_c4, "[.!?]", "")
    )
    low = F.lower(text)
    lorem = low.contains("lorem ipsum")
    brace = text.contains("{")
    if badwords:
        # escape each badword (re.escape output is Java- and
        # RE2-safe: only non-alphanumerics gain a backslash) so a
        # list entry with regex metacharacters ('c++', 'a$$', '(')
        # can neither mis-match nor blow up pattern compilation at
        # action time.  \b only where the badword's EDGE is a word
        # character — after a non-word edge ('+', '$') \b could never
        # match, silently disabling the word (no lookarounds: RE2
        # portability)
        import re as _re

        def _lit(w: str) -> str:
            pre = "\\b" if _re.match(r"\w", w[0]) else ""
            suf = "\\b" if _re.match(r"\w", w[-1]) else ""
            return pre + _re.escape(w) + suf

        terms = [w for w in sorted(set(badwords)) if w]
        if terms:
            bad = low.rlike("(" + "|".join(_lit(w) for w in terms) + ")")
        else:
            # badwords=("",) would otherwise build "()" — an empty
            # alternation matching EVERY page
            bad = F.lit(False)
    else:
        bad = F.lit(False)
    reason = (
        # a NULL page would otherwise null every rule out and fall
        # through to keep=true — flag it explicitly
        F.when(text.isNull(), F.lit("null_text"))
        .when(lorem, F.lit("lorem_ipsum"))
        .when(brace, F.lit("curly_brace"))
        .when(bad, F.lit("bad_words"))
        .when(n_sent < F.lit(int(min_sentences)), F.lit("too_few_sentences"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        "*",
        text_c4.alias("text_c4"),
        n_kept.cast("long").alias("n_lines_kept"),
        (n_total - n_kept).cast("long").alias("n_lines_dropped"),
        n_sent.cast("long").alias("n_sentences"),
        reason.isNull().alias("c4_keep"),
        reason.alias("c4_drop_reason"),
    )


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """64-bit hashes of the word ``n``-gram shingles WITHOUT building
    shingle strings: tokens hash once, then consecutive windows fold
    left via ``xxhash64(acc, next)`` over ``n-1`` zip_with passes —
    arrays stream pairwise instead of per-window ``slice`` +
    ``concat_ws`` (which costs O(window) per shingle and measured ~9x
    slower at corpus scale).  Values are NOT ``xxhash64(shingle
    string)`` — use these as INTERNAL join/dedup keys where both sides
    hash the same way, never where an oracle replays string shingles.
    NULL text propagates NULL; fewer than ``n`` tokens yields [].
    """
    if n < 1:
        raise ValueError("shingle size must be >= 1")
    harr = F.transform(tokenize(text), lambda t: F.xxhash64(t))
    acc = harr
    sz = F.size(harr)
    for k in range(1, n):
        nxt = F.slice(harr, k + 1, F.greatest(sz - k, F.lit(1)))
        acc = F.zip_with(
            acc,
            nxt,
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(), F.xxhash64(a, b)
            ),
        )
    return F.filter(acc, lambda x: x.isNotNull())


# --- corpus statistics for training-data panels --------------------------
# Per-document information signals (entropy, readability) plus
# corpus-level distribution fits (Zipf) and tokenizer-efficiency
# metrics — the quality/quantity dashboard a data pipeline reads before
# committing a crawl slice to a training mix.


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the classic cheap junk detector: base64 blobs and
    minified code score high, template spam and repeated-char padding
    score low.

    Per-row, zero shuffle: sort the char array, then ONE aggregate
    fold accumulates ``Σ run·ln(run)`` over runs of equal neighbors
    (run lengths ARE the character counts), and
    ``H = (ln n − Σ run·ln(run)/n) / ln 2``.  No explode — the 100 TB
    cost is O(chars log chars) per row inside whole-stage codegen,
    same shape as :func:`longest_equal_run`.  Engine-portable: any
    replay computing per-char counts gets the identical formula
    (callers should round, 6 dp convention).  Empty/NULL text → 0.0.
    """
    s = F.array_sort(F.split(text, ""))
    n = F.size(s)
    fold = F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when((x == acc["prev"]) & (acc["run"] > 0), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(
                (x == acc["prev"]) & (acc["run"] > 0), acc["acc"]
            )
            .otherwise(
                acc["acc"]
                + F.when(
                    acc["run"] > 0,
                    acc["run"].cast("double")
                    * F.log(acc["run"].cast("double")),
                ).otherwise(F.lit(0.0))
            )
            .alias("acc"),
        ),
        lambda acc: acc["acc"]
        + F.when(
            acc["run"] > 0,
            acc["run"].cast("double") * F.log(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0)),
    )
    nd = n.cast("double")
    return F.when(
        n > 0, (F.log(nd) - fold / nd) / F.lit(math.log(2.0))
    ).otherwise(F.lit(0.0))


def with_char_entropy(
    df, text_col: str, out_col: str = "entropy_bits", dp: int = 6
):
    """Staged df-level form of :func:`char_entropy` for hot paths,
    using a run-BOUNDARY formulation instead of the per-char struct
    fold: stage the sorted char array once behind a Generate barrier
    (lambda-bearing trees are CSE-exempt, so unstaged every reference
    would re-sort — the stage_expr lesson; the unstaged boundary form
    measured 33x SLOWER for exactly that reason), find the indices
    where ``s[i] != s[i-1]`` with native array ops, turn consecutive
    boundaries into run lengths with ``zip_with``, and fold
    ``Σ run·ln(run)`` over those.  The interpreted per-element work
    drops from a 4-field struct rebuild per char to one comparison
    per char plus one multiply-add per DISTINCT run — 2.4x faster
    than the struct fold on the sf0.1 corpus and bit-identical
    (runs are visited in the same sorted order, so float
    accumulation order is unchanged)."""
    from pandance_spark._kernel import stage_expr

    d = stage_expr(
        df, F.array_sort(F.split(F.col(text_col), "")), "__ent_s"
    )
    s = F.col("__ent_s")
    n = F.size(s)
    bounds = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.get(s, i) != F.get(s, i - F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    runs = F.zip_with(
        F.concat(F.array(F.lit(0)), bounds),
        F.concat(bounds, F.array(n)),
        lambda a, b: (b - a).cast("long"),
    )
    tot = F.when(
        n > 0,
        F.aggregate(
            runs,
            F.lit(0.0),
            lambda a, r: a + r.cast("double") * F.log(r.cast("double")),
        ),
    ).otherwise(F.lit(0.0))
    fold = F.struct(n.cast("long").alias("n"), tot.alias("tot"))
    staged = stage_expr(d, fold, "__ent").drop("__ent_s")
    st = F.col("__ent")
    nd = st["n"].cast("double")
    h = F.when(
        st["n"] > 0,
        (F.log(nd) - st["tot"] / nd) / F.lit(math.log(2.0)),
    ).otherwise(F.lit(0.0))
    return staged.withColumn(out_col, F.round(h, dp)).drop("__ent")


def flesch_reading_ease(text: Column) -> Column:
    """Flesch reading ease (Flesch 1948): ``206.835 − 1.015·(words /
    sentences) − 84.6·(syllables / words)``.  Words are whitespace
    tokens, sentences are runs of terminal punctuation ``[.!?]+``
    (floored at 1), and syllables use the standard vowel-group
    heuristic — each maximal ``[aeiouy]+`` run in the lowercased text
    counts one syllable (runs never span words: separators are
    non-vowels, so the whole-text count equals the per-word sum).

    Pure Column expression (three regex counts), map-only, and every
    regex is RE2-portable for independent replay.  Tokenless text →
    NULL (no words to score).
    """
    low = F.lower(text)
    words = F.size(
        F.filter(F.split(low, r"\s+"), lambda w: w != F.lit(""))
    ).cast("double")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("double")
    syllables = F.size(
        F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("double")
    return F.when(
        words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words),
    )


def zipf_fit(df, text_col: str, top_r: int = 200):
    """Least-squares fit of the corpus' token frequency distribution to
    Zipf's law: regress ``ln(freq)`` on ``ln(rank)`` over the top
    ``top_r`` token types and return ONE row ``(n_types, n_tokens,
    slope, intercept, r2)`` (9 dp).  A healthy natural-language corpus
    sits near slope −1; template/boilerplate corpora flatten, spam
    steepens — the one-number drift check before a mix update.

    Shape: one explode → token hash-aggregate (map-side combine: the
    shuffle carries one partial per distinct token per partition, never
    raw tokens), a TakeOrdered ``top_r`` cut (count desc, token asc —
    deterministic at ties), then the closed-form OLS sums over top_r
    rows.  The regression itself is a second tiny aggregate — nothing
    corpus-sized crosses the wire after the first combine.
    """
    if top_r < 2:
        raise ValueError("top_r must be >= 2")
    counts = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.agg(
        F.count("*").alias("n_types"), F.sum("n").alias("n_tokens")
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(
        int(top_r)
    )
    ranked = top.select(
        F.log(
            F.row_number()
            .over(
                Window.orderBy(F.col("n").desc(), F.col("token").asc())
            )
            .cast("double")
        ).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    fit = ranked.agg(
        F.count("*").cast("double").alias("r"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r, sx, sy = F.col("r"), F.col("sx"), F.col("sy")
    cov = F.col("sxy") - sx * sy / r
    varx = F.col("sxx") - sx * sx / r
    vary = F.col("syy") - sy * sy / r
    # degenerate corpora (< 2 distinct types -> varx = 0; empty ->
    # r = 0) must yield NULL fit columns, not a DIVIDE_BY_ZERO under
    # ANSI mode — top_r >= 2 validates the PARAMETER, not the data
    fit_ok = (r >= 2) & (varx > 0)
    return totals.crossJoin(fit).select(
        "n_types",
        "n_tokens",
        F.round(F.when(fit_ok, cov / varx), 9).alias("slope"),
        F.round(
            F.when(fit_ok, (sy - (cov / varx) * sx) / r), 9
        ).alias("intercept"),
        F.round(
            F.when(fit_ok & (vary > 0), (cov * cov) / (varx * vary))
            .when(fit_ok, F.lit(1.0)),
            9,
        ).alias("r2"),
    )


def tokenizer_fertility(df, text_col: str, group_col: str):
    """Tokenizer-efficiency report per ``group_col`` (typically
    language): ``(group, n_docs, n_words, n_pieces, fertility,
    chars_per_piece)`` where pieces are the GPT-2 pre-tokenizer count
    (:func:`bpe_token_count`) and ``fertility = pieces/word`` — THE
    number multilingual tokenizer audits compare across languages
    (high-fertility languages pay more sequence length per word).
    9 dp; one map-side-combinable aggregate, no explode.
    """
    t = F.col(text_col)
    agg = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(t).cast("long")).alias("n_words"),
            F.sum(bpe_token_count(t).cast("long")).alias("n_pieces"),
            F.sum(F.length(t).cast("long")).alias("n_chars"),
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_words",
        "n_pieces",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("n_pieces") / F.col("n_words"),
            ),
            9,
        ).alias("fertility"),
        F.round(
            F.when(
                F.col("n_pieces") > 0,
                F.col("n_chars") / F.col("n_pieces"),
            ),
            9,
        ).alias("chars_per_piece"),
    )


def canary_scan(df, id_col: str, text_col: str, pattern: str):
    """Dataset-canary sweep: find every match of ``pattern`` (a
    RE2-portable regex for planted canary strings / GUIDs) across the
    corpus and aggregate per canary value: ``(canary, n_docs, n_hits,
    first_doc, last_doc)``.  The eval-leak / memorization audit — run
    it before AND after dedup to prove planted canaries survive or die
    as intended.

    Scan shape: regexp_extract_all per row (map-only over the scan,
    multiple hits per doc all kept), explode only MATCHES (canary hits
    are rare — the exploded stream is tiny), then one aggregate.
    Canary-free rows are filtered before the explode, so the shuffle
    carries hits only.
    """
    hits = df.select(
        F.col(id_col).alias("__doc"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(pattern), F.lit(0)
        ).alias("__m"),
    ).filter(F.size("__m") > 0)
    return (
        hits.select("__doc", F.explode("__m").alias("canary"))
        .groupBy("canary")
        .agg(
            F.count_distinct("__doc").alias("n_docs"),
            F.count("*").alias("n_hits"),
            F.min("__doc").alias("first_doc"),
            F.max("__doc").alias("last_doc"),
        )
    )


def script_mix(df, id_col: str, text_col: str):
    """Code-switching / script-mixing report per document — the
    router's second pass after :func:`dominant_script`: a page that is
    60% Latin and 40% Han should reach NEITHER the Latin-only nor the
    CJK pipeline silently.  Lines are the mixing unit (translations
    and boilerplate switch per line, not per char).

    Per document:

    - ``n_lines``       — total lines
    - ``n_scripted``    — lines whose dominant script is not 'none'
    - ``majority_script`` — most common per-line script (count desc,
      name asc ties; 'none' when no line carries script chars)
    - ``n_majority``    — lines of the majority script
    - ``mix_ratio``     — ``1 - n_majority/n_scripted`` (6 dp; 0.0
      for script-free docs) — 0 = monoscript, high = heavy switching
    - ``is_mixed``      — >= 2 distinct scripted line-scripts

    Shape: one explode over lines, the per-line winner via STAGED
    count columns (each script regex scans each line exactly once —
    the with_dominant_script lesson), then two map-side-combinable
    aggregates; the shuffle carries (doc, script) partials, never
    text.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\\r?\\n")).alias("__line"),
    )
    # scored feeds TWO aggregates — without the barrier the explode +
    # 8 regex scans re-evaluate per consumer (measured 3.7 -> ~1 s at
    # sf0.1); the checkpoint holds (id, script) pairs only
    scored = (
        with_dominant_script(lines, "__line", out_col="__s")
        .select(id_col, "__s")
        .localCheckpoint(eager=False)
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("__s") != "none").cast("long")).alias("n_scripted"),
    )
    # winner + distinct-script count from ONE aggregate over the
    # (id, script) counts: min(struct(-n, s)) == (count desc, name
    # asc) — no window, no second pass over maj
    maj = (
        scored.filter(F.col("__s") != "none")
        .groupBy(id_col, "__s")
        .agg(F.count("*").alias("__n"))
    )
    winner_k = maj.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("__n")).alias("nn"), F.col("__s").alias("s")
            )
        ).alias("__w"),
        F.count("*").alias("__k"),
    )
    return (
        per_doc.join(winner_k, id_col, "left")
        .select(
            id_col,
            "n_lines",
            "n_scripted",
            F.coalesce(F.col("__w")["s"], F.lit("none")).alias(
                "majority_script"
            ),
            F.coalesce(-F.col("__w")["nn"], F.lit(0)).cast("long").alias(
                "n_majority"
            ),
            F.round(
                F.when(
                    F.col("n_scripted") > 0,
                    1.0 + F.col("__w")["nn"] / F.col("n_scripted"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mix_ratio"),
            (F.coalesce("__k", F.lit(0)) >= 2).alias("is_mixed"),
        )
    )
