"""Text-analysis function tests (engine extensions, SURVEY.md §2.4)."""

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
    tokenize,
    word_shingles,
)


def test_tokenize_and_count(spark):
    df = spark.createDataFrame(
        [("The cat, the DOG!  42 times",), ("",), ("   ",)], "text string"
    )
    rows = df.select(
        tokenize(F.col("text")).alias("toks"), token_count(F.col("text")).alias("n")
    ).collect()
    assert rows[0]["toks"] == ["the", "cat", "the", "dog", "42", "times"]
    assert rows[0]["n"] == 6
    assert rows[1]["n"] == 0
    assert rows[2]["n"] == 0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []  # shorter than n -> empty set
    with pytest.raises(ValueError):
        word_shingles(F.col("text"), 0)


def test_quality_score_bounds(spark, sf_dir):
    from pandance_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(quality_score(F.col("text")).alias("q"))
    stats = scored.agg(F.min("q"), F.max("q")).first()
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der Hund und die Katze ist das",),
            ("le chat et la maison est les",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_md5_matches_duckdb(spark):
    import duckdb

    texts = ["hello world", "a b c", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["fp"]
        for r in df.select("text", fingerprint_md5(F.col("text")).alias("fp")).collect()
    }
    for t in texts:
        expected = duckdb.sql("SELECT md5(?)", params=[t]).fetchone()[0]
        assert got[t] == expected


def test_distinct_token_ratio(spark):
    from pandance_spark.functions.text import distinct_token_ratio

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a a a a"), (3, ""), (4, "x x y")],
        "id long, text string",
    )
    got = {
        r["id"]: r["v"]
        for r in df.select("id", F.round(distinct_token_ratio(F.col("text")), 4).alias("v")).collect()
    }
    assert got == {1: 1.0, 2: 0.25, 3: 0.0, 4: round(2 / 3, 4)}


def test_top_ngram_ratio(spark):
    from pandance_spark.functions.text import top_ngram_ratio

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab ba ab ba ab -> top 'a b' 3/5
            (2, "w x y z"),       # all distinct -> 1/3
            (3, "t"),             # no bigrams -> 0.0
            (4, ""),              # empty -> 0.0
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["v"]
        for r in df.select("id", F.round(top_ngram_ratio(F.col("text"), 2), 4).alias("v")).collect()
    }
    assert got == {1: 0.6, 2: round(1 / 3, 4), 3: 0.0, 4: 0.0}


def test_redact_pii_and_counts(spark):
    from pandance_spark.functions.text import PII_EMAIL, PII_PHONE, pii_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or call +1 555-123-4567 ok"),
            (2, "no pii here at all"),
            (3, "two mails: a@b.io c@d.net"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id",
        pii_count(F.col("text"), PII_EMAIL).alias("ne"),
        pii_count(F.col("text"), PII_PHONE).alias("np"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()
    got = {r["id"]: r for r in out}
    assert (got[1]["ne"], got[1]["np"]) == (1, 1)
    assert got[1]["red"] == "mail me at [PII] or call [PII] ok"
    assert (got[2]["ne"], got[2]["np"]) == (0, 0)
    assert got[2]["red"] == "no pii here at all"
    assert got[3]["ne"] == 2
    assert got[3]["red"] == "two mails: [PII] [PII]"


def test_top_tokens(spark):
    from pandance_spark.functions.text import top_tokens

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d"), (3, "a c")],
        "id long, text string",
    )
    out = top_tokens(df, "text", k=3).collect()
    assert [(r["token"], r["n"]) for r in out] == [("a", 4), ("b", 3), ("c", 3)]
    out_df = top_tokens(df, "text", k=2, by_doc_freq=True).collect()
    # doc freq: a:2 b:2 c:3 d:1 -> c, then a before b (tie by token asc)
    assert [(r["token"], r["n"]) for r in out_df] == [("c", 3), ("a", 2)]


# ---------------------------------------------------------------- gopher


def test_gopher_signals_values(spark):
    from pandance_spark.functions.text import gopher_signals

    text_pass = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )  # 65 words, all alpha, 5 distinct stopwords
    text_short = "tiny doc"
    text_symbols = " ".join(["ok#tag"] * 60) + " ..."
    text_bullets = "\n".join(["- item one two", "* item three", "• four"])
    df = spark.createDataFrame(
        [
            (1, text_pass),
            (2, text_short),
            (3, text_symbols),
            (4, text_bullets),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_signals(df, "doc_id", "text").collect()
    }
    assert got[1]["n_words"] == 65
    assert got[1]["stop_hits"] == 5
    assert got[1]["gopher_keep"] == 1
    # too few words
    assert got[2]["n_words"] == 2 and got[2]["gopher_keep"] == 0
    # '#' marks push symbol_ratio over 0.1
    assert got[3]["symbol_ratio"] > 0.1 and got[3]["gopher_keep"] == 0
    # every line bulleted
    assert got[4]["bullet_line_frac"] == 1.0 and got[4]["gopher_keep"] == 0


def test_gopher_empty_text_defined(spark):
    from pandance_spark.functions.text import gopher_signals

    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in gopher_signals(df, "doc_id", "text").collect()}
    for r in rows.values():
        assert r["n_words"] == 0
        assert r["mean_word_len"] == 0.0
        assert r["gopher_keep"] == 0


# ---------------------------------------------------- fingerprinting


def test_char_ngram_fingerprints_share_on_common_runs(spark):
    from pandance_spark.functions.text import char_ngram_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("lazy", "busy")  # small edit, long shared runs
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "completely different content here xyz")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", char_ngram_fingerprints(F.col("text"), 8, 4).alias("fps")
        ).collect()
    }
    assert rows[1] & rows[2], "small edit must preserve shared fingerprints"
    overlap_12 = len(rows[1] & rows[2]) / max(len(rows[1] | rows[2]), 1)
    overlap_13 = len(rows[1] & rows[3]) / max(len(rows[1] | rows[3]), 1)
    assert overlap_12 > overlap_13


def test_char_ngram_fingerprints_short_text_empty(spark):
    from pandance_spark.functions.text import char_ngram_fingerprints

    df = spark.createDataFrame(
        [(1, "short"), (2, ""), (3, "exactly8")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["fps"]
        for r in df.select(
            "doc_id", char_ngram_fingerprints(F.col("text"), 8, 1).alias("fps")
        ).collect()
    }
    assert rows[1] == [] and rows[2] == []
    assert len(rows[3]) == 1  # single 8-gram, mod 1 keeps everything


def test_normalize_text_collapses_formatting_variants(spark):
    from pandance_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "  hello world\t"),
            (3, "HELLO\n\nWORLD"),
            (4, "different doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_text(F.col("text")).alias("n")).collect()
    }
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "different doc"


def test_bpe_token_count(spark):
    from pandance_spark.functions.text import bpe_token_count
    from pyspark.sql import functions as F

    cases = [
        # (text, expected GPT-2-style pre-token pieces of the LOWERED text)
        ("Hello, world!", 4),        # 'hello' ',' ' world' '!'
        ("it's 2024-01-01", 7),      # 'it' "'s" ' 2024' '-' '01' '-' '01'
        ("  spaced   out  ", 5),     # '  ' 'spaced' '   ' 'out' '  '
        ("", 0),
        ("don't you'll we've", 6),   # don 't / you 'll / we 've (space-glued)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)


def test_strip_html_matches_expected(spark):
    from pandance_spark.functions.text import strip_html

    html = (
        '<html><!-- c --><style a>p{}</style><body><h1>T</h1>'
        "<p>x &amp;lt; y &nbsp;&quot;q&#39;</p>"
        "<script>if (1<2) {}</script>tail</body>"
    )
    rows = [(1, html), (2, "no markup at all"), (3, ""), (4, None)]
    got = {
        r["i"]: r["t"]
        for r in spark.createDataFrame(rows, "i long, h string")
        .select("i", strip_html(F.col("h")).alias("t"))
        .collect()
    }
    # script/style bodies gone wholesale, entities decoded, &amp;lt;
    # becomes the LITERAL '&lt;' (amp decodes last), whitespace collapsed
    assert got[1] == 'T x &lt; y "q\' tail'
    assert got[2] == "no markup at all"
    assert got[3] == "" and got[4] is None


def test_hashed_quality_score_reference_values(spark):
    # hand-computed in pure Python: md5-bucket -> LCG weight -> mean
    # -> sigmoid; pins the engine-portable arithmetic
    from pandance_spark.functions.text import hashed_quality_score

    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello world this is fine"), (3, ""), (4, "!!!")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["q"]
        for r in df.select(
            "id", hashed_quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert abs(out[1] - 0.7156436072341278) < 1e-12
    assert abs(out[2] - 0.7349426220328898) < 1e-12
    assert out[3] is None          # no tokens -> no signal
    assert out[4] is None          # punctuation-only -> no tokens
    assert 0.0 <= out[1] <= 1.0 and 0.0 <= out[2] <= 1.0


def test_hashed_quality_score_params_change_score(spark):
    from pandance_spark.functions.text import hashed_quality_score

    df = spark.createDataFrame([(1, "some ordinary text here")], ["id", "t"])
    a, b, c = df.select(
        hashed_quality_score(F.col("t")).alias("a"),
        hashed_quality_score(F.col("t"), seed=99).alias("b"),
        hashed_quality_score(F.col("t"), n_buckets=64).alias("c"),
    ).first()
    assert len({round(x, 12) for x in (a, b, c)}) == 3


def test_normalize_unicode_forms(spark):
    from pandance_spark.functions.text import normalize_unicode

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301"),   # decomposed: e + combining acute
            (2, "\ufb01ne"),     # fi ligature
            (3, None),
        ],
        ["id", "t"],
    )
    out = {
        r["id"]: (r["nfc"], r["nfkc"])
        for r in df.select(
            "id",
            normalize_unicode(F.col("t")).alias("nfc"),
            normalize_unicode(F.col("t"), "NFKC").alias("nfkc"),
        ).collect()
    }
    assert out[1] == ("caf\u00e9", "caf\u00e9")  # composed either way
    assert out[2] == ("\ufb01ne", "fine")         # only NFKC folds it
    assert out[3] == (None, None)
    with pytest.raises(ValueError):
        normalize_unicode(F.col("t"), "NFX")


def test_clean_text_strips_controls_and_collapses_ws(spark):
    from pandance_spark.functions.text import clean_text

    df = spark.createDataFrame(
        [(1, " \x07hello   wor\u0301ld\t\n end  \x1f")], ["id", "t"]
    )
    got = df.select(clean_text(F.col("t")).alias("c")).first()["c"]
    assert got == "hello wo\u0155ld end"  # r + acute composes to r-acute
    assert "\x07" not in got and "\x1f" not in got
    assert "  " not in got and got == got.strip()


def test_split_sentences_basic(spark):
    from pandance_spark.functions.text import split_sentences

    df = spark.createDataFrame(
        [
            (1, "Hello there. How are you?  Fine!   "),
            (2, "no terminator at all"),
            (3, "...!?"),
            (4, ""),
        ],
        ["id", "t"],
    )
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id", split_sentences(F.col("t")).alias("s")
        ).collect()
    }
    assert out[1] == ["Hello there.", "How are you?", "Fine!"]
    assert out[2] == ["no terminator at all"]
    assert out[3] == []  # terminator-only: no piece has content
    assert out[4] == []


def test_dedup_lines_first_occurrence_order(spark):
    from pandance_spark.functions.text import dedup_lines

    df = spark.createDataFrame(
        [(1, "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter")],
        ["id", "t"],
    )
    got = df.select(dedup_lines(F.col("t")).alias("d")).first()["d"]
    assert got == "nav\nbody one\nbody two\nfooter"


def test_hashed_quality_score_plan_is_map_only(spark):
    # the 100 TB claim: scoring is a shuffle-free scan -> the physical
    # plan must contain NO Exchange and NO Python row UDF node
    from pandance_spark.functions.text import hashed_quality_score

    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("t"),
    )
    out = df.select(hashed_quality_score(F.col("t")).alias("q"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


# ---------------------------------------------------------------- topics
def test_tag_topics_counts_and_order(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.text import tag_topics

    df = spark.createDataFrame([Row(id=1, t="join the JOIN, scan fast")])
    out = df.select(
        tag_topics(
            F.col("t"),
            {"joins": ["join", "merge"], "io": ["scan"], "never": ["xyz"]},
        ).alias("tags")
    ).collect()[0]["tags"]
    # sorted by topic name, zero-hit topics omitted, case-folded tokens
    assert [(e["topic"], e["n_hits"]) for e in out] == [("io", 1), ("joins", 2)]


def test_tag_topics_null_and_empty_text(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.text import tag_topics

    df = spark.createDataFrame([Row(id=1, t=None), Row(id=2, t="")])
    rows = df.select(
        F.col("id"), tag_topics(F.col("t"), {"a": ["x"]}).alias("tags")
    ).collect()
    got = {r["id"]: r["tags"] for r in rows}
    assert got[1] is None  # null text propagates null (SQL convention)
    assert got[2] == []


def test_tag_topics_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import tag_topics

    with _pytest.raises(ValueError):
        tag_topics(F.col("t"), {})
    with _pytest.raises(ValueError):
        tag_topics(F.col("t"), {"a": []})


def test_extract_main_text_drops_nav_and_linkboxes(spark):
    from pandance_spark.functions.text import extract_main_text

    html = (
        '<html><head><style>p{}</style></head><body>'
        '<div class="nav"><a href="/">Home</a> | <a href="/a">About</a></div>'
        "<p>This is the real article content, long enough to clear the "
        "minimum character threshold, with <a href='/r'>one link</a> "
        "inside the prose.</p>"
        '<div class="rel"><a href="/x">Read more stories here</a>'
        '<a href="/y">Subscribe to the newsletter now</a></div>'
        "<script>track();</script><!-- c --></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id int, h string")
    out = df.select(
        extract_main_text(F.col("h")).alias("t")
    ).collect()[0]["t"]
    assert "real article content" in out and "one link" in out
    assert "Home" not in out and "Read more" not in out
    assert "track();" not in out


def test_extract_main_text_thresholds_and_validation(spark):
    from pandance_spark.functions.text import extract_main_text

    df = spark.createDataFrame(
        [(1, "<p>short</p><p>" + "long enough content " * 5 + "</p>")],
        "id int, h string",
    )
    out = df.select(
        extract_main_text(F.col("h"), min_chars=20).alias("t")
    ).collect()[0]["t"]
    assert "short" not in out and "long enough" in out
    import pytest as _pt
    with _pt.raises(ValueError, match="min_chars"):
        extract_main_text(F.col("h"), min_chars=0)
    with _pt.raises(ValueError, match="max_link_density"):
        extract_main_text(F.col("h"), max_link_density=1.5)


def test_extract_main_text_stopword_density(spark):
    from pandance_spark.functions.text import extract_main_text

    sw = ["the", "a", "of", "to", "and", "is", "in", "that", "it", "all"]
    html = (
        "<p>Copyright 2024 MegaCorp Industries GmbH Worldwide Rights "
        "Reserved Trademark Registered</p>"
        "<p>The point of this paragraph is that it reads as prose and "
        "carries all the usual function words a sentence needs.</p>"
    )
    df = spark.createDataFrame([(1, html)], "id int, h string")
    out = df.select(
        extract_main_text(
            F.col("h"), min_chars=40, stopwords=sw
        ).alias("t")
    ).collect()[0]["t"]
    # the stopword-free legalese block drops; the prose block stays
    assert "Copyright" not in out and "reads as prose" in out
    # without stopwords the legalese survives (length + no links)
    out2 = df.select(
        extract_main_text(F.col("h"), min_chars=40).alias("t")
    ).collect()[0]["t"]
    assert "Copyright" in out2
    import pytest as _pt
    with _pt.raises(ValueError, match="min_stopword_density"):
        extract_main_text(F.col("h"), stopwords=sw, min_stopword_density=2.0)


def test_luhn_card_detection(spark):
    from pandance_spark.functions.text import (
        find_card_numbers,
        redact_card_numbers,
    )

    rows = [
        # 4111111111111111 is the classic Luhn-valid test PAN;
        # ...1112 fails the checksum; the 16-digit order id also fails
        (1, "pay with 4111 1111 1111 1111 please"),
        (2, "not a card: 4111 1111 1111 1112"),
        (3, "amex 378282246310005 and junk 1234567890123456"),
        (4, "no numbers here"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    found = {
        r["id"]: list(r["c"])
        for r in df.select(
            "id", find_card_numbers(F.col("t")).alias("c")
        ).collect()
    }
    assert found[1] == ["4111111111111111"]
    assert found[2] == []
    assert found[3] == ["378282246310005"]
    assert found[4] == []
    red = {
        r["id"]: r["t2"]
        for r in df.select(
            "id", redact_card_numbers(F.col("t")).alias("t2")
        ).collect()
    }
    assert red[1] == "pay with [CARD] please"
    assert red[2] == "not a card: 4111 1111 1111 1112"  # untouched
    assert "[CARD]" in red[3] and "1234567890123456" in red[3]


def test_card_detection_merged_and_long_spans(spark):
    """Review findings: adjacent digit runs merging with a PAN, and
    19-digit separated PANs exceeding a capped candidate span, must
    both still be found AND redacted."""
    from pandance_spark.functions.text import (
        find_card_numbers,
        redact_card_numbers,
    )

    rows = [
        # order ref merges with the PAN into one 21-digit run
        (1, "ref 12345 4111111111111111 end"),
        # phone fragment + card share separators
        (2, "call 555 1234 4111 1111 1111 1111 now"),
        # 19-digit PAN grouped 4-4-4-4-3 (23 chars with separators);
        # 411111111111111110 earns the valid check digit 2
        (3, "card 4111 1111 1111 1111 102 end"),
        # a 16-digit NON-card id adjacent to nothing: untouched
        (4, "id 1234567890123456 only"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    found = {
        r["id"]: list(r["c"])
        for r in df.select("id", find_card_numbers(F.col("t")).alias("c")).collect()
    }
    # the true PAN is found; merged runs may also surface chance
    # Luhn-valid windows (over-detection — the safe direction for PII)
    assert "4111111111111111" in found[1]
    assert "4111111111111111" in found[2]
    # the full 19-digit PAN is found (its Luhn-valid 16-digit prefix
    # window may legitimately appear too)
    assert "4111111111111111102" in found[3]
    assert found[4] == []
    red = {
        r["id"]: r["t2"]
        for r in df.select("id", redact_card_numbers(F.col("t")).alias("t2")).collect()
    }
    # whole runs containing a PAN are redacted (no partial leakage)
    assert "4111" not in red[1] and "12345" not in red[1]
    assert "4111" not in red[2]
    assert "4111" not in red[3]
    assert red[4] == "id 1234567890123456 only"


def test_extract_main_text_rejects_empty_stopwords(spark):
    from pandance_spark.functions.text import extract_main_text

    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        extract_main_text(F.col("t"), stopwords=[])


def test_dominant_script_routing(spark):
    """Script routing edge contract: per-block detection, alphabetical
    tie-break, 'none' for scriptless text, NULL propagation."""
    from pandance_spark.functions.text import dominant_script, script_counts

    rows = [
        (1, "漢字テスト"),        # han 2, kana 3 -> kana wins
        (2, "hello мир"),         # latin 5, cyrillic 3 -> latin
        (3, "aЯ"),                # 1-1 tie -> cyrillic (alphabetical)
        (4, "1234 !!"),           # none
        (5, ""),                  # none
        (6, None),                # NULL
        (7, "مرحبا"),             # arabic
        (8, "한글만"),            # hangul
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    from pyspark.sql import functions as F

    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", dominant_script(F.col("t")).alias("s")
        ).collect()
    }
    assert got == {
        1: "kana", 2: "latin", 3: "cyrillic", 4: "none",
        5: "none", 6: None, 7: "arabic", 8: "hangul",
    }
    counts = {
        name: r
        for name, r in zip(
            [n for n, _ in script_counts(F.col("t"))],
            df.filter("id = 1")
            .select(*[c.alias(n) for n, c in script_counts(F.col("t"))])
            .collect()[0],
        )
    }
    assert counts["han"] == 2 and counts["kana"] == 3
    assert counts["latin"] == 0


def test_fix_mojibake_repairs_and_passes_clean(spark):
    """cp1252 double-encoding repair: latin-1 supplement and cp1252
    punctuation both repair; clean text (incl. genuine non-mojibake
    accents) is untouched; NULL propagates; the computed table's
    unmapped-byte targets are absent rather than wrong."""
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import _mojibake_table, fix_mojibake

    tbl = dict(_mojibake_table())
    # unmapped cp1252 bytes (0x9d ends the UTF-8 form of U+201D) must
    # be skipped, not mangled
    assert "â€�".replace("�", "\x9d") not in tbl
    rows = [
        (1, "cafÃ© naÃ¯ve"),
        (2, "â€”dash â‚¬5 â€œq"),
        (3, "plain ascii"),
        (4, "café déjà vu"),   # already-correct accents stay
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["f"]
        for r in df.select("id", fix_mojibake(F.col("t")).alias("f")).collect()
    }
    assert got == {
        1: "café naïve",
        2: "—dash €5 “q",
        3: "plain ascii",
        4: "café déjà vu",
        5: None,
        6: "",
    }


def test_c4_clean_rules(spark):
    from pandance_spark.functions.text import c4_clean

    rows = [
        # survives: 3 terminal-punct lines, each >=5 words
        (1, "alpha beta gamma delta one.\nalpha beta gamma delta two!\n"
            "alpha beta gamma delta three?"),
        # line rules: short line, no-terminal line, javascript line all
        # dropped; page then fails the sentence floor
        (2, "too short line.\nno terminal punctuation here at all\n"
            "please enable javascript to see this page.\n"
            "alpha beta gamma delta keeper one.\n"
            "alpha beta gamma delta keeper two."),
        # page rules fire on ORIGINAL text in fixed precedence
        (3, "Lorem Ipsum dolor sit amet here.\nalpha beta gamma delta x.\n"
            "alpha beta gamma delta y.\nalpha beta gamma delta z."),
        (4, "code { snippet } inline.\nalpha beta gamma delta x.\n"
            "alpha beta gamma delta y.\nalpha beta gamma delta z."),
        (5, "this page has verboten words in it.\n"
            "alpha beta gamma delta x.\nalpha beta gamma delta y.\n"
            "alpha beta gamma delta z."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "page"])
    out = {
        r["doc_id"]: r
        for r in c4_clean(df, "page", badwords=("verboten",)).collect()
    }
    assert out[1]["c4_keep"] and out[1]["c4_drop_reason"] is None
    assert out[1]["n_lines_kept"] == 3 and out[1]["n_sentences"] == 3
    assert out[2]["c4_drop_reason"] == "too_few_sentences"
    assert out[2]["n_lines_kept"] == 2 and out[2]["n_lines_dropped"] == 3
    assert "javascript" not in out[2]["text_c4"]
    assert out[3]["c4_drop_reason"] == "lorem_ipsum"
    assert out[4]["c4_drop_reason"] == "curly_brace"
    assert out[5]["c4_drop_reason"] == "bad_words"
    # badword line passed every LINE rule yet the page dropped
    assert "verboten" in out[5]["text_c4"]


def test_c4_clean_empty_and_quote_lines(spark):
    from pandance_spark.functions.text import c4_clean

    rows = [
        (1, '"a quoted line of five words."\n\n   \nshort.'),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "page"])
    r = c4_clean(df, "page", min_sentences=1).collect()[0]
    # closing-quote terminal accepted; blank/whitespace lines dropped
    assert r["n_lines_kept"] == 1
    assert r["text_c4"].startswith('"a quoted')
    assert r["c4_keep"]


def test_scan_card_numbers_agrees_with_find_and_redact(spark):
    from pandance_spark.functions.text import (
        find_card_numbers,
        redact_card_numbers,
        scan_card_numbers,
    )

    rows = [
        (1, "pay 4111 1111 1111 1111 now"),          # valid, spaced
        (2, "ref 4111111111111112 only"),            # invalid check
        (3, "no digits at all"),
        (4, "short 12345 run"),
        (5, None),
        (6, "phone 0301 555 0100 and card 4111-1111-1111-1111 merged "
            "run 0301555010041111111111111111"),
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    t = F.col("t")
    out = df.select(
        "k",
        scan_card_numbers(t).alias("s"),
        find_card_numbers(t).alias("f"),
        redact_card_numbers(t).alias("r"),
    ).collect()
    for row in out:
        if row["s"] is None:
            assert row["t" if "t" in row else "f"] is None or row["f"] is None
            continue
        assert row["s"]["found"] == row["f"], row["k"]
        assert row["s"]["redacted"] == row["r"], row["k"]


def test_stage_expr_preserves_rows_and_nulls(spark):
    from pandance_spark._kernel import stage_expr

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["k", "v"]
    )
    staged = stage_expr(df, F.upper(F.col("v")), "u")
    rows = {r["k"]: r["u"] for r in staged.collect()}
    assert rows == {1: "A", 2: None, 3: "C"}
    # the staged attribute is a Generate output: filters on it do not
    # re-inline the expression below the barrier
    plan = staged.filter(F.col("u") == "A")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Generate" in plan


def test_word_shingle_hashes_align_with_string_shingles(spark):
    from pandance_spark.functions.text import (
        word_shingle_hashes,
        word_shingles,
    )

    rows = [
        (1, "a b c d e"),
        (2, "x y"),            # fewer than n tokens
        (3, None),             # NULL propagates
        (4, "a b c a b c"),    # repeated shingles repeat in order
        (5, "c d e f g"),      # overlaps doc 1 on 'c d e'
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    out = {
        r["k"]: r
        for r in df.select(
            "k",
            word_shingle_hashes(F.col("t"), 3).alias("h"),
            word_shingles(F.col("t"), 3).alias("s"),
        ).collect()
    }
    # same cardinality and positional alignment as string shingles
    for k in (1, 2, 4, 5):
        assert len(out[k]["h"]) == len(out[k]["s"]), k
    assert out[3]["h"] is None
    assert out[2]["h"] == []
    # equal shingles hash equal (within and across documents)
    h4, s4 = out[4]["h"], out[4]["s"]
    assert s4[0] == s4[3] and h4[0] == h4[3]
    shared = set(out[1]["s"]) & set(out[5]["s"])
    assert "c d e" in shared
    m1 = dict(zip(out[1]["s"], out[1]["h"]))
    m5 = dict(zip(out[5]["s"], out[5]["h"]))
    for sh in shared:
        assert m1[sh] == m5[sh]
    # distinct shingles get distinct hashes on this fixture
    assert len(set(out[1]["h"])) == len(out[1]["h"])


def test_c4_clean_null_page_is_dropped(spark):
    from pandance_spark.functions.text import c4_clean

    df = spark.createDataFrame([(1, None)], "doc_id long, page string")
    r = c4_clean(df, "page").collect()[0]
    assert r["c4_drop_reason"] == "null_text" and not r["c4_keep"]


def test_c4_clean_crlf_pages(spark):
    """CRLF corpus (ADVICE r8): Java's '$' matches BEFORE a trailing
    '\\r' while RE2's does not, and trim() strips only spaces — the
    line split must eat the '\\r' so kept lines are byte-identical to
    a strict-RE2 replay and text_c4 carries no stray carriage
    returns."""
    from pandance_spark.functions.text import c4_clean

    crlf = (
        "alpha beta gamma delta one.\r\n"
        "alpha beta gamma delta two!\r\n"
        "alpha beta gamma delta three?"
    )
    df = spark.createDataFrame([(1, crlf)], ["doc_id", "page"])
    r = c4_clean(df, "page").collect()[0]
    assert r["c4_keep"] and r["n_lines_kept"] == 3
    assert "\r" not in r["text_c4"]
    assert r["text_c4"].split("\n") == [
        "alpha beta gamma delta one.",
        "alpha beta gamma delta two!",
        "alpha beta gamma delta three?",
    ]
    assert r["n_lines_dropped"] == 0


def test_c4_clean_badwords_with_regex_metachars(spark):
    """Badwords are LITERALS (ADVICE r8): entries with regex
    metacharacters must neither crash pattern compilation at action
    time ('(') nor silently never match ('a$$', 'c++')."""
    from pandance_spark.functions.text import c4_clean

    rows = [
        (1, "this mentions c++ language here today.\n"
            "alpha beta gamma delta x.\nalpha beta gamma delta y.\n"
            "alpha beta gamma delta z."),
        (2, "perfectly clean page line one fine.\n"
            "alpha beta gamma delta x.\nalpha beta gamma delta y.\n"
            "alpha beta gamma delta z."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "page"])
    out = {
        r["doc_id"]: r
        for r in c4_clean(df, "page", badwords=("c++", "a$$", "(")).collect()
    }
    assert out[1]["c4_drop_reason"] == "bad_words"
    assert out[2]["c4_keep"]


def test_char_entropy_known_values(spark):
    import math

    from pyspark.sql import functions as F

    from pandance_spark.functions.text import char_entropy

    rows = [(1, "aabb"), (2, "abcd"), (3, ""), (4, "aaaa"),
            (5, None), (6, "aab")]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", F.round(char_entropy(F.col("t")), 9).alias("h")
        ).collect()
    }
    assert got[1] == 1.0  # two symbols, equal
    assert got[2] == 2.0  # four distinct
    assert got[3] == 0.0 and got[4] == 0.0
    assert got[5] == 0.0  # NULL text -> size=-1 guard -> 0.0
    # H(2/3, 1/3)
    exp = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[6] - exp) < 1e-9


def test_flesch_reading_ease_closed_form(spark):
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import flesch_reading_ease

    # 6 words, 2 sentences, syllable runs counted by vowel groups
    txt = "the cat sat down. the dog ran!"
    df = spark.createDataFrame([(txt,), ("",), (None,)], "t string")
    vals = [
        r["f"]
        for r in df.select(
            F.round(flesch_reading_ease(F.col("t")), 6).alias("f")
        ).collect()
    ]
    words, sents = 7.0, 2.0
    # vowel groups: e,a,a,o(down? d-o-w-n: 'o')... count directly
    import re

    syl = len(re.findall(r"[aeiouy]+", txt.lower()))
    exp = round(206.835 - 1.015 * (words / sents) - 84.6 * (syl / words), 6)
    assert vals[0] == exp
    assert vals[1] is None and vals[2] is None  # no words -> NULL


def test_zipf_fit_exact_power_law(spark):
    """A corpus built to be exactly Zipfian (freq = 240/rank for ranks
    1..6) must fit slope -1 with r2 ~ 1."""
    from pandance_spark.functions.text import zipf_fit

    words = []
    for rank, w in enumerate(["aa", "bb", "cc", "dd", "ee", "ff"], 1):
        words += [w] * (240 // rank)
    # spread across rows so the aggregate actually combines
    rows = [(i, " ".join(words[i::10])) for i in range(10)]
    df = spark.createDataFrame(rows, "i long, t string")
    r = zipf_fit(df, "t", top_r=6).collect()[0]
    assert r["n_types"] == 6
    assert abs(r["slope"] + 1.0) < 0.02, r["slope"]
    assert r["r2"] > 0.999


def test_tokenizer_fertility_and_canary(spark):
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import canary_scan, tokenizer_fertility

    df = spark.createDataFrame(
        [(1, "en", "it's $4,096 now."), (2, "en", "plain words here"),
         (3, "de", "drei worte hier")],
        "doc_id long, lang string, text string",
    )
    got = {r["lang"]: r for r in tokenizer_fertility(df, "text", "lang").collect()}
    # tokenize splits on [^a-z0-9]+: it|s|4|096|now = 5 words + 3 = 8;
    # pre-tokenizer pieces: it|'s| $|4|,|096| now|. = 8 + 3 = 11
    assert got["en"]["n_words"] == 8 and got["en"]["n_pieces"] == 11
    assert got["de"]["fertility"] == 1.0
    c = canary_scan(
        df.select("doc_id", F.concat("text", F.lit(" CANARY-deadbeef")).alias("text")),
        "doc_id", "text", "CANARY-[0-9a-f]{8}",
    ).collect()
    assert len(c) == 1 and c[0]["n_docs"] == 3 and c[0]["n_hits"] == 3
    assert c[0]["first_doc"] == 1 and c[0]["last_doc"] == 3


def test_with_char_entropy_matches_column_form(spark):
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import char_entropy, with_char_entropy

    rows = [(i, t) for i, t in enumerate(
        ["aabb", "abcd", "", None, "mississippi", "aab", "zz  zz!"])]
    df = spark.createDataFrame(rows, "i long, t string")
    a = {r["i"]: r["entropy_bits"]
         for r in with_char_entropy(df, "t", dp=9).collect()}
    b = {r["i"]: r["h"]
         for r in df.select("i", F.round(char_entropy(F.col("t")), 9).alias("h")).collect()}
    assert a == b, (a, b)


def test_script_mix_report(spark):
    from pandance_spark.functions.text import script_mix

    rows = [
        (1, "hello world\n漢字漢字\nпривет мир"),      # 3 scripts, latin maj? counts: latin 10, han 4, cyr 9 -> latin
        (2, "all latin here\nmore latin text"),          # monoscript
        (3, "1234 !!!\n..."),                            # no script chars
        (4, None),                                       # NULL page
        (5, "漢字漢字漢字\nhi"),                          # han majority
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {r["doc_id"]: r for r in script_mix(df, "doc_id", "t").collect()}
    assert got[1]["n_lines"] == 3 and got[1]["n_scripted"] == 3
    assert got[1]["is_mixed"] and got[1]["majority_script"] == "cyrillic"
    # tie at 1 line each -> count desc ties -> alphabetical first
    assert got[2]["majority_script"] == "latin" and not got[2]["is_mixed"]
    assert got[2]["mix_ratio"] == 0.0
    assert got[3]["majority_script"] == "none" and got[3]["n_scripted"] == 0
    assert got[3]["mix_ratio"] == 0.0 and not got[3]["is_mixed"]
    assert 4 not in got or got[4]["n_lines"] >= 0  # NULL page: split(NULL) drops
    assert got[5]["majority_script"] == "han" and got[5]["is_mixed"]
    assert got[5]["mix_ratio"] == 0.5


def test_c4_clean_empty_badwords_and_zipf_degenerate(spark):
    from pandance_spark.functions.text import c4_clean, zipf_fit

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta one.\nalpha beta gamma delta two!\n"
             "alpha beta gamma delta three?")],
        "doc_id long, page string",
    )
    # badwords of only empty strings must not become the "()" regex
    # that matches every page
    r = c4_clean(df, "page", badwords=("",)).collect()[0]
    assert r["c4_keep"] and r["c4_drop_reason"] is None
    # zipf over a single-type corpus: NULL fit, no ANSI explosion
    one = spark.createDataFrame([("aa aa aa",)], "t string")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        z = zipf_fit(one, "t", top_r=5).collect()[0]
        assert z["n_types"] == 1 and z["slope"] is None and z["r2"] is None
        empty = spark.createDataFrame([], "t string")
        z2 = zipf_fit(empty, "t", top_r=5).collect()[0]
        assert z2["n_types"] == 0 and z2["slope"] is None
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
        else:
            spark.conf.unset("spark.sql.ansi.enabled")


def test_winnowing_guarantee_and_forms_agree(spark):
    """Winnowing (Schleimer et al. 2003): any shared substring of
    length >= k + w - 1 yields a shared fingerprint HASH (the paper's
    detection guarantee); the staged table form and the reference
    Column form select identical (h, p) sets; short/NULL/empty texts
    yield empty sets."""
    import random

    from pandance_spark.functions.text import (
        winnow_fingerprint_table,
        winnow_fingerprints,
    )

    random.seed(11)
    shared = "thecommonpassageofinterest"  # 26 alnum chars >= 8+4-1
    rows = []
    for i in range(30):
        n = random.randint(0, 50)
        t = "".join(random.choice("abc 1!") for _ in range(n))
        if i % 3 == 0:
            cut = random.randint(0, len(t))
            t = t[:cut] + " " + shared + " " + t[cut:]
        rows.append((i, t))
    rows += [(100, None), (101, ""), (102, "1234567"), (103, "x" * 11)]
    df = spark.createDataFrame(rows, ["id", "t"])

    tbl = {
        r["id"]: [tuple(x) for x in r["fps"]]
        for r in winnow_fingerprint_table(df, "id", "t", 8, 4).collect()
    }
    # NO pre-coalesce: NULL text must hit the Column form directly and
    # still return the empty array, matching the table form (ADVICE r10)
    col = {
        r["id"]: [tuple(x) for x in r["fp"]]
        for r in df.select(
            "id",
            winnow_fingerprints(F.col("t"), 8, 4).alias("fp"),
        ).collect()
    }
    assert tbl == col
    # guarantee: every pair of docs containing `shared` shares a hash
    carriers = [i for i in range(30) if i % 3 == 0]
    hsets = {i: {h for h, _ in tbl[i]} for i in carriers}
    for a in carriers:
        for b in carriers:
            if a < b:
                assert hsets[a] & hsets[b], (a, b)
    # edges: too-short, empty, NULL all yield empty fingerprint sets
    assert tbl[100] == [] and tbl[101] == [] and tbl[102] == []
    # 11 chars = exactly k + w - 1 = one full window -> one fingerprint
    assert len(tbl[103]) == 1


def test_winnowing_long_gram_forms_agree_and_guarantee(spark):
    """k=12 > 8 exercises the double-Horner polynomial hash path in
    BOTH forms (r11, VERDICT r10 Missing #4): table == Column, the
    detection guarantee holds for a shared >= k + w - 1 substring, and
    per-row cost no longer carries the document (covered structurally:
    the plan's window inputs are (id, pos, c) only)."""
    import random

    from pandance_spark.functions.text import (
        winnow_fingerprint_table,
        winnow_fingerprints,
    )

    random.seed(23)
    shared = "sharedrunofthirtyalnumchars123"  # 30 >= 12 + 5 - 1
    rows = []
    for i in range(20):
        t = "".join(random.choice("abcd 12.") for _ in range(random.randint(0, 80)))
        if i % 2 == 0:
            cut = random.randint(0, len(t))
            t = t[:cut] + " " + shared + " " + t[cut:]
        rows.append((i, t))
    rows += [(100, None), (101, "tooshort")]
    df = spark.createDataFrame(rows, ["id", "t"])
    tbl = {
        r["id"]: [tuple(x) for x in r["fps"]]
        for r in winnow_fingerprint_table(df, "id", "t", 12, 5).collect()
    }
    col = {
        r["id"]: [tuple(x) for x in r["fp"]]
        for r in df.select(
            "id", winnow_fingerprints(F.col("t"), 12, 5).alias("fp")
        ).collect()
    }
    assert tbl == col
    carriers = [i for i in range(20) if i % 2 == 0]
    hsets = {i: {h for h, _ in tbl[i]} for i in carriers}
    for a in carriers:
        for b in carriers:
            if a < b:
                assert hsets[a] & hsets[b], (a, b)
    assert tbl[100] == [] and tbl[101] == []
    # O(1) bytes per char row: the k=12 gram hash composes from lead()
    # over per-char codes, so no md5-of-substring (the old O(n^2)
    # fallback) appears anywhere in the optimized plan
    plan = (
        winnow_fingerprint_table(df, "id", "t", 12, 5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "md5" not in plan.lower()


def test_npmi_phrases_scores_and_determinism(spark):
    """NPMI collocations: a pair that always co-occurs scores ~1,
    independent pairs score ~0, ranking cuts deterministically, and
    the python replay matches to 6 dp."""
    import math

    from pandance_spark.functions.text import npmi_phrases

    docs = (
        [(i, "new york is big today no " + f"f{i % 7}") for i in range(30)]
        + [(100 + i, "old york was red") for i in range(10)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["npmi"], r["rank"])
        for r in npmi_phrases(df, "text", min_count=5, top=50).collect()
    }

    # python replay
    from collections import Counter

    toks_all, pairs_all = Counter(), Counter()
    for _, t in docs:
        ts = [x for x in t.lower().split() if x]
        toks_all.update(ts)
        pairs_all.update(zip(ts[:-1], ts[1:]))
    t1, t2 = sum(toks_all.values()), sum(pairs_all.values())
    want = {}
    for (a, b), c in pairs_all.items():
        if c < 5:
            continue
        pab = c / t2
        val = 1.0 if c == t2 else round(
            math.log(pab / ((toks_all[a] / t1) * (toks_all[b] / t1)))
            / -math.log(pab), 6)
        want[(a, b)] = (c, val)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))
    want_full = {
        k: (c, v, i + 1) for i, (k, (c, v)) in enumerate(ranked)
    }
    assert got == want_full
    # 'new york' always adjacent -> npmi near 1; it outranks the
    # high-frequency-but-promiscuous 'york is/was' pairs
    assert got[("new", "york")][1] > 0.9
    assert got[("new", "york")][2] < got[("york", "is")][2]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_count"):
        npmi_phrases(df, "text", min_count=0)


def test_iban_detection_mod97(spark):
    """IBAN detection: real checksums pass, one-digit corruptions
    fail, separators/case normalize, packed runs found, and the
    candidate regex alone (no checksum) would have kept the fakes."""
    from pandance_spark.functions.text import find_ibans, iban_valid

    rows = [
        (1, "pay to GB82 WEST 1234 5698 7654 32 today"),      # valid (ISO example)
        (2, "de89 3704 0044 0532 0130 00 works too"),          # valid, lowercase
        (3, "fake GB82 WEST 1234 5698 7654 33 nope"),          # corrupted digit
        (4, "packed FR1420041010050500013M02606 ok"),          # valid, no separators
        (5, "just text, no account numbers at all"),
        (6, None),
        (7, "two: GB82WEST12345698765432, NL91 ABNA 0417 1643 00"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["ib"]
        for r in df.select(
            "id", find_ibans(F.col("text")).alias("ib")
        ).collect()
    }
    assert got[1] == ["GB82WEST12345698765432"]
    assert got[2] == ["DE89370400440532013000"]
    assert got[3] == []
    assert got[4] == ["FR1420041010050500013M02606"]
    assert got[5] == []
    assert got[6] is None
    assert sorted(got[7]) == ["GB82WEST12345698765432", "NL91ABNA0417164300"]

    # checksum-only contract: shape-valid but mod97 != 1 rejected
    v = {
        r["s"]: r["v"]
        for r in spark.createDataFrame(
            [("GB82WEST12345698765432",), ("GB82WEST12345698765433",),
             ("XX00SHORT",)], "s string"
        ).select("s", iban_valid(F.col("s")).alias("v")).collect()
    }
    assert v["GB82WEST12345698765432"] is True
    assert v["GB82WEST12345698765433"] is False
    assert v["XX00SHORT"] is False


def test_find_ibans_prefix_widths_clamped_by_run_length(spark):
    """r12: prefix widths are bounded by the candidate run's length
    (beyond it, substring clamps to the same full-run prefix, which
    used to re-run the mod-97 fold ~12 extra times per candidate).
    Pin the cases the clamp touches: a run shorter than the 15-char
    floor (no prefixes at all), a run between 15 and 34 (widths stop
    at its length), a valid IBAN inside a LONGER merged run (interior
    prefix still found), and the 34-char ceiling."""
    from pandance_spark.functions.text import find_ibans

    rows = [
        (1, "tiny run GB82 WEST 12 end"),                 # 12 chars < 15
        (2, "exact GB82 WEST 1234 5698 7654 32 end"),     # 22-char valid
        # valid 22-char IBAN glued to a following uppercase-able word
        # by spaces only: the merged run is longer than the IBAN, the
        # valid prefix is interior and must still be found
        (3, "GB82 WEST 1234 5698 7654 32 TODAY"),
        # run far beyond 34 chars: widths cap at 34, no candidate valid
        (4, "ref XY12" + "9" * 40 + " trail"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["ib"]
        for r in df.select(
            "id", find_ibans(F.col("text")).alias("ib")
        ).collect()
    }
    assert got[1] == []
    assert got[2] == ["GB82WEST12345698765432"]
    assert got[3] == ["GB82WEST12345698765432"]
    assert got[4] == []
