"""functions/chat.py: SFT chat parse/render/mask tests."""

from pyspark.sql import functions as F


def test_parse_render_roundtrip(spark):
    from pandance_spark.functions.chat import chat_sft_view, parse_chat, render_chatml

    j = ('[{"role":"system","content":"be nice"},'
         '{"role":"user","content":"hi there"},'
         '{"role":"assistant","content":"hello!"}]')
    df = spark.createDataFrame([(1, j)], "id long, chat string")
    r = df.select(render_chatml(parse_chat(F.col("chat"))).alias("r")).first()["r"]
    assert r == ("<|im_start|>system\nbe nice<|im_end|>\n"
                 "<|im_start|>user\nhi there<|im_end|>\n"
                 "<|im_start|>assistant\nhello!<|im_end|>\n")
    v = chat_sft_view(df, "id", "chat").first()
    assert v["n_turns"] == 3 and v["n_assistant"] == 1
    assert v["rendered_chars"] == len(r)
    # mask offset: 1-based char where the completion starts
    tag = "<|im_start|>assistant\n"
    assert v["mask_offset"] == r.index(tag) + 1 + len(tag)
    assert r[v["mask_offset"] - 1:].startswith("hello!")


def test_chat_nulls_and_no_assistant(spark):
    from pandance_spark.functions.chat import chat_sft_view

    rows = [
        (1, '[{"role":"user","content":"only prompt"}]'),
        (2, "not json at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, chat string")
    got = {r["id"]: r for r in chat_sft_view(df, "id", "chat").collect()}
    assert got[1]["n_assistant"] == 0 and got[1]["mask_offset"] == 0
    # malformed / NULL JSON -> NULL parse -> NULL stats, never a crash;
    # mask_offset is NULL too (0 is reserved for genuinely
    # assistant-free transcripts — ADVICE r9)
    assert got[2]["rendered_md5"] is None
    assert got[2]["mask_offset"] is None
    assert got[3]["n_turns"] is None or got[3]["n_turns"] == -1
    assert got[3]["mask_offset"] is None


def test_render_chatml_null_fields_do_not_poison(spark):
    """A NULL content/role field renders as empty instead of
    NULL-poisoning the fold (and faking 'no assistant turn')."""
    from pandance_spark.functions.chat import chat_sft_view

    j = ('[{"role":"user","content":null},'
         '{"role":"assistant","content":"hi"}]')
    df = spark.createDataFrame([(1, j)], "id long, chat string")
    v = chat_sft_view(df, "id", "chat").first()
    assert v["rendered_md5"] is not None
    assert v["n_assistant"] == 1 and v["mask_offset"] > 0
