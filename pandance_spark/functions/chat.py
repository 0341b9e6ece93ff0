"""SFT / instruction-tuning chat transforms.

The conversion layer between interchange chat transcripts (JSONL rows
holding a ``messages`` array of ``{role, content}`` objects — the
OpenAI/HF datasets convention) and the rendered training text a
trainer consumes.  Everything is pure Column expressions: parse with
``from_json`` (schema-enforced, no inference), render with a single
aggregate fold over the message array, and derive the loss-mask
boundary (where prompt tokens stop and completion tokens start) with
string arithmetic — map-only at any corpus size, engine-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_chat",
    "render_chatml",
    "chat_sft_view",
]

_CHAT_SCHEMA = "array<struct<role:string,content:string>>"
_IM_START = "<|im_start|>"
_IM_END = "<|im_end|>\n"
_ASSISTANT_TAG = _IM_START + "assistant\n"


def parse_chat(json_col: Column) -> Column:
    """Parse a JSON ``messages`` array (``[{"role":..,"content":..},
    ...]``) into ``array<struct<role,content>>``.  Schema-enforced:
    malformed JSON or wrong shapes yield NULL (quarantine upstream
    with sources.read_jsonl when lines may be corrupt)."""
    return F.from_json(json_col, _CHAT_SCHEMA)


def render_chatml(msgs: Column) -> Column:
    """Render a parsed message array in the ChatML template::

        <|im_start|>{role}\\n{content}<|im_end|>\\n

    per message, concatenated in order — ONE aggregate fold (no
    explode, no shuffle, no UDF).  NULL array renders NULL; a NULL
    role/content FIELD renders as empty (missing/null content is
    routine in interchange chat data — without the coalesce one null
    field would NULL-poison the whole fold and downstream mask
    geometry would silently read 'no assistant turn')."""
    return F.aggregate(
        msgs,
        F.lit("").cast("string"),
        lambda acc, m: F.concat(
            acc,
            F.lit(_IM_START),
            F.coalesce(m["role"], F.lit("")),
            F.lit("\n"),
            F.coalesce(m["content"], F.lit("")),
            F.lit(_IM_END),
        ),
    )


def chat_sft_view(
    df: DataFrame, id_col: str, json_col: str
) -> DataFrame:
    """The SFT pack-prep projection: parse + render + loss-mask
    geometry per transcript.  Adds

    - ``n_turns``       — message count (long)
    - ``n_assistant``   — assistant messages (long)
    - ``rendered_md5``  — md5 of the ChatML rendering (the dedup /
      drift key; the full text stays out of small reports)
    - ``rendered_chars``— total rendered length (long)
    - ``mask_offset``   — 1-based char position where the FIRST
      assistant completion begins (everything before it is prompt =
      loss-masked; 0 when no assistant turn exists).  KNOWN LIMIT:
      the template tokens are not escaped anywhere in the render
      path (ChatML itself has no escaping), so content that embeds
      the literal assistant tag — web text discussing the format, or
      adversarial injection — shifts the boundary earlier; SFT
      ingest should drop/clean transcripts whose CONTENT contains
      ``<|im_start|>``/``<|im_end|>`` before packing (the canary /
      contamination scans in this repo do that sweep)

    Map-only: parse, fold, and strpos are per-row expressions; at
    100 TB this is scan-speed work with full column pruning upstream.
    """
    msgs = parse_chat(F.col(json_col))
    rendered = render_chatml(msgs)
    staged = df.select(
        F.col(id_col),
        msgs.alias("__m"),
        rendered.alias("__r"),
    )
    first_assistant = F.instr(F.col("__r"), _ASSISTANT_TAG)
    return staged.select(
        id_col,
        F.size("__m").cast("long").alias("n_turns"),
        F.size(
            F.filter(F.col("__m"), lambda m: m["role"] == "assistant")
        )
        .cast("long")
        .alias("n_assistant"),
        F.md5(F.col("__r")).alias("rendered_md5"),
        F.length("__r").cast("long").alias("rendered_chars"),
        F.when(
            first_assistant > 0,
            (first_assistant + F.lit(len(_ASSISTANT_TAG))).cast("long"),
        )
        # 0 is reserved for genuinely assistant-free transcripts;
        # an unparseable row (every other stat NULL) gets a NULL
        # mask_offset too, so SFT ingest can tell "prompt-only"
        # from "corrupt" by this column alone (ADVICE r9).
        .when(F.col("__m").isNotNull(), F.lit(0).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("mask_offset"),
    )
