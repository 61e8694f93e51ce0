"""SFT chat-template assembly — conversations → training text + loss
mask.

The last prep stage before supervised fine-tuning: render each
conversation's turns through a fixed chat template into ONE training
string, and emit the character spans where the loss applies (assistant
turn CONTENT only — never the template scaffolding or user turns). Every
SFT pipeline needs this exact artifact; getting the offsets wrong
silently trains on prompts or masks answers.

Template (ChatML-shaped, fixed):
``<|im_start|>{role}\\n{content}<|im_end|>\\n`` per turn, concatenated in
order. A loss span covers ``[start, end)`` character offsets (0-based,
`length`-semantics characters) of an assistant turn's content inside the
rendered text.

Scale shape (100 TB): a conversation is row-local by construction, so
the whole render is ONE in-row linear fold (`aggregate` with a struct
accumulator carrying offset/text/spans) — zero exchanges, zero UDFs,
zero windows; the explode→window→string_agg alternative would shuffle
every turn of the corpus to recompute what the fold gets for free.

Output contract: spans emit as a canonical string ``"s1-e1,s2-e2"`` in
turn order (the reject_reasons discipline — byte-comparable by a SQL
twin), plus n_turns / n_assistant_turns / n_chars / loss_chars audit
columns. NULL contents render as '' (coalesced), so a malformed turn
cannot null the whole conversation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRE = "<|im_start|>"
MID = "\n"
POST = "<|im_end|>\n"


def _piece(role: Column, content: Column) -> Column:
    return F.concat(
        F.lit(PRE), role, F.lit(MID), content, F.lit(POST)
    )


def chat_render(
    conversations: DataFrame,
    turns_col: str = "turns",
    id_col: str = "conv_id",
    loss_role: str = "assistant",
) -> DataFrame:
    """Render ``turns array<struct<role,content>>`` → ``(id, text,
    loss_spans, n_turns, n_assistant_turns, n_chars, loss_chars)``."""
    # coalesce AFTER the transform (its output type is exactly
    # struct<role,content>, whatever extra fields the input carried):
    # a NULL turns array must render as an empty conversation, not turn
    # F.size into -1 (the tokenize-docstring null trap)
    turns = F.coalesce(
        F.transform(
            F.col(turns_col),
            lambda t: F.struct(
                t["role"].alias("role"),
                F.coalesce(t["content"], F.lit("")).alias("content"),
            ),
        ),
        F.array().cast("array<struct<role:string,content:string>>"),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.lit("").alias("txt"),
        F.array().cast("array<string>").alias("spans"),
        F.lit(0).cast("long").alias("loss"),
    )

    def fold(acc: Column, t: Column) -> Column:
        piece = _piece(t["role"], t["content"])
        start = acc["off"] + F.length(
            F.concat(F.lit(PRE), t["role"], F.lit(MID))
        )
        end = start + F.length(t["content"])
        is_loss = t["role"] == loss_role
        span = F.concat_ws("-", start.cast("string"), end.cast("string"))
        return F.struct(
            (acc["off"] + F.length(piece)).alias("off"),
            F.concat(acc["txt"], piece).alias("txt"),
            F.when(is_loss, F.concat(acc["spans"], F.array(span)))
            .otherwise(acc["spans"])
            .alias("spans"),
            (
                acc["loss"]
                + F.when(is_loss, end - start).otherwise(F.lit(0))
            ).alias("loss"),
        )

    folded = F.aggregate(turns, zero, fold)
    n_assist = F.size(
        F.filter(turns, lambda t: t["role"] == loss_role)
    )
    return conversations.select(
        F.col(id_col),
        folded["txt"].alias("text"),
        F.array_join(folded["spans"], ",").alias("loss_spans"),
        F.size(turns).cast("long").alias("n_turns"),
        n_assist.cast("long").alias("n_assistant_turns"),
        F.length(folded["txt"]).cast("long").alias("n_chars"),
        folded["loss"].alias("loss_chars"),
    )
