"""Turn-level operators over conversation transcripts — the step
between corpus curation and training-data emission for multi-turn
data: per-turn context windows and (context, response) SFT pairs.

The transcript model is the north-star input shape
(conv_id, turn_idx, role, text, tool, ts); per-conversation order is
re-established with window functions over (conv_id, turn_idx) — the
engine's replacement for the reference pipeline's per-source FIFO
guarantee (pkg/stanza/fileconsumer/design.md:38-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def turn_context(
    df: DataFrame,
    n: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
    sep: str = "\n",
    out_col: str = "context",
) -> DataFrame:
    """Attach each turn's rolling context: the previous ``n`` turns
    of its conversation, oldest first, rendered ``role: text`` and
    joined with ``sep``.

    One window per conversation (ROWS BETWEEN n PRECEDING AND 1
    PRECEDING — O(n) state per row, no whole-conversation
    materialization). Conversations are millions of small groups:
    the exchange is the partitioning a transcript pipeline already
    keeps, and no group serializes more than its own turns.
    """
    w = (
        W.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-n, -1)
    )
    line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    return df.withColumn(
        out_col,
        F.array_join(F.collect_list(line).over(w), sep),
    )


def sft_pairs(
    df: DataFrame,
    n: int = 3,
    response_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """(context, response) supervised pairs: one row per turn whose
    role is ``response_role``, context = the preceding ``n`` turns.
    Turns with EMPTY context (conversation openers) are dropped — a
    response with no prompt is not a training pair.
    """
    ctx = turn_context(df, n, conv_col, idx_col, text_col, role_col)
    return (
        ctx.filter(F.col(role_col) == response_role)
        .filter(F.col("context") != "")
        .select(
            conv_col,
            idx_col,
            F.col("context"),
            F.col(text_col).alias("response"),
        )
    )
