"""Transcript-table analytics over the north-rule input shape.

The engine's input is an Iceberg-style table of multi-turn
conversation / agent transcripts with columns (conv_id, turn_idx,
role, text, tool, ts).  ``synthesize_transcripts`` derives a
deterministic transcript table from a documents table (the
``synthesize_media`` pattern — pure column expressions both engines
reproduce bit-for-bit), and ``conversation_stats`` is the monitoring
pass a transcript corpus runs before KG extraction or training-data
curation: turn/role balance, strict-alternation violations, tool-call
rate, turn length, wall span.

Plan shapes are 100 TB-safe: synthesis is explode + per-row
projection (no higher-order lambda re-evaluates a computed column —
the measured O(len²) Catalyst trap); stats are one window pass + one
groupBy, both keyed on conv_id so the exchange is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

TURN_CHARS = 80  # synthesis: one turn per 80-char slice of the doc


def synthesize_transcripts(docs: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts): deterministic fake
    transcript table derived from documents — each document becomes
    one conversation, sliced into ``TURN_CHARS``-character turns with
    alternating user/assistant roles, a tool call every 4th turn, and
    a monotone per-turn timestamp.  Pure column expressions (explode a
    turn-index sequence, then per-row ``substring``) so a DuckDB
    oracle reproduces every byte."""
    n_turns = F.greatest(
        F.ceil(F.length("text") / TURN_CHARS), F.lit(1)
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
        .select(
            F.concat(F.lit("conv-"), F.col("doc_id").cast("string")).alias(
                "conv_id"
            ),
            "turn_idx",
            F.when(F.col("turn_idx") % 2 == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            F.substring(
                "text", F.col("turn_idx") * TURN_CHARS + 1, TURN_CHARS
            ).alias("text"),
            F.when(
                F.col("turn_idx") % 4 == 3,
                F.element_at(
                    F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
                    (F.col("turn_idx") % 3 + 1).cast("int"),
                ),
            ).alias("tool"),
            F.timestamp_seconds(
                F.col("doc_id") * 1000 + F.col("turn_idx") * 7
            ).alias("ts"),
        )
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool_calls,
    alternation_violations, avg_turn_tokens, duration_s): per-
    conversation health metrics.

    * ``alternation_violations`` counts turns whose role equals the
      previous turn's role under stable ``turn_idx`` ordering — the
      north rule's "windowed turn assembly under stable turn
      ordering" invariant, surfaced as a gauge.
    * ``avg_turn_tokens`` uses the engine tokenizer, rounded 6dp for
      cross-engine float stability.
    * ``duration_s`` is the wall span between the first and last turn.

    One window pass (lag over conv_id, turn_idx) feeding one groupBy
    on the same key — the exchange is shared, so the whole table
    costs a single shuffle at any scale."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        "conv_id",
        "role",
        "tool",
        "ts",
        F.size(tokens_col("text")).alias("n_toks"),
        (F.lag("role").over(w) == F.col("role"))
        .cast("int")
        .alias("viol"),
    )
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int"))
        .cast("long")
        .alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.col("tool").isNotNull().cast("int"))
        .cast("long")
        .alias("n_tool_calls"),
        F.coalesce(F.sum("viol"), F.lit(0))
        .cast("long")
        .alias("alternation_violations"),
        F.round(F.avg("n_toks"), 6).alias("avg_turn_tokens"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )
