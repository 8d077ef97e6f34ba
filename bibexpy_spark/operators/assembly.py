"""Conversation assembly: turn table -> one row per conversation.

The reference assembles documents from ordered tagged-line fragments
(wos2xlsx.py:21-64: group lines by (doc, tag), join, pivot).  The transcript
analogue concatenates turns under a stable ``turn_idx`` ordering.

Shuffle-safety: ``collect_list`` order is NOT deterministic after a shuffle,
so we always ``sort_array(collect_list(struct(turn_idx, ...)))`` — the struct
sorts lexicographically by field order, turn_idx first (SURVEY.md §7.4 #3).
Ties on duplicate (conv_id, turn_idx) fall back to (role, text, tool), which
keeps the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: separator between turns in the assembled document
TURN_SEP = "\n"


def assemble_conversations(turns: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) -> one row per conv_id.

    Output: conv_id, n_turns, doc (ordered text concat), roles, tools,
    first_ts, last_ts, turns (ordered array of structs, kept for the
    per-turn equality invariant / explode-back).
    """
    return (
        turns.groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
            ).alias("turns"),
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        # field extraction over the struct array (GetArrayStructFields) is
        # codegen-native; transform()/filter() lambdas are HigherOrderFunctions
        # (CodegenFallback -> interpreted path, the gram-stage cliff class).
        # concat_ws skips null elements and array_remove drops empty strings,
        # reproducing the old filter(x -> x is not null and x != '') exactly.
        .withColumn("doc", F.array_join(F.col("turns.text"), TURN_SEP))
        .withColumn("roles", F.array_join(F.col("turns.role"), " "))
        .withColumn("tools", F.concat_ws(" ", F.array_remove(F.col("turns.tool"), "")))
    )


def count_duplicate_turn_keys(turns: DataFrame) -> int:
    """Number of (conv_id, turn_idx) keys appearing more than once.

    ``turn_idx`` is the contract's order key (input_hint: dense, stable);
    duplicates still assemble deterministically (struct sort falls back to
    the remaining fields) but per-turn identity becomes ambiguous — the
    pipeline surfaces the count as a metric instead of failing silently.
    """
    return (
        turns.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )


def assemble_docs(turns: DataFrame, include_roles_tools: bool = False) -> DataFrame:
    """Lean assembly for the dedup hot path: aggregates only (turn_idx,
    text[, role, tool]) instead of the full turn structs — the map-side
    partial aggregates and the shuffle carry exactly what downstream needs.
    Ordering guarantee identical to :func:`assemble_conversations`.
    """
    # sort key = (turn_idx, role, text, tool) ALWAYS — the same tiebreak
    # prefix assemble_conversations uses — so a duplicate-turn_idx corpus
    # assembles the SAME doc through both paths (r4 review: a lean
    # (turn_idx, text) struct broke ties text-first and produced a
    # different doc/content_sha than the invariant surface; the ts field
    # can still differ as a final tiebreak there, but rows tying on all
    # four keys render identical text either way).  role/tool ride the
    # shuffle even in the lean path: a few bytes next to the text column.
    # A minimal (conv_id, turn_idx, text) frame — e.g. a foreachBatch
    # source without role/tool — still assembles: missing columns enter
    # the struct as '' so the sort key degrades to (turn_idx, text) and
    # the roles/tools outputs (if requested) are empty strings (r4 review:
    # the unconditional column refs broke the documented lean shape).
    have = set(turns.columns)
    role = (F.col("role") if "role" in have else F.lit("")).alias("role")
    tool = (F.col("tool") if "tool" in have else F.lit("")).alias("tool")
    agg = turns.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("turn_idx").alias("turn_idx"), role,
                                    F.col("text").alias("text"), tool))
        ).alias("_t")
    )
    # codegen-native field extraction, same rationale as assemble_conversations
    out = agg.withColumn("doc", F.array_join(F.col("_t.text"), TURN_SEP))
    if include_roles_tools:
        out = out.withColumn(
            "roles", F.array_join(F.col("_t.role"), " ")
        ).withColumn(
            "tools", F.concat_ws(" ", F.array_remove(F.col("_t.tool"), ""))
        )
    return out.drop("_t")


def explode_back(conversations: DataFrame) -> DataFrame:
    """Inverse of assembly for the invariant test: conversation rows ->
    (conv_id, turn_idx, role, text, tool, ts) turn rows."""
    return conversations.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )
