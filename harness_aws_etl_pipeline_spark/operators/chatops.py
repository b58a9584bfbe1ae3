"""[EXT] Conversation (chat-format) data preparation.

Instruction-tuning corpora ship as role-tagged message arrays
(``[{"role": "user", "content": …}, {"role": "assistant", …}, …]``),
and the prep questions differ from plain documents: flatten to turns,
validate the protocol shape (optional leading system turn, strict
user/assistant alternation), and dedup at CONVERSATION granularity —
two chats are the same sample iff their (role, content) SEQUENCE
matches, which a bag-of-text hash gets wrong.

Everything is built on the parsed array column — ``from_json`` +
array expressions, no explode needed for the per-conversation facts
(the signature/stat folds run inside codegen on the array; the only
explode is :func:`flatten_conversations`, whose row expansion IS the
requested output). Malformed JSON parses to NULL and is surfaced, not
dropped silently.

The signature chain (md5 over ``role:md5(content)`` turns joined with
'|') is engine-agnostic by construction — the catalog's json panel
re-derives it in DuckDB over the same planted literals, the same
discipline as the mixing/sampling md5 machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CHAT_SCHEMA",
    "parse_conversations",
    "flatten_conversations",
    "conversation_stats",
    "conversation_signature",
]

CHAT_SCHEMA = "array<struct<role string, content string>>"


def parse_conversations(
    df: DataFrame, conv_col: str = "messages", out_col: str = "turns"
) -> DataFrame:
    """Append ``out_col`` = the parsed turn array (NULL when the JSON
    is malformed or not a role/content array)."""
    return df.withColumn(out_col, F.from_json(F.col(conv_col), CHAT_SCHEMA))


def flatten_conversations(
    df: DataFrame,
    conv_col: str = "messages",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per TURN: ``(id, turn_idx, role, content, n_chars)``.
    Conversations that fail to parse emit zero rows here — use
    :func:`conversation_stats`'s ``parsed`` flag to count them."""
    return (
        parse_conversations(df, conv_col)
        .select(
            F.col(id_col),
            F.posexplode("turns").alias("turn_idx", "t"),
        )
        .select(
            id_col,
            "turn_idx",
            F.col("t.role").alias("role"),
            F.col("t.content").alias("content"),
            F.length(F.coalesce(F.col("t.content"), F.lit(""))).alias(
                "n_chars"
            ),
        )
    )


def _alternates(turns: Column) -> Column:
    """TRUE iff, after an optional leading system turn, roles strictly
    alternate starting with 'user' — the protocol shape most chat
    trainers require."""
    body = F.when(
        (F.size(turns) > 0) & (turns[0]["role"] == "system"),
        F.slice(turns, 2, F.greatest(F.size(turns) - 1, F.lit(0))),
    ).otherwise(turns)
    roles = F.transform(body, lambda t: t["role"])
    idx = F.sequence(F.lit(0), F.size(roles) - 1)
    expected = F.transform(
        idx, lambda i: F.when(i % 2 == 0, "user").otherwise("assistant")
    )
    return F.when(F.size(roles) == 0, F.lit(False)).otherwise(
        F.size(F.zip_with(roles, expected, lambda a, b: a == b)) > 0
    ) & F.forall(
        F.zip_with(roles, expected, lambda a, b: a == b), lambda x: x
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str = "messages",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per conversation: ``(id, parsed, n_turns, n_user, n_assistant,
    n_system, total_chars, starts_with_system, alternates_ok)`` — all
    array folds over the parsed column, zero shuffles (the protocol
    gate a chat corpus runs BEFORE training-sample selection)."""
    turns = F.col("__t")
    role_cnt = lambda r: F.size(
        F.filter(turns, lambda t: t["role"] == r)
    ).cast("long")
    ok = turns.isNotNull()

    def when_parsed(col: Column) -> Column:
        # malformed conversations report NULL facts, never fake zeros
        return F.when(ok, col)

    return (
        parse_conversations(df, conv_col, "__t")
        .select(
            F.col(id_col),
            ok.alias("parsed"),
            when_parsed(F.size(turns).cast("long")).alias("n_turns"),
            when_parsed(role_cnt("user")).alias("n_user"),
            when_parsed(role_cnt("assistant")).alias("n_assistant"),
            when_parsed(role_cnt("system")).alias("n_system"),
            when_parsed(
                F.aggregate(
                    turns,
                    F.lit(0).cast("long"),
                    lambda acc, t: acc
                    + F.length(F.coalesce(t["content"], F.lit(""))),
                )
            ).alias("total_chars"),
            when_parsed(
                F.coalesce(
                    (F.size(turns) > 0) & (turns[0]["role"] == "system"),
                    F.lit(False),
                )
            ).alias("starts_with_system"),
            when_parsed(
                F.coalesce(_alternates(turns), F.lit(False))
            ).alias("alternates_ok"),
        )
    )


def conversation_signature(
    df: DataFrame,
    conv_col: str = "messages",
    id_col: str = "doc_id",
    include_system: bool = True,
    out_col: str = "conv_sig",
) -> DataFrame:
    """Append the SEQUENCE-sensitive dedup key: ``md5`` over the
    turns' ``role:md5(content)`` strings joined with '|'. Two chats
    collide iff roles AND contents match in order — a reordered or
    re-roled conversation is a different sample. NULL for malformed
    JSON. ``include_system=False`` drops system turns first (dedup
    across system-prompt variants). Exact-dedup composes as
    ``dropDuplicates([out_col])`` or the content-hash dedup family."""
    turns = F.from_json(F.col(conv_col), CHAT_SCHEMA)
    if not include_system:
        turns = F.filter(turns, lambda t: t["role"] != "system")
    sig = F.md5(
        F.array_join(
            F.transform(
                turns,
                lambda t: F.concat(
                    t["role"],
                    F.lit(":"),
                    F.md5(F.coalesce(t["content"], F.lit(""))),
                ),
            ),
            "|",
        )
    )
    return df.withColumn(out_col, sig)
