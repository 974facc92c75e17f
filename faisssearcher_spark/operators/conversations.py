"""Chat-conversation processing for SFT/RLHF data prep.

Instruction-tuning corpora ship as conversations — an array of
``(role, content)`` turns per row — and the prep pipeline needs turn
statistics, structural validation, and deterministic rendering to
training text. Everything here works DIRECTLY on the array column with
Catalyst array functions (transform / filter / zip_with / aggregate):
no explode unless the caller wants a turns table, so per-conversation
operations stay one-row-in/one-row-out with zero shuffle.

Downstream composition: ``render_training_text`` output feeds the
existing text machinery — quality/lang filters, dedup fingerprints,
``chunk_documents`` → ``pack_token_budget``, BPE counting — unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical conversation column type
MESSAGES_TYPE = "array<struct<role:string,content:string>>"


def flatten_turns(df: DataFrame, *, conv_col: str = "messages",
                  id_col: str = "conv_id") -> DataFrame:
    """Long-format turns table ``(conv_id, turn_idx, role, content)`` —
    for per-turn analytics (role-conditional token stats, per-turn PII
    redaction) when row-per-turn is genuinely needed."""
    return (df.select(F.col(id_col),
                      F.posexplode_outer(F.col(conv_col))
                      .alias("turn_idx", "turn"))
            .filter(F.col("turn").isNotNull())
            .select(id_col, "turn_idx",
                    F.col("turn.role").alias("role"),
                    F.col("turn.content").alias("content")))


def _roles(conv_col: str) -> Column:
    return F.transform(F.col(conv_col), lambda m: m["role"])


def conversation_stats(df: DataFrame, *, conv_col: str = "messages",
                       chars_per_token: float = 4.0) -> DataFrame:
    """Append per-conversation structure/size columns — all array
    expressions over the conversation column, no explode, no shuffle:

    - ``n_turns`` / ``n_user_turns`` / ``n_assistant_turns``
    - ``n_tokens_est`` — chars/4 estimate summed over contents
    - ``roles_valid`` — structural contract for training: non-empty,
      ``system`` only as the first message, no two consecutive turns
      with the same role, first non-system turn is ``user``, and the
      final turn is ``assistant`` (something to learn from).
    """
    msgs = F.col(conv_col)
    roles = _roles(conv_col)
    non_sys = F.filter(roles, lambda r: r != "system")
    # compare equal-length slices: zip_with null-pads the SHORTER input,
    # and forall over a null comparison goes null (→ invalid)
    n_less_1 = F.greatest(F.size(roles) - 1, F.lit(0))
    no_repeat = F.forall(
        F.zip_with(F.slice(roles, 1, n_less_1),
                   F.slice(roles, 2, n_less_1),
                   lambda a, b: a != b),
        lambda x: x)
    sys_only_first = F.forall(
        F.zip_with(roles,
                   F.sequence(F.lit(1), F.size(roles)),
                   lambda r, i: (r != "system") | (i == 1)),
        lambda x: x)
    valid = ((F.size(msgs) > 0)
             & sys_only_first
             & no_repeat
             & (F.element_at(non_sys, 1) == "user")
             & (F.element_at(roles, -1) == "assistant"))
    tokens_est = F.aggregate(
        msgs, F.lit(0),
        lambda acc, m: acc + F.ceil(F.length(F.coalesce(m["content"],
                                                        F.lit("")))
                                    / F.lit(chars_per_token)).cast("int"))
    count_role = (lambda r: F.size(F.filter(roles, lambda x: x == r)))
    return (df.withColumn("n_turns", F.size(msgs))
            .withColumn("n_user_turns", count_role("user"))
            .withColumn("n_assistant_turns", count_role("assistant"))
            .withColumn("n_tokens_est", tokens_est)
            .withColumn("roles_valid", F.coalesce(valid, F.lit(False))))


def render_training_text(df: DataFrame, *, conv_col: str = "messages",
                         out_col: str = "text",
                         turn_template: str = "<|{role}|>\n{content}\n"
                         ) -> DataFrame:
    """Deterministic ChatML-style rendering of each conversation into
    ONE training-text column — the bridge into the existing text
    pipeline (quality, dedup, chunk → pack, BPE). ``turn_template``
    must contain ``{role}`` and ``{content}`` placeholders, in either
    order (and possibly repeated)."""
    import re as _re

    if "{role}" not in turn_template or "{content}" not in turn_template:
        raise ValueError("turn_template needs {role} and {content}")
    pieces = _re.split(r"(\{role\}|\{content\})", turn_template)

    def _turn(m: Column) -> list[Column]:
        out = []
        for p in pieces:
            if p == "{role}":
                out.append(F.coalesce(m["role"], F.lit("")))
            elif p == "{content}":
                out.append(F.coalesce(m["content"], F.lit("")))
            elif p:
                out.append(F.lit(p))
        return out

    rendered = F.aggregate(
        F.col(conv_col), F.lit(""),
        lambda acc, m: F.concat(acc, *_turn(m)))
    return df.withColumn(out_col, rendered)
