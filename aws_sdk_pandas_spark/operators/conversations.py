"""Conversation (chat/SFT) dataset operators — the array<struct<role,
content>> shape instruction-tuning corpora ship in.  A malformed
conversation (roles out of order, empty turns, wrong first speaker)
poisons a fine-tune silently, so the gates here are the standard
pre-training-run screens:

- :func:`conversation_stats` — per-row turn counts, role counts,
  alternation and emptiness flags; NULL conversations read zero turns
- :func:`validate_conversations` — rule screen with per-rule error
  labels (empty conversation, unknown role, first speaker, broken
  user/assistant alternation, empty content, missing assistant turn)
- :func:`render_conversations` — deterministic single-string rendering
  (``chatml`` or ``plain``) for tokenizer/packing pipelines
- :func:`conversations_to_pairs` — one (context, response) row per
  assistant turn for reward-model / preference training

Everything is JVM higher-order functions over the turns array — no
UDF, no shuffle except the explode in :func:`conversations_to_pairs`
(one row per assistant turn, linear).  Rows always pass through:
invalid conversations carry their error labels instead of vanishing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ROLES = ("system", "user", "assistant", "tool")


def _turns(conv_col: str) -> Column:
    return F.coalesce(
        F.col(conv_col),
        F.array().cast("array<struct<role:string,content:string>>"),
    )


def _body(conv_col: str) -> Column:
    """Turns minus an optional leading system turn (alternation is
    checked on the user/assistant body)."""
    t = _turns(conv_col)
    return F.when(
        (F.size(t) > 0) & (F.element_at(t, 1)["role"] == "system"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
    ).otherwise(t)


def conversation_stats(
    df: DataFrame, conv_col: str = "conversation", *, out_prefix: str = "conv"
) -> DataFrame:
    """Adds ``<prefix>_n_turns``, ``<prefix>_n_user``,
    ``<prefix>_n_assistant``, ``<prefix>_has_system``,
    ``<prefix>_alternates`` (user/assistant strictly alternate after an
    optional leading system turn), ``<prefix>_n_empty`` (turns with
    NULL/blank content), ``<prefix>_total_chars``.  NULL conversations
    read 0 turns — the row passes through."""
    t = _turns(conv_col)
    body = _body(conv_col)
    role = lambda i: F.element_at(body, i)["role"]  # noqa: E731
    alternates = F.when(F.size(body) == 0, F.lit(False)).otherwise(
        (F.element_at(body, 1)["role"] == "user")
        & F.forall(
            F.sequence(F.lit(1), F.size(body)),
            lambda i: F.when(
                i % 2 == 1, F.element_at(body, i)["role"] == "user"
            ).otherwise(F.element_at(body, i)["role"] == "assistant"),
        )
    )
    count_role = lambda r: F.size(F.filter(t, lambda x: x["role"] == r))  # noqa: E731
    return (
        df.withColumn(f"{out_prefix}_n_turns", F.size(t))
        .withColumn(f"{out_prefix}_n_user", count_role("user"))
        .withColumn(f"{out_prefix}_n_assistant", count_role("assistant"))
        .withColumn(
            f"{out_prefix}_has_system",
            (F.size(t) > 0) & (F.element_at(t, 1)["role"] == "system"),
        )
        .withColumn(f"{out_prefix}_alternates", alternates)
        .withColumn(
            f"{out_prefix}_n_empty",
            F.size(
                F.filter(
                    t,
                    lambda x: x["content"].isNull()
                    | (F.trim(x["content"]) == ""),
                )
            ),
        )
        .withColumn(
            f"{out_prefix}_total_chars",
            F.aggregate(
                t,
                F.lit(0).cast("long"),
                lambda a, x: a + F.coalesce(F.length(x["content"]), F.lit(0)),
            ),
        )
    )


def validate_conversations(
    df: DataFrame,
    conv_col: str = "conversation",
    *,
    roles: tuple[str, ...] = VALID_ROLES,
    out_col: str = "conv_errors",
) -> DataFrame:
    """Adds ``<out_col> array<string>`` (empty array == valid) and
    ``conv_valid boolean``.  Rules: non-empty conversation; every role in
    ``roles``; first speaker is ``system`` or ``user``; user/assistant
    strictly alternate after an optional system turn (``tool`` turns are
    not yet modeled — conversations containing them skip the alternation
    rule); no NULL/blank content; at least one assistant turn.  Invalid
    rows are LABELED, never dropped — filtering is the caller's call."""
    t = _turns(conv_col)
    body = _body(conv_col)
    has_tool = F.exists(t, lambda x: x["role"] == "tool")
    alternation_ok = F.when(F.size(body) == 0, F.lit(False)).otherwise(
        (F.element_at(body, 1)["role"] == "user")
        & F.forall(
            F.sequence(F.lit(1), F.size(body)),
            lambda i: F.when(
                i % 2 == 1, F.element_at(body, i)["role"] == "user"
            ).otherwise(F.element_at(body, i)["role"] == "assistant"),
        )
    )
    checks = [
        (F.size(t) == 0, "empty_conversation"),
        (
            (F.size(t) > 0)
            & F.exists(t, lambda x: ~x["role"].isin(list(roles))),
            "unknown_role",
        ),
        (
            (F.size(t) > 0)
            & ~F.element_at(t, 1)["role"].isin(["system", "user"]),
            "bad_first_role",
        ),
        (
            (F.size(t) > 0) & ~has_tool & ~alternation_ok,
            "broken_alternation",
        ),
        (
            F.exists(
                t, lambda x: x["content"].isNull() | (F.trim(x["content"]) == "")
            ),
            "empty_content",
        ),
        (
            (F.size(t) > 0)
            & ~F.exists(t, lambda x: x["role"] == "assistant"),
            "no_assistant_turn",
        ),
        # NULL roles (incl. wholly-NULL turn structs) slip past the
        # isin-based unknown_role check (NULL isin -> NULL, not true) —
        # label them explicitly so no defect is silent
        (
            F.exists(t, lambda x: x["role"].isNull()),
            "missing_role",
        ),
    ]
    errors = F.filter(
        F.array(*[F.when(cond, F.lit(label)) for cond, label in checks]),
        lambda x: x.isNotNull(),
    )
    return df.withColumn(out_col, errors).withColumn(
        "conv_valid", F.size(F.col(out_col)) == 0
    )


def render_conversations(
    df: DataFrame,
    conv_col: str = "conversation",
    *,
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Deterministic single-string rendering for tokenizer / packing
    pipelines: ``chatml`` (``<|im_start|>role\\ncontent<|im_end|>`` per
    turn) or ``plain`` (``role: content`` lines).  NULL conversations
    render NULL; NULL contents render as empty strings (the validation
    screen flags them — rendering must not invent text)."""
    # roles coalesce like contents: a NULL-role (or wholly-NULL) turn
    # renders as an EMPTY marker instead of silently vanishing — a
    # dropped turn would desync token accounting from the conversation
    # length that packing/stats key on (validation labels the defect)
    if template == "chatml":
        render_turn = lambda x: F.concat(  # noqa: E731
            F.lit("<|im_start|>"), F.coalesce(x["role"], F.lit("")),
            F.lit("\n"),
            F.coalesce(x["content"], F.lit("")), F.lit("<|im_end|>"),
        )
        sep = "\n"
    elif template == "plain":
        render_turn = lambda x: F.concat(  # noqa: E731
            F.coalesce(x["role"], F.lit("")), F.lit(": "),
            F.coalesce(x["content"], F.lit("")),
        )
        sep = "\n"
    else:
        raise ValueError(f"unknown template {template!r} (chatml|plain)")
    rendered = F.array_join(F.transform(F.col(conv_col), render_turn), sep)
    return df.withColumn(
        out_col, F.when(F.col(conv_col).isNotNull(), rendered)
    )


def conversations_to_pairs(
    df: DataFrame,
    conv_col: str = "conversation",
    *,
    id_col: str = "doc_id",
    template: str = "plain",
) -> DataFrame:
    """One (context, response) row per ASSISTANT turn — the reward-model
    / preference-training projection: ``id, turn_idx (1-based), context``
    (all turns before, rendered), ``response`` (that turn's content).
    One posexplode, linear in total turns; conversations without
    assistant turns contribute nothing (they are screened by
    :func:`validate_conversations`, not silently truncated here)."""
    if template == "plain":
        render_turn = lambda x: F.concat(  # noqa: E731
            x["role"], F.lit(": "), F.coalesce(x["content"], F.lit(""))
        )
    elif template == "chatml":
        render_turn = lambda x: F.concat(  # noqa: E731
            F.lit("<|im_start|>"), x["role"], F.lit("\n"),
            F.coalesce(x["content"], F.lit("")), F.lit("<|im_end|>"),
        )
    else:
        raise ValueError(f"unknown template {template!r} (chatml|plain)")
    t = _turns(conv_col)
    ex = df.select(
        F.col(id_col),
        F.col(conv_col).alias("__conv"),
        F.posexplode(t).alias("__pos", "__turn"),
    ).where(F.col("__turn")["role"] == "assistant")
    context = F.array_join(
        F.transform(
            F.slice(F.col("__conv"), 1, F.col("__pos")), render_turn
        ),
        "\n",
    )
    return ex.select(
        F.col(id_col),
        (F.col("__pos") + 1).alias("turn_idx"),
        context.alias("context"),
        F.col("__turn")["content"].alias("response"),
    )


def preference_stats(
    df: DataFrame,
    *,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    out_prefix: str = "pref",
) -> DataFrame:
    """Per-row screens for preference (DPO/RLHF) pairs — the defects
    that silently null a preference signal: adds
    ``<prefix>_identical`` (chosen == rejected after whitespace
    normalization — zero learning signal), ``<prefix>_empty_chosen`` /
    ``<prefix>_empty_rejected``, ``<prefix>_len_ratio``
    (chosen/rejected char length, NULL when rejected is empty — the
    length-bias audit input), ``<prefix>_token_jaccard`` (vocabulary
    overlap; near-1 pairs differ only in phrasing).  Map-only codegen;
    rows are labeled, never dropped."""
    from aws_sdk_pandas_spark.functions.text import token_jaccard

    c = F.col(chosen_col)
    r = F.col(rejected_col)
    norm = lambda x: F.regexp_replace(F.trim(F.coalesce(x, F.lit(""))), r"\s+", " ")  # noqa: E731
    return (
        df.withColumn(f"{out_prefix}_identical", norm(c) == norm(r))
        .withColumn(f"{out_prefix}_empty_chosen", norm(c) == "")
        .withColumn(f"{out_prefix}_empty_rejected", norm(r) == "")
        .withColumn(
            f"{out_prefix}_len_ratio",
            F.round(F.try_divide(F.length(norm(c)), F.length(norm(r))), 6),
        )
        .withColumn(
            f"{out_prefix}_token_jaccard",
            F.round(token_jaccard(norm(c), norm(r)), 6),
        )
    )
