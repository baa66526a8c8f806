"""Conversation/SFT operators: stats, validation labels, rendering,
pair extraction — including the dirty cases (NULL conversation, empty
turns, broken alternation, tool turns)."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark.operators.conversations import (
    conversation_stats,
    conversations_to_pairs,
    render_conversations,
    validate_conversations,
)

CONV_SCHEMA = (
    "doc_id bigint, conversation array<struct<role string, content string>>"
)


def _rows():
    good = [("system", "be helpful"), ("user", "hi"), ("assistant", "hello"),
            ("user", "2+2?"), ("assistant", "4")]
    no_sys = [("user", "q"), ("assistant", "a")]
    double_user = [("user", "q1"), ("user", "q2"), ("assistant", "a")]
    empty_content = [("user", "q"), ("assistant", "  ")]
    bad_role = [("user", "q"), ("robot", "a")]
    assistant_first = [("assistant", "unprompted")]
    no_assistant = [("user", "q1"), ("user", "q2")]
    with_tool = [("user", "q"), ("assistant", "let me check"),
                 ("tool", "result=4"), ("assistant", "4")]
    return [
        (0, good), (1, no_sys), (2, double_user), (3, empty_content),
        (4, bad_role), (5, assistant_first), (6, no_assistant),
        (7, with_tool), (8, None), (9, []),
    ]


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(_rows(), CONV_SCHEMA)


def test_conversation_stats(convs):
    rows = {r.doc_id: r for r in conversation_stats(convs).collect()}
    g = rows[0]
    assert (g.conv_n_turns, g.conv_n_user, g.conv_n_assistant) == (5, 2, 2)
    assert g.conv_has_system is True and g.conv_alternates is True
    assert g.conv_n_empty == 0
    assert g.conv_total_chars == sum(
        len(c) for _r, c in _rows()[0][1]
    )
    assert rows[1].conv_alternates is True and rows[1].conv_has_system is False
    assert rows[2].conv_alternates is False
    assert rows[3].conv_n_empty == 1
    assert rows[8].conv_n_turns == 0  # NULL conversation passes through
    assert rows[9].conv_n_turns == 0


def test_validate_conversations_labels(convs):
    rows = {r.doc_id: r for r in validate_conversations(convs).collect()}
    assert rows[0].conv_valid is True and rows[0].conv_errors == []
    assert rows[1].conv_valid is True
    assert rows[2].conv_errors == ["broken_alternation"]
    assert rows[3].conv_errors == ["empty_content"]
    assert "unknown_role" in rows[4].conv_errors
    assert "bad_first_role" in rows[5].conv_errors
    assert rows[6].conv_errors == ["broken_alternation", "no_assistant_turn"]
    # tool turns skip the alternation rule
    assert rows[7].conv_valid is True
    assert rows[8].conv_errors == ["empty_conversation"]
    assert rows[9].conv_errors == ["empty_conversation"]
    # every input row labeled, none dropped
    assert sorted(rows) == list(range(10))


def test_render_conversations(convs):
    rows = {r.doc_id: r.text for r in render_conversations(
        convs, template="chatml"
    ).collect()}
    assert rows[1] == (
        "<|im_start|>user\nq<|im_end|>\n<|im_start|>assistant\na<|im_end|>"
    )
    assert rows[8] is None  # NULL renders NULL
    assert rows[9] == ""    # empty conversation renders empty string
    plain = {r.doc_id: r.text for r in render_conversations(
        convs, template="plain"
    ).collect()}
    assert plain[1] == "user: q\nassistant: a"
    with pytest.raises(ValueError, match="chatml"):
        render_conversations(convs, template="nope").collect()


def test_conversations_to_pairs(convs):
    pairs = conversations_to_pairs(convs).collect()
    by_key = {(r.doc_id, r.turn_idx): r for r in pairs}
    # good conversation: assistant turns at positions 3 and 5
    assert by_key[(0, 3)].response == "hello"
    assert by_key[(0, 3)].context == "system: be helpful\nuser: hi"
    assert by_key[(0, 5)].response == "4"
    assert by_key[(0, 5)].context.endswith("user: 2+2?")
    # no-assistant and NULL conversations contribute nothing
    assert all(r.doc_id not in (6, 8, 9) for r in pairs)
    # tool conversation: both assistant turns extracted
    assert (7, 2) in by_key and (7, 4) in by_key
    assert by_key[(7, 4)].context.endswith("tool: result=4")


def test_preference_stats(spark):
    from aws_sdk_pandas_spark.operators.conversations import preference_stats

    rows = [
        (0, "the cat sat", "the cat  sat "),   # identical after ws-normalize
        (1, "a good long answer here", "bad"),
        (2, "", "something"),
        (3, None, None),
        (4, "same words shuffled here", "here shuffled words same"),
    ]
    df = spark.createDataFrame(rows, "pair_id bigint, chosen string, rejected string")
    got = {r.pair_id: r for r in preference_stats(df).collect()}
    assert got[0].pref_identical is True
    assert got[1].pref_identical is False
    assert got[1].pref_len_ratio == round(len("a good long answer here") / 3, 6)
    assert got[2].pref_empty_chosen is True and got[2].pref_empty_rejected is False
    assert got[3].pref_identical is True  # both empty after coalesce
    assert got[3].pref_len_ratio is None  # 0/0 -> NULL, not a crash
    assert got[4].pref_token_jaccard == 1.0  # same vocabulary
    assert sorted(got) == [0, 1, 2, 3, 4]


def test_null_role_turns_labeled_and_rendered(spark):
    """NULL roles (incl. wholly-NULL turn structs) must be LABELED by
    validation and render as empty markers — not silently vanish from
    the rendered text (token accounting must track conversation
    length)."""
    from pyspark.sql import types as T

    from aws_sdk_pandas_spark.operators.conversations import (
        render_conversations,
        validate_conversations,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("conversation", T.ArrayType(T.StructType([
            T.StructField("role", T.StringType()),
            T.StructField("content", T.StringType()),
        ]))),
    ])
    rows = spark.createDataFrame(
        [
            (1, [("user", "hi"), None, ("assistant", "yo")]),
            (2, [(None, "x"), ("assistant", "a")]),
            (3, [("user", "q"), ("assistant", "a")]),
        ],
        schema,
    )
    v = {r.doc_id: (r.conv_valid, list(r.conv_errors))
         for r in validate_conversations(rows).collect()}
    assert v[1][0] is False and "missing_role" in v[1][1]
    assert v[2][0] is False and "missing_role" in v[2][1]
    assert v[3] == (True, [])
    rnd = {r.doc_id: r.text for r in render_conversations(rows).collect()}
    # the NULL turn renders as an EMPTY marker, keeping 3 turns visible
    assert rnd[1] == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>\n<|im_end|>\n"
        "<|im_start|>assistant\nyo<|im_end|>"
    )
    assert rnd[2].startswith("<|im_start|>\nx<|im_end|>")
