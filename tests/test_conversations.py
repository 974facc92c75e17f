"""Chat-conversation prep (operators/conversations.py)."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import conversations as C


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        (0, [("system", "be helpful"), ("user", "hi"),
             ("assistant", "hello"), ("user", "thanks"),
             ("assistant", "yw")]),
        (1, [("user", "solo question"), ("assistant", "answer")]),
        (2, [("assistant", "starts wrong")]),
        (3, [("user", "a"), ("user", "b"), ("assistant", "c")]),
        (4, [("user", "no reply at end"), ("assistant", "mid"),
             ("user", "dangling")]),
        (5, []),
    ]
    return spark.createDataFrame(rows,
                                 f"conv_id long, messages {C.MESSAGES_TYPE}")


class TestConversationStats:
    def test_counts_and_validity(self, convs):
        out = {r["conv_id"]: r for r in
               C.conversation_stats(convs).collect()}
        assert out[0]["n_turns"] == 5
        assert out[0]["n_user_turns"] == 2
        assert out[0]["n_assistant_turns"] == 2
        assert out[0]["roles_valid"] is True
        assert out[1]["roles_valid"] is True
        assert out[2]["roles_valid"] is False   # starts with assistant
        assert out[3]["roles_valid"] is False   # consecutive user turns
        assert out[4]["roles_valid"] is False   # ends on user
        assert out[5]["roles_valid"] is False   # empty

    def test_token_estimate(self, spark):
        df = spark.createDataFrame(
            [(0, [("user", "abcdefgh"), ("assistant", "abcd")])],
            f"conv_id long, messages {C.MESSAGES_TYPE}")
        r = C.conversation_stats(df).first()
        assert r["n_tokens_est"] == 3    # ceil(8/4) + ceil(4/4)


class TestFlattenAndRender:
    def test_flatten_turns(self, convs):
        turns = C.flatten_turns(convs.filter("conv_id = 0")).collect()
        assert [(t["turn_idx"], t["role"]) for t in turns] == [
            (0, "system"), (1, "user"), (2, "assistant"),
            (3, "user"), (4, "assistant")]

    def test_render_chatml_and_feed_text_pipeline(self, convs):
        from faisssearcher_spark.functions.text import token_count
        rendered = C.render_training_text(convs.filter("conv_id = 1"))
        r = rendered.first()
        assert r["text"] == "<|user|>\nsolo question\n" \
                            "<|assistant|>\nanswer\n"
        n = rendered.select(token_count("text").alias("n")).first()["n"]
        assert n == 5    # the rendered text is ordinary text downstream

    def test_template_validation(self, convs):
        with pytest.raises(ValueError, match="role"):
            C.render_training_text(convs, turn_template="{content} only")


class TestTemplateOrder:
    def test_content_before_role(self, spark):
        """Placeholders work in either order (review finding: the
        split-based parser crashed on {content} first)."""
        df = spark.createDataFrame(
            [(0, [("user", "hi")])],
            f"conv_id long, messages {C.MESSAGES_TYPE}")
        out = C.render_training_text(
            df, turn_template="{content} -- {role}\n").first()
        assert out["text"] == "hi -- user\n"
