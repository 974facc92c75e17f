"""Single-pass data-quality constraints (operators/expect.py)."""

import pytest
from pyspark.sql import Row

from faisssearcher_spark.operators import expect


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(id=1, text="hello", lang="en", n=10),
        Row(id=2, text="world", lang="fr", n=20),
        Row(id=3, text=None, lang="en", n=-5),
        Row(id=3, text="dup id", lang="xx", n=999),
    ]
    return spark.createDataFrame(rows)


def _report(df, constraints):
    return {(r["constraint"], r["column"]): (r["passed"], r["observed"])
            for r in expect.check(df, constraints).collect()}


class TestConstraints:
    def test_verdicts_on_known_frame(self, frame):
        rep = _report(frame, [
            expect.not_null("id"),
            expect.not_null("text"),
            expect.unique("id"),
            expect.unique("text"),
            expect.completeness("text", min_ratio=0.5),
            expect.in_range("n", 0, 100),
            expect.accepted_values("lang", ["en", "fr"]),
            expect.row_count_between(1, 10),
        ])
        assert rep[("not_null", "id")] == (True, 0.0)
        assert rep[("not_null", "text")] == (False, 1.0)
        assert rep[("unique", "id")] == (False, 1.0)      # one dup pair
        assert rep[("unique", "text")] == (True, 0.0)     # nulls ignored
        assert rep[("completeness", "text")] == (True, 0.75)
        assert rep[("in_range", "n")] == (False, 2.0)     # -5 and 999
        assert rep[("accepted_values", "lang")] == (False, 1.0)
        assert rep[("row_count_between", "*")] == (True, 4.0)

    def test_matches_regex_and_null_passes(self, frame):
        rep = _report(frame, [expect.matches("lang", r"^[a-z]{2}$"),
                              expect.matches("text", r"^[a-z ]+$")])
        assert rep[("matches", "lang")] == (True, 0.0)
        # null text does not violate; "dup id" matches the class too
        assert rep[("matches", "text")] == (True, 0.0)

    def test_duplicate_rule_same_column_independent(self, frame):
        out = expect.check(frame, [
            expect.in_range("n", 0, None),       # fails (-5)
            expect.in_range("n", None, 1000),    # passes
        ]).collect()
        assert [r["passed"] for r in out] == [False, True]

    def test_empty_frame(self, frame):
        empty = frame.limit(0)
        rep = _report(empty, [
            expect.not_null("id"),
            expect.row_count_between(1, None),
            expect.completeness("text", min_ratio=0.9),
        ])
        assert rep[("not_null", "id")] == (True, 0.0)
        assert rep[("row_count_between", "*")][0] is False
        assert rep[("completeness", "text")][0] is False

    def test_single_aggregation_pass(self, frame):
        """All constraints fold into ONE Aggregate over the input —
        no per-rule jobs, no joins."""
        plan = expect.check(frame, [
            expect.not_null("id"),
            expect.in_range("n", 0, 100),
            expect.matches("lang", "en|fr"),
            expect.row_count_between(1, None),
        ])._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 1
        assert "Join" not in plan

    def test_validation_errors(self, frame):
        with pytest.raises(ValueError, match="at least one bound"):
            expect.in_range("n", None, None)
        with pytest.raises(ValueError, match="non-empty"):
            expect.accepted_values("lang", [])
        with pytest.raises(ValueError, match="non-empty"):
            expect.check(frame, [])

    def test_gatekeeper_on_real_corpus(self, documents):
        report = expect.check(documents, [
            expect.not_null("doc_id"),
            expect.unique("doc_id"),
            expect.completeness("text", min_ratio=0.99),
            expect.non_negative("n_chars"),
            expect.matches("lang", r"^[a-z]{2}$"),
        ])
        assert report.filter("NOT passed").count() == 0


class TestNullSemantics:
    def test_in_range_ignores_nulls(self, spark):
        """Nulls are not range violations (they are not_null's job) —
        consistent with matches/accepted_values."""
        df = spark.createDataFrame([(10,), (20,), (None,)], "n int")
        rep = {r["constraint"]: (r["passed"], r["observed"])
               for r in expect.check(df, [
                   expect.in_range("n", 0, 100),
                   expect.not_null("n")]).collect()}
        assert rep["in_range"] == (True, 0.0)
        assert rep["not_null"] == (False, 1.0)
