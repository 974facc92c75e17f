"""PII redaction and train/eval contamination detection."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import decontam, privacy


class TestRedactPii:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "contact bob@example.com or +1 555-123-4567 today"),
            (1, "server at 192.168.10.20 logged card 4111111111111111"),
            (2, "perfectly clean text with the number 42 in it"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_redacts_all_shapes(self, corpus):
        got = {r["doc_id"]: r["text"]
               for r in privacy.redact_pii(corpus).collect()}
        assert got[0] == "contact <EMAIL> or <PHONE> today"
        assert got[1] == "server at <IP> logged card <NUMBER>"
        assert got[2] == "perfectly clean text with the number 42 in it"

    def test_counts_are_audit_trail(self, corpus):
        got = {r["doc_id"]: r for r in privacy.redact_pii(corpus).collect()}
        assert (got[0]["n_email"], got[0]["n_phone"]) == (1, 1)
        assert (got[1]["n_ipv4"], got[1]["n_long_digits"]) == (1, 1)
        assert sum(got[2][f"n_{k}"] for k in privacy.PII_RULES) == 0

    def test_out_col_preserves_original(self, corpus):
        out = privacy.redact_pii(corpus, out_col="clean_text",
                                 with_counts=False)
        row = out.filter("doc_id = 0").first()
        assert "bob@example.com" in row["text"]
        assert "<EMAIL>" in row["clean_text"]

    def test_no_python_in_plan(self, corpus):
        from faisssearcher_spark.plans import inspect
        plan = inspect.executed_plan(privacy.redact_pii(corpus))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_output_column_collisions_raise(self, spark, corpus):
        # r4 ADVICE: a frame already carrying n_email (or the out_col)
        # would get duplicate column names — fail loudly instead
        with_n = corpus.withColumn("n_email", F.lit(9))
        with pytest.raises(ValueError, match="n_email"):
            privacy.redact_pii(with_n)
        with_out = corpus.withColumn("clean_text", F.lit("x"))
        with pytest.raises(ValueError, match="clean_text"):
            privacy.redact_pii(with_out, out_col="clean_text",
                               with_counts=False)
        # counts disabled → n_<rule> collisions are not collisions
        out = privacy.redact_pii(with_n, with_counts=False)
        assert out.columns.count("n_email") == 1


class TestContamination:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        eval_text = "the quick brown fox jumps over the lazy dog"
        train = spark.createDataFrame(
            [(0, f"prefix words here {eval_text} and suffix words"),
             (1, "totally unrelated training document about spark plans"),
             (2, "the quick brown fox jumps over a different dog today")],
            "doc_id long, text string")
        ev = spark.createDataFrame([(100, eval_text)],
                                   "doc_id long, text string")
        return train, ev

    def test_full_containment_scores_one(self, corpora):
        train, ev = corpora
        pairs = decontam.contamination_pairs(train, ev, n=5).collect()
        by_train = {r["train_id"]: r for r in pairs}
        assert by_train[0]["overlap_fraction"] == pytest.approx(1.0)
        assert 1 not in by_train
        # doc 2 shares a 5-gram prefix but not all shingles
        assert 0 < by_train[2]["overlap_fraction"] < 1.0

    def test_decontaminate_drops_contaminated(self, corpora):
        train, ev = corpora
        kept = decontam.decontaminate(train, ev, n=5,
                                      min_overlap_fraction=0.9)
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]

    def test_no_cross_product_in_plan(self, corpora):
        from faisssearcher_spark.plans import inspect
        train, ev = corpora
        plan = inspect.executed_plan(
            decontam.contamination_pairs(train, ev, n=5))
        assert "CartesianProduct" not in plan

    def test_short_eval_items_unflaggable(self, spark, corpora):
        train, _ = corpora
        ev = spark.createDataFrame([(200, "too short")],
                                   "doc_id long, text string")
        assert decontam.contamination_pairs(train, ev, n=8).count() == 0


class TestBlocklistScreen:
    def test_word_boundary_counts_and_drop(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        rows = [(0, "the class discusses mass"),    # no whole-word hits
                (1, "bad word here and BAD again"),  # 2 (case-insensitive)
                (2, "clean text entirely")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        flagged = {r["doc_id"]: r["n_blocked_terms"] for r in
                   blocklist_screen(df, ["bad", "ass"]).collect()}
        assert flagged == {0: 0, 1: 2, 2: 0}
        kept = blocklist_screen(df, ["bad", "ass"], mode="drop")
        assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]

    def test_chunked_terms_and_validation(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame([(0, "t5 and t250 appear")],
                                   "doc_id long, text string")
        terms = [f"t{i}" for i in range(300)]
        out = blocklist_screen(df, terms, chunk_size=100).first()
        assert out["n_blocked_terms"] == 2
        import pytest as _pt
        with _pt.raises(ValueError, match="non-empty"):
            blocklist_screen(df, [])
        with _pt.raises(ValueError, match="mode"):
            blocklist_screen(df, ["x"], mode="redact")

    def test_regex_metachars_escaped(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame([(0, "a.b literal and acb")],
                                   "doc_id long, text string")
        out = blocklist_screen(df, ["a.b"]).first()
        assert out["n_blocked_terms"] == 1   # dot is literal, acb no hit


class TestBlocklistReviewRegressions:
    def test_punctuation_edge_terms_match(self, spark):
        """\\b never fires next to a non-word edge — lookarounds must
        take over for terms like 'c++' (review finding)."""
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame(
            [(0, "I love c++ so much"), (1, "cpp only"), (2, "c+++x")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["n_blocked_terms"] for r in
               blocklist_screen(df, ["c++"]).collect()}
        assert got[0] == 1
        assert got[1] == 0     # 'cpp' is not 'c++'
        # the lookaround contract blocks WORD-char continuation only:
        # 'c+++x' still matches 'c++' (followed by '+', a non-word char)
        assert got[2] == 1

    def test_null_text_zero_hits_and_kept(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame([(0, None), (1, "bad stuff")],
                                   "doc_id long, text string")
        flagged = {r["doc_id"]: r["n_blocked_terms"]
                   for r in blocklist_screen(df, ["bad"]).collect()}
        assert flagged == {0: 0, 1: 1}
        kept = blocklist_screen(df, ["bad"], mode="drop")
        assert [r["doc_id"] for r in kept.collect()] == [0]

    def test_unicode_case_fold(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame([(0, "полный БАН тут")],
                                   "doc_id long, text string")
        out = blocklist_screen(df, ["бан"]).first()
        assert out["n_blocked_terms"] == 1   # (?iu), not ASCII-only (?i)

    def test_empty_term_rejected(self, spark):
        from faisssearcher_spark.operators.privacy import blocklist_screen
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError, match="non-empty strings"):
            blocklist_screen(df, ["ok", ""])


class TestContaminatedSpans:
    def test_surgical_removal_keeps_remainder(self, spark):
        ev = spark.createDataFrame(
            [(0, "the secret benchmark answer is forty two")],
            "doc_id long, text string")
        train = spark.createDataFrame(
            [(1, "intro words the secret benchmark answer is forty "
                 "two and some novel analysis follows here"),
             (2, "completely original content with no overlap at all"),
             (3, "the secret benchmark answer is forty two")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in decontam.remove_contaminated_spans(
            train, ev, min_len=4).collect()}
        assert out[1]["text"] == ("intro words and some novel analysis "
                                  "follows here")
        assert out[1]["n_contam_tokens"] == 7
        assert out[2]["text"].startswith("completely original")
        assert out[2]["n_contam_tokens"] == 0
        assert out[3]["text"] == "" and out[3]["n_contam_tokens"] == 7

    def test_against_cross_corpus_brute_force(self, spark):
        """Coverage equivalence, CROSS-corpus: positions covered by any
        train/eval-shared substring of length >= L (brute force) must
        equal the operator's covered set exactly."""
        import random
        rng = random.Random(77)
        evals = [[rng.choice("abc") for _ in range(rng.randint(0, 12))]
                 for _ in range(4)]
        train = {i: [rng.choice("abc") for _ in range(rng.randint(0, 15))]
                 for i in range(10)}

        def brute(L):
            esubs = {tuple(t[s:e]) for t in evals
                     for s in range(len(t))
                     for e in range(s + L, len(t) + 1)}
            cov = {}
            for did, toks in train.items():
                c = set()
                for s in range(len(toks)):
                    for e in range(s + L, len(toks) + 1):
                        if tuple(toks[s:e]) in esubs:
                            c.update(range(s, e))
                cov[did] = c
            return cov

        evdf = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(evals)],
            "doc_id long, text string")
        tdf = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in train.items()],
            "doc_id long, text string")
        for L in (2, 3):
            want = brute(L)
            got = {i: set() for i in train}
            for r in decontam.contaminated_spans(tdf, evdf,
                                                 min_len=L).collect():
                got[r["doc_id"]].update(range(r["start"], r["end"]))
            assert got == want, f"mismatch at min_len={L}"
            rem = {r["doc_id"]: r["n_contam_tokens"]
                   for r in decontam.remove_contaminated_spans(
                       tdf, evdf, min_len=L).collect()}
            assert rem == {d: len(c) for d, c in want.items()}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            decontam.remove_contaminated_spans(df, df, min_len=0)
        with pytest.raises(ValueError):
            decontam.contaminated_spans(
                df.withColumnRenamed("doc_id", "end"), df,
                train_id_col="end", min_len=2)
