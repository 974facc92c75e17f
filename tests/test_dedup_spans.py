"""Exact duplicate-span removal (operators/dedup.py:duplicate_spans /
remove_duplicate_spans) — the Lee et al. 2022 ExactSubstr shape as a
relational plan.

Semantics pinned here: a span is an n-token sliding window; every
occurrence of a window text except the corpus-first (by (id, start)) marks
its n token positions for removal; overlapping marked windows merge via
the position-set union; documents reassemble from surviving tokens in
order; unique-only documents pass through byte-identical.
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.dedup import (duplicate_spans,
                                                 remove_duplicate_spans)


@pytest.fixture(scope="module")
def corpus(spark):
    # 3-token windows; "p q r s" duplicated across docs at different
    # alignments, doc 3 wholly duplicated, doc 4 too short for a window.
    rows = [
        (1, "a b p q r s c d"),
        (2, "x p q r s y z"),      # shares the 4-token passage, shifted
        (3, "p q r s"),            # nothing but the duplicated passage
        (4, "u v"),                # shorter than n -> no windows
        (5, "m n o m n o m n o"),  # intra-doc repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_marks_non_first_only(spark, corpus):
    marks = {(r["doc_id"], r["start"])
             for r in duplicate_spans(corpus, n=3).collect()}
    # "p q r" first occurs in doc 1 at start 2; "q r s" at start 3.
    assert (1, 2) not in marks and (1, 3) not in marks
    # doc 2 holds later occurrences of both windows (starts 1 and 2).
    assert (2, 1) in marks and (2, 2) in marks
    # doc 3 likewise (starts 0 and 1).
    assert (3, 0) in marks and (3, 1) in marks
    # doc 4 has no windows at all.
    assert not any(d == 4 for d, _ in marks)
    # doc 5's repeats of "m n o" / "n o m" / "o m n" mark later starts.
    assert (5, 0) not in marks and (5, 3) in marks and (5, 6) in marks


def test_remove_rebuilds_in_order(spark, corpus):
    out = {r["doc_id"]: r
           for r in remove_duplicate_spans(corpus, n=3).collect()}
    # first holder keeps everything, byte-identical
    assert out[1]["text"] == "a b p q r s c d"
    assert out[1]["n_dup_tokens"] == 0
    # doc 2: positions 1..4 covered (union of windows at 1 and 2)
    assert out[2]["text"] == "x y z"
    assert (out[2]["n_tokens"], out[2]["n_dup_tokens"]) == (7, 4)
    # doc 3 fully duplicated -> empty text, kept by default
    assert out[3]["text"] == ""
    assert out[3]["n_dup_tokens"] == 4
    # doc 4 too short for any window -> untouched
    assert out[4]["text"] == "u v" and out[4]["n_dup_tokens"] == 0
    # doc 5: window at 0 survives; positions 3..8 covered
    assert out[5]["text"] == "m n o"
    assert (out[5]["n_tokens"], out[5]["n_dup_tokens"]) == (9, 6)


def test_drop_empty_docs(spark, corpus):
    out = remove_duplicate_spans(corpus, n=3, drop_empty_docs=True)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 not in ids and ids == {1, 2, 4, 5}


def test_no_duplicate_window_survives(documents):
    """Corpus property on real testdata: after removal, re-windowing the
    cleaned corpus yields no window text with >1 occurrence... EXCEPT
    windows newly formed by token adjacency across a removed gap, which
    span removal deliberately allows (Lee et al. cut-and-splice). Check
    the conservative invariant instead: every surviving token count
    matches n_tokens - n_dup_tokens and totals shrink."""
    before = documents.select(
        F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                        lambda t: t != "")).alias("n")) \
        .agg(F.sum("n")).collect()[0][0]
    out = remove_duplicate_spans(documents, n=10)
    agg = out.agg(F.sum("n_tokens").alias("t"),
                  F.sum("n_dup_tokens").alias("d")).collect()[0]
    assert agg["t"] == before
    assert 0 < agg["d"] < before
    # reassembled token counts agree with the bookkeeping columns
    bad = out.filter(
        F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                        lambda t: t != ""))
        != F.col("n_tokens") - F.col("n_dup_tokens")).count()
    assert bad == 0


def test_n_validation(spark, corpus):
    with pytest.raises(ValueError):
        duplicate_spans(corpus, n=0)


def test_id_col_collision_rejected(spark, corpus):
    renamed = corpus.withColumnRenamed("doc_id", "start")
    with pytest.raises(ValueError):
        duplicate_spans(renamed, id_col="start", n=3)


def test_randomized_against_python_oracle(spark):
    """Randomized pin: 40 docs over a 6-token alphabet (dense window
    collisions) must match a direct Python implementation of
    keep-first-global span marking + rebuild, for several window sizes."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "c", "d", "e", "f"]
    docs = {did: [rng.choice(alphabet) for _ in range(rng.randint(0, 25))]
            for did in range(40)}

    def py_remove(n):
        occ = {}
        for did in sorted(docs):
            toks = docs[did]
            for s in range(max(0, len(toks) - n + 1)):
                occ.setdefault(" ".join(toks[s:s + n]), []).append((did, s))
        covered = {did: set() for did in docs}
        for lst in occ.values():
            if len(lst) > 1:
                for did, s in sorted(lst)[1:]:
                    covered[did].update(range(s, s + n))
        return {did: (" ".join(t for i, t in enumerate(toks)
                               if i not in covered[did]),
                      len(toks), len(covered[did]))
                for did, toks in docs.items()}

    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs.items()],
        "doc_id long, text string")
    for n in (2, 3, 5):
        got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_dup_tokens"])
               for r in remove_duplicate_spans(df, n=n).collect()}
        assert got == py_remove(n), f"mismatch at n={n}"
