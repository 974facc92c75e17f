"""C4-style global line/segment dedup (operators/dedup.py:dedup_lines).

Semantics pinned here: corpus-global keep-FIRST occurrence by (id, pos),
intra-document repeats removed too, min_chars drops short lines before
anything else, drop_empty_docs controls whether fully-deduped documents
survive with empty text.
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.dedup import dedup_lines, dedup_segments


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta\ncommon line\nunique one"),
        (2, "common line\ngamma delta\ncommon line"),   # cross-doc + intra-doc dup
        (3, "common line"),                             # fully deduped away
        (4, "x\n\nzz\nfresh line"),                     # short + empty lines
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_occurrence_global(spark, corpus):
    out = {r["doc_id"]: r for r in dedup_lines(corpus, min_chars=2).collect()}
    # doc 1 is the first holder of "common line" — keeps everything
    assert out[1]["text"] == "alpha beta\ncommon line\nunique one"
    assert (out[1]["n_lines"], out[1]["n_kept_lines"]) == (3, 3)
    # doc 2 loses both occurrences of the dup (cross-doc AND its own repeat)
    assert out[2]["text"] == "gamma delta"
    assert (out[2]["n_lines"], out[2]["n_kept_lines"]) == (3, 1)
    # doc 3 loses its only line -> dropped under default drop_empty_docs
    assert 3 not in out
    # doc 4: "x" (1 char) and "" dropped by min_chars=2 before dedup
    assert out[4]["text"] == "zz\nfresh line"
    assert (out[4]["n_lines"], out[4]["n_kept_lines"]) == (2, 2)


def test_keep_empty_docs(spark, corpus):
    out = {r["doc_id"]: r
           for r in dedup_lines(corpus, min_chars=2,
                                drop_empty_docs=False).collect()}
    assert out[3]["text"] == ""
    assert (out[3]["n_lines"], out[3]["n_kept_lines"]) == (1, 0)


def test_every_line_globally_unique_after(spark, corpus):
    out = dedup_lines(corpus, min_chars=1)
    lines = out.select(F.explode(F.split("text", "\n")).alias("l"))
    total = lines.count()
    assert lines.distinct().count() == total


def test_dedup_segments_on_chunks(documents):
    """Composed with chunk_documents (the gate shape): survivors are
    exactly one occurrence per distinct chunk, and the kept occurrence is
    the (doc_id, chunk_idx)-minimal one."""
    from faisssearcher_spark.operators.text_analysis import chunk_documents

    chunks = chunk_documents(documents, max_tokens=10, overlap=0)
    kept = dedup_segments(chunks, id_col="doc_id", pos_col="chunk_idx",
                          seg_col="chunk_text")
    n_distinct = chunks.select("chunk_text").distinct().count()
    assert kept.count() == n_distinct
    # the kept (doc_id, chunk_idx) is the struct-min over each group
    firsts = chunks.groupBy("chunk_text").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("f"))
    joined = kept.alias("k").join(
        firsts.alias("f"), "chunk_text").filter(
        (F.col("k.doc_id") != F.col("f.f.doc_id"))
        | (F.col("k.chunk_idx") != F.col("f.f.chunk_idx")))
    assert joined.count() == 0


def test_custom_separator_is_literal(spark):
    # '|' is a regex metachar — must be treated literally
    df = spark.createDataFrame([(1, "a b|c d|a b")], "doc_id long, text string")
    out = dedup_lines(df, sep="|").collect()[0]
    assert out["text"] == "a b|c d"
    assert (out["n_lines"], out["n_kept_lines"]) == (3, 2)
