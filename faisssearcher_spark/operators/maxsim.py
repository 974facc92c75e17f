"""MaxSim late-interaction rerank (ColBERT-style, Khattab & Zaharia
2020) — token-level second-stage scoring.

The reference's interact mode (bert_encoder.py:187-192,
encoder_utils.py:78-105) scores candidate pairs with one pooled vector
per side; late interaction keeps one vector PER TOKEN and scores

    maxsim(q, d) = sum over distinct query tokens t of
                   max over distinct doc tokens u of cos(vec(t), vec(u))

— each query token matches its best doc token, so partial/reordered
overlap scores higher than pooled cosine allows. Here the stage is
engine surface on top of the Encoder protocol: any encoder exposing
``spark_expr`` (pure-Catalyst text → vector) supplies the token
vectors; the deterministic :class:`HashingEncoder` is the default, so
the whole retrieve→maxsim pipeline is oracle-checkable in DuckDB
(same md5 token components, same normalize/dot association order).

Scale shape (the rerank quadrant — never applied to the corpus):

- the candidate set is ≤ queries·k rows from a first stage
  (knn_join / BM25 / ANN), so every frame here is candidate-sized;
- token vectors are computed ONCE per distinct token of the candidate
  set (one Zipf-small vocab frame, broadcast into the token joins —
  never one encode per (pair, token) occurrence);
- the |Q|·|D| token interaction materializes per pair — bounded by
  per-doc token counts, independent of corpus size — and reduces
  through two partial-aggregable groupBys (max per query token, then
  sum per pair). No window over the expansion, no Python in the plan;
- the expansion is keyed on md5 text fingerprints, never the texts
  themselves — document strings are not multiplied through the
  |Q|·|D| shuffle.

The ``candidates`` frame is referenced by several subplans (pair keys,
each side's token frame, the final score join-back); pass a
materialized/cheap frame — first stages here are top-k outputs small
enough to land as literals (the registry's ``_landed`` pattern) or to
persist at the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions.text import tokens
from faisssearcher_spark.functions.vector import l2_normalize

__all__ = ["maxsim_score", "maxsim_rerank"]


def _side_tokens(texts: DataFrame, out_text: str, out_tok: str) -> DataFrame:
    """(text) -> one row per DISTINCT whitespace token of each text.

    ``explode_outer`` + attribute filter, not ``explode``: pushdown would
    otherwise inline the split expression into generated filters (the
    NOTES.md InferFiltersFromGenerate trap), and texts with no tokens
    must simply produce no rows (their pairs coalesce to score 0)."""
    return (texts
            .select(F.col("__text").alias(out_text),
                    F.explode_outer(F.array_distinct(tokens("__text")))
                     .alias(out_tok))
            .filter(F.col(out_tok).isNotNull()))


def maxsim_score(
    candidates: DataFrame,
    *,
    query_col: str = "source_item",
    cand_col: str = "sim_item",
    encoder=None,
    dim: int = 8,
    score_col: str = "maxsim_score",
    score_scale: int | None = None,
) -> DataFrame:
    """Add a MaxSim late-interaction score to candidate (query, doc)
    text pairs.

    Input is any frame of ``(query_col, cand_col, *extra)`` rows —
    typically a first-stage retrieval output. Every input column is
    kept; ``score_col`` is added. A pair where EITHER side has no
    tokens realizes no interactions and coalesces to 0.0; otherwise
    every query token meets every doc token by construction.

    ``encoder`` must expose ``spark_expr(col) -> Column`` producing a
    fixed-width array<double> of exactly ``dim`` components (the
    interaction unpacks that many scalar columns); default is
    ``HashingEncoder(dim=dim)``.
    ``score_scale`` rounds the final sum (4 recommended cross-engine:
    per-token maxes are exact comparisons of identically-associated
    dots, the sum carries only ulp-order drift, the round absorbs it).
    """
    if encoder is None:
        from faisssearcher_spark.encoders.mock import HashingEncoder
        encoder = HashingEncoder(dim=dim)

    # the token expansion below multiplies each pair by |Q|·|D| rows;
    # keying it on the raw texts would shuffle every document string
    # |Q|·|D| times. md5 fingerprints (deterministic, collision-free at
    # rerank cardinalities) are the expansion/grouping keys instead —
    # texts travel only in the vocab-sized side frames and the final
    # candidate join-back.
    qk, dk = F.md5(F.col(query_col)), F.md5(F.col(cand_col))
    pairs = candidates.select(qk.alias("__q_id"), dk.alias("__d_id")) \
        .distinct()
    q_texts = candidates.select(F.col(query_col).alias("__text")) \
        .distinct()
    d_texts = candidates.select(F.col(cand_col).alias("__text")) \
        .distinct()
    qt = _side_tokens(q_texts, "__q_text", "__tok")
    dt = _side_tokens(d_texts, "__d_text", "__tok")

    # one encode per distinct token of the candidate set; normalized
    # here so the per-interaction cosine below is a plain dot
    vocab = (qt.select("__tok").union(dt.select("__tok")).distinct()
             .withColumn("__vec", l2_normalize(encoder.spark_expr("__tok"))))

    # the normalized vectors are UNPACKED to scalar columns here: the
    # array dot (aggregate ∘ zip_with) is CodegenFallback, and running
    # it interpreted per expansion row measured ~5 s on a 500k-row
    # interaction where the scalar multiply-add chain — whole-stage
    # codegen — is sub-second. 0.0 + x == x, so the chain is bitwise
    # the fold the metric library computes.
    q_side = qt.join(F.broadcast(vocab), "__tok").select(
        F.md5("__q_text").alias("__q_id"),
        F.col("__tok").alias("__q_tok"),
        *[F.element_at("__vec", j + 1).alias(f"__q{j}")
          for j in range(dim)])
    d_side = dt.join(F.broadcast(vocab), "__tok").select(
        F.md5("__d_text").alias("__d_id"),
        F.col("__tok").alias("__d_tok"),
        *[F.element_at("__vec", j + 1).alias(f"__d{j}")
          for j in range(dim)])

    dot: Column = F.lit(0.0)
    for j in range(dim):
        dot = dot + F.col(f"__q{j}") * F.col(f"__d{j}")
    expanded = (pairs
                .join(q_side, "__q_id")
                .join(d_side, "__d_id")
                .withColumn("__dot", dot))
    per_qtok = expanded.groupBy("__q_id", "__d_id", "__q_tok") \
        .agg(F.max("__dot").alias("__m"))
    score: Column = F.sum("__m")
    if score_scale is not None:
        score = F.round(score, score_scale)
    scores = per_qtok.groupBy("__q_id", "__d_id") \
        .agg(score.alias(score_col))

    out = (candidates
           .withColumn("__q_id", qk).withColumn("__d_id", dk)
           .join(scores, ["__q_id", "__d_id"], "left")
           .drop("__q_id", "__d_id"))
    return out.withColumn(score_col, F.coalesce(F.col(score_col),
                                                F.lit(0.0)))


def maxsim_rerank(
    candidates: DataFrame,
    *,
    query_col: str = "source_item",
    cand_col: str = "sim_item",
    encoder=None,
    dim: int = 8,
    score_col: str = "maxsim_score",
    score_scale: int | None = 4,
    k: int | None = None,
    keep_rank_no: bool = True,
    partition_cols: "list[str] | None" = None,
) -> DataFrame:
    """Re-rank first-stage candidates by MaxSim (rank ties broken by
    candidate value, the engine-wide determinism rule); cut to ``k``
    per query when given. Mirrors :func:`rerank_pairs`' contract with
    the token-level scorer inlined as declarative plan.

    ``partition_cols`` sets the ranking window (default
    ``[query_col]``). Pass the query ID column when query TEXTS can
    repeat — partitioning duplicate texts together would merge distinct
    queries' candidate pools into one k-cut."""
    from faisssearcher_spark.operators.rerank import rank_candidates

    scored = maxsim_score(
        candidates, query_col=query_col, cand_col=cand_col,
        encoder=encoder, dim=dim, score_col=score_col,
        score_scale=score_scale)
    return rank_candidates(scored,
                           partition_cols=partition_cols or [query_col],
                           score_col=score_col, cand_col=cand_col,
                           k=k, keep_rank_no=keep_rank_no)
