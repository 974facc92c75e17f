"""Exact k-NN similarity join — the engine's flagship operator.

Reference parity: ``FaissSearcher.search`` (backend/faiss_searcher.py:161-187)
answers batched top-K nearest-neighbor queries through a FAISS ANN index and
assembles a flattened result frame ``[source_item, sim_item, sim_val,
(rank_no), *payload]`` (faiss_searcher.py:127-159). The FAISS index is an
*optimization*; the observable contract is "top-K under a metric with payload
carry", which this operator satisfies exactly (recall 1.0) with a pure
Catalyst plan:

    queries ⨯ items  →  score (codegen'd metric expr)  →
    row_number() over (partition by query order by score, item_id)  →
    filter rank ≤ K

Scale design (the part FAISS cannot do):

- **Broadcast the small side.** The common shape is "m queries ≪ n items";
  broadcasting queries turns the cross join into a BroadcastNestedLoopJoin —
  the n-row corpus streams through executors, never shuffles.
- **Rank-limit pushdown.** The ``row_number() ≤ k`` filter directly above the
  window lets Spark insert a WindowGroupLimit below the exchange, so each map
  task emits at most m·k rows into the shuffle instead of m·n: the shuffle
  volume is O(queries × k × partitions), independent of corpus size.
- **No Python on the hot path.** Metric expressions are higher-order-function
  Catalyst exprs (see functions/metrics.py) inside whole-stage codegen.
- Skewed query_ids can't occur (each query id appears exactly n times by
  construction) so no salting is needed; AQE handles partition sizing.

Determinism: FAISS breaks distance ties by index order; we order by
``(score, item_id)`` so ties are deterministic and oracle-checkable
(SURVEY.md §7 hard-part c).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.functions import metrics as M
from faisssearcher_spark.functions.vector import l2_normalize

_Q_VEC = "__q_vec"
_Q_ID = "__q_id"
_SRC = "source_item"


def knn_join(
    queries: DataFrame,
    items: DataFrame,
    *,
    metric: str = "cos",
    k: int = 10,
    query_vec_col: str = "embedding",
    item_vec_col: str = "embedding",
    query_item_col: str | None = None,
    item_key_col: str = "item",
    payload_cols: Sequence[str] | None = None,
    keep_rank_no: bool = True,
    normalize: bool | None = None,
    p: float | None = None,
    score_scale: int | None = None,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """For each query row, find the top-``k`` item rows under ``metric``.

    Parameters mirror the reference's ``search(target, topK, keep_rank_no)``
    (faiss_searcher.py:161) with the positional-column convention replaced by
    named columns:

    - ``queries``: DataFrame with ``query_vec_col`` (array<float|double>) and
      ``query_item_col`` (the "source item" identity; defaults to
      ``item_key_col`` if present in queries, else a generated id).
    - ``items``: DataFrame with ``item_vec_col``, ``item_key_col`` and
      arbitrary payload columns carried into the result
      (faiss_searcher.py:146-147).
    - ``normalize``: L2-normalize both sides before scoring. Default: only
      for ``metric="cos"`` — matching the reference's forced normalization
      (faiss_searcher.py:53). With normalized inputs cosine reduces to the
      inner product (reference optimization O3); we therefore score with
      ``ip`` after normalizing.
    - ``score_scale``: optionally round ``sim_val`` to this many decimals
      *before* ranking — makes tie-breaking robust for cross-engine checks.

    Returns ``[source_item, sim_item, sim_val, (rank_no), *payload]`` with
    ``rank_no`` 0-based like the reference's ``enumerate`` rank
    (faiss_searcher.py:141-144).
    """
    if normalize is None:
        normalize = metric == "cos"
    score_metric = metric
    if metric == "cos" and normalize:
        score_metric = "ip"  # O3: cosine == dot product on normalized vectors
    metric_fn, higher_is_closer = M.resolve_metric(score_metric, p=p)
    if metric == "cos":
        higher_is_closer = True

    if query_item_col is None:
        query_item_col = item_key_col if item_key_col in queries.columns else None

    q_vec: Column = F.col(query_vec_col)
    i_vec: Column = F.col(item_vec_col)
    if normalize:
        q_vec = l2_normalize(q_vec)
        i_vec = l2_normalize(i_vec)

    if query_item_col is not None:
        q_src = F.col(query_item_col)
    else:  # positional identity, like the reference's raw-vector mode
        q_src = F.monotonically_increasing_id()
    q = queries.select(q_src.alias(_Q_ID), q_vec.alias(_Q_VEC))

    if payload_cols is None:
        payload_cols = [c for c in items.columns
                        if c not in (item_vec_col, item_key_col)]
    it_cols = [i_vec.alias("__i_vec"), F.col(item_key_col).alias("sim_item")]
    it_cols += [F.col(c) for c in payload_cols]
    it = items.select(*it_cols)

    if broadcast_queries is None:
        broadcast_queries = True  # m ≪ n is the designed-for shape
    joined = it.join(F.broadcast(q)) if broadcast_queries else q.crossJoin(it)

    score = metric_fn(F.col(_Q_VEC), F.col("__i_vec"))
    if score_scale is not None:
        score = F.round(score, score_scale)
    scored = joined.withColumn("sim_val", score)

    order = [F.col("sim_val").desc() if higher_is_closer else F.col("sim_val").asc(),
             F.col("sim_item").asc()]
    w = Window.partitionBy(_Q_ID).orderBy(*order)
    # Filter on the raw row_number so Catalyst's WindowGroupLimit rewrite
    # fires (it pattern-matches `rank <= k`): a partial top-k then runs
    # *below* the exchange and each map task ships at most m·k rows into
    # the shuffle instead of m·n. rank_no (0-based, reference parity with
    # faiss_searcher.py:141's enumerate) is derived afterwards.
    ranked = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )

    out = [F.col(_Q_ID).alias(_SRC), F.col("sim_item"), F.col("sim_val")]
    if keep_rank_no:
        out.append((F.col("__rn") - 1).alias("rank_no"))
    out += [F.col(c) for c in payload_cols]
    return ranked.select(*out)


def knn_join_multi_k(
    queries: DataFrame,
    items: DataFrame,
    ks: Iterable[int],
    **kwargs,
) -> Mapping[int, DataFrame]:
    """Multi-K search: rank once at max(K), derive each smaller K by filter.

    Reference optimization O2 (faiss_searcher.py:170-183): a List[int] topK
    searches once at ``max(topK)`` and slices per K. Here the ranked frame is
    cached and each K is a filter over it — compute-once / filter-many.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks:
        raise ValueError("ks must be non-empty")
    kwargs["keep_rank_no"] = True
    ranked = knn_join(queries, items, k=ks[-1], **kwargs).cache()
    return {k: ranked.filter(F.col("rank_no") < k) for k in ks}


def knn_join_arrays(
    queries: DataFrame,
    items: DataFrame,
    **kwargs,
) -> DataFrame:
    """Raw-vector-mode result shape: one row per query with rank-ordered
    neighbor/score arrays.

    Reference parity: without an encoder, ``search`` returns matrix tuples
    ``(items (m,k), distances (m,k), indexes (m,k))`` instead of a long
    frame (faiss_searcher.py:133-136); the un-exploded form here is
    ``(source_item, sim_items array, sim_vals array)``. Per-K slices of a
    max-K result are ``F.slice`` over these arrays (R4,
    faiss_searcher.py:181).
    """
    kwargs["keep_rank_no"] = True
    ranked = knn_join(queries, items, **kwargs)
    return (
        ranked.groupBy("source_item")
        .agg(F.sort_array(F.collect_list(F.struct("rank_no", "sim_item", "sim_val")))
             .alias("__pairs"))
        .select(
            "source_item",
            F.transform(F.col("__pairs"), lambda p: p["sim_item"]).alias("sim_items"),
            F.transform(F.col("__pairs"), lambda p: p["sim_val"]).alias("sim_vals"))
    )


def cal_sim(
    query: DataFrame,
    candidates: DataFrame,
    *,
    query_vec_col: str = "embedding",
    cand_vec_col: str = "embedding",
    cand_key_col: str = "item",
    score_col: str = "score",
) -> DataFrame:
    """Exact 1×N pairwise scoring without an index.

    Reference parity: ``cal_sim(item1, items2)`` (faiss_searcher.py:192-198)
    encodes one query and N candidates and scores with a **raw dot product —
    not normalized, even in cos mode** (a documented reference wrinkle we
    preserve; faiss_searcher.py:195), then sorts descending.

    ``query`` must be a 1-row DataFrame; it is broadcast against candidates.
    """
    q = F.broadcast(query.select(F.col(query_vec_col).alias(_Q_VEC)).limit(1))
    scored = candidates.crossJoin(q).withColumn(
        score_col, M.inner_product(F.col(_Q_VEC), F.col(cand_vec_col)))
    return (
        scored.drop(_Q_VEC, cand_vec_col)
        .orderBy(F.col(score_col).desc(), F.col(cand_key_col).asc())
    )
