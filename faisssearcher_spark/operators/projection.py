"""Johnson–Lindenstrauss random projection — cheap dimensionality
reduction ahead of ANN / clustering / near-dup.

A seeded Gaussian matrix ``R (d × out_dim) / sqrt(out_dim)`` preserves
pairwise Euclidean geometry within ``±ε`` for ``out_dim ≈ 8·ln(n)/ε²``
(the JL lemma) — no training pass, no data dependence, deterministic
from the seed. The standard use at 100 TB: project 768-d embeddings to
64–128 dims once, run the O(n·d)-sensitive machinery (IVF training,
sign-LSH bucketing, SemDeDup cells) in the small space, and verify any
exact decisions against the original vectors.

Execution shape is the whitening-transform pattern
(operators/whitening.py): the matrix broadcasts once, each Arrow batch
pays ONE numpy float64 GEMM inside a pandas_udf — vectorized, no
per-row Python, plan size independent of dimensionality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def projection_matrix(in_dim: int, out_dim: int, *, seed: int = 42,
                      density: float | None = None) -> np.ndarray:
    """The (in_dim × out_dim) projection matrix. Gaussian by default;
    ``density`` < 1 gives the Achlioptas/sparse variant (entries
    ±1/sqrt(density·out_dim) with probability density/2 each, else 0 —
    same guarantee, ~1/density fewer multiplies)."""
    if not 1 <= out_dim:
        raise ValueError("out_dim must be >= 1")
    if out_dim >= in_dim:
        raise ValueError(
            f"out_dim ({out_dim}) must be < in_dim ({in_dim}) — "
            "projection reduces dimensionality")
    rng = np.random.default_rng(seed)
    if density is None:
        return rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
    if not 0 < density <= 1:
        raise ValueError("density must be in (0, 1]")
    signs = rng.choice([-1.0, 0.0, 1.0], size=(in_dim, out_dim),
                       p=[density / 2, 1 - density, density / 2])
    return signs / np.sqrt(density * out_dim)


def random_projection(df: DataFrame, *, vec_col: str = "embedding",
                      out_dim: int, seed: int = 42,
                      density: float | None = None,
                      out_col: str | None = None) -> DataFrame:
    """Append (or replace) a ``out_dim``-dim projected vector column.

    Deterministic from ``seed`` — two corpora projected with the same
    seed land in the SAME space, so queries and items project
    independently and still compare.
    """
    out_col = out_col or vec_col
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError("cannot infer vector dim from an empty frame")
    in_dim = int(first["d"])
    mat = projection_matrix(in_dim, out_dim, seed=seed, density=density)
    spark = df.sparkSession
    b_mat = spark.sparkContext.broadcast(mat)

    @F.pandas_udf(ArrayType(FloatType()))
    def _project(vecs: pd.Series) -> pd.Series:
        r = b_mat.value
        x = np.array(vecs.to_list(), dtype=np.float64)
        out = x @ r
        return pd.Series(list(out.astype(np.float32)))

    return df.withColumn(out_col, _project(F.col(vec_col)))
