"""Vector column utilities: normalization, casting, validation.

Reference parity:
- L2 normalize (faiss_searcher.py:96-98, gated by ``norm_vec`` and forced on
  for the "cos" measurement at :53);
- float32 cast (faiss_searcher.py:92-94);
- dimension probe / shape asserts (faiss_searcher.py:38-40,56,67-68) become
  schema validation that runs one tiny Spark job, not a full scan.

All are pure Catalyst expressions (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, DoubleType

from faisssearcher_spark.functions.metrics import ColumnOrName, _col, as_double


def l2_normalize(c: ColumnOrName, zero_norm_nan: bool = True) -> Column:
    """L2-normalize an array<float|double> column.

    ``zero_norm_nan=True`` reproduces the reference's behavior on the zero
    vector — division by zero yielding NaN (faiss_searcher.py:96-98).
    With ``False`` the zero vector is passed through unchanged.
    """
    v = as_double(c)
    norm = F.sqrt(F.aggregate(F.zip_with(v, v, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x))
    # Catalyst does not CSE inside higher-order lambdas: `transform(v,
    # x -> x / norm)` would re-run the O(d) norm aggregate per element
    # (O(d^2) per call, measured ~6x on the knn path). array_repeat
    # evaluates norm ONCE and zip_with divides element-wise — same IEEE
    # semantics (x/0.0 -> Inf/NaN) as the per-element division.
    norm_arr = F.array_repeat(norm, F.size(v))
    normalized = F.zip_with(v, norm_arr, lambda x, nn: x / nn)
    if zero_norm_nan:
        return normalized
    return F.when(norm != 0.0, normalized).otherwise(v)


def to_float32(c: ColumnOrName) -> Column:
    """Cast to array<float> — the reference stores float32 end-to-end
    (faiss_searcher.py:92-94). Use for storage; metric math re-casts to
    float64 for stable accumulation."""
    return _col(c).cast("array<float>")


def round_vector(c: ColumnOrName, scale: int) -> Column:
    """Round each element — used to stabilize float comparisons in tests
    and DuckDB-oracle checks (summation-order tolerance)."""
    return F.transform(as_double(c), lambda x: F.round(x, scale))


def vector_dim(df: DataFrame, col: str) -> int:
    """Probe the (constant) dimensionality of a vector column.

    The reference probes by encoding the first item (faiss_searcher.py:56);
    here we read one row. Raises if the column is not an array type.
    """
    field = df.schema[col]
    if not isinstance(field.dataType, ArrayType):
        raise TypeError(f"column {col!r} is {field.dataType}, expected array")
    row = df.select(F.size(F.col(col)).alias("d")).first()
    if row is None:
        raise ValueError(f"cannot probe dim of {col!r}: DataFrame is empty")
    return row["d"]


def validate_vectors(df: DataFrame, col: str, dim: int | None = None) -> int:
    """Validate that every row's vector has the same (expected) dimension.

    Replaces the reference's ndarray shape asserts (faiss_searcher.py:38-40,
    67-68) with one distributed aggregate: min(size) == max(size) == dim and
    no NULL vectors. Returns the validated dimension.
    """
    stats = df.select(
        F.min(F.size(F.col(col))).alias("dmin"),
        F.max(F.size(F.col(col))).alias("dmax"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("nulls"),
    ).first()
    if stats is None or stats["dmin"] is None:
        raise ValueError(f"no vectors found in column {col!r}")
    if stats["nulls"]:
        raise ValueError(f"{stats['nulls']} NULL vectors in column {col!r}")
    if stats["dmin"] != stats["dmax"]:
        raise ValueError(
            f"ragged vector column {col!r}: dims in [{stats['dmin']}, {stats['dmax']}]")
    if dim is not None and stats["dmin"] != dim:
        raise ValueError(f"expected dim {dim}, found {stats['dmin']} in {col!r}")
    return stats["dmin"]


def is_vector_column(df: DataFrame, col: str) -> bool:
    field = df.schema[col]
    return isinstance(field.dataType, ArrayType) and isinstance(
        field.dataType.elementType, (FloatType, DoubleType))
