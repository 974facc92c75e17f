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


# ---------------------------------------------------------------------------
# int8 storage codec (per-vector symmetric quantization)
# ---------------------------------------------------------------------------
#
# At 100 TB an embedding column is usually the widest thing in the table:
# 4 bytes/dim float32. Symmetric int8 (one scale per vector) cuts that
# 4x with ~0.4% max per-coordinate error relative to the vector's own
# peak magnitude — the storage codec serving layers use when the TRAINED
# per-dimension bounds of SQIndex (operators/ann.py) aren't available or
# the column must stay self-describing (each row decodes alone, no model
# table to join). Cosine/dot scoring can stay in integer space:
# dot(a, b) = int_dot(codes_a, codes_b) * scale_a * scale_b, exact for
# the STORED (quantized) values. All pure Catalyst — codegen'd, no
# Python.


def quantize_i8(c: ColumnOrName) -> Column:
    """``struct(codes array<tinyint>, scale float)`` — symmetric int8:
    ``scale = max|x| / 127``; ``code = round(x / scale)`` ∈ [−127, 127].
    The all-zero vector stores scale 0 with zero codes (dequantizes to
    itself). NULL in → NULL out."""
    v = as_double(c)
    peak = F.aggregate(v, F.lit(0.0),
                       lambda acc, x: F.greatest(acc, F.abs(x)))
    # evaluate the aggregate ONCE (the l2_normalize HOF-CSE rule):
    # array_repeat + zip_with, never `transform(v, x -> x / peak)`
    scale_arr = F.array_repeat(peak / F.lit(127.0), F.size(v))
    codes = F.zip_with(
        v, scale_arr,
        lambda x, s: F.when(s == 0.0, F.lit(0))
        .otherwise(F.round(x / s, 0)).cast("tinyint"))
    return F.struct(codes.alias("codes"),
                    (peak / F.lit(127.0)).cast("float").alias("scale"))


def dequantize_i8(c: ColumnOrName) -> Column:
    """array<float> from a :func:`quantize_i8` struct — each coordinate
    within scale/2 = max|x|/254 of the original."""
    q = _col(c)
    scale_arr = F.array_repeat(q["scale"].cast("double"),
                               F.size(q["codes"]))
    return F.zip_with(q["codes"], scale_arr,
                      lambda code, s: (code.cast("double") * s)
                      .cast("float"))


def i8_dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two :func:`quantize_i8` structs, EXACT for the
    stored values: the integer code dot (lossless in a long) times both
    scales. One fold over the code arrays — no dequantized float arrays
    materialize."""
    qa, qb = _col(a), _col(b)
    int_dot = F.aggregate(
        F.zip_with(qa["codes"], qb["codes"],
                   lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (int_dot.cast("double") * qa["scale"].cast("double")
            * qb["scale"].cast("double"))
