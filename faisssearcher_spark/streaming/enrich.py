"""Stream-static dimension enrichment — the most common streaming join.

An event stream rarely carries the attributes downstream consumers need
(segment, nation, account tier); those live in a slowly-changing dimension
table. Structured Streaming supports joining a stream to a STATIC
DataFrame statelessly: each micro-batch joins against the dimension as-of
that batch, no watermark or join state is required, and append mode works
unchanged — which makes it the one streaming join that is effectively
free at scale.

Scale notes:
- the dimension is broadcast by default (dims are small relative to a
  100 TB event stream; a shuffled stream-static join would re-shuffle
  EVERY micro-batch on the join key);
- the static side is re-read per micro-batch by Spark, so a dimension
  update (parquet overwrite) is picked up on the next batch — the cheap
  SCD-1 story;
- left joins keep unmatched events (late dimension rows are a fact of
  life); downstream can route nulls to a quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, *,
                  stream_key: str, dim_key: str,
                  dim_cols: list[str] | None = None,
                  how: str = "left",
                  broadcast_dim: bool = True) -> DataFrame:
    """Join a streaming frame to a static dimension table.

    ``dim_cols`` selects which dimension attributes ride along (default:
    all except the key). The join is stateless — valid in append mode
    with no watermark — and the dimension side is broadcast unless
    ``broadcast_dim=False`` (use that only when the dimension genuinely
    exceeds broadcast size; the fallback shuffles the stream every
    micro-batch).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keep = dim_cols if dim_cols is not None else \
        [c for c in dim.columns if c != dim_key]
    missing = [c for c in keep + [dim_key] if c not in dim.columns]
    if missing:
        raise ValueError(f"dimension table lacks column(s) {missing}")
    clashes = [c for c in keep if c in stream.columns]
    if clashes:
        raise ValueError(
            f"dimension column(s) {clashes} already exist on the stream; "
            f"pass dim_cols with non-colliding names")
    d = dim.select(F.col(dim_key).alias("__dk"), *keep)
    if broadcast_dim:
        d = F.broadcast(d)
    joined = stream.join(d, stream[stream_key] == d["__dk"], how)
    return joined.drop("__dk")
