"""Temporal join operators: as-of join and bounded range join.

Beyond-reference surface (the reference has no time semantics at all,
SURVEY.md §2.10) — these are the two temporal joins a large-scale event /
feature pipeline needs that Spark lacks as built-ins:

- :func:`asof_join` — for each left row, the single most recent right row
  at-or-before its timestamp (per key, optionally within a tolerance).
  The classic "point-in-time correct feature lookup".
- :func:`range_join` — all (left, right) pairs whose timestamps fall
  within a bounded window of each other, without a cross product.

Both are pure compositions of built-in DataFrame ops (union / window /
bucketed equi-join) so Catalyst plans, AQE re-plans, and whole-stage
codegen apply end-to-end. No Python on any hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__ts"
_SIDE = "__side"
_TIE = "__tie"
_R = "__r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    right_prefix: str = "right_",
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of (point-in-time) left join: for every left row, attach the
    latest right row with ``right_ts <= left_ts`` sharing the join key.

    ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): latest right row at-or-before,
    - ``"forward"``: earliest right row at-or-after (the same union-scan
      with the timestamp order reversed),
    - ``"nearest"``: whichever of the two is closer in time (ties go
      backward); both carries run over the SAME shuffle — two window
      sorts, one exchange.

    Scale design — the union-scan trick, NOT a per-key loop or an
    inequality theta-join (which Catalyst can only plan as a per-key
    cross product):

    1. tag both inputs and union them into one stream;
    2. ONE shuffle keyed by ``on``, ordered by ``(ts, side, tie)`` —
       right rows sort before left rows at equal timestamps, so
       "at-or-before" is inclusive;
    3. a running ``last(struct(right cols), ignorenulls=True)`` window
       carries the most recent right row forward onto later left rows;
    4. keep the left rows, unpack the struct.

    Cost is one shuffle + one per-key ordered scan over |L|+|R| rows —
    the plan a hand-written merge-join would produce. No m×n blowup;
    skew follows the key distribution only (AQE's skew-join split still
    applies to the exchange).

    ``tolerance_seconds`` voids matches older than the window (matched
    columns become NULL; the left row is kept — left-join semantics).
    ``tie_break``: a right-side column ordering ties at equal
    timestamps (larger wins, e.g. an event id).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]

    payload = F.struct(F.col(right_ts).alias(right_ts),
                       *[F.col(c).alias(c) for c in right_cols])
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(tie_break) if tie_break is not None else F.lit(0)).alias(_TIE),
        payload.alias(_R),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_tag = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r_tag.schema[_TIE].dataType).alias(_TIE),
        F.lit(None).cast(r_tag.schema[_R].dataType).alias(_R),
    )

    def scan_window(ascending: bool) -> Window:
        # right (side 0) sorts before left (side 1) at equal ts in either
        # direction → the match is inclusive; _TIE only discriminates
        # right-vs-right (last carried wins → largest tie).
        ts_order = F.col(_TS).asc() if ascending else F.col(_TS).desc()
        return (Window.partitionBy(*keys)
                .orderBy(ts_order, F.col(_SIDE).asc(),
                         F.col(_TIE).asc_nulls_first())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    union = l_tag.unionByName(r_tag.select(*l_tag.columns))
    if direction == "backward":
        carried = union.withColumn(_R, F.last(_R, ignorenulls=True)
                                   .over(scan_window(True)))
    elif direction == "forward":
        carried = union.withColumn(_R, F.last(_R, ignorenulls=True)
                                   .over(scan_window(False)))
    else:  # nearest: both carries over the same exchange (two sorts)
        carried = (union
                   .withColumn("__rb", F.last(_R, ignorenulls=True)
                               .over(scan_window(True)))
                   .withColumn("__rf", F.last(_R, ignorenulls=True)
                               .over(scan_window(False))))
    carried = carried.filter(F.col(_SIDE) == 1)

    def age_of(m, forward: bool):
        signed = (m[right_ts].cast("double")
                  - F.col(left_ts).cast("double"))
        return signed if forward else -signed

    def gated(m, forward: bool):
        if tolerance_seconds is None:
            return m
        return F.when(age_of(m, forward) <= F.lit(float(tolerance_seconds)), m)

    if direction == "nearest":
        mb = gated(F.col("__rb"), False)
        mf = gated(F.col("__rf"), True)
        match = (F.when(mb.isNull(), mf)
                 .when(mf.isNull(), mb)
                 .when(age_of(mf, True) < age_of(mb, False), mf)
                 .otherwise(mb))  # tie in |age| → backward wins
    else:
        match = gated(F.col(_R), direction == "forward")
    out = [F.col(c) for c in left.columns]
    out.append(match[right_ts].alias(right_prefix + right_ts))
    out += [match[c].alias(right_prefix + c) for c in right_cols]
    return carried.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 60.0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Bounded-interval join: all (left, right) pairs with the same key
    and ``right_ts - left_ts`` in ``[lower_seconds, upper_seconds]``.

    Scale design — time-bucketing instead of the naive inequality join
    (a per-key cross product under Catalyst): each left row explodes
    into the one-or-two coarse buckets its window overlaps, both sides
    equi-join on ``(key, bucket)``, and the exact band predicate prunes
    the candidates. Join fan-out is bounded by rows-per-bucket, not
    rows-per-key, so a hot key no longer degrades to O(n²) — the
    interval-bucketing rewrite behind Databricks' range-join hint,
    which open-source Spark lacks.

    Bucket width = the window width. Output columns: join keys
    unprefixed, every other column ``l_``/``r_``-prefixed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    lo = F.col(left_ts).cast("double") + F.lit(float(lower_seconds))
    hi = F.col(left_ts).cast("double") + F.lit(float(upper_seconds))
    l_side = left.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(left_prefix + c) for c in left.columns if c not in keys],
        F.explode(F.sequence(F.floor(lo / width), F.floor(hi / width)))
        .alias("__bucket"))
    r_side = right.select(
        *[F.col(k).alias("__rk_" + k) for k in keys],
        *[F.col(c).alias(right_prefix + c) for c in right.columns if c not in keys],
        F.floor(F.col(right_ts).cast("double") / width).alias("__bucket"))

    cond = [l_side[k] == r_side["__rk_" + k] for k in keys]
    cond.append(l_side["__bucket"] == r_side["__bucket"])
    delta = (F.col(right_prefix + right_ts).cast("double")
             - F.col(left_prefix + left_ts).cast("double"))
    return (
        l_side.join(r_side, cond)
        .filter((delta >= F.lit(float(lower_seconds)))
                & (delta <= F.lit(float(upper_seconds))))
        .drop("__bucket", *["__rk_" + k for k in keys])
    )


def _epoch_seconds(ts_col: str):
    """Epoch seconds as double from any time-ish column: TIMESTAMP /
    TIMESTAMP_NTZ / DATE go through a timestamp cast first (NTZ and DATE
    cannot cast straight to double); numeric epoch columns round-trip
    through the same casts unchanged (to microsecond precision)."""
    return F.col(ts_col).cast("timestamp").cast("double")


def decayed_sum(df: DataFrame, *, key_col: str, ts_col: str,
                value_col: str, half_life_s: float,
                order_col: str | None = None,
                out_col: str = "decayed_sum") -> DataFrame:
    """Exponentially time-decayed running sum per key — the standard
    recency feature (EWMA-style): at each event,
    ``s_i = Σ_{t_j ≤ t_i} v_j · 2^−(t_i−t_j)/half_life``.

    Relational via the exp-normalization trick: with ``t0`` the key's
    first timestamp and λ = ln2 / half_life,
    ``s_i = e^{−λ(t_i−t0)} · cumsum(v_j · e^{λ(t_j−t0)})`` — one window
    partition per key, a prefix sum, no recurrence and no Python. Cost
    is one shuffle on the key (shared by the min-ts and prefix-sum
    windows — same partitioning).

    Numerical bound (documented, checked): ``e^{λ(t−t0)}`` overflows
    float64 once a key spans more than ~700/ln2 ≈ 1009 half-lives; the
    guard computes the max span in the same pass and raises rather than
    emitting inf. For decade-spanning keys with short half-lives,
    pre-segment time (e.g. per month) and carry the previous segment's
    decayed tail forward as one synthetic row.

    ``order_col`` breaks timestamp ties deterministically (defaults to
    ``value_col`` — pass an id column when values can tie too).
    """
    if half_life_s <= 0:
        raise ValueError("half_life_s must be positive")
    lam = 0.6931471805599453 / float(half_life_s)   # ln 2 / half-life
    order = order_col or value_col
    key_w = Window.partitionBy(key_col)
    run_w = (Window.partitionBy(key_col)
             .orderBy(F.col(ts_col).asc(), F.col(order).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = _epoch_seconds(ts_col)
    t0 = F.min(t).over(key_w)
    span = F.max(t).over(key_w) - t0
    rel = t - t0
    grown = F.sum(F.col(value_col) * F.exp(F.lit(lam) * rel)).over(run_w)
    decayed = F.when(
        span * lam > 700.0,
        F.raise_error(F.concat(
            F.lit("decayed_sum: key "), F.col(key_col).cast("string"),
            F.lit(" spans more than ~1009 half-lives — e^(λ·span) "
                  "overflows float64; pre-segment time or use a longer "
                  "half_life")))
    ).otherwise(grown * F.exp(-F.lit(lam) * rel))
    return df.withColumn(out_col, decayed)


def rolling_window_agg(df: DataFrame, *, key_col: str, ts_col: str,
                       value_col: str, window_s: float,
                       aggs: Sequence[str] = ("count", "sum"),
                       prefix: str = "rolling_") -> DataFrame:
    """Sliding time-window features per key: for each event, aggregates
    over the trailing ``window_s`` seconds INCLUDING the current row —
    "events/value in the last N minutes", the other standard recency
    shape. A RANGE-frame window over epoch milliseconds (range offsets
    are integral — millis keep sub-second windows exact): one shuffle
    on the key, state bounded by the frame, no self-join.
    """
    allowed = {"count", "sum", "avg", "min", "max"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"unsupported aggs {sorted(bad)}; "
                         f"pick from {sorted(allowed)}")
    w = (Window.partitionBy(key_col)
         .orderBy((_epoch_seconds(ts_col) * 1000).cast("long"))
         .rangeBetween(-int(round(window_s * 1000)), 0))
    out = df
    for a in aggs:
        expr = (F.count("*") if a == "count"
                else getattr(F, a)(F.col(value_col)))
        out = out.withColumn(prefix + a, expr.over(w))
    return out
