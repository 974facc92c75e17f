"""Deterministic sampling for training-data curation.

A pretraining pipeline samples constantly — down-weighting a crawl,
up-weighting a quality source, carving out held-out splits — and at
100 TB the sample must be (a) a single scan-and-filter with NO shuffle,
(b) reproducible run-to-run and engine-to-engine, and (c) stable under
re-partitioning and incremental appends. ``df.sample()`` fails (b) and
(c): it draws from a partition-seeded RNG, so the sampled set changes
whenever partitioning does, and no other engine can reproduce it.

These operators instead hash a stable row key: a row is kept iff
``md5_int(key, seed) mod 1e6 < fraction · 1e6``. Membership is a pure
function of (key, seed, fraction) — the filter evaluates inside the scan
stage (one pass, no shuffle, no state),
composes with incremental ingest (new rows don't resample old ones), and
has an exact SQL twin (registry oracles run the same md5 arithmetic in
DuckDB). Fraction precision is 1e-6; like any Bernoulli sampler the
realized fraction is approximate (binomial), but the SET is exact given
the inputs.

Growing a sample is monotone: ``fraction=0.3`` is a superset of
``fraction=0.2`` at the same seed — the property that lets you scale a
data mix up or down without invalidating what models already trained on
(salt the seed when you want independent draws instead).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.functions.text import md5_int

#: hash-space denominator — 1e6 gives ppm-precision fractions while the
#: 32-bit md5 prefix (md5_int's 8 hex chars) stays ~4300× finer grained.
SAMPLE_DENOM = 1_000_000


def sample_bucket(key_col: Column | str, seed: int = 42,
                  op: str = "") -> Column:
    """The row's deterministic bucket in [0, 1e6): ``md5_int(op | seed |
    key) mod 1e6``. Shared by every sampler here and by the DuckDB oracle
    SQL (registry ``_sample_bucket_sql``).

    ``op`` decorrelates operator FAMILIES from each other: the keep-set
    samplers share 'sample' (so a stratified sample stays the plain
    sample restricted per-stratum — a documented, tested property),
    while 'pack' and 'split' draw independently. Without the prefixes,
    ``hash_sample(0.1)`` followed by ``hash_split(test_fraction=0.1)``
    at the same seed tagged 100% of the surviving rows 'test' (both
    kept exactly the rows whose shared bucket < 1e5) — the r3 ADVICE
    correlation bug. An empty ``op`` reproduces the raw ``seed|key``
    bucket."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = f"{op}|{seed}|" if op else f"{seed}|"
    salted = F.concat(F.lit(prefix), key.cast("string"))
    return F.pmod(md5_int(salted), F.lit(SAMPLE_DENOM))


def hash_sample(df: DataFrame, fraction: float, *,
                key_col: str, seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose bucket falls below
    ``fraction``. One scan, no shuffle, reproducible anywhere md5 exists."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * SAMPLE_DENOM))
    return df.filter(sample_bucket(key_col, seed, op="sample") < threshold)


def stratified_hash_sample(df: DataFrame, fractions: Mapping[str, float], *,
                           stratum_col: str, key_col: str,
                           default_fraction: float = 0.0,
                           seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling — the "data mixture" operator:
    ``fractions`` maps stratum values (e.g. source names) to keep rates;
    strata not listed keep ``default_fraction``. Still one scan-and-filter:
    the per-stratum threshold is a CASE expression on ``stratum_col``, so
    there is no join and nothing shuffles."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    threshold: Column = F.lit(int(round(default_fraction * SAMPLE_DENOM)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(F.col(stratum_col) == value,
                           F.lit(int(round(frac * SAMPLE_DENOM)))) \
            .otherwise(threshold)
    return df.filter(sample_bucket(key_col, seed, op="sample") < threshold)


def pack_token_budget(df: DataFrame, *, budget: int, size_col: str,
                      key_col: str, n_shards: int = 32,
                      seed: int = 42) -> DataFrame:
    """Assign every row to a fixed-token-budget bin — the "pack documents
    into ~budget-token training chunks" operator.

    Rows hash into ``n_shards`` independent shards (same md5 bucketing as
    the samplers, so assignment is deterministic and append-stable for
    existing rows' shards); within a shard, rows are ordered by key and
    greedily cut into bins whenever the running token total passes the
    budget: ``bin = floor((cumsum(size) − size) / budget)``. Each window
    partition is one shard, so the sort is per-shard — there is NO global
    ordering and no single-partition window, which is what makes this
    shape survive 100 TB (each of the ``n_shards`` windows is an
    independent task; raise ``n_shards`` with the corpus).

    A bin's total overshoots the budget by at most one document — the
    standard streaming-packing guarantee; oversized single documents get
    bins of their own. Returns the input plus ``(shard, bin, cum_tokens)``
    where (shard, bin) identifies the chunk and ``cum_tokens`` is the
    running total through this row.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(sample_bucket(key_col, seed, op="pack"), F.lit(n_shards))
    out = df.withColumn("shard", shard.cast("int"))
    w = (Window.partitionBy("shard")
         .orderBy(F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = out.withColumn("cum_tokens",
                         F.sum(F.col(size_col)).over(w).cast("long"))
    return out.withColumn(
        "bin",
        F.floor((F.col("cum_tokens") - F.col(size_col)) / budget).cast("int"))


def hash_split(df: DataFrame, *, key_col: str, test_fraction: float = 0.01,
               seed: int = 42, split_col: str = "split") -> DataFrame:
    """Tag every row 'test' or 'train' by hash bucket — the held-out-split
    operator. Deterministic per key: a document keeps its split across
    reruns, repartitions, and incremental appends (the property that
    prevents train/test leakage when the corpus grows); derived datasets
    re-tag identically because the tag is a pure function of the key.
    The split hash is salted independently of the samplers' ('split' vs
    'sample' op prefix), so tagging a hash-sampled corpus at the same
    seed yields an unbiased split — not a 100%-test degenerate one."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    threshold = int(round(test_fraction * SAMPLE_DENOM))
    return df.withColumn(
        split_col,
        F.when(sample_bucket(key_col, seed, op="split") < threshold, F.lit("test"))
        .otherwise(F.lit("train")))


def leakage_safe_split(df: DataFrame, pairs: DataFrame | None = None, *,
                       clusters: DataFrame | None = None, key_col: str,
                       id_a: str = "id_a", id_b: str = "id_b",
                       test_fraction: float = 0.01, seed: int = 42,
                       split_col: str = "split",
                       keep_cluster_col: str | None = None) -> DataFrame:
    """Group-aware train/test split: near-duplicate CLUSTERS never
    straddle the split boundary.

    :func:`hash_split` keys the tag on the document itself, so two
    near-duplicates of one page can land on opposite sides of the
    boundary — the test set then "leaks" into training through documents
    the dedup pass would have called the same (the reason GPT-3-era
    decontamination exists at all; splitting group-wise removes the
    failure class instead of patching it post hoc). Here the tag keys on
    the near-dup CLUSTER representative: pass the pair list from any of
    the dedup generators (``minhash_lsh_join``, ``simhash_pairs``,
    ``embedding_cosine_pairs`` …) — or a precomputed ``(id, cluster_id)``
    frame from :func:`~faisssearcher_spark.operators.dedup.dedup_clusters`
    to avoid re-running the pair join — and every member of a connected
    component draws ONE bucket from its cluster id. Documents in no pair
    fall back to their own key, so on pair-free input this is exactly
    :func:`hash_split` (same 'split' op salt, same seed ⇒ identical
    tags — singletons keep their split if a later run adds pairs
    elsewhere).

    Scale shape: one components pass over the pair list (already
    bounded — pairs, not the corpus) + one equi-join of the corpus
    against the ≤|pairs|-sized cluster map; the tag itself is a scan
    expression. Set ``keep_cluster_col`` to also emit the cluster id
    (NULL for singletons) instead of re-joining downstream."""
    if (pairs is None) == (clusters is None):
        raise ValueError(
            "pass exactly one of `pairs` (raw near-dup pairs) or "
            "`clusters` (precomputed (id, cluster_id) assignments)")
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    user_clusters = clusters is not None
    if clusters is None:
        from faisssearcher_spark.operators.dedup import dedup_clusters
        clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b)
    cl = clusters.select(F.col("id").alias("__ls_id"),
                         F.col("cluster_id").alias("__ls_cluster"))
    if user_clusters:
        # one cluster per id, deterministically (min) — a user-supplied
        # clusters frame with duplicate ids would otherwise silently
        # DUPLICATE corpus rows through the left join (and
        # dropDuplicates would pick an arbitrary survivor, making the
        # split tag run-dependent). The internal dedup_clusters path is
        # unique-per-id by construction and skips this shuffle.
        cl = cl.groupBy("__ls_id") \
            .agg(F.min("__ls_cluster").alias("__ls_cluster"))
    out = df.join(cl, df[key_col] == cl["__ls_id"], "left").drop("__ls_id")
    group = F.coalesce(F.col("__ls_cluster").cast("string"),
                       F.col(key_col).cast("string"))
    threshold = int(round(test_fraction * SAMPLE_DENOM))
    out = out.withColumn(
        split_col,
        F.when(sample_bucket(group, seed, op="split") < threshold,
               F.lit("test")).otherwise(F.lit("train")))
    if keep_cluster_col is not None:
        return out.withColumnRenamed("__ls_cluster", keep_cluster_col)
    return out.drop("__ls_cluster")


def temperature_mixture_rates(df: DataFrame, *, stratum_col: str,
                              alpha: float = 0.5,
                              total_rows: int | None = None
                              ) -> "dict[str, float]":
    """Per-stratum repeat rates from TEMPERATURE sampling (the
    multilingual/T5 α-sampling rule, Arivazhagan et al. 2019,
    arXiv:1907.05019): draw probability q_i ∝ p_i^α where p_i is the
    stratum's corpus share — α = 1 keeps the natural distribution,
    α → 0 approaches uniform, flattening head strata and up-weighting
    the tail. Returns ``{stratum: rate}`` for :func:`upsample_mixture`
    sized so the expected output is ``total_rows`` (default: the input
    corpus size — re-balance without growing).

    The UP-sampling sibling of :func:`temperature_fractions`: that one
    clips rates at 1 (a pure keep-rate for
    :func:`stratified_hash_sample` — strata too small to fill their
    temperature share keep everything), this one returns the UNCLIPPED
    repeat rates (> 1 means epochs over the stratum), which is what a
    fixed-token-budget training mixture actually feeds
    :func:`upsample_mixture`.

    Derivation is one count-per-stratum aggregate collected to the
    driver (strata are mixture components — dozens, not millions) and
    pure scalar math in SORTED stratum order: rate_i =
    total · n_i^α / Σ n_j^α / n_i. α = 0.5 routes through
    ``math.sqrt`` — correctly rounded per IEEE 754, so an oracle
    recomputing the same fold in any engine gets bit-identical rates
    (general ``pow`` is only ≤1-ulp across libms; gates pin α = 0.5)."""
    import math

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha}); alpha=1 is "
                         "the natural distribution")
    counts = {r["s"]: r["c"] for r in
              df.select(F.col(stratum_col).alias("s"))
              .groupBy("s").agg(F.count("*").alias("c")).collect()}
    if not counts:
        return {}
    # NULL strata are real groups (its sibling temperature_fractions
    # returns them too); sort them LAST — matching the oracle's
    # ORDER BY default — instead of letting None < str raise
    strata = sorted(counts, key=lambda s: (s is None, s if s is not None
                                           else ""))
    total = 0
    for s in strata:
        total += counts[s]
    budget = float(total if total_rows is None else total_rows)
    share = {s: (math.sqrt(counts[s]) if alpha == 0.5
                 else counts[s] ** alpha) for s in strata}
    denom = 0.0
    for s in strata:
        denom += share[s]
    return {s: budget * share[s] / denom / counts[s] for s in strata}


def upsample_mixture(df: DataFrame, rates: Mapping[str, float], *,
                     stratum_col: str, key_col: str,
                     default_rate: float = 1.0, seed: int = 42,
                     copy_col: str = "copy_no") -> DataFrame:
    """Fractional per-stratum repeats — the data-mixture UP-weighting
    operator (the "wiki × 3.5 epochs" knob of an LLM data recipe, where
    :func:`stratified_hash_sample` is the down-weighting one).

    A rate ``r`` emits ``floor(r)`` copies of every row plus one more
    for the deterministic ``frac(r)``-fraction of rows drawn by an
    independently salted hash ('upsample' op salt, so composing with
    'sample'/'split' samplers stays decorrelated); ``r < 1`` degrades
    to a plain keep-``r`` downsample, ``r = 0`` drops the stratum.
    Copies are numbered ``copy_col`` = 0..n-1 so downstream stages can
    key on (row, copy) — :func:`epoch_order_key` does, to scatter the
    copies apart in the epoch order instead of training on adjacent
    duplicates.

    Scale shape: the copy count is a CASE expression on the stratum +
    one hash compare, and the fan-out is a generator — one scan, no
    join, no shuffle; output size is exactly the mixture's token
    budget, which is the point."""
    for k, v in rates.items():
        if v < 0:
            raise ValueError(f"rate for {k!r} must be >= 0, got {v}")
    if default_rate < 0:
        raise ValueError(f"default_rate must be >= 0, got {default_rate}")

    def _full(r: float) -> int:
        return int(r)

    def _frac_thresh(r: float) -> int:
        return int(round((r - int(r)) * SAMPLE_DENOM))

    full: Column = F.lit(_full(default_rate))
    thresh: Column = F.lit(_frac_thresh(default_rate))
    for value, rate in sorted(rates.items()):
        full = F.when(F.col(stratum_col) == value,
                      F.lit(_full(rate))).otherwise(full)
        thresh = F.when(F.col(stratum_col) == value,
                        F.lit(_frac_thresh(rate))).otherwise(thresh)
    extra = (sample_bucket(key_col, seed, op="upsample") < thresh) \
        .cast("int")
    n = (full + extra).alias("__n_copies")
    # explode(NULL) drops the row, which is exactly the n = 0 case —
    # and sequence(0, -1) would be the descending-sequence trap
    copies = F.explode(F.when(n > 0, F.sequence(F.lit(0), n - 1)))
    return df.withColumn(copy_col, copies)


def epoch_order_key(key_col: Column | str, *, epoch: int = 0,
                    seed: int = 42,
                    copy_col: Column | str | None = None) -> Column:
    """Deterministic shuffle position for one training epoch: the
    32-bit md5 integer of ``epoch|seed|key[|copy]``. Sorting by it is a
    reproducible global permutation that changes completely between
    epochs (the epoch number salts the hash), and including ``copy_col``
    scatters :func:`upsample_mixture` repeats of the same row far apart
    instead of leaving them adjacent. Ties (≈ birthday rate at 2^32)
    are broken by the caller's secondary sort on the key itself."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    salted = F.concat(F.lit(f"epoch{epoch}|{seed}|"), key.cast("string"))
    if copy_col is not None:
        copy = F.col(copy_col) if isinstance(copy_col, str) else copy_col
        salted = F.concat(salted, F.lit("|"), copy.cast("string"))
    return md5_int(salted)


def shuffle_for_epoch(df: DataFrame, *, key_col: str, epoch: int = 0,
                      seed: int = 42, copy_col: str | None = None,
                      n_partitions: int | None = None,
                      order_col: str = "epoch_key") -> DataFrame:
    """Materialize the epoch permutation at scale: range-partition +
    locally sort by :func:`epoch_order_key`, which totally orders the
    output across files WITHOUT the global row_number window a naive
    "shuffle the dataset" writes (a single-reducer sort at 100 TB).
    Reading the partitions in range order replays the epoch; the key
    column stays attached as ``order_col`` for audits."""
    out = df.withColumn(order_col, epoch_order_key(
        key_col, epoch=epoch, seed=seed, copy_col=copy_col))
    parts = [F.col(order_col), F.col(key_col)]
    shuffled = (out.repartitionByRange(n_partitions, *parts)
                if n_partitions else out.repartitionByRange(*parts))
    return shuffled.sortWithinPartitions(*parts)


def cap_per_group(df: DataFrame, *, group_col: str, cap: int,
                  key_col: str, seed: int = 42) -> DataFrame:
    """Per-group quota: keep at most ``cap`` rows per ``group_col`` value,
    chosen deterministically by hash order — the "max N documents per
    domain/source" operator a crawl-derived corpus needs so one giant
    host can't dominate the mixture.

    Which rows survive is a pure function of (key, seed, cap): rows rank
    within their group by their md5 bucket (op-salt 'cap', independent of
    the samplers' draws; ties broken by key), and rank ≤ cap survives.
    Raising ``cap`` only ever ADDS rows — monotone like
    :func:`hash_sample` — and a group's survivor set is stable under
    repartitioning. Appending rows CAN displace old survivors (a new row
    may hash below an old one): an exact quota is necessarily a property
    of the whole group, unlike Bernoulli membership.

    Scale shape: one shuffle on ``group_col`` + a rank filter that
    Catalyst rewrites to WindowGroupLimit (pinned in tests/test_plans.py)
    — every map task forwards at most ``cap`` rows per group it has seen,
    so a billion-row hot domain ships ~cap·n_partitions rows, not a
    billion, and the reducer never materializes the full group.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(key_col, seed, op="cap").asc(), F.col(key_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= cap)
              .drop("__rn"))


def gumbel_topk_sample(df: DataFrame, *, k: int, weight_col: str,
                       key_col: str, seed: int = 42) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick (Kool et al. 2019): drawing the k rows with the
    largest ``weight + Gumbel(0,1)`` keys is distributed exactly as k
    sequential no-replacement draws ∝ exp(weight). With ``weight_col`` =
    DSIR's ``logw`` this IS the DSIR resampling step (arXiv:2302.03169
    §2: sample ∝ importance weight).

    The Gumbel noise is hash-derived, not RNG-drawn: u = (bucket+0.5)/1e6
    from the engine-standard md5 bucket (op-prefix 'gumbel' — independent
    of the 'sample'/'pack'/'split' families), g = −ln(−ln(u)). The draw
    is therefore a pure function of (key, seed, weights) — reproducible
    across runs, partitionings, and engines, like every sampler here.

    Scale shape: scan-side key computation + ONE global top-k
    (``orderBy(...).limit(k)`` → TakeOrderedAndProject: each task keeps
    its local k, the driver merges n_partitions·k rows — no full sort,
    no shuffle of the corpus). Deterministic total order: ties on the
    sample key (md5-collision improbable) break by the row key.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (sample_bucket(key_col, seed, op="gumbel") + F.lit(0.5)) \
        / F.lit(float(SAMPLE_DENOM))
    gumbel = -F.log(-F.log(u))
    gk = "__gkey"
    while gk in df.columns:    # never clobber a user column
        gk += "_"
    return (df.withColumn(gk, F.col(weight_col) + gumbel)
            .orderBy(F.col(gk).desc(), F.col(key_col).asc())
            .limit(k)
            .drop(gk))


def temperature_fractions(df: DataFrame, *, stratum_col: str,
                          target_rows: int,
                          alpha: float = 0.3) -> dict[str, float]:
    """Per-stratum keep rates for temperature-based mixture sampling
    (the multilingual/multi-source re-weighting of Raffel et al. 2020
    §3.4.3 / mT5: sample stratum s with probability ∝ count(s)^alpha).

    alpha=1 reproduces natural proportions; alpha→0 equalizes strata;
    in between up-weights small sources without drowning large ones.
    Rates are ``min(1, target_rows·p_s / n_s)`` — a stratum too small to
    fill its temperature share keeps everything (no upsampling; for
    UNCLIPPED repeat rates feeding :func:`upsample_mixture` — epochs
    over small strata — use :func:`temperature_mixture_rates`, the
    oracle-gated sibling).

    One tiny agg (distinct strata) collects to the driver; feed the
    returned dict straight into :func:`stratified_hash_sample`, so the
    realized sample keeps every determinism/monotonicity property of the
    md5 bucket."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    counts = {r["s"]: r["n"] for r in
              df.groupBy(F.col(stratum_col).alias("s"))
                .agg(F.count("*").alias("n")).collect()}
    if not counts:
        return {}
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    total_w = sum(weights.values())
    return {s: min(1.0, target_rows * (w / total_w) / counts[s])
            for s, w in weights.items()}


def temperature_mixture(df: DataFrame, *, stratum_col: str, key_col: str,
                        target_rows: int, alpha: float = 0.3,
                        seed: int = 42) -> DataFrame:
    """Temperature-sampled data mixture: compute per-stratum rates
    (:func:`temperature_fractions`) and realize them with the
    deterministic md5 sampler — one scan-and-filter, reproducible,
    append-stable. Realized sizes are binomial around the targets, like
    every Bernoulli sampler here."""
    fracs = temperature_fractions(df, stratum_col=stratum_col,
                                  target_rows=target_rows, alpha=alpha)
    return stratified_hash_sample(df, fracs, stratum_col=stratum_col,
                                  key_col=key_col, seed=seed)
