"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): the reference only ever
searches; a 100 TB pretraining corpus also needs dedup. Five strategies,
each shaped for Spark's execution model — **no strategy ever materializes
the O(n²) pair space**; candidates always come from an equi-join on a
derived key (shingle, band, bucket), which Catalyst executes as a shuffled
hash join on that key:

- :func:`dedup_exact` — hash-groupBy on content (or any key columns);
- :func:`ngram_jaccard_join` — shingle explode → self-equi-join on shingle
  → per-pair intersection counts → Jaccard filter (inverted-index join);
- :func:`minhash_signatures` / :func:`minhash_lsh_join` — MinHash + banded
  LSH: only documents sharing a band hash ever meet in the join;
- :func:`simhash` / :func:`simhash_pairs` — 32-bit SimHash fingerprints,
  candidate pairs from 8-bit band equality (pigeonhole: hamming ≤ 3 pairs
  must share one of 4 bands), verified by XOR popcount;
- :func:`embedding_cosine_pairs` — semantic near-dup via cosine threshold
  (pluggable candidate prefilter; brute force only within explicit bounds).

Hashes are md5-derived (bit-identical in Spark SQL, DuckDB, and Python),
so every operator here is checkable against the DuckDB oracle — see
``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.functions import metrics as M
from faisssearcher_spark.functions import text as T


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, key_cols: Sequence[str], *,
                tie_col: str | None = None) -> DataFrame:
    """Keep exactly one row per distinct ``key_cols`` value.

    With ``tie_col`` the survivor is deterministic (min tie_col — typically
    the id column); without it this is ``dropDuplicates`` (arbitrary but
    single survivor). Executes as one hash aggregation / window on the key —
    map-side partial aggregation keeps the shuffle proportional to the
    number of *distinct* keys.
    """
    if tie_col is None:
        return df.dropDuplicates(list(key_cols))
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(tie_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index join — the exact near-dup baseline)
# ---------------------------------------------------------------------------

def _pair_common_counts(exploded: DataFrame) -> DataFrame:
    """Inverted-index pair kernel shared by the Jaccard and containment
    joins: self-equi-join the ``(id, n_sh, s)`` posting list on the
    shingle (shuffle_hash — the exploded side's static estimate would
    otherwise broadcast it), count common shingles per ``id_a < id_b``
    pair, carry both set sizes through the grouping keys."""
    exploded = exploded.hint("shuffle_hash")
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 F.col("a.n_sh").alias("n_a"), F.col("b.n_sh").alias("n_b"))
        .agg(F.count("*").alias("n_common"))
    )


def ngram_containment_join(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 3,
                           threshold: float = 0.8) -> DataFrame:
    """ASYMMETRIC near-dup pairs: one document's shingle set largely
    contained in the other's — ``max(|A∩B|/|A|, |A∩B|/|B|) ≥ threshold``.

    Jaccard misses subset duplication by construction (a paragraph
    quoted inside a 100× longer document has |A∩B|/|A∪B| ≈ 1%, but
    containment 100%); this is the GPT-3/decontamination notion of
    overlap applied within a corpus — quotes, mirrored excerpts,
    documents embedded in aggregator pages.

    Same inverted-index plan as :func:`ngram_jaccard_join` (docs sharing
    no shingle never meet; posting list shuffles by shingle, never
    broadcasts). Returns ``(id_a, id_b, containment_a_in_b,
    containment_b_in_a, jaccard)`` with ``id_a < id_b``; the filter keeps
    pairs where EITHER direction clears the threshold.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(T.word_ngrams(text_col, n)).alias("sh"))
    exploded = (shingled.select(
        "id", F.coalesce(F.size("sh"), F.lit(-1)).alias("n_sh"),
        F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull()))
    common = _pair_common_counts(exploded)
    c_ab = F.col("n_common") / F.col("n_a")
    c_ba = F.col("n_common") / F.col("n_b")
    return (common
            .withColumn("containment_a_in_b", c_ab)
            .withColumn("containment_b_in_a", c_ba)
            .withColumn("jaccard",
                        F.col("n_common")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .filter(F.greatest("containment_a_in_b", "containment_b_in_a")
                    >= threshold)
            .select("id_a", "id_b", "containment_a_in_b",
                    "containment_b_in_a", "jaccard"))


def ngram_jaccard_join(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       threshold: float = 0.5,
                       prefix_filter: bool = False,
                       broadcast_doc_freq: bool = True) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard ≥ threshold.

    Plan shape (default): distinct shingles per doc → explode →
    self-equi-join on the shingle string (shuffled hash join keyed by
    shingle; docs sharing no shingle never meet) → groupBy pair counting
    common shingles → Jaccard via |A∩B| / (|A|+|B|−|A∩B|). Returns
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``. The set sizes ride
    through the explode and the pair aggregation (grouping keys), so no
    post-aggregation lookup joins are needed.

    ``prefix_filter=True`` enables AllPairs/PPJoin-style candidate
    pruning (Bayardo et al. WWW'07; Xiao et al. WWW'08): order every
    document's shingles by ascending global document frequency; for
    Jaccard ≥ t, two sets must share a shingle within their first
    ``|A| − ⌈t·|A|⌉ + 1`` shingles under ANY common total order — so only
    prefix shingles join, and rare shingles (the front of the DF order)
    do the joining while boilerplate shingles (the skew risk) drop out of
    candidate generation entirely. Candidates are then verified with one
    exact ``array_intersect``. Same results, provably; the join volume
    shrinks by roughly the threshold factor and hot-shingle skew
    disappears — the setting for corpus-scale runs.

    Cost note (measured, BENCH r2→r3): the prefix path pays two extra
    full shuffles of the posting list (the global DF aggregation and the
    per-doc prefix window), so on corpora WITHOUT hot-shingle skew the
    plain inverted-index join is ~1.5-2× faster; prefix filtering wins
    when a few boilerplate shingles dominate the join volume (the actual
    failure mode at corpus scale). Both paths are result-identical
    (tests/test_dedup.py::TestPrefixFilter); pick by your data.

    ``broadcast_doc_freq``: the DF table is |distinct shingles| rows —
    broadcast it (default) so the posting list never shuffles for the DF
    join. Disable when the shingle vocabulary exceeds executor memory
    (billions of distinct shingles); the join then falls back to a
    shuffled hash join.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(T.word_ngrams(text_col, n)).alias("sh"))

    # explode_outer + isNotNull(s), NOT plain explode: Catalyst's
    # InferFiltersFromGenerate adds `size(e)>0 AND isnotnull(e)` below a
    # non-outer Generate, and predicate pushdown inlines the WHOLE shingle
    # expression into that filter — tokenizing every row ~3× (measured
    # ~20% of query time at sf0.1). The outer variant infers nothing; the
    # null rows (empty docs) die on a cheap attribute filter instead.
    # n_sh wrapped in coalesce(·, -1): the join's downstream constraints
    # otherwise infer `isnotnull(n_sh)` and inline size(<shingle expr>)
    # into yet another Filter; a provably-non-nullable n_sh folds that
    # constraint to true. (-1 only ever applies to rows the s-null filter
    # already dropped.)
    def _exploded():
        return shingled.select(
            "id", F.coalesce(F.size("sh"), F.lit(-1)).alias("n_sh"),
            F.explode_outer("sh").alias("s")).filter(F.col("s").isNotNull())

    if not prefix_filter:
        # shuffle_hash: the exploded posting list's STATIC size estimate
        # (from the tiny pre-explode scan) tricks the planner into
        # broadcasting it — a driver collect + hash build of the whole
        # posting list (measured 40% of query time). A shuffled hash join
        # keyed by shingle is the scale-correct physical plan at any size.
        common = _pair_common_counts(_exploded())
        return (
            common
            .withColumn("jaccard",
                        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    exploded = _exploded()
    # global document frequency per shingle — the canonical order. The DF
    # table is |distinct shingles| rows of (string, count) — small relative
    # to the exploded posting list at any scale — so BROADCAST it: the
    # exploded side then never shuffles for this join (r2 verdict: the
    # shuffle join here was half the PPJoin overhead).
    doc_freq = exploded.groupBy("s").agg(F.count("*").alias("df"))
    if broadcast_doc_freq:
        doc_freq = F.broadcast(doc_freq)
    # rank each doc's shingles rarest-first ((df, s) breaks ties totally)
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("s").asc())
    ranked = (exploded.join(doc_freq, "s")
              .withColumn("pos", F.row_number().over(w)))
    # prefix length |A| - ceil(t*|A|) + 1; the epsilon keeps ceil from
    # overshooting when t·n is mathematically an integer but the float
    # product rounds up (which would shorten the prefix and silently drop
    # valid pairs).
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh")
        - F.ceil(threshold * F.col("n_sh") - 1e-9) + 1)

    prefix = prefix.hint("shuffle_hash")  # same static-estimate trap as above
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = shingled.select("id", "sh")
    verified = (
        cand
        .join(sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sa")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sb")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jaccard", F.col("n_common") /
                    (F.size("sa") + F.size("sb") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------

#: modulus for the affine MinHash permutations — Mersenne prime 2^61−1.
#: With a < 2^30 and h < 2^32 the product a·h + b stays under 2^63, so the
#: arithmetic is overflow-free in signed int64 in Spark, DuckDB, and Python.
MINHASH_MERSENNE = (1 << 61) - 1


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine-permutation parameters. RETIRED from
    the signature path in round 6 (see :func:`minhash_slot_salt`): with
    base hashes h < 2^32 and a < 2^30 the product a·h never exceeds
    2^62, so most 'permutations' never wrap the 2^61−1 modulus and are
    ORDER-PRESERVING on h — all such slots pick the same argmin
    shingle, collapsing the supposedly-independent slots to ~2
    effective ones (measured: 5/16 slot agreement on a pair with true
    Jaccard 0.84 — a >5σ deviation from Binomial(16, J); candidate
    RECALL suffered, never correctness, because LSH pairs are
    exact-verified). Kept only so historical experiments reproduce."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 30, size=num_hashes)
    b = rng.integers(0, 1 << 30, size=num_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


#: independent 32-bit slots extracted per md5: one 128-bit digest feeds
#: four slots (8 hex chars each), so 16 slots cost 4 md5 calls per
#: shingle, not 16 — different windows of an ideal hash are mutually
#: independent, so min-wise independence is preserved.
MINHASH_SLOTS_PER_MD5 = 4


def minhash_slot_salt(slot: int, seed: int = 42) -> str:
    """The salt prefix of slot ``slot``'s digest GROUP: slot value =
    min over shingles of the 32-bit window
    ``substring(md5(salt || shingle), 1 + 8·(slot % 4), 8)`` (see
    :func:`minhash_slot_start`). Independent md5 min-hashes are the
    min-wise-independent construction (md5 as the ideal hash) that
    replaced the order-biased affine family (:func:`minhash_params`).
    Shared verbatim with the DuckDB oracle (registry
    ``_oracle_minhash_sig``) and the Python reference in tests."""
    return f"mh|{seed}|{slot // MINHASH_SLOTS_PER_MD5}|"


def minhash_slot_start(slot: int) -> int:
    """1-based hex offset of slot ``slot``'s 8-char window within its
    digest group's md5."""
    return 1 + 8 * (slot % MINHASH_SLOTS_PER_MD5)


def minhash_sig_sql_parts(num_hashes: int, seed: int = 42) -> tuple:
    """The three SQL-text expression lists every banded-MinHash builder
    shares (r13: one SQL parse per select instead of ~60 py4j
    round-trips per slot — functions/sqltext.py has the measurement;
    parity with the Column form pinned in tests/test_sqltext_parity.py):

    - ``hash_exprs``: per-group salted md5 digests over the exploded
      shingle column ``__t`` (aliased ``__hg<g>``),
    - ``agg_exprs``: per-slot lexicographic mins over the fixed-length
      hex windows (aliased ``__x<i>``),
    - ``conv_exprs``: the one-per-slot radix conversions to signed
      longs (aliased ``__s<i>``).

    Same salts, same windows, same arithmetic as
    :func:`minhash_slot_salt` / the DuckDB oracle replica."""
    from faisssearcher_spark.functions.sqltext import sql_str

    n_groups = -(-num_hashes // MINHASH_SLOTS_PER_MD5)
    hash_exprs = [
        f"md5(concat({sql_str(minhash_slot_salt(gi * MINHASH_SLOTS_PER_MD5, seed))}, __t)) AS __hg{gi}"
        for gi in range(n_groups)]
    agg_exprs = [
        f"min(substring(__hg{i // MINHASH_SLOTS_PER_MD5}, "
        f"{minhash_slot_start(i)}, 8)) AS __x{i}"
        for i in range(num_hashes)]
    conv_exprs = [f"CAST(conv(__x{i}, 16, 10) AS BIGINT) AS __s{i}"
                  for i in range(num_hashes)]
    return hash_exprs, agg_exprs, conv_exprs


def minhash_band_sql_parts(num_hashes: int, bands: int) -> tuple:
    """SQL text of the band-array pieces over the ``__s<i>`` slot
    columns: per-band ``'|'``-joined component strings (list, one per
    band) and the full signature array. Shared by the two banded
    builders so band composition can never drift between them."""
    r = num_hashes // bands
    band_vals = [
        "concat_ws('|', " + ", ".join(
            f"CAST(__s{bi * r + j} AS STRING)" for j in range(r)) + ")"
        for bi in range(bands)]
    sig_arr = "array(" + ", ".join(
        f"__s{i}" for i in range(num_hashes)) + ")"
    return band_vals, sig_arr


def minhash_signatures(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       shingle_n: int | None = None,
                       seed: int = 42) -> DataFrame:
    """Per-document MinHash signature over the distinct token (or
    word-``shingle_n``-gram) set.

    Each slot is an INDEPENDENT md5 min-hash: slot i = min over
    shingles of ``md5_int('mh|seed|i|' || shingle)`` (see
    :func:`minhash_slot_salt` for why the earlier hash-once + affine
    permutation construction was order-biased and had to go).
    """
    units = (T.word_ngrams(text_col, shingle_n) if shingle_n
             else T.tokens(text_col))
    base = df.select(F.col(id_col).alias("id"),
                     F.array_distinct(units).alias("token_set"))
    n_groups = -(-num_hashes // MINHASH_SLOTS_PER_MD5)
    # digest arrays materialize as columns BELOW the per-slot mins so
    # each md5 computes once per shingle per group, not once per slot
    # (Catalyst does not CSE across aggregate/array expressions)
    def ghash(gi: int):
        # closure factory (the F.transform default-arg trap, see below)
        salt = minhash_slot_salt(gi * MINHASH_SLOTS_PER_MD5, seed)
        return F.transform(F.col("token_set"),
                           lambda t: F.md5(F.concat(F.lit(salt), t)))

    hashed = base.select("id", "token_set", *[
        ghash(gi).alias(f"__hg{gi}") for gi in range(n_groups)])

    def slot(i: int):
        # closure factory — NOT lambda default-args, which F.transform
        # would miscount as extra lambda parameters. The min runs on the
        # fixed-length lowercase-hex SUBSTRINGS (lexicographic == numeric
        # order), so the radix conversion happens once per document per
        # slot, not once per shingle — measured ~30% off the whole
        # signature pass at sf0.1.
        start = minhash_slot_start(i)
        return F.conv(F.array_min(F.transform(
            F.col(f"__hg{i // MINHASH_SLOTS_PER_MD5}"),
            lambda h: F.substring(h, start, 8))), 16, 10).cast("long")

    sig = F.array(*[slot(i) for i in range(num_hashes)])
    return hashed.select("id", sig.alias("signature"), "token_set")


def minhash_lsh_join(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text", num_hashes: int = 16,
                     bands: int = 4, shingle_n: int | None = None,
                     seed: int = 42,
                     verify_threshold: float | None = 0.5,
                     tokens_col: str | None = None) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    ``num_hashes`` must divide into ``bands`` equal rows-per-band. Candidate
    pairs are documents agreeing on *any* full band (equi-join keyed by
    ``(band_index, band_value)`` — the classic LSH bucket join; the n² pair
    space is never formed). With ``verify_threshold`` each candidate is
    verified with the exact Jaccard of its token sets.

    Returns ``(id_a, id_b, jaccard)`` (or candidates with NULL jaccard when
    verification is off), ``id_a < id_b``.

    Implementation: the signature is computed as explode →
    ``num_hashes`` salted md5s + tiny ``min()`` aggregates per document
    — NOT as one wide array expression per slot. Both shapes give
    identical signatures, but the wide form compiles a huge whole-stage
    codegen unit (multi-second Janino compile on first run) while the
    aggregate form is ``num_hashes`` scalar expressions the JIT eats
    for free. Slots are per-slot INDEPENDENT md5 min-hashes (see
    :func:`minhash_slot_salt` for the order-bias the old hash-once +
    affine construction hid).
    """
    if num_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    from faisssearcher_spark.functions.sqltext import is_simple_name

    src_col = tokens_col if tokens_col is not None else text_col
    if is_simple_name(id_col) and is_simple_name(src_col):
        units_sql = (T.word_ngrams_sql(
            src_col, shingle_n, pre_tokenized=tokens_col is not None)
            if shingle_n else
            (src_col if tokens_col is not None else T.tokens_sql(src_col)))
        base = df.selectExpr(f"{id_col} AS id",
                             f"array_distinct({units_sql}) AS token_set")
    else:
        if tokens_col is not None:
            # share-one-tokenize-scan: shingle the caller's token array
            units = (T.word_ngrams(tokens_col, shingle_n, pre_tokenized=True)
                     if shingle_n else F.col(tokens_col))
        else:
            units = (T.word_ngrams(text_col, shingle_n) if shingle_n
                     else T.tokens(text_col))
        base = df.select(F.col(id_col).alias("id"),
                         F.array_distinct(units).alias("token_set"))
    # explode_outer + isNotNull: a plain explode gets `size(token_set)>0`
    # inferred beneath it and pushdown inlines the whole tokenize/shingle
    # expression into that filter (see ngram_jaccard_join); empty docs
    # yield a null token that dies on the cheap attribute filter, so they
    # still produce no signature row.
    #
    # The per-slot sections render as SQL text (one parse per select)
    # instead of per-node F.* calls — the py4j round-trip wall
    # (functions/sqltext.py); plan parity with the Column form is
    # pinned in tests/test_sqltext_parity.py.
    hash_exprs, agg_exprs, conv_exprs = minhash_sig_sql_parts(
        num_hashes, seed)
    # group digests materialize in the projection BELOW the aggregate so
    # each md5 computes once per exploded shingle per group (the slot
    # mins then read cheap substrings; aggregates do not CSE)
    hashed = base.selectExpr("id", "explode_outer(token_set) AS __t") \
        .filter("__t IS NOT NULL") \
        .selectExpr("id", *hash_exprs)
    # slot mins run on the fixed-length lowercase-hex windows
    # (lexicographic == numeric order); ONE radix conversion per doc per
    # slot happens after the aggregate, not per shingle
    sigs = hashed.groupBy("id").agg(*[F.expr(e) for e in agg_exprs]) \
        .selectExpr("id", *conv_exprs)

    # '|'-joined so distinct component sequences can't collide as strings,
    # then xxhash64'd to an 8-byte join key — the bucket self-join shuffles
    # long ints instead of ~40-char strings. A (astronomically unlikely)
    # hash collision only merges two buckets, i.e. adds a candidate pair
    # that exact verification below filters out; with verification off a
    # collision could emit one false pair at ~2^-64 per bucket pair.
    band_vals, _sig_arr = minhash_band_sql_parts(num_hashes, bands)
    banded = sigs.selectExpr(
        "id",
        f"posexplode(array({', '.join(band_vals)})) AS (band_idx, band_val)") \
        .selectExpr("id", "band_idx", "xxhash64(band_val) AS band_key")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))

    tok = base.select("id", "token_set")
    verified = (
        cand
        .join(tok.select(F.col("id").alias("id_a"), F.col("token_set").alias("ts_a")), "id_a")
        .join(tok.select(F.col("id").alias("id_b"), F.col("token_set").alias("ts_b")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("ts_a", "ts_b")))
        .withColumn("jaccard", F.col("n_common") /
                    (F.size("ts_a") + F.size("ts_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= verify_threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_expr_sql(c: str, bits: int = 32) -> str:
    """SQL text of :func:`simhash_expr` over column name ``c`` — one
    parse instead of ~400 py4j round-trips at 32 bits
    (functions/sqltext.py; parity pinned in
    tests/test_sqltext_parity.py)."""
    hashes = (f"transform({T.tokens_sql(c)}, t -> "
              f"CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))")
    bits_of = "array(" + ", ".join(
        f"CASE WHEN ((shiftright(h, {j}) & 1) = 1) THEN 1 ELSE -1 END"
        for j in range(bits)) + ")"
    votes = (f"aggregate({hashes}, array({', '.join(['0'] * bits)}), "
             f"(acc, h) -> zip_with(acc, {bits_of}, (v, b) -> (v + b)))")
    masks = "array(" + ", ".join(
        f"CAST({1 << j} AS BIGINT)" for j in range(bits)) + ")"
    packed = (f"zip_with({votes}, {masks}, (v, m) -> "
              f"CASE WHEN (v > 0) THEN m ELSE CAST(0 AS BIGINT) END)")
    return (f"aggregate({packed}, CAST(0 AS BIGINT), "
            f"(a, x) -> (a + x))")


def simhash_expr(text_col: str | Column, bits: int = 32) -> Column:
    """``bits``-bit SimHash of the whitespace token stream (term-frequency
    weighted: duplicate tokens vote once per occurrence).

    Per bit j: vote = Σ_tokens (+1 if bit j of md5int(token) else −1);
    fingerprint bit j = 1 iff vote > 0. Pure Catalyst and bit-identical in
    the DuckDB oracle.

    Single-pass plan: tokens are md5-hashed once into an int array, then
    ONE ``aggregate`` folds the hash array into a ``bits``-wide vote vector
    (``zip_with`` against the bit-index sequence), and one final fold packs
    votes into the fingerprint — O(tokens · bits) work with no repeated
    tokenization or hashing.
    """
    from faisssearcher_spark.functions.sqltext import is_simple_name

    if is_simple_name(text_col) and bits < 64:
        # bits=64 falls through: its top mask (1 << 63) exceeds long
        # range in BOTH constructions, and the Column path's
        # construction-time error is the pre-r13 contract
        return F.expr(simhash_expr_sql(text_col, bits))
    hashes = F.transform(T.tokens(text_col), lambda t: T.md5_int(t))

    def bits_of(h: Column) -> Column:
        # statically unrolled ±1 votes per bit (shift amounts must be
        # Python ints for shiftright)
        return F.array(*[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
            for j in range(bits)])

    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0)] * bits),
        lambda acc, h: F.zip_with(acc, bits_of(h), lambda v, b: v + b))
    masks = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    packed = F.zip_with(
        votes, masks,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")))
    return F.aggregate(packed, F.lit(0).cast("long"), lambda a, x: a + x)


def simhash(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    return df.select(F.col(id_col).alias("id"),
                     simhash_expr(text_col, bits).alias("simhash"))


def hamming_band_widths(bits: int, max_hamming: int) -> list[int]:
    """Maximal-width pigeonhole band plan: ``max_hamming + 1`` bands
    partitioning ``bits`` as evenly as possible (low-order bands first;
    the first ``bits % (max_hamming+1)`` bands get the extra bit).

    Using the FEWEST bands the pigeonhole argument allows maximizes the
    per-band key width ``bits/(max_hamming+1)``, and the band-join key
    cardinality ``2^width`` is what keeps candidate generation linear:
    with a fixed 8-bit band the key space saturates at 256 values and
    random collisions grow ∝ n²/256 no matter the corpus — the r6
    verdict's one asymptotic scale-killer. At the default 64-bit /
    hamming≤3 image config this plan gives 4×16-bit bands: the same
    recall guarantee with a 2^16 key space (256× larger), so expected
    random candidates are bands·n²/2^(width+1) — negligible until n
    approaches 2^width·occupancy, and the banding can keep pace with
    corpus growth by widening the fingerprint (``bits``), exactly the
    sign-LSH bits-∝-log₂(n) sizing discipline.

    Shared by the Spark kernel and the DuckDB oracle twin (the gate
    re-derives bands from this same plan), so the two can never drift.
    """
    n_bands = max_hamming + 1
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    if n_bands > bits:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bits ({bits}): the "
            f"pigeonhole guarantee needs max_hamming+1 non-empty bands")
    base, rem = divmod(bits, n_bands)
    return [base + 1 if b < rem else base for b in range(n_bands)]


def hamming_band_rows(fps: DataFrame, *, id_col: str = "id",
                      fp_col: str = "fp", bits: int, max_hamming: int,
                      extra_cols: "tuple[str, ...]" = (),
                      fold_key: bool = False) -> DataFrame:
    """One banded row per (fingerprint, band) under the maximal-width
    pigeonhole plan (:func:`hamming_band_widths`) — THE single banding
    kernel behind :func:`hamming_pairs`, the incremental
    ``FingerprintStore`` + its streaming sink, and the video near-dup
    path, so the band arithmetic can never drift between batch, store,
    stream, and per-frame variants (store state and streamed state
    MUST stay bit-identical or screens silently stop matching).

    Output ``(*extra_cols, id, fp, band_idx, band_val)``; with
    ``fold_key=True`` the (band_idx, band_val) pair folds into one
    8-byte ``band_key`` via xxhash64 — the bucket-keys-equal-join-keys
    layout the bucketed stores land on. Arithmetic shiftright + mask
    extracts bands correctly for negative 64-bit values
    (two's-complement low bits equal the logical ones)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64]; got {bits}")
    widths = hamming_band_widths(bits, max_hamming)
    offsets = [sum(widths[:b]) for b in range(len(widths))]

    def _band(b: int) -> Column:
        col = (F.shiftright(F.col("fp"), offsets[b]) if offsets[b]
               else F.col("fp"))
        if widths[b] >= 64:        # single full-width band: the fp itself
            return col
        return col.bitwiseAND(F.lit((1 << widths[b]) - 1))

    fpc = F.col(fp_col).cast("long")
    if bits < 64:
        # an IntegerType fingerprint with its sign bit set would
        # SIGN-EXTEND through the long cast (0x80000000 → 0xFFFF...
        # 80000000), inflating XOR popcounts by the 32 extension bits
        # and silently dropping true pairs — mask to the declared
        # width (value-preserving for every in-range non-negative fp).
        # The mask is GUARDED: a fp whose value cannot be a bits-wide
        # quantity (outside [-2^(bits-1), 2^bits), i.e. not explainable
        # as either an unsigned bits-wide value or its sign-extended
        # two's complement) means the declared width is WRONG — silent
        # truncation there would report false near-dup pairs, so the
        # job fails loudly instead (r9 advice). Anchored on the fp
        # expression itself, like the sign-LSH dim assert, so column
        # pruning can never delete the check.
        lo, hi = -(1 << (bits - 1)), 1 << bits
        fpc = F.when(
            F.assert_true(
                (fpc >= F.lit(lo)) & (fpc < F.lit(hi)),
                F.concat(
                    F.lit(f"fingerprint outside declared {bits}-bit "
                          f"range [{lo}, {hi}): got "),
                    fpc.cast("string"))
            ).isNull(), fpc)
        fpc = fpc.bitwiseAND(F.lit((1 << bits) - 1))
    extras = [F.col(c) for c in extra_cols]
    # NULL fingerprints never pair on the non-folded path (NULL
    # band_val equality is false) but would COLLAPSE onto one folded
    # band_key per band (xxhash64 skips NULL inputs) — a permanent
    # quadratic candidate bucket in the stores; drop them here so both
    # layouts share the rows-without-fingerprints-never-pair contract
    from faisssearcher_spark.functions.sqltext import (_session_splice_safe,
                                                       is_simple_name)

    src = fps.filter(F.col(fp_col).isNotNull()) \
        .select(*extras, F.col(id_col).alias("id"), fpc.alias("fp"))
    # the session gate is consulted EXPLICITLY: with empty extra_cols
    # the all() is vacuously true and is_simple_name (which embeds the
    # gate) never runs — the splice path would silently bypass the
    # never-splice-under-unsafe-parser-configs invariant (r13 ADVICE)
    if _session_splice_safe() and all(is_simple_name(c)
                                      for c in extra_cols):
        # SQL-text fast path over the staged simple names (one parse
        # per select — functions/sqltext.py; parity pinned in
        # tests/test_sqltext_parity.py)
        def _band_sql(b: int) -> str:
            col = (f"shiftright(fp, {offsets[b]})" if offsets[b]
                   else "fp")
            if widths[b] >= 64:
                return col
            return f"({col} & {(1 << widths[b]) - 1})"

        bands = ", ".join(_band_sql(b) for b in range(len(widths)))
        banded = src.selectExpr(
            *extra_cols, "id", "fp",
            f"posexplode(array({bands})) AS (band_idx, band_val)")
        if fold_key:
            return banded.selectExpr(
                *extra_cols, "id",
                "xxhash64(band_idx, band_val) AS band_key", "fp")
        return banded
    banded = src.select(
        *extra_cols, "id", "fp",
        F.posexplode(F.array(*[_band(b) for b in range(len(widths))]))
        .alias("band_idx", "band_val"))
    if fold_key:
        return banded.select(
            *extra_cols, "id",
            F.xxhash64("band_idx", "band_val").alias("band_key"), "fp")
    return banded


#: band-density warn threshold (r13 verdict #7): expected random
#: same-band collisions are ~n²/2^width per band, so candidate volume
#: stays near-linear only while n ≲ 2^width. Once the corpus estimate
#: exceeds RATIO × 2^width the banding plan is undersized for the
#: corpus (the documented bits-∝-log₂(n) sizing discipline says widen
#: ``bits``) — the guard warns loudly instead of silently going
#: quadratic. 16 ≈ one order of magnitude of headroom past linear.
BAND_DENSITY_WARN_RATIO = 16


def _estimate_rows(df: DataFrame) -> "int | None":
    """Catalyst's optimized-plan row-count estimate, or None when the
    optimizer doesn't carry one (no CBO stats) — module-level so tests
    can monkeypatch it, mirroring :func:`_plan_size_bytes`."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        pass
    return None


def _band_density_guard(fps: DataFrame, *, bits: int,
                        max_hamming: int) -> None:
    """Warn when the corpus size estimate says the pigeonhole bands are
    too narrow for the corpus (n > RATIO·2^width ⇒ ~n²/2^width random
    collisions per band dominate the candidate join). Estimate-based
    and advisory only: plans without a row-count estimate pass silently
    — the sizing contract stays documented either way."""
    width = min(hamming_band_widths(bits, max_hamming))
    if width >= 62:
        return
    est = _estimate_rows(fps)
    if est is not None and est > BAND_DENSITY_WARN_RATIO * (1 << width):
        import warnings
        warnings.warn(
            f"hamming_pairs: ~{est} fingerprints over {width}-bit bands "
            f"(bits={bits}, max_hamming={max_hamming}) expects "
            f"~n²/2^{width} ≈ {est * est >> width} random same-band "
            "collisions per band — the candidate join is effectively "
            "quadratic at this corpus size. Widen `bits` (keep "
            "bits ≳ log2(n)·(max_hamming+1)) or split the corpus.",
            RuntimeWarning, stacklevel=3)


def hamming_pairs(fps: DataFrame, *, id_col: str = "id",
                  fp_col: str = "fp", bits: int, max_hamming: int
                  ) -> DataFrame:
    """Pairs of rows whose ``bits``-bit integer fingerprints are within
    ``max_hamming`` bits of each other — the shared kernel behind SimHash
    document pairs and perceptual-hash image pairs.

    Candidates come from maximal-width pigeonhole band equality
    (:func:`hamming_band_widths`): ``max_hamming + 1`` bands of
    ``bits/(max_hamming+1)`` bits — any pair at hamming ≤ max_hamming
    has zero differing bits in at least one band, so the join is an
    equi-join on ``(band_idx, band_val)`` — never a cross join — and the
    per-band key cardinality ``2^width`` is the largest the guarantee
    allows, which is what keeps random band collisions (∝ n²/2^width)
    from going quadratic at scale. Verification is XOR + popcount.
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    Works on any ``1 ≤ bits ≤ 64`` (fingerprints live in a signed long;
    arithmetic shiftright + mask extracts bands correctly for negative
    64-bit values — two's-complement low bits equal the logical ones).
    """
    _band_density_guard(fps, bits=bits, max_hamming=max_hamming)
    banded = hamming_band_rows(fps, id_col=id_col, fp_col=fp_col,
                               bits=bits, max_hamming=max_hamming)

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("a.fp").alias("fp_a"),
                F.col("b.id").alias("id_b"), F.col("b.fp").alias("fp_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(
            F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", bits: int = 32,
                  max_hamming: int = 3) -> DataFrame:
    """Document pairs within ``max_hamming`` bits of SimHash distance.

    Candidate generation and popcount verification are
    :func:`hamming_pairs` over the :func:`simhash` fingerprint frame.
    """
    fps = simhash(df, id_col=id_col, text_col=text_col, bits=bits)
    return hamming_pairs(fps, id_col="id", fp_col="simhash", bits=bits,
                         max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# embedding-space near-dup
# ---------------------------------------------------------------------------

#: cap on single-machine corpus materialization for the "blocked" strategy
#: (which collects the id+vector frame to the driver and broadcasts the
#: normalized matrix) — same value and semantics as
#: knn.ITEMS_MEMORY_CAP_BYTES, the quadrant rule both auto-dispatchers
#: share.
EMBED_MEMORY_CAP_BYTES = 256 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (plans/inspect
    ``plan_size_bytes``); module-level so tests can monkeypatch the
    estimator — mirrors knn._plan_size_bytes."""
    from faisssearcher_spark.plans.inspect import plan_size_bytes
    return plan_size_bytes(df)


def embedding_cosine_pairs(df: DataFrame, *, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.9,
                           score_scale: int | None = None,
                           strategy: str = "auto",
                           lsh_tables: int = 8, lsh_bits: int = 4,
                           lsh_seed: int = 42,
                           lsh_dim: int | None = None,
                           lsh_planes: str = "random",
                           lsh_impl: str = "auto") -> DataFrame:
    """Semantic near-duplicate pairs: cosine(a, b) ≥ threshold, id_a < id_b.

    Strategies:

    - ``"auto"`` (default): size-dispatch on Catalyst's optimized-plan
      size estimate, the same quadrant rule as ``knn_join`` (knn.py
      ``_auto_strategy``): corpora whose estimate fits
      ``EMBED_MEMORY_CAP_BYTES`` run ``"blocked"`` (exact, fastest at
      single-machine sizes); anything larger — or with an UNKNOWN
      estimate, which must be presumed large because guessing small
      risks a driver OOM while guessing large only costs shuffle —
      runs ``"lsh"`` (never materializes the corpus anywhere). This
      keeps the flagship semantic-dedup entry point scale-safe by
      default: no ``toPandas()`` ever happens on an above-cap corpus.
    - ``"blocked"``: block-matrix scoring — each Arrow batch of
      rows is scored against the full normalized matrix (broadcast) with
      ONE numpy float64 matmul inside ``mapInPandas``; only above-threshold
      pairs are emitted. Work distributes by row-block, the O(n²) pair
      space is never materialized as rows, and the vectorized kernel is
      ~10× the codegen'd per-pair expression. Requires the corpus matrix
      (n·d doubles) to fit executor memory — at larger n, use ``"lsh"``.
    - ``"catalyst"``: pure-SQL self-join with codegen'd dot products.
      Vectors L2-normalize ONCE in the child projections (O3 rewrite) so
      per-pair work is a single dot product. No Python, no broadcast-size
      bound; slower per pair.
    - ``"lsh"``: the unbounded-scale path — OR-amplified sign-LSH (the
      cosine analog of MinHash banding): ``lsh_tables`` independent hash
      tables of ``lsh_bits`` sign-bits each; two rows become a candidate
      iff they share a bucket in ANY table (equi-join on (table, bucket) —
      the pair space never materializes, nothing broadcasts), and every
      candidate is verified with the exact dot product, so precision is
      1.0 and recall ≈ 1−(1−p^b)^T with p = 1−θ/π (θ = acos(threshold));
      the defaults give ~0.998 at threshold 0.9 — a formula that holds
      for RANDOM hyperplanes, hence the default ``lsh_planes="random"``:
      seeded Gaussian hyperplanes (dimension ``lsh_dim``, inferred from
      the first row when None — must equal the vector length). Real LLM
      embeddings are anisotropic with non-zero-mean coordinates, so the
      alternative ``lsh_planes="axis"`` (bit j of table t = sign of raw
      coordinate t·bits+j — the cheapest SQL-expressible bucketing) can
      degenerate toward one bucket on such data; it validates
      ``tables·bits ≤ dim`` so no bit ever reads past the vector.

    blocked/catalyst produce identical results (float64 accumulation;
    the blocked kernel's matmul is verified against the SQL oracle in the
    gate); lsh is exact on every pair it emits and misses a quantified
    tail.

    ``lsh_impl`` picks how the sign bits are computed: ``"expr"`` —
    pure-SQL projection chains, bit-identical to the DuckDB oracle;
    ``"gemm"`` — one numpy float64 GEMM per Arrow batch (the IVF
    assignment pattern), ~100× the interpreted HOF expression once
    ``tables·bits·dim`` is large; ``"auto"`` (default) switches to gemm
    above ``LSH_GEMM_WORK_THRESHOLD`` multiply-adds per row. Both
    impls use the same hyperplanes; they can differ only when a
    projection lands within 1 ulp of zero (accumulation order), and
    exact verification confines any such difference to the recall tail.
    """
    if strategy == "auto":
        est = _plan_size_bytes(df)
        strategy = ("blocked" if est is not None
                    and est <= EMBED_MEMORY_CAP_BYTES else "lsh")
    if strategy == "lsh":
        return _embedding_pairs_lsh(
            df, id_col=id_col, vec_col=vec_col, threshold=threshold,
            score_scale=score_scale, tables=lsh_tables, bits=lsh_bits,
            seed=lsh_seed, dim=lsh_dim, planes_mode=lsh_planes,
            impl=lsh_impl)
    if strategy == "catalyst":
        from faisssearcher_spark.functions.vector import l2_normalize

        a = df.select(F.col(id_col).alias("id_a"),
                      l2_normalize(vec_col).alias("v_a"))
        b = df.select(F.col(id_col).alias("id_b"),
                      l2_normalize(vec_col).alias("v_b"))
        score = M.inner_product(F.col("v_a"), F.col("v_b"))
        if score_scale is not None:
            score = F.round(score, score_scale)
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", score)
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    if strategy != "blocked":
        raise ValueError(
            "strategy must be 'auto', 'blocked', 'catalyst' or 'lsh'")

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
        .toPandas()
    if not len(pdf):
        # near-dups of an empty corpus: empty pair set (the kernel's
        # (0,)-shaped matrix would otherwise break axis math)
        return spark.createDataFrame(
            [], "id_a long, id_b long, cos_sim double")
    ids = pdf["id"].to_numpy()
    mat = np.array(pdf["v"].to_list(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr, scale = float(threshold), score_scale

    def _score_block(batches):
        full = b_mat.value
        all_ids = b_ids.value
        for block in batches:
            if not len(block):
                continue
            bm = np.array(block["v"].to_list(), dtype=np.float64)
            bn = np.linalg.norm(bm, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            bm = bm / bn
            sims = bm @ full.T                       # (block, n)
            if scale is not None:
                from faisssearcher_spark.operators.knn import \
                    _np_round_exact
                sims = _np_round_exact(sims, scale)
            bids = block["id"].to_numpy()
            mask = (sims >= thr) & (bids[:, None] < all_ids[None, :])
            bi, fj = np.nonzero(mask)
            yield pd.DataFrame({"id_a": bids[bi],
                                "id_b": all_ids[fj],
                                "cos_sim": sims[bi, fj]})

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
        .mapInPandas(_score_block, "id_a long, id_b long, cos_sim double")


def lsh_hyperplanes(tables: int, bits: int, dim: int, seed: int):
    """The seeded Gaussian hyperplane matrix (tables·bits × dim) shared by
    the Spark bucketing and the DuckDB oracle twin — one definition, two
    engines, bit-identical projections (same multiply-then-left-fold
    order)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables * bits, dim))


#: above this many multiply-adds per row (tables·bits·dim), the sign-LSH
#: bucket computation auto-switches from the SQL expression form to one
#: numpy GEMM per Arrow batch. The expression form is CodegenFallback
#: (higher-order functions never codegen) — interpreted eval costs ~100×
#: a BLAS flop, which is irrelevant at the gate's 8×4×64 but dominates
#: once bits grow with log(n) as corpus-sized LSH requires (the same
#: literals-vs-GEMM cliff IVF assignment hit at 4096×768, NOTES.md).
LSH_GEMM_WORK_THRESHOLD = 4096


def lsh_bucket_rows(df: DataFrame, *, id_col: str, vec_col: str,
                    tables: int = 8, bits: int = 4, seed: int = 42,
                    dim: int | None = None,
                    planes_mode: str = "random",
                    impl: str = "auto",
                    probe_dim: bool = True,
                    payload: "list[str] | None" = None) -> DataFrame:
    """``(id, t, bucket)`` — one sign-LSH bucket row per (vector, table).

    The shared bucket kernel behind ``embedding_cosine_pairs
    (strategy="lsh")`` and the incremental ``EmbeddingStore``: seeded
    Gaussian hyperplanes (``planes_mode="random"``) or axis-aligned
    leading dims (the oracle-checkable variant), evaluated as SQL
    expressions or one numpy GEMM per Arrow batch past
    ``LSH_GEMM_WORK_THRESHOLD`` multiply-adds per row.

    ``probe_dim=False`` (requires ``dim``) replaces the eager one-row
    length probe with a per-row in-plan ``assert_true`` — same loud
    failure on a mismatched/NULL vector, zero extra Spark jobs. Use it
    when the caller already holds a VALIDATED dim (the incremental
    stores record dim in their meta identity); the default keeps the
    probe because an unvalidated wrong ``dim`` in random mode would
    otherwise zero every bucket bit only at execution time.

    ``payload`` names ``df`` columns to carry through onto every
    bucket row (repeated per table) — the join-free way for a caller
    to keep per-vector state (e.g. the EmbeddingStore's f16 code)
    attached without a batch-sized shuffle join back on id."""
    if tables < 1 or bits < 1:
        raise ValueError("lsh_tables and lsh_bits must be >= 1")
    if planes_mode not in ("random", "axis"):
        raise ValueError("lsh_planes must be 'random' or 'axis'")
    if impl not in ("auto", "expr", "gemm"):
        raise ValueError("lsh_impl must be 'auto', 'expr' or 'gemm'")
    payload = list(payload or [])

    v = M.as_double(vec_col)
    idc = F.col(id_col)
    if probe_dim:
        # one-row probe: the true vector length. Runs even when lsh_dim
        # was passed explicitly — a wrong lsh_dim in random mode would
        # null-pad the zip_with, null the fold, evaluate every bit to 0,
        # and land ALL vectors in one bucket per table: a silent
        # quadratic candidate blowup. Fail loudly instead (mirrors the
        # axis-mode bounds check).
        probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None or probe["d"] is None:
            if dim is None:
                raise ValueError(
                    "cannot infer the vector dimension from an "
                    "empty frame; pass lsh_dim explicitly")
            vec_len = int(dim)
        else:
            vec_len = int(probe["d"])
            if dim is not None and int(dim) != vec_len:
                raise ValueError(
                    f"lsh_dim={dim} does not match the actual vector "
                    f"length {vec_len}; a mismatched hyperplane dim "
                    "would zero every bucket bit and collapse all "
                    "vectors into one bucket")
    else:
        if dim is None:
            raise ValueError("probe_dim=False requires an explicit dim")
        vec_len = int(dim)
        # the probe's loud-failure contract, moved into the plan: the
        # VECTOR expression itself is gated behind a per-row length
        # assertion, so a mismatched or NULL vector fails the job
        # instead of silently landing in bucket 0 (assert_true raises
        # on false AND on null — a NULL vector is a data error here,
        # not an empty bucket). Anchored on v, not the id column: every
        # bucket bit derives from v, so column pruning can never delete
        # the check (an id-anchored assert would vanish from any plan
        # that drops the id — review catch)
        v = F.when(
            F.assert_true(
                F.size(F.col(vec_col)) == vec_len,
                F.concat(F.lit(f"sign-LSH vector length != declared "
                               f"dim {vec_len}: got "),
                         F.coalesce(F.size(F.col(vec_col))
                                    .cast("string"), F.lit("NULL")))
            ).isNull(), v)
    if planes_mode == "axis":
        # axis-aligned: bit j of table t = sign of raw coordinate t·b+j
        # (normalization preserves sign, so bucketing the raw vector is
        # identical and keeps the oracle SQL trivial)
        if tables * bits > vec_len:
            raise ValueError(
                f"axis-aligned sign-LSH needs tables*bits <= dim "
                f"({tables}*{bits} > {vec_len}); dims past the vector "
                f"would silently yield constant bits")

        def proj(t: int, j: int) -> Column:
            return F.element_at(v, t * bits + j + 1)
    else:
        if dim is None:
            dim = vec_len
        planes = lsh_hyperplanes(tables, bits, dim, seed)

        def proj(t: int, j: int) -> Column:
            hp = F.array(*[F.lit(float(x)) for x in planes[t * bits + j]])
            return F.aggregate(F.zip_with(v, hp, lambda x, y: x * y),
                               F.lit(0.0), lambda a, x: a + x)

    def bucket(t: int) -> Column:
        out = F.lit(0)
        for j in range(bits):
            out = out + F.when(proj(t, j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        return out.cast("int")

    if impl == "auto":
        impl = ("gemm" if planes_mode == "random"
                and tables * bits * vec_len >= LSH_GEMM_WORK_THRESHOLD
                else "expr")
    if impl == "gemm" and planes_mode != "random":
        # axis bits are a single element_at each — nothing to vectorize
        impl = "expr"

    if impl == "gemm":
        # One float64 GEMM per Arrow batch: (batch × dim) @ (dim ×
        # tables·bits) → sign bits → per-table bucket ints. Bit-parity
        # caveat vs the expression form: matmul accumulation order
        # differs from the left-assoc fold, so a projection landing
        # within 1 ulp of 0 can flip a bit — candidates differ only in
        # that measure-zero tail, and exact verification makes any
        # difference a recall-tail effect, never a precision one. The
        # DuckDB-gated path (8×4×64) stays on "expr" for bit-parity.
        import numpy as np

        P = np.asarray(planes, dtype=np.float64).T  # (dim, tables*bits)
        pow2 = (1 << np.arange(bits)).astype(np.int64)
        n_tables = tables
        id_type = df.schema[id_col].dataType.simpleString()
        pay_types = {n: df.schema[n].dataType.simpleString()
                     for n in payload}
        src = df.select(idc.alias("id"), *payload, v.alias("__v"))

        def _buckets(batches):
            import pandas as pd
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array(pdf["__v"].tolist(), dtype=np.float64)
                B = (V @ P >= 0).reshape(len(pdf), n_tables, -1)
                bk = (B * pow2).sum(axis=2).astype(np.int32)
                ids = pdf["id"].to_numpy()
                yield pd.DataFrame({
                    "id": np.repeat(ids, n_tables),
                    **{n: np.repeat(pdf[n].to_numpy(), n_tables)
                       for n in payload},
                    "t": np.tile(np.arange(n_tables, dtype=np.int32),
                                 len(pdf)),
                    "bucket": bk.reshape(-1)})

        schema = ", ".join([f"id {id_type}",
                            *[f"{n} {pay_types[n]}" for n in payload],
                            "t int", "bucket int"])
        tb = src.mapInPandas(_buckets, schema=schema)
    else:
        from faisssearcher_spark.functions.sqltext import (is_simple_name,
                                                           sql_double,
                                                           sql_str)

        if (is_simple_name(id_col) and is_simple_name(vec_col)
                and all(is_simple_name(p) for p in payload)):
            # SQL-text rendering of the same bucket trees: the random-
            # planes form carries tables*bits*dim literal nodes, i.e.
            # thousands of py4j round-trips when built per-node
            # (functions/sqltext.py; parity pinned in
            # tests/test_sqltext_parity.py)
            v_sql = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
            if not probe_dim:
                msg = (f"sign-LSH vector length != declared "
                       f"dim {vec_len}: got ")
                v_sql = (
                    f"CASE WHEN (assert_true((size({vec_col}) = "
                    f"{vec_len}), concat({sql_str(msg)}, "
                    f"coalesce(CAST(size({vec_col}) AS STRING), "
                    f"'NULL'))) IS NULL) THEN {v_sql} END")

            if planes_mode == "axis":
                def proj_sql(t: int, j: int) -> str:
                    return f"element_at({v_sql}, {t * bits + j + 1})"
            else:
                def proj_sql(t: int, j: int) -> str:
                    hp = ", ".join(sql_double(x)
                                   for x in planes[t * bits + j])
                    return (f"aggregate(zip_with({v_sql}, array({hp}), "
                            f"(x, y) -> (x * y)), 0.0D, "
                            f"(a, x) -> (a + x))")

            def bucket_sql(t: int) -> str:
                out = "0"
                for j in range(bits):
                    out = (f"({out} + CASE WHEN ({proj_sql(t, j)} >= 0) "
                           f"THEN {1 << j} ELSE 0 END)")
                return f"CAST({out} AS INT)"

            buckets = ", ".join(bucket_sql(t) for t in range(tables))
            tb = df.selectExpr(
                f"{id_col} AS id", *payload,
                f"posexplode(array({buckets})) AS (t, bucket)")
        else:
            tb = df.select(
                idc.alias("id"), *payload,
                F.posexplode(F.array(*[bucket(t) for t in range(tables)]))
                .alias("t", "bucket"))
    return tb


def _embedding_pairs_lsh(df: DataFrame, *, id_col: str, vec_col: str,
                         threshold: float, score_scale: int | None,
                         tables: int, bits: int, seed: int,
                         dim: int | None,
                         planes_mode: str = "random",
                         impl: str = "auto") -> DataFrame:
    """OR-amplified sign-LSH candidate generation + exact verification.
    See ``embedding_cosine_pairs(strategy="lsh")``."""
    from faisssearcher_spark.functions.vector import l2_normalize

    v = M.as_double(vec_col)
    tb = lsh_bucket_rows(df, id_col=id_col, vec_col=vec_col,
                         tables=tables, bits=bits, seed=seed, dim=dim,
                         planes_mode=planes_mode, impl=impl)
    a, b = tb.alias("a"), tb.alias("b")
    cand = (
        a.join(b, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    nrm = df.select(F.col(id_col).alias("id"),
                    l2_normalize(v, zero_norm_nan=False).alias("v"))
    score = M.inner_product(F.col("v_a"), F.col("v_b"))
    if score_scale is not None:
        score = F.round(score, score_scale)
    return (
        cand
        .join(nrm.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")),
              "id_a")
        .join(nrm.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")),
              "id_b")
        .withColumn("cos_sim", score)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# near-duplicate clustering (connected components over a pair list)
# ---------------------------------------------------------------------------

def dedup_clusters(pairs: DataFrame, *, id_a: str = "id_a",
                   id_b: str = "id_b", max_iterations: int = 50,
                   driver_edge_threshold: int = 1_000_000) -> DataFrame:
    """Resolve near-duplicate pairs into clusters: connected components
    with ``cluster_id = min(member id)`` — the step that turns a pair
    list (from MinHash/SimHash/embedding dedup) into "keep one document
    per group".

    Adaptive execution, same spirit as Spark's broadcast-join threshold:
    the edge list is usually TINY relative to the corpus (near-dup pairs
    after LSH), and an iterative distributed loop pays several shuffled
    jobs per round for it. Below ``driver_edge_threshold`` edges the
    component resolution collects the pair list and runs a path-halving
    union-find on the driver (O(E α(E)), microseconds per edge), then
    re-parallelizes the labels. Above it — or with
    ``driver_edge_threshold=0`` — it runs distributed min-label
    propagation over the edge set: every node starts labeled with its
    own id; each round takes the min of its label, its neighbors'
    labels, and its label's label (pointer jumping), collapsing chains
    in O(log diameter) rounds; each round is one shuffled aggregation,
    the driver holds only the changed-count scalar.
    ``localCheckpoint`` truncates the per-round lineage — iterative
    plans otherwise grow exponentially deep (each round references the
    previous labels 4×) and overflow analysis long before data size
    matters; on a real cluster with a checkpoint dir, ``checkpoint()``
    additionally survives executor loss.

    Driver-memory note: the default threshold routes up to 1M edges
    (2 longs each, tens of MB as driver Row objects) through a single
    ``collect`` on EVERY caller — deliberate for the common tiny-pair
    case, but callers embedded in larger pipelines (operators/curate.py)
    or running with small driver heaps should lower
    ``driver_edge_threshold`` or set it to 0 to force the distributed
    branch outright; correctness is identical either way.

    Returns ``(id, cluster_id)`` for every node that appears in a pair.
    """
    if driver_edge_threshold:
        # one-shot probe: pull at most threshold+1 edges — if they all fit,
        # that IS the edge list (upstream pair join runs once, not twice)
        probe = pairs.select(F.col(id_a).cast("long"),
                             F.col(id_b).cast("long")) \
            .limit(driver_edge_threshold + 1).collect()
        if len(probe) <= driver_edge_threshold:
            return _dedup_clusters_driver(pairs.sparkSession, probe)
    edges = (
        pairs.select(F.col(id_a).cast("long").alias("a"),
                     F.col(id_b).cast("long").alias("b"))
        .union(pairs.select(F.col(id_b).cast("long").alias("a"),
                            F.col(id_a).cast("long").alias("b")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("a").alias("id")).distinct() \
        .withColumn("label", F.col("id"))

    for _ in range(max_iterations):
        # candidate label per node: min over neighbors' labels...
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # ...shortcut: pointer jumping — a node also takes its label's
        # label (label(label(x))), collapsing chains in O(log n) rounds.
        jump = (
            labels.join(labels.select(F.col("id").alias("label"),
                                      F.col("label").alias("jump_label")),
                        "label")
            .select("id", "jump_label")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .join(jump, "id", "left")
            .select("id", F.least(
                F.col("label"),
                F.coalesce(F.col("nbr_label"), F.col("label")),
                F.coalesce(F.col("jump_label"), F.col("label")),
            ).alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def _dedup_clusters_driver(spark, rows) -> DataFrame:
    """Driver-side union-find (path halving + union by root id) for
    bounded edge lists; min member id becomes the cluster id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        parent[x] = r
        return r

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps roots == cluster ids directly
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    labels = [(x, find(x)) for x in parent]
    return spark.createDataFrame(labels, "id long, cluster_id long")


# ---------------------------------------------------------------------------
# C4-style global line / segment dedup
# ---------------------------------------------------------------------------

def semantic_cell_pairs(df: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95, n_cells: int = 64,
                        seed: int = 42, max_iter: int = 8,
                        score_scale: int | None = None) -> DataFrame:
    """Within-cluster semantic near-duplicate candidate pairs — the
    candidate stage of SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    spherical k-means partitions the corpus by embedding DIRECTION
    (reusing :class:`~faisssearcher_spark.operators.ann.IVFIndex`'s
    trainer), and exact cosine pairs form only WITHIN a cell.

    Output: ``(id_a, id_b, cos_sim, cell)`` with ``id_a < id_b`` and
    ``cos_sim ≥ threshold`` (rounded to ``score_scale`` first when set).

    Scale shape: candidates meet through the cell equi-join — never a
    corpus cross product — so pair work is Σ(cell_size²) over cells, not
    n². Unlike sign-LSH (:func:`embedding_cosine_pairs` strategy
    ``"lsh"``), cells adapt to the DATA's density (learned centroids),
    which is why SemDeDup scales to web corpora: size ``n_cells`` so the
    expected cell holds ~√(pairs-per-task) rows, and grow it linearly
    with the corpus. The join is pinned ``shuffle_hash``: both sides are
    the same cell-assigned frame whose estimate Catalyst may misjudge,
    and a hot cell degrades to one big (but bounded) hash-join partition
    rather than a broadcast. Misses only cross-cell pairs — the
    quantization error SemDeDup accepts by design (raise ``n_cells``
    recall by lowering it, or run the LSH strategy for a recall bound).
    """
    from faisssearcher_spark.functions.vector import l2_normalize
    from faisssearcher_spark.operators.ann import IVFIndex

    # train_mode="sample": seeded driver Lloyd on a bounded sample — the
    # SemDeDup paper's own discipline, and ~10 Spark jobs cheaper than
    # distributed MLlib for a clustering whose only job is bucketing
    idx = IVFIndex(n_cells=n_cells, nprobe=1, seed=seed, metric="cos",
                   max_iter=max_iter, train_mode="sample").fit(
        df, item_key_col=id_col, item_vec_col=vec_col)
    assigned = idx.assignments().select(
        "cell", F.col(id_col).alias("__id"),
        l2_normalize(vec_col, zero_norm_nan=False).alias("__v"))
    a = assigned.select("cell", F.col("__id").alias("id_a"),
                        F.col("__v").alias("__va"))
    b = assigned.select("cell", F.col("__id").alias("id_b"),
                        F.col("__v").alias("__vb"))
    score = M.inner_product(F.col("__va"), F.col("__vb"))
    if score_scale is not None:
        score = F.round(score, score_scale)
    return (a.join(b.hint("shuffle_hash"), "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", score)
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim", "cell"))


def semantic_dedup(df: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.95,
                   n_cells: int = 64, seed: int = 42, max_iter: int = 8,
                   driver_edge_threshold: int = 1_000_000,
                   pairs: DataFrame | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): remove semantically near-identical
    documents by embedding — cluster with spherical k-means, find
    within-cell pairs with cosine ≥ threshold
    (:func:`semantic_cell_pairs`), resolve pairs into connected
    components (:func:`dedup_clusters`; components never span cells
    since every edge is within-cell), and keep ONE representative per
    component. Returns the surviving rows with the input schema.

    Deviation from the paper, documented: the survivor is the MIN-id
    member (the engine-wide deterministic keep-first policy shared by
    every dedup operator and their DuckDB oracles), not the paper's
    "farthest from centroid" choice — the paper itself reports the
    keep-policy barely moves downstream perplexity (§4.3).

    Scale shape: one k-means fit (distributed MLlib), one cell
    equi-join for candidates, component resolution per
    :func:`dedup_clusters` (adaptive driver/distributed), and one
    left_anti join to drop losers — broadcast-safe because the dropped
    set is ≤ pair nodes, usually ≪ corpus.
    """
    if pairs is None:
        pairs = semantic_cell_pairs(df, id_col=id_col, vec_col=vec_col,
                                    threshold=threshold, n_cells=n_cells,
                                    seed=seed, max_iter=max_iter)
    # (callers that already hold the pair set — e.g. the invariant gate —
    # pass it to avoid a second k-means fit + cell self-join)
    clusters = dedup_clusters(pairs,
                              driver_edge_threshold=driver_edge_threshold)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
                     .select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


def dedup_segments(segments: DataFrame, *, id_col: str = "doc_id",
                   pos_col: str = "pos",
                   seg_col: str = "segment") -> DataFrame:
    """Corpus-global keep-first segment dedup (the C4 three-sentence-span /
    line dedup shape, Raffel et al. 2020 §2.2): of all occurrences of an
    identical segment across the ENTIRE corpus, only the first — ordered
    by ``(id, pos)`` — survives; every later occurrence (including
    repeats inside the same document) is removed.

    Input: one row per segment occurrence ``(id, pos, segment)``.
    Output: the surviving occurrences, same three columns.

    Scale shape: ONE aggregation keyed by the segment text —
    ``groupBy(segment).agg(min(struct(id, pos)))`` — whose partial
    (map-side) combine collapses hot segments *before* the shuffle, so a
    boilerplate line appearing a billion times shuffles once per input
    partition, not once per occurrence (the window-function formulation
    ``row_number() over (partition by segment)`` has no partial agg and
    sends every occurrence to one reducer — this is why the agg form is
    used). The survivors ARE the aggregate output: no join back is
    needed. Shuffle volume ∝ distinct segments.
    """
    first = F.min(F.struct(F.col(id_col), F.col(pos_col))).alias("__first")
    return (segments
            .groupBy(seg_col).agg(first)
            .select(F.col(f"__first.{id_col}").alias(id_col),
                    F.col(f"__first.{pos_col}").alias(pos_col),
                    F.col(seg_col)))


def dedup_lines(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text", sep: str = "\n",
                min_chars: int = 1,
                drop_empty_docs: bool = True) -> DataFrame:
    """C4-style global line dedup over a document corpus: split each
    document on ``sep``, remove every duplicate occurrence of a line
    corpus-wide (keep-first by ``(id, line position)`` — see
    :func:`dedup_segments`), and reassemble each document from its
    surviving lines in original order.

    Lines shorter than ``min_chars`` are dropped outright (C4 drops
    too-short lines; this also keeps empty lines from forming one giant
    skew bucket). Documents with no surviving lines are dropped when
    ``drop_empty_docs`` (C4 semantics), else kept with empty text.

    Output: ``(id, text, n_lines, n_kept_lines)`` where ``n_lines``
    counts the document's post-``min_chars`` lines before dedup.

    Scale shape: split/explode map-side; one segment-keyed agg
    (skew-absorbed, see :func:`dedup_segments`); two id-keyed aggs that
    AQE co-plans. No O(n²) anywhere; shuffle ∝ lines.
    """
    lines = (df.select(F.col(id_col),
                       F.posexplode_outer(F.split(F.col(text_col),
                                                  _re_escape(sep)))
                       .alias("pos", "line"))
             .filter(F.length("line") >= min_chars))
    per_doc = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    kept = dedup_segments(lines, id_col=id_col, pos_col="pos",
                          seg_col="line")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            sep).alias(text_col),
        F.count("*").alias("n_kept_lines"))
    how = "inner" if drop_empty_docs else "left"
    # rebuilt is doc-count-sized but statically estimated from the tiny
    # pre-explode scan — pin off the broadcast (NOTES.md trap #2)
    out = per_doc.join(rebuilt.hint("shuffle_hash"), id_col, how)
    if not drop_empty_docs:
        out = out.withColumn(text_col, F.coalesce(text_col, F.lit(""))) \
                 .withColumn("n_kept_lines",
                             F.coalesce("n_kept_lines", F.lit(0)))
    return out.select(id_col, text_col, "n_lines", "n_kept_lines")


def _token_windows(df: DataFrame, *, id_col: str, text_col: str,
                   n: int, tokens_col: str | None = None,
                   extra_cols: "tuple[str, ...]" = ()
                   ) -> tuple[DataFrame, DataFrame]:
    """(tokenized frame, sliding n-token window occurrences).

    Returns ``toked = (id, __toks)`` and ``wins = (id, start, __w)``
    where ``start`` is the 0-based token offset and ``__w`` the window
    KEY: ``xxhash64`` of the sliced token array, NOT the window text.
    Every spans/exsub/boilerplate/decontam groupBy and join shuffles
    this key — at min_len=50 the space-joined string it replaced was
    ~300 bytes per window where the long is 8, a 20-40× shuffle-byte
    cut on the 100-TB-critical operators (r10 verdict #2; measured
    locally where shuffle is in-memory: spans/exsub wall at parity,
    boilerplate x10 23.9 → 5.3 s and 4.8 → 1.35 per decade, because
    its (group, window, id)-distinct shuffled the string THRICE).
    Hashing the ARRAY (element boundaries included) rather than the
    joined string also removes the token-containing-separator
    ambiguity. Exactness contract: two distinct window texts equi-key
    with probability 2⁻⁶⁴ per pair — the budget minhash_lsh_join's
    band keys already accept, explicitly sanctioned for this operator
    family (r10 verdict #2); even at 10¹² windows the birthday bound
    expects ~3·10⁴ colliding TEXT pairs corpus-wide, each at worst
    marking one min_len-token window spuriously duplicated — noise at
    that corpus size, and detectable by re-verifying marked spans
    against the token arrays if a deployment needs certainty. (A
    96-bit struct(xxhash64, murmur3) key was measured first: it
    doubles window-gen compute for sub-2⁻⁶⁴ risk and cost spans/exsub
    ~35% wall at x10.)

    Tokenization runs ONCE per document (the array materializes as an
    attribute before any lambda touches it — the NOTES.md
    interpreted-projection trap), and short documents yield no windows
    via a ``when``-guarded sequence instead of a filter (a filter on
    ``size(__toks)`` would push back through the projection and
    re-inline the split). ``tokens_col`` reuses an already-tokenized
    array column instead (the share-one-tokenize-scan discipline)."""
    toks = (F.col(tokens_col) if tokens_col is not None
            else T.tokens(text_col))
    toked = df.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                      toks.alias("__toks"))
    nt = F.size("__toks")
    starts = F.when(nt >= n, F.sequence(F.lit(1), nt - n + 1)) \
              .otherwise(F.array().cast("array<int>"))
    wins = toked.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.posexplode(F.transform(
            starts,
            lambda s: F.xxhash64(F.slice(F.col("__toks"), s, n))))
        .alias("start", "__w"))
    return toked, wins


def token_windows_multi(df: DataFrame, *, ns: "Sequence[int]",
                        id_col: str = "doc_id", text_col: str = "text",
                        tokens_col: str | None = None,
                        extra_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """ONE tokenize + ONE explode producing the sliding-window
    occurrence rows for SEVERAL window sizes at once — the tagged union
    of :func:`_token_windows` at each ``n`` in ``ns``. Output
    ``(id, *extra_cols, __n, start, __w)`` where ``__n`` is the window
    size, ``start`` the 0-based token offset and ``__w`` the xxhash64
    window key, all bit-identical to the per-size frames.

    Why: composite reports (the ``text_fingerprints`` gate) run span
    dedup, boilerplate stripping, ExactSubstr and decontamination over
    the SAME corpus at different window lengths — each re-scanning and
    re-tokenizing the corpus for its own window build (guide §2.3:
    shuffle/scan the bytes once, tag, don't repeat). One pass builds
    all the arrays off one token split; the size tag is recovered from
    the explode position against the running array lengths, a
    codegen'd CASE chain (the ``_tagged_gram_explode`` discipline —
    per-element struct transforms run interpreted and slower). Callers
    persist the result and carve per-size frames with
    :func:`window_slice`."""
    sizes = sorted({int(n) for n in ns})
    if not sizes or sizes[0] < 1:
        raise ValueError(f"ns must be a non-empty set of ints >= 1, "
                         f"got {ns!r}")
    toks = (F.col(tokens_col) if tokens_col is not None
            else T.tokens(text_col))
    base = df.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                     toks.alias("__toks"))
    nt = F.size("__toks")

    # one-positional-arg lambda per size (a `n=n` default would make
    # pyspark treat it as the two-arg (element, index) HOF form and
    # bind n to the INDEX column)
    def _whash(n: int):
        return lambda s: F.xxhash64(F.slice(F.col("__toks"), s, n))

    for n in sizes:
        starts = F.when(nt >= n, F.sequence(F.lit(1), nt - n + 1)) \
                  .otherwise(F.array().cast("array<int>"))
        base = base.withColumn(f"__wa{n}",
                               F.transform(starts, _whash(n)))
    cat = F.concat(*[F.col(f"__wa{n}") for n in sizes])
    bands = [F.size(f"__wa{n}").alias(f"__s{n}") for n in sizes[:-1]]
    g = base.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                    *bands, F.posexplode(cat).alias("__p", "__w"))
    running = None
    tag = None
    off = None
    prev = F.lit(0)
    for n in sizes[:-1]:
        s = F.col(f"__s{n}")
        running = s if running is None else running + s
        cond = F.col("__p") < running
        tag = (F.when(cond, F.lit(n)) if tag is None
               else tag.when(cond, F.lit(n)))
        o = F.col("__p") - prev
        off = F.when(cond, o) if off is None else off.when(cond, o)
        prev = running
    tag = (F.lit(sizes[-1]) if tag is None
           else tag.otherwise(F.lit(sizes[-1])))
    off = ((F.col("__p") - prev) if off is None
           else off.otherwise(F.col("__p") - prev))
    out = g.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                   tag.alias("__n"), off.alias("start"), F.col("__w"))
    return _stamp_spans(out, producer="token_windows_multi",
                        ns=tuple(sizes), id_col=id_col,
                        extra_cols=tuple(extra_cols))


def window_slice(wall: DataFrame, n: int, *, id_col: str = "doc_id",
                 extra_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Carve the size-``n`` windows frame ``(id, *extra_cols, start,
    __w)`` out of a :func:`token_windows_multi` union — row-identical
    to ``_token_windows(df, n=n)``'s occurrence frame, so the span
    consumers' ``wins=`` hooks accept it. Validates the union's stamp
    (a size the union never built would silently slice empty)."""
    n = int(n)
    meta = getattr(wall, "_fs_spans_meta", None)
    if meta is not None:
        if meta.get("producer") != "token_windows_multi":
            raise ValueError(
                "window_slice expects a token_windows_multi frame, got "
                f"producer={meta.get('producer')!r}")
        if n not in meta.get("ns", ()):
            raise ValueError(
                f"window_slice(n={n}): the union was built for sizes "
                f"{meta.get('ns')!r} — slicing an unbuilt size would "
                "be silently empty")
        missing = [c for c in extra_cols
                   if c not in meta.get("extra_cols", ())]
        if missing:
            raise ValueError(
                f"window_slice extra_cols {missing!r} were not carried "
                f"by the union (has {meta.get('extra_cols')!r})")
    out = (wall.filter(F.col("__n") == n)
           .select(F.col(id_col), *[F.col(c) for c in extra_cols],
                   "start", "__w"))
    return _stamp_spans(out, producer="token_windows", n=n,
                        id_col=id_col, extra_cols=tuple(extra_cols))


def _check_wins(wins: DataFrame, consumer: str, *, n: int, id_col: str,
                extra_cols: "tuple[str, ...]" = ()) -> None:
    """Validate a ``wins=`` occurrence frame against the consumer's
    window parameters (the :func:`_check_spans` discipline)."""
    _check_spans(wins, consumer, producer="token_windows", n=int(n),
                 id_col=id_col, extra_cols=tuple(extra_cols))


def duplicate_spans(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 10) -> DataFrame:
    """Corpus-global exact duplicate n-token spans (the substring-dedup
    candidate set of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — suffix-array ExactSubstr
    re-expressed as a relational plan over sliding token windows).

    Every n-token window whose text occurs more than once in the corpus
    marks all occurrences EXCEPT the first (ordered by ``(id, start)``).
    Output: ``(id, start)`` — the 0-based token offset of each removable
    window occurrence. Overlapping windows are expected; consumers union
    their covered positions (:func:`remove_duplicate_spans`).

    Scale shape vs a suffix array: the window self-collision is ONE
    aggregation keyed by window text (map-side partial combine absorbs
    hot boilerplate windows) followed by ONE equi-join back on the window
    text to recover the non-first occurrences — shuffle ∝ windows, never
    O(n²) pairs, no global sort. Both join inputs descend from the tiny
    pre-explode scan, so their STATIC size estimates invite a
    catastrophic broadcast of a billion-window side (NOTES.md trap #2);
    the ``shuffle_hash`` hint on the (smaller, deduplicated) first-
    occurrence side pins a shuffled hash join with it as build.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if id_col in ("start", "pos", "n_tokens", "n_dup_tokens"):
        raise ValueError(f"id_col {id_col!r} collides with a span-dedup "
                         "output column; rename it first")
    _, wins = _token_windows(df, id_col=id_col, text_col=text_col, n=n)
    return _span_marks(wins, id_col=id_col)


def _span_marks(wins: DataFrame, *, id_col: str) -> DataFrame:
    """Non-first duplicate window occurrences from a windows frame
    (shared by :func:`duplicate_spans` and
    :func:`remove_duplicate_spans` so the corpus tokenizes once)."""
    first = (wins.groupBy("__w")
             .agg(F.min(F.struct(F.col(id_col), F.col("start")))
                  .alias("__first"),
                  F.count("*").alias("__cnt"))
             .filter(F.col("__cnt") > 1)
             .select("__w", "__first"))
    return (wins.join(first.hint("shuffle_hash"), "__w")
            .filter(~((F.col(id_col) == F.col(f"__first.{id_col}"))
                      & (F.col("start") == F.col("__first.start"))))
            .select(id_col, "start"))


def remove_duplicate_spans(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 10,
                           drop_empty_docs: bool = False,
                           tokens_col: str | None = None,
                           wins: DataFrame | None = None) -> DataFrame:
    """Remove corpus-global exact duplicate n-token spans from each
    document (Lee et al. 2022 ExactSubstr dedup, relational form): every
    token covered by a non-first duplicate window (:func:`duplicate_spans`)
    is dropped, and the document is reassembled from the survivors in
    order. Unlike whole-document or chunk dedup this catches duplicated
    PASSAGES at any alignment — the dominant duplication mode in crawled
    corpora — while keeping each document's unique remainder.

    Output: ``(id, text, n_tokens, n_dup_tokens)`` with
    ``n_dup_tokens`` = tokens removed; cleaned ``text`` is ``''`` when
    everything was duplicated (kept unless ``drop_empty_docs``).

    Scale shape: :func:`duplicate_spans` (shuffle ∝ windows) → explode
    each removable window into its n positions → distinct → one
    ``(id, pos)`` anti-join against the posexploded tokens → per-doc
    rebuild agg. Interval merging of overlapping windows falls out of the
    position-set distinct — no per-doc sort-and-merge loop. All joins and
    aggs are keyed equi-operations; shuffle ∝ n·duplicated-windows +
    tokens, never pairs.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if id_col in ("start", "pos", "n_tokens", "n_dup_tokens"):
        raise ValueError(f"id_col {id_col!r} collides with a span-dedup "
                         "output column; rename it first")
    # ``wins`` reuses a precomputed window-occurrence frame (one
    # token_windows_multi pass shared across a composite's span
    # consumers — the share-one-scan discipline, like ``tokens_col``)
    if wins is not None:
        _check_wins(wins, "remove_duplicate_spans", n=n, id_col=id_col)
        toked, _ = _token_windows(df, id_col=id_col, text_col=text_col,
                                  n=n, tokens_col=tokens_col)
    else:
        toked, wins = _token_windows(df, id_col=id_col,
                                     text_col=text_col, n=n,
                                     tokens_col=tokens_col)
    dup = _span_marks(wins, id_col=id_col)
    covered = (dup.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("start"),
                             F.col("start") + F.lit(n - 1))).alias("pos"))
        .distinct())
    return _rebuild_without_positions(
        toked, covered, id_col=id_col, text_col=text_col,
        drop_empty_docs=drop_empty_docs, removed_col="n_dup_tokens")


def _exsub_marks(wins: DataFrame, *, id_col: str,
                 keep: str) -> DataFrame:
    """``(id, start)`` duplicated window occurrences under the
    ExactSubstr keep policy — shared by :func:`exact_substring_spans`
    and :func:`remove_exact_substrings` so the corpus tokenizes once.

    ``keep="none"`` marks EVERY occurrence of a window whose text
    occurs more than once corpus-wide (the suffix-array duplication
    criterion: total occurrences, within-document repeats included);
    ``keep="first"`` exempts the globally first occurrence per window
    text — exactly :func:`_span_marks`."""
    if keep == "first":
        return _span_marks(wins, id_col=id_col)
    if keep != "none":
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    dupw = (wins.groupBy("__w")
            .agg(F.count("*").alias("__cnt"))
            .filter(F.col("__cnt") > 1)
            .select("__w"))
    # both sides descend from the tiny pre-explode scan — pin the
    # shuffled hash join with the (smaller, distinct-window) build side
    # (NOTES.md trap #2)
    return (wins.join(dupw.hint("shuffle_hash"), "__w")
            .select(id_col, "start"))


def _merge_window_runs(marks: DataFrame, *, id_col: str,
                       n: int) -> DataFrame:
    """Per-document maximal merged coverage intervals ``(id, start,
    end)`` from ``(id, start)`` n-token window marks — gaps-and-islands
    over window STARTS (no position explode): starts are ascending per
    document, so a window overlaps-or-abuts the running interval iff
    its start is within ``n`` of the previous start, and each island
    covers ``[min(start), max(start) + n)`` exactly.

    The one per-document sort this needs runs over DUPLICATED window
    starts only (≪ tokens for any corpus worth deduplicating), and the
    partition key is the document id — bounded by document length, so
    no skew amplification at 100 TB."""
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("start")
    gap = F.when(F.col("start") - F.lag("start").over(w) > n,
                 F.lit(1)).otherwise(F.lit(0))
    return (marks.withColumn("__isl",
                             F.sum(gap).over(
                                 w.rowsBetween(W.unboundedPreceding, 0)))
            .groupBy(id_col, "__isl")
            .agg(F.min("start").alias("start"),
                 (F.max("start") + F.lit(n)).alias("end"))
            .select(id_col, "start", "end"))


def _stamp_spans(spans: DataFrame, **meta) -> DataFrame:
    """Stamp a spans frame with its producer parameters (Python-side
    attribute) so the ``spans=`` reuse hooks can raise on a mismatched
    frame instead of silently mis-removing (r10 verdict #6). The stamp
    does not survive a parquet round-trip — unstamped frames fall back
    to the documented same-parameters contract."""
    spans._fs_spans_meta = meta
    return spans


def _check_spans(spans: DataFrame, consumer: str, **expect) -> None:
    """Raise when a stamped ``spans=`` frame was produced with
    different parameters than the removal call expects."""
    meta = getattr(spans, "_fs_spans_meta", None)
    if meta is None:
        return
    bad = {k: (meta.get(k), v) for k, v in expect.items()
           if meta.get(k) != v}
    if bad:
        detail = ", ".join(f"{k}: spans={got!r} vs call={want!r}"
                           for k, (got, want) in sorted(bad.items()))
        raise ValueError(
            f"{consumer}(spans=...) got a spans frame produced with "
            f"different parameters ({detail}); a mismatched frame "
            "would silently mis-remove — recompute the spans with the "
            "call's parameters or fix the call")


def exact_substring_spans(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text", min_len: int = 50,
                          keep: str = "none",
                          tokens_col: str | None = None,
                          wins: DataFrame | None = None) -> DataFrame:
    """Maximal per-document spans covered by EXACT duplicated
    substrings of ANY length ≥ ``min_len`` tokens — the suffix-array
    ExactSubstr dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499 §4.1) re-expressed
    as a relational plan, EXACT at token granularity, arbitrary match
    length included.

    Why fixed windows suffice for arbitrary-length semantics: a token
    position lies inside some duplicated substring of length ≥ L iff
    it lies inside some duplicated L-token window — every L-window of
    a duplicated substring is itself duplicated (at the matching
    offset of the other copy), and a duplicated L-window IS a
    duplicated substring of length L. So the COVERED-POSITION SET this
    computes equals what a suffix array marks at threshold L: exact
    recall, exact precision, no approximation. What the window form
    does NOT enumerate is the distinct maximal repeats themselves: the
    output intervals are per-document maximal UNIONS of overlapping /
    abutting matches (gaps-and-islands over duplicated window starts),
    so one interval may span several repeats with different partners
    and need not itself occur twice in full — the right granularity
    for removal, stated here because it is the one semantic difference
    from a suffix-tree maximal-repeat enumeration.

    Duplication counts TOTAL occurrences corpus-wide (within-document
    repeats count, matching suffix-array semantics). ``keep="none"``
    covers every occurrence (the released ExactSubstr tool's behavior:
    a duplicated span is template, drop it everywhere);
    ``keep="first"`` exempts each window text's globally first
    occurrence by ``(id, start)`` — the keep-one-copy policy, matching
    :func:`duplicate_spans`.

    Output ``(id, start, end)`` intervals, 0-based token offsets,
    end-exclusive, disjoint per document, each of length ≥ min_len.

    Scale shape: one window-text agg (map-side combine absorbs hot
    windows) → one equi-join back → per-DOC window-function merge over
    duplicated starts only. Shuffle ∝ windows; no pairs, no global
    sort, no position explode.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if id_col in ("start", "end"):
        raise ValueError(f"id_col {id_col!r} collides with an "
                         "ExactSubstr output column; rename it first")
    # ``wins`` reuses a precomputed window-occurrence frame (one
    # token_windows_multi pass shared across a composite — the
    # share-one-scan discipline, like ``tokens_col``)
    if wins is not None:
        _check_wins(wins, "exact_substring_spans", n=min_len,
                    id_col=id_col)
    else:
        _, wins = _token_windows(df, id_col=id_col, text_col=text_col,
                                 n=min_len, tokens_col=tokens_col)
    marks = _exsub_marks(wins, id_col=id_col, keep=keep)
    return _stamp_spans(
        _merge_window_runs(marks, id_col=id_col, n=min_len),
        producer="exact_substring_spans", min_len=min_len, keep=keep,
        id_col=id_col)


def remove_exact_substrings(df: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text",
                            min_len: "int | str" = 50,
                            keep: str = "none",
                            drop_empty_docs: bool = False,
                            tokens_col: str | None = None,
                            spans: DataFrame | None = None) -> DataFrame:
    """Remove every token covered by an exact duplicated substring of
    length ≥ ``min_len`` (:func:`exact_substring_spans` — the Lee et
    al. 2022 ExactSubstr removal, exact at token granularity for
    matches of ARBITRARY length) and reassemble each document from the
    survivors in order.

    Output ``(id, text, n_tokens, n_exsub_tokens)``; cleaned ``text``
    is ``''`` when the whole document was duplicated material. With
    ``keep="first"`` the covered set equals
    :func:`remove_duplicate_spans` at ``n=min_len`` (that function's
    per-window explode+distinct path is kept for streaming-shaped
    reuse); the default ``keep="none"`` drops ALL occurrences.

    Scale shape: the interval merge happens BEFORE the position
    explode — disjoint merged intervals explode to exactly the covered
    positions, so no distinct is needed and the exploded row count is
    the true removed-token count, not windows × min_len.

    ``spans`` reuses a precomputed :func:`exact_substring_spans` frame
    (the share-one-scan discipline, like ``tokens_col``): a caller
    needing BOTH the interval report and the removal passes the spans
    frame here so the two plans share one identical spans subtree —
    Spark's exchange reuse then evaluates the heavy window-agg half
    once per action instead of twice (review catch on the gate query).
    The frame must come from the same corpus with the same ``min_len``
    and ``keep``. Frames still carrying their in-session
    :func:`exact_substring_spans` stamp are VALIDATED (mismatched
    ``min_len``/``keep``/``id_col``/producer raises); an unstamped
    frame (e.g. round-tripped through parquet) falls back to the
    documented same-parameters contract — mismatches silently
    mis-remove.

    ``min_len="auto"`` resolves the threshold from the corpus's own
    removal-rate curve (:func:`recommend_min_len` over the default
    doubling grid) before building the plan — NB this makes the call
    EAGER (the |lengths|-row profile runs immediately) and is mutually
    exclusive with ``spans`` (a precomputed frame already fixed its
    min_len). When the corpus has no duplication at any probe length
    the removal would be a no-op scan, so 'auto' raises with the knee
    report in the message rather than silently scanning 100 TB for
    nothing."""
    if min_len == "auto":
        if spans is not None:
            raise ValueError("min_len='auto' cannot combine with a "
                             "precomputed spans frame (its min_len is "
                             "already fixed); resolve the knee first")
        rec = recommend_min_len(df, id_col=id_col, text_col=text_col,
                                tokens_col=tokens_col)
        if rec["min_len"] is None:
            raise ValueError(
                "min_len='auto' found no duplication at any probe "
                f"length (curve: {rec['curve']}); removal would be a "
                "no-op — skip the pass or pass an explicit min_len")
        min_len = rec["min_len"]
    # exact int check: bool is an int subclass (True would silently run
    # at window length 1 and gut the corpus), and a typo'd string like
    # 'Auto' should point at the supported spelling
    if type(min_len) is not int or min_len < 1:
        raise ValueError(f"min_len must be an int >= 1 or 'auto', "
                         f"got {min_len!r}")
    if id_col in ("start", "end", "pos", "n_tokens", "n_exsub_tokens"):
        raise ValueError(f"id_col {id_col!r} collides with an "
                         "ExactSubstr output column; rename it first")
    if spans is not None:
        _check_spans(spans, "remove_exact_substrings",
                     producer="exact_substring_spans", min_len=min_len,
                     keep=keep, id_col=id_col)
    toked, wins = _token_windows(df, id_col=id_col, text_col=text_col,
                                 n=min_len, tokens_col=tokens_col)
    if spans is None:
        marks = _exsub_marks(wins, id_col=id_col, keep=keep)
        spans = _merge_window_runs(marks, id_col=id_col, n=min_len)
    covered = spans.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("start"),
                             F.col("end") - F.lit(1))).alias("pos"))
    return _rebuild_without_positions(
        toked, covered, id_col=id_col, text_col=text_col,
        drop_empty_docs=drop_empty_docs, removed_col="n_exsub_tokens")


def duplication_profile(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        lengths: "tuple[int, ...]" = (1, 2, 4, 8, 16,
                                                      32, 64),
                        tokens_col: str | None = None) -> DataFrame:
    """Corpus duplication SPECTRUM — the tuning diagnostic to run
    before committing to a dedup recipe: for each probe window length
    ``L`` (doubling by default), how much of the corpus is duplicated
    material at that granularity.

    Output, one row per length, ordered ascending:

    - ``length`` — the probe L;
    - ``n_windows`` — total L-token window occurrences corpus-wide;
    - ``n_dup_windows`` — distinct window TEXTS occurring more than
      once (total occurrences, within-document repeats included — the
      suffix-array duplication criterion);
    - ``n_dup_occurrences`` — total occurrences of those texts;
    - ``n_covered_tokens`` — token positions inside ≥1 duplicated
      L-window. By the ExactSubstr coverage equivalence
      (:func:`exact_substring_spans`) this EQUALS the tokens that
      ``remove_exact_substrings(min_len=L, keep='none')`` would
      remove — so ``n_covered_tokens / n_tokens`` as a function of L
      is exactly the removal-rate curve, and the knee of that curve is
      the principled ``min_len``/``n`` choice (Lee et al. 2022 pick 50
      for crawled corpora; a corpus's own curve says whether that is
      conservative or aggressive for it);
    - ``n_tokens`` — corpus token count (constant across rows).

    Scale shape: ONE tokenize + window-explode pass emits EVERY
    length's windows as ``(length, start, xxhash64(window))`` structs
    (the corpus scans once, not |lengths| times), then one aggregation
    keyed ``(length, __w)``, one equi-join back, and one
    gaps-and-islands merge partitioned ``(length, id)`` compute the
    duplication stats in a single plan; ``n_windows``/``n_tokens``
    are ARITHMETIC on per-doc token counts (Σ max(nt−L+1, 0), Σ nt),
    one tiny explode-free aggregate rather than two more corpus
    passes (review catch). Shuffle ∝ windows × |lengths|; no pairs,
    no position explode (coverage sums merged intervals).
    """
    from itertools import chain

    from pyspark.sql import Window as W

    if not lengths or any(n < 1 for n in lengths):
        raise ValueError(f"lengths must be positive, got {lengths!r}")
    if id_col in ("start", "length") or id_col.startswith("__"):
        raise ValueError(f"id_col {id_col!r} collides with an internal "
                         "column; rename it first")
    ls = sorted(set(int(x) for x in lengths))
    toks = (F.col(tokens_col) if tokens_col is not None
            else T.tokens(text_col))
    toked = df.select(F.col(id_col), toks.alias("__toks"))
    nt = F.size("__toks")

    def _win_arr(n: int):
        starts = F.when(nt >= n, F.sequence(F.lit(1), nt - n + 1)) \
                  .otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s: F.struct(
                F.lit(n).cast("int").alias("length"),
                (s - 1).cast("int").alias("start"),
                F.xxhash64(F.slice(F.col("__toks"), s, n))
                .alias("__w")))

    wins = (toked.select(
        F.col(id_col),
        F.explode(F.flatten(F.array(*[_win_arr(n) for n in ls])))
        .alias("__win"))
        .select(F.col(id_col), "__win.length", "__win.start",
                "__win.__w"))
    dupw = (wins.groupBy("length", "__w")
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1))
    dstats = dupw.groupBy("length").agg(
        F.count("*").cast("long").alias("n_dup_windows"),
        F.sum("__c").cast("long").alias("n_dup_occurrences"))
    marks = (wins.join(dupw.select("length", "__w")
                       .hint("shuffle_hash"), ["length", "__w"])
             .select("length", F.col(id_col), "start"))
    w = W.partitionBy("length", id_col).orderBy("start")
    gap = F.when(F.col("start") - F.lag("start").over(w)
                 > F.col("length"), F.lit(1)).otherwise(F.lit(0))
    cov = (marks.withColumn(
        "__isl", F.sum(gap).over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("length", id_col, "__isl")
        .agg(F.min("start").alias("__s"),
             (F.max("start") + F.col("length")).alias("__e"))
        .groupBy("length")
        .agg(F.sum(F.col("__e") - F.col("__s")).cast("long")
             .alias("n_covered_tokens")))
    per_len = toked.agg(
        F.coalesce(F.sum(nt), F.lit(0)).cast("long").alias("n_tokens"),
        *[F.coalesce(F.sum(F.greatest(nt - F.lit(n) + 1, F.lit(0))),
                     F.lit(0)).cast("long").alias(f"__nw{n}")
          for n in ls]) \
        .select("n_tokens",
                F.explode(F.create_map(*chain.from_iterable(
                    (F.lit(n).cast("int"), F.col(f"__nw{n}"))
                    for n in ls))).alias("length", "n_windows"))
    out = (per_len.join(dstats, "length", "left")
           .join(cov, "length", "left")
           .select("length", "n_windows",
                   F.coalesce("n_dup_windows", F.lit(0)).cast("long")
                   .alias("n_dup_windows"),
                   F.coalesce("n_dup_occurrences", F.lit(0))
                   .cast("long").alias("n_dup_occurrences"),
                   F.coalesce("n_covered_tokens", F.lit(0))
                   .cast("long").alias("n_covered_tokens"),
                   "n_tokens"))
    return out.orderBy("length")


def recommend_min_len(df: DataFrame | None = None, *,
                      profile: DataFrame | None = None,
                      id_col: str = "doc_id", text_col: str = "text",
                      tokens_col: str | None = None,
                      lengths: "tuple[int, ...]" = (2, 4, 8, 16, 32,
                                                    64, 128),
                      flat_tol: float = 0.005) -> dict:
    """Turn :func:`duplication_profile`'s removal-rate curve into a
    recommended ``min_len`` for :func:`remove_exact_substrings` — the
    knee of the curve, found by max-distance-to-chord (the Kneedle
    construction on the normalized ``(log2 L, removal_rate)`` points).

    Rationale: ``n_covered_tokens / n_tokens`` as a function of L is
    EXACTLY the fraction ``remove_exact_substrings(min_len=L,
    keep='none')`` deletes (the coverage equivalence documented on the
    profile). Small L removes natural n-gram collisions along with real
    duplication (the steep head of the curve); the curve flattens where
    collisions die out and only genuinely duplicated material remains —
    the smallest L on that plateau removes the duplication with the
    least collateral. Lee et al. 2022 pick 50 for crawled corpora; a
    corpus's own knee says whether 50 is conservative or aggressive
    for it.

    Pass either ``df`` (the profile is computed over ``lengths``) or a
    precomputed ``profile`` frame. The profile is |lengths| rows — the
    driver collect is bounded by construction.

    Returns ``{"min_len": L | None, "removal_rate": r,
    "curve": [(length, removal_rate), ...]}``:

    - no duplication anywhere (all rates ≈ 0) → ``min_len=None``
      (nothing to remove; running ExactSubstr would be a no-op scan);
    - flat curve (head and tail within ``flat_tol``) → the LARGEST
      probed L: every probe removes the same mass, so take the one
      demanding the longest — most conservative — match evidence;
    - otherwise the maximum-curvature point: the interior probe
      furthest (in absolute distance) from the first→last chord. A
      collision-head-then-plateau curve runs BELOW its chord and the
      pick is the plateau start (aggressive edge: smallest L past the
      collision regime); a plateau-then-cliff curve (all duplication in
      blocks of some length B) runs ABOVE it and the pick is the cliff
      edge — the largest L still catching the blocks. Endpoints anchor
      the chord and cannot be knees, so probe past the expected knee on
      both sides.
    """
    import math

    if (df is None) == (profile is None):
        raise ValueError("pass exactly one of df or profile")
    if profile is None:
        profile = duplication_profile(df, id_col=id_col,
                                      text_col=text_col,
                                      tokens_col=tokens_col,
                                      lengths=lengths)
    rows = sorted(profile.collect(), key=lambda r: r["length"])
    if len(rows) < 3:
        raise ValueError("recommend_min_len needs >= 3 probe lengths "
                         f"to locate a knee, got {len(rows)}")
    curve = [(int(r["length"]),
              (r["n_covered_tokens"] / r["n_tokens"])
              if r["n_tokens"] else 0.0) for r in rows]
    out = {"curve": curve}
    rates = [c[1] for c in curve]
    if max(rates) <= flat_tol:
        return {**out, "min_len": None, "removal_rate": 0.0}
    if rates[0] - rates[-1] <= flat_tol:
        return {**out, "min_len": curve[-1][0],
                "removal_rate": curve[-1][1]}
    # normalize to the unit square (x = log2 L — the doubling grid
    # becomes uniform; y = removal rate, decreasing by the coverage
    # monotonicity) and take the interior point of max |distance| to
    # the first→last chord — the max-curvature corner
    xs = [math.log2(c[0]) for c in curve]
    x0, x1 = xs[0], xs[-1]
    y0, y1 = rates[0], rates[-1]
    best_i, best_d = None, 0.0
    for i in range(1, len(curve) - 1):
        xn = (xs[i] - x0) / (x1 - x0)
        yn = (rates[i] - y1) / (y0 - y1)
        d = abs((1.0 - xn) - yn)     # |chord height - curve height|
        if d > best_d:
            best_i, best_d = i, d
    if best_i is None:
        # linear-in-normalized-space curve: no distinguished knee —
        # take the largest L still removing real mass (conservative)
        cands = [i for i, r in enumerate(rates) if r > flat_tol]
        best_i = cands[-1] if cands else len(curve) - 1
    return {**out, "min_len": curve[best_i][0],
            "removal_rate": curve[best_i][1]}


def longest_duplicated_substring(df: DataFrame, *,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 tokens_col: str | None = None,
                                 max_len: int | None = None) -> dict:
    """Length (in tokens) of the LONGEST substring occurring more than
    once corpus-wide, plus one witness occurrence — the "how bad is
    the worst duplication" diagnostic that pairs with
    :func:`duplication_profile`'s spectrum (the profile tells you the
    mass at each length; this tells you the tail's end).

    Returns ``{"length": L, "id": witness_doc, "start": offset,
    "n_occurrences": count}`` — or ``{"length": 0, ...}`` when no
    token occurs twice. The witness is deterministic (min
    ``(id, start)`` among the most-frequent longest windows).

    Driver-adaptive search, NOT one declarative plan: "some L-window
    occurs twice" is monotone in L (any window of a duplicated
    substring is duplicated — the ExactSubstr coverage-equivalence
    direction), so exponential doubling finds an upper bound in
    O(log L*) probe jobs and binary search pins L* in O(log L*) more.
    Each probe is ONE window aggregation + ``limit(1)`` (shuffle ∝
    windows at that length); the max probed length is bounded by the
    corpus's longest document, and ``max_len`` caps it explicitly for
    corpora with pathological near-total duplication. Because the
    loop is driver-adaptive there is no single-SQL twin; the probe
    predicate itself (duplicated L-window existence) is the
    oracle-gated :func:`duplication_profile` machinery, and the
    result is pinned against a brute-force oracle in pytest.
    """
    if id_col in ("start", "length") or id_col.startswith("__"):
        raise ValueError(f"id_col {id_col!r} collides with an internal "
                         "column; rename it first")
    toks = (F.col(tokens_col) if tokens_col is not None
            else T.tokens(text_col))
    # the probe loop re-reads the tokenized corpus O(log L*) times —
    # cache it for the loop's lifetime so each probe is one window agg
    # over the cached tokens, not tokenize + agg (at 100 TB, 2·log L*
    # corpus scans vs log L* is the difference between a diagnostic and
    # a job); released in the finally whatever path returns (r11
    # verdict #6)
    toked = df.select(F.col(id_col), toks.alias("__toks")).cache()
    try:
        longest = toked.agg(F.coalesce(F.max(F.size("__toks")),
                                       F.lit(0))).first()[0]
        cap = min(longest, max_len) if max_len else longest
        empty = {"length": 0, "id": None, "start": None,
                 "n_occurrences": 0}
        if cap < 1:
            return empty

        def _dup_exists(n: int) -> bool:
            _, wins = _token_windows(toked, id_col=id_col,
                                     text_col="__toks", n=n,
                                     tokens_col="__toks")
            return bool(wins.groupBy("__w")
                        .agg(F.count("*").alias("__c"))
                        .filter(F.col("__c") > 1).limit(1).count())

        if not _dup_exists(1):
            return empty
        # exponential upper bound, then binary search on the monotone
        # predicate: lo always duplicated, hi never (or past the cap)
        lo = 1
        while lo * 2 <= cap and _dup_exists(lo * 2):
            lo *= 2
        hi = min(lo * 2, cap + 1)
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if _dup_exists(mid):
                lo = mid
            else:
                hi = mid
        _, wins = _token_windows(toked, id_col=id_col, text_col="__toks",
                                 n=lo, tokens_col="__toks")
        witness = (wins.groupBy("__w")
                   .agg(F.count("*").alias("__c"),
                        F.min(F.struct(F.col(id_col).alias("i"),
                                       F.col("start").alias("s")))
                        .alias("__first"))
                   .filter(F.col("__c") > 1)
                   .orderBy(F.col("__c").desc(), F.col("__first").asc())
                   .limit(1).first())
        return {"length": lo, "id": witness["__first"]["i"],
                "start": witness["__first"]["s"],
                "n_occurrences": witness["__c"]}
    finally:
        toked.unpersist()


def select_canonical(df: DataFrame, clusters: DataFrame, *,
                     id_col: str = "doc_id",
                     cluster_col: str = "cluster_id",
                     policy: str = "min_id", text_col: str = "text",
                     score_col: str | None = None) -> DataFrame:
    """``(cluster_id, canonical_id)`` — ONE representative per near-dup
    cluster, by policy:

    - ``"min_id"`` — the engine's legacy convention (deterministic,
      content-blind);
    - ``"longest"`` — keep the member with the most characters
      (the RefinedWeb/CCNet convention: near-dup clusters usually pair
      a full page with truncated copies, and min-id throws away content
      at random); ties break to min id;
    - ``"best"`` — keep the max-``score_col`` member (compose with the
      quality classifier / perplexity scores); ties break to min id.

    One map-side-combinable ``min(struct(...))`` aggregate over cluster
    members — the keep-first discipline, never a window over the
    corpus. Feed :func:`drop_near_duplicates` to apply it."""
    if policy not in ("min_id", "longest", "best"):
        raise ValueError(
            f"policy must be 'min_id', 'longest' or 'best', got {policy!r}")
    if policy == "best" and score_col is None:
        raise ValueError("policy='best' requires score_col")
    # the id keeps its NATURAL type inside the ordering struct — a
    # cast('long') here turned string ids into NULLs, making
    # drop_near_duplicates a silent no-op (review catch)
    idc = F.col(id_col)
    if policy == "min_id":
        # content-blind: no df column feeds the ordering, so skip the
        # corpus-sized membership join outright (cluster members are
        # drawn from df by every producer here — dedup_clusters over
        # pairs over df)
        return (clusters.groupBy(cluster_col)
                .agg(F.min("id").alias("canonical_id")))
    if policy == "longest":
        # NULL text counts 0 chars (coalesce — a NULL inside the struct
        # would sort engine-dependently)
        key = F.struct(
            (-F.length(F.coalesce(F.col(text_col), F.lit(""))))
            .cast("long").alias("k"), idc.alias("cid"))
    else:
        # an unscored (NULL) member must LOSE, not win: NULL struct
        # fields sort FIRST under min, so coalesce the negated score
        # to +inf (review catch — the inverse of 'keep the best')
        key = F.struct(
            F.coalesce((-F.col(score_col)).cast("double"),
                       F.lit(float("inf"))).alias("k"),
            idc.alias("cid"))
    members = clusters.select(F.col("id").alias(id_col), cluster_col) \
        .join(df.select(id_col, key.alias("__k")), id_col)
    return (members.groupBy(cluster_col)
            .agg(F.min("__k").alias("__m"))
            .select(cluster_col,
                    F.col("__m.cid").alias("canonical_id")))


def drop_near_duplicates(df: DataFrame, clusters: DataFrame, *,
                         id_col: str = "doc_id",
                         cluster_col: str = "cluster_id",
                         policy: str = "min_id", text_col: str = "text",
                         score_col: str | None = None) -> DataFrame:
    """The corpus minus every non-canonical cluster member — the "keep
    one per near-dup group" resolution under a :func:`select_canonical`
    policy. Singletons (rows in no cluster) always survive; the loser
    set is cluster-member-sized, so the anti-join's build side stays
    tiny relative to the corpus."""
    canon = select_canonical(df, clusters, id_col=id_col,
                             cluster_col=cluster_col, policy=policy,
                             text_col=text_col, score_col=score_col)
    losers = (clusters.join(canon, cluster_col)
              .filter(F.col("id") != F.col("canonical_id"))
              .select(F.col("id").alias(id_col)))
    return df.join(losers.hint("shuffle_hash"), id_col, "left_anti")


def boilerplate_spans(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", group_col: str = "source",
                      n: int = 10, min_docs: int = 2,
                      min_doc_frac: float = 0.0,
                      tokens_col: str | None = None) -> DataFrame:
    """Per-group frequency-threshold boilerplate spans (the CCNet /
    RefinedWeb move: headers, footers, cookie banners, navigation —
    text repeated across many of a DOMAIN's pages is template, not
    content): every occurrence of an n-token window whose text appears
    in ≥ ``min_docs`` distinct documents AND ≥ ``min_doc_frac`` of the
    group's documents marks for removal.

    The semantic sibling of :func:`duplicate_spans` with the opposite
    keep rule: passage dedup keeps the FIRST occurrence (the content is
    real, the copies are redundant); boilerplate removal drops ALL
    occurrences (the template was never content). Output ``(group, id,
    start)`` window marks; feed :func:`remove_boilerplate` to rebuild.

    Scale shape: windows → one (group, window, id)-distinct + count
    aggregation (map-side combine absorbs hot template windows) →
    per-group doc totals joined back (a #groups-row frame — AQE
    broadcasts it while it fits; domains number millions at crawl
    scale, still dimension-sized) → threshold → ONE equi-join back on
    (group, window). Shuffle ∝ windows, never pairs; no global sort.
    ``min_doc_frac`` is evaluated exactly (distinct-doc counts) — at
    100 TB swap the distinct for approx_count_distinct upstream if the
    window table dominates, at the price of oracle exactness."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (a 1-doc 'template' "
                         f"is just content), got {min_docs}")
    if not 0.0 <= min_doc_frac <= 1.0:
        raise ValueError(
            f"min_doc_frac must be in [0, 1], got {min_doc_frac}")
    _, wins = _token_windows(df, id_col=id_col, text_col=text_col, n=n,
                             tokens_col=tokens_col,
                             extra_cols=(group_col,))
    return _boilerplate_marks(df, wins, id_col=id_col,
                              group_col=group_col, min_docs=min_docs,
                              min_doc_frac=min_doc_frac)


def _boilerplate_marks(df: DataFrame, wins: DataFrame, *, id_col: str,
                       group_col: str, min_docs: int,
                       min_doc_frac: float) -> DataFrame:
    """(group, id, start) marks from a grouped windows frame — shared
    by :func:`boilerplate_spans` and :func:`remove_boilerplate` so the
    threshold logic is single-source."""
    wdocs = (wins.select(group_col, "__w", id_col).distinct()
             .groupBy(group_col, "__w")
             .agg(F.count("*").alias("__ndocs")))
    gtot = (df.select(group_col, id_col).distinct()
            .groupBy(group_col).agg(F.count("*").alias("__gdocs")))
    # the frac threshold compares in EXACT decimal space: a float
    # multiply wobbles the boundary (frac=0.3, gdocs=10 → 3.0000000...4,
    # so ndocs=3 would fail although 3 >= 3 exactly) and could diverge
    # from an oracle computing the threshold differently (r9 advice).
    # Decimal(str(frac)) is the decimal literal the caller wrote
    # (0.3 → 3/10 exactly); long × small-scale decimal is exact and
    # overflow-safe in both Spark and DuckDB.
    from decimal import Decimal

    dfrac = Decimal(str(float(min_doc_frac)))
    bp = (wdocs.join(gtot, group_col)
          .filter((F.col("__ndocs") >= min_docs)
                  & (F.col("__ndocs") >= F.col("__gdocs") * F.lit(dfrac)))
          .select(group_col, "__w"))
    # both sides descend from explodes/aggregates with pre-explode
    # static estimates — pin the shuffled hash join (NOTES trap #2)
    return (wins.join(bp.hint("shuffle_hash"), [group_col, "__w"])
            .select(group_col, id_col, "start"))


def remove_boilerplate(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       group_col: str = "source", n: int = 10,
                       min_docs: int = 2, min_doc_frac: float = 0.0,
                       drop_empty_docs: bool = False,
                       tokens_col: str | None = None,
                       wins: DataFrame | None = None) -> DataFrame:
    """Strip per-group boilerplate spans (:func:`boilerplate_spans`)
    from each document and reassemble the survivors in order — the
    same position-union rebuild as :func:`remove_duplicate_spans`.
    Output ``(id, text, n_tokens, n_bp_tokens)``; cleaned ``text`` is
    ``''`` when the whole document was template."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (a 1-doc 'template' "
                         f"is just content), got {min_docs}")
    if not 0.0 <= min_doc_frac <= 1.0:
        raise ValueError(
            f"min_doc_frac must be in [0, 1], got {min_doc_frac}")
    if id_col in ("start", "pos", "n_tokens", "n_bp_tokens"):
        raise ValueError(f"id_col {id_col!r} collides with a span-dedup "
                         "output column; rename it first")
    # ``wins`` reuses a precomputed (grouped) window-occurrence frame
    # (one token_windows_multi pass shared across a composite)
    if wins is not None:
        _check_wins(wins, "remove_boilerplate", n=n, id_col=id_col,
                    extra_cols=(group_col,))
        toked, _ = _token_windows(df, id_col=id_col, text_col=text_col,
                                  n=n, tokens_col=tokens_col,
                                  extra_cols=(group_col,))
    else:
        toked, wins = _token_windows(df, id_col=id_col,
                                     text_col=text_col,
                                     n=n, tokens_col=tokens_col,
                                     extra_cols=(group_col,))
    marks = _boilerplate_marks(df, wins, id_col=id_col,
                               group_col=group_col, min_docs=min_docs,
                               min_doc_frac=min_doc_frac) \
        .select(F.col(id_col), "start")
    covered = (marks.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("start"),
                             F.col("start") + F.lit(n - 1))).alias("pos"))
        .distinct())
    return _rebuild_without_positions(
        toked.drop(group_col), covered, id_col=id_col, text_col=text_col,
        drop_empty_docs=drop_empty_docs, removed_col="n_bp_tokens")


def _rebuild_without_positions(toked: DataFrame, covered: DataFrame, *,
                               id_col: str, text_col: str,
                               drop_empty_docs: bool,
                               removed_col: str) -> DataFrame:
    """Reassemble documents from tokens whose positions are NOT in
    ``covered`` — the shared tail of :func:`remove_duplicate_spans`
    and :func:`remove_boilerplate`."""
    tokpos = toked.select(F.col(id_col),
                          F.posexplode("__toks").alias("pos", "__tok"))
    kept = tokpos.join(covered.hint("shuffle_hash"), [id_col, "pos"],
                       "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "__tok"))),
                        lambda s: s["__tok"]),
            " ").alias("__clean"),
        F.count("*").cast("int").alias("__n_kept"))
    per_doc = toked.select(F.col(id_col),
                           F.size("__toks").alias("n_tokens"))
    how = "inner" if drop_empty_docs else "left"
    # rebuilt descends from explodes: its static estimate is the tiny
    # pre-explode scan, but it is doc-count-sized — pin off the broadcast
    out = per_doc.join(rebuilt.hint("shuffle_hash"), id_col, how)
    return out.select(
        F.col(id_col),
        F.coalesce("__clean", F.lit("")).alias(text_col),
        F.col("n_tokens"),
        (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
        .cast("int").alias(removed_col))


def _re_escape(sep: str) -> str:
    """Escape a literal separator for F.split's regex argument."""
    import re

    return re.escape(sep)
