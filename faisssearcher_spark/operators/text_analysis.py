"""Document-corpus analysis operators (beyond-reference, north-star surface).

DataFrame-in / DataFrame-out wrappers over the column functions in
``functions/text.py``. Every derived column is a Catalyst expression —
whole-stage codegen over the string column, no Python workers — so these
run at full scan speed on a 100 TB documents table and the columns push
down/prune like any other projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T


def token_stats(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Token statistics per document: whitespace tokens, distinct tokens,
    BPE-ish token estimate, average token length."""
    return df.select(
        F.col(id_col),
        T.token_count(text_col).alias("n_tokens"),
        T.distinct_token_count(text_col).alias("n_distinct_tokens"),
        T.bpe_token_estimate(text_col).alias("n_bpe_tokens"),
        F.round(T.avg_token_length(text_col), 4).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Quality heuristics per document: C4-style cheap pre-filters plus
    Gopher-style repetition signals (duplicate lines, most-common-bigram
    dominance). The repetition columns are exact integers — ratios of
    small integers can land on decimal halves where Spark and other
    engines round differently (NOTES.md); callers derive ratios as
    needed.

    The token/line/bigram arrays materialize once via ``withColumn``
    before anything references them — the higher-order-function
    expressions are CodegenFallback and the interpreted projection does
    NOT common-subexpression-eliminate (measured ~18% at sf0.1, r4
    verdict #7), and Catalyst re-evaluates derived expressions inside
    higher-order lambdas per element, so inlining ``word_ngrams`` in the
    counting lambda would re-tokenize O(n_grams) times per row."""
    arrs = (df.withColumn("__t", T.tokens(text_col))
            .withColumn("__ls", T.lines(text_col))
            .withColumn("__g2", T.word_ngrams(text_col, 2)))
    n = F.size("__t")
    swr = T.token_array_stopword_ratio(F.col("__t"))
    return arrs.select(
        F.col(id_col),
        F.round(swr, 4).alias("stopword_ratio"),
        F.round(T.punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(T.quality_score_parts(n, swr, T.punct_ratio(text_col)), 4)
        .alias("quality"),
        F.size("__ls").alias("n_lines"),
        (F.size("__ls") - F.size(F.array_distinct("__ls")))
        .alias("n_dup_lines"),
        T.top_element_count(F.col("__g2")).alias("top_bigram_count"),
        F.size(F.col("__g2")).alias("n_bigrams"),
    )


def _tagged_gram_explode(base: DataFrame, id_col: str,
                         sizes: "list[int]",
                         *, with_pos: bool) -> DataFrame:
    """Explode the concatenation of ``base``'s per-size gram arrays
    (``__g{n}`` for n in ``sizes``, ascending) in ONE scan, tagging
    each element with its size ``__n`` — recovered from the explode
    position against the running array lengths, a codegen'd CASE chain
    (never a per-element struct transform: those run interpreted,
    measured slower than even one scan per size). With ``with_pos``,
    also emits ``__gpos``: the element's position within its own
    size's array (explode position minus the band offset) — exactly
    what a per-size ``posexplode`` would have produced.

    Each ``__g{n}`` attribute is referenced by both the concat and a
    ``size()`` band bound, so CollapseProject keeps the producing
    projection separate and the (CodegenFallback, no-CSE) gram arrays
    materialize once per row."""
    cat = F.concat(*[F.col(f"__g{n}") for n in sizes])
    bands = [F.size(f"__g{n}").alias(f"__s{n}") for n in sizes[:-1]]
    g = base.select(id_col, *bands, F.posexplode(cat).alias("__p",
                                                            "__gram"))
    running = None
    tag = None
    off = None
    prev_running = F.lit(0)
    for n in sizes[:-1]:
        s = F.col(f"__s{n}")
        running = s if running is None else running + s
        cond = F.col("__p") < running
        tag = (F.when(cond, F.lit(n)) if tag is None
               else tag.when(cond, F.lit(n)))
        if with_pos:
            o = F.col("__p") - prev_running
            off = (F.when(cond, o) if off is None
                   else off.when(cond, o))
        prev_running = running
    tag = (F.lit(sizes[-1]) if tag is None
           else tag.otherwise(F.lit(sizes[-1])))
    cols = [F.col(id_col), tag.alias("__n")]
    if with_pos:
        off = ((F.col("__p") - prev_running) if off is None
               else off.otherwise(F.col("__p") - prev_running))
        cols.append(off.alias("__gpos"))
    return g.select(*cols, "__gram")


def repetition_signals(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_ns: tuple[int, ...] = (2, 3, 4),
                       dup_ns: tuple[int, ...] = (5, 10)) -> DataFrame:
    """The full Gopher repetition-filter signal set (Rae et al. 2021,
    arXiv:2112.11446 Table A1) as exact integers per document — callers
    derive the paper's fractions by dividing by ``total_token_chars``
    (integer ratios can land on decimal halves; NOTES.md house rule).

    - ``total_token_chars`` — Σ len(token): the char space the GRAM
      fractions are measured against (token space, not raw text, so
      whitespace runs don't dilute the signal).
    - ``total_line_chars`` — Σ len(trimmed line): the char space the
      LINE fraction is measured against (line chars include intra-line
      spaces, so dividing them by token chars would inflate the
      fraction past 1.0 — each numerator gets its own-unit denominator).
    - ``dup_line_chars`` — chars in repeated line occurrences *beyond
      the first* (a line appearing c≥2 times contributes len·(c−1)).
    - ``top{n}_chars`` for n in ``top_ns`` — the most frequent word
      n-gram's char weight × its count, 0 unless it repeats (count≥2);
      ties broken toward the lexicographically greatest gram on both
      engines.
    - ``dup{n}_chars`` for n in ``dup_ns`` — chars of token positions
      covered by at least one occurrence of any n-gram that appears ≥2
      times in the doc (span-union semantics: overlapping duplicated
      grams never double-count a token).

    Scale shape: token/line/gram arrays materialize once per row (HOF
    no-CSE rule), then everything is explode → groupBy keyed by
    (doc, gram) — map-side combinable, linear in corpus tokens, no
    per-row O(len²) list scans in the distributed path. The base
    (tokenize + gram-build) lineage is consumed by ~8 aggregate
    branches and deliberately RECOMPUTED per branch rather than
    persisted: at 100 TB the tokenized corpus cannot be cached, while
    each recompute is a pruned (id, text) scan + linear codegen'd
    string work — scan bandwidth is the cheap resource, cluster memory
    is not. Callers at small/medium scale who want one pass can persist
    ``df`` themselves before calling."""
    # normalize once: duplicate sizes would alias duplicate band/agg
    # columns downstream (the concat-explode tagging AND the final agg
    # build one column per size — review catch). Dedupe PRESERVING the
    # caller's order (r13 ADVICE: sorted() silently reordered the
    # output columns for callers passing unsorted tuples like
    # top_ns=(4, 2) — positional consumers would break)
    top_ns = tuple(dict.fromkeys(top_ns))
    dup_ns = tuple(dict.fromkeys(dup_ns))
    base = df.select(id_col, T.tokens(text_col).alias("__t"),
                     T.lines(text_col).alias("__ls"))
    for n in sorted(set(top_ns) | set(dup_ns)):
        base = base.withColumn(
            f"__g{n}", T.word_ngrams(F.col("__t"), n, pre_tokenized=True))

    totals = base.select(
        id_col,
        F.aggregate(F.transform("__t", lambda t: F.length(t)),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("total_token_chars"),
        F.aggregate(F.transform("__ls", lambda l: F.length(l)),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("total_line_chars"))

    dup_lines = (base.select(id_col, F.explode("__ls").alias("__line"))
                 .groupBy(id_col, "__line")
                 .agg(F.count(F.lit(1)).alias("__c"))
                 .filter(F.col("__c") >= 2)
                 .groupBy(id_col)
                 .agg(F.sum(F.length("__line").cast("long")
                            * (F.col("__c") - 1)).alias("dup_line_chars")))

    out = totals.join(dup_lines, id_col, "left")
    if top_ns:
        # ONE scan for all top sizes: concat the per-size gram arrays
        # and recover each element's size from its explode position
        # against the running array lengths (a codegen'd CASE — no
        # per-element struct transform, which r4 measured interpreted
        # and slower than unioned scans, 3.3 s vs 1.9 s at sf0.1). The
        # union form this replaces re-paid the CodegenFallback token
        # array build once per size (guide §4); counts per (id, n,
        # gram) are identical — concat preserves every element and the
        # position bands are exactly the per-size array extents.
        tops = _tagged_gram_explode(base, id_col, sorted(top_ns),
                                    with_pos=False)
        top_cols = (tops.groupBy(id_col, "__n", "__gram")
                    .agg(F.count(F.lit(1)).alias("__c"))
                    .groupBy(id_col, "__n")
                    .agg(F.max(F.struct("__c", "__gram")).alias("__top"))
                    .select(id_col, "__n",
                            F.when(F.col("__top.__c") >= 2,
                                   (F.length("__top.__gram")
                                    - (F.col("__n") - 1)).cast("long")
                                   * F.col("__top.__c"))
                            .otherwise(F.lit(0).cast("long")).alias("__w"))
                    .groupBy(id_col)
                    .agg(*[F.sum(F.when(F.col("__n") == n, F.col("__w")))
                           .alias(f"top{n}_chars") for n in top_ns]))
        out = out.join(top_cols, id_col, "left")
    tokpos = base.select(id_col, F.posexplode("__t").alias("__pos", "__tok"))
    if dup_ns:
        # one pass over the gram frame: count + positions in the same
        # groupBy (a join back onto the explode would evaluate the
        # gram-string build twice and shuffle it twice — measured 2×
        # the whole dup path at sf0.1); the position list is bounded by
        # the document's own length. The dup sizes run as ONE tagged
        # union through a single groupBy → distinct → coverage-join →
        # final agg (r13: the per-n loop paid that four-exchange
        # pipeline once per size; the union shuffles the same bytes
        # through one pipeline — guide §2.4), and the branches are ONE
        # concat-explode scan tagged by position (see the tops comment)
        # instead of one tokenize+scan per size, with the in-array gram
        # position recovered by subtracting the band offset
        dups = _tagged_gram_explode(base, id_col, sorted(dup_ns),
                                    with_pos=True)
        dup_pos = (dups
                   .groupBy(id_col, "__n", "__gram")
                   .agg(F.count(F.lit(1)).alias("__c"),
                        F.collect_list("__gpos").alias("__ps"))
                   .filter(F.col("__c") >= 2)
                   .select(id_col, "__n",
                           F.explode("__ps").alias("__gpos"))
                   .select(id_col, "__n", F.explode(
                       F.sequence(F.col("__gpos"),
                                  F.col("__gpos") + (F.col("__n") - 1)))
                       .alias("__pos"))
                   .distinct())
        cov = (dup_pos.join(tokpos, [id_col, "__pos"])
               .groupBy(id_col)
               .agg(*[F.sum(F.when(F.col("__n") == n,
                                   F.length("__tok").cast("long")))
                      .alias(f"dup{n}_chars") for n in dup_ns]))
        out = out.join(cov, id_col, "left")
    # totals included: a NULL text propagates NULL through the
    # aggregates while the SQL twin coalesces to 0
    fill_cols = (["total_token_chars", "total_line_chars",
                  "dup_line_chars"]
                 + [f"top{n}_chars" for n in top_ns]
                 + [f"dup{n}_chars" for n in dup_ns])
    return out.na.fill(dict.fromkeys(fill_cols, 0))


def detect_languages(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     temperature: float = 0.05) -> DataFrame:
    """Stopword-heuristic language id per document, with a calibrated
    ``lang_conf`` in [1/K, 1] (softmax over length-invariant stopword
    rates — :func:`faisssearcher_spark.functions.text.
    language_confidence`) so curation recipes can threshold on id
    certainty instead of the raw argmax.

    The token array materializes ONCE and feeds both the argmax and the
    softmax (2K+1 tokenizations otherwise — the HOF expressions are
    CodegenFallback and the interpreted projection does not CSE; the
    quality_scores discipline). NULL text coalesces to '' (lang 'und',
    confidence 1/K — identical to the per-column functions)."""
    arrs = df.withColumn(
        "__lt", T.tokens(F.coalesce(F.col(text_col), F.lit(""))))
    return arrs.select(
        F.col(id_col),
        T.detect_language_from_tokens(F.col("__lt")).alias("lang_pred"),
        T.language_confidence_from_tokens(
            F.col("__lt"), temperature=temperature).alias("lang_conf"),
    )


def fingerprints(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text",
                 tokens_col: str | None = None) -> DataFrame:
    """Content fingerprints: order-insensitive md5 set-fingerprint, an
    order-sensitive polynomial rolling hash, and the md5 of the
    normalized text (``norm_hash`` — punctuation/casing/spacing variants
    of one passage collide, the C4/RefinedWeb dedup key).

    ``tokens_col`` names an already-tokenized ``array<string>`` column
    to reuse for the token-derived hashes (norm_hash still reads the
    raw text) — pass it when the caller fans one tokenized frame into
    several consumers so the corpus tokenizes once, not once per
    operator (one regex pass saved per consumer at 100 TB)."""
    tok_src = tokens_col if tokens_col is not None else text_col
    pre = tokens_col is not None
    return df.select(
        F.col(id_col),
        T.fingerprint(tok_src, pre_tokenized=pre).alias("fingerprint"),
        T.rolling_hash(tok_src, pre_tokenized=pre).alias("rolling_hash"),
        F.md5(T.normalize_text(text_col)).alias("norm_hash"),
    )


def ngram_frequencies(df: DataFrame, *, text_col: str = "text", n: int = 3,
                      top: int | None = None) -> DataFrame:
    """Corpus-wide word n-gram frequencies (explode → hash aggregate with
    map-side partial combine). ``top`` keeps the most frequent shingles
    (ties broken by shingle text for determinism)."""
    # explode_outer + isNotNull: plain explode gets size/isnotnull filters
    # inferred beneath the Generate and pushdown inlines the n-gram
    # expression into them — 3× the tokenize CPU (see dedup.py).
    grams = df.select(F.explode_outer(T.word_ngrams(text_col, n))
                      .alias("ngram")).filter(F.col("ngram").isNotNull())
    freq = grams.groupBy("ngram").agg(F.count("*").alias("freq"))
    if top is not None:
        freq = freq.orderBy(F.col("freq").desc(), F.col("ngram").asc()).limit(top)
    return freq


def chunk_documents(df: DataFrame, *, max_tokens: int = 512,
                    overlap: int = 0, id_col: str = "doc_id",
                    text_col: str = "text",
                    tokens_col: str | None = None) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    standard context-length prep step before packing/training.

    Window ``i`` covers tokens ``[1 + i·stride, … + max_tokens]`` with
    ``stride = max_tokens − overlap``; the tail window may be shorter,
    every token lands in at least one window, and empty documents yield
    no rows. Output: ``(id, chunk_idx, chunk_text, n_chunk_tokens)``.

    Scale shape: one projection + one generate — tokenization happens
    ONCE per document (the token array materializes as an attribute
    before any lambda references it; Catalyst re-evaluates derived
    expressions inside higher-order lambdas per element, the NOTES.md
    trap), chunks explode map-side with no shuffle, and row growth is
    the unavoidable ``n_tokens/stride`` replication (bounded by
    1 + max_tokens/stride ≤ 2× at overlap ≤ half-window).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    stride = max_tokens - overlap
    toks = (F.col(tokens_col) if tokens_col is not None
            else T.tokens(text_col))
    toked = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    starts = F.when(
        n > 0,
        F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)),
                   F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = toked.select(
        F.col(id_col),
        F.posexplode(F.transform(
            starts, lambda s: F.slice(F.col("__toks"), s, max_tokens)))
        .alias("chunk_idx", "__chunk"))
    return chunks.select(
        F.col(id_col), "chunk_idx",
        F.array_join(F.col("__chunk"), " ").alias("chunk_text"),
        F.size(F.col("__chunk")).alias("n_chunk_tokens"))


def fit_token_frequencies(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          ngram: int = 1) -> DataFrame:
    """Reference-corpus vocabulary: one row per distinct whitespace token
    with its corpus-wide occurrence count (``tf``) and document frequency
    (``df``) — the fit half of the CCNet-style frequency filter
    (score a crawl against a trusted reference corpus; Wenzek et al.
    2020 use a reference LM, this is the exact-arithmetic relational
    analog that a DuckDB oracle can replay).

    Scale shape: explode → one (id, token) agg → one token agg; shuffle
    ∝ distinct (doc, token) then distinct tokens. Zipf makes the output
    tiny relative to the corpus.
    """
    # ngram > 1 fits the model on word shingles: the n-gram LM that
    # makes perplexity ORDER-sensitive (CCNet's KenLM is a 5-gram; the
    # shingle unigram keeps the relational/oracle-replayable shape while
    # capturing local order). Pair with unigram_logppl(ngram=n).
    units = T.tokens(text_col) if ngram == 1 \
        else T.word_ngrams(text_col, ngram)
    ex = (df.select(F.col(id_col).alias("__id"),
                    F.explode_outer(units).alias("token"))
          .filter(F.col("token").isNotNull()))
    per_doc = ex.groupBy("__id", "token").agg(
        F.count("*").alias("__occ"))
    return per_doc.groupBy("token").agg(
        F.sum("__occ").alias("tf"),
        F.count("*").alias("df"))


def token_frequency_score(df: DataFrame, vocab: DataFrame, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          token_col: str = "token",
                          tf_col: str = "tf") -> DataFrame:
    """Per-document commonness against a reference vocabulary, in EXACT
    integers (engine-portable, unlike a log-prob float whose reduction
    order differs across engines): ``sum_ref_tf`` — the summed reference
    term frequency of the document's tokens (high ⇒ the doc is made of
    tokens the reference corpus uses a lot), and ``n_oov`` — how many of
    its tokens the reference has never seen (high ⇒ junk, another
    language, or novel vocabulary). Downstream filters threshold on
    ``sum_ref_tf / n_tokens`` and ``n_oov / n_tokens``; keeping the
    integer numerators exact leaves the (lossy) division to the caller.

    Scale shape: explode → equi-join on the token → per-doc agg. The
    vocabulary is Zipf-small, so AQE broadcasts it at bench scale; at a
    vocabulary too large to broadcast the same plan degrades gracefully
    to a shuffled hash join on the token. Empty documents survive with
    zeros (right join back onto the id set).
    """
    ids = df.select(F.col(id_col))
    ex = (df.select(F.col(id_col),
                    F.explode_outer(T.tokens(text_col)).alias("__tok"))
          .filter(F.col("__tok").isNotNull()))
    v = vocab.select(F.col(token_col).alias("__tok"),
                     F.col(tf_col).alias("__tf"))
    agg = (ex.join(v, "__tok", "left")
           .groupBy(id_col)
           .agg(F.count("*").alias("n_tokens"),
                F.sum(F.coalesce("__tf", F.lit(0))).alias("sum_ref_tf"),
                F.sum(F.when(F.col("__tf").isNull(), 1).otherwise(0))
                 .alias("n_oov")))
    return (ids.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                     .alias("n_tokens"),
                    F.coalesce("sum_ref_tf", F.lit(0)).cast("long")
                     .alias("sum_ref_tf"),
                    F.coalesce("n_oov", F.lit(0)).cast("long")
                     .alias("n_oov")))


def dsir_log_weights(df: DataFrame, target_vocab: DataFrame,
                     raw_vocab: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text", token_col: str = "token",
                     tf_col: str = "tf", smoothing: float = 1.0,
                     score_scale: int | None = 4,
                     landed: "list | None" = None) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, arXiv:2302.03169):
    per-document log-likelihood ratio between a TARGET distribution
    (the domain you want more of) and the RAW distribution (the pool you
    are sampling from), under add-``smoothing`` unigram models fit with
    :func:`fit_token_frequencies`:

        logw(d) = Σ_t [ ln p_target(t) − ln p_raw(t) ]
        p(t) = (tf(t) + s) / (N + s·(V+1))

    with V the union vocabulary size (+1 reserves one pseudo-type for
    out-of-both-vocab tokens, which contribute the constant
    ln(N_raw + s(V+1)) − ln(N_target + s(V+1))). The paper uses hashed
    n-gram features; unigrams keep the operator tokenizer-free — pass
    pre-shingled text for the n-gram variant.

    Output: ``(id, n_tokens, logw)`` — logw rounded to ``score_scale``
    decimals (default 4) so the DuckDB oracle twin matches despite
    libm-vs-fdlibm 1-ulp ``ln`` drift and float summation order; pass
    ``None`` for the raw double. High logw ⇒ the document looks like the
    target; feed into
    :func:`~faisssearcher_spark.operators.sampling.gumbel_topk_sample`
    to draw the DSIR sample ∝ exp(logw).

    Scale shape: one full-outer vocab join (Zipf-small), a 3-scalar
    driver agg (the normalizers — O(1) driver data), then explode →
    token equi-join → per-doc sum. The per-token log-ratio is
    precomputed on the VOCAB (tiny) so the per-occurrence work in the
    big join is a coalesce and an add — no ln in the hot loop.
    """
    import math

    s = float(smoothing)
    if s <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    t = target_vocab.select(F.col(token_col).alias("__tok"),
                            F.col(tf_col).cast("double").alias("__tf_t"))
    r = raw_vocab.select(F.col(token_col).alias("__tok"),
                         F.col(tf_col).cast("double").alias("__tf_r"))
    vocab = (t.join(r, "__tok", "full_outer")
             .select("__tok",
                     F.coalesce("__tf_t", F.lit(0.0)).alias("__tf_t"),
                     F.coalesce("__tf_r", F.lit(0.0)).alias("__tf_r")))
    # ``landed``: the union vocab executes twice per invocation (the
    # normalizer collect + the __lr join side) and its inputs are two
    # full LM fits — a caller passing a landed-list gets the Zipf-small
    # union persisted and owns the release (curate.py discipline)
    if landed is not None:
        from faisssearcher_spark.operators.curate import _land
        vocab = _land(vocab, landed)
    tot = vocab.agg(F.sum("__tf_t"), F.sum("__tf_r"),
                    F.count("*")).collect()[0]
    n_t, n_r = float(tot[0] or 0.0), float(tot[1] or 0.0)
    v = int(tot[2])
    denom_t, denom_r = n_t + s * (v + 1), n_r + s * (v + 1)
    lr_oov = math.log(s / denom_t) - math.log(s / denom_r)
    lr = (vocab.select(
        "__tok",
        (F.log((F.col("__tf_t") + s) / denom_t)
         - F.log((F.col("__tf_r") + s) / denom_r)).alias("__lr")))

    # score per ROW via a generated row key, not per id value: grouping
    # by id_col would silently merge duplicate ids' token multisets into
    # one combined score (the wordvec encode_df defect class, r4 ADVICE).
    # SINGLE lineage — the row key is referenced only inside one plan
    # branch (explode_outer keeps empty docs as a null-token row, so no
    # join back onto a second recomputation of monotonically_increasing_id
    # whose values are partition-layout-dependent; review r5 finding #2).
    rid = "__dsir_rid"
    while rid in df.columns:
        rid += "_"
    # the row key MUST materialize in its own projection BELOW the
    # generate: putting monotonically_increasing_id() in the same select
    # as the explode re-evaluates it per exploded token row
    keyed = df.withColumn(rid, F.monotonically_increasing_id())
    ex = keyed.select(F.col(id_col), F.col(rid),
                      F.explode_outer(T.tokens(text_col)).alias("__tok"))
    logw = F.sum(F.when(F.col("__tok").isNotNull(),
                        F.coalesce("__lr", F.lit(lr_oov)))
                 .otherwise(F.lit(0.0)))
    if score_scale is not None:
        logw = F.round(logw, score_scale)
    return (ex.join(lr, "__tok", "left")
            .groupBy(rid)
            .agg(F.first(id_col).alias(id_col),
                 F.count("__tok").cast("long").alias("n_tokens"),
                 logw.alias("logw"))
            .select(id_col, "n_tokens", "logw"))


def unigram_logppl(df: DataFrame, lm_vocab: DataFrame, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   token_col: str = "token", tf_col: str = "tf",
                   smoothing: float = 1.0, ngram: int = 1,
                   score_scale: int | None = 4,
                   tokens_col: str | None = None,
                   landed: "list | None" = None) -> DataFrame:
    """Per-document cross-entropy under an add-``smoothing`` unigram
    language model fit on a reference corpus (CCNet-style perplexity
    filtering, Wenzek et al. 2020, arXiv:1911.00359 — the paper scores a
    crawl with a KenLM 5-gram trained on Wikipedia and keeps the
    low-perplexity head; a unigram LM keeps the operator exactly
    replayable by a SQL oracle while preserving the ranking semantics):

        logppl(d) = -(1/n) Σ_t ln p(t)
        p(t)      = (tf(t) + s) / (N + s·(V+1))

    with ``N = Σ tf`` and ``V`` the LM vocabulary size (+1 reserves a
    pseudo-type for out-of-vocab tokens, which contribute the constant
    -ln(s / (N + s(V+1)))). Perplexity itself is ``exp(logppl)`` —
    monotone in logppl, so thresholds/buckets work on either; the log
    form avoids overflow on junk documents. Fit ``lm_vocab`` with
    :func:`fit_token_frequencies` on the trusted reference slice.

    Output: ``(id, n_tokens, logppl)``; empty documents get NULL logppl
    (there is no 0-token distribution to take a mean over). ``logppl``
    is rounded to ``score_scale`` decimals (default 4) so a DuckDB twin
    matches across libm ``ln`` implementations; ``None`` keeps the raw
    double. Feed into :func:`perplexity_buckets` for the CCNet
    head/middle/tail split.

    Scale shape (the :func:`dsir_log_weights` pattern): per-token
    -ln p precomputed on the Zipf-small vocabulary, explode → token
    equi-join (AQE broadcasts a small LM, degrades to shuffled hash
    join on a huge one) → one per-row-key mean. No ln in the
    per-occurrence hot loop, no driver data beyond two scalars.
    """
    import math

    s = float(smoothing)
    if s <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    v_rows = lm_vocab.select(F.col(token_col).alias("__tok"),
                             F.col(tf_col).cast("double").alias("__tf"))
    # ``landed``: the projected LM table executes twice per invocation
    # (the normalizer collect below + the __nlp join side of the main
    # plan) — a caller passing a landed-list gets it persisted (it is
    # vocab-sized, Zipf-small — legitimately cacheable at any corpus
    # scale) and OWNS the release (the curate.py _land/_release_with
    # refcount discipline). Values are unchanged either way.
    if landed is not None:
        from faisssearcher_spark.operators.curate import _land
        v_rows = _land(v_rows, landed)
    tot = v_rows.agg(F.sum("__tf"), F.count("*")).collect()[0]
    n_lm = float(tot[0] or 0.0)
    v_lm = int(tot[1])
    denom = n_lm + s * (v_lm + 1)
    nlp_oov = -math.log(s / denom)
    nlp = v_rows.select(
        "__tok", (-F.log((F.col("__tf") + s) / denom)).alias("__nlp"))

    # per-ROW key (not id_col) so duplicate ids never merge, single
    # lineage, key materialized below the generate — the dsir/wordvec
    # discipline (r4 ADVICE + r5 review finding #2).
    rid = "__ppl_rid"
    while rid in df.columns:
        rid += "_"
    keyed = df.withColumn(rid, F.monotonically_increasing_id())
    # ngram > 1: score word shingles against an ngram-fit vocabulary —
    # order-sensitive perplexity (a scrambled document keeps its unigram
    # score but its bigrams fall out of vocabulary). Fit the LM with
    # fit_token_frequencies(ngram=n) on the SAME n.
    if tokens_col is not None:
        # share-one-tokenize-scan: the caller's token array feeds the
        # unit expression directly (re-shingled here for ngram > 1)
        units = (F.col(tokens_col) if ngram == 1
                 else T.word_ngrams(tokens_col, ngram, pre_tokenized=True))
    else:
        units = (T.tokens(text_col) if ngram == 1
                 else T.word_ngrams(text_col, ngram))
    ex = keyed.select(F.col(id_col), F.col(rid),
                      F.explode_outer(units).alias("__tok"))
    n = F.count("__tok")
    total = F.sum(F.when(F.col("__tok").isNotNull(),
                         F.coalesce("__nlp", F.lit(nlp_oov)))
                  .otherwise(F.lit(0.0)))
    logppl = F.when(n > 0, total / n)
    if score_scale is not None:
        logppl = F.round(logppl, score_scale)
    return (ex.join(nlp, "__tok", "left")
            .groupBy(rid)
            .agg(F.first(id_col).alias(id_col),
                 n.cast("long").alias("n_tokens"),
                 logppl.alias("logppl"))
            .select(id_col, "n_tokens", "logppl"))


def bigram_backoff_logppl(df: DataFrame, ref: DataFrame, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          backoff: float = 0.4,
                          score_scale: int | None = 4,
                          landed: "list | None" = None) -> DataFrame:
    """Per-document cross-entropy under a CONDITIONAL bigram LM with
    stupid backoff (Brants et al. 2007, "Large Language Models in
    Machine Translation" — the backoff scheme built for web-scale
    corpora precisely because it needs no discounting pass, only raw
    counts):

        s(w | v) = c₂(v,w) / c₁(v)          seen bigram
                 = λ · s₁(w)                 otherwise (λ = ``backoff``)
        s₁(w)    = c₁(w) / N                 seen unigram
                 = λ / N                     out of vocabulary
        logppl(d) = -(1/n) Σᵢ ln s(wᵢ | wᵢ₋₁)    (w₀ scores s₁(w₀))

    This is the ORDER-SENSITIVE sibling of :func:`unigram_logppl`
    (whose ``ngram=2`` mode scores JOINT shingle frequency): a
    scrambled document keeps its joint-bigram vocabulary but its
    conditionals collapse to backoff. Scores are unnormalized (stupid
    backoff's point) — rank/threshold semantics only, like every LM
    filter here.

    ``ref`` is the trusted reference corpus (the CCNet pattern: fit on
    Wikipedia-quality data, score the crawl). Fit = two distributed
    count aggregates over ``ref``; scoring joins the Zipf-small count
    tables (AQE broadcasts small LMs) with per-pair -ln terms
    precomputed — no ``ln`` in the per-occurrence hot loop. Output
    ``(id, n_tokens, bigram_logppl)``; empty docs score NULL; rounded
    at ``score_scale`` (cross-libm ``ln`` + sum-order absorption)."""
    import math

    lam = float(backoff)
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")

    uni = (ref.select(F.explode_outer(T.tokens(text_col)).alias("__w"))
           .filter(F.col("__w").isNotNull())
           .groupBy("__w").agg(F.count("*").alias("__c1")))
    # ``landed``: the unigram count table executes THREE times per
    # invocation (the N collect below, the __u_nlp join side, and the
    # __c1 side of the bigram-conditional join), each a full reference
    # tokenize+aggregate — a caller passing a landed-list gets the
    # Zipf-small table persisted and owns the release (curate.py
    # _land/_release_with discipline). Values unchanged either way.
    if landed is not None:
        from faisssearcher_spark.operators.curate import _land
        uni = _land(uni, landed)
    n_ref = uni.agg(F.sum("__c1")).collect()[0][0] or 0
    if n_ref == 0:
        raise ValueError("reference corpus has no tokens")
    # -ln of the unigram score; OOV constant -ln(lam / N)
    nlp_oov = -math.log(lam / n_ref)
    uni_nlp = uni.select(
        "__w", (-F.log(F.col("__c1") / F.lit(float(n_ref))))
        .alias("__u_nlp"), "__c1")
    bi = (ref.select(T.word_ngrams(text_col, 2).alias("__g"))
          .select(F.explode_outer("__g").alias("__vw"))
          .filter(F.col("__vw").isNotNull())
          .groupBy("__vw").agg(F.count("*").alias("__c2")))
    bi_nlp = (bi.join(uni_nlp.select(F.col("__w"), F.col("__c1")),
                      F.split(F.col("__vw"), " ").getItem(0)
                      == F.col("__w"))
              .select(F.col("__vw"),
                      (-F.log(F.col("__c2") / F.col("__c1")))
                      .alias("__b_nlp")))

    rid = "__bg_rid"
    while rid in df.columns:
        rid += "_"
    keyed = df.withColumn(rid, F.monotonically_increasing_id())
    # stage the token array behind a Generate barrier so element_at
    # inside the pair lambda reads an attribute, not a re-evaluated
    # split per element (the maxsim/HOF-CSE discipline)
    staged = keyed.select(
        F.col(id_col), F.col(rid),
        F.explode(F.array(F.struct(T.tokens(text_col).alias("t"))))
        .alias("__tk"))
    toks = F.col("__tk").getField("t")
    pairs = F.transform(
        toks,
        lambda t, i: F.struct(
            F.when(i > 0, F.element_at(toks, i)).alias("prev"),
            t.alias("cur")))
    ex = staged.select(
        F.col(id_col), F.col(rid),
        F.explode_outer(pairs).alias("__p")) \
        .select(id_col, rid,
                F.col("__p").getField("prev").alias("__prev"),
                F.col("__p").getField("cur").alias("__cur"))
    joined = (ex
              .join(uni_nlp.select(F.col("__w").alias("__cur"),
                                   "__u_nlp"), "__cur", "left")
              .join(bi_nlp.select(
                  F.split(F.col("__vw"), " ").getItem(0).alias("__prev"),
                  F.split(F.col("__vw"), " ").getItem(1).alias("__cur"),
                  "__b_nlp"), ["__prev", "__cur"], "left"))
    uni_term = F.coalesce("__u_nlp", F.lit(nlp_oov))
    pen = -math.log(lam)
    pair_nlp = F.when(F.col("__prev").isNull(), uni_term) \
        .otherwise(F.coalesce("__b_nlp", uni_term + F.lit(pen)))
    n = F.count("__cur")
    total = F.sum(F.when(F.col("__cur").isNotNull(), pair_nlp)
                  .otherwise(F.lit(0.0)))
    logppl = F.when(n > 0, total / n)
    if score_scale is not None:
        logppl = F.round(logppl, score_scale)
    return (joined.groupBy(rid)
            .agg(F.first(id_col).alias(id_col),
                 n.cast("long").alias("n_tokens"),
                 logppl.alias("bigram_logppl"))
            .select(id_col, "n_tokens", "bigram_logppl"))


def perplexity_buckets(scored: DataFrame, *, id_col: str = "doc_id",
                       score_col: str = "logppl", n_buckets: int = 3,
                       thresholds: list[float] | None = None,
                       out_col: str = "ppl_bucket") -> DataFrame:
    """CCNet head/middle/tail split: bucket documents by their LM score
    (Wenzek et al. 2020 cut the crawl into perplexity thirds and train
    mostly on the head). Appends ``out_col`` (int, 1-based; bucket 1 =
    lowest perplexity = most reference-like). NULL scores (empty
    documents) get bucket 0 — they carry no LM evidence either way.

    Two modes, pick by scale:

    - ``thresholds=[t1, t2, ...]`` (len ``n_buckets``-1, ascending) —
      the 100 TB path: a pure scan-side CASE, no shuffle, no global
      state. Fit thresholds once on a sample (``approx_percentile`` or
      a previous epoch) and reuse; CCNet itself fixes thresholds per
      language from a held-out run.
    - ``thresholds=None`` — exact ``ntile(n_buckets)`` over
      ``(score, id)``: engine-portable (identical remainder semantics in
      Spark and DuckDB, deterministic under ties via the id tiebreak)
      but a single-partition global window — bench/oracle scale only,
      documented limit, warned at plan-build time for none-threshold use.
    """
    if thresholds is not None:
        if len(thresholds) != n_buckets - 1:
            raise ValueError(
                f"need {n_buckets - 1} thresholds for {n_buckets} "
                f"buckets, got {len(thresholds)}")
        if sorted(thresholds) != list(thresholds):
            raise ValueError(f"thresholds must ascend: {thresholds}")
        bucket = F.lit(n_buckets)
        for i in range(n_buckets - 2, -1, -1):
            bucket = F.when(F.col(score_col) <= thresholds[i],
                            i + 1).otherwise(bucket)
    else:
        from pyspark.sql import Window
        # partition by the null flag: NULL scores must not consume ntile
        # slots (they'd shift every non-null boundary), and Spark sorts
        # NULLs first where DuckDB sorts them last — isolating them makes
        # the non-null tiling identical in both engines. The null
        # partition's tile numbers are discarded to 0 below.
        w = (Window.partitionBy(F.col(score_col).isNull())
             .orderBy(F.col(score_col), F.col(id_col)))
        bucket = F.ntile(n_buckets).over(w)
    out = F.when(F.col(score_col).isNull(), F.lit(0)).otherwise(bucket)
    if out_col in scored.columns:
        raise ValueError(f"column {out_col!r} already exists")
    return scored.withColumn(out_col, out.cast("int"))


def c4_signals(df: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text",
               min_words_per_line: int = 5,
               line_drop_token: str = "javascript") -> DataFrame:
    """The C4 cleaning recipe's signals (Raffel et al. 2020,
    arXiv:1910.10683 §2.2) as exact per-document values — the
    line-level half REWRITES the page, the page-level half flags it:

    line KEPT iff it (after trimming) ends in a terminal punctuation
    mark (``. ! ? "`` — C4's rule), has ≥ ``min_words_per_line``
    whitespace words, and does not contain ``line_drop_token``
    (case-insensitive; C4 dropped lines with the word "javascript").
    Page flags: ``has_lorem`` ("lorem ipsum" anywhere, case-
    insensitive), ``has_curly`` (a ``{`` anywhere — code pages).

    Output: ``(id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_curly, clean_text)`` where ``n_sentences`` counts terminal-
    punctuation runs in the CLEANED text (C4 drops pages with < 3
    sentences — apply via :func:`c4_clean_documents`) and
    ``clean_text`` is the kept lines re-joined with newlines. Pure
    Catalyst (split → HOF filter → array_join), one scan, no state —
    the 100 TB shape; every output is deterministic string/integer
    arithmetic a SQL twin replays exactly."""
    # NULL text behaves as empty (0 lines, flags false) — size(NULL)
    # would otherwise null every counter
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    trimmed = F.transform(lines, lambda l: F.trim(l))
    nonempty = F.filter(trimmed, lambda l: F.length(l) > 0)

    def _kept(l):
        words = F.filter(F.split(l, r"\s+"),
                         lambda w: F.length(w) > 0)
        return (l.rlike('[.!?"]$')
                & (F.size(words) >= min_words_per_line)
                & ~F.lower(l).contains(line_drop_token.lower()))

    kept = F.filter(nonempty, _kept)
    clean = F.array_join(kept, "\n")
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(nonempty).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.size(F.filter(F.split(clean, r'[.!?"]+'),
                        lambda s: F.length(F.trim(s)) > 0))
        .alias("n_sentences"),
        low.contains("lorem ipsum").alias("has_lorem"),
        low.contains("{").alias("has_curly"),
        clean.alias("clean_text"))


def c4_clean_documents(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", min_sentences: int = 3,
                       min_words_per_line: int = 5,
                       line_drop_token: str = "javascript") -> DataFrame:
    """Apply the full C4 page filter: line-level cleaning via
    :func:`c4_signals`, then keep pages with ≥ ``min_sentences``
    sentences, no "lorem ipsum", and no ``{``. Returns the surviving
    ``(id, clean_text, n_sentences)`` — the C4 transform minus the
    badword blocklist (no public wordlist ships here; compose a
    blocklist filter upstream) and minus the three-sentence span dedup
    (that is :func:`~faisssearcher_spark.operators.dedup.
    remove_duplicate_spans`' job, corpus-global)."""
    sig = c4_signals(df, id_col=id_col, text_col=text_col,
                     min_words_per_line=min_words_per_line,
                     line_drop_token=line_drop_token)
    return (sig.filter((F.col("n_sentences") >= min_sentences)
                       & ~F.col("has_lorem") & ~F.col("has_curly"))
            .select("id", "clean_text", "n_sentences"))
