"""Plan-parity pins for the r13 SQL-text expression builders.

The hot wide-tree builders (minhash signatures / bands, and the other
sqltext twins) moved from per-node ``F.*`` construction to SQL-text
rendering to kill the py4j round-trip wall (functions/sqltext.py has
the numbers). These tests freeze the contract that the rewrite is a
pure construction-speed change: each SQL-text form must produce the
SAME optimized plan (canonicalized — expression IDs and lambda
variable IDs normalized) as a Column-API replica of the pre-r13
construction, and the same rows. A failure here means the SQL text
drifted from the math the DuckDB oracles pin.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T


def canon(df) -> str:
    """Canonicalized optimized logical plan (exprIds normalized)."""
    return (df._jdf.queryExecution().optimizedPlan()
            .canonicalized().toString())


def assert_plan_and_rows_equal(new_df, old_df):
    assert canon(new_df) == canon(old_df)
    new_rows = sorted(map(tuple, new_df.collect()))
    old_rows = sorted(map(tuple, old_df.collect()))
    assert new_rows == old_rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "a b c d e f h"),
         (2, "x y z w v u t"), (3, ""), (4, "a b c d e f g")],
        "doc_id long, text string")


# ---------------------------------------------------------------------------
# tokens / word_ngrams SQL twins
# ---------------------------------------------------------------------------

def _tokens_col(c):
    return F.filter(F.split(F.trim(F.col(c)), r"\s+"), lambda t: t != "")


def _word_ngrams_col(c, n):
    toks = _tokens_col(c)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(toks, j, m),
                         lambda x, y: F.concat_ws(" ", x, y))
    return acc


def test_tokens_sql_parity(docs):
    new = docs.selectExpr("doc_id", f"{T.tokens_sql('text')} AS t")
    old = docs.select("doc_id", _tokens_col("text").alias("t"))
    assert_plan_and_rows_equal(new, old)


def test_word_ngrams_sql_parity(docs):
    new = docs.selectExpr("doc_id",
                          f"{T.word_ngrams_sql('text', 3)} AS g")
    old = docs.select("doc_id", _word_ngrams_col("text", 3).alias("g"))
    assert_plan_and_rows_equal(new, old)


def test_word_ngrams_sql_pre_tokenized_parity(docs):
    # the minhash_lsh_join tokens_col+shingle_n fast path renders this
    # form — pin it against the Column construction over the same array
    toked = docs.select("doc_id", T.tokens("text").alias("toks"))
    new = toked.selectExpr(
        "doc_id",
        f"{T.word_ngrams_sql('toks', 3, pre_tokenized=True)} AS g")
    old = toked.select(
        "doc_id", T.word_ngrams("toks", 3, pre_tokenized=True).alias("g"))
    assert_plan_and_rows_equal(new, old)


def test_is_simple_name_rejects_non_column_words(spark):
    from faisssearcher_spark.functions.sqltext import is_simple_name
    # words the parser resolves as literals / bare function calls, and
    # a trailing-newline name that `$`-anchored match would accept
    for bad in ("null", "TRUE", "false", "current_date", "CURRENT_USER",
                "user", "text\n", "a.b", "a b", "`a`", "", 7, None):
        assert not is_simple_name(bad)
    assert is_simple_name("text") and is_simple_name("_c0")


def test_is_simple_name_respects_escaped_string_literals_conf(spark):
    from faisssearcher_spark.functions.sqltext import is_simple_name
    key = "spark.sql.parser.escapedStringLiterals"
    try:
        spark.conf.set(key, "true")
        assert not is_simple_name("text")
    finally:
        spark.conf.unset(key)
    assert is_simple_name("text")


# ---------------------------------------------------------------------------
# banded minhash builders: full-plan parity against pre-r13 replicas
# ---------------------------------------------------------------------------

def _banded_signatures_r12(df, *, id_col="doc_id", text_col="text",
                           num_hashes=16, bands=4, shingle_n=None,
                           seed=42):
    """Verbatim pre-r13 Column-API construction of
    incremental.banded_signatures (the plan contract)."""
    from faisssearcher_spark.operators.dedup import (MINHASH_SLOTS_PER_MD5,
                                                     minhash_slot_salt,
                                                     minhash_slot_start)
    r = num_hashes // bands
    units = (T.word_ngrams(text_col, shingle_n) if shingle_n
             else T.tokens(text_col))
    base = df.select(F.col(id_col).alias("id"),
                     F.array_distinct(units).alias("__ts"))
    n_groups = -(-num_hashes // MINHASH_SLOTS_PER_MD5)
    hashed = base.select("id", F.explode_outer("__ts").alias("__t")) \
        .filter(F.col("__t").isNotNull()) \
        .select("id", *[
            F.md5(F.concat(
                F.lit(minhash_slot_salt(gi * MINHASH_SLOTS_PER_MD5, seed)),
                F.col("__t"))).alias(f"__hg{gi}")
            for gi in range(n_groups)])
    sigs = hashed.groupBy("id").agg(*[
        F.min(F.substring(F.col(f"__hg{i // MINHASH_SLOTS_PER_MD5}"),
                          minhash_slot_start(i), 8)).alias(f"__x{i}")
        for i in range(num_hashes)]) \
        .select("id", *[F.conv(F.col(f"__x{i}"), 16, 10).cast("long")
                        .alias(f"__s{i}") for i in range(num_hashes)])
    band_arr = F.array(*[
        F.concat_ws("|", *[F.col(f"__s{bi * r + j}").cast("string")
                           for j in range(r)])
        for bi in range(bands)])
    sig_arr = F.array(*[F.col(f"__s{i}") for i in range(num_hashes)])
    return sigs.select(
        "id", sig_arr.alias("sig"),
        F.posexplode(band_arr).alias("band_idx", "band_val")) \
        .select("id", "band_idx",
                F.xxhash64("band_idx", "band_val").alias("band_key"),
                "sig")


def test_banded_signatures_parity(docs):
    from faisssearcher_spark.operators.incremental import banded_signatures
    new = banded_signatures(docs, shingle_n=3)
    old = _banded_signatures_r12(docs, shingle_n=3)
    assert_plan_and_rows_equal(new, old)


def test_banded_signatures_parity_tokens_mode(docs):
    from faisssearcher_spark.operators.incremental import banded_signatures
    new = banded_signatures(docs, shingle_n=None, num_hashes=8, bands=2,
                            seed=7)
    old = _banded_signatures_r12(docs, shingle_n=None, num_hashes=8,
                                 bands=2, seed=7)
    assert_plan_and_rows_equal(new, old)


def _minhash_lsh_join_r12(df, *, id_col="doc_id", text_col="text",
                          num_hashes=16, bands=4, shingle_n=None,
                          seed=42, verify_threshold=0.5):
    """Verbatim pre-r13 Column-API construction of
    dedup.minhash_lsh_join (tokens_col path omitted: same kernel)."""
    from faisssearcher_spark.operators.dedup import (MINHASH_SLOTS_PER_MD5,
                                                     minhash_slot_salt,
                                                     minhash_slot_start)
    r = num_hashes // bands
    units = (T.word_ngrams(text_col, shingle_n) if shingle_n
             else T.tokens(text_col))
    base = df.select(F.col(id_col).alias("id"),
                     F.array_distinct(units).alias("token_set"))
    n_groups = -(-num_hashes // MINHASH_SLOTS_PER_MD5)
    hashed = base.select("id", F.explode_outer("token_set").alias("__t")) \
        .filter(F.col("__t").isNotNull()) \
        .select("id", *[
            F.md5(F.concat(
                F.lit(minhash_slot_salt(gi * MINHASH_SLOTS_PER_MD5, seed)),
                F.col("__t"))).alias(f"__hg{gi}")
            for gi in range(n_groups)])
    sigs = hashed.groupBy("id").agg(*[
        F.min(F.substring(F.col(f"__hg{i // MINHASH_SLOTS_PER_MD5}"),
                          minhash_slot_start(i), 8)).alias(f"__x{i}")
        for i in range(num_hashes)]) \
        .select("id", *[F.conv(F.col(f"__x{i}"), 16, 10).cast("long")
                        .alias(f"__s{i}") for i in range(num_hashes)])
    band_arr = F.array(*[
        F.concat_ws("|", *[F.col(f"__s{bi * r + j}").cast("string")
                           for j in range(r)])
        for bi in range(bands)])
    banded = sigs.select(
        "id", F.posexplode(band_arr).alias("band_idx", "band_val")) \
        .select("id", "band_idx", F.xxhash64("band_val").alias("band_key"))
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
        .join(tok.select(F.col("id").alias("id_a"),
                         F.col("token_set").alias("ts_a")), "id_a")
        .join(tok.select(F.col("id").alias("id_b"),
                         F.col("token_set").alias("ts_b")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("ts_a", "ts_b")))
        .withColumn("jaccard", F.col("n_common") /
                    (F.size("ts_a") + F.size("ts_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= verify_threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def test_minhash_lsh_join_parity(docs):
    from faisssearcher_spark.operators.dedup import minhash_lsh_join
    new = minhash_lsh_join(docs, shingle_n=3)
    old = _minhash_lsh_join_r12(docs, shingle_n=3)
    assert_plan_and_rows_equal(new, old)


def test_minhash_lsh_join_parity_no_verify(docs):
    from faisssearcher_spark.operators.dedup import minhash_lsh_join
    new = minhash_lsh_join(docs, shingle_n=None, verify_threshold=None)
    old = _minhash_lsh_join_r12(docs, shingle_n=None,
                                verify_threshold=None)
    assert_plan_and_rows_equal(new, old)


def test_minhash_lsh_join_tokens_col_shingle_matches_text_mode(docs):
    # the tokens_col+shingle_n SQL fast path must emit the same pairs
    # as text mode when the token array is the library tokenizer's
    from faisssearcher_spark.operators.dedup import minhash_lsh_join
    toked = docs.select("doc_id", T.tokens("text").alias("toks"))
    via_tokens = minhash_lsh_join(toked, tokens_col="toks", shingle_n=3)
    via_text = minhash_lsh_join(docs, shingle_n=3)
    assert (sorted(map(tuple, via_tokens.collect()))
            == sorted(map(tuple, via_text.collect())))


# ---------------------------------------------------------------------------
# lsh_bucket_rows expr path
# ---------------------------------------------------------------------------

def _lsh_bucket_rows_r12(df, *, id_col, vec_col, tables, bits, seed=42,
                         dim=None, planes_mode="random", probe_dim=True,
                         payload=None):
    """Verbatim pre-r13 Column-API construction of the
    dedup.lsh_bucket_rows expression path (gemm path unchanged)."""
    from faisssearcher_spark.functions import metrics as M
    from faisssearcher_spark.operators.dedup import lsh_hyperplanes

    payload = list(payload or [])
    v = M.as_double(vec_col)
    idc = F.col(id_col)
    vec_len = int(dim)
    if not probe_dim:
        v = F.when(
            F.assert_true(
                F.size(F.col(vec_col)) == vec_len,
                F.concat(F.lit(f"sign-LSH vector length != declared "
                               f"dim {vec_len}: got "),
                         F.coalesce(F.size(F.col(vec_col))
                                    .cast("string"), F.lit("NULL")))
            ).isNull(), v)
    if planes_mode == "axis":
        def proj(t, j):
            return F.element_at(v, t * bits + j + 1)
    else:
        planes = lsh_hyperplanes(tables, bits, vec_len, seed)

        def proj(t, j):
            hp = F.array(*[F.lit(float(x)) for x in planes[t * bits + j]])
            return F.aggregate(F.zip_with(v, hp, lambda x, y: x * y),
                               F.lit(0.0), lambda a, x: a + x)

    def bucket(t):
        out = F.lit(0)
        for j in range(bits):
            out = out + F.when(proj(t, j) >= 0,
                               F.lit(1 << j)).otherwise(F.lit(0))
        return out.cast("int")

    return df.select(
        idc.alias("id"), *payload,
        F.posexplode(F.array(*[bucket(t) for t in range(tables)]))
        .alias("t", "bucket"))


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.range(6).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(i * (id + 1) % 7 - 3 AS DOUBLE)) AS embedding",
        "CAST(id AS STRING) AS tag")


def test_lsh_bucket_rows_random_parity(vecs):
    from faisssearcher_spark.operators.dedup import lsh_bucket_rows
    new = lsh_bucket_rows(vecs, id_col="vec_id", vec_col="embedding",
                          tables=4, bits=3, dim=8, probe_dim=False,
                          impl="expr", payload=["tag"])
    old = _lsh_bucket_rows_r12(vecs, id_col="vec_id", vec_col="embedding",
                               tables=4, bits=3, dim=8, probe_dim=False,
                               payload=["tag"])
    assert_plan_and_rows_equal(new, old)


def test_lsh_bucket_rows_axis_parity(vecs):
    from faisssearcher_spark.operators.dedup import lsh_bucket_rows
    new = lsh_bucket_rows(vecs, id_col="vec_id", vec_col="embedding",
                          tables=2, bits=3, dim=8, probe_dim=False,
                          planes_mode="axis", impl="expr")
    old = _lsh_bucket_rows_r12(vecs, id_col="vec_id", vec_col="embedding",
                               tables=2, bits=3, dim=8, probe_dim=False,
                               planes_mode="axis")
    assert_plan_and_rows_equal(new, old)


def test_lsh_bucket_rows_probe_parity(vecs):
    # probe_dim=True: no assert gate in the tree, dim probed eagerly
    from faisssearcher_spark.operators.dedup import lsh_bucket_rows
    new = lsh_bucket_rows(vecs, id_col="vec_id", vec_col="embedding",
                          tables=2, bits=2, impl="expr")
    old = _lsh_bucket_rows_r12(vecs, id_col="vec_id", vec_col="embedding",
                               tables=2, bits=2, dim=8, probe_dim=True)
    assert_plan_and_rows_equal(new, old)


# ---------------------------------------------------------------------------
# float16 codec SQL twins (Column input takes the pre-r13 Column path,
# so it doubles as the reference construction)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fvecs(spark):
    return spark.range(4).selectExpr(
        "id AS vec_id",
        "array(CAST(id AS DOUBLE) * 0.3717 - 0.5, 1e-6D * (id + 1), "
        "1023.5D * (id - 2), CAST(id AS DOUBLE) / 3.0) AS embedding")


def test_quantize_f16_sql_parity(fvecs):
    from faisssearcher_spark.functions.vector import quantize_f16
    new = fvecs.select("vec_id", quantize_f16("embedding").alias("c"))
    old = fvecs.select("vec_id",
                       quantize_f16(F.col("embedding")).alias("c"))
    assert_plan_and_rows_equal(new, old)


def test_dequantize_f16_sql_parity(fvecs):
    from faisssearcher_spark.functions.vector import (dequantize_f16,
                                                      quantize_f16)
    coded = fvecs.select("vec_id", quantize_f16("embedding").alias("c"))
    new = coded.select("vec_id", dequantize_f16("c").alias("v"))
    old = coded.select("vec_id", dequantize_f16(F.col("c")).alias("v"))
    assert_plan_and_rows_equal(new, old)


def test_f16_roundtrip_matches_numpy_after_sqltext(fvecs):
    # semantic anchor independent of plan shape: codes still match
    # numpy's float16 bit patterns on representative values
    np = pytest.importorskip("numpy")
    from faisssearcher_spark.functions.vector import quantize_f16
    rows = (fvecs.select("vec_id", "embedding",
                         quantize_f16("embedding").alias("c"))
            .orderBy("vec_id").collect())
    for row in rows:
        want = np.asarray(row["embedding"],
                          dtype=np.float16).view(np.int16).tolist()
        assert row["c"] == want


# ---------------------------------------------------------------------------
# simhash_expr / hamming_band_rows SQL twins
# ---------------------------------------------------------------------------

def test_simhash_expr_sql_parity(docs):
    from faisssearcher_spark.operators.dedup import simhash_expr
    # Column input takes the pre-r13 Column path -> reference plan
    new = docs.select("doc_id", simhash_expr("text", 32).alias("sh"))
    old = docs.select("doc_id",
                      simhash_expr(F.col("text"), 32).alias("sh"))
    assert_plan_and_rows_equal(new, old)


def test_simhash_expr_sql_parity_63(docs):
    # 63 is the widest constructible width: the bits=64 top mask
    # (1 << 63) exceeds long range in both constructions (pre-r13 the
    # Column path raised at construction; the SQL path falls through to
    # it, preserving that error)
    from faisssearcher_spark.operators.dedup import simhash_expr
    new = docs.select("doc_id", simhash_expr("text", 63).alias("sh"))
    old = docs.select("doc_id",
                      simhash_expr(F.col("text"), 63).alias("sh"))
    assert_plan_and_rows_equal(new, old)


def _hamming_band_rows_r12(fps, *, id_col="id", fp_col="fp", bits,
                           max_hamming, extra_cols=(), fold_key=False):
    """Verbatim pre-r13 Column-API construction of the banded/folded
    selects (the fpc gate above them is unchanged and shared)."""
    from faisssearcher_spark.operators.dedup import hamming_band_widths
    widths = hamming_band_widths(bits, max_hamming)
    offsets = [sum(widths[:b]) for b in range(len(widths))]

    def _band(b):
        col = (F.shiftright(F.col("fp"), offsets[b]) if offsets[b]
               else F.col("fp"))
        if widths[b] >= 64:
            return col
        return col.bitwiseAND(F.lit((1 << widths[b]) - 1))

    fpc = F.col(fp_col).cast("long")
    if bits < 64:
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
    src = fps.filter(F.col(fp_col).isNotNull()) \
        .select(*extras, F.col(id_col).alias("id"), fpc.alias("fp"))
    banded = src.select(
        *extra_cols, "id", "fp",
        F.posexplode(F.array(*[_band(b) for b in range(len(widths))]))
        .alias("band_idx", "band_val"))
    if fold_key:
        return banded.select(
            *extra_cols, "id",
            F.xxhash64("band_idx", "band_val").alias("band_key"), "fp")
    return banded


@pytest.fixture(scope="module")
def fps(spark):
    return spark.range(8).selectExpr(
        "id", "CAST(xxhash64(id) AS BIGINT) AS fp",
        "CAST(id % 2 AS INT) AS grp")


def test_hamming_band_rows_parity(fps):
    from faisssearcher_spark.operators.dedup import hamming_band_rows
    new = hamming_band_rows(fps, bits=64, max_hamming=3, fold_key=True,
                            extra_cols=("grp",))
    old = _hamming_band_rows_r12(fps, bits=64, max_hamming=3,
                                 fold_key=True, extra_cols=("grp",))
    assert_plan_and_rows_equal(new, old)


def test_hamming_band_rows_parity_narrow(fps):
    from faisssearcher_spark.operators.dedup import hamming_band_rows
    narrow = fps.selectExpr("id", "(fp & 65535) AS fp")
    new = hamming_band_rows(narrow, bits=16, max_hamming=2)
    old = _hamming_band_rows_r12(narrow, bits=16, max_hamming=2)
    assert_plan_and_rows_equal(new, old)
