"""Pure-SQL surface for the metric library: temporary SQL scalar
functions (Spark ``CREATE FUNCTION … RETURN <expr>`` — resolved by
Catalyst into the SAME codegen'd expressions as the Column API, zero
Python in the hot path) so SQL-only users get the reference's full
measurement set (M1-M10, ``backend/faiss_searcher.py:75-90``) without
touching the DataFrame API:

    from faisssearcher_spark.functions.sqlapi import register_sql_functions
    register_sql_functions(spark)
    spark.sql(\"\"\"
        SELECT a.vec_id, b.vec_id, fs_cos(a.embedding, b.embedding) AS s
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY s DESC LIMIT 10
    \"\"\")

Every function mirrors ``functions/metrics.py`` exactly — zero-norm
cosine is NULL, l2 is the SQUARED FAISS distance, l_p omits the root,
Canberra zeroes 0/0 terms, Jensen-Shannon uses the unnormalized-FAISS
form — and the parity is pinned in tests against the Column API on the
driver corpus. Functions are session-scoped temporaries (idempotent
re-registration); the ``fs_`` prefix keeps the session namespace
polite.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: (name, parameter list, return type, body) — bodies are plain Spark
#: SQL expressions; callers pass float arrays freely (implicit cast).
_DOT = ("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)")
_NRM = ("sqrt(aggregate(zip_with({v}, {v}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
#: whitespace tokens, empties dropped (functions/text.tokens)
_TOKS = r"filter(split(trim(t), '\\s+'), x -> x != '')"

_FUNCTIONS: "list[tuple[str, str, str, str]]" = [
    # -- metric library (M1-M10) ------------------------------------------
    ("fs_dot", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE", _DOT),
    ("fs_norm", "a ARRAY<DOUBLE>", "DOUBLE", _NRM.format(v="a")),
    ("fs_cos", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     f"CASE WHEN {_NRM.format(v='a')} * {_NRM.format(v='b')} <> 0.0 "
     f"THEN ({_DOT}) / ({_NRM.format(v='a')} * {_NRM.format(v='b')}) "
     "END"),
    ("fs_l2", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    ("fs_l2_true", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"),
    ("fs_l1", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    ("fs_linf", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "array_max(zip_with(a, b, (x, y) -> abs(x - y)))"),
    ("fs_lp", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>, p DOUBLE", "DOUBLE",
     "aggregate(zip_with(a, b, (x, y) -> pow(abs(x - y), p)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    ("fs_braycurtis", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "CASE WHEN aggregate(zip_with(a, b, (x, y) -> abs(x + y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) <> 0.0 "
     "THEN aggregate(zip_with(a, b, (x, y) -> abs(x - y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) "
     "/ aggregate(zip_with(a, b, (x, y) -> abs(x + y)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) END"),
    ("fs_canberra", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "aggregate(zip_with(a, b, (x, y) -> CASE WHEN abs(x) + abs(y) <> 0.0 "
     "THEN abs(x - y) / (abs(x) + abs(y)) ELSE 0.0 END), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    ("fs_jensen_shannon", "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
     "0.5 * aggregate(zip_with(a, b, (x, y) -> "
     "(CASE WHEN x > 0.0 THEN x * ln(2.0 * x / (x + y)) ELSE 0.0 END) + "
     "(CASE WHEN y > 0.0 THEN y * ln(2.0 * y / (x + y)) ELSE 0.0 END)), "
     "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    # the norm is staged through array_repeat + zip_with, NOT referenced
    # inside a transform lambda: Catalyst does not CSE inside
    # higher-order-function lambdas, so `transform(a, x -> x / norm(a))`
    # re-runs the O(k) aggregate per element — O(k²) per vector (the
    # trap the Column API's l2_normalize documents)
    ("fs_l2_normalize", "a ARRAY<DOUBLE>", "ARRAY<DOUBLE>",
     f"CASE WHEN {_NRM.format(v='a')} = 0.0 THEN a "
     f"ELSE zip_with(a, array_repeat({_NRM.format(v='a')}, size(a)), "
     f"(x, n) -> x / n) END"),
    # -- dedup-key text functions (functions/text.py twins) ---------------
    ("fs_tokens", "t STRING", "ARRAY<STRING>", _TOKS),
    ("fs_token_count", "t STRING", "INT", f"size({_TOKS})"),
    ("fs_fingerprint", "t STRING", "STRING",
     f"md5(array_join(array_sort(array_distinct("
     f"transform({_TOKS}, x -> lower(x)))), ' '))"),
    ("fs_normalize_text", "t STRING", "STRING",
     r"trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9\\s]', ' '),"
     r" '\\s+', ' '))"),
    ("fs_md5int", "t STRING", "BIGINT",
     "CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)"),
    # -- fingerprint / 1-bit codec functions (vector.py / dedup twins) ----
    ("fs_hamming", "a BIGINT, b BIGINT", "INT", "bit_count(a ^ b)"),
    ("fs_b1_pack", "a ARRAY<DOUBLE>", "ARRAY<BIGINT>",
     "CASE WHEN size(a) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
     "ELSE transform(sequence(0, CAST((size(a) + 31) / 32 AS INT) - 1), "
     "w -> aggregate(slice(a, w * 32 + 1, 32), "
     "named_struct('acc', CAST(0 AS BIGINT), 'wt', CAST(1 AS BIGINT)), "
     "(s, x) -> named_struct('acc', s.acc + CASE WHEN x >= 0 THEN s.wt "
     "ELSE CAST(0 AS BIGINT) END, 'wt', s.wt * 2), s -> s.acc)) END"),
    ("fs_b1_hamming", "a ARRAY<BIGINT>, b ARRAY<BIGINT>", "BIGINT",
     "aggregate(zip_with(a, b, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)),"
     " CAST(0 AS BIGINT), (acc, v) -> acc + v)"),
    # Matryoshka prefix + renormalize (functions/vector.mrl_truncate
    # twin; zero-norm -> NaN like the Column API's default). Same
    # HOF-CSE staging as fs_l2_normalize: the prefix norm is computed
    # once outside the lambda, not O(k) per element.
    ("fs_mrl", "a ARRAY<DOUBLE>, k INT", "ARRAY<DOUBLE>",
     f"zip_with(slice(a, 1, k), "
     f"array_repeat({_NRM.format(v='slice(a, 1, k)')}, "
     f"size(slice(a, 1, k))), (x, n) -> x / n)"),
]


def register_sql_functions(spark: SparkSession) -> "list[str]":
    """Register the ``fs_*`` temporary SQL functions in the session.
    Returns the registered names. Idempotent (CREATE OR REPLACE)."""
    names = []
    for name, params, rtype, body in _FUNCTIONS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
                  f"RETURNS {rtype} RETURN {body}")
        names.append(name)
    return names
