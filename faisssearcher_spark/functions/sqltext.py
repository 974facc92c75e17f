"""SQL-text rendering helpers for the hot wide-expression builders.

Why this exists (r13, guide §4's JVM<->Python boundary — driver
flavor): constructing a wide expression tree through per-node
``pyspark.sql.functions`` calls costs one py4j round-trip PER NODE
(~0.25 ms each on this interpreter). The signature / sign-plane /
float16-codec builders reach 1,000-5,000 round-trips per call — i.e.
0.5-2.5 s of pure driver-side socket chatter per *invocation*, which
cProfile shows as ``socket.recv_into`` under ``send_command`` (the
store-arc measurements in OPTIMIZATION_r13.md). Rendering the SAME
expression as one SQL string costs a single round-trip: the JVM
parses it in microseconds.

The rewrites are plan-preserving by construction (same operators,
same literals, same lambda-variable names) and PINNED by
tests/test_sqltext_parity.py, which asserts canonicalized-optimized-
plan equality between each SQL-text form and a Column-API replica of
the pre-r13 construction, plus exact result equality.

Only simple identifier column names can be spliced into SQL text; the
builders fall back to their Column-API forms for anything else (see
:func:`is_simple_name`).
"""
from __future__ import annotations

import re

_SIMPLE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

# Words that Spark's parser resolves as something OTHER than a column
# reference even when a column of that name exists: the literal
# keywords, and the niladic-function grammar forms that parse as
# function calls without parentheses. Splicing one raw would silently
# read the literal/function instead of the column ``F.col`` resolves.
_NON_COLUMN_WORDS = frozenset({
    "null", "true", "false",
    "current_date", "current_timestamp", "current_time",
    "current_user", "session_user", "user",
    "localtime", "localtimestamp",
})


def _session_splice_safe() -> bool:
    """False when the active session carries a parser config under which
    the rendered SQL would mean something different from the Column
    construction: ``escapedStringLiterals=true`` disables backslash
    processing (breaking :func:`sql_str` / the ``\\s+`` tokenizer
    pattern), and ``ansi.enforceReservedKeywords=true`` turns
    reserved-word identifiers that ``F.col`` resolves fine into parse
    errors. Both default false; checking per call (two conf reads,
    ~0.5 ms) keeps runtime ``spark.conf.set`` honest."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    return (spark.conf.get("spark.sql.parser.escapedStringLiterals",
                           "false").lower() != "true"
            and spark.conf.get("spark.sql.ansi.enforceReservedKeywords",
                               "false").lower() != "true")


def is_simple_name(s: object) -> bool:
    """True iff ``s`` is a plain identifier string that can be spliced
    into SQL text verbatim with the same meaning ``F.col`` gives it
    (no dots — ``F.col("a.b")`` is a qualified/struct reference, which
    raw SQL splicing would also honor, but quoting rules differ; no
    spaces/backticks — those need quoting that ``F.col`` applies
    differently; no keyword-literals or bare niladic-function names —
    those parse as non-column expressions; and no session parser
    configs that change what the rendered text means). Callers fall
    back to the Column path otherwise."""
    return (isinstance(s, str) and bool(_SIMPLE.fullmatch(s))
            and s.lower() not in _NON_COLUMN_WORDS
            and _session_splice_safe())


def sql_str(s: str) -> str:
    """A single-quoted SQL string literal that parses back to exactly
    ``s`` (backslashes and quotes escaped — Spark's default parser
    processes backslash escapes inside string literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_double(x: float) -> str:
    """An exact DOUBLE literal: ``repr`` round-trips every finite
    Python float (shortest correctly-rounded decimal), and Spark's
    ``D``-suffixed literals parse with correctly-rounded
    ``parseDouble`` — so the JVM literal is bit-identical to
    ``F.lit(float(x))``. Non-finite values need a cast form (no
    literal syntax); they constant-fold to the same Literal."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"
