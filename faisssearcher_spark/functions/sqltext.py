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

_SIMPLE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def is_simple_name(s: object) -> bool:
    """True iff ``s`` is a plain identifier string that can be spliced
    into SQL text verbatim with the same meaning ``F.col`` gives it
    (no dots — ``F.col("a.b")`` is a qualified/struct reference, which
    raw SQL splicing would also honor, but quoting rules differ; no
    spaces/backticks — those need quoting that ``F.col`` applies
    differently). Callers fall back to the Column path otherwise."""
    return isinstance(s, str) and bool(_SIMPLE.match(s))


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
