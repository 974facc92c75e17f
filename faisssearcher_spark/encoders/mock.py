"""Deterministic hash-projection encoder for tests and oracle checks.

The reference's encoders are BERT models (backend/bert_encoder.py) — heavy,
non-deterministic across library versions, and irrelevant to the engine's
query semantics. For testing the *engine* (encode → whiten → normalize →
index → search), what matters is a deterministic ``text → vector`` map.

This encoder is deliberately **SQL-expressible**: the embedding of a text is
the token-frequency-weighted sum of per-token hash vectors, where component
``j`` of token ``t`` is derived from ``md5(t || ':' || j)``:

    h(t, j) = ((first 8 hex chars of md5(f"{t}:{j}") as int) % 2001 - 1000) / 1000
    e_j(text) = sum over tokens t (with multiplicity) of h(t, j)

md5 is available and bit-identical in Python (hashlib), Spark SQL (``md5``)
and DuckDB (``md5``), so the full encoder→knn pipeline can be verified
against a DuckDB oracle — something the reference (zero tests) never had.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\s+")


def _token_component(token: str, j: int) -> float:
    h = hashlib.md5(f"{token}:{j}".encode("utf-8")).hexdigest()
    return (int(h[:8], 16) % 2001 - 1000) / 1000.0


class HashingEncoder:
    """Deterministic text encoder implementing the :class:`Encoder` protocol
    (reference contract: base_encoder.py:9-10)."""

    def __init__(self, dim: int = 8):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, token: str) -> np.ndarray:
        vec = self._cache.get(token)
        if vec is None:
            vec = np.array([_token_component(token, j) for j in range(self.dim)],
                           dtype=np.float64)
            self._cache[token] = vec
        return vec

    def encode(self, items, verbose: int = 0) -> np.ndarray:
        texts = list(items)
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            for tok in _TOKEN_RE.split(str(text).strip()):
                if tok:
                    out[i] += self._token_vec(tok)
        return out.astype(np.float32)

    # -- SQL twins (used to build oracle strings and pure-Catalyst paths) --

    def spark_expr(self, col: Column | str) -> Column:
        """Pure-Catalyst equivalent of :meth:`encode` (no Python boundary)."""
        c = F.col(col) if isinstance(col, str) else col
        toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")

        # closure factory, NOT `lambda acc, t, j=j: ...` — pyspark counts
        # the defaulted parameter and binds a 3-arg lambda, which
        # ArrayAggregate's 2-arg merge slot rejects at analysis
        def _merge(j: int):
            return lambda acc, t: acc + (
                F.conv(F.substring(F.md5(F.concat(t, F.lit(f":{j}"))), 1, 8),
                       16, 10).cast("long") % 2001 - 1000) / 1000.0

        comps = [F.aggregate(toks, F.lit(0.0), _merge(j))
                 for j in range(self.dim)]
        return F.array(*comps)

    def duckdb_sql(self, col_sql: str) -> str:
        """DuckDB SQL expression computing the same embedding (list<double>)."""
        toks = (f"list_filter(regexp_split_to_array(trim({col_sql}), '\\s+'),"
                f" t -> t != '')")
        comps = ", ".join(
            "coalesce(list_sum(list_transform({toks}, t -> "
            "((('0x' || substring(md5(t || ':{j}'), 1, 8))::BIGINT % 2001)"
            " - 1000) / 1000.0)), 0.0)".format(toks=toks, j=j)
            for j in range(self.dim)
        )
        return f"[{comps}]"
