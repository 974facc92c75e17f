"""Property test: the DuckDB sampler-oracle arithmetic is the md5 bucket.

The correctness gate's sampler oracles re-derive bucket membership in SQL
(registry._sample_bucket_sql); Spark derives it via functions.text.md5_int
(tests elsewhere pin Spark == Python). This closes the triangle with a
fast engine-free property: DuckDB's expression equals the reference
Python computation for arbitrary keys, seeds, and op salts — so a change
to either side of the oracle pair cannot drift silently.
"""

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from faisssearcher_spark.registry import _sample_bucket_sql

SAMPLE_DENOM = 1_000_000


def _python_bucket(key: str, seed: int, op: str) -> int:
    prefix = f"{op}|{seed}|" if op else f"{seed}|"
    h = hashlib.md5(f"{prefix}{key}".encode()).hexdigest()
    return int(h[:8], 16) % SAMPLE_DENOM


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(key=st.integers(min_value=0, max_value=10**15),
       seed=st.integers(min_value=0, max_value=10**6),
       op=st.sampled_from(["", "sample", "pack", "split"]))
def test_duckdb_bucket_equals_python(key, seed, op):
    con = duckdb.connect()
    expr = _sample_bucket_sql(str(key), seed=seed, op=op)
    got = con.execute(f"SELECT {expr}").fetchone()[0]
    assert got == _python_bucket(str(key), seed, op)


@settings(max_examples=50, deadline=None)
@given(key=st.text(alphabet=st.characters(min_codepoint=33,
                                          max_codepoint=126),
                   min_size=1, max_size=40))
def test_string_keys_match(key):
    # oracle call sites quote keys as SQL string literals
    if "'" in key:
        key = key.replace("'", "")
        if not key:
            return
    con = duckdb.connect()
    expr = _sample_bucket_sql(f"'{key}'", seed=42, op="sample")
    got = con.execute(f"SELECT {expr}").fetchone()[0]
    assert got == _python_bucket(key, 42, "sample")
