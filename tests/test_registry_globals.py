"""Static guard for the registry: every global a query function loads
must resolve at module scope. Catches the bug class where an edit leaves
a dangling name inside a rarely-executed branch (a bench-only query
referencing a gate-local variable shipped broken in round 7 — the bench
run caught it; this catches it at pytest speed, no Spark needed)."""

import builtins
import dis

from faisssearcher_spark import registry


def _load_globals(code, acc):
    for ins in dis.get_instructions(code):
        if ins.opname == "LOAD_GLOBAL":
            acc.add(ins.argval)
    for const in code.co_consts:
        if hasattr(const, "co_code"):
            _load_globals(const, acc)


def test_every_query_fn_resolves_its_globals():
    missing = {}
    for name, fn in registry.ALL_QUERY_FNS.items():
        want = set()
        _load_globals(fn.__code__, want)
        bad = [g for g in want
               if g not in fn.__globals__ and not hasattr(builtins, g)]
        if bad:
            missing[name] = bad
    assert not missing, f"unresolvable globals: {missing}"


def test_every_oracle_is_a_string():
    from faisssearcher_spark.registry import QUERIES
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    for q, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), q
        assert q in QUERIES, f"oracle for unknown query {q}"
