"""Driver-contract invariants for __spark_entry__ (no Spark session):
registration-order policy, oracle coverage, and name hygiene."""

from __future__ import annotations

import importlib.util
import sys


def _entry():
    if "_spark_entry_module" in sys.modules:
        return sys.modules["_spark_entry_module"]
    spec = importlib.util.spec_from_file_location(
        "_spark_entry_module", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["_spark_entry_module"] = mod
    return mod


def test_every_oracle_has_a_query_and_all_oracles_run_first():
    e = _entry()
    q = list(e.queries())
    o = set(e.oracle_sql())
    # no stale oracle entries
    assert o <= set(q), sorted(o - set(q))
    # the driver's wall budget truncates from the back: every
    # oracle-bearing query must be registered BEFORE any rows-only one
    flags = [name in o for name in q]
    first_rows_only = flags.index(False)
    assert not any(flags[first_rows_only:]), (
        "oracle-bearing query registered after a rows-only one: "
        + str([n for n, f in zip(q, flags) if f and q.index(n) > first_rows_only])
    )


def test_rows_only_tail_is_the_known_non_sql_set():
    e = _entry()
    q = list(e.queries())
    o = set(e.oracle_sql())
    rows_only = {n for n in q if n not in o}
    # growing this set requires a deliberate decision: every new query
    # should ship a DuckDB twin unless it is genuinely non-SQL
    assert rows_only == {
        "serve_requests",
        "pipeline_seq2seq",
        "pipeline_mentions",
        "minhash_dedup_pairs",
        "pipeline_windows",
        "pipeline_triples",
        "pipeline_span_eval",
        "pipeline_np_model",
    }


def test_query_names_are_stable_identifiers():
    e = _entry()
    for name in e.queries():
        assert name.isidentifier() and name == name.lower()
