"""Driver-contract meta-tests: every query has an oracle, entry() runs.

The driver compares queries() vs oracle_sql() per key and smoke-checks
entry(); these tests catch contract drift (a new query missing its
oracle, a renamed column, a broken import) before the driver does.
"""

import importlib

import pytest


@pytest.fixture(scope="module")
def entrymod():
    return importlib.import_module("__spark_entry__")


def test_every_query_has_an_oracle(entrymod):
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles - qs == set(), "oracle without a query"
    assert qs - oracles == set(), "query without an oracle (rows-only)"


def test_entry_runs_and_returns_rows(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_run_at_smallest_sf(spark, entrymod):
    # every driver query must at least EXECUTE at sf0.001 (values are
    # checked by scripts/check_correctness.py / the driver gate)
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
