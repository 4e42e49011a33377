"""Golden-oracle parity: every registered query vs its DuckDB oracle.

This is a local mirror of the driver's t2 correctness gate (SURVEY.md §5),
run at sf0.001 for speed (the driver uses sf0.01 — same data generator, so
parity here strongly predicts parity there).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.compare import compare, duckdb_connect

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_shape():
    assert QUERIES, "no queries registered"
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_priority_names_exist():
    """A typo'd _PRIORITY entry silently wastes one of the ~50 slots the
    external driver records — every listed name must be a real query."""
    from acero_delta_lake_streaming_spark.queries import _PRIORITY

    stale = [n for n in _PRIORITY if n not in QUERIES]
    assert not stale, f"_PRIORITY names not in registry: {stale}"
    dupes = [n for n in set(_PRIORITY) if _PRIORITY.count(n) > 1]
    assert not dupes, f"duplicate _PRIORITY entries: {dupes}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    con = duckdb_connect(sf_dir)
    oracle_pdf = con.execute(ORACLES[name]).df()
    spark_df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(spark_df, oracle_pdf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    """Non-SQL-expressible operators: must run and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    df.collect()  # must execute without error


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
