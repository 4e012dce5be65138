"""The main correctness gate: every registered query hash-matches its DuckDB
oracle at sf0.001 (the driver does the same at sf0.01 — run
``python -m tests.oracle_compare --sf-dir /root/testdata/sf0.01`` before
claiming an operator done)."""

from __future__ import annotations

import pytest

from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
from tests.oracle_compare import compare_query

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"


def test_registry_contract():
    queries = all_queries()
    assert len(queries) >= 40
    # driver contract: every oracle key has a query; every query has a doc
    for name, q in queries.items():
        assert q.builder is not None
        assert q.doc, f"{name} is missing a docstring"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
