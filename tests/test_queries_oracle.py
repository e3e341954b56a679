"""Run every __spark_entry__ query that has a DuckDB oracle and compare —
an in-repo replica of the driver's correctness gate, at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_UNIT
from tests.oracle_compare import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_UNIT)
    assert_matches_oracle(df, ORACLES[name], SF_UNIT, float_tol=1e-6)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_UNIT)
    assert df.count() >= 0 and len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
