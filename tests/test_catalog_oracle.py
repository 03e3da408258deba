"""The correctness gate, locally: every catalog query with an oracle must
hash-match DuckDB on the sf test dir (driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

from pandas_etl_spark.catalog import ORACLES, QUERIES

from tests.oracle_harness import compare, run_oracle

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    opdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
