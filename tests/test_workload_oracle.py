"""Differential test: every workload query vs its DuckDB oracle (the local
replica of the driver's t2 correctness gate), at sf0.001 for speed.

Run with SPARK_GRAFT_SF_SMALL=/root/testdata/sf0.01 for the full-size check.
"""

from __future__ import annotations

import pytest

from arc_spark.workload import ORACLES, QUERIES
from tests._oracle import compare

ORACLE_QUERIES = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    ok, msg = compare(df, ORACLES[name], sf_small)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema) > 0
