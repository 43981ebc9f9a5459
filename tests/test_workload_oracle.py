"""Differential tests: every queries() entry vs its DuckDB oracle at sf0.001
(fast). The driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_check import compare
from treemachine_spark.workload.oracles import ORACLES
from treemachine_spark.workload.queries import QUERIES


def test_suite_is_consistent():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL-expressible oracle)")
    df = QUERIES[name](spark, SF_SMOKE)
    ok, msg = compare(df, ORACLES[name], SF_SMOKE)
    assert ok, f"{name}: {msg}"
