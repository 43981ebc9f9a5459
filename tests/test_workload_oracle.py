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


def _driver_excluded():
    # every oracle-gated query NOT on the curated 50-entry driver surface
    import __spark_entry__ as E

    return sorted((set(QUERIES) & set(ORACLES)) - set(E.queries()))


@pytest.mark.parametrize("name", _driver_excluded())
def test_retired_gate_matches_oracle_at_driver_sf(spark, name):
    """Gates kept off the 50-entry driver surface keep DRIVER-SF rigor
    here: the same comparison the driver runs, at sf0.01 — so surface
    curation never weakens any gate's verification tier."""
    from tests.conftest import SF_CORRECT

    df = QUERIES[name](spark, SF_CORRECT)
    ok, msg = compare(df, ORACLES[name], SF_CORRECT)
    assert ok, f"{name}: {msg}"
