"""Driver-surface contract tests: the CORRECTNESS artifact captures the
first 50 queries() entries, so __spark_entry__ exposes a curated 50-gate
view (never-driver-verified gates first, redundant near-duplicates retired
to the pytest-only tier). These tests pin that contract so a future edit
can't silently push a gate family out of the driver artifact."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import __spark_entry__ as E  # noqa: E402
from treemachine_spark.workload.oracles import ORACLES  # noqa: E402
from treemachine_spark.workload.queries import QUERIES  # noqa: E402

DRIVER_CAP = 50


def test_driver_surface_is_exactly_cap():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) == DRIVER_CAP
    assert set(os_) == set(qs), "every driver gate needs a DuckDB oracle"


def test_front_gates_lead_insertion_order():
    assert list(E.queries())[: len(E._FRONT)] == E._FRONT


def test_excluded_gates_stay_pytest_verified():
    # retired-from-driver gates must remain in the FULL dicts the sf0.001
    # oracle suite iterates — retirement is a surface curation, not a delete
    for name in E._DRIVER_EXCLUDED:
        assert name in QUERIES, name
        assert name in ORACLES, name
    assert not (set(E._DRIVER_EXCLUDED) & set(E.queries()))


def test_front_and_excluded_disjoint_and_known():
    assert not (set(E._FRONT) & set(E._DRIVER_EXCLUDED))
    assert set(E._FRONT) <= set(QUERIES)


def test_lsh_bucket_matmul_matches_jvm_sketch(spark):
    """lsh_topk's precomputed-plane-matrix bucket (band_keys_udf single
    band) must be bit-identical to the JVM signbit_sketch derivation the
    DuckDB oracle mirrors (VERDICT r2 item 6)."""
    from pyspark.sql import functions as F

    from treemachine_spark.functions.similarity import band_keys_udf, signbit_sketch
    from treemachine_spark.io.tables import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    mismatches = (
        emb.select(
            signbit_sketch(F.col("embedding"), 8).alias("jvm"),
            F.element_at(band_keys_udf(1, 8)(F.col("embedding")), 1).alias("arrow"),
        )
        .where(F.col("jvm") != F.col("arrow"))
        .count()
    )
    assert mismatches == 0
