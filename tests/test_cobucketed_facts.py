"""Co-bucketed fact⋈fact layout for the TPC-H-shape workload (the VERDICT
r3 plan-audit caveat on q3): lineitem and orders written bucketed+sorted on
the order key run the q3 join AND its group-by with ZERO Exchange — the
bucket layout replaces both shuffles, which is the remedy for the sf10
cache/spill variance on the 60M-row aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from treemachine_spark.io.tables import load_tables
from treemachine_spark.operators.scale import write_bucketed
from treemachine_spark.workload.queries import q3_plan, q5_plan

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fact_tables(spark):
    t = load_tables(spark, SF_SMOKE)
    write_bucketed(t["lineitem"], "t_li_bkt", "l_orderkey", n_buckets=8)
    write_bucketed(t["orders"], "t_ord_bkt", "o_orderkey", n_buckets=8)
    yield "t_li_bkt", "t_ord_bkt"
    spark.sql("DROP TABLE IF EXISTS t_li_bkt")
    spark.sql("DROP TABLE IF EXISTS t_ord_bkt")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_q3_plan_has_no_exchange(spark, fact_tables):
    li_t, ord_t = fact_tables
    t = load_tables(spark, SF_SMOKE)
    # merge hints: at sf0.001 Catalyst would broadcast the small fact side,
    # which hides the point — at 100 TB both facts are shuffle-scale and
    # SMJ-over-buckets is the layout's whole purpose
    q = q3_plan(
        spark.table(li_t).hint("merge"),
        spark.table(ord_t).hint("merge"),
        t["customer"],
    )
    plan = _plan(q)
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # zero SHUFFLE exchange: the join consumes the bucket layout and the
    # group-by's clustered distribution is satisfied by
    # hashpartitioning(orderkey) (a grouping-key subset); top-k is
    # TakeOrderedAndProject. The customer dim's BroadcastExchange is the
    # intended star shape, not a shuffle.
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_cobucketed_q5_single_agg_exchange(spark, fact_tables):
    li_t, ord_t = fact_tables
    t = load_tables(spark, SF_SMOKE)
    q = q5_plan(
        spark.table(li_t).hint("merge"),
        spark.table(ord_t).hint("merge"),
        t["customer"],
        t["nation"],
        t["region"],
    )
    plan = _plan(q)
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # the fact⋈fact join is Exchange-free; the ONLY shuffle left is the
    # final (r_name, n_name) aggregate — map-side-combined, group-scale
    assert plan.count("Exchange hashpartitioning") == 1, plan
    base = sorted(
        tuple(r)
        for r in q5_plan(
            t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
        ).collect()
    )
    bkt = sorted(tuple(r) for r in q.collect())
    assert base == bkt


def test_cobucketed_q3_matches_parquet_q3(spark, fact_tables):
    li_t, ord_t = fact_tables
    t = load_tables(spark, SF_SMOKE)
    base = q3_plan(t["lineitem"], t["orders"], t["customer"]).collect()
    bkt = q3_plan(
        spark.table(li_t).hint("merge"),
        spark.table(ord_t).hint("merge"),
        t["customer"],
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in bkt]


@pytest.fixture()
def detected_layout(spark):
    """Convention-named layout (io/tables._with_bucketed_facts) + env flag."""
    import os

    t = load_tables(spark, SF_SMOKE)
    write_bucketed(t["lineitem"], "det_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(t["orders"], "det_orders", "o_orderkey", n_buckets=8)
    os.environ["TREEMACHINE_BUCKETED_FACTS"] = "det"
    yield "det"
    os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
    spark.sql("DROP TABLE IF EXISTS det_lineitem")
    spark.sql("DROP TABLE IF EXISTS det_orders")


def test_load_tables_detects_bucketed_layout(spark, detected_layout):
    # facts come back as the bucketed catalog tables (VERDICT r14 #3): the
    # real q3/q5 gates inherit the layout with identical result rows
    t = load_tables(spark, SF_SMOKE)
    # a bare scan never reports "Bucketed: true" (autoBucketedScan disables
    # bucketing when nothing exploits it) — assert the facts are served from
    # the catalog tables, then that a fact⋈fact join consumes the buckets
    for logical in ("lineitem", "orders"):
        assert f"det_{logical}" in _plan(t[logical]), logical
    joined = q3_plan(
        t["lineitem"].hint("merge"), t["orders"].hint("merge"), t["customer"]
    )
    assert "Bucketed: true" in _plan(joined)
    import os

    q_b = sorted(
        tuple(r) for r in q3_plan(t["lineitem"], t["orders"], t["customer"]).collect()
    )
    os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
    tp = load_tables(spark, SF_SMOKE)
    q_p = sorted(
        tuple(r)
        for r in q3_plan(tp["lineitem"], tp["orders"], tp["customer"]).collect()
    )
    assert q_b == q_p


def test_load_tables_bucketed_tripwire_raises_on_stale_layout(spark):
    # a layout whose row count drifted from the parquet inputs must fail
    # loud, never silently serve different data
    import os

    from treemachine_spark.io import tables as io_tables

    t = load_tables(spark, SF_SMOKE)
    write_bucketed(
        t["lineitem"].limit(10), "stale_lineitem", "l_orderkey", n_buckets=8
    )
    write_bucketed(t["orders"], "stale_orders", "o_orderkey", n_buckets=8)
    os.environ["TREEMACHINE_BUCKETED_FACTS"] = "stale"
    try:
        io_tables._BUCKETED_VALIDATED.clear()
        with pytest.raises(ValueError, match="stale"):
            load_tables(spark, SF_SMOKE)
    finally:
        os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
        spark.sql("DROP TABLE IF EXISTS stale_lineitem")
        spark.sql("DROP TABLE IF EXISTS stale_orders")


def test_load_tables_without_layout_unchanged(spark):
    # env set but tables absent -> plain parquet (the driver's default path)
    import os

    os.environ["TREEMACHINE_BUCKETED_FACTS"] = "absent"
    try:
        t = load_tables(spark, SF_SMOKE)
        assert "Bucketed: true" not in _plan(t["lineitem"])
    finally:
        os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
