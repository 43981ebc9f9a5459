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
