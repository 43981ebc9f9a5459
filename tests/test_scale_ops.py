"""Skew utilities + bucketed-join shuffle elimination + A7/A8 metrics."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from treemachine_spark.operators.scale import (
    salted_groupby_count,
    salted_join,
    write_bucketed,
)

FIX = Path(__file__).parent / "fixtures"


def test_salted_groupby_count_exact(spark):
    df = spark.range(10_000).select(
        F.when(F.col("id") % 100 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k")
    )
    got = {r["k"]: r["count"] for r in salted_groupby_count(df, "k").collect()}
    want = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert got == want


def test_salted_join_equals_plain_join(spark):
    big = spark.range(5_000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    got = sorted(
        (r["k"], r["v"], r["w"]) for r in salted_join(big, small, "k").collect()
    )
    want = sorted((r["k"], r["v"], r["w"]) for r in big.join(small, "k").collect())
    assert got == want


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        write_bucketed(a, "bkt_a", "k", n_buckets=8)
        write_bucketed(b, "bkt_b", "k", n_buckets=8)
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        # co-bucketed tables join without any Exchange (shuffle)
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_a7_a8_metrics(spark):
    from treemachine_spark.exporters.exports import edge_support, node_support_metrics
    from treemachine_spark.ingest import ingest_synthesis_data

    store = ingest_synthesis_data(
        spark,
        str(FIX / "labelled_supertree.tre"),
        str(FIX / "annotations.json"),
        str(FIX / "taxonomy.tsv"),
    )
    m = {r["node_id"]: r for r in node_support_metrics(store).collect()}
    # A7: weighted effpar over a tip's single-node subtree = its own effpar
    assert m["ott536234"]["subtree_weighted_effpar"] == pytest.approx(1.0)
    assert m["ott81461"]["subtree_weighted_effpar"] is not None
    es = {(r["child_id"], r["parent_id"]): r["edge_support"] for r in edge_support(store).collect()}
    # single parallel edge / subtree source count
    assert es[("ott536234", "mrcaott246ott5481")] == pytest.approx(1.0)
    assert 0 < es[("ott5839486", "ott81461")] <= 1.0


def test_bloom_prune_no_false_negatives_and_no_join(spark):
    from tests.conftest import SF_SMOKE
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.operators.scale import bloom_filter_build, bloom_prune

    t = load_tables(spark, SF_SMOKE)
    dim = t["supplier"].where(F.col("s_acctbal") > 9000).select("s_suppkey")
    bits = bloom_filter_build(dim, "s_suppkey", m=8192, k=3)
    assert len(bits) == 8192 and set(bits) <= {"0", "1"}

    cand = bloom_prune(t["lineitem"], "l_suppkey", bits, k=3)
    true_keys = {r.s_suppkey for r in dim.collect()}
    cand_keys = {r.l_suppkey for r in cand.select("l_suppkey").distinct().collect()}
    # no false negatives: every matching key survives the filter
    fact_keys = {
        r.l_suppkey for r in t["lineitem"].select("l_suppkey").distinct().collect()
    }
    assert (true_keys & fact_keys) <= cand_keys

    # the prune is a pure filter: no join / exchange in the plan
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan

    # false-positive rate within ~4x of the theoretical (1-e^{-kn/m})^k
    import math

    n = len(true_keys)
    fpr_theory = (1 - math.exp(-3 * n / 8192)) ** 3
    non_match = cand_keys - true_keys
    universe = fact_keys - true_keys
    if universe:
        assert len(non_match) / len(universe) <= max(4 * fpr_theory, 0.02)
