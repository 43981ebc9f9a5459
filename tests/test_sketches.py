"""Sketch family (functions/sketches.py): estimator accuracy vs exact
counts, and the merge laws that make the sketches shuffle-light at scale
(cross-engine bit-identity of the sketch contents is gated by the k1/k2/k5
DuckDB oracles in the workload suite).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from treemachine_spark.functions import sketches as sk
from treemachine_spark.io.tables import load_tables


@pytest.fixture(scope="module")
def li(spark):
    return load_tables(spark, SF_SMOKE)["lineitem"].cache()


def test_kmv_estimate_accuracy(spark, li):
    exact = li.select("l_orderkey").distinct().count()
    est = sk.kmv_estimate(li, "l_orderkey", k=256).collect()[0]
    assert est.k_used == 256
    # k=256 -> expected relative error ~1/sqrt(k) ~ 6%; allow 3 sigma
    assert abs(est.est_distinct - exact) / exact < 0.20


def test_kmv_exact_below_k(spark, li):
    # fewer distinct values than k: the sketch IS the distinct set
    small = li.where(F.col("l_orderkey") < 100)
    exact = small.select("l_orderkey").distinct().count()
    est = sk.kmv_estimate(small, "l_orderkey", k=256).collect()[0]
    assert est.est_distinct == exact == est.k_used


def test_kmv_merge_equals_whole(spark, li):
    a = sk.kmv_sketch(li.where("l_orderkey % 2 = 0"), "l_orderkey")
    b = sk.kmv_sketch(li.where("l_orderkey % 2 = 1"), "l_orderkey")
    merged = sorted(r.h for r in sk.kmv_merge(a, b).collect())
    whole = sorted(r.h for r in sk.kmv_sketch(li, "l_orderkey").collect())
    assert merged == whole


def test_hll_estimate_accuracy(spark, li):
    exact = li.select("l_orderkey").distinct().count()
    est = sk.hll_estimate(sk.hll_sketch(li, "l_orderkey", p=12), p=12)
    # p=12 -> 1.04/sqrt(4096) ~ 1.6% std error; allow 3 sigma
    assert abs(est - exact) / exact < 0.05


def test_hll_merge_equals_whole(spark, li):
    a = sk.hll_sketch(li.where("l_orderkey % 2 = 0"), "l_orderkey")
    b = sk.hll_sketch(li.where("l_orderkey % 2 = 1"), "l_orderkey")
    merged = sorted(tuple(r) for r in sk.hll_merge(a, b).collect())
    whole = sorted(tuple(r) for r in sk.hll_sketch(li, "l_orderkey").collect())
    assert merged == whole


def test_cms_point_estimates_upper_bound_and_tight(spark):
    t = load_tables(spark, SF_SMOKE)
    ev = t["events"]
    exact = {
        r.user_id: r.cnt
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    est = {r.key: r.est_count for r in sk.cms_topk(ev, "user_id", k=10**6).collect()}
    assert set(est) == set(exact)
    for k, v in exact.items():
        # CM estimates never undercount; width=2048 >> 150 keys so
        # collisions are rare and estimates are near-exact here
        assert est[k] >= v
        assert est[k] - v <= max(5, 0.05 * v)


def test_cms_merge_equals_whole(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    a = sk.cms_sketch(ev.where("event_id % 2 = 0"), "user_id")
    b = sk.cms_sketch(ev.where("event_id % 2 = 1"), "user_id")
    merged = sorted(tuple(r) for r in sk.cms_merge(a, b).collect())
    whole = sorted(tuple(r) for r in sk.cms_sketch(ev, "user_id").collect())
    assert merged == whole


def test_kmv_plan_is_take_ordered(spark, li):
    # the min-k sketch must compile to TakeOrdered (per-partition top-k),
    # never a global sort — the property that keeps it one narrow pass at
    # any scale
    plan = sk.kmv_sketch(li, "l_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


# ---------------------------------------------------------------------------
# bottom-k quantile sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tokdf(spark):
    from treemachine_spark.functions import text

    docs = load_tables(spark, SF_SMOKE)["documents"]
    return docs.select(text.token_count(F.col("text")).alias("n")).cache()


def test_quantile_estimate_accuracy(spark, tokdf):
    est = sk.quantile_estimate(sk.quantile_sketch(tokdf, "n", k=128), (0.5, 0.9))
    exact = tokdf.agg(
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.9)").alias("p90"),
    ).first()
    # bottom-k with k=128 over a few hundred distinct values: ~10% rank
    # error tolerance (accuracy pinned; exactness is the k>=domain case)
    assert abs(est[0.5] - exact["p50"]) / exact["p50"] < 0.15
    assert abs(est[0.9] - exact["p90"]) / exact["p90"] < 0.15


def test_quantile_exact_when_k_covers_domain(spark, tokdf):
    ndistinct = tokdf.distinct().count()
    est = sk.quantile_estimate(
        sk.quantile_sketch(tokdf, "n", k=ndistinct + 10), (0.5,)
    )
    # with the full domain sampled the sketch IS the histogram: the
    # estimate is the exact lower-quantile value
    rows = sorted(r["n"] for r in tokdf.collect())
    import math

    lower_median = rows[math.ceil(0.5 * len(rows)) - 1]
    assert est[0.5] == lower_median


def test_quantile_merge_equals_whole(spark, tokdf):
    a = tokdf.where(F.col("n") % 2 == 0)
    b = tokdf.where(F.col("n") % 2 == 1)
    merged = sk.quantile_merge(
        sk.quantile_sketch(a, "n", k=64), sk.quantile_sketch(b, "n", k=64), k=64
    )
    whole = sk.quantile_sketch(tokdf, "n", k=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_quantile_sketch_plan_is_take_ordered(spark, tokdf):
    plan = sk.quantile_sketch(tokdf, "n", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # map-side combine before the distinct-value shuffle
    assert "partial_count" in plan or "HashAggregate" in plan


# ---------------------------------------------------------------------------
# per-group bottom-k quantile sketch (the x4/x8 percentile shape at scale)
# ---------------------------------------------------------------------------


def _lang_tokens(spark, sf_dir):
    from treemachine_spark.functions import text

    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select("lang", text.token_count(F.col("text")).alias("n"))


def _exact_type1(rows, q):
    """Exact lower-value (type-1) quantile: smallest v with CDF >= q."""
    import math

    rows = sorted(rows)
    return rows[math.ceil(q * len(rows)) - 1]


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"])
def test_grouped_quantiles_exact_when_k_covers_domain(spark, sf_dir):
    """A group with <= k distinct values is sampled whole: the sketched
    estimate equals the exact type-1 quantile (the documented exactness
    branch of the accuracy bound)."""
    d = _lang_tokens(spark, sf_dir).cache()
    ndistinct = d.select("lang", "n").distinct().count()  # >= per-group max
    sketch = sk.quantile_sketch_grouped(d, "n", ["lang"], k=ndistinct + 10)
    est = {
        (r["lang"], r["q_micro"]): r["est_v"]
        for r in sk.grouped_quantile_estimates(sketch, ["lang"], (0.5, 0.9)).collect()
    }
    by_lang: dict = {}
    for r in d.collect():
        by_lang.setdefault(r["lang"], []).append(r["n"])
    for lang, vals in by_lang.items():
        assert est[(lang, 500000)] == _exact_type1(vals, 0.5), lang
        assert est[(lang, 900000)] == _exact_type1(vals, 0.9), lang
    d.unpersist()


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, "/root/testdata/sf0.01"])
def test_grouped_quantiles_rank_error_within_bound(spark, sf_dir):
    """Sampling branch of the bound: with k=64 << distinct values, the
    estimate's RANK error |F(est) - q| stays within the documented
    O(sqrt(ln(1/d)/k)) envelope — 0.20 of the group's mass at k=64
    (sqrt(ln(200)/(2*64)) ~= 0.20, failure prob ~1%). Checked per group
    against the exact empirical CDF."""
    import bisect

    d = _lang_tokens(spark, sf_dir).cache()
    sketch = sk.quantile_sketch_grouped(d, "n", ["lang"], k=64)
    est = {
        (r["lang"], r["q_micro"]): r["est_v"]
        for r in sk.grouped_quantile_estimates(sketch, ["lang"], (0.5, 0.9)).collect()
    }
    by_lang: dict = {}
    for r in d.collect():
        by_lang.setdefault(r["lang"], []).append(r["n"])
    tol = 0.20
    for lang, vals in by_lang.items():
        vals.sort()
        for q, qm in ((0.5, 500000), (0.9, 900000)):
            v = est[(lang, qm)]
            cdf = bisect.bisect_right(vals, v) / len(vals)
            assert abs(cdf - q) <= tol, (lang, q, v, cdf)
    d.unpersist()


def test_grouped_sketch_keeps_k_smallest_hashes_per_group(spark):
    d = _lang_tokens(spark, SF_SMOKE)
    k = 16
    sketch = sk.quantile_sketch_grouped(d, "n", ["lang"], k=k).collect()
    per: dict = {}
    for r in sketch:
        per.setdefault(r["lang"], []).append((r["h"], r["v"], r["cnt"]))
    full = sk.quantile_sketch_grouped(d, "n", ["lang"], k=10**6).collect()
    all_per: dict = {}
    for r in full:
        all_per.setdefault(r["lang"], []).append((r["h"], r["v"], r["cnt"]))
    for lang, rows in per.items():
        expect = sorted(all_per[lang])[:k]
        assert sorted(rows) == expect, lang


def test_grouped_quantile_merge_equals_whole(spark):
    """Merge law per group: sketches of disjoint halves union+re-rank to
    exactly the whole-table sketch (counts sum; k smallest hashes kept)."""
    d = _lang_tokens(spark, SF_SMOKE)
    a = d.where(F.col("n") % 2 == 0)
    b = d.where(F.col("n") % 2 == 1)
    merged = sk.quantile_merge_grouped(
        sk.quantile_sketch_grouped(a, "n", ["lang"], k=32),
        sk.quantile_sketch_grouped(b, "n", ["lang"], k=32),
        ["lang"],
        k=32,
    )
    whole = sk.quantile_sketch_grouped(d, "n", ["lang"], k=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_grouped_hll_merge_equals_whole(spark):
    """Grouped HLL merge law: register-wise max of disjoint halves equals
    the whole-table register table (the HLL union is exact)."""
    e = load_tables(spark, SF_SMOKE)["events"]
    a = e.where(F.col("user_id") % 2 == 0)
    b = e.where(F.col("user_id") % 2 == 1)
    merged = sk.hll_merge_grouped(
        sk.hll_sketch_grouped(a, "user_id", ["event_type"]),
        sk.hll_sketch_grouped(b, "user_id", ["event_type"]),
        ["event_type"],
    )
    whole = sk.hll_sketch_grouped(e, "user_id", ["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_grouped_hll_estimates_accuracy(spark):
    """Distributed per-group estimates vs exact per-group countDistinct:
    within the standard HLL envelope (~1.04/sqrt(m), generous 5x at p=12
    for the tiny-cardinality linear-counting branch this corpus hits), and
    the distributed estimator must agree with the driver-side single-group
    hll_estimate run per group (same algebra, two implementations)."""
    e = load_tables(spark, SF_SMOKE)["events"]
    exact = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    sketch = sk.hll_sketch_grouped(e, "user_id", ["event_type"], p=12)
    ests = {
        r["event_type"]: r["est"]
        for r in sk.grouped_hll_estimates(sketch, ["event_type"], p=12).collect()
    }
    assert set(ests) == set(exact)
    for g, d in exact.items():
        assert abs(ests[g] - d) / d <= 5 * 1.04 / (1 << 6), (g, ests[g], d)
        single = sk.hll_estimate(
            sketch.where(F.col("event_type") == g).select("bucket", "max_rho"),
            p=12,
        )
        assert abs(ests[g] - single) < 1e-6, (g, ests[g], single)
