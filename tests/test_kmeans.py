"""Distributed Lloyd k-means vs an independent numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from treemachine_spark.functions.similarity import kmeans_fit


def _synthetic(n=200, dim=6, k=4, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, size=(k, dim))
    pts = centers[rng.integers(0, k, n)] + rng.normal(0, 1, size=(n, dim))
    return pts


def _numpy_lloyd(pts, k, iters):
    cents = pts[:k].astype(float).copy()  # same init: k smallest ids
    for _ in range(iters):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest index, same rule
        for ci in range(k):
            m = assign == ci
            if m.any():
                cents[ci] = pts[m].mean(axis=0)
    # final assignment against the FINAL centroids (matches kmeans_fit)
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d.argmin(axis=1)


@pytest.fixture(scope="module")
def emb_df(spark):
    pts = _synthetic()
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_matches_numpy(spark, emb_df):
    pts = _synthetic()
    cdf, adf, _ = kmeans_fit(emb_df, k=4, iters=4)
    np_cents, np_assign = _numpy_lloyd(pts, k=4, iters=4)
    got = {r["cent_id"]: r["centroid"] for r in cdf.collect()}
    for ci in range(4):
        assert np.allclose(got[ci], np_cents[ci], rtol=1e-8), ci
    got_assign = dict(adf.collect())
    # spark assignment is a FINAL E-step against the returned centroids
    mismatches = sum(
        1 for i, a in enumerate(np_assign) if got_assign[i] != a
    )
    assert mismatches == 0
    members = {r["cent_id"]: r["n_members"] for r in cdf.collect()}
    assert sum(members.values()) == len(pts)


def test_kmeans_inertia_non_increasing(spark, emb_df):
    _, _, hist = kmeans_fit(emb_df, k=4, iters=5, compute_inertia=True)
    assert len(hist) == 5
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-6


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far blobs, k=3 with the three init points all in blob one ->
    # at least one centroid may end empty; the fit must not crash and
    # every vector must stay assigned
    rows = [(i, [float(i % 2) * 100.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cdf, adf, _ = kmeans_fit(df, k=3, iters=3)
    assert adf.count() == 20
    assert cdf.count() == 3
    # n_members must describe the RETURNED assignment exactly
    members = {r["cent_id"]: r["n_members"] for r in cdf.collect()}
    from_assign = {r["cent_id"]: r["count"] for r in adf.groupBy("cent_id").count().collect()}
    for ci, n in members.items():
        assert from_assign.get(ci, 0) == n


def test_kmeans_k_exceeds_rows_clamps(spark):
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cdf, adf, _ = kmeans_fit(df, k=10, iters=2)
    assert cdf.count() == 3  # clamped to the row count, no crash
    assert adf.count() == 3
    assert sorted(r["n_members"] for r in cdf.collect()) == [1, 1, 1]


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, iters=1)
