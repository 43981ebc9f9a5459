"""Property tests for the shard router's pure-Python sketch-state merge
(api/router._merged_quantiles/_merged_topk/_merged_distinct) — the laws
that make the stats scatter exact, checked Spark-free in milliseconds:

- SHARD INVARIANCE: merging the same state rows split across any number
  of shards gives the identical response (sum-then-re-take is a fold
  over a multiset — how the rows are grouped into shards cannot matter);
- the quantile estimator equals a brute-force type-1 quantile over the
  merged bottom-k rows;
- the CMS estimator equals min-over-depth of the merged cells at the
  key's h32 positions.

The Spark-vs-router equality (scattered == union worker over real
sockets) is pinned in test_http_server.py / test_topk_sketch.py; these
properties pin the merge algebra itself over adversarial random states.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from treemachine_spark.api.router import (
    _h32,
    _merged_distinct,
    _merged_quantiles,
    _merged_topk,
)

# a quantile-state row: [group, h, v, cnt] with duplicates across shards
# allowed (the merge must sum them)
_QROW = st.tuples(
    st.sampled_from(["en", "de", None]),
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=1, max_value=9),
).map(list)


def _qstate(rows, k=8):
    return {"col": "n", "groups": ["lang"], "k": k, "rows": rows}


def _split(rows, cuts):
    """Deterministic split of one row list into len(cuts)+1 shard lists."""
    shards, prev = [], 0
    for c in sorted(cuts):
        c = min(c, len(rows))
        shards.append(rows[prev:c])
        prev = c
    shards.append(rows[prev:])
    return shards


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(_QROW, min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
    qs=st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
)
def test_quantile_merge_shard_invariance_and_estimator(rows, cuts, qs):
    whole = _merged_quantiles([_qstate(rows)], qs, False)
    split = _merged_quantiles(
        [_qstate(part) for part in _split(rows, cuts)], qs, False
    )
    assert split == whole

    # brute-force twin: sum counts per (group, h, v), keep the k smallest
    # (h, v) per group, then the smallest v whose cumulative count reaches
    # q*tot (integer threshold, exactly the engine comparison)
    status, blob = whole
    assert status == 200
    acc: dict = {}
    for g, h, v, cnt in rows:
        acc[(g, h, v)] = acc.get((g, h, v), 0) + cnt
    per_group: dict = {}
    for (g, h, v), cnt in acc.items():
        per_group.setdefault(g, []).append((h, v, cnt))
    expected = {}
    for g, rws in per_group.items():
        kept = sorted(rws)[:8]
        byv = sorted((v, c) for _, v, c in kept)
        tot = sum(c for _, c in byv)
        for q in dict.fromkeys(qs):
            qm = int(round(q * 1_000_000))
            cum = 0
            for v, c in byv:
                cum += c
                if cum * 1_000_000 >= qm * tot:
                    expected[(g, qm)] = v
                    break
    got = {
        (e["group"]["lang"], int(round(e["q"] * 1_000_000))): e["value"]
        for e in blob["quantiles"]
    }
    assert got == expected


# a topk-state row: CMS cell [d, pos, cnt, None] or candidate
# [-1, -1, cnt, key]
_CELL = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=63),
    st.integers(min_value=1, max_value=50),
    st.none(),
).map(list)
_CAND = st.tuples(
    st.just(-1),
    st.just(-1),
    st.integers(min_value=1, max_value=50),
    st.sampled_from(["a", "b", "cc", "dd", "e|f"]),
).map(list)


def _tstate(rows, c=4):
    return {
        "col": "key",
        "groups": [],
        "depth": 4,
        "width": 64,
        "n_candidates": c,
        "rows": rows,
    }


@settings(max_examples=200, deadline=None)
@given(
    cells=st.lists(_CELL, min_size=1, max_size=40),
    cands=st.lists(_CAND, min_size=0, max_size=20),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
    k=st.integers(min_value=1, max_value=6),
)
def test_topk_merge_shard_invariance_and_estimator(cells, cands, cuts, k):
    rows = cells + cands
    whole = _merged_topk([_tstate(rows)], k)
    split = _merged_topk([_tstate(part) for part in _split(rows, cuts)], k)
    assert split == whole

    status, blob = whole
    assert status == 200
    merged_cells: dict = {}
    for d, pos, cnt, key in cells:
        merged_cells[(d, pos)] = merged_cells.get((d, pos), 0) + cnt
    # EVERY captured key is estimated from the exact global cells and
    # ranked by that estimate — never by the per-shard-partial candidate
    # counts (which could re-take away a true heavy hitter)
    keys = {key for _, _, _, key in cands}
    ests = sorted(
        (
            (
                key,
                min(
                    merged_cells.get((i, _h32(f"cms{i}|{key}") % 64), 0)
                    for i in range(4)
                ),
            )
            for key in keys
        ),
        key=lambda e: (-e[1], e[0]),
    )[:k]
    assert [(e["key"], e["est_count"]) for e in blob["top"]] == ests


_HROW = st.tuples(
    st.sampled_from(["click", "view", None]),
    st.integers(min_value=0, max_value=15),
    st.integers(min_value=0, max_value=29),
).map(list)


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(_HROW, min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_hll_merge_shard_invariance(rows, cuts):
    """Register-wise max is a semilattice fold: any sharding of the same
    register rows merges to the identical estimate response."""

    def state(rws):
        return {"col": "u", "groups": ["t"], "p": 4, "rows": rws}

    whole = _merged_distinct([state(rows)], False)
    split = _merged_distinct([state(p) for p in _split(rows, cuts)], False)
    assert split == whole and whole[0] == 200
