"""Property tests for the r3 curation operators (x9-x14 machinery) over
randomized synthetic corpora — invariants the oracles can't express:

  - source_quota: never more than N rows per source; kept rows are exactly
    the N smallest ids of each source.
  - sequence_packing: bins are contiguous per shard starting at 0; no bin
    exceeds capacity unless it holds a single over-capacity doc; every doc
    is assigned exactly once.
  - mixture_sample: deterministic (idempotent), subset of input, and a
    group with rate 100 keeps everything / rate 0 keeps nothing.
  - decontaminate: flagged ids are exactly the corpus docs sharing a
    shingle with the benchmark (checked against a pure-Python oracle).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

VOCAB = [f"w{i}" for i in range(30)]


def synth_docs(spark, n: int, seed: int):
    rng = random.Random(seed)
    rows = [
        (
            i,
            " ".join(rng.choices(VOCAB, k=rng.randint(1, 12))),
            rng.choice(["en", "de", "fr"]),
            rng.choice(["s1", "s2", "s3"]),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_source_quota_properties(spark, seed):
    from treemachine_spark.functions.sampling import source_quota

    docs = synth_docs(spark, 120, seed)
    kept = source_quota(docs, per_source=10).collect()
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    full = {r["source"]: r["doc_id"] for r in docs.collect()}  # presence map
    all_ids: dict[str, list] = {}
    for r in docs.collect():
        all_ids.setdefault(r["source"], []).append(r["doc_id"])
    for src, ids in by_src.items():
        assert len(ids) <= 10
        assert sorted(ids) == sorted(all_ids[src])[: len(ids)], src
    assert full  # sanity: corpus non-empty


@pytest.mark.parametrize("seed", [0, 1])
def test_sequence_packing_properties(spark, seed):
    from treemachine_spark.functions.text import sequence_packing

    docs = synth_docs(spark, 100, seed)
    cap = 16
    packed = sequence_packing(docs, capacity=cap).collect()
    assert len(packed) == 100  # every doc assigned exactly once
    bins: dict[tuple, list] = {}
    for r in packed:
        bins.setdefault((r["lang"], r["bin_id"]), []).append(r["n_tokens"])
    for (lang, b), toks in bins.items():
        assert b >= 0
        # a bin only exceeds capacity when a single doc does
        if sum(toks) > cap + max(toks) - 1:
            pytest.fail(f"bin {lang}/{b} overfilled: {toks}")
    # bins contiguous from 0 per shard
    by_lang: dict[str, set] = {}
    for (lang, b), _ in bins.items():
        by_lang.setdefault(lang, set()).add(b)
    for lang, ids in by_lang.items():
        assert ids == set(range(len(ids))), lang


@pytest.mark.parametrize("seed", [0, 1])
def test_mixture_sample_properties(spark, seed):
    from treemachine_spark.functions.sampling import mixture_sample

    docs = synth_docs(spark, 150, seed)
    rates = {"en": 100, "de": 0, "fr": 50}
    kept1 = {r["doc_id"] for r in mixture_sample(docs, rates).collect()}
    kept2 = {r["doc_id"] for r in mixture_sample(docs, rates).collect()}
    assert kept1 == kept2  # deterministic
    rows = {r["doc_id"]: r["lang"] for r in docs.collect()}
    assert kept1 <= set(rows)
    assert {i for i, g in rows.items() if g == "en"} <= kept1  # rate 100
    assert not kept1 & {i for i, g in rows.items() if g == "de"}  # rate 0


@pytest.mark.parametrize("seed", [0, 1])
def test_decontaminate_matches_python_oracle(spark, seed):
    from treemachine_spark.functions.dedup import decontaminate

    docs = synth_docs(spark, 80, seed)
    bench = docs.where("doc_id < 8")
    corpus = docs.where("doc_id >= 8")
    got = {r["doc_id"]: r["n_hit"] for r in decontaminate(corpus, bench).collect()}

    def sh(text, k=3):
        ws = text.split()
        if len(ws) < k:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    rows = docs.collect()
    bench_sh = set().union(*(sh(r["text"]) for r in rows if r["doc_id"] < 8))
    want = {}
    for r in rows:
        if r["doc_id"] >= 8:
            n = len(sh(r["text"]) & bench_sh)
            if n:
                want[r["doc_id"]] = n
    assert got == want
