"""Distributed BPE training vs an independent pure-Python reference
(classic Sennrich et al. 2016 algorithm, re-implemented from the paper)."""

from __future__ import annotations

import pytest

from collections import Counter

from treemachine_spark.functions.bpe import EOW, bpe_encode, bpe_train

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
]


def _ref_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple([*w[:-1], w[-1] + EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # count DESC, pair ASC — the engine's documented tie-break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges, vocab


@pytest.mark.slow
def test_bpe_merges_match_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = bpe_train(docs, n_merges=8)
    ref_merges, ref_vocab = _ref_bpe([t for _, t in CORPUS], 8)
    assert merges == ref_merges
    got = {tuple(r["symbols"]): r["n"] for r in vocab.collect()}
    assert got == {k: v for k, v in ref_vocab.items()}


def test_bpe_first_merge_is_est(spark):
    # 'es' appears in newest(6) + widest(3) = 9 times — the clear winner;
    # then 'es'+'t</w>' -> 'est</w>' at the same 9
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, _ = bpe_train(docs, n_merges=2)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)


@pytest.mark.slow
def test_bpe_encode_applies_learned_merges(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, _ = bpe_train(docs, n_merges=8)
    out = bpe_encode(
        spark.createDataFrame([(9, "newest lowest")], "doc_id long, text string"),
        merges,
    ).collect()[0]
    toks = out["bpe_tokens"]
    assert "est" + EOW in toks  # learned suffix applies to unseen 'lowest'
    assert out["n_bpe_tokens"] == len(toks)


def test_bpe_early_stop_on_unique_words(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    merges, _ = bpe_train(docs, n_merges=5)
    assert merges == []  # no pair reaches count 2
