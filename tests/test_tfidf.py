"""TF-IDF top-k and conjunctive keyword search (functions/text.py)."""

from __future__ import annotations

import math

from treemachine_spark.functions.text import keyword_search, tfidf_topk


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id bigint, text string"
    )


def test_tfidf_hand_computed(spark):
    # N=2; df: a=2, b=1, c=1; idf micro-units: a -> 1e6, rare -> round((ln(1.5)+1)*1e6)
    rare = round((math.log(3.0 / 2.0) + 1.0) * 1_000_000)
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf_micro"])
        for r in tfidf_topk(_docs(spark), k=3).collect()
    }
    assert rows[(1, "a")] == (2, 2_000_000)
    assert rows[(1, "b")] == (1, rare)
    assert rows[(2, "a")] == (1, 1_000_000)
    assert rows[(2, "c")] == (1, rare)


def test_tfidf_k_limits_per_doc(spark):
    out = tfidf_topk(_docs(spark), k=1).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert len(out) == 2
    assert by_doc[1]["term"] == "a"  # tf 2 beats rare b (2.0 > 1.4055)
    assert by_doc[2]["term"] == "c"  # rare c beats common a


def test_keyword_search_ranking_and_and_semantics(spark):
    docs = _docs(spark)
    one = keyword_search(docs, terms=["a"]).collect()
    assert [r["doc_id"] for r in one] == [1, 2]  # tf 2 ranks first
    both = keyword_search(docs, terms=["a", "b"]).collect()
    assert [r["doc_id"] for r in both] == [1]  # doc 2 lacks 'b'


def test_keyword_search_default_query_is_top_df(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y"), (3, "x q")], "doc_id bigint, text string"
    )
    # top-2 df terms: x (3 docs), y (2 docs) -> AND matches docs 1 and 2
    out = keyword_search(docs, terms=None).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_lm_score_prefers_frequent_transitions(spark):
    from treemachine_spark.functions.text import lm_score

    docs = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "a q z b x c"), (3, "a a a b")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert got[1]["n_bigrams"] == 5 and got[2]["n_bigrams"] == 5
    # 'a a' dominates the corpus transitions -> doc 1 far more probable
    # (equal bigram counts, so the micro-nat sums compare directly)
    assert got[1]["sum_logprob_micro"] > got[2]["sum_logprob_micro"]


def test_lm_score_short_doc_zero(spark):
    from treemachine_spark.functions.text import lm_score

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_logprob_micro"]) for r in lm_score(docs).collect()}
    assert got[1] == (0, 0)
    assert got[2][0] == 1


def test_tfidf_skew_safe_path_identical_values(spark):
    """r10 (r9 verdict #4): the skew-safe df plan (materialized tf +
    vocabulary-scale groupBy + join back) returns rows IDENTICAL to the
    default window-count plan — same integer micro-unit scores, same
    deterministic tie-breaks — on a corpus with real hot terms (every doc
    shares boilerplate) and df>1 rare terms."""
    from treemachine_spark.io.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    hot = spark.createDataFrame(
        [
            (900001, "the the the of of boiler plate common tokens"),
            (900002, "the of boiler plate rare9 rare9 unique2"),
            (900003, "the of boiler plate zeta"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(hot)
    a = {tuple(r) for r in tfidf_topk(corpus, k=3, skew_safe=False).collect()}
    b = {tuple(r) for r in tfidf_topk(corpus, k=3, skew_safe=True).collect()}
    # r14 (VERDICT r13 #6): skew_safe="auto" is the default — one linear
    # probe agg picks the plan; values identical either way
    c = {tuple(r) for r in tfidf_topk(corpus, k=3).collect()}
    assert a == b == c and len(a) > 100
    assert tfidf_topk(corpus, k=3).dtypes == tfidf_topk(
        corpus, k=3, skew_safe=True
    ).dtypes

    from treemachine_spark.functions.text import tfidf_auto_plan

    # a gate-SF corpus is nowhere near the hot-partition floor
    assert tfidf_auto_plan(corpus) == "window"


def test_tfidf_auto_decision_rule():
    """The pure decision rule behind skew_safe="auto" (r14, VERDICT r13
    #6): skew_safe only when the hot term's one-reducer partition exceeds
    BOTH the absolute straggler floor (10M rows ~= the one-core wall that
    dwarfs the skew-safe plan's overhead) and 4x the fair per-reducer
    share. The floor side is calibrated from the r14 warmed A/B (window
    measured faster at 200k- AND 1M-row hot partitions locally); the
    fair-share side is what scales it to 1000-reducer clusters."""
    from treemachine_spark.functions.text import SKEW_DF_FLOOR, _skew_decision

    # web-scale hot term: 2B-doc df, 30B tf rows, 2000 reducers -> safe
    assert _skew_decision(2_000_000_000, 30_000_000_000, 2000) is True
    # just past the floor but within 4x fair share (few reducers) -> window
    assert _skew_decision(SKEW_DF_FLOOR + 1, 30_000_000_000, 2) is False
    # locally-drivable sizes never reach the floor -> window
    assert _skew_decision(1_000_000, 13_000_000, 256) is False
    assert _skew_decision(200_000, 2_600_000, 256) is False
    # boundary: floor itself is not enough, must EXCEED it
    assert _skew_decision(SKEW_DF_FLOOR, 10 * SKEW_DF_FLOOR, 10_000) is False
    assert _skew_decision(SKEW_DF_FLOOR + 1, 10 * SKEW_DF_FLOOR, 10_000) is True
