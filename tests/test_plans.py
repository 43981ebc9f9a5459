"""Physical-plan regression tests: the optimizations that matter at 100 TB
must be visible in the plan (predicate pushdown, column pruning, broadcast
joins, map-side partial aggregation, whole-stage codegen)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from treemachine_spark.workload.queries import QUERIES


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_CORRECT)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_point_lookup_pushdown(spark):
    s = plan_of(spark, "l1_point_lookup")
    assert "EqualTo(c_name,Customer#000000042)" in s  # filter reached the scan
    assert "c_comment" not in s  # column pruning
    assert "codegen id" in s  # whole-stage codegen covers filter+project


def test_q1_partial_aggregation_and_pushdown(spark):
    s = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in s  # date filter pushed to parquet
    # map-side combine: HashAggregate appears before AND after the Exchange
    pre_exchange = s.split("Exchange")[0]
    assert "HashAggregate" in pre_exchange
    # scan reads only needed columns (no l_partkey/l_suppkey)
    assert "l_partkey" not in s and "l_suppkey" not in s


def test_q5_broadcasts_all_dimensions(spark):
    s = plan_of(spark, "q5_region_revenue")
    assert s.count("BroadcastHashJoin") >= 3  # customer, nation, region (+orders small)
    assert "SortMergeJoin" not in s or s.count("BroadcastHashJoin") >= 3
    # lineitem scan pruned to 3 columns
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in s


def test_subtree_uses_cached_closure(spark):
    s = plan_of(spark, "t4_subtree")
    assert "InMemoryTableScan" in s  # served from the cached closure


def test_text_profile_no_shuffle(spark):
    # per-row transforms must not shuffle
    s = plan_of(spark, "x1_text_profile")
    assert "Exchange" not in s


def test_ann_brute_scores_in_one_arrow_pass(spark):
    # r9 shape: the collected query matrix rides the scoring UDF's
    # closure — ONE MapInPandas pass over the corpus, no join at all
    # (the old broadcast nested loop shipped each corpus row per query);
    # the only Exchange left is the per-query top-k window
    s = plan_of(spark, "v1_ann_brute")
    assert "MapInPandas" in s
    assert "BroadcastNestedLoopJoin" not in s and "Join" not in s


def test_q6_all_predicates_pushed(spark):
    s = plan_of(spark, "q6_forecast_revenue")
    # every predicate reaches the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in s
    assert "LessThan(l_shipdate" in s
    assert "GreaterThanOrEqual(l_discount,0.05)" in s
    assert "LessThan(l_quantity,24" in s
    # scan pruned to the 4 referenced columns
    assert "l_returnflag" not in s and "l_orderkey" not in s


def test_q7_broadcasts_both_nation_roles(spark):
    s = plan_of(spark, "q7_nation_volume")
    # nation joined twice (supplier role + customer role) — both broadcast,
    # plus customer/supplier sides; no sort-merge join anywhere
    assert s.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in s


def test_q19_stays_equi_join(spark):
    s = plan_of(spark, "q19_disjunctive_join")
    # the OR-envelope must NOT degrade to a nested-loop cross product:
    # Catalyst keeps the p_partkey equi-join and applies the residual filter
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert "BroadcastHashJoin" in s


def test_v5_centroids_broadcast_no_shuffle_before_agg(spark):
    s = plan_of(spark, "v5_centroid_cells")
    # r14: the assignment is the shared Arrow E-step — one MapInPandas
    # pass over the corpus (centroids ride the task closure); the OLD
    # crossJoin x interpreted-fold x argmax-window shape (and its corpus x
    # n_centroids shuffle) must be gone. The only exchange left is the
    # final cell agg's.
    assert "MapInPandas" in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "Window" not in s


def test_x6_split_is_scan_fused(spark):
    # deterministic hash-split must not shuffle before the aggregation
    s = plan_of(spark, "x6_hash_split")
    # exactly one exchange node: the groupBy('split') agg (formatted explain
    # prints each node twice — once in the tree, once in the details)
    assert s.count("+- Exchange") == 1


def test_x7_chunking_no_shuffle(spark):
    s = plan_of(spark, "x7_chunking")
    assert "Exchange" not in s  # explode + projections fuse into the scan


def test_x4_median_is_jvm_partial_agg(spark):
    # exact median must come from JVM percentile() with map-side partial
    # aggregation — a GROUPED_AGG pandas UDAF would materialize each
    # language's full series on one executor (unbounded at scale)
    s = plan_of(spark, "x4_lang_stats")
    assert "AggregateInPandas" not in s
    pre_exchange = s.split("Exchange")[0]
    assert "ObjectHashAggregate" in pre_exchange or "HashAggregate" in pre_exchange


def test_x9_decontaminate_broadcasts_benchmark(spark):
    # the benchmark shingle set must BROADCAST (eval sets are tiny; the
    # corpus is the 100 TB side) and the hit count must partial-aggregate
    # map-side — a sort-merge join here would shuffle the whole corpus
    s = plan_of(spark, "x9_decontaminate")
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s
    assert "partial_count" in s


def test_x10_source_quota_single_window_shuffle(spark):
    # one hash-partition exchange on source for the quota window; rank<=k
    # filters inside the window stage
    s = plan_of(spark, "x10_source_quota")
    assert s.count("+- Exchange") == 1
    assert "RunningWindowFunction" in s or "Window" in s


def test_x11_repetition_no_shuffle(spark):
    # per-doc duplicate-2gram fraction is pure array expressions
    s = plan_of(spark, "x11_repetition")
    assert "Exchange" not in s


def test_x12_packing_single_window_shuffle(spark):
    # greedy in-order packing = one exchange on the shard column, window
    # cumsum inside — never a global sort
    s = plan_of(spark, "x12_sequence_packing")
    assert s.count("+- Exchange") == 1


def _parquet_scans(s: str) -> int:
    # each scan appears twice in formatted explain (tree node + detail
    # block); count the numbered detail headers only
    import re

    return len(re.findall(r"\(\d+\) Scan parquet", s))


def test_x16_keyword_search_single_corpus_scan(spark):
    # terms=None derives qterms from the SAME localCheckpointed tf table,
    # so the final plan reads the materialized index — the only parquet
    # touch left is the metadata-only count-star for N (reads NO columns;
    # ADVICE r4, the x15 "3 scans -> 1" lesson)
    s = plan_of(spark, "x16_keyword_search")
    assert _parquet_scans(s) <= 1
    assert "ReadSchema: struct<>" in s or _parquet_scans(s) == 0
    assert "Scan ExistingRDD" in s  # the checkpointed index is the source


def test_x20_lm_score_single_corpus_scan(spark):
    # bigrams / bigram-counts / vocab all derive from ONE checkpointed
    # token table; c_prev is a window over bi_counts, not a re-aggregation
    # of the bigram subtree. Only the null-free doc-id left join may touch
    # the source parquet (column-pruned to the id).
    s = plan_of(spark, "x20_lm_score")
    assert _parquet_scans(s) <= 1
    assert "ReadSchema: struct<doc_id" in s or _parquet_scans(s) == 0
    assert "Scan ExistingRDD" in s


def test_k7_grouped_quantiles_single_scan_partial_agg(spark):
    # EXACTLY one parquet scan of documents: the estimator explodes the
    # quantile list against the k-row sketch instead of unioning one
    # filtered-aggregate branch per q (which re-derives the source scan
    # len(qs) times — the x15/x18 duplicated-scan lesson); the
    # distinct-value shuffle is preceded by a map-side partial aggregate
    s = plan_of(spark, "k7_grouped_quantiles")
    assert "partial_count" in s
    assert _parquet_scans(s) == 1, _parquet_scans(s)
    assert "ReadSchema: struct<text:string,lang:string>" in s  # pruned


def test_c3_node_heights_broadcast_weights_and_partial_aggs(spark):
    """c3 (graph/compare.node_heights): the node-scale tables must reach
    the closure as BROADCAST joins (never shuffling the closure), the
    ``pre`` aggregation must be materialized ONCE per invocation (r14: a
    localCheckpoint — without it the planner re-ran the closure-wide sum
    once per consumer), and the remaining closure-wide pass (maxtip) must
    combine map-side so its shuffle carries node-scale rows."""
    s = plan_of(spark, "c3_node_heights")
    assert "BroadcastHashJoin" in s  # weight attach + tip_pre joins
    # no nested-loop anywhere (every join is keyed)
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    # map-side combine before the first exchange (the maxtip pass)
    pre_exchange = s.split("Exchange")[0]
    assert "HashAggregate" in pre_exchange
    # pre is a checkpoint scan, not a re-planned aggregation subtree: the
    # eager localCheckpoint leaves Scan ExistingRDD nodes and the plan
    # carries NO partial_sum (the sum ran once at construction)
    assert "Scan ExistingRDD" in s
    assert "partial_sum" not in s
    assert "partial_max" in s  # the maxtip pass combines map-side


def test_x19_strip_spans_windows_share_one_exchange(spark):
    """x19 (dedup.strip_dup_spans, r14): the duplicate test and the keeper
    rank are both per-span_hash quantities and must run as STACKED windows
    over one span_hash exchange — the old groupBy + self-join shape planned
    the explode+lead-window span subtree once per consumer and paid a
    second token-scale exchange for the join."""
    import re

    s = plan_of(spark, "x19_strip_spans")
    # countDistinct-via-windows: max(dense_rank) replaces the groupBy
    assert "dense_rank" in s
    # three consecutive Window operators (rn, dr, nd) with no Exchange
    # between them — they share one sort over one shuffle
    assert re.search(
        r"Window \(\d+\)\n\s*\+- Window \(\d+\)\n\s*\+- Window \(\d+\)\n\s*\+- \*?\s?Sort",
        s,
    ), "window stack not sharing one exchange"
    # the dup attach is gone entirely: no join keyed on span_hash remains
    assert "SortMergeJoin" not in s


def test_k8_grouped_hll_partial_agg_bounded_shuffle(spark):
    """k8 (hll_sketch_grouped): the register build must combine map-side
    (partial_max before the exchange) so the shuffle carries at most
    groups x 2^p integer rows regardless of input size — the whole point
    of sketching over exact countDistinct — and the scan must prune to
    the two used columns."""
    s = plan_of(spark, "k8_grouped_hll")
    # partial_max runs in the aggregate BELOW the exchange (map-side): in
    # formatted explain the tree is final-agg -> Exchange -> partial-agg,
    # so assert the partial function exists and there is exactly ONE
    # shuffle in the whole plan
    assert "partial_max" in s
    assert s.count("+- Exchange") == 1
    assert "ReadSchema: struct<user_id:bigint,event_type:string>" in s


def test_d9_capped_probe_prunes_artifact_scan(spark):
    """r10: the capped-artifact probe must read the persisted index
    through BOTH prune layers — the bucket partition filter (whole
    directory pruning at the file index) and the stop-set In(s) pushed
    into the parquet scan — and never scan raw document text for the
    corpus side (sizes ride the index)."""
    s = plan_of(spark, "d9_capped_artifact")
    scan = s[s.index("shingles.parquet"):]
    assert "PartitionFilters" in scan and "bucket" in scan.split("PushedFilters")[0]
    assert "In(s, [" in scan  # stop-set prune reached the parquet scan
    assert "ReadSchema: struct<doc_id:bigint,s:string,n:bigint>" in scan
