"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (MRCA over the ancestor closure —
the reference's core graph operation, opentree/GraphExplorer.java:617-650)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator suite
from SURVEY.md §2; implementations live in treemachine_spark/workload/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from treemachine_spark.workload.oracles import ORACLES  # noqa: E402
from treemachine_spark.workload.queries import QUERIES  # noqa: E402

# The driver's CORRECTNESS artifact captures the first 50 queries() entries
# (insertion order). Two levers keep every operator family driver-verified:
#
# 1. _FRONT: ROTATION (VERDICT r3 #2). Each round the surface front-loads
#    gates that have never appeared in a driver artifact so every gate
#    periodically earns a driver-signed CORRECTNESS row. r4 rotates in ALL
#    31 gates absent from the r1-r3 artifacts (union of
#    CORRECTNESS_r01/02/03 keys), leaving 19 slots for the core flagship
#    gates that anchor each family.
# 2. _DRIVER_EXCLUDED: everything else sits in the pytest tier this round —
#    each entry names its r1-r3 driver-artifact row or captured
#    family-mate, and ALL gates remain verified by the DuckDB oracle pytest
#    suite at sf0.001 AND the driver's sf0.01
#    (tests/test_workload_oracle.py iterates the full QUERIES/ORACLES
#    dicts plus test_retired_gate_matches_oracle_at_driver_sf).
_FRONT = [
    # never in a driver artifact through r3 — rotated in for r4
    "c1_rf_distance",
    "c2_node_distance",
    "k1_kmv_distinct",
    "k2_hll_sketch",
    "k3_bloom_prune",
    "k4_zorder",
    "k5_cms_topk",
    "q2_min_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_ship_lag",
    "q20_part_suppliers",
    "q21_sole_blame",
    "s5_sliding_windows",
    "s6_native_sessions",
    "u1_merge_upsert",
    "v7_semantic_dedup",
    "v8_hard_negatives",
    "x9_decontaminate",
    "x10_source_quota",
    "x11_repetition",
    "x12_sequence_packing",
    "x13_pack_manifest",
    "x14_mixture_sample",
    "x15_tfidf",
    "x16_keyword_search",
    "x17_dup_spans",
    "x18_mixture_weights",
    "x19_strip_spans",
    "x20_lm_score",
    "x21_table_stats",
]

_DRIVER_EXCLUDED = {
    # rotated OUT for r4 (driver-verified green in the r3 artifact)
    "e4_anti_join": "r3 artifact row; semi/anti family also in l4",
    "j3_asof_join": "r3 artifact row; temporal family",
    "j4_range_join": "r3 artifact row; temporal family",
    "l1_point_lookup": "r3 artifact row; pushdown family",
    "l9_distinct_sorted": "r3 artifact row; set-op family in e1",
    "o2_top1_latest": "r3 artifact row; TakeOrdered family in q3/t9",
    "p3_props_decode": "r3 artifact row; map-decode family in p4",
    "p10_id_codec": "r3 artifact row; codec family",
    "q8_market_share": "r3 artifact row; star-join family in q5",
    "q10_returned_items": "r3 artifact row; join-agg family in q3/q5",
    "q14_promo_share": "r3 artifact row; conditional-agg family in q1",
    "q15_top_supplier": "r3 artifact row; window-max family in w1",
    "q17_small_qty_revenue": "r3 artifact row; scalar-subquery family",
    "q19_disjunctive_join": "r3 artifact row; predicate-join family",
    "s2_sessions_batch": "r3 artifact row; session family in s5/s6 (rotated in)",
    "w1_window_topn": "r3 artifact row; window family in x10/x12 (rotated in)",
    "x1_text_profile": "r3 artifact row; text family in x11/x15 (rotated in)",
    "x4_lang_stats": "r3 artifact row; GROUPED_AGG family in x21 (rotated in)",
    "x5_redaction": "r3 artifact row; regex-transform family in x1",
    "d1_exact_dedup": "r3 artifact row; dedup family in d2/d5",
    "d3_simhash": "r3 artifact row; per-row hash family in x17 (rotated in)",
    "d6_purge_list": "r3 artifact row; keeper-policy family in d5",
    "d7_jaccard_capped": "r3 artifact row; shingle family in x9 (rotated in)",
    "f1_funnel": "r3 artifact row; sequence family in s2/s5",
    "x6_hash_split": "r3 artifact row; hash-bucket family in x14 (rotated in)",
    "x7_chunking": "r3 artifact row; chunk family in x12 (rotated in)",
    "v2_ann_lsh": "r3 artifact row; ANN family anchored by v3-class gates",
    "v5_centroid_cells": "r3 artifact row; cell family in v7 (rotated in)",
    "v6_cosine_pairs_lsh": "r3 artifact row; band-join family in v8 (rotated in)",
    "m1_media_features": "r3 artifact row; mapInPandas family",
    "v3_ivf_topk": "r3 artifact row; ANN re-rank family in v8 (rotated in)",
    "s7_sessionize_stream": "NEW r4; pytest-tier this round, rotates into the r5 artifact (stateful-streaming family s3/s4 have r4 rows)",
    "k6_quantile_sketch": "NEW r4; pytest-tier this round, rotates into the r5 artifact (sketch family k1/k2/k5 have r4 rows)",
    "s8_stream_novelty": "NEW r4; pytest-tier this round, rotates into the r5 artifact (streaming family s3/s4 have r4 rows; band-join family in d2/x9)",
    # permanently-excluded near-duplicates (unchanged rationale, r2/r3
    # rows exist or family-mate captures the shape)
    "q4_order_priority": "r2 artifact row; EXISTS semi-join shape in l4+e4",
    "q6_forecast_revenue": "r2 artifact row; single-table filter-agg in q1",
    "q7_nation_volume": "r2 artifact row; multi-dim broadcast join in q5/q8",
    "q13_customer_distribution": "r2 artifact row; outer-join distribution",
    "q16_supplier_part_types": "r2 artifact row; distinct-agg + anti in q1/e4",
    "q18_large_orders": "r2 artifact row; having-subquery top-orders in q3",
    "q22_idle_customers": "r2 artifact row; anti-join agg in e4",
    "t1_path_to_root": "r2 artifact row; closure_paths verifies every path",
    "t5_subtree_num_tips": "r2 artifact row; tip-count logic in a1",
    "e2_intersect": "r2 artifact row; set-op family in e1/e4/l9",
    "v1_ann_brute": "r2 artifact row; ANN baseline of v2/v3",
    "v4_cosine_pairs": "r2 artifact row; all-pairs baseline of v6",
    "d4_ngram_jaccard": "r2 artifact row; uncapped twin of d7",
    "x2_bpe_tokens": "r2 artifact row; tokenization family in x1/x7",
    "x8_token_percentiles": "r2 artifact row; percentile family in x4",
    "s1_event_windows": "r2 artifact row; batch twin of streaming s3",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["t2_mrca"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Curated driver surface: one entry per SURVEY.md §2 operator family,
    never-driver-verified gates first, exactly 50 entries (artifact cap)."""
    ordered = {name: QUERIES[name] for name in _FRONT}
    for name, fn in QUERIES.items():
        if name not in ordered and name not in _DRIVER_EXCLUDED:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each driver-surface query."""
    keep = set(queries())
    return {name: sql for name, sql in ORACLES.items() if name in keep}
