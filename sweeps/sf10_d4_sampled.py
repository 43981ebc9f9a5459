"""d4 exact n-gram Jaccard at sf10 — PROBE value tier (VERDICT r7 #4a).

r8 finding, measured twice: the d4 BATCH recipe's full output at sf10 is
BOX-bound in BOTH engines, and for the same reason — the sf10 derived
corpus is ~100-way replicated, so the pair-shingle incidence stream is
sum-over-shingles C(df,2) ~ 2.5B rows; DuckDB's shingle self-join spills
>58 GB (r7) and Spark's per-pair aggregation filled this box's ~90 GB
usable /tmp even under zstd (r8: died at 87 GB used after 18 min). That
cost is quadratic-in-cluster-size and inherent to exact all-pairs
Jaccard on a duplicate-saturated corpus — the scale answer is the capped
twin d7 (value-exact at sf10 since r7) or minhash d2, not more disk.

What IS provable at sf10 is the exact-Jaccard semantics themselves, via
the r8 PROBE operator (dedup.ngram_jaccard_probe, gate d8): pairs
touching ~40 hash-sampled docs, computed by BOTH engines with their
small-side-join plans over the full 500k-doc inverted index — linear,
no all-pairs intermediate, values compared exactly. Spark runs the
PRODUCT operator (the same code path gate d8 drives at sf0.01); the
DuckDB twin keeps the oracle's shingle logic verbatim
(pipeline_oracles._SHINGLES_CTE).

SWEEP_FULL=1 re-attempts the box-bound full-output tier (needs a bigger
/tmp than this box has).

Run: cd /root/repo && python sweeps/sf10_d4_sampled.py | tee /tmp/sweep_d4.log
"""

from __future__ import annotations

from common import SF10, compare_rows, duck_con, get_spark, sampled_col, sampled_sql, stage

import os

K = int(os.environ.get("SWEEP_K", "12503"))  # default ~40 of 500k docs

SAMPLED_ORACLE_TAIL = f"""
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, sx AS (SELECT * FROM ex WHERE {sampled_sql("CAST(doc_id AS VARCHAR)", K)})
, inter1 AS (
    SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS n_inter
    FROM sx x JOIN ex y ON x.s = y.s AND x.doc_id != y.doc_id
    GROUP BY 1, 2
)
-- both-sampled pairs arrive in both orientations with identical counts;
-- normalize + MAX dedupes without double-counting
, inter AS (
    SELECT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b,
           MAX(n_inter) AS n_inter
    FROM inter1 GROUP BY 1, 2
)
, need AS (SELECT doc_a AS doc_id FROM inter UNION SELECT doc_b FROM inter)
, sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM ex
    WHERE doc_id IN (SELECT doc_id FROM need) GROUP BY doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.functions.dedup import ngram_jaccard_probe
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.workload.pipeline_oracles import _SHINGLES_CTE
    from treemachine_spark.workload.queries import QUERIES

    spark = get_spark("sweep-d4")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF10)["documents"]

    if os.environ.get("SWEEP_FULL"):
        with stage("spark: FULL d4 at sf10 (box-bound tier)"):
            full = QUERIES["d4_ngram_jaccard"](spark, SF10)
            srows = full.where(
                sampled_col(F.col("doc_a"), K) | sampled_col(F.col("doc_b"), K)
            ).collect()
    else:
        with stage("spark: PROBE d4 at sf10 (product operator, linear plan)"):
            sampled_ids = [
                r["doc_id"]
                for r in docs.where(sampled_col(F.col("doc_id"), K))
                .select("doc_id")
                .collect()
            ]
            print(f"  sampled probe docs: {len(sampled_ids)}", flush=True)
            srows = ngram_jaccard_probe(docs, sampled_ids).collect()
    print(f"  spark sampled pairs: {len(srows)}", flush=True)

    with stage("duckdb: sampled oracle"):
        con = duck_con()
        rel = con.sql(_SHINGLES_CTE + SAMPLED_ORACLE_TAIL)
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled pairs: {len(drows)}", flush=True)

    ok, msg = compare_rows(srows, drows, ["doc_a", "doc_b", "jaccard"], dcols)
    print(f"RESULT d4_sampled_sf10 ok={ok} {msg}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
