"""d4_ngram_jaccard at sf10, SAMPLED-KEY value tier (VERDICT r7 #4a).

r7 cap: the full DuckDB oracle self-joins the exploded shingle table
(500M x 500M on shingle value) and spills >58 GB temp at 5M docs. The
sampled twin keeps the oracle's shingle/word logic VERBATIM (imported
from pipeline_oracles._SHINGLES_CTE — zero drift) but builds the join's
hash side from only the ~40 hash-sampled docs' shingles, streaming the
full explode once — no quadratic join, no spill. Spark runs the FULL
gate query (same plan the r7 sweep proved) and filters its OUTPUT to
pairs touching a sampled doc; values compare exactly.

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

    from treemachine_spark.workload.pipeline_oracles import _SHINGLES_CTE
    from treemachine_spark.workload.queries import QUERIES

    spark = get_spark("sweep-d4")
    spark.sparkContext.setLogLevel("ERROR")

    with stage("spark: full d4 at sf10, filtered to sampled pairs"):
        full = QUERIES["d4_ngram_jaccard"](spark, SF10)
        srows = full.where(
            sampled_col(F.col("doc_a"), K) | sampled_col(F.col("doc_b"), K)
        ).collect()
        scols = ["doc_a", "doc_b", "jaccard"]
        print(f"  spark sampled pairs: {len(srows)}", flush=True)

    with stage("duckdb: sampled oracle"):
        con = duck_con()
        rel = con.sql(_SHINGLES_CTE + SAMPLED_ORACLE_TAIL)
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled pairs: {len(drows)}", flush=True)

    ok, msg = compare_rows(srows, drows, scols, dcols)
    print(f"RESULT d4_sampled_sf10 ok={ok} {msg}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
