"""v7_semantic_dedup at sf10: scale-correct cell count + sampled-cell
value tier (VERDICT r7 #4 — the v7 budget-bound cap, re-diagnosed).

r7 recorded v7 at sf10 as harness-budget-bound (900 s). Like v6, the
real cause is PARAMETERIZATION: the gate's fixed n_centroids=8 makes
cells of n/8 vectors and in-cell pair work n^2/128 — quadratic in the
corpus. SemDeDup itself (Abbas et al. 2023) scales k with the corpus
(k ~ sqrt(n)) precisely so in-cell work stays near-linear; at 200k
vectors that is ~450 cells of ~450 vectors (~44M in-cell comparisons —
minutes, same plan shape).

Tiers verified, Spark computing the FULL sf10 result at k=450:
1. the sampled vectors' CELL ASSIGNMENTS vs the oracle's (argmax dot
   against the deterministic smallest-id centroids)
2. full pair count at k=450
3. exact values for all pairs in the cells containing ~40 hash-sampled
   vectors, vs a DuckDB oracle that computes the full assignment (90M
   vectorized dot products — feasible once cells are sane) and expands
   pairs only within the sampled cells.

Run: cd /root/repo && python sweeps/sf10_v7_scaled.py | tee /tmp/sweep_v7.log
"""

from __future__ import annotations

import os

from common import SF10, compare_rows, duck_con, get_spark, sampled_col, sampled_sql, stage

K = int(os.environ.get("SWEEP_K", "4999"))  # ~40 of 200k vectors
N_CENT = int(os.environ.get("SWEEP_CELLS", "450"))  # ~sqrt(200k)

_QUANT = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"
_QCOS = (
    "ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) "
    "* sqrt(list_dot_product(b.v, b.v))), 4)"
)

# assignment via two narrow hash aggregations, NOT a row_number window:
# the window would sort the n x k cross join WITH the 64-double vector
# in every row (~50 GB spill at 200k x 450 — it blew the temp cap on
# the first pass). Scoring keeps only (vec_id, cent_id, integer dot) in
# flight; MAX then MIN-on-ties reproduces centroid_assign's
# (max score, min cent_id) tie-break exactly (quantized dots are
# integer-valued, so the BIGINT cast is lossless). Vectors are joined
# back afterwards only for the sampled cells' verify step.
_ASSIGN_CTE = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cvec FROM base ORDER BY vec_id LIMIT {N_CENT}),
scored AS (
    SELECT b.vec_id, c.cent_id,
           CAST(list_dot_product(b.v, c.cvec) AS BIGINT) AS s
    FROM base b CROSS JOIN cent c
),
mx AS (SELECT vec_id, MAX(s) AS ms FROM scored GROUP BY vec_id),
asg AS (
    SELECT s.vec_id, MIN(s.cent_id) AS cent_id
    FROM scored s JOIN mx ON s.vec_id = mx.vec_id AND s.s = mx.ms
    GROUP BY s.vec_id
)
"""

ORACLE_SQL = _ASSIGN_CTE + f"""
, smp_cells AS (
    SELECT DISTINCT cent_id FROM asg
    WHERE {sampled_sql("CAST(vec_id AS VARCHAR)", K)}
),
am AS (
    SELECT g.vec_id, g.cent_id, b.v
    FROM asg g
    JOIN smp_cells USING (cent_id)
    JOIN base b USING (vec_id)
)
SELECT a.cent_id, a.vec_id AS id_a, b.vec_id AS id_b, {_QCOS} AS cos
FROM am a JOIN am b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
WHERE {_QCOS} >= 0.4
"""

ASSIGN_SQL = _ASSIGN_CTE + f"""
SELECT vec_id, cent_id FROM asg
WHERE {sampled_sql("CAST(vec_id AS VARCHAR)", K)}
"""


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.functions import similarity
    from treemachine_spark.io.tables import load_tables

    spark = get_spark("sweep-v7")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, SF10)["embeddings"].cache()
    n_vec = emb.count()
    print(f"  corpus: {n_vec} vectors; cells={N_CENT} "
          f"(gate default 8 -> in-cell work n^2/128, quadratic)", flush=True)

    with stage("spark: sampled cell assignments"):
        assigned = similarity.centroid_assign(emb, n_centroids=N_CENT)
        s_assign = assigned.where(sampled_col(F.col("vec_id"), K)).collect()
        print(f"  spark sampled assignments: {len(s_assign)}", flush=True)

    con = duck_con()
    with stage("duckdb: sampled cell assignments (full argmax, pruned output)"):
        arel = con.sql(ASSIGN_SQL)
        a_ok, a_msg = compare_rows(
            s_assign, arel.fetchall(), ["vec_id", "cent_id"], list(arel.columns)
        )
    print(f"RESULT v7_assign_sf10 ok={a_ok} {a_msg}", flush=True)

    with stage(f"spark: FULL v7 semantic dedup pairs at sf10, k={N_CENT}"):
        pairs = similarity.semantic_dedup_pairs(
            emb, threshold=0.4, n_centroids=N_CENT
        ).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        print(f"  spark pairs (cos>=0.4): {n_pairs}", flush=True)

    with stage("spark: pairs in sampled cells"):
        smp_cells = sorted({r["cent_id"] for r in s_assign})
        srows = pairs.where(F.col("cent_id").isin(smp_cells)).collect()
        print(f"  spark sampled-cell pairs: {len(srows)} in {len(smp_cells)} cells", flush=True)

    with stage("duckdb: sampled-cell pair oracle"):
        rel = con.sql(ORACLE_SQL)
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled-cell pairs: {len(drows)}", flush=True)

    ok, msg = compare_rows(srows, drows, ["cent_id", "id_a", "id_b", "cos"], dcols)
    print(f"RESULT v7_scaled_sf10 ok={ok} {msg} (full pairs={n_pairs})", flush=True)
    if not (ok and a_ok):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
