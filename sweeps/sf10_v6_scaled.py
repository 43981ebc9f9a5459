"""v6_cosine_pairs_lsh at sf10: scale-correct banding + sampled-key value
tier (VERDICT r7 #4 — the v6 box-bound cap, re-diagnosed).

r7 recorded v6 at sf10 as DISK-bound ("needs ~2x this box's free disk").
This sweep shows the real cause is PARAMETERIZATION, not the engine: the
gate's 8-planes-per-band default gives 2^8 = 256 buckets per band, so
expected bucket size grows linearly with the corpus — at 500k vectors
each bucket holds ~2k vectors and the candidate set is sum-over-buckets
C(size,2) ~ billions of pairs (quantified below from the actual bucket
histogram). Standard LSH practice scales planes with log(n); at
band_planes=14 (2^14 buckets) the same operator runs the same plan shape
with a linear-sized candidate set. The 100 TB lesson is the banding
parameter law, not a bigger disk.

Tiers verified here, Spark computing the FULL sf10 result at the
scale-correct parameters:
1. bucket histogram + candidate-count quantification for 8x8 vs 8x14
2. full pair count at 8x14
3. exact values for pairs touching ~40 hash-sampled vectors vs a DuckDB
   oracle whose +-1 plane matrix is derived INDEPENDENTLY with hashlib
   (the md5 spec both engines implement) and injected as literal arrays
   — the banded join's hash side is just the sampled vectors' keys.

Run: cd /root/repo && python sweeps/sf10_v6_scaled.py | tee /tmp/sweep_v6.log
"""

from __future__ import annotations

import hashlib
import os

from common import SF10, compare_rows, duck_con, get_spark, sampled_col, sampled_sql, stage

K = int(os.environ.get("SWEEP_K", "4999"))  # default ~40 of 200k vectors
N_BANDS = 8
BAND_PLANES = int(os.environ.get("SWEEP_BP", "14"))

_QUANT = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"
_COS = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def plane_literal(j: int, dim: int) -> str:
    """Plane j as a literal SQL array — the md5 sign spec
    (similarity.band_plane_signs), re-derived here with hashlib only."""
    signs = []
    for i in range(dim):
        h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
        signs.append("1.0" if h % 2 == 0 else "-1.0")
    return "[" + ", ".join(signs) + "]"


def sampled_oracle_sql(dim: int) -> str:
    keys = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN list_dot_product(v, {plane_literal(b * BAND_PLANES + k, dim)}) > 0 "
            f"THEN {1 << k} ELSE 0 END)"
            for k in range(BAND_PLANES)
        )
        + f" AS BIGINT) AS key{b}"
        for b in range(N_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, key{b} AS band_key FROM sk"
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
sk AS (SELECT vec_id, v, {keys} FROM base),
bands AS ({band_union}),
sb AS (SELECT * FROM bands WHERE {sampled_sql("CAST(vec_id AS VARCHAR)", K)}),
cand AS (
    SELECT DISTINCT LEAST(x.vec_id, y.vec_id) AS id_a,
                    GREATEST(x.vec_id, y.vec_id) AS id_b
    FROM sb x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_key = y.band_key
     AND x.vec_id != y.vec_id
)
SELECT id_a, id_b, ROUND({_COS}, 4) AS cos
FROM cand JOIN base a ON id_a = a.vec_id JOIN base b ON id_b = b.vec_id
WHERE ROUND({_COS}, 4) >= 0.4
"""


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.functions import similarity
    from treemachine_spark.io.tables import load_tables

    spark = get_spark("sweep-v6")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, SF10)["embeddings"].cache()
    n_vec = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])
    print(f"  corpus: {n_vec} vectors, dim {dim}", flush=True)

    with stage("quantify: bucket histograms + expected candidates (8x8 vs 8x14)"):
        for bp in (8, BAND_PLANES):
            keys = emb.select(
                similarity.band_keys_udf(N_BANDS, bp)(F.col("embedding")).alias("ks")
            ).select(F.posexplode("ks").alias("band_idx", "band_key"))
            cand = (
                keys.groupBy("band_idx", "band_key")
                .count()
                .agg(
                    F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                    F.max("count").alias("max_bucket"),
                )
                .collect()[0]
            )
            print(
                f"  band_planes={bp}: upper-bound candidate pairs "
                f"{int(cand['pairs']):,} (max bucket {cand['max_bucket']})",
                flush=True,
            )

    with stage(f"spark: FULL v6 at sf10, band_planes={BAND_PLANES}"):
        pairs = similarity.cosine_near_dup_pairs_lsh(
            emb, threshold=0.4, n_bands=N_BANDS, band_planes=BAND_PLANES
        ).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        print(f"  spark pairs (cos>=0.4): {n_pairs}", flush=True)

    with stage("spark: sampled pair rows"):
        srows = pairs.where(
            sampled_col(F.col("id_a"), K) | sampled_col(F.col("id_b"), K)
        ).collect()
        print(f"  spark sampled pairs: {len(srows)}", flush=True)

    with stage("duckdb: sampled literal-plane oracle"):
        con = duck_con()
        rel = con.sql(sampled_oracle_sql(dim))
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled pairs: {len(drows)}", flush=True)

    ok, msg = compare_rows(srows, drows, ["id_a", "id_b", "cos"], dcols)
    print(f"RESULT v6_scaled_sf10 ok={ok} {msg} (full pairs={n_pairs})", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
