"""d9 capped-space dedup ARTIFACT at sf10 — PROBE value tier (r10).

The r10 gate (d9_capped_artifact) proves the capped artifact at the
driver's SFs; this sweep signs the same semantics at 500k docs / ~26M
index rows: Spark WRITES the real artifact (write_shingle_index with
max_doc_freq baked in: stop shingles dropped from the bucket layout,
sizes recomputed over survivors, stoplist persisted) and serves a
hash-sampled PROBE through it with index-derived sizes; DuckDB
re-derives the capped shingle space relationally (the d7 oracle recipe)
and restricts to the same sampled docs. Values compared exactly.

The cap is computed from the corpus itself (p99 of shingle document
frequency) so the stoplist is non-vacuous by construction on any corpus;
the literal feeds both engines.

Run: cd /root/repo && python sweeps/sf10_d9_capped.py | tee /tmp/sweep_d9.log
"""

from __future__ import annotations

import os
import shutil
import tempfile

from common import SF10, compare_rows, duck_con, get_spark, sampled_col, sampled_sql, stage

K = int(os.environ.get("SWEEP_K", "12503"))  # default ~40 of 500k docs


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.functions.dedup import (
        ngram_jaccard_probe,
        read_shingle_index,
        shingle_index,
        write_shingle_index,
    )
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.workload.pipeline_oracles import _SHINGLES_CTE

    spark = get_spark("sweep-d9")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF10)["documents"]

    with stage("spark: pick cap = p99(shingle df)"):
        df_q = (
            shingle_index(docs)
            .groupBy("s")
            .agg(F.count("*").alias("df"))
            .approxQuantile("df", [0.99], 0.001)
        )
        cap = max(2, int(df_q[0]))
        print(f"  max_doc_freq = {cap}", flush=True)

    art = tempfile.mkdtemp(prefix="sweep_d9_art_")
    try:
        with stage("spark: write capped artifact (ingest job)"):
            rows = write_shingle_index(docs, art, max_doc_freq=cap)
            idx, meta, stop = read_shingle_index(spark, art)
            n_stop = stop.count()
            print(f"  index rows {rows}, stoplist {n_stop}", flush=True)
            assert n_stop > 0, "cap did not bite — sweep would be vacuous"

        with stage("spark: sampled PROBE through the artifact"):
            sampled_ids = [
                r["doc_id"]
                for r in docs.where(sampled_col(F.col("doc_id"), K))
                .select("doc_id")
                .collect()
            ]
            print(f"  sampled probe docs: {len(sampled_ids)}", flush=True)
            srows = ngram_jaccard_probe(
                docs, sampled_ids,
                index=idx, index_n_buckets=meta["n_buckets"],
                index_max_doc_freq=meta["max_doc_freq"],
                index_stoplist=stop,
            ).collect()
        print(f"  spark sampled pairs: {len(srows)}", flush=True)

        with stage("duckdb: capped sampled oracle"):
            con = duck_con()
            tail = f"""
, ex0 AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, rare AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= {cap})
, ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN rare USING (s))
, sx AS (SELECT * FROM ex WHERE {sampled_sql("CAST(doc_id AS VARCHAR)", K)})
, inter1 AS (
    SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS n_inter
    FROM sx x JOIN ex y ON x.s = y.s AND x.doc_id != y.doc_id
    GROUP BY 1, 2
)
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
            rel = con.sql(_SHINGLES_CTE + tail)
            dcols = list(rel.columns)
            drows = rel.fetchall()
            print(f"  oracle sampled pairs: {len(drows)}", flush=True)

        ok, msg = compare_rows(srows, drows, ["doc_a", "doc_b", "jaccard"], dcols)
        print(f"RESULT d9_capped_sf10 ok={ok} {msg}", flush=True)
        if not ok:
            raise SystemExit(1)
    finally:
        shutil.rmtree(art, ignore_errors=True)


if __name__ == "__main__":
    main()
