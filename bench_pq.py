"""IVF-PQ scale benchmark: codebook train + corpus encode + ADC serving
wall-clock, and the compression ratio that motivates PQ at 100 TB
(functions/pq.py). Usage:

    python bench_pq.py [sf_dir]          # default /tmp/sf1

Prints one JSON line. Not driver-run; evidence for NOTES."""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from treemachine_spark.functions import pq, similarity
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.session import get_spark

    spark = get_spark("treemachine-pq-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"].repartition(32).cache()
    n = emb.count()
    dim = len(emb.select("embedding").limit(1).collect()[0][0])
    q = emb.where(F.col("vec_id") < 16).localCheckpoint(eager=True)
    q.count()

    t0 = time.time()
    cb = pq.pq_train(emb, m=8, n_codes=16, iters=3, train_rows=10_000)
    train_sec = round(time.time() - t0, 2)

    t0 = time.time()
    codes = pq.pq_encode(emb, cb).localCheckpoint(eager=True)
    n_codes_rows = codes.count()
    encode_sec = round(time.time() - t0, 2)

    t0 = time.time()
    pq_rows = pq.ivf_pq_topk(
        emb, q, k=10, n_centroids=32, n_probe=4, codebook=cb, codes=codes,
        rerank=True, rerank_factor=5,
    ).count()
    pq_query_sec = round(time.time() - t0, 2)

    t0 = time.time()
    ivf_rows = similarity.ivf_topk(
        emb, q, k=10, n_centroids=32, n_probe=4
    ).count()
    ivf_query_sec = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "ivf_pq",
                "sf_dir": sf_dir,
                "n_vectors": n,
                "dim": dim,
                "train_sec": train_sec,
                "encode_sec": encode_sec,
                "pq_query_sec": pq_query_sec,
                "ivf_query_sec": ivf_query_sec,
                "pq_rows": pq_rows,
                "ivf_rows": ivf_rows,
                "bytes_per_vec_raw": dim * 4,
                "bytes_per_vec_pq": 8,
                "compression_x": round(dim * 4 / 8, 1),
                "codes_rows": n_codes_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
