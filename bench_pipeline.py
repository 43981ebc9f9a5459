"""Training-data-pipeline scale bench: synthetic documents + embeddings
generated INSIDE Spark (deterministic, no driver materialization), then the
dedup / similarity / text operators timed at 20-100x the sf0.1 row counts.

This is the scale-up evidence for the beyond-reference operator families:
sf0.1 has 5k docs; here the same plans run on 100k-500k docs so the growth
curve (ideally ~linear for the per-row ops, bounded-bucket for LSH) is
measurable on one box.

Usage: python bench_pipeline.py [n_docs]   (default 100_000)
Prints ONE JSON line {"metric": ..., "value": total_sec, "queries": {...}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

A, B, V = 2_654_435_761, 97, 1000  # word-choice mixing constants, vocab size


def synth_docs(spark, n_docs: int, parts: int = 32):
    """Deterministic synthetic corpus: ~5% of docs are near-duplicates of
    their predecessor (same word stream + one extra word), the rest unique.
    Pure column expressions over spark.range — generation is distributed
    and O(n/partitions) per task."""
    base = (
        spark.range(0, n_docs, 1, parts)
        .withColumn("is_dup", (F.col("id") % 20 == 1) & (F.col("id") > 0))
        .withColumn("base_id", F.when(F.col("is_dup"), F.col("id") - 1).otherwise(F.col("id")))
        .withColumn("n_words", (F.lit(80) + F.pmod(F.col("base_id") * 31, F.lit(120))).cast("int"))
    )
    # murmur3-mixed word choice — a linear congruential pick makes docs with
    # base ids ≡ (mod V) near-identical, which quadratically explodes the
    # LSH candidate set; hashing (base_id, i) gives independent streams
    words = F.transform(
        F.sequence(F.lit(0), F.col("n_words") - 1),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.hash(F.col("base_id"), i), F.lit(V)).cast("string")
        ),
    )
    text = F.when(
        F.col("is_dup"),
        F.concat(F.concat_ws(" ", words), F.lit(" extra"), F.col("id").cast("string")),
    ).otherwise(F.concat_ws(" ", words))
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))


def synth_embeddings(spark, n_vecs: int, dim: int = 64, parts: int = 32):
    """Hash-mixed components give near-orthogonal vectors (the former
    linear-congruential fill made vectors repeat mod the modulus — ~88M
    genuine >0.8-cosine pairs at 50k vectors, so the LSH bench measured
    output size, not the operator). ~5% are planted near-duplicates of
    their predecessor (one perturbed component), the known answer set."""
    base = (
        spark.range(0, n_vecs, 1, parts)
        .withColumn("is_dup", (F.col("id") % 20 == 1) & (F.col("id") > 0))
        .withColumn(
            "base_id", F.when(F.col("is_dup"), F.col("id") - 1).otherwise(F.col("id"))
        )
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.hash(F.col("base_id"), j), F.lit(2000)) - 1000
            # perturb ONE component for planted dups (cosine stays ~0.99)
            + F.when(F.col("is_dup") & (j == 0), F.lit(200)).otherwise(F.lit(0))
        ).cast("float")
        / 1000.0,
    )
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from treemachine_spark.functions import dedup, similarity, text
    from treemachine_spark.session import get_spark

    spark = get_spark("treemachine-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).cache()
    emb = synth_embeddings(spark, n_docs // 2).cache()
    t0 = time.time()
    docs.count()
    emb.count()
    # spin up Arrow workers once (steady-state serving keeps them alive)
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    docs.select(_warm(F.col("doc_id"))).count()
    gen_sec = round(time.time() - t0, 2)

    timings: dict[str, float] = {}

    def tm(name, f):
        t = time.time()
        n = f()
        timings[name] = round(time.time() - t, 2)
        return n

    sig = dedup.minhash_index(docs, with_shingles=True).cache()
    tm("minhash_index_build", sig.count)
    n_pairs = tm(
        "minhash_near_dup_pairs",
        lambda: dedup.minhash_near_dup_pairs(docs, threshold=0.5, sig=sig).count(),
    )
    tm("exact_dedup", lambda: dedup.exact_dedup_groups(docs).count())
    tm("simhash", lambda: docs.select("doc_id", dedup.simhash32(F.col("text")).alias("s")).count())
    # the shipped d3 operator since r14 is the Arrow twin (simhash_profile);
    # keep the Catalyst row above for cross-round comparability and time the
    # serving path as its own row
    tm("simhash_arrow", lambda: dedup.simhash_profile(docs).count())
    tm("text_profile", lambda: text.text_profile(docs).count())
    tm("chunking", lambda: text.chunk_documents(docs).count())
    tm(
        "ann_ivf_topk",
        lambda: similarity.ivf_topk(emb, emb.where(F.col("vec_id") < 8), k=10).count(),
    )
    # band_planes scales with corpus size: 8 bits (256 buckets/band) suits
    # the 5k-doc sf tables; coarse buckets collide quadratically (50k vecs
    # at 8 bits -> ~39M candidates, 47 s; 500k at 16 bits -> ~15M, 55 s)
    # while one more notch keeps buckets ~1 row at >=98% recall for
    # cos>=0.99 — the knob a 100 TB deployment tunes with corpus growth.
    band_planes = 16 if n_docs // 2 <= 100_000 else 20
    n_cos_pairs = tm(
        "cosine_pairs_lsh",
        lambda: similarity.cosine_near_dup_pairs_lsh(
            emb, threshold=0.8, band_planes=band_planes
        ).count(),
    )
    tm("centroid_cells", lambda: similarity.centroid_assign(emb).groupBy("cent_id").count().count())
    tm("dup_spans_w6", lambda: dedup.dup_spans(docs, width=6).count())
    tm("tfidf_top3", lambda: text.tfidf_topk(docs, k=3).count())
    tm(
        "kmeans_fit_2iter",
        lambda: similarity.kmeans_fit(emb, k=8, iters=2)[1].count(),
    )
    from treemachine_spark.functions import bpe as bpe_mod

    tm("bpe_train_5merges", lambda: len(bpe_mod.bpe_train(docs, n_merges=5)[0]))

    # correctness tripwire (same philosophy as bench.py): the generators
    # plant exactly n/20 near-duplicates, so the dedup stages have KNOWN
    # answers — minhash must find all planted doc pairs; banded cosine LSH
    # must find >= 98% of planted vector pairs (its recall bound).
    planted_docs, planted_vecs = n_docs // 20, (n_docs // 2) // 20
    bench_ok = n_pairs == planted_docs and n_cos_pairs >= int(planted_vecs * 0.98)

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "pipeline_scale_wall_clock",
                "value": total,
                "unit": "sec",
                "n_docs": n_docs,
                "n_vecs": n_docs // 2,
                "near_dup_pairs_found": n_pairs,
                "cosine_lsh_pairs_found": n_cos_pairs,
                "planted_doc_pairs": planted_docs,
                "planted_vec_pairs": planted_vecs,
                "bench_ok": bench_ok,
                "gen_sec": gen_sec,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
