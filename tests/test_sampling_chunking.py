"""Property tests for the sampling / chunking pipeline ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from treemachine_spark.functions.sampling import hash_sample, hash_split
from treemachine_spark.functions.text import chunk_words


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_hash_split_is_deterministic_partition(spark):
    docs = _docs(spark)
    a = hash_split(docs, "doc_id")
    b = hash_split(docs, "doc_id")
    # deterministic: identical assignment across evaluations
    assert a.exceptAll(b).count() == 0
    # a partition: every row assigned exactly once
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # ~80/10/10 within tolerance
    assert abs(counts["train"] - 1600) < 120
    assert abs(counts["val"] - 200) < 80
    assert abs(counts["test"] - 200) < 80


def test_hash_sample_subset_and_salt_independence(spark):
    docs = _docs(spark)
    s10 = hash_sample(docs, "doc_id", 10)
    s20 = hash_sample(docs, "doc_id", 20)
    # nested rates: the 10% sample is a subset of the 20% sample
    assert s10.exceptAll(s20).count() == 0
    # a different salt draws a (near-)independent sample
    other = hash_sample(docs, "doc_id", 10, salt="b")
    overlap = s10.select("doc_id").intersect(other.select("doc_id")).count()
    assert overlap < 60  # ~1% of 2000 expected, generous bound


def test_chunks_reconstruct_text_when_no_overlap(spark):
    df = spark.createDataFrame(
        [("x y z a b c d",), ("one two",), ("single",)], "text string"
    )
    rejoined = df.select(
        F.col("text"),
        F.concat_ws(" ", chunk_words(F.col("text"), size=3, overlap=0)).alias("re"),
    )
    assert rejoined.where(F.col("re") != F.col("text")).count() == 0


def test_chunk_overlap_prefix_property(spark):
    # consecutive chunks share exactly `overlap` words at the boundary
    df = spark.createDataFrame([(" ".join(f"w{i}" for i in range(20)),)], "text string")
    chunks = df.select(chunk_words(F.col("text"), size=8, overlap=3).alias("c")).collect()[0]["c"]
    for a, b in zip(chunks, chunks[1:]):
        wa, wb = a.split(), b.split()
        assert wa[-3:] == wb[:3] or len(wb) < 3  # tail chunk may be short
