"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard. All built-in column expressions (no UDFs) with
md5-derived hashing so the DuckDB oracles reproduce values bit-for-bit.

Scale design:
- exact: one hash-groupBy shuffle keyed on md5(text) — the canonical
  100 TB dedup plan (combiner-side partial agg keeps the shuffle tiny).
- minhash LSH: signatures are per-row (no shuffle); candidate pairs come
  from an equi-join on band keys, so cost is bounded by bucket collisions
  instead of the O(n^2) cross join; the Jaccard verify joins shingle sets
  back only for candidates. Skewed buckets (boilerplate docs) are handled
  by AQE skew-join splitting.
- simhash: per-row bit aggregation; near-dup = equal band keys on the
  signature (or hamming<=k via multi-probe), again join-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from treemachine_spark.functions.hashing import (
    BAND_SIZE,
    MERSENNE31,
    MINHASH_PERMS,
    h32,
)
from treemachine_spark.functions.text import words


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: (text_hash, keeper_id, n_copies), keeper = min doc_id."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles (distinct); whole text when shorter than k words."""
    w = words(text)
    return F.array_distinct(
        F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - k),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w)))
    )


def shingle_hashes(text: Column, k: int = 3) -> Column:
    return F.transform(shingles(text, k), lambda s: h32(s))


def minhash_signature(text: Column, k: int = 3) -> list[Column]:
    """One min over the shingle-hash array per fixed affine permutation —
    standard (a*h + b) mod p minwise hashing. Array-expression form (each
    permutation re-evaluates the md5 array); prefer ``minhash_signatures``
    for whole-table signatures."""
    hs = shingle_hashes(text, k)
    return [
        F.array_min(F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31))
        for a, b in MINHASH_PERMS
    ]


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, s0..s7): whole-table minhash via explode + one grouped
    aggregation. The shingle md5 is computed ONCE per shingle (the array
    form would inline it once per permutation — 8x the hashing), and the
    per-doc state is 8 running minima instead of materialized hash arrays —
    the shape that survives 100 TB document tables.
    """
    ex = docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("s")).select(
        "doc_id", h32(F.col("s")).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, band_idx, band_key): LSH banding of the minhash signature."""
    sig = minhash_signatures(docs, text_col, k)
    n_bands = len(MINHASH_PERMS) // BAND_SIZE
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    F.col(f"s{j}").cast("string")
                    for j in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)
                ],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.posexplode(bands).alias("band_idx", "band_key"))


def minhash_near_dup_pairs(
    docs: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.3
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification:
    (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard >= threshold.

    Candidates = pairs sharing >= 1 band bucket (equi-join, NOT a cross
    join); verification joins the distinct shingle sets back for the exact
    |A∩B|/|A∪B|.
    """
    # the band table feeds both sides of the self-join: cache it so the
    # shingle+minhash pipeline runs once
    bands = minhash_bands(docs, text_col, k).cache()
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # verification touches only candidate docs: collect the (request-scale)
    # candidate id set and compute shingle arrays for those rows alone
    cand = cand.cache()
    cand_ids = [
        r["doc_id"]
        for r in cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .collect()
    ]
    sh = docs.where(F.col("doc_id").isin(cand_ids)).select(
        "doc_id", shingles(F.col(text_col), k).alias("sh")
    )
    return (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.3
) -> DataFrame:
    """Exact n-gram Jaccard near-dups via an inverted shingle index
    (explode + self-join on shingle, then per-pair intersection counts) —
    no minhash approximation, still no cross join.

    |A∩B| comes from counting shared shingles in the inverted index;
    |A∪B| = |A| + |B| - |A∩B|.
    """
    sh = docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.s") == F.col("y.s")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def connected_components(pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Duplicate-cluster assignment: connected components over the near-dup
    pair graph, component id = min member id.

    Iterative min-label propagation (each round a node adopts the smallest
    label in its neighborhood incl. itself); converges in O(component
    diameter) rounds — tiny for near-dup clusters. This is the
    aggregate-messages/Pregel shape from GraphX expressed in DataFrames —
    at 100 TB each round is one shuffle keyed by node id, checkpointed to
    keep lineage flat (large-star/small-star is the upgrade path for
    long-chain graphs).

    Returns (node_id, component).
    """
    und = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
        .localCheckpoint(eager=True)
    )
    while True:
        nbr_min = (
            und.join(labels, und.dst == labels.node_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node_id == nbr_min.src, "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .where(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            return labels


def simhash32(text: Column) -> Column:
    """32-bit SimHash over word hashes: bit i of the signature is 1 iff the
    sum over words of (+1 if bit i of h(word) else -1) is positive.

    Pure array expressions: per bit, count set bits among word hashes and
    compare to half the word count.
    """
    hs = F.transform(words(text), lambda w: h32(w))
    n = F.size(hs)
    bit_votes = [
        F.when(
            F.size(F.filter(hs, lambda h: h.bitwiseAND(F.lit(1 << i)) != 0)) * 2 > n,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(32)
    ]
    out = F.lit(0).cast("long")
    for b in bit_votes:
        out = out + b
    return out


def simhash_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", simhash32(F.col(text_col)).alias("simhash"))
