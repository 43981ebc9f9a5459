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

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import PandasUDFType, pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


# ---------------------------------------------------------------------------
# Arrow-batched fast path.
#
# The expression forms above are pure Catalyst, but Spark evaluates nested
# higher-order functions (transform/aggregate lambdas) in INTERPRETED mode —
# measured ~3.5 s just to build shingle arrays for 5 000 docs/260 k shingles
# on local[32]. The Arrow-batched pandas UDFs below compute the identical
# values (same trim/whitespace-split/k-gram/first-occurrence-dedup/md5-h32
# pipeline, verified by the DuckDB oracle gate) ~5x faster, and stay a pure
# per-row map — no shuffle, scales linearly at 100 TB. PandasUDFType is
# passed explicitly because `from __future__ import annotations` defeats
# type-hint inference.
# ---------------------------------------------------------------------------


def _py_shingles(t: str | None, k: int) -> list[str]:
    """Python twin of shingles(): trim, split on whitespace, k-grams,
    first-occurrence dedup; whole text when shorter than k words."""
    ws = (t or "").strip().split()
    if len(ws) >= k:
        return list(dict.fromkeys(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)))
    return [" ".join(ws)]


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# Past this many hot (df > cap) shingles, ngram_jaccard_pairs stops routing
# the stop set through driver literals (an F.lit() element costs ~a py4j
# call, and an F.array literal this wide stalls codegen) and falls back to
# fully distributed forms. Module-level so the degenerate branch is testable.
HOT_LITERAL_MAX = 10_000


def _respread_for_arrow(df: DataFrame) -> DataFrame:
    """Repartition a (id, text)-shaped frame to the session's parallelism
    IFF it arrives with fewer partitions (r14, guide §2/§4): the sf-scale
    parquet lands in 1-2 scan partitions (single files under
    maxPartitionBytes), serializing every downstream Arrow shingling pass
    on a core or two. One narrow shuffle of the projection fixes every
    consumer. At 100 TB the corpus has file-count parallelism >= the
    session's, so the condition is false and NO payload shuffle happens —
    scale-adaptive, not a local[32] constant."""
    sc = df.sparkSession.sparkContext
    dp = sc.defaultParallelism
    return df.repartition(dp) if df.rdd.getNumPartitions() < dp else df


def shingle_array_udf(k: int = 3):
    """pandas UDF: text -> array<string> of distinct k-word shingles
    (== shingles(), Arrow-batched)."""

    def _f(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _py_shingles(t, k))

    return pandas_udf(_f, ArrayType(StringType()), PandasUDFType.SCALAR)


def minhash_sig_udf(k: int = 3):
    """pandas UDF: text -> array<long> 8-element minhash signature
    (== minhash_sig_array(), Arrow-batched + numpy-vectorized mins)."""
    A = np.array([a for a, _ in MINHASH_PERMS], dtype=np.int64)
    B = np.array([b for _, b in MINHASH_PERMS], dtype=np.int64)

    def _f(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _py_shingles(t, k)
            hs = np.fromiter((_h32_py(s) for s in sh), dtype=np.int64, count=len(sh))
            if len(hs):
                sig = ((A[None, :] * hs[:, None] + B[None, :]) % MERSENNE31).min(axis=0)
            else:
                sig = np.full(8, MERSENNE31, dtype=np.int64)
            out.append(sig.tolist())
        return pd.Series(out)

    return pandas_udf(_f, ArrayType(LongType()), PandasUDFType.SCALAR)


def minhash_index_udf(k: int = 3):
    """pandas UDF: text -> struct<sig array<long>, sh array<long>> — the
    minhash signature PLUS the distinct shingle-hash set, from ONE md5 per
    shingle (the digest's first 8 hex chars feed the 32-bit permutation
    input exactly like ``_h32_py``; its first 15 hex chars give a 60-bit
    shingle id for exact-intersection verification). Emitting both in one
    Arrow pass is what lets near-dup verification run entirely off the
    index, never re-shingling raw text (measured: the second shingle pass
    plus the second documents scan were ~40%% of the d2 cold path)."""
    A = np.array([a for a, _ in MINHASH_PERMS], dtype=np.int64)
    B = np.array([b for _, b in MINHASH_PERMS], dtype=np.int64)

    def _f(texts: pd.Series) -> pd.DataFrame:
        sigs, shs = [], []
        for t in texts:
            digs = [hashlib.md5(s.encode()).hexdigest() for s in _py_shingles(t, k)]
            hs = np.fromiter(
                (int(d[:8], 16) for d in digs), dtype=np.int64, count=len(digs)
            )
            if len(hs):
                sig = ((A[None, :] * hs[:, None] + B[None, :]) % MERSENNE31).min(axis=0)
            else:
                sig = np.full(8, MERSENNE31, dtype=np.int64)
            sigs.append(sig.tolist())
            shs.append([int(d[:15], 16) for d in digs])
        return pd.DataFrame({"sig": sigs, "sh": shs})

    return pandas_udf(
        _f,
        StructType(
            [
                StructField("sig", ArrayType(LongType())),
                StructField("sh", ArrayType(LongType())),
            ]
        ),
        PandasUDFType.SCALAR,
    )


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


def minhash_sig_array(text: Column, k: int = 3) -> Column:
    """8-element minhash signature in ONE ``aggregate()`` pass over the
    shingle-hash array: each element's md5 is computed once and feeds all 8
    running minima (8-long accumulator). Fully per-row — zero shuffle, the
    shape that survives 100 TB document tables (the explode+groupBy
    formulation measured ~25x slower: Spark evaluates generator inputs and
    higher-order lambdas in interpreted mode, see minhash_bands note)."""
    init = F.array(*[F.lit(MERSENNE31).cast("long")] * 8)
    return F.aggregate(
        shingle_hashes(text, k),
        init,
        lambda acc, h: F.array(
            *[
                F.least(F.element_at(acc, i + 1), (F.lit(a) * h + F.lit(b)) % MERSENNE31)
                for i, (a, b) in enumerate(MINHASH_PERMS)
            ]
        ),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, s0..s7): whole-table minhash, one per-row pass (see
    minhash_sig_array). NOTE: consume through ONE materialization (cache/
    write) — each s_i column re-inlines the signature expression if the
    plan stays lazy, because Catalyst collapses projections.
    """
    sig = docs.select("doc_id", minhash_sig_array(F.col(text_col), k).alias("sig"))
    return sig.select(
        "doc_id", *[F.element_at("sig", i + 1).alias(f"s{i}") for i in range(8)]
    )


def minhash_index(
    docs: DataFrame, text_col: str = "text", k: int = 3, with_shingles: bool = False
) -> DataFrame:
    """(doc_id, sig array<long>[, sh array<long>]): the minhash signature
    table — the LSH INDEX. Sig-only it is tiny (~1% of the doc table: id +
    8 longs); production builds it once at ingest, persists/writes it, and
    serves every near-dup query from it. Callers should persist (see
    minhash_bands).

    ``with_shingles=True`` additionally stores each doc's distinct 60-bit
    shingle-hash set (one md5 per shingle shared with the signature — see
    minhash_index_udf), which makes exact-Jaccard verification an
    index-only join: no second shingling pass, no second scan of the raw
    text table, and long arrays shuffle ~3x smaller than string shingles.
    The sh column is ~the tokenized corpus in size, so at 100 TB it lives
    in the written index table (columnar, only read by the verify join),
    not in executor cache."""
    if with_shingles:
        st = docs.select(
            "doc_id", minhash_index_udf(k)(F.col(text_col)).alias("st")
        )
        return st.select("doc_id", F.col("st.sig").alias("sig"), F.col("st.sh").alias("sh"))
    return docs.select("doc_id", minhash_sig_udf(k)(F.col(text_col)).alias("sig"))


def write_minhash_index(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    k: int = 3,
    with_shingles: bool = True,
) -> int:
    """Persist the minhash LSH index — the d2 family's ingest artifact
    (completing the lifecycle symmetry with write_pq_index /
    write_shingle_index): ``<out_dir>/minhash.parquet`` (doc_id, sig[,
    sh]) + ``meta.json`` (k, with_shingles). Production builds it once
    at ingest; every near-dup batch serves from the stored table via
    ``minhash_near_dup_pairs(sig=)`` — no re-shingling, and with the
    ``sh`` column the exact-Jaccard verify stays index-only. Returns
    rows written."""
    import json
    import os

    idx = minhash_index(docs, text_col, k, with_shingles=with_shingles)
    os.makedirs(out_dir, exist_ok=True)
    idx.write.mode("overwrite").parquet(os.path.join(out_dir, "minhash.parquet"))
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(
            {
                "k": k,
                "with_shingles": with_shingles,
                "corpus": _corpus_fingerprint(docs),
            },
            fh,
        )
    return docs.sparkSession.read.parquet(
        os.path.join(out_dir, "minhash.parquet")
    ).count()


def read_minhash_index(spark, out_dir: str, docs: DataFrame | None = None):
    """(index DataFrame, k) persisted by :func:`write_minhash_index` —
    feed the frame to ``minhash_near_dup_pairs(sig=)`` /
    ``minhash_bands(sig=)``. Pass the docs snapshot the index is meant
    to describe via ``docs=`` to validate the stored corpus fingerprint
    at load time (raises on drift — r9 ADVICE)."""
    import json
    import os

    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    if docs is not None:
        check_corpus_fingerprint(docs, meta, "read_minhash_index")
    return spark.read.parquet(os.path.join(out_dir, "minhash.parquet")), meta["k"]


def minhash_index_append(
    new_docs: DataFrame, out_dir: str, text_col: str = "text"
) -> int:
    """Extend a persisted minhash index with NEW documents: signatures
    use the module's fixed affine permutations (MINHASH_PERMS — a global
    constant, so appended rows are bit-compatible with stored ones by
    construction) and the STORED k/with_shingles; one pass over the new
    rows, nothing rewritten (pq_append discipline — the caller owns
    doc_id uniqueness, a live server republishes via a fresh load).
    Returns rows appended."""
    import json
    import os

    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    idx = minhash_index(
        new_docs, text_col, meta["k"], with_shingles=meta["with_shingles"]
    )
    n = new_docs.count()
    idx.write.mode("append").parquet(os.path.join(out_dir, "minhash.parquet"))
    if meta.get("corpus") is not None:
        new_fp = _corpus_fingerprint(new_docs)
        meta["corpus"] = {
            "n_docs": meta["corpus"]["n_docs"] + new_fp["n_docs"],
            "max_doc_id": max(
                meta["corpus"]["max_doc_id"], new_fp["max_doc_id"]
            ),
        }
        with open(os.path.join(out_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)
    return n


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band_idx, band_key): LSH banding of the minhash signature.

    Pass a prebuilt (cached) ``minhash_index`` when the band view feeds
    multiple consumers (both sides of the candidate self-join) — the cached
    index is tiny and at cluster scale is exactly the LSH index table you
    would write out once at ingest. Built inline (single-consumer case) the
    signature stays lazy: no hidden persist to leak.
    """
    if sig is None:
        sig = minhash_index(docs, text_col, k)
    n_bands = len(MINHASH_PERMS) // BAND_SIZE
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    F.element_at("sig", j + 1).cast("string")
                    for j in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)
                ],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.posexplode(bands).alias("band_idx", "band_key"))


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification:
    (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard >= threshold.

    Candidates = pairs sharing >= 1 band bucket (equi-join, NOT a cross
    join); verification joins the distinct shingle sets back for the exact
    |A∩B|/|A∪B|. Pass a prebuilt ``sig`` (minhash_index, cached at ingest)
    to serve from the index instead of building it inline.

    Verification is INDEX-ONLY when the signature table carries the ``sh``
    shingle-hash column (minhash_index(with_shingles=True), the default for
    the inline build): exact Jaccard runs over each pair's 60-bit hash sets
    pulled from the index — no second shingling UDF pass and no second scan
    of the raw text table (together ~40% of the cold path, measured at 50k
    docs). A 60-bit collision mis-counting one intersection element has
    probability ~|A||B|/2^60 ≈ 1e-13 per pair — below any tested scale. A
    sig WITHOUT ``sh`` (legacy/ingest-cached) falls back to re-shingling
    the candidate docs.

    Cache lifecycle: when this function builds the signature table itself it
    also UNPERSISTS it (and the candidate cache) after materializing the
    result, so repeated requests don't accumulate executor storage; a
    caller-supplied ``sig`` is the caller's to manage (the ingest-index
    case, where keeping it hot is the point).
    """
    own_sig = sig is None
    if own_sig:
        sig = minhash_index(docs, text_col, k, with_shingles=True).persist()
    # the persisted signature table is the join-side-shared LSH index; the
    # band explode view is recomputed per join side from that cache (cheaper
    # than materializing a second 4x-rows band table)
    bands = minhash_bands(docs, text_col, k, sig=sig)
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
    # verification touches only candidate docs: semi-join the (request-scale)
    # candidate id set — broadcast-built from the cached cand table, so no
    # separate collect round-trip. With an sh-bearing index the shingle-hash
    # arrays come straight from the (cached/persisted) index; otherwise
    # re-shingle the candidate rows from the raw text table.
    cand = cand.cache()
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    if "sh" in sig.columns:
        sh = sig.join(F.broadcast(ids), "doc_id", "left_semi").select("doc_id", "sh")
    else:
        sh = docs.join(F.broadcast(ids), "doc_id", "left_semi").select(
            "doc_id", shingle_array_udf(k)(F.col(text_col)).alias("sh")
        )
    # gate on the RAW ratio, round only in the projection: the DuckDB
    # oracles' WHERE compares the unrounded ratio, so filtering the
    # ROUND()ed value here would keep a raw jaccard in [t-5e-5, t) that
    # the oracle drops — a knife-edge row-set divergence (ADVICE r8)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    out = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
    # materialize once (result is pair-scale), then release the temp caches
    out = out.localCheckpoint(eager=True)
    cand.unpersist()
    if own_sig:
        sig.unpersist()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    max_doc_freq: int | None = None,
    max_candidates: int | None = 500_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dups via an inverted shingle index
    (explode + self-join on shingle, then per-pair intersection counts) —
    no minhash approximation, still no cross join.

    |A∩B| comes from counting shared shingles in the inverted index;
    |A∪B| = |A| + |B| - |A∩B|.

    ``max_doc_freq`` is the 100 TB scale knob: the self-join fan-out per
    shingle is quadratic in its document frequency, so common "stop
    shingles" dominate cost while carrying no dedup signal. With a cap, the
    index drops shingles appearing in more than ``max_doc_freq`` docs BEFORE
    the join, and doc sizes are recomputed over the surviving shingles — the
    result is the exact Jaccard over the capped shingle space (deterministic,
    oracle-checkable), the standard inverted-index prefix-filter practice.

    ``max_candidates`` is this exact tier's designed size gate (the
    exact-baseline policy: every quadratic baseline raises past its gate
    naming its scale twins, instead of dying opaquely mid-shuffle): the
    self-join's pre-aggregation volume is EXACTLY sum over shingles of
    C(df, 2), computed with one linear aggregation over the inverted
    index before the join is attempted. The derived /tmp/sf1 decade runs
    138M candidates (green in the r10 full-surface sweep); /tmp/sf10's
    100-replica blow-up is 13.9 BILLION — a plan no box or cluster
    should execute when the capped space (``max_doc_freq``, the d7/d9
    artifact), the request-scale probe (``ngram_jaccard_lookup``, d8),
    or banded minhash (``minhash_near_dup_pairs``, d2 — whose pairs feed
    ``connected_components`` for clustering at scale) computes the same
    decision sublinearly. ``None`` skips the guard (and its one agg job).
    """
    # materialize the shingle arrays before exploding (Arrow-batched UDF —
    # see the fast-path note above), because the inverted index feeds THREE
    # consumers (sizes, both join sides) — at cluster scale this
    # intermediate is the index table you'd write once.
    # r14 (guide §2/§4): respread the corpus to the session's parallelism
    # BEFORE the Arrow pass — the gate/bench corpus arrives in ~8 cache
    # partitions, serializing the shingle UDF (and every downstream explode
    # pass off this persist) on a quarter of the cores; one narrow shuffle
    # of (id, text) fixes all of them (persist_fill 1.8 -> 0.6 s at sf0.1).
    # This exact tier is size-gated (max_candidates), so the corpus here is
    # modest by design; the 100 TB families (d7/d8/d9/d2) shard via their
    # artifacts instead.
    arr = (
        _respread_for_arrow(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", shingle_array_udf(k)(F.col(text_col)).alias("sh"))
        .persist()
    )
    sh = arr.select("doc_id", F.explode("sh").alias("s"))
    dfs = (
        sh.groupBy("s").agg(F.count("*").alias("df"))
        if max_doc_freq is not None or max_candidates is not None
        else None
    )
    if max_doc_freq is not None:
        # r14 (guide §3.2/§2.3): the cap used to apply as an INNER join of
        # the exploded index against the vocabulary-scale rare-shingle set
        # — two index-scale exchanges keyed by shingle. The hot side is
        # the small one by construction (stop shingles are the head of the
        # df distribution; CLAUDE.md's "stoplist is hot-shingle-scale"),
        # so ONE linear agg now returns the capped candidate volume AND
        # the hot set together, and the cap becomes a broadcast anti-join
        # — no index shuffle, one df pass instead of two.
        gate = dfs.agg(
            F.sum(
                F.when(
                    F.col("df") <= max_doc_freq,
                    F.col("df") * (F.col("df") - 1) / 2,
                )
            ).alias("cand"),
            F.collect_list(
                F.when(F.col("df") > max_doc_freq, F.col("s"))
            ).alias("hot"),
        ).first()
        cand, hot = gate["cand"], gate["hot"]
        if hot and len(hot) <= HOT_LITERAL_MAX:
            hot_df = docs.sparkSession.createDataFrame(
                [(s,) for s in hot], sh.select("s").schema
            )
            sh = sh.join(F.broadcast(hot_df), "s", "left_anti")
        elif hot:
            # degenerate cap (hot set past literal scale — e.g. a tiny
            # max_doc_freq over a large corpus): don't re-upload the
            # collected list through py4j/broadcast; anti-join against the
            # df table distributed (one more pass off the persisted arr —
            # the pre-r14 cost shape, paid only in the degenerate case)
            sh = sh.join(
                dfs.where(F.col("df") > max_doc_freq).select("s"),
                "s",
                "left_anti",
            )
    elif max_candidates is not None:
        cand = dfs.agg(F.sum(F.col("df") * (F.col("df") - 1) / 2)).first()[0]
    if max_candidates is not None:
        from treemachine_spark.functions.similarity import TooManyPairsError

        # cand measured post-cap when one is set, so the guard sees the
        # volume the join will actually produce — computed in the SAME
        # linear agg as the stop set above (re-aggregating the joined
        # index would recompute the df subtree a second time; x15/x18)
        if cand is not None and cand > max_candidates:
            arr.unpersist(blocking=False)  # don't pin the shingle frame
            raise TooManyPairsError(
                f"exact shingle self-join would produce {int(cand):,} "
                f"candidate rows (> max_candidates={max_candidates:,}); "
                f"use max_doc_freq= (the d7 capped space / d9 artifact), "
                f"ngram_jaccard_lookup (the d8 request-scale probe), or "
                f"minhash_near_dup_pairs + connected_components (the d2/d5 "
                f"banded path) at this corpus scale"
            )
    # r14: ``sizes`` feeds TWO join consumers and Spark plans the subtree
    # once per consumer (the x15/x18 lesson). Uncapped, |A| is just the
    # persisted array's length — a projection off ``arr``, no explode+agg
    # (twice-planned cost becomes trivial). Capped, |A| over the SURVIVING
    # space = size(sh) - |sh ∩ hot| — with the hot set already collected
    # for the anti-join this is a codegen array_intersect against a
    # literal, same projection shape (shingle arrays are distinct per
    # doc); the explode+agg stays only for a degenerate giant hot set.
    if max_doc_freq is not None and hot and len(hot) <= HOT_LITERAL_MAX:
        hot_arr = F.array(*[F.lit(s) for s in hot])
        sizes = arr.select(
            "doc_id",
            (F.size("sh") - F.size(F.array_intersect("sh", hot_arr))).alias("n"),
        )
    elif max_doc_freq is not None and hot:
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    else:
        sizes = arr.select("doc_id", F.size("sh").alias("n"))
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
    # raw-ratio gate, ROUND in the projection only (oracle-WHERE parity —
    # see minhash_near_dup_pairs)
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
    # materialize once (pair-scale result), then release the shingle cache
    out = out.localCheckpoint(eager=True)
    arr.unpersist()
    return out


MAX_PROBE_DOCS = 10_000


def shingle_index(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, n, s): the exploded inverted shingle index — one row per
    (document, distinct k-word shingle), with the doc's shingle-set size
    riding every row. This is the dedup family's INDEX-BUILD artifact: a
    served snapshot (api/dedup.DedupIndex) computes it once per corpus and
    caches/persists it, so repeated probe/lookup requests skip the
    corpus-wide Arrow shingling pass (the ivf_cells pattern — the r8
    serving bench caught ANN rebuilding its cell assignment per request;
    this is the dedup twin). One-off batch/gate callers build it inline.

    explode_outer, not explode: plain explode makes the optimizer infer a
    size(sh) > 0 filter below the Generate, and that filter carries its
    own copy of the UDF — the Arrow pass would run TWICE per row
    (plan-audited in d8's first cut); the outer variant infers nothing,
    and the null rows short texts produce drop in one codegen filter.

    r14: the (id, text) projection respreads to the session's parallelism
    when it arrives under it (``_respread_for_arrow`` — the sf-scale
    single-file corpus otherwise serializes the Arrow pass on 1-2 cores;
    a no-op at real file counts)."""
    return (
        _respread_for_arrow(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", shingle_array_udf(k)(F.col(text_col)).alias("sh"))
        .select("doc_id", F.size("sh").alias("n"), F.explode_outer("sh").alias("s"))
        .where(F.col("s").isNotNull())
    )


def _corpus_fingerprint(docs: DataFrame, id_col: str = "doc_id") -> dict:
    """{n_docs, max_doc_id}: the cheap identity of a docs snapshot, stored
    in index-artifact meta.json so a probe against an index built from a
    DIFFERENT corpus fails loudly instead of silently computing wrong
    jaccards (r9 ADVICE: nothing bound DOCS_PARQUET to IDX_DIR — docs
    replaced without a rebuild, or an append applied to only one side,
    drifted invisibly). One column-pruned agg job."""
    row = docs.agg(
        F.count("*").alias("n"), F.max(id_col).alias("m")
    ).collect()[0]
    return {"n_docs": row["n"], "max_doc_id": row["m"]}


def check_corpus_fingerprint(
    docs: DataFrame, meta: dict, what: str, id_col: str = "doc_id"
) -> None:
    """Validate a docs snapshot against an index artifact's stored corpus
    fingerprint; raises ValueError on drift. Pre-fingerprint artifacts
    (no 'corpus' key) pass — rebuild to opt in."""
    fp = meta.get("corpus")
    if fp is None:
        return
    cur = _corpus_fingerprint(docs, id_col)
    if cur != fp:
        raise ValueError(
            f"{what}: corpus fingerprint mismatch — the index artifact was "
            f"built from {fp} but the docs snapshot is {cur}; the two have "
            f"drifted (docs replaced without a rebuild, or an append "
            f"applied to only one side). Rebuild or re-append so they match."
        )


def write_shingle_index(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    k: int = 3,
    n_buckets: int = 512,
    max_doc_freq: int | None = None,
) -> int:
    """Persist the inverted shingle index BUCKETED BY SHINGLE HASH — the
    100 TB serving artifact (the pq write_pq_index twin for the dedup
    family). Layout: ``<out_dir>/shingles.parquet`` partitioned by
    ``bucket = h32(s) % n_buckets`` plus ``meta.json`` (k, n_buckets,
    max_doc_freq, corpus fingerprint) and — capped only —
    ``stoplist.parquet``.

    Why buckets: a duplicates request touches only its own shingles, so
    a reader that filters ``bucket IN (h32(query shingles) % n)`` prunes
    whole partition DIRECTORIES at the parquet scan — the request reads
    ~|query shingles|/n_buckets of the corpus index from disk, needs NO
    executor-cached copy, and cold boot is a metadata read instead of a
    corpus-wide Arrow shingling pass. ``n_buckets`` trades pruning
    selectivity (one ~90-shingle text hits <=90 buckets) against file
    count; at corpus scale each bucket is a healthy parquet file.

    ``max_doc_freq`` bakes the d7 capped shingle space INTO the artifact
    (the 100 TB serving knob): shingles whose document frequency exceeds
    the cap are dropped from the index — a boilerplate "stop shingle" at
    web scale has df in the millions, so even a bucket-pruned request
    would stream its whole posting list — and every doc's stored ``n``
    is recomputed over the SURVIVING shingle space, so query-side sizes
    must come from the index, never from re-shingling raw text (the
    probe/lookup ``index_stoplist`` contract enforces this). The dropped
    shingles land in ``stoplist.parquet`` (s, df): request texts filter
    their own shingle sets against it (request-scale IN-pushed lookup)
    to compute their capped |A| the same way. The capped space is a
    WRITE-TIME snapshot — appends reuse it; rebuild to refresh dfs.
    Returns the number of index rows written."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    idx = shingle_index(docs, text_col, k)
    if max_doc_freq is not None:
        # one Arrow shingling pass feeds the df agg, the anti-join and the
        # size recompute (Spark does not reuse subplans — persist, spill-safe)
        idx = idx.persist()
        stop = (
            idx.groupBy("s")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_doc_freq)
        )
        stop.write.mode("overwrite").parquet(
            os.path.join(out_dir, "stoplist.parquet")
        )
        stop_s = docs.sparkSession.read.parquet(
            os.path.join(out_dir, "stoplist.parquet")
        ).select("s")
        kept = idx.join(stop_s, "s", "left_anti")
        sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
        out = kept.drop("n").join(sizes, "doc_id")
    else:
        out = idx
    out = out.withColumn("bucket", F.pmod(h32(F.col("s")), F.lit(n_buckets)))
    # r14 (guide §6): cluster rows by bucket BEFORE the partitioned write —
    # a partitionBy write from an m-partition frame opens up to
    # m x n_buckets files (the r14 respread raised m from 2 to 32: 1024
    # tiny files at sf0.1); one keyed repartition makes each bucket
    # directory a single healthy file and the write+read both faster.
    out.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, "shingles.parquet"))
    if max_doc_freq is not None:
        idx.unpersist()
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(
            {
                "k": k,
                "n_buckets": n_buckets,
                "max_doc_freq": max_doc_freq,
                "corpus": _corpus_fingerprint(docs),
            },
            fh,
        )
    spark = docs.sparkSession
    return spark.read.parquet(os.path.join(out_dir, "shingles.parquet")).count()


def read_shingle_index(spark, out_dir: str):
    """(index DataFrame, meta dict, stoplist DataFrame | None) persisted
    by :func:`write_shingle_index`. meta carries k / n_buckets /
    max_doc_freq / corpus fingerprint; stoplist is non-None exactly when
    the artifact is capped. The index frame is left UNcached on purpose:
    its value is disk-partition pruning per request (feed it to
    probe/lookup via ``index=`` + ``index_n_buckets=`` — and, capped,
    ``index_max_doc_freq=`` + ``index_stoplist=``)."""
    import json
    import os

    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    meta.setdefault("max_doc_freq", None)
    # shingle_index_append may have run in ANOTHER process since this
    # session last listed the path — Spark caches file listings
    # per-session forever, so refresh or a reload serves the pre-append
    # index (r12 sharded-soak lesson, same fix as DedupIndex.from_path)
    spark.catalog.refreshByPath(os.path.join(out_dir, "shingles.parquet"))
    idx = spark.read.parquet(os.path.join(out_dir, "shingles.parquet")).select(
        "doc_id", "n", "s",
        # partition-column inference narrows to int; restore long so the
        # driver-computed bucket literals match without implicit casts
        F.col("bucket").cast("long").alias("bucket"),
    )
    stop = None
    if meta["max_doc_freq"] is not None:
        stop = spark.read.parquet(os.path.join(out_dir, "stoplist.parquet"))
    return idx, meta, stop


def shingle_index_append(
    new_docs: DataFrame, out_dir: str, text_col: str = "text"
) -> int:
    """Incrementally extend a persisted shingle index: shingle ONLY the
    new documents with the STORED k and append their rows into the
    bucket layout — one pass over the new rows, nothing rewritten (the
    pq_append freshness discipline; the caller owns doc_id uniqueness).
    On a CAPPED artifact the new rows are filtered against the stored
    stoplist and their sizes recomputed over the survivors — the capped
    space is the write-time snapshot (appended docs cannot push a shingle
    onto the stoplist; rebuild to refresh dfs). The stored corpus
    fingerprint is extended to cover the appended docs. A LIVE DedupIndex
    serves its loaded snapshot — republish via from_path +
    ServerCore.swap_indexes. Returns rows appended."""
    import json
    import os

    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    idx = shingle_index(new_docs, text_col, meta["k"])
    if meta.get("max_doc_freq") is not None:
        stop_s = new_docs.sparkSession.read.parquet(
            os.path.join(out_dir, "stoplist.parquet")
        ).select("s")
        kept = idx.join(stop_s, "s", "left_anti")
        sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
        idx = kept.drop("n").join(sizes, "doc_id")
    idx = idx.withColumn(
        "bucket", F.pmod(h32(F.col("s")), F.lit(meta["n_buckets"]))
    )
    # materialize ONCE before count + write: a bare count() followed by
    # write() re-executes the Arrow shingling pass over the new docs (the
    # repo's never-re-execute-subplans invariant; r9 ADVICE) — append
    # batches are bounded, so a localCheckpoint is the cheap fix
    idx = idx.localCheckpoint(eager=True)
    n = idx.count()
    idx.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, "shingles.parquet")
    )
    if meta.get("corpus") is not None:
        new_fp = _corpus_fingerprint(new_docs)
        meta["corpus"] = {
            "n_docs": meta["corpus"]["n_docs"] + new_fp["n_docs"],
            "max_doc_id": max(
                meta["corpus"]["max_doc_id"], new_fp["max_doc_id"]
            ),
        }
        with open(os.path.join(out_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)
    return n


def _bucket_filter(shingle_set, n_buckets: int):
    """Driver-side twin of the artifact's bucket column: h32 is
    md5-derived, so ``_h32_py(s) % n_buckets`` reproduces
    ``pmod(h32(s), n)`` exactly (both non-negative)."""
    return sorted({_h32_py(s) % n_buckets for s in shingle_set})


def _check_capped_index_args(
    what: str, max_doc_freq, index, index_max_doc_freq, index_stoplist
) -> None:
    """Guard the capped-artifact contract (r9 verdict: mixing driver-side
    shingle sizes with a capped artifact silently inflates |A| — make the
    mix raise instead)."""
    if index_max_doc_freq is not None:
        if index is None:
            raise ValueError(
                f"{what}: index_max_doc_freq declares a capped ARTIFACT — "
                f"pass its index frame via index="
            )
        if max_doc_freq is not None:
            raise ValueError(
                f"{what}: the artifact already bakes in max_doc_freq="
                f"{index_max_doc_freq}; do not also pass the inline "
                f"max_doc_freq knob (cap-on-cap)"
            )
        if index_stoplist is None:
            raise ValueError(
                f"{what}: a capped artifact's stored sizes count only "
                f"surviving shingles — query-side sizes from driver-side "
                f"shingling would silently inflate |A|. Pass the artifact's "
                f"stoplist (read_shingle_index returns it) via "
                f"index_stoplist="
            )
    elif index_stoplist is not None:
        raise ValueError(
            f"{what}: index_stoplist given without index_max_doc_freq — "
            f"declare the artifact's cap so both sides agree on the "
            f"shingle space"
        )


def _stopped_shingles(index_stoplist, shingle_set) -> set:
    """The request's shingles that the capped artifact dropped.
    ``index_stoplist`` is either the stoplist DataFrame (one
    request-scale IN-pushed job) or a driver-resident set of stop
    shingles (the served path: the stoplist is hot-shingle-scale by
    construction, so DedupIndex collects it ONCE at boot — bench_dedup
    measured the per-request filter job costing more than the pruned
    read it saved on a mild-df corpus)."""
    if not shingle_set:
        return set()
    if isinstance(index_stoplist, (set, frozenset)):
        return set(shingle_set) & index_stoplist
    return {
        r["s"]
        for r in index_stoplist.where(
            F.col("s").isin(sorted(shingle_set))
        ).select("s").collect()
    }


def ngram_jaccard_probe(
    docs: DataFrame,
    probe_ids,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    max_doc_freq: int | None = None,
    index: DataFrame | None = None,
    index_n_buckets: int | None = None,
    index_max_doc_freq: int | None = None,
    index_stoplist: DataFrame | None = None,
) -> DataFrame:
    """Request-scale exact-Jaccard near-dup PROBE: the pairs of
    :func:`ngram_jaccard_pairs` restricted to those touching a bounded
    ``probe_ids`` set — "which corpus docs duplicate THESE documents".

    Same shingle space and the identical (doc_a, doc_b, jaccard) output
    rows as the batch recipe, but the plan is LINEAR in the corpus: the
    probe docs' shingles become the broadcast hash side and the full
    inverted index streams through once, so no all-pairs intermediate
    exists. The batch recipe's cost is sum-over-shingles C(df,2) — on a
    duplicate-heavy corpus that is quadratic in cluster size (the sf10
    derived set's 2.5B pair-shingle incidences exceed a single box's
    spill); this probe is the serving/decontamination shape that stays
    cheap at any corpus size, the same request-vs-batch split as
    ``brute_force_topk`` vs ``cosine_near_dup_pairs_lsh``.

    ``probe_ids`` is a driver-resident id list (request-scale contract,
    like ``node_distance``'s pair list) bounded by MAX_PROBE_DOCS —
    corpus-scale probing is the batch recipe's job.

    ``max_doc_freq`` is the same stop-shingle knob as the batch recipe's
    (``ngram_jaccard_pairs``/d7): a hot shingle in a probe doc otherwise
    pulls its entire document-frequency row set through the join, and at
    corpus scale common boilerplate shingles have df in the millions
    while carrying no dedup signal. With the cap, shingles above it drop
    BEFORE the join and sizes recompute over the surviving shingle space
    — exact capped-space Jaccard, identical to the batch twin's. The df
    table and the recomputed sizes are each materialized ONCE
    (localCheckpoint) — left lazy, every consumer of the capped stream
    re-executes the corpus-wide df aggregation, because Spark does not
    reuse subplans (ADVICE r8 measured the broadcast side re-running it).
    At 100 TB both are precomputed index artifacts.

    ``index_max_doc_freq`` + ``index_stoplist`` declare a CAPPED artifact
    (write_shingle_index(max_doc_freq=)): the cap is baked into the index
    — stored sizes count only surviving shingles — so the probe filters
    its driver-side shingle sets against the artifact's stoplist (one
    request-scale IN-pushed job) and computes each probe doc's |A| over
    the survivors, reproducing the stored n by construction. Declaring
    the cap without the stoplist (or mixing it with the inline
    ``max_doc_freq`` knob) raises — the silent alternative inflates |A|
    (r9 verdict's named trap).

    ``index`` (optional): a precomputed :func:`shingle_index` frame for
    the SAME (docs, k) — the served-snapshot path (DedupIndex caches it
    once; repeated requests then skip the corpus Arrow pass entirely).
    With an index (and no cap), the probe docs' shingles are collected
    FIRST (request-scale: one IN-pushed job over the cached index) and
    the stream side is pruned to rows whose shingle is in that set — a
    pure prune, since a row whose shingle no probe doc carries cannot
    join. Measured at 500k docs / 26.5M index rows: the un-pruned
    broadcast join+agg streams every index row per request (~2.1 s); the
    InSet prune cuts it ~3x (the bench_dedup delta — at cluster scale
    the written index is bucketed by shingle, so the same InSet prunes
    whole buckets, the read_pruned_closure pattern). Left None, the
    index streams inline: the corpus is shingled and scanned EXACTLY
    ONCE in the uncapped path (deriving |A|/|B| from a second/third pass
    would re-run the Arrow UDF corpus-wide — the first cut did; the plan
    audit caught it), which is the right trade for a one-off probe.
    """
    ids = list(dict.fromkeys(probe_ids))
    if not ids:
        raise ValueError("ngram_jaccard_probe: empty probe_ids")
    if len(ids) > MAX_PROBE_DOCS:
        raise ValueError(
            f"ngram_jaccard_probe is a request-scale operator bounded at "
            f"{MAX_PROBE_DOCS} probe docs ({len(ids)} given): use "
            f"ngram_jaccard_pairs / minhash_near_dup_pairs for corpus-scale"
        )
    _check_capped_index_args(
        "ngram_jaccard_probe", max_doc_freq, index, index_max_doc_freq,
        index_stoplist,
    )
    ex = shingle_index(docs, text_col, k) if index is None else index
    px = None
    if index is not None and max_doc_freq is None:
        # request-scale: fetch the probe docs' TEXTS (IN-pushed point
        # lookup on the docs table — linear in the probe set, never in
        # the index) and shingle them driver-side with the UDF's own
        # Python twin; that yields the broadcast side AND the stop-set /
        # bucket prunes in one step
        drows = (
            docs.where(F.col("doc_id").isin(ids))
            .select("doc_id", text_col)
            .collect()
        )
        doc_sh = {r["doc_id"]: _py_shingles(r[text_col], k) for r in drows}
        if index_max_doc_freq is not None:
            # capped artifact: each probe doc's |A| counts only shingles
            # surviving the write-time cap — filter against the stored
            # stoplist so pn reproduces the index's recomputed n exactly
            stopped = _stopped_shingles(
                index_stoplist, {s for sh in doc_sh.values() for s in sh}
            )
            doc_sh = {
                d: [s for s in sh if s not in stopped]
                for d, sh in doc_sh.items()
            }
        qsh = [
            (d, len(sh), s) for d, sh in doc_sh.items() for s in sh
        ]
        if qsh:
            px = docs.sparkSession.createDataFrame(
                pd.DataFrame(qsh, columns=["pid", "pn", "s"]),
                schema=f"pid {dict(docs.dtypes)['doc_id']}, pn int, s string",
            )
            sset = {s for _, _, s in qsh}
            if index_n_buckets:
                # persisted bucket layout: prune partition DIRECTORIES
                # before the row-level InSet (write_shingle_index)
                ex = ex.where(
                    F.col("bucket").isin(_bucket_filter(sset, index_n_buckets))
                )
            ex = ex.where(F.col("s").isin(sorted(sset)))
            if "bucket" in ex.columns:
                ex = ex.drop("bucket")
    if max_doc_freq is not None:
        # capped shingle space: drop hot shingles BEFORE the join and
        # recompute |A| over the survivors (the batch recipe's exact
        # semantics — sizes must describe the space pairs are counted in);
        # materialize df-survivors and sizes once each so neither corpus
        # aggregation re-runs under the probe's broadcast subtree
        rare = (
            ex.groupBy("s")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("s")
            .localCheckpoint(eager=True)
        )
        kept = ex.join(rare, "s")
        sizes = (
            kept.groupBy("doc_id")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True)
        )
        ex = kept.drop("n").join(sizes, "doc_id")
    if px is None:
        px = ex.where(F.col("doc_id").isin(ids)).select(
            F.col("doc_id").alias("pid"), F.col("n").alias("pn"), "s"
        )
    # ordered (pid, other) intersection counts; both-probe pairs arrive in
    # both orientations with equal counts and consistent sizes, so the
    # least/greatest + MAX normalization dedupes without double-counting
    # (the oracle's recipe); sizes ride the aggregation — no post-joins
    ordered = (
        ex.join(F.broadcast(px), "s")
        .where(F.col("doc_id") != F.col("pid"))
        .groupBy("pid", "doc_id")
        .agg(
            F.count("*").alias("n1"),
            F.max("pn").alias("pn"),
            F.max("n").alias("n_doc"),
        )
    )
    lo = F.col("pid") < F.col("doc_id")
    # raw-ratio gate, ROUND in the projection only (oracle-WHERE parity —
    # see minhash_near_dup_pairs)
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        ordered.groupBy(
            F.least("pid", "doc_id").alias("doc_a"),
            F.greatest("pid", "doc_id").alias("doc_b"),
        )
        .agg(
            F.max("n1").alias("n_inter"),
            F.max(F.when(lo, F.col("pn")).otherwise(F.col("n_doc"))).alias("n_a"),
            F.max(F.when(lo, F.col("n_doc")).otherwise(F.col("pn"))).alias("n_b"),
        )
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def ngram_jaccard_lookup(
    docs: DataFrame,
    texts,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    index: DataFrame | None = None,
    index_n_buckets: int | None = None,
    index_max_doc_freq: int | None = None,
    index_stoplist: DataFrame | None = None,
) -> DataFrame:
    """Decontamination LOOKUP: which corpus docs near-duplicate these
    QUERY TEXTS — the texts need not be in the corpus (the eval-set vs
    training-corpus shape; :func:`ngram_jaccard_probe` is the twin for
    queries that ARE corpus members). Exact Jaccard over the same
    k-word shingle space: query shingles are computed driver-side with
    the UDF's own Python twin (``_py_shingles`` — byte-identical
    pipeline) and broadcast, the corpus inverted index streams through
    once (single Arrow pass, sizes riding the stream), so the plan is
    the probe's: linear in the corpus, no all-pairs intermediate.
    A query identical to a corpus doc surfaces it at jaccard 1.0 —
    there is deliberately no self-exclusion (queries are not corpus
    rows). Returns (query_idx, doc_id, jaccard) above ``threshold``.

    ``index`` (optional): a precomputed :func:`shingle_index` frame for
    the SAME (docs, k) — the served-snapshot path; capped artifacts
    additionally require ``index_max_doc_freq`` + ``index_stoplist``
    (see :func:`ngram_jaccard_probe`). A capped query size counts only
    shingles surviving the write-time cap — a query shingle ABSENT from
    the corpus keeps counting (df 0 <= cap: it is in the capped space,
    contributing 0 to every intersection), only stop-listed ones drop.
    """
    tl = list(texts)
    if not tl:
        raise ValueError("ngram_jaccard_lookup: empty texts")
    if len(tl) > MAX_PROBE_DOCS:
        raise ValueError(
            f"ngram_jaccard_lookup is a request-scale operator bounded at "
            f"{MAX_PROBE_DOCS} query texts ({len(tl)} given): load the "
            f"queries as a table and use ngram_jaccard_pairs for "
            f"corpus-scale"
        )
    _check_capped_index_args(
        "ngram_jaccard_lookup", None, index, index_max_doc_freq,
        index_stoplist,
    )
    import pandas as pd

    q_sh = [_py_shingles(t, k) for t in tl]
    if index_max_doc_freq is not None:
        stopped = _stopped_shingles(
            index_stoplist, {s for sh in q_sh for s in sh}
        )
        q_sh = [[s for s in sh if s not in stopped] for sh in q_sh]
    qrows = []
    for qi, qsh in enumerate(q_sh):
        for s in qsh:
            qrows.append((qi, len(qsh), s))
    spark = docs.sparkSession
    px = spark.createDataFrame(
        pd.DataFrame(qrows, columns=["query_idx", "qn", "s"]),
        schema="query_idx int, qn int, s string",
    )
    ex = shingle_index(docs, text_col, k) if index is None else index
    # stop-set prune (see ngram_jaccard_probe): index rows whose shingle
    # appears in NO query text cannot join — the InSet filter cuts the
    # join+agg input from the whole inverted index to the queries'
    # neighborhoods (~3x at 500k docs; with a persisted bucket layout the
    # bucket InSet prunes partition directories at the parquet scan).
    # The query shingles are already driver-resident, so this costs no
    # extra job on the inline path either.
    sset = {s for _, _, s in qrows}
    if index_n_buckets:
        ex = ex.where(
            F.col("bucket").isin(_bucket_filter(sset, index_n_buckets))
        )
    ex = ex.where(F.col("s").isin(sorted(sset)))
    if "bucket" in ex.columns:
        ex = ex.drop("bucket")
    # raw-ratio gate, ROUND in the projection only (oracle-WHERE parity —
    # see minhash_near_dup_pairs)
    jac = F.col("n_inter") / (F.col("qn") + F.col("n_doc") - F.col("n_inter"))
    return (
        ex.join(F.broadcast(px), "s")
        .groupBy("query_idx", "doc_id")
        .agg(
            F.count("*").alias("n_inter"),
            F.max("qn").alias("qn"),
            F.max("n").alias("n_doc"),
        )
        .where(jac >= threshold)
        .select("query_idx", "doc_id", F.round(jac, 4).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 64,
    driver_max_pairs: int = 500_000,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the near-dup
    pair graph, component id = min member id. Returns (node_id, component).

    Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round every node
    hooks its larger neighbors (large-star) then its smaller-or-equal
    neighbors (small-star) onto the minimum of its neighborhood, converging
    to depth-1 stars in O(log^2 n) rounds REGARDLESS of component diameter
    — a 10k-node chain finishes in ~10 rounds where min-label propagation
    needs 10k. Each half-round is one groupBy shuffle keyed by node id plus
    a map-side least(); localCheckpoint keeps lineage flat.

    r14 (guide §1.2 step 1): below ``driver_max_pairs`` the pair graph is
    REQUEST-scale (the bench corpus yields 921 pairs) and every star round
    still paid 3 jobs x 32 shuffle tasks of pure scheduling — 2.3 s to
    cluster 921 edges. The driver tier collects the pairs via ONE
    incremental ``limit(N+1)`` probe (no separate count job; if the probe
    comes back full the distributed loop runs unchanged) and runs
    union-find with min-root tracking — the same component ids by
    construction (test_connected_components_driver_tier_matches pins both
    tiers on chain + random graphs). Pair-scale >> driver_max_pairs is
    exactly the regime the star loop exists for; set
    ``driver_max_pairs=0`` to force it.
    """
    slim = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if driver_max_pairs:
        probe = slim.limit(driver_max_pairs + 1).collect()
        if len(probe) <= driver_max_pairs:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:
                    parent[x], x = r, parent[x]
                return r

            for row in probe:
                u, v = row["u"], row["v"]
                # NULL endpoints: the distributed tier's u != v predicate
                # evaluates to NULL and drops the row — mirror that here
                # (None would otherwise enter the parent dict and break
                # the < comparison against real ids)
                if u is None or v is None or u == v:
                    continue
                for n in (u, v):
                    if n not in parent:
                        parent[n] = n
                ru, rv = find(u), find(v)
                # union by MIN id: the min member is always the root, so
                # find() IS the component id — no second pass
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            rows = [(n, find(n)) for n in parent]
            schema = StructType(
                [
                    StructField("node_id", slim.schema["u"].dataType),
                    StructField("component", slim.schema["u"].dataType),
                ]
            )
            return pairs.sparkSession.createDataFrame(rows, schema)
    edges = (
        slim
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # large-star: symmetric view; every neighbor v > u attaches to
        # m(u) = min(N(u) ∪ {u})
        # symmetric view via ONE explode (not a self-union: Union of a frame
        # with its own projection trips Catalyst's constraint rewrite —
        # "key not found: u#N" — and costs a second scan)
        sym = edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select(F.col("u").alias("mu"), F.least("u", "mv").alias("m"))
        )
        large = (
            sym.where(F.col("v") > F.col("u"))
            .join(m, F.col("u") == F.col("mu"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: orient each edge (big, small); every small neighbor
        # AND the center attach to min(N_<=(u) ∪ {u}) = min of the smalls;
        # both emissions come out of one explode over the joined row
        dirs = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m2 = dirs.groupBy("u").agg(F.min("v").alias("m")).select(
            F.col("u").alias("mu"), "m"
        )
        small = (
            dirs.join(m2, F.col("u") == F.col("mu"))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        stable = (
            small.exceptAll(edges).isEmpty() and edges.exceptAll(small).isEmpty()
        )
        edges = small
        if stable:
            break
    roots = edges.select(F.col("v").alias("node_id")).distinct().join(
        edges.select(F.col("u").alias("node_id")).distinct(), "node_id", "left_anti"
    )
    return edges.select(F.col("u").alias("node_id"), F.col("v").alias("component")).unionByName(
        roots.select("node_id", F.col("node_id").alias("component"))
    )


def connected_components_labelprop(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Min-label propagation baseline (the aggregate-messages/Pregel shape
    from GraphX in DataFrames): each round a node adopts the smallest label
    in its neighborhood incl. itself — O(component diameter) rounds, fine
    for shallow near-dup clusters, kept as the differential check for
    :func:`connected_components`. Returns (node_id, component).
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

    Single-pass pure array expressions: ONE aggregate() traversal of the
    word-hash array accumulates all 32 per-bit set counts (an array<long>
    accumulator zipped against a literal mask array), replacing the former
    32 separate filter() passes — same integer arithmetic, identical
    signatures (oracle d3_simhash unchanged), ~32× fewer array traversals.
    """
    hs = F.transform(words(text), lambda w: h32(w))
    n = F.size(hs)
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            masks,
            lambda c, m: F.when(c * 2 > n, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def simhash_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-scan SimHash (d3): one Arrow batch pass (r14, guide §4.2).

    :func:`simhash32`'s single-aggregate form still evaluates the per-word
    md5 AND a 32-wide ``zip_with`` accumulator per element in INTERPRETED
    mode (HOF lambdas never reach codegen) — profiled 36.6 s noop at sf0.1
    (5k docs), two orders over the x1 profile pass that does the same md5
    work per word. This twin moves the integer-only math across Arrow
    once: ``_py_words`` pins the engines' split/trim semantics, per-word
    h32 = first 8 md5 hex chars (exact), and the bit-majority is a numpy
    popcount-by-column — every value is an exact integer, so signatures
    are bit-identical to the Catalyst form by construction
    (test_simhash_arrow_equals_catalyst pins NULL/empty/NBSP edges).
    Measured 36.6 -> 0.52 s noop at sf0.1; :func:`simhash32` remains the
    pure-Catalyst column twin. NULL text: the HOF chain NULL-propagates
    (split(NULL) -> aggregate(NULL) -> NULL) — emit None to match."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import LongType

    from treemachine_spark.functions.text import _py_words

    shifts = np.arange(32, dtype=np.int64)

    def _f(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            if not isinstance(t, str):
                out.append(None)
                continue
            ws = _py_words(t)
            n = len(ws)
            hs = np.empty(n, dtype=np.int64)
            for i, w in enumerate(ws):
                h = memo.get(w)
                if h is None:
                    h = _h32_py(w)  # the module's one cross-engine recipe
                    memo[w] = h
                hs[i] = h
            bits = ((hs[:, None] >> shifts) & 1).sum(axis=0)
            out.append(int(((bits * 2 > n).astype(np.int64) << shifts).sum()))
        return pd.Series(out, dtype="object")

    udf = pandas_udf(_f, LongType(), PandasUDFType.SCALAR)
    return docs.select("doc_id", udf(F.col(text_col)).alias("simhash"))


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Benchmark decontamination (beyond-reference): flag corpus documents
    that share any k-word shingle with a held-out benchmark/eval set — the
    pretraining hygiene pass that purges test leakage before training.

    Returns (doc_id, n_hit): contaminated corpus docs and how many of their
    DISTINCT shingles appear anywhere in the benchmark.

    Scale shape: eval sets are thousands of rows while the corpus is the
    100 TB side, so the benchmark's distinct shingle set BROADCASTS; the
    corpus side is one linear pass (Arrow shingle UDF + explode) into the
    broadcast join and a partial-aggregated count — no corpus shuffle
    before the (tiny, contaminated-only) final aggregation.
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingle_array_udf(k)(F.col(text_col))).alias("s")
        ).distinct()
    )
    corpus_sh = docs.select(
        "doc_id", F.explode(shingle_array_udf(k)(F.col(text_col))).alias("s")
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )


def dup_spans(
    docs: DataFrame,
    width: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated token spans — the span-level form of exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): find every ``width``-token window whose exact
    text recurs in ``min_docs``+ distinct documents. Whole-doc dedup (d1)
    and near-dup (d2/d4) miss boilerplate that repeats INSIDE otherwise
    distinct documents; this catches it at span granularity.

    Plan: posexplode the token stream (narrow), hash each WORD once with
    h32 in whole-stage codegen, then form each span id with ``width-1``
    window ``lead``s and a Horner chain of integer multiply-adds — one
    shuffle (the window sort on doc/pos), one partial-aggregating groupBy.
    Measured 4x faster than hashing the joined span string inside an array
    ``transform`` (interpreted per-element md5 — the simhash lesson; 23 s
    -> 5.4 s at 100k docs / 14M spans). Two independent mod-Mersenne31
    chains combine into a 62-bit span id: at 14M spans a 32-bit space
    already yields ~20k birthday false-dups, 62 bits is collision-free in
    practice. No joins; corpus-linear at 100 TB. A suffix-array build (the
    paper's exact method) cannot distribute this way; span hashing is the
    standard scalable approximation.

    Returns (span_hash, n_docs, n_occurrences), filtered to cross-doc
    duplicates.
    """
    from pyspark.sql import Window

    from treemachine_spark.functions.hashing import MERSENNE31

    ex = _token_span_tables(docs, width, text_col, id_col)[1]
    return (
        ex.groupBy("span_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _token_span_tables(docs, width, text_col, id_col):
    """(tokens, spans) for the span-dedup family. tokens = (id, pos, w);
    spans = (id, pos, span_hash) where pos is the span's start token."""
    from pyspark.sql import Window

    from treemachine_spark.functions.hashing import MERSENNE31

    P1, P2 = 1_000_003, 69_069
    ws = words(F.lower(F.col(text_col)))
    toks = docs.select(F.col(id_col), F.posexplode(ws).alias("pos", "w"))
    hashed = toks.select(
        F.col(id_col), "pos", "w", (h32(F.col("w")) % MERSENNE31).alias("wh")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    h1, h2 = F.col("wh"), F.col("wh")
    for k in range(1, width):
        nxt = F.lead("wh", k).over(win)
        h1 = (h1 * P1 + nxt) % MERSENNE31
        h2 = (h2 * P2 + nxt) % MERSENNE31
    span_hash = h1 * F.lit(2_147_483_648) + h2
    spans = hashed.select(
        F.col(id_col), "pos", span_hash.alias("span_hash")
    ).where(F.col("span_hash").isNotNull())
    return toks, spans


def strip_dup_spans(
    docs: DataFrame,
    width: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ACTIONABLE half of substring dedup: rewrite each document with
    every duplicated ``width``-token span removed except the corpus-FIRST
    occurrence (lowest (doc_id, pos) — the keep-one policy of Lee et al.
    2022). A token covered by ANY dropped occurrence is dropped, so
    overlapping duplicated regions collapse together (greedy, deterministic).

    Plan on top of the shared span table (r14, guide §2.4 "two operations
    keyed the same way share one exchange"): the duplicate test and the
    keeper rank are BOTH per-span_hash quantities, so they run as stacked
    windows over ONE span_hash exchange — ``row_number`` ranks the keeper,
    ``max(dense_rank(id))`` over the whole partition is exactly
    ``countDistinct(id)`` with O(1) state (no collect_set blow-up on a
    boilerplate span hot in thousands of docs). The previous shape
    (groupBy -> self-join back onto spans) planned the explode+lead-window
    span subtree once per consumer and paid a second token-scale exchange
    for the join. Dropped occurrences then explode into covered token
    positions (width rows each — bounded); an anti-join keeps surviving
    tokens, and the rebuild is a per-doc sort-and-join aggregation. Every
    stage is keyed (span_hash or doc id) — no driver state, corpus-linear.

    Returns (doc_id, n_kept_tokens, clean_hash) — the rebuilt text is
    exposed via md5 so the cross-engine gate compares fixed-width values;
    the rebuilt text itself is whitespace-normalized lowercase (the token
    stream the pipeline trains on).
    """
    from pyspark.sql import Window

    toks, spans = _token_span_tables(docs, width, text_col, id_col)
    w_rank = Window.partitionBy("span_hash").orderBy(id_col, "pos")
    w_doc = Window.partitionBy("span_hash").orderBy(id_col)
    w_span = Window.partitionBy("span_hash")
    occ = spans.select(
        F.col(id_col),
        "pos",
        "span_hash",
        F.row_number().over(w_rank).alias("rn"),
        F.dense_rank().over(w_doc).alias("dr"),
    )
    dropped = occ.withColumn("nd", F.max("dr").over(w_span)).where(
        (F.col("nd") >= min_docs) & (F.col("rn") >= 2)
    )
    covered = dropped.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (width - 1))
        ).alias("pos"),
    ).distinct()
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            )
        ).alias("clean_hash"),
    )
    return docs.select(F.col(id_col)).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_kept_tokens"), F.lit(0)).alias("n_kept_tokens"),
        F.coalesce(F.col("clean_hash"), F.md5(F.lit(""))).alias("clean_hash"),
    )
