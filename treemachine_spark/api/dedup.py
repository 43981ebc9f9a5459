"""Dedup serving surface: a loaded document corpus behind POST
/v3/documents/duplicates (beyond-reference — completes the dedup
family's ingest -> index -> SERVE loop the way api/ann.py does for
vectors).

Two request shapes, both exact n-gram Jaccard over the corpus shingle
space:
- ``texts``: decontamination lookup — are THESE texts (eval set,
  incoming submissions) near-dups of corpus members? The texts need not
  be in the corpus (``functions/dedup.ngram_jaccard_lookup``).
- ``doc_ids``: membership probe — which corpus docs duplicate THESE
  corpus members (``ngram_jaccard_probe``, gate d8's operator).

Both plans are linear in the corpus (broadcast query shingles, one
inverted-index stream) and deterministic, so responses cache under the
server's snapshot contract. The corpus-wide Arrow shingling pass is an
INDEX-BUILD step, not a request step: the exploded inverted shingle
index (``functions/dedup.shingle_index``) is computed ONCE at
construction and cached — the ivf_cells pattern the r8 serving bench
forced onto AnnIndex; without it every non-cached request re-shingled
the corpus (r8 verdict's one structural finding, measured in
bench_dedup.py).
"""

from __future__ import annotations

from treemachine_spark.api.errors import BadInputError

MAX_REQUEST_DOCS = 256


class DedupIndex:
    """A served document corpus snapshot: the raw docs DataFrame plus the
    cached inverted shingle index (both bucketed tables at cluster scale).

    Construction materializes the index (one corpus-wide Arrow shingling
    pass) — a documented boot cost for a served snapshot; never put index
    construction on a request path."""

    def __init__(
        self,
        docs,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 3,
        index_dir: str | None = None,
    ):
        self.docs = docs
        self.text_col = text_col
        self.id_col = id_col
        if docs.select(id_col).head() is None:
            raise BadInputError("dedup index: documents table is empty")
        from treemachine_spark.functions import dedup

        if index_dir is not None:
            # persisted bucket layout (functions/dedup.write_shingle_index,
            # `cli dedupbuild`): cold boot is a metadata read, requests
            # prune partition DIRECTORIES by the query shingles' buckets —
            # no executor-cached copy of the index at all (the 100 TB
            # shape). k (and the optional df cap + stoplist) come from the
            # artifact (the shingle space is k- and cap-specific); the
            # stored corpus fingerprint is validated against THIS docs
            # snapshot at boot, so a drifted DOCS_PARQUET/IDX_DIR pair
            # fails loudly instead of silently computing wrong jaccards
            # (r9 ADVICE).
            self.index, meta, stoplist = dedup.read_shingle_index(
                docs.sparkSession, index_dir
            )
            dedup.check_corpus_fingerprint(
                docs, meta, "DedupIndex boot", id_col
            )
            self.k = meta["k"]
            self.n_buckets = meta["n_buckets"]
            self.max_doc_freq = meta["max_doc_freq"]
            # the stoplist is hot-shingle-scale by construction — collect
            # it ONCE at boot so requests filter their shingle sets with a
            # set intersection instead of a per-request Spark job
            # (bench_dedup: the filter job cost more than the pruned read
            # it saved)
            self.stoplist = (
                frozenset(r["s"] for r in stoplist.collect())
                if stoplist is not None
                else None
            )
        else:
            # in-memory snapshot: the (doc_id, n, s) inverted index built
            # once per snapshot and cached; every probe/lookup request
            # streams the cache (stop-set-pruned) instead of re-running
            # the corpus shingle UDF
            self.k = k
            self.n_buckets = None
            self.max_doc_freq = None
            self.stoplist = None
            self.index = dedup.shingle_index(
                docs, text_col=text_col, k=k
            ).cache()
            self.index.count()

    @classmethod
    def from_path(cls, spark, docs_path: str, index_dir: str | None = None, **kw):
        # a fresh snapshot must see files appended by ANOTHER process:
        # Spark caches the path's file listing per-session forever
        # (metadataCacheTTLSeconds=-1), so without the refresh a reload
        # after a cross-process append reads the stale listing and the
        # boot fingerprint check trips (caught by the r12 sharded soak —
        # worker reload saw 500 docs against a 501-doc index artifact)
        spark.catalog.refreshByPath(docs_path)
        docs = spark.read.parquet(docs_path).cache()
        docs.count()
        return cls(docs, index_dir=index_dir, **kw)

    def unpersist(self) -> None:
        """Release this snapshot's cached DataFrames (docs + the inline
        shingle index; no-ops on uncached frames, e.g. the bucketed-disk
        index). Called by ServerCore.swap_indexes on the REPLACED snapshot
        so repeated republishes don't accumulate dead executor cache (r9
        ADVICE); non-blocking, and an in-flight request against the old
        snapshot merely recomputes."""
        for df in (self.docs, self.index):
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass

    def texts_of(self, doc_ids) -> dict[int, str | None]:
        """Resolve corpus members' texts by id (request-scale IN-pushed
        point lookup). Missing ids map to None — the router's sharded
        doc_ids indirection uses this to find each doc's owning shard.
        A MEMBER whose text column is NULL maps to '' (its shingle twin:
        both shingle to the single empty shingle), so the re-issued
        sharded lookup reproduces the unsharded probe's jaccards instead
        of silently treating the member as unknown (r9 ADVICE)."""
        from pyspark.sql import functions as F

        ids = list(dict.fromkeys(doc_ids))
        rows = (
            self.docs.where(F.col(self.id_col).isin(ids))
            .select(self.id_col, self.text_col)
            .collect()
        )
        found = {
            r[self.id_col]: (r[self.text_col] if r[self.text_col] is not None else "")
            for r in rows
        }
        return {i: found.get(i) for i in ids}

    def resolve_texts(self, doc_ids=None) -> dict:
        """The /v3/documents/text blob: {"texts": {id: text-or-null}}.
        Ids not in this corpus slice map to null — the sharded router
        treats "null everywhere" as not-a-member (matching the probe's
        silent-empty contract for unknown ids). Members with a NULL text
        column map to '' via texts_of (their shingle twin), so the
        sharded indirection matches the unsharded probe on them too."""
        if not isinstance(doc_ids, (list, tuple)) or not doc_ids or not all(
            isinstance(i, int) and not isinstance(i, bool) for i in doc_ids
        ):
            raise BadInputError("'doc_ids' must be a non-empty list of ints")
        if len(doc_ids) > MAX_REQUEST_DOCS:
            raise BadInputError(
                f"'doc_ids' is bounded at {MAX_REQUEST_DOCS} per request "
                f"({len(doc_ids)} given)"
            )
        return {
            "texts": {str(i): t for i, t in self.texts_of(doc_ids).items()}
        }

    def duplicates(
        self,
        texts=None,
        doc_ids=None,
        threshold: float = 0.3,
    ) -> dict:
        if (texts is None) == (doc_ids is None):
            raise BadInputError(
                "pass exactly one of 'texts' (decontamination lookup) or "
                "'doc_ids' (corpus-member probe)"
            )
        if not isinstance(threshold, (int, float)) or isinstance(
            threshold, bool
        ) or not 0 < threshold <= 1:
            raise BadInputError("'threshold' must be a number in (0, 1]")
        from treemachine_spark.functions import dedup

        if texts is not None:
            if not isinstance(texts, (list, tuple)) or not texts or not all(
                isinstance(t, str) for t in texts
            ):
                raise BadInputError("'texts' must be a non-empty list of strings")
            if len(texts) > MAX_REQUEST_DOCS:
                raise BadInputError(
                    f"'texts' is bounded at {MAX_REQUEST_DOCS} per request "
                    f"({len(texts)} given): shard larger lookups, or run "
                    f"ngram_jaccard_pairs over a query table"
                )
            rows = dedup.ngram_jaccard_lookup(
                self.docs, list(texts), text_col=self.text_col,
                k=self.k, threshold=float(threshold), index=self.index,
                index_n_buckets=self.n_buckets,
                index_max_doc_freq=self.max_doc_freq,
                index_stoplist=self.stoplist,
            ).collect()
            results: list[list[dict]] = [[] for _ in texts]
            for r in rows:
                results[r["query_idx"]].append(
                    {"doc_id": r["doc_id"], "jaccard": float(r["jaccard"])}
                )
        else:
            if not isinstance(doc_ids, (list, tuple)) or not doc_ids or not all(
                isinstance(i, int) and not isinstance(i, bool) for i in doc_ids
            ):
                raise BadInputError("'doc_ids' must be a non-empty list of ints")
            if len(doc_ids) > MAX_REQUEST_DOCS:
                raise BadInputError(
                    f"'doc_ids' is bounded at {MAX_REQUEST_DOCS} per request "
                    f"({len(doc_ids)} given)"
                )
            rows = dedup.ngram_jaccard_probe(
                self.docs, list(doc_ids), text_col=self.text_col,
                k=self.k, threshold=float(threshold), index=self.index,
                index_n_buckets=self.n_buckets,
                index_max_doc_freq=self.max_doc_freq,
                index_stoplist=self.stoplist,
            ).collect()
            # pairs are (min, max)-normalized; expand to each REQUESTED id's
            # partner list (a both-probe pair lands in both lists). Results
            # align to the ORIGINAL doc_ids order, duplicates repeated —
            # matching the texts form's positional contract (ADVICE r8: the
            # deduplicated alignment silently shifted positions when a
            # request repeated an id).
            by_id: dict[int, list[dict]] = {i: [] for i in doc_ids}
            for r in rows:
                for me, other in ((r["doc_a"], r["doc_b"]), (r["doc_b"], r["doc_a"])):
                    if me in by_id:
                        by_id[me].append(
                            {"doc_id": other, "jaccard": float(r["jaccard"])}
                        )
            for lst in by_id.values():
                lst.sort(key=lambda d: (-d["jaccard"], d["doc_id"]))
            return {
                "threshold": float(threshold),
                "results": [list(by_id[i]) for i in doc_ids],
            }
        for lst in results:
            lst.sort(key=lambda d: (-d["jaccard"], d["doc_id"]))
        return {"threshold": float(threshold), "results": results}
