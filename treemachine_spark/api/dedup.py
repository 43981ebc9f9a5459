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
inverted-index stream, single Arrow pass) and deterministic, so
responses cache under the server's snapshot contract.
"""

from __future__ import annotations

from treemachine_spark.api.errors import BadInputError

MAX_REQUEST_DOCS = 256


class DedupIndex:
    """A served document corpus snapshot (cached DataFrame; a bucketed
    table at cluster scale)."""

    def __init__(
        self,
        docs,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 3,
    ):
        self.docs = docs
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        if docs.select(id_col).head() is None:
            raise BadInputError("dedup index: documents table is empty")

    @classmethod
    def from_path(cls, spark, docs_path: str, **kw):
        docs = spark.read.parquet(docs_path).cache()
        docs.count()
        return cls(docs, **kw)

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
                k=self.k, threshold=float(threshold),
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
                k=self.k, threshold=float(threshold),
            ).collect()
            # pairs are (min, max)-normalized; expand to each REQUESTED id's
            # partner list (a both-probe pair lands in both lists)
            requested = list(dict.fromkeys(doc_ids))
            by_id: dict[int, list[dict]] = {i: [] for i in requested}
            for r in rows:
                for me, other in ((r["doc_a"], r["doc_b"]), (r["doc_b"], r["doc_a"])):
                    if me in by_id:
                        by_id[me].append(
                            {"doc_id": other, "jaccard": float(r["jaccard"])}
                        )
            results = [by_id[i] for i in requested]
        for lst in results:
            lst.sort(key=lambda d: (-d["jaccard"], d["doc_id"]))
        return {"threshold": float(threshold), "results": results}
