"""Shard router: dispatch tree_of_life requests across worker processes.

Single-process serving tops out around ~32 concurrent clients at local[32]
(NOTES_r4): every request is one-or-more full-closure task waves on ONE
SparkSession, so p95 grows with queue depth once clients outnumber task
slots. The deployment shape the NOTES document is horizontal: each WORKER
process owns its own SparkSession and serves one or more synth trees (a
store shard, started with ``python -m treemachine_spark.cli serve``); this
thin stdlib router forwards each request to its tree's worker pool
round-robin. The router adds no Spark and no state beyond a counter; hot
trees get replicated workers (a pool of >1), and the reference's
one-embedded-DB-per-process model (MainRunner.java) maps onto workers
one-to-one.

Routing key: an optional ``synth_id`` in the request body (the same
argument TreeOfLifeService accepts) picks the pool; requests without one go
to the default pool. The body is forwarded verbatim minus the routing key —
workers are single-store servers that don't take ``synth_id``.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import math
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# stdlib-only import (api/server.py's module level is http.server + json;
# shared so scattered stats responses sort exactly like a worker's own)
from treemachine_spark.api.server import group_sort_key

# fan-out routes: the ANN / document corpora shard across workers
# (api/server.ANN_ROUTE / DUP_ROUTE / DUP_TEXT_ROUTE)
ANN_ROUTE = "/v3/similarity/topk"
DUP_ROUTE = "/v3/documents/duplicates"
DUP_TEXT_ROUTE = "/v3/documents/text"
# stats scatter: per-shard streaming sketches merge by STATE, not by
# estimate (api/server.STATS_ROUTE/DISTINCT_ROUTE/PROFILE_ROUTE/STATE_ROUTE)
STATS_ROUTE = "/v3/stats/quantiles"
DISTINCT_ROUTE = "/v3/stats/distinct"
PROFILE_ROUTE = "/v3/stats/profile"
TOPK_ROUTE = "/v3/stats/topk"
STATE_ROUTE = "/v3/stats/state"
# freshness control plane: broadcast to EVERY worker (api/server.
# ADMIN_RELOAD_ROUTE) — a republish lands fleet-wide through one request
ADMIN_RELOAD_ROUTE = "/v3/admin/reload"
# the workers' per-request bound (api/dedup.MAX_REQUEST_DOCS) — kept as a
# literal so the router stays stdlib-only/Spark-free
MAX_REQUEST_DOCS = 256


class ShardRouter:
    """Round-robin forwarder over per-tree worker pools.

    ``pools`` maps synth_id -> list of worker base URLs
    (e.g. ``{"opentree13.4": ["http://127.0.0.1:9001", ...]}``);
    ``default_pool`` serves requests that name no synth_id (typically the
    most recent tree's pool, mirroring TreeRegistry.most_recent)."""

    def __init__(
        self,
        pools: dict[str, list[str]],
        default_pool: list[str],
        ann_shards: list[list[str]] | None = None,
        dedup_shards: list[list[str]] | None = None,
        stats_shards: list[list[str]] | None = None,
    ):
        self.pools = {k: list(v) for k, v in pools.items()}
        self.default_pool = list(default_pool)
        self._rr = {k: itertools.cycle(v) for k, v in self.pools.items()}
        self._rr_default = itertools.cycle(self.default_pool)
        # scatter-gather: each entry is one CORPUS SHARD's replica pool
        # (disjoint corpus slices, identical within a pool) — see
        # scatter_topk / scatter_duplicates
        self.ann_shards = [list(p) for p in (ann_shards or [])]
        self._rr_ann = [itertools.cycle(p) for p in self.ann_shards]
        self.dedup_shards = [list(p) for p in (dedup_shards or [])]
        self._rr_dedup = [itertools.cycle(p) for p in self.dedup_shards]
        # stats scatter: each entry is one STREAM SHARD's replica pool —
        # workers maintaining their own running sketch over a disjoint
        # slice of the ingest stream (see scatter_stats)
        self.stats_shards = [list(p) for p in (stats_shards or [])]
        self._rr_stats = [itertools.cycle(p) for p in self.stats_shards]
        self._lock = threading.Lock()

    def _pool(self, synth_id: str | None) -> tuple[list[str], object] | None:
        if synth_id is None:
            return (self.default_pool, self._rr_default) if self.default_pool else None
        cyc = self._rr.get(synth_id)
        return (self.pools[synth_id], cyc) if cyc is not None else None

    def pick(self, synth_id: str | None) -> str | None:
        with self._lock:
            pool = self._pool(synth_id)
            return next(pool[1]) if pool else None

    def forward(self, path: str, body: dict, timeout: float = 600.0) -> tuple[int, dict]:
        """Round-robin within the pool with REPLICA FAILOVER: a connection
        error or timeout on one worker tries the next replica (each worker
        serves an identical immutable snapshot, so a retry is safe and
        idempotent); 502 only when every replica is down. HTTP error
        responses (4xx/5xx from a LIVE worker) are returned as-is — they
        are the worker's answer, not a routing failure."""
        synth_id = body.pop("synth_id", None)
        with self._lock:
            pool = self._pool(synth_id)
            if pool is None:
                return 400, {"message": f"unknown synth_id {synth_id!r}"}
            pool_list, cyc = pool
            primary = next(cyc)  # ONE cycle step per request (round-robin)
        i = pool_list.index(primary)
        bases = pool_list[i:] + pool_list[:i]  # failover in wrap-around order
        return self._try_bases(bases, path, body, timeout)

    def broadcast(self, path: str, body: dict, timeout: float = 600.0) -> tuple[int, dict]:
        """Fan one request to EVERY distinct worker across all pools and
        shard sets, concurrently — the freshness control plane
        (/v3/admin/reload lands a republish fleet-wide through one
        request). Unlike forward(), there is no failover: a reload that
        skipped a down worker would leave the fleet serving mixed
        snapshots silently, so the per-worker outcome is reported and the
        overall status is 200 only when every worker answered 200."""
        with self._lock:
            workers: list[str] = []
            for pool in (
                *self.pools.values(),
                self.default_pool,
                *self.ann_shards,
                *self.dedup_shards,
                *self.stats_shards,
            ):
                for url in pool:
                    if url not in workers:
                        workers.append(url)
        if not workers:
            return 400, {"message": "no workers configured on this router"}
        results: list = [None] * len(workers)

        def hit(idx: int) -> None:
            try:
                results[idx] = self._try_bases(
                    [workers[idx]], path, dict(body), timeout
                )
            except Exception as e:
                results[idx] = (502, {"message": f"{type(e).__name__}: {e}"})

        threads = [
            threading.Thread(target=hit, args=(i,)) for i in range(len(workers))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        per_worker = {
            url: {"status": status, **resp}
            for url, (status, resp) in zip(workers, results)
        }
        ok = all(status == 200 for status, _ in results)
        return (200 if ok else 502), {
            "broadcast_ok": ok,
            "workers": per_worker,
        }

    @staticmethod
    def _try_bases(
        bases: list[str], path: str, body: dict, timeout: float
    ) -> tuple[int, dict]:
        last_err = None
        for base in bases:
            req = urllib.request.Request(
                base + path,
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    return r.status, _decode_body(r.status, r.read())
            except urllib.error.HTTPError as e:
                # a LIVE worker's 4xx/5xx is the answer, not a routing
                # failure — but its body may not be JSON (a proxy error
                # page, a half-written response); never let JSONDecodeError
                # escape forward() and kill the handler connection
                return e.code, _decode_body(e.code, e.read())
            except Exception as e:  # worker down / timeout -> try next replica
                last_err = f"worker {base}: {type(e).__name__}: {e}"
        return 502, {"message": f"all replicas failed; last: {last_err}"}

    def scatter_topk(self, body: dict, timeout: float = 600.0) -> tuple[int, dict]:
        """Scatter-gather similarity top-k over DISJOINT corpus shards:
        fan the request out to one replica per shard (same round-robin +
        wrap-around failover as forward), then merge the per-shard
        neighbor lists by (score desc, neighbor_id asc) — the operators'
        own ordering — and re-rank 1..k.

        The merge is EXACT for exact scores: every global top-k member is
        by definition in its own shard's top-k, so merging per-shard
        top-k lists loses nothing (the classic distributed top-k
        argument). For ivf/pq each shard probes its own cells/codebook —
        sharded ANN semantics, recall comparable to the unsharded index.
        Contract 4xxs are identical on every shard and pass through
        verbatim; an UNREACHABLE shard is a 502, never a silently-partial
        answer."""
        if not self.ann_shards:
            return 400, {"message": "no ANN shards configured on this router"}
        err, blobs = self._fan_out(
            self.ann_shards, self._rr_ann, ANN_ROUTE, body, timeout
        )
        if err is not None:
            return err
        k = blobs[0].get("k", body.get("k", 10))

        def merge(lists: list[list[dict]]) -> list[dict]:
            alln = [n for lst in lists for n in lst]
            alln.sort(key=lambda nb: (-nb["score"], nb["neighbor_id"]))
            return [
                {
                    "neighbor_id": nb["neighbor_id"],
                    "score": nb["score"],
                    "rank": i + 1,
                }
                for i, nb in enumerate(alln[:k])
            ]

        merged: dict = {
            "method": blobs[0].get("method"),
            "k": k,
            "shards": len(blobs),
        }
        if "neighbors" in blobs[0]:
            merged["neighbors"] = merge([b.get("neighbors", []) for b in blobs])
        else:
            nq = len(blobs[0].get("results", []))
            merged["results"] = [
                merge([b["results"][i] for b in blobs]) for i in range(nq)
            ]
        return 200, merged

    def scatter_duplicates(
        self, body: dict, timeout: float = 600.0
    ) -> tuple[int, dict]:
        """Scatter-gather duplicate LOOKUP over disjoint document shards.
        The ``texts`` form fans out directly: jaccard(query, doc) involves
        one shard's doc only, so the union of per-shard result lists IS
        the unsharded answer (threshold-filtered, no truncation to
        merge). The ``doc_ids`` probe is shard-LOCAL by construction — a
        naive fan-out would silently miss cross-shard pairs — so the
        router serves it by TEXT INDIRECTION (r8 verdict #5): resolve
        each probe doc's text from its owning shard (one /v3/documents/
        text fan-out), re-issue as a ``texts`` lookup, and strip each
        query's self-match. Same exactness argument as the texts form —
        the lookup's query shingle set is byte-identical to the member
        doc's, so every jaccard value equals the probe's."""
        if not self.dedup_shards:
            return 400, {
                "message": "no dedup shards configured on this router"
            }
        if "doc_ids" in body:
            return self._scatter_doc_ids(body, timeout)
        err, blobs = self._fan_out(
            self.dedup_shards, self._rr_dedup, DUP_ROUTE, body, timeout
        )
        if err is not None:
            return err
        nq = len(blobs[0].get("results", []))
        results = []
        for i in range(nq):
            alln = [d for b in blobs for d in b["results"][i]]
            alln.sort(key=lambda d: (-d["jaccard"], d["doc_id"]))
            results.append(alln)
        return 200, {
            "threshold": blobs[0].get("threshold"),
            "shards": len(blobs),
            "results": results,
        }

    def _scatter_doc_ids(self, body: dict, timeout: float) -> tuple[int, dict]:
        """doc_ids probe over shards via text indirection. Contract-shape
        errors (doc_ids not a list of ints, texts+doc_ids together,
        unknown args, over the per-request bound, bad threshold) are NOT
        re-validated here: the original body fans out to the workers'
        duplicates route instead, whose unanimous 4xx passes through —
        the error message stays byte-identical to the unsharded server's.
        An id no shard knows resolves to an empty partner list, matching
        the unsharded probe's silent-empty semantics for unknown ids; a
        MEMBER with NULL text resolves to '' (its shingle twin — the
        worker's texts_of maps it there), so its jaccards match the
        unsharded probe's (r9 ADVICE)."""
        ids = body.get("doc_ids")
        shape_ok = (
            set(body) <= {"doc_ids", "threshold"}
            and isinstance(ids, list)
            and bool(ids)
            and len(ids) <= MAX_REQUEST_DOCS
            and all(isinstance(i, int) and not isinstance(i, bool) for i in ids)
            and (
                "threshold" not in body
                or (
                    isinstance(body["threshold"], (int, float))
                    and not isinstance(body["threshold"], bool)
                    and 0 < body["threshold"] <= 1
                )
            )
        )
        if not shape_ok:
            # let the workers produce the exact unsharded contract error
            err, _ = self._fan_out(
                self.dedup_shards, self._rr_dedup, DUP_ROUTE, body, timeout
            )
            return err if err is not None else (
                502,
                {"message": "malformed doc_ids probe unexpectedly accepted"},
            )
        uniq = list(dict.fromkeys(ids))
        err, blobs = self._fan_out(
            self.dedup_shards, self._rr_dedup, DUP_TEXT_ROUTE,
            {"doc_ids": uniq}, timeout,
        )
        if err is not None:
            return err
        text_of: dict[int, str] = {}
        for b in blobs:
            for key, t in (b.get("texts") or {}).items():
                if t is not None:
                    text_of.setdefault(int(key), t)
        present = [i for i in uniq if i in text_of]
        threshold = float(body.get("threshold", 0.3))
        by_id: dict[int, list] = {i: [] for i in uniq}
        if present:
            lookup_body = {
                "texts": [text_of[i] for i in present],
                "threshold": threshold,
            }
            status, resp = self.scatter_duplicates(lookup_body, timeout)
            if status != 200:
                return status, resp
            for i, lst in zip(present, resp["results"]):
                # strip the query's own corpus row (the probe excludes
                # self-pairs); exact 1.0 matches under OTHER ids stay
                by_id[i] = [d for d in lst if d["doc_id"] != i]
        return 200, {
            "threshold": threshold,
            "shards": len(self.dedup_shards),
            "results": [list(by_id[i]) for i in ids],
        }

    def scatter_stats(
        self, path: str, body: dict, timeout: float = 600.0
    ) -> tuple[int, dict]:
        """Scatter-gather streaming-sketch stats over STREAM shards —
        workers each maintaining a running sketch over a disjoint slice
        of the ingest stream (the natural shape once one process can't
        ingest the whole stream).

        Per-shard ESTIMATES do not merge: a shard median is not the
        global median and HLL estimates are not additive. The sketch
        STATE merges exactly, so the router fans out ONE
        /v3/stats/state request and merges state with the sketches' own
        laws — bottom-k by sum-counts-per-(group,h,v) then re-take the k
        smallest (functions/sketches.quantile_merge_grouped), HLL by
        register-wise max — then computes estimates with integer-exact
        twins of the worker computation. Scattered /v3/stats/quantiles
        therefore EQUALS a single worker serving the union stream
        bit-for-bit (the whole pipeline is BIGINT: merge, cumulative
        counts, the cum*1e6 >= q_micro*tot threshold). The HLL twin is
        exact on the bias-corrected branch (the 2^-rho harmonic sum is a
        sum of powers of two spanning < 53 bits — order-independent and
        exact — and every other op is one correctly-rounded IEEE op with
        identical operands); only the linear-counting branch's final
        log() may differ from the JVM's by 1 ulp (the CLAUDE.md ln-ulp
        invariant — accepted and documented rather than twinned, since
        register STATE, branch choice, and operands are all exact).

        Contract-shape errors fan the ORIGINAL body to the workers'
        estimate route and pass the unanimous 4xx through verbatim (the
        _scatter_doc_ids no-drift pattern); config skew between shards
        (different col/groups/k/p, or a family configured on only some
        shards) is a 502, never a silently-wrong merge; an EMPTY shard
        contributes the merge identity (valid), but all-empty is the
        workers' own 'no partial sketches' contract 400."""
        if not self.stats_shards:
            return 400, {"message": "no stats shards configured on this router"}
        want_q = path in (STATS_ROUTE, PROFILE_ROUTE)
        want_d = path in (DISTINCT_ROUTE, PROFILE_ROUTE)
        want_t = path == TOPK_ROUTE
        allowed = {"qs"} if want_q else {"k"} if want_t else set()
        qs = body.get("qs", [0.5, 0.9])
        k_arg = body.get("k", 10)
        shape_ok = set(body) <= allowed and (
            not want_q
            or (
                isinstance(qs, list)
                and bool(qs)
                and all(
                    isinstance(q, (int, float)) and 0 < q <= 1 for q in qs
                )
            )
        ) and (
            not want_t
            or (isinstance(k_arg, int) and not isinstance(k_arg, bool) and k_arg >= 1)
        )
        if not shape_ok:
            # let the workers produce the exact unsharded contract error
            err, _ = self._fan_out(
                self.stats_shards, self._rr_stats, path, body, timeout
            )
            return err if err is not None else (
                502,
                {"message": "malformed stats request unexpectedly accepted"},
            )
        # request ONLY the families this estimate needs: a quantiles-only
        # scatter must not force each shard to also fold its HLL/topk
        # state whenever those families' tokens advanced (r10 ADVICE).
        # Built from all three flags independently — no route exclusivity
        # baked in (r11 ADVICE: a future combined route must not silently
        # fetch too little shard state and merge a missing-family answer).
        fams = [
            f
            for f, w in (
                ("quantiles", want_q),
                ("distinct", want_d),
                ("topk", want_t),
            )
            if w
        ]
        err, blobs = self._fan_out(
            self.stats_shards,
            self._rr_stats,
            STATE_ROUTE,
            {"families": fams},
            timeout,
        )
        if err is not None and _is_families_skew(err):
            # version skew, not a client error: a pre-r11 worker rejects
            # the families key with the contract 400 'unknown arguments:
            # [families]' (r11 ADVICE — passed through, it masquerades as
            # the CLIENT's request being malformed). Retry once with the
            # pre-r11 all-three payload; the merge below already reads
            # only the families this estimate wants, so the router-side
            # filter is free.
            err, blobs = self._fan_out(
                self.stats_shards, self._rr_stats, STATE_ROUTE, {}, timeout
            )
        if err is not None:
            return err
        n = len(blobs)
        qblob = dblob = None
        if want_t:
            status, tblob = _merged_topk([b.get("topk") for b in blobs], k_arg)
            if status != 200:
                return status, tblob
            return 200, {**tblob, "shards": n}
        if want_q:
            status, qblob = _merged_quantiles(
                [b.get("quantiles") for b in blobs], qs, path == PROFILE_ROUTE
            )
            if status != 200:
                return status, qblob
        if want_d:
            status, dblob = _merged_distinct(
                [b.get("distinct") for b in blobs], path == PROFILE_ROUTE
            )
            if status != 200:
                return status, dblob
        if path == STATS_ROUTE:
            return 200, {**qblob, "shards": n}
        if path == DISTINCT_ROUTE:
            return 200, {**dblob, "shards": n}
        return 200, {"quantiles": qblob, "distinct": dblob, "shards": n}

    def _fan_out(self, shards, rrs, route, body, timeout):
        """One replica per shard (round-robin + wrap-around failover),
        concurrently. Returns (error_response_or_None, blobs): a 4xx
        passes through verbatim only when EVERY shard answered 4xx
        (contract errors are identical everywhere; a 4xx from SOME shards
        while others answered 200 reflects per-shard config skew, not a
        request error — that is a 502, ADVICE r8); an unreachable shard
        is a 502 — never a silently-partial answer."""
        with self._lock:
            picks = []
            for pool, cyc in zip(shards, rrs):
                primary = next(cyc)
                i = pool.index(primary)
                picks.append(pool[i:] + pool[:i])
        # sentinel: a hit thread that dies before assignment (MemoryError,
        # an encoding failure outside _try_bases' catch) must read as the
        # promised 502, not a TypeError unpacking None (ADVICE r8)
        out: list = [
            (502, {"message": "shard worker thread failed before replying"})
        ] * len(picks)

        def hit(idx: int) -> None:
            try:
                out[idx] = self._try_bases(picks[idx], route, dict(body), timeout)
            except Exception as e:  # a shard fault is a 502, never a crash
                out[idx] = (502, {"message": f"{type(e).__name__}: {e}"})

        threads = [
            threading.Thread(target=hit, args=(i,)) for i in range(len(picks))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if all(400 <= status < 500 for status, _ in out):
            return out[0], None
        for status, resp in out:
            if status != 200:
                detail = resp.get("message", "")
                if 400 <= status < 500:
                    detail = (
                        f"shard answered {status} while others answered 200 "
                        f"(per-shard config skew?): {detail}"
                    )
                return (502, {"message": f"shard failed: {detail}"}), None
        return None, [resp for _, resp in out]


def _is_families_skew(err: tuple[int, dict]) -> bool:
    """True iff a scatter error is a pre-r11 worker rejecting the
    ``families`` state-route key — either passed through verbatim (every
    shard old: unanimous 400) or wrapped by _fan_out's mixed-status 502
    (some shards old). Matching on the exact contract message keeps a
    genuine client 400 (there is no other key the router sends) and every
    other skew 502 untouched."""
    status, resp = err
    return (
        status in (400, 502)
        and "unknown arguments: ['families']" in resp.get("message", "")
    )


def _check_states(states: list, profile: bool) -> tuple[int, dict] | None:
    """Validate one sketch family's per-shard state blobs: configured on
    EVERY shard (absent-everywhere is the workers' 404; absent on only
    some is config skew, a 502 — the _fan_out mixed-status rule) and
    structurally identical (col/groups/k/p — merging sketches of
    different configs would be silently wrong)."""
    present = [s for s in states if s is not None]
    if not present:
        if profile:
            return 404, {
                "message": "profile requires both a stats (quantile) and a "
                "distinct (HLL) sketch configured on every shard"
            }
        return 404, {"message": "no stats sketch configured on this shard set"}
    if len(present) != len(states):
        return 502, {
            "message": "shard failed: sketch configured on only some shards "
            "(per-shard config skew?)"
        }
    configs = {
        (
            s["col"],
            tuple(s["groups"]),
            s.get("k"),
            s.get("p"),
            s.get("depth"),
            s.get("width"),
            s.get("n_candidates"),
        )
        for s in present
    }
    if len(configs) > 1:
        return 502, {
            "message": "shard failed: shards disagree on sketch config "
            f"(col/groups/k/p): {sorted(map(str, configs))}"
        }
    return None


def _merged_quantiles(
    states: list, qs: list, profile: bool
) -> tuple[int, dict]:
    """Merge per-shard bottom-k quantile sketch state and estimate — the
    exact integer twin of functions/sketches.quantile_merge_grouped +
    grouped_quantile_estimates (sum counts per (group, h, v); re-take the
    k (h, v)-smallest per group; per group order by v, cumulate, and take
    the smallest v with cum*1e6 >= q_micro*tot — BIGINT end-to-end, so
    the scattered answer equals the union-stream worker's bit-for-bit)."""
    err = _check_states(states, profile)
    if err is not None:
        return err
    k, col, groups = states[0]["k"], states[0]["col"], states[0]["groups"]
    acc: dict = {}
    for s in states:
        for row in s["rows"]:
            g, h, v, cnt = tuple(row[:-3]), row[-3], row[-2], row[-1]
            acc[(g, h, v)] = acc.get((g, h, v), 0) + cnt
    per_group: dict = {}
    for (g, h, v), cnt in acc.items():
        per_group.setdefault(g, []).append((h, v, cnt))
    if not per_group:
        return 400, {"message": "no partial sketches written yet on any shard"}
    # the q list mirrors the worker: order-preserving dedup, then micro
    # units (duplicate micros collapse, like the worker's groupBy q_micro)
    q_micros = list(
        dict.fromkeys(
            int(round(q * 1_000_000)) for q in dict.fromkeys(qs)
        )
    )
    entries = []
    for g, rows in per_group.items():
        rows.sort()  # (h, v) ascending — the bottom-k re-take order
        byv = sorted((v, cnt) for _, v, cnt in rows[:k])
        tot = sum(cnt for _, cnt in byv)
        for q_micro in q_micros:
            cum = 0
            for v, cnt in byv:
                cum += cnt
                if cum * 1_000_000 >= q_micro * tot:
                    entries.append((g, q_micro, v))
                    break
    entries.sort(key=lambda e: (group_sort_key(e[0]), e[1]))
    return 200, {
        "col": col,
        "groups": groups,
        "quantiles": [
            {
                "group": dict(zip(groups, g)),
                "q": q_micro / 1_000_000,
                "value": v,
            }
            for g, q_micro, v in entries
        ],
    }


def _merged_distinct(states: list, profile: bool) -> tuple[int, dict]:
    """Merge per-shard HLL register state (register-wise max — exact) and
    estimate with the twin of functions/sketches.grouped_hll_estimates.
    The harmonic sum is a sum of powers of two spanning < 53 bits (exact,
    order-independent in BOTH engines); alpha*m*m is the identical Python
    constant the worker ships via F.lit; division/comparison are single
    correctly-rounded IEEE ops — so the branch choice and the
    bias-corrected estimate are bit-identical to the worker's. The
    linear-counting branch's log() is the one op that may differ from
    java.lang.Math.log by 1 ulp (CLAUDE.md ln-ulp invariant; state and
    branch remain exact, only the displayed float's last bit can move)."""
    err = _check_states(states, profile)
    if err is not None:
        return err
    p, col, groups = states[0]["p"], states[0]["col"], states[0]["groups"]
    acc: dict = {}
    for s in states:
        for row in s["rows"]:
            g, bucket, rho = tuple(row[:-2]), row[-2], row[-1]
            if rho > acc.get((g, bucket), -1):
                acc[(g, bucket)] = rho
    per_group: dict = {}
    for (g, bucket), rho in acc.items():
        per_group.setdefault(g, []).append(rho)
    if not per_group:
        return 400, {"message": "no partial sketches written yet on any shard"}
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    counts = []
    for g, rhos in per_group.items():
        inv_part = sum(math.ldexp(1.0, -r) for r in rhos)
        v_zero = float(m - len(rhos))
        e_raw = (alpha * m * m) / (v_zero + inv_part)
        if e_raw <= 2.5 * m and v_zero > 0:
            est = float(m) * math.log(float(m) / v_zero)
        else:
            est = e_raw
        counts.append((g, est))
    counts.sort(key=lambda e: group_sort_key(e[0]))
    return 200, {
        "col": col,
        "groups": groups,
        "counts": [
            {"group": dict(zip(groups, g)), "estimate": est}
            for g, est in counts
        ],
    }


def _h32(s: str) -> int:
    """Pure-stdlib twin of functions/hashing.h32 (first 8 hex chars of
    md5 as an integer — the repo's cross-engine hash; bit-identical to
    the Spark/DuckDB forms and to functions/dedup._h32_py)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _merged_topk(states: list, k: int) -> tuple[int, dict]:
    """Merge per-shard CMS+candidate state and take the global heavy
    hitters — the twin of functions/sketches.cms_topk_from_state over
    the merged state. CMS cells merge by cell-wise SUM (integer —
    EXACT), and every served estimate is min-over-depth of the merged
    cells at the key's h32 positions — so any captured key gets the
    IDENTICAL integer estimate the union-stream worker serves (the one
    family whose scatter is exact end-to-end with no float anywhere).

    EVERY key captured by ANY shard is estimated (the merged candidate
    set is <= C per shard — request-scale), and ranking uses the exact
    global estimate, never the summed candidate counts: a key captured
    on only SOME shards has a partial candidate count (its other shards'
    occurrences were never candidate rows) but its CELL estimate is
    global and exact, so a count-ranked re-take to C could drop a true
    heavy hitter that the estimates rank correctly. Candidate CAPTURE
    remains per-shard (a key must rank top-C in some shard's batch fold)
    — the same per-batch approximation the single-process family
    documents, one level up."""
    err = _check_states(states, False)
    if err is not None:
        return err
    col = states[0]["col"]
    depth, width = states[0]["depth"], states[0]["width"]
    cells: dict = {}
    cand: set = set()
    for s in states:
        for row in s["rows"]:
            d, pos, cnt, key = row
            if key is None:
                cells[(d, pos)] = cells.get((d, pos), 0) + cnt
            else:
                cand.add(key)
    if not cells:
        return 400, {"message": "no partial sketches written yet on any shard"}
    ests = [
        (
            key,
            min(
                cells.get((i, _h32(f"cms{i}|{key}") % width), 0)
                for i in range(depth)
            ),
        )
        for key in cand
    ]
    ests.sort(key=lambda e: (-e[1], e[0]))
    return 200, {
        "col": col,
        "k": k,
        "top": [{"key": key, "est_count": est} for key, est in ests[:k]],
    }


def _decode_body(status: int, raw: bytes) -> dict:
    """Worker response body -> dict, tolerating non-JSON bodies (ADVICE r5:
    json.loads on an arbitrary HTTP body can raise and previously escaped
    forward(), dropping the client connection instead of answering)."""
    try:
        out = json.loads(raw)
        if isinstance(out, dict):
            return out
    except ValueError:
        pass
    return {
        "message": raw.decode(errors="replace")[:2000] or f"HTTP {status}"
    }


def make_router_server(
    router: ShardRouter, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """HTTP front for a ShardRouter (same endpoint surface as the workers)."""

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b""
            try:
                body = json.loads(raw) if raw.strip() else {}
                if not isinstance(body, dict):
                    raise ValueError("body must be a JSON object")
            except ValueError as e:
                status, resp = 400, {"message": f"invalid JSON body: {e}"}
            else:
                if self.path == ADMIN_RELOAD_ROUTE:
                    status, resp = router.broadcast(self.path, body)
                elif self.path == ANN_ROUTE and router.ann_shards:
                    status, resp = router.scatter_topk(body)
                elif self.path == DUP_ROUTE and router.dedup_shards:
                    status, resp = router.scatter_duplicates(body)
                elif (
                    self.path
                    in (STATS_ROUTE, DISTINCT_ROUTE, PROFILE_ROUTE, TOPK_ROUTE)
                    and router.stats_shards
                ):
                    status, resp = router.scatter_stats(self.path, body)
                else:
                    status, resp = router.forward(self.path, body)
            data = json.dumps(resp).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):  # quiet
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.router = router
    return srv
