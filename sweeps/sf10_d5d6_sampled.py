"""d5_dup_clusters + d6_purge_list at sf10, SAMPLED-CLUSTER value tier
(VERDICT r7 #4a).

Oracle side (unchanged from the r7 cap diagnosis): the DuckDB `reach`
recursive CTE enumerates ALL (node, reachable) pairs over the full
near-dup graph — quadratic in cluster size, on top of the spilling
shingle join. The sampled twin expands ONLY the clusters containing ~8
hash-sampled seed docs, by driver-side BFS: each round asks DuckDB for
the exact jaccard edges (same _SHINGLES_CTE logic, threshold 0.3)
incident to the current frontier — a small-hash-side join streamed over
the full explode, never quadratic. Per-doc shingle counts are
materialized once (sizes_mat). Union-find over the BFS subgraph yields
each seed's full member set and min-id label.

Spark side (r8 revision): the FULL d5/d6 gate queries are BOX-bound at
sf10 for the same reason d4 is — the batch pair join's ~2.5B
pair-shingle incidences exceed this box's ~90 GB usable spill in both
engines (measured; see sf10_d4_sampled.py). The default Spark tier
therefore runs a MIRRORED BFS with the r8 PRODUCT probe operator
(dedup.ngram_jaccard_probe — the linear request-shape plan, gate d8):
per round, exact-Jaccard edges incident to the frontier; union-find
labels; member sets / labels / purge rows compare exactly against the
DuckDB BFS. This signs the pair-edge semantics AND the cluster/keeper
policy at sf10 with both engines exploring independently.
SWEEP_FULL=1 re-attempts the box-bound full-CC tier.

Run: cd /root/repo && python sweeps/sf10_d5d6_sampled.py | tee /tmp/sweep_d5d6.log
"""

from __future__ import annotations

from common import SF10, duck_con, get_spark, sampled_sql, stage

import os

K_SEED = int(os.environ.get("SWEEP_K", "62497"))  # default ~8 of 500k docs
MAX_ROUNDS = 12
MAX_MEMBERS = 200_000


def edges_touching(con, shingles_cte: str, ids: list[int]):
    idl = ", ".join(str(i) for i in ids)
    sql = shingles_cte + f"""
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, fx AS (SELECT * FROM ex WHERE doc_id IN ({idl}))
, inter1 AS (
    SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS n_inter
    FROM fx x JOIN ex y ON x.s = y.s AND x.doc_id != y.doc_id
    GROUP BY 1, 2
)
, inter AS (
    SELECT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b,
           MAX(n_inter) AS n_inter
    FROM inter1 GROUP BY 1, 2
)
SELECT doc_a, doc_b FROM inter
JOIN sizes_mat sa ON doc_a = sa.doc_id
JOIN sizes_mat sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""
    return [(a, b) for a, b in con.sql(sql).fetchall()]


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.workload.pipeline_oracles import _SHINGLES_CTE
    from treemachine_spark.workload.queries import QUERIES

    con = duck_con()

    with stage("duckdb: seed sample + sizes_mat (one full explode pass)"):
        seeds = [
            r[0]
            for r in con.sql(
                "SELECT doc_id FROM documents WHERE "
                + sampled_sql("CAST(doc_id AS VARCHAR)", K_SEED)
            ).fetchall()
        ]
        print(f"  seeds ({len(seeds)}): {sorted(seeds)}", flush=True)
        if not seeds:
            raise SystemExit(
                "no seeds sampled — lower SWEEP_K for this corpus size"
            )
        con.execute(
            "CREATE TABLE sizes_mat AS "
            + _SHINGLES_CTE
            + ", ex AS (SELECT doc_id, unnest(sh) AS s FROM sh) "
            "SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id"
        )

    with stage("duckdb: BFS cluster expansion from seeds"):
        members = set(seeds)
        frontier = sorted(members)
        edges: set[tuple[int, int]] = set()
        rounds = 0
        while frontier:
            rounds += 1
            if rounds > MAX_ROUNDS:
                raise RuntimeError(f"BFS did not converge in {MAX_ROUNDS} rounds")
            found = edges_touching(con, _SHINGLES_CTE, frontier)
            edges.update(found)
            nbrs = {x for e in found for x in e} - members
            print(
                f"  round {rounds}: frontier={len(frontier)} "
                f"edges+={len(found)} new={len(nbrs)}",
                flush=True,
            )
            members |= nbrs
            if len(members) > MAX_MEMBERS:
                raise RuntimeError(f"cluster expansion exceeded {MAX_MEMBERS}")
            frontier = sorted(nbrs)

    # union-find over the BFS subgraph -> oracle-side cluster labeling
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    oracle_clusters: dict[int, set[int]] = {}
    for m in members:
        oracle_clusters.setdefault(find(m), set()).add(m)
    # singleton seeds (no near-dup) never appear in the pair graph, so the
    # d5/d6 outputs have no row for them — drop from the comparison set
    oracle_clusters = {k: v for k, v in oracle_clusters.items() if len(v) > 1}
    seed_labels = {find(s) for s in seeds if len(oracle_clusters.get(find(s), ())) > 1}
    print(
        f"  oracle: {len(oracle_clusters)} non-singleton cluster(s), "
        f"sizes={sorted(len(v) for v in oracle_clusters.values())}",
        flush=True,
    )

    spark = get_spark("sweep-d5d6")
    spark.sparkContext.setLogLevel("ERROR")

    oracle_seed_clusters = {
        k: v for k, v in oracle_clusters.items() if k in seed_labels
    }
    oracle_purge = {
        (m, k) for k, v in oracle_seed_clusters.items() for m in v if m != k
    }

    if os.environ.get("SWEEP_FULL"):
        with stage("spark: FULL d5 connected components at sf10 (box-bound tier)"):
            comp = QUERIES["d5_dup_clusters"](spark, SF10).localCheckpoint(eager=True)
            print(f"  spark d5 rows: {comp.count()}", flush=True)
        seed_rows = comp.where(F.col("node_id").isin(sorted(seeds))).collect()
        labels = sorted({r["component"] for r in seed_rows})
        got = comp.where(F.col("component").isin(labels)).collect()
        spark_clusters: dict[int, set[int]] = {}
        for r in got:
            spark_clusters.setdefault(r["component"], set()).add(r["node_id"])
        spark_purge = {
            (m, k) for k, v in spark_clusters.items() for m in v if m != k
        }
    else:
        with stage("spark: MIRRORED BFS via ngram_jaccard_probe (linear tier)"):
            from treemachine_spark.functions.dedup import ngram_jaccard_probe
            from treemachine_spark.io.tables import load_tables

            docs = load_tables(spark, SF10)["documents"]
            s_members = set(seeds)
            s_frontier = sorted(s_members)
            s_edges: set[tuple[int, int]] = set()
            s_rounds = 0
            while s_frontier:
                s_rounds += 1
                if s_rounds > MAX_ROUNDS:
                    raise RuntimeError("spark BFS did not converge")
                found = [
                    (r["doc_a"], r["doc_b"])
                    for r in ngram_jaccard_probe(docs, s_frontier).collect()
                ]
                s_edges.update(found)
                nbrs = {x for e in found for x in e} - s_members
                print(
                    f"  spark round {s_rounds}: frontier={len(s_frontier)} "
                    f"edges+={len(found)} new={len(nbrs)}",
                    flush=True,
                )
                s_members |= nbrs
                s_frontier = sorted(nbrs)
        sp = {m: m for m in s_members}

        def sfind(x):
            while sp[x] != x:
                sp[x] = sp[sp[x]]
                x = sp[x]
            return x

        for a, b in s_edges:
            ra, rb = sfind(a), sfind(b)
            if ra != rb:
                sp[max(ra, rb)] = min(ra, rb)
        spark_clusters = {}
        for m in s_members:
            spark_clusters.setdefault(sfind(m), set()).add(m)
        spark_clusters = {
            k: v
            for k, v in spark_clusters.items()
            if len(v) > 1 and any(s in v for s in seeds)
        }
        spark_purge = {
            (m, k) for k, v in spark_clusters.items() for m in v if m != k
        }

    ok5 = spark_clusters == oracle_seed_clusters
    print(
        f"RESULT d5_sampled_sf10 ok={ok5} "
        f"({len(oracle_seed_clusters)} clusters, "
        f"{sum(len(v) for v in oracle_seed_clusters.values())} members)",
        flush=True,
    )
    if not ok5:
        for k in sorted(set(spark_clusters) | set(oracle_seed_clusters)):
            s_, o_ = spark_clusters.get(k, set()), oracle_seed_clusters.get(k, set())
            if s_ != o_:
                print(
                    f"  cluster {k}: spark-only={sorted(s_ - o_)[:5]} "
                    f"oracle-only={sorted(o_ - s_)[:5]}"
                )
    ok6 = spark_purge == oracle_purge
    print(f"RESULT d6_sampled_sf10 ok={ok6} ({len(oracle_purge)} purge rows)", flush=True)
    if not ok6:
        print(f"  spark-only={sorted(spark_purge - oracle_purge)[:5]}")
        print(f"  oracle-only={sorted(oracle_purge - spark_purge)[:5]}")
    if not (ok5 and ok6):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
