"""d5_dup_clusters + d6_purge_list at sf10, SAMPLED-CLUSTER value tier
(VERDICT r7 #4a).

r7 cap: the DuckDB oracle's `reach` recursive CTE enumerates ALL
(node, reachable) pairs over the full near-dup graph — quadratic in
cluster size across every cluster, on top of the spilling shingle join.
The sampled twin expands ONLY the clusters containing ~8 hash-sampled
seed docs, by driver-side BFS: each round asks DuckDB for the exact
jaccard edges (same _SHINGLES_CTE logic, threshold 0.3) incident to the
current frontier — a small-hash-side join streamed over the full explode,
never quadratic. Per-doc shingle counts are materialized once
(sizes_mat). The BFS subgraph then yields, independently of Spark, each
seed's full member set and min-id label.

Spark runs the FULL d5 and d6 gate queries at sf10 (connected components
over the complete pair graph) and restricts the comparison to the sampled
clusters: member sets, labels, and purge rows must match exactly.

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

    with stage("spark: full d5 connected components at sf10"):
        comp = QUERIES["d5_dup_clusters"](spark, SF10).localCheckpoint(eager=True)
        n_comp = comp.count()
        print(f"  spark d5 rows: {n_comp}", flush=True)

    with stage("spark: sampled-cluster membership compare (d5)"):
        seed_rows = comp.where(F.col("node_id").isin(sorted(seeds))).collect()
        spark_seed_label = {r["node_id"]: r["component"] for r in seed_rows}
        # seeds absent from comp are singletons: oracle must agree
        for s in seeds:
            in_oracle = find(s) in seed_labels if s in parent else False
            if (s in spark_seed_label) != in_oracle:
                raise SystemExit(
                    f"FAIL: seed {s} singleton-status mismatch "
                    f"(spark={s in spark_seed_label} oracle={in_oracle})"
                )
        labels = sorted(set(spark_seed_label.values()))
        got = comp.where(F.col("component").isin(labels)).collect()
        spark_clusters: dict[int, set[int]] = {}
        for r in got:
            spark_clusters.setdefault(r["component"], set()).add(r["node_id"])
        ok = spark_clusters == {
            k: v for k, v in oracle_clusters.items() if k in seed_labels
        }
        print(
            f"RESULT d5_sampled_sf10 ok={ok} "
            f"({len(labels)} clusters, {sum(len(v) for v in spark_clusters.values())} members)",
            flush=True,
        )
        if not ok:
            for k in sorted(set(spark_clusters) | seed_labels):
                s_, o_ = spark_clusters.get(k, set()), oracle_clusters.get(k, set())
                if s_ != o_:
                    print(f"  cluster {k}: spark-only={sorted(s_ - o_)[:5]} oracle-only={sorted(o_ - s_)[:5]}")
            raise SystemExit(1)

    with stage("spark: full d6 purge list at sf10, sampled-cluster compare"):
        purge = QUERIES["d6_purge_list"](spark, SF10)
        prow = purge.where(F.col("keeper_doc_id").isin(labels)).collect()
        spark_purge = {(r["purge_doc_id"], r["keeper_doc_id"]) for r in prow}
        oracle_purge = {
            (m, k)
            for k, v in oracle_clusters.items()
            if k in seed_labels
            for m in v
            if m != k
        }
        ok = spark_purge == oracle_purge
        print(f"RESULT d6_sampled_sf10 ok={ok} ({len(oracle_purge)} purge rows)", flush=True)
        if not ok:
            print(f"  spark-only={sorted(spark_purge - oracle_purge)[:5]}")
            print(f"  oracle-only={sorted(oracle_purge - spark_purge)[:5]}")
            raise SystemExit(1)


if __name__ == "__main__":
    main()
