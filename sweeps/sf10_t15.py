"""t15_deepest_exemplified at sf10 — FULL value tier (r8 gate sign-off).

The t15 result is request-scale (6 rows) at every SF, so the sf10 sweep
compares FULL values. The DuckDB side runs the gate's registered oracle
VERBATIM (the literal tip-set-intersection semantics) with only the r7
closure-materialization substitution: the recursive edges/paths CTEs are
replaced by pass-throughs to edges_mat/paths_mat, so ~20 closure
recomputations become one and nothing else drifts. The Spark side runs
the gate query unchanged (ctx ingest at sf10 included, as in the r7
a1 sweep) — the tree-comparability recipe vs the BitSet semantics,
cross-checked on a 293M-row closure.

Run: cd /root/repo && python sweeps/sf10_t15.py | tee /tmp/sweep_t15.log
"""

from __future__ import annotations

from common import SF10, compare_rows, duck_con, get_spark, stage

from sf10_c3_sampled import EDGES_SQL, PATHS_SQL

_PASSTHRU = """
WITH edges AS (SELECT child_id, parent_id FROM edges_mat),
paths(node_id, ancestor_id, depth) AS (
    SELECT node_id, ancestor_id, depth FROM paths_mat
),
allnodes(node_id) AS (
    SELECT DISTINCT child_id FROM edges_mat UNION SELECT 'root'
)
"""


def main() -> None:
    from treemachine_spark.workload.oracles import _GRAPH_CTE, ORACLES
    from treemachine_spark.workload.queries import QUERIES

    sql = ORACLES["t15_deepest_exemplified"]
    assert sql.startswith(_GRAPH_CTE), "oracle no longer built on _GRAPH_CTE"
    sql = _PASSTHRU + sql[len(_GRAPH_CTE):]

    con = duck_con()
    with stage("duckdb: materialize closure (r7 recipe)"):
        con.execute(EDGES_SQL)
        con.execute(PATHS_SQL)
        n = con.sql("SELECT COUNT(*) FROM paths_mat").fetchone()[0]
        print(f"  paths_mat rows: {n}", flush=True)

    with stage("duckdb: t15 oracle (literal tip-set semantics) at sf10"):
        rel = con.sql(sql)
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle rows: {drows}", flush=True)

    spark = get_spark("sweep-t15")
    spark.sparkContext.setLogLevel("ERROR")
    with stage("spark: t15 gate query at sf10 (incl. ctx ingest)"):
        srows = QUERIES["t15_deepest_exemplified"](spark, SF10).collect()
        print(f"  spark rows: {sorted(tuple(r) for r in srows)}", flush=True)

    ok, msg = compare_rows(
        srows, drows, ["node_id", "remap_id", "remap_depth"], dcols
    )
    print(f"RESULT t15_full_sf10 ok={ok} {msg}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
