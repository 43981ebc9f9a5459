"""c3_node_heights at sf10, SAMPLED-KEY value tier (VERDICT r7 #4a).

r7 cap: the full oracle computes pre-order weights and max-tip heights
for ALL ~62M nodes over the 293M-row closure — the group-bys beyond the
(already-materialized) recursive closure blow the DuckDB budget. The
sampled twin materializes the closure once (the r7 recipe) and then
computes heights ONLY for ~150 hash-sampled nodes: ancestor-weight sums
are evaluated just for the sampled nodes and the tips under them, with
the oracle's exact integer micro-unit algebra (w = md5-hash % 900 + 100,
pre telescoping, height = max tip pre - own pre; workload/oracles.py c3).

The sample draws from the customer/order/lineitem strata (depth >= 2) —
the region/nation/root stratum is 31 nodes whose subtrees are the whole
corpus (tips-under explodes to ~60M rows for zero extra coverage); those
31 are value-verified at sf0.001/0.01/0.1 by the standing gates.

Spark runs the FULL c3 gate query (proven at sf10 in r6) and filters its
output to the sampled nodes; values compare exactly.

Run: cd /root/repo && python sweeps/sf10_c3_sampled.py | tee /tmp/sweep_c3.log
"""

from __future__ import annotations

from common import SF10, compare_rows, duck_con, get_spark, h32_sql, sampled_sql, stage

import os

K = int(os.environ.get("SWEEP_K", "399989"))  # default ~155 of ~62M c/o/l nodes

EDGES_SQL = """
CREATE TABLE edges_mat AS
WITH edges_raw(child_id, parent_id) AS (
    SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'root' FROM region
    UNION ALL
    SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
    UNION ALL
    SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'o' || CAST(o_orderkey AS VARCHAR), 'c' || CAST(o_custkey AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'l' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR),
           'o' || CAST(l_orderkey AS VARCHAR) FROM lineitem
)
SELECT DISTINCT child_id, parent_id FROM edges_raw
"""

PATHS_SQL = """
CREATE TABLE paths_mat AS
WITH RECURSIVE paths(node_id, ancestor_id, depth) AS (
    SELECT child_id, parent_id, 1 FROM edges_mat
    UNION ALL
    SELECT p.node_id, e.parent_id, p.depth + 1
    FROM paths p JOIN edges_mat e ON p.ancestor_id = e.child_id
)
SELECT * FROM paths
"""

# w(ancestor) inlined (node_w excludes root -> 0): identical algebra to the
# full oracle's LEFT JOIN node_w
_W = (
    "CASE WHEN p.ancestor_id = 'root' THEN 0 "
    f"ELSE {h32_sql('p.ancestor_id')} % 900 + 100 END"
)


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.workload.queries import QUERIES

    con = duck_con()

    with stage("duckdb: materialize closure (r7 recipe)"):
        con.execute(EDGES_SQL)
        con.execute(PATHS_SQL)
        con.execute(
            "CREATE TABLE parents_mat AS SELECT DISTINCT parent_id FROM edges_mat"
        )
        n = con.sql("SELECT COUNT(*) FROM paths_mat").fetchone()[0]
        print(f"  paths_mat rows: {n}", flush=True)

    with stage("duckdb: sampled node set"):
        con.execute(
            "CREATE TABLE smp AS "
            "SELECT DISTINCT child_id AS node_id FROM edges_mat "
            "WHERE (child_id LIKE 'c%' OR child_id LIKE 'o%' OR child_id LIKE 'l%') "
            f"AND {sampled_sql('child_id', K)}"
        )
        smp = [r[0] for r in con.sql("SELECT node_id FROM smp ORDER BY node_id").fetchall()]
        print(f"  sampled nodes: {len(smp)}", flush=True)

    with stage("duckdb: sampled heights (tips-under + pre + maxtip)"):
        # tips under sampled nodes, plus sampled nodes that are tips (the
        # full oracle's ps self-rows make a tip its own max)
        con.execute(
            "CREATE TABLE tipsu AS "
            "SELECT DISTINCT p.node_id FROM paths_mat p "
            "JOIN smp s ON p.ancestor_id = s.node_id "
            "LEFT JOIN parents_mat pp ON p.node_id = pp.parent_id "
            "WHERE pp.parent_id IS NULL "
            "UNION "
            "SELECT s.node_id FROM smp s "
            "LEFT JOIN parents_mat pp ON s.node_id = pp.parent_id "
            "WHERE pp.parent_id IS NULL"
        )
        con.execute(
            "CREATE TABLE needn AS "
            "SELECT node_id FROM tipsu UNION SELECT node_id FROM smp"
        )
        con.execute(
            "CREATE TABLE pre_n AS "
            "SELECT p.node_id, CAST(SUM(" + _W + ") AS BIGINT) AS pre "
            "FROM (SELECT node_id, ancestor_id FROM paths_mat "
            "      WHERE node_id IN (SELECT node_id FROM needn) "
            "      UNION ALL SELECT node_id, node_id FROM needn) p "
            "GROUP BY p.node_id"
        )
        rel = con.sql(
            "SELECT m.node_id, CAST(m.mx - pr.pre AS BIGINT) AS height_micro "
            "FROM (SELECT ps.ancestor_id AS node_id, MAX(pn.pre) AS mx "
            "      FROM (SELECT ancestor_id, node_id FROM paths_mat "
            "            WHERE ancestor_id IN (SELECT node_id FROM smp) "
            "            UNION ALL SELECT node_id, node_id FROM smp) ps "
            "      JOIN tipsu t ON ps.node_id = t.node_id "
            "      JOIN pre_n pn ON ps.node_id = pn.node_id "
            "      GROUP BY ps.ancestor_id) m "
            "JOIN pre_n pr ON m.node_id = pr.node_id"
        )
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled heights: {len(drows)}", flush=True)

    spark = get_spark("sweep-c3")
    spark.sparkContext.setLogLevel("ERROR")

    with stage("spark: full c3 at sf10, filtered to sampled nodes"):
        full = QUERIES["c3_node_heights"](spark, SF10)
        srows = full.where(F.col("node_id").isin(smp)).collect()
        print(f"  spark sampled heights: {len(srows)}", flush=True)

    ok, msg = compare_rows(srows, drows, ["node_id", "height_micro"], dcols)
    print(f"RESULT c3_sampled_sf10 ok={ok} {msg}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
