"""DuckDB oracle SQL for every entry in workload/queries.py.

The tree-operator oracles rebuild the same hierarchy with a recursive CTE
(`paths`) and express MRCA / subtree / induced-subtree relationally — an
independent second implementation of the reference semantics
(opentree/GraphExplorer.java) used to cross-check the Spark plans.

Column names, types and rounding are aligned 1:1 with the Spark side.
"""

from __future__ import annotations

# Shared hierarchy + ancestor closure. The driver pre-registers the parquet
# tables as DuckDB views with their plain names.
_GRAPH_CTE = """
WITH RECURSIVE edges_raw(child_id, parent_id) AS (
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
),
-- node-set semantics: colliding ids collapse to one node (matches Spark side)
edges AS (SELECT DISTINCT child_id, parent_id FROM edges_raw),
paths(node_id, ancestor_id, depth) AS (
    SELECT child_id, parent_id, 1 FROM edges
    UNION ALL
    SELECT p.node_id, e.parent_id, p.depth + 1
    FROM paths p JOIN edges e ON p.ancestor_id = e.child_id
),
allnodes(node_id) AS (
    SELECT DISTINCT child_id FROM edges UNION SELECT 'root'
),
mcust AS (
    SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 2
    ORDER BY o_custkey LIMIT 1
),
morders AS (
    SELECT o_orderkey FROM orders WHERE o_custkey = (SELECT o_custkey FROM mcust)
    ORDER BY o_orderkey LIMIT 2
),
mtips(node_id) AS (
    SELECT 'l' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(MIN(l_linenumber) AS VARCHAR)
    FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM morders) GROUP BY l_orderkey
),
itips(node_id) AS (
    SELECT 'l' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(MIN(l_linenumber) AS VARCHAR)
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10)
    GROUP BY l_orderkey
)
"""

ORACLES: dict[str, str] = {}

ORACLES["closure_paths"] = _GRAPH_CTE + """
SELECT node_id, ancestor_id, depth FROM paths
"""

ORACLES["t1_path_to_root"] = _GRAPH_CTE + """
SELECT ancestor_id, depth FROM paths WHERE node_id = 'c0' ORDER BY depth
"""

ORACLES["t2_mrca"] = _GRAPH_CTE + """
, paths_self AS (
    SELECT node_id, ancestor_id, depth FROM paths
    UNION ALL SELECT node_id, node_id, 0 FROM allnodes
),
covering AS (
    SELECT ancestor_id FROM paths_self JOIN mtips USING (node_id)
    GROUP BY ancestor_id
    HAVING COUNT(DISTINCT node_id) = (SELECT COUNT(*) FROM mtips)
),
rdepth AS (
    SELECT node_id, depth AS root_depth FROM paths WHERE ancestor_id = 'root'
    UNION ALL SELECT 'root', 0
)
SELECT c.ancestor_id AS mrca_node_id, r.root_depth AS mrca_depth
FROM covering c JOIN rdepth r ON c.ancestor_id = r.node_id
ORDER BY mrca_depth DESC, mrca_node_id LIMIT 1
"""

ORACLES["t3_mrta"] = _GRAPH_CTE + """
SELECT node_id, ancestor_id AS mrta_node_id, depth FROM (
    SELECT p.node_id, p.ancestor_id, p.depth,
           ROW_NUMBER() OVER (PARTITION BY p.node_id ORDER BY p.depth) AS rn
    FROM paths p JOIN mtips USING (node_id)
    WHERE regexp_matches(p.ancestor_id, '^([rnc][0-9]+|root)$')
) WHERE rn = 1
"""

ORACLES["t4_subtree"] = _GRAPH_CTE + """
SELECT node_id, depth FROM paths WHERE ancestor_id = 'n0' AND depth <= 2
"""

ORACLES["t5_subtree_num_tips"] = _GRAPH_CTE + """
SELECT COUNT(*) AS num_tips FROM (
    SELECT node_id FROM paths WHERE ancestor_id = 'n0'
    EXCEPT SELECT parent_id FROM edges
)
"""

ORACLES["t6_induced_subtree"] = _GRAPH_CTE + """
, ianc AS (
    SELECT p.node_id, p.ancestor_id, p.depth FROM paths p JOIN itips USING (node_id)
),
ikept(kept_id) AS (
    SELECT ancestor_id FROM ianc GROUP BY ancestor_id
    HAVING COUNT(DISTINCT node_id) >= 2
    UNION SELECT node_id FROM itips
),
icand AS (
    SELECT p.node_id, p.ancestor_id,
           ROW_NUMBER() OVER (PARTITION BY p.node_id ORDER BY p.depth) AS rn
    FROM paths p
    JOIN ikept k1 ON p.node_id = k1.kept_id
    JOIN ikept k2 ON p.ancestor_id = k2.kept_id
)
SELECT node_id AS child_id, ancestor_id AS parent_id FROM icand WHERE rn = 1
"""

ORACLES["a1_tip_counts"] = _GRAPH_CTE + """
, leaves(node_id) AS (
    SELECT DISTINCT child_id FROM edges e
    WHERE NOT EXISTS (SELECT 1 FROM edges p WHERE p.parent_id = e.child_id)
)
SELECT ancestor_id, COUNT(*) AS tip_descendants
FROM paths JOIN leaves USING (node_id)
WHERE ancestor_id = 'root' OR regexp_matches(ancestor_id, '^[rn][0-9]+$')
GROUP BY ancestor_id
"""

# T15 oracle computes the reference's LITERAL tip-set-intersection
# semantics (GraphImporter.java:445-479: parent's mrca BitSet vs the
# outgroup union) — the Spark operator uses the tree-comparability
# shortcut instead, so every gate run cross-checks that equivalence.
ORACLES["t15_deepest_exemplified"] = _GRAPH_CTE + """
, pself AS (
    SELECT node_id, ancestor_id, depth FROM paths
    UNION ALL SELECT node_id, node_id, 0 FROM allnodes
),
lv(node_id) AS (
    SELECT DISTINCT child_id FROM edges e
    WHERE NOT EXISTS (SELECT 1 FROM edges p WHERE p.parent_id = e.child_id)
),
matched AS (
    SELECT 'c' || CAST(MIN(c_custkey) AS VARCHAR) AS m, c_nationkey
    FROM customer
    WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
    GROUP BY c_nationkey ORDER BY c_nationkey LIMIT 6
),
cand AS (
    SELECT p.node_id AS m, p.ancestor_id AS cand, p.depth
    FROM pself p JOIN matched ON p.node_id = matched.m
),
xmt AS (  -- each matched node's tip-descendant set (its mrca array)
    SELECT p.ancestor_id AS mj, p.node_id AS tip
    FROM pself p
    JOIN matched ON p.ancestor_id = matched.m
    JOIN lv ON p.node_id = lv.node_id
),
blocked AS (  -- BitSet.intersects(candidate, matched j), request-scale:
    -- cand's tip set intersects m_j's tip set IFF cand is an
    -- ancestor-or-self of one of m_j's tips (xmt tips are leaves), so
    -- walk UP from the matched nodes' request-scale tip sets instead of
    -- materializing every candidate ancestor's full tip set — root's
    -- alone is the corpus' whole leaf count, and the old xct CTE
    -- spilled >70 GB at sf10. Extra non-candidate ancestors in this
    -- relation are inert: ub's NOT EXISTS probes it by cand only.
    SELECT DISTINCT p.ancestor_id AS cand, xmt.mj
    FROM xmt JOIN pself p ON p.node_id = xmt.tip
),
ub AS (
    SELECT c.m, c.cand, c.depth FROM cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM blocked b WHERE b.cand = c.cand AND b.mj <> c.m
    )
),
best AS (
    SELECT m, arg_max(cand, depth) AS remap_id, MAX(depth) AS d
    FROM ub GROUP BY m
)
SELECT matched.m AS node_id,
       COALESCE(best.remap_id, matched.m) AS remap_id,
       CAST(COALESCE(best.d, 0) AS INTEGER) AS remap_depth
FROM matched LEFT JOIN best ON matched.m = best.m
"""

ORACLES["t12_degree_prune"] = _GRAPH_CTE + """
SELECT parent_id AS node_id, COUNT(*) AS n_children
FROM edges GROUP BY parent_id HAVING COUNT(*) >= 5
"""

ORACLES["e1_leaf_set"] = _GRAPH_CTE + """
SELECT node_id FROM (
    SELECT child_id AS node_id FROM edges EXCEPT SELECT parent_id FROM edges
) WHERE regexp_matches(node_id, '^o[0-9]+$')
"""

ORACLES["c2_node_distance"] = _GRAPH_CTE + """
, ps AS (
    SELECT node_id, ancestor_id, depth FROM paths
    UNION ALL SELECT node_id, node_id, 0 FROM allnodes
),
st AS (SELECT node_id, ROW_NUMBER() OVER (ORDER BY node_id) AS rn FROM itips),
prs AS (
    SELECT a.node_id AS a, b.node_id AS b
    FROM st a JOIN st b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
)
SELECT p.a, p.b, CAST(MIN(x.depth + y.depth) AS BIGINT) AS hop_distance
FROM prs p
JOIN ps x ON x.node_id = p.a
JOIN ps y ON y.node_id = p.b AND y.ancestor_id = x.ancestor_id
GROUP BY p.a, p.b
"""

# c1 builds its own two fixed-depth trees (full vs nation-collapsed), so the
# bipartition fingerprints are expressible without the recursive closure:
# each internal node's tip set is one group-by away at every level.
ORACLES["c1_rf_distance"] = """
WITH tiph AS (
    SELECT c_custkey, c_nationkey,
           ('0x' || substr(md5('c' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM customer
),
tot AS (SELECT COUNT(*) AS n FROM customer),
t1n AS (
    SELECT SUM(h) AS tip_hash_sum, COUNT(*) AS n_tips
    FROM tiph GROUP BY c_nationkey
),
t1r AS (
    SELECT SUM(h) AS tip_hash_sum, COUNT(*) AS n_tips
    FROM tiph JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
),
b1 AS (
    SELECT DISTINCT tip_hash_sum, n_tips FROM (
        SELECT * FROM t1n UNION ALL SELECT * FROM t1r
    ) u WHERE n_tips >= 2 AND n_tips < (SELECT n FROM tot)
),
b2 AS (
    SELECT DISTINCT tip_hash_sum, n_tips FROM t1r
    WHERE n_tips >= 2 AND n_tips < (SELECT n FROM tot)
),
st AS (
    SELECT (SELECT COUNT(*) FROM b1) AS n_bip_t1,
           (SELECT COUNT(*) FROM b2) AS n_bip_t2,
           (SELECT COUNT(*) FROM (SELECT * FROM b1 INTERSECT SELECT * FROM b2) q)
               AS n_shared
)
SELECT n_bip_t1, n_bip_t2, n_shared,
       n_bip_t1 + n_bip_t2 - 2 * n_shared AS rf_distance
FROM st
"""

# c3: per-node max weighted distance to a descendant tip. Independent
# recomputation: recursive closure + telescoping pre-order weights
# (height(a) = max tip pre - pre(a)); integer micro-unit weights end-to-end
# (DuckDB SUM(BIGINT) is HUGEINT -> CAST back).
ORACLES["c3_node_heights"] = _GRAPH_CTE + """
, ps AS (
    SELECT node_id, ancestor_id, depth FROM paths
    UNION ALL SELECT node_id, node_id, 0 FROM allnodes
),
node_w AS (
    SELECT node_id,
           ('0x' || substr(md5(node_id), 1, 8))::BIGINT % 900 + 100 AS w
    FROM allnodes WHERE node_id <> 'root'
),
pre AS (
    SELECT p.node_id, CAST(COALESCE(SUM(w.w), 0) AS BIGINT) AS pre
    FROM ps p LEFT JOIN node_w w ON p.ancestor_id = w.node_id
    GROUP BY p.node_id
),
tips AS (
    -- EXCEPT is not allowed as a CTE under WITH RECURSIVE in DuckDB;
    -- anti-join is the same leaf_set semantics (t5's definition)
    SELECT a.node_id FROM allnodes a
    LEFT JOIN (SELECT DISTINCT parent_id FROM edges) pp
           ON a.node_id = pp.parent_id
    WHERE pp.parent_id IS NULL
),
maxtip AS (
    SELECT p.ancestor_id AS node_id, MAX(pr.pre) AS mx
    FROM ps p
    JOIN tips t ON p.node_id = t.node_id
    JOIN pre pr ON p.node_id = pr.node_id
    GROUP BY p.ancestor_id
)
SELECT m.node_id, CAST(m.mx - pr.pre AS BIGINT) AS height_micro
FROM maxtip m JOIN pre pr ON m.node_id = pr.node_id
"""

ORACLES["l4_batch_resolution"] = _GRAPH_CTE + """
SELECT v.lookup_id, (n.node_id IS NOT NULL) AS found
FROM (VALUES ('c0'), ('c1'), ('c2'), ('n0'), ('nope1'), ('nope2')) v(lookup_id)
LEFT JOIN allnodes n ON v.lookup_id = n.node_id
"""

ORACLES["t9_repr_descendants"] = _GRAPH_CTE + """
, named(node_id, name) AS (
    SELECT 'r' || CAST(r_regionkey AS VARCHAR), r_name FROM region
    UNION ALL SELECT 'n' || CAST(n_nationkey AS VARCHAR), n_name FROM nation
    UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), c_name FROM customer
)
SELECT ancestor_id, MIN(name) AS first_name, MAX(name) AS last_name
FROM paths JOIN named USING (node_id)
WHERE regexp_matches(ancestor_id, '^n[0-9]+$')
GROUP BY ancestor_id
"""

ORACLES["e2_intersect"] = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT DISTINCT o_custkey FROM orders
"""

# price sum in DECIMAL (exact, order-independent), cast back to double:
# ROUND(SUM(double)) flips on sum-order 1-ulp noise past ~1e12 (sf10)
ORACLES["a11_rollup"] = """
SELECT r_name, n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
GROUP BY ROLLUP (r_name, n_name)
"""

ORACLES["p4_packed_map_roundtrip"] = """
WITH packed AS (
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS packed
    FROM nation GROUP BY n_regionkey
)
SELECT n_regionkey, packed,
       CAST(len(string_split(packed, ',')) AS INTEGER) AS n_decoded,
       string_split(packed, ',')[1] AS first_decoded
FROM packed
"""

# money sums in DECIMAL (exact, order-independent — the a11 sf10 lesson),
# cast back to double so gate schemas are unchanged
ORACLES["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                      * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q3_top_orders"] = """
SELECT o_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ORACLES["q5_region_revenue"] = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

ORACLES["q4_order_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""

ORACLES["q13_customer_distribution"] = """
SELECT c_count, COUNT(*) AS custdist FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) GROUP BY c_count
"""

ORACLES["q16_supplier_part_types"] = """
SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type, p_size
"""

ORACLES["q18_large_orders"] = """
WITH big AS (
    SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > 150
)
SELECT o_orderkey, c_name, o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["q6_forecast_revenue"] = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

ORACLES["q7_nation_volume"] = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)
            AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

ORACLES["q8_market_share"] = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                      ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
             4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
GROUP BY 1
"""

ORACLES["q10_returned_items"] = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["q14_promo_share"] = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                              ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
             4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""

ORACLES["q15_top_supplier"] = """
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""

ORACLES["q17_small_qty_revenue"] = """
WITH li AS (
    SELECT l.* FROM lineitem l
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
), avg_qty AS (
    SELECT l_partkey AS ap_partkey, 0.2 * AVG(l_quantity) AS qty_limit
    FROM li GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM li JOIN avg_qty ON l_partkey = ap_partkey
WHERE l_quantity < qty_limit
"""

ORACLES["q19_disjunctive_join"] = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["q22_idle_customers"] = """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal,
       COALESCE(n.n, 0) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) n
       ON c_custkey = n.o_custkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
"""

ORACLES["q2_min_supplier"] = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
    SELECT p_partkey, p_name, s_name, s_acctbal,
           MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
    FROM ps
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size = 10
)
SELECT p_partkey, p_name, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM j WHERE s_acctbal = min_bal
"""

ORACLES["q9_product_profit"] = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
"""

ORACLES["q11_important_parts"] = """
WITH per_part AS (
    SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
    FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, ROUND(value, 2) AS part_value
FROM per_part
WHERE value > 1.2 * (SELECT AVG(value) FROM per_part)
"""

ORACLES["q12_ship_lag"] = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 0 THEN 'early'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'ontime'
            ELSE 'late' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

ORACLES["q20_part_suppliers"] = """
WITH heavy AS (
    SELECT DISTINCT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 80
)
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
"""

ORACLES["q21_sole_blame"] = """
WITH l1 AS (
    SELECT l_orderkey, l_suppkey FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM l1 JOIN supplier ON l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
)
GROUP BY s_name
"""

ORACLES["s6_native_sessions"] = """
WITH gapped AS (
    SELECT user_id, ts, value,
           CASE WHEN (epoch_us(ts) - COALESCE(
                    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts),
                    -4102444800000000)) >= 30 * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM gapped
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM sessions GROUP BY user_id, session_no
"""

ORACLES["s2_sessions_batch"] = """
WITH gapped AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch(ts) - COALESCE(
                    LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
                > 30 * 60 THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM gapped
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM sessions GROUP BY user_id, session_no
"""

# s7: the STREAMING sessionizer's output — microsecond gap strictness
# (t - prev > 30min in us, matching the stateful operator's integer
# arithmetic) and CLOSED sessions only: the operator's availableNow run
# emits every session except each user's last (the open tail stays in
# state), so the oracle drops each user's max session_no.
ORACLES["s7_sessionize_stream"] = """
WITH gapped AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - COALESCE(
                    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
                > 1800000000 THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM gapped
),
agg AS (
    SELECT user_id, session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS INTEGER) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(session_no) OVER (PARTITION BY user_id) AS max_no
    FROM sessions GROUP BY user_id, session_no
)
SELECT user_id, session_start, session_end, n_events, total_value
FROM agg WHERE session_no < max_no
"""

ORACLES["j3_asof_join"] = """
WITH clicks AS (
    SELECT user_id, ts,
           arg_max(event_id, event_id) AS event_id,
           arg_max(value, event_id) AS value
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS asof_event_id, c.value AS asof_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

ORACLES["j4_range_join"] = """
SELECT p.event_id AS p_event, c.event_id AS c_event
FROM events p JOIN events c ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND epoch(c.ts) >= epoch(p.ts) - 3600
  AND epoch(c.ts) <= epoch(p.ts)
"""

ORACLES["l1_point_lookup"] = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer WHERE c_name = 'Customer#000000042'
"""

ORACLES["l9_distinct_sorted"] = """
SELECT DISTINCT event_type FROM events ORDER BY event_type
"""

ORACLES["o2_top1_latest"] = """
SELECT event_id, event_type FROM events ORDER BY ts DESC, event_id LIMIT 1
"""

ORACLES["w1_window_topn"] = """
SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
) WHERE rnk <= 2
"""

ORACLES["e4_anti_join"] = """
SELECT o.o_orderkey, (l.l_orderkey IS NOT NULL) AS has_lineitems
FROM orders o
LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l ON o.o_orderkey = l.l_orderkey
"""

ORACLES["p10_id_codec"] = r"""
WITH ids AS (
    SELECT CAST(o_orderkey * 4321 + 9999000 AS BIGINT) AS long_id FROM orders
),
enc AS (
    SELECT long_id,
           CASE WHEN long_id < 10000000 THEN 'ott' || CAST(long_id AS VARCHAR)
                ELSE 'mrcaott' || CAST(long_id % 10000000 AS VARCHAR)
                     || 'ott'
                     || CAST(CAST((long_id - (long_id % 10000000)) / 10000000 AS BIGINT) AS VARCHAR)
           END AS string_id
    FROM ids
)
SELECT long_id, string_id,
       CASE WHEN string_id NOT LIKE 'mrcaott%'
            THEN CAST(regexp_extract(string_id, '^ott(\d+)$', 1) AS BIGINT)
            ELSE CAST(regexp_extract(string_id, '^mrcaott(\d+)ott', 1) AS BIGINT)
                 + CAST(regexp_extract(string_id, 'ott(\d+)$', 1) AS BIGINT) * 10000000
       END AS decoded_id
FROM enc
"""

ORACLES["p3_props_decode"] = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
"""

from treemachine_spark.workload.pipeline_oracles import PIPELINE_ORACLES  # noqa: E402

ORACLES.update(PIPELINE_ORACLES)
