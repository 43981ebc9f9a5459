"""spark.sql over the registered catalog matches the DataFrame recipes."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from treemachine_spark.io.catalog import register_views


def test_register_and_sql_join(spark):
    names = register_views(spark, SF_SMOKE, include_graph=False)
    assert "lineitem" in names and "orders" in names
    n = spark.sql(
        """SELECT COUNT(*) AS n FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey"""
    ).collect()[0]["n"]
    assert n == spark.table("orders").count()  # every order has a customer


@pytest.mark.slow
def test_sql_mrca_matches_dataframe_api(spark):
    register_views(spark, SF_SMOKE)
    from treemachine_spark.workload.queries import QUERIES

    api = QUERIES["t2_mrca"](spark, SF_SMOKE).collect()[0]
    from treemachine_spark.workload.queries import get_ctx

    tip_ids = get_ctx(spark, SF_SMOKE)["mrca_tips"]
    in_list = ", ".join(f"'{t}'" for t in tip_ids)
    # pure-SQL MRCA over the served closure view: deepest ancestor covering
    # every tip (same recipe as graph/traversal.mrca, via self-paths union)
    sql = spark.sql(
        f"""
        WITH ps AS (
            SELECT node_id, ancestor_id, depth FROM paths
            UNION ALL
            SELECT node_id, node_id, 0 FROM nodes
        ),
        cov AS (
            SELECT ancestor_id,
                   COUNT(DISTINCT node_id) AS n_cov,
                   MAX(CASE WHEN node_id = '{tip_ids[0]}' THEN depth END) AS d0
            FROM ps WHERE node_id IN ({in_list})
            GROUP BY ancestor_id
        )
        SELECT ancestor_id AS mrca_node_id
        FROM cov WHERE n_cov = {len(set(tip_ids))} AND d0 IS NOT NULL
        ORDER BY d0 ASC LIMIT 1
        """
    ).collect()[0]
    assert sql["mrca_node_id"] == api["mrca_node_id"]


def test_sql_over_graph_views(spark):
    register_views(spark, SF_SMOKE)
    # leaves view == nodes that never appear as parents
    n_sql = spark.sql(
        """SELECT COUNT(*) AS n FROM (
             SELECT child_id FROM edges
             EXCEPT SELECT parent_id FROM edges
           )"""
    ).collect()[0]["n"]
    assert n_sql == spark.table("leaves").count()


@pytest.mark.slow
def test_cli_sql_and_stats(spark, capsys):
    import json

    from treemachine_spark import cli

    assert (
        cli.main(
            [
                "sql",
                SF_SMOKE,
                "SELECT COUNT(*) AS n FROM nation",
                "--no-graph",
            ]
        )
        == 0
    )
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out[-1]["n"] == 25
    assert cli.main(["stats", SF_SMOKE, "region"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    byc = {r["column_name"]: r for r in rows}
    assert byc["r_regionkey"]["n_distinct"] == 5
