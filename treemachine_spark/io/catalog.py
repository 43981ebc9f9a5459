"""SQL catalog: expose the tables AND the engine's derived graph
artifacts as temp views, so the entire surface is queryable with plain
``spark.sql`` — DataFrame recipes and SQL are the same Catalyst plans, so
a user who prefers SQL loses nothing (SURVEY framing: the reference's
users script against REST; here both Python AND SQL are first-class).

The graph views come from the same cached ingest context the DataFrame
queries serve from (workload.queries.get_ctx), so ``SELECT ... FROM
paths`` hits the in-memory closure, not a rebuild.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from treemachine_spark.io.tables import load_tables

GRAPH_VIEWS = ("nodes", "edges", "paths", "leaves", "tip_counts")


def register_views(
    spark: SparkSession, sf_dir: str, include_graph: bool = True
) -> list[str]:
    """Register every base table (and, by default, the derived graph
    artifacts) as temp views. Returns the sorted view names."""
    names = []
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
        names.append(name)
    if include_graph:
        from treemachine_spark.workload.queries import get_ctx

        ctx = get_ctx(spark, sf_dir)
        for name in GRAPH_VIEWS:
            ctx[name].createOrReplaceTempView(name)
            names.append(name)
    return sorted(names)
