"""ANALYZE TABLE-style column statistics in ONE pass.

Every cost-based decision an engine makes — join order, broadcast
eligibility, partition sizing — starts from per-column statistics. Spark's
own `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` exists but writes
to the metastore; this operator returns the same statistics as a
DataFrame so pipelines can gate on them (schema drift detection, null-rate
alerts, cardinality-based layout choices).

Plan shape: ONE aggregation over one scan computes every column's
(count, nulls, distinct, min, max) simultaneously — the partial-agg
buffers hold a handful of values per column, so the shuffle is a single
row regardless of table size. The per-column rows are then unpivoted
with a literal stack — driver-free. countDistinct over many columns in
one agg is exact here (gate-comparable); at 100 TB swap in
approx_count_distinct (HLL, functions/sketches.py documents the algebra)
without changing the plan shape.

The reference has no statistics at all (Neo4j 1.9 heuristic traversals);
beyond-reference engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_null, n_distinct, min_str, max_str) per
    column — min/max rendered as strings so mixed-type tables unpivot
    into one result. NULL-only columns yield NULL min/max."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = []
    for c in cols:
        stacked.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
