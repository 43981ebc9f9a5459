"""MERGE INTO (upsert) semantics as a declarative full-outer-join plan.

The reference mutates its graph store imperatively (node-at-a-time Neo4j
transactions, e.g. GraphImporter.java ingest batches); a Spark-first
engine expresses the same state transition as one join producing the next
table version:

    matched            -> WHEN MATCHED THEN UPDATE expressions
    source-only        -> WHEN NOT MATCHED THEN INSERT expressions
    target-only        -> row carried over unchanged

One shuffle on the merge key (or none, if both sides are co-bucketed via
operators/scale.write_bucketed); the output overwrites the target
partition-atomically, which is exactly how lakehouse MERGE implementations
execute under the hood. Gate u1_merge_upsert pins the semantics against a
DuckDB FULL OUTER JOIN oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: str,
    when_matched: Mapping[str, Column] | None = None,
    when_not_matched: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` on key column ``on``.

    ``when_matched`` / ``when_not_matched`` map TARGET column names to
    expressions over the joined row; reference the two sides as
    ``F.col("t.x")`` and ``F.col("s.y")``. Unlisted target columns carry
    the target value (matched / target-only) or NULL (inserted rows unless
    given an insert expression). The key column is always
    coalesce(t.key, s.key).

    Returns the next version of the target table with the target's schema.
    """
    when_matched = dict(when_matched or {})
    when_not_matched = dict(when_not_matched or {})
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")
    t_exists = F.col(f"t.{on}").isNotNull()
    s_exists = F.col(f"s.{on}").isNotNull()

    out = []
    for c in target.columns:
        if c == on:
            out.append(F.coalesce(F.col(f"t.{on}"), F.col(f"s.{on}")).alias(on))
            continue
        matched_val = when_matched.get(c, F.col(f"t.{c}"))
        insert_val = when_not_matched.get(c, F.lit(None).cast(target.schema[c].dataType))
        out.append(
            F.when(~t_exists, insert_val)
            .when(~s_exists, F.col(f"t.{c}"))
            .otherwise(matched_val)
            .alias(c)
        )
    return joined.select(*out)


def merge_into_store(
    spark, path: str, source: DataFrame, on: str, **merge_kwargs
) -> None:
    """Physical upsert of a parquet table: read current version, merge,
    write the next version. The read-modify-write is the local stand-in for
    a lakehouse table format's transactional commit; the merge plan itself
    is identical at any scale.
    """
    current = spark.read.parquet(path)
    merged = merge_upsert(current, source, on, **merge_kwargs)
    # materialize before overwrite: the plan reads the files it replaces
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
