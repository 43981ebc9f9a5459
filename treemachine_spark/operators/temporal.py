"""Temporal join operators Spark lacks as built-ins (brief: as-of join,
range join) — composed from existing DataFrame ops, no UDFs.

as-of join: the classic union + last-value-window recipe. Both inputs are
tagged and unioned, sorted within each key by (time, side); a running
``last(ignorenulls=True)`` carries the most recent right-side row forward
onto each left row. One shuffle on the key — no per-row lookups, no range
explosion; this is the 100 TB-safe formulation (vs. an interval cross join).

range join: plain conditional join; Spark executes it as a broadcast
nested-loop or sort-merge with range pruning depending on sizes — at scale,
pre-bucket both sides by coarse time bucket to bound the pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row of the same ``key`` with the
    greatest ``right_ts`` <= ``left_ts`` (NULLs when none exists).

    Right rows must be unique per (key, right_ts) — pre-aggregate ties
    first (see latest_per_ts) so semantics match DuckDB's ASOF JOIN.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            (F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def latest_per_ts(df: DataFrame, key: str, ts: str, order_col: str) -> DataFrame:
    """Collapse ties: keep the row with max ``order_col`` per (key, ts)."""
    w = Window.partitionBy(key, ts).orderBy(F.desc(order_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int = 0,
) -> DataFrame:
    """Interval join: pairs where right_ts ∈ [left_ts - lower, left_ts +
    upper] for the same key.

    Bounds compare at MICROSECOND precision: casting timestamps to long
    truncates to whole seconds, silently admitting pairs up to 0.999 s
    outside the interval — caught by the sf0.1 oracle sweep (372 vs 371
    rows; DuckDB's epoch() keeps the fractional part).
    """
    lo = F.unix_micros(F.col(left_ts).cast("timestamp")) - lower_seconds * 1_000_000
    hi = F.unix_micros(F.col(left_ts).cast("timestamp")) + upper_seconds * 1_000_000
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))
    return left.join(right, on=[key], how="inner").where((rts >= lo) & (rts <= hi))
