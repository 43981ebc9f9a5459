"""Scale-out utilities: skew-aware joins/aggregations and bucketed table
layout — the physical techniques the 100 TB deployment relies on beyond
what AQE does automatically.

The reference has no notion of any of this (single-threaded embedded DB);
these are engine-level additions per the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for heavily skewed keys: local count per
    (key, salt) then merge per key. AQE handles skewed *joins*; skewed
    groupBy on a hot key still funnels one reducer without salting.

    count is algebraic, so the two-phase result is exact.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt_buckets: int = 8
) -> DataFrame:
    """Skew-safe equi-join when the small side can't be broadcast and the
    big side has hot keys: salt the big side, replicate the small side
    across salt values, join on (key, salt). Row-multiset equal to
    big ⋈ small on `key`.
    """
    spark = big.sparkSession
    salts = spark.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, sort: bool = True
) -> None:
    """Persist a table bucketed (and sorted) by its join key so future
    equi-joins between co-bucketed tables skip the shuffle entirely —
    the 100 TB answer to repeated joins on the same key (e.g. the closure
    and edge tables bucketed by node id).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
