"""Parquet table loading for the driver-provided synthetic tables.

Replaces the reference's Neo4j store layer (opentree/GraphBase.java:60-118,
graph open/close) with immutable columnar snapshots: Spark's vectorized
parquet reader gives predicate pushdown + column pruning for free, which is
the rebuild's substitute for the reference's Lucene exact indexes
(opentree/GraphBase.java:431-448).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANO_TS_COLS = {"ts", "o_orderdate", "l_shipdate"}

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def rebuild_ts_cols(df: DataFrame) -> DataFrame:
    """Make timestamp columns unit-agnostic: the driver owns the testdata and
    its timestamp physical type can change between rounds (TIMESTAMP(NANOS)
    one round, native timestamp[us] the next) — always sniff, never assume.

    Under ``spark.sql.legacy.parquet.nanosAsLong=true`` a TIMESTAMP(NANOS)
    column reads back as BIGINT nanoseconds; rebuild a naive-UTC
    timestamp_ntz so values match DuckDB's read of the same file. Columns
    that already read as timestamp/timestamp_ntz (native micros) pass
    through untouched.
    """
    for field in df.schema.fields:
        if field.name in _NANO_TS_COLS and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table under ``sf_dir`` as a DataFrame.

    Plain ``spark.read.parquet`` — filters/projections applied by callers are
    pushed down into the scan by Catalyst (PushedFilters / ReadSchema), so at
    100 TB a point lookup touches only matching row groups.

    The legacy nanosAsLong conf makes TIMESTAMP(NANOS) testdata readable
    (harmless for native-micros testdata); rebuild_ts_cols then normalizes
    whichever unit actually arrived. Set per-call so it also applies under
    the driver-owned SparkSession.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def _load(name: str) -> DataFrame:
        return rebuild_ts_cols(
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        )

    # footer/schema reads are independent driver-side I/O — run them
    # concurrently (Py4J releases the GIL during JVM calls)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(TABLE_NAMES)) as pool:
        dfs = list(pool.map(_load, TABLE_NAMES))
    return dict(zip(TABLE_NAMES, dfs))
