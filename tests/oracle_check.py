"""Differential checker used by the tests: runs a Spark query and its DuckDB
oracle on the same parquet tables and compares row count + column names +
order-insensitive values — a local replica of the driver's t2 gate.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

from treemachine_spark.io.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: bool = True):
    """Return (ok, message). Order-insensitive multiset compare on
    name-sorted columns, floats rounded."""
    ocols, orows = run_oracle(oracle_sql, sf_dir)
    srows_raw = spark_df.collect()
    scols = spark_df.columns

    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows_raw) != len(orows):
        return False, f"row count mismatch: spark={len(srows_raw)} oracle={len(orows)}"

    s_order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    o_order = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
    s_ms = Counter(tuple(_norm(r[i]) for i in s_order) for r in srows_raw)
    o_ms = Counter(tuple(_norm(r[i]) for i in o_order) for r in orows)
    if s_ms != o_ms:
        only_s = list((s_ms - o_ms).items())[:3]
        only_o = list((o_ms - s_ms).items())[:3]
        return False, f"value mismatch: spark-only={only_s} oracle-only={only_o}"
    return True, f"ok ({len(orows)} rows)"
