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
        # Spark-written tables are DIRECTORIES of part files (e.g. the
        # derived sf1 set) — DuckDB needs the glob form for those
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    return cols, types, rel.fetchall()


# normalized type vocabulary for the cross-engine schema check
_DUCK_TYPES = {
    "INTEGER": "int32",
    "BIGINT": "int64",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "HUGEINT": "int128",
    "DECIMAL": "decimal",
}
_SPARK_TYPES = {
    "int": "int32",
    "bigint": "int64",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _norm_duck_type(t: str) -> str:
    return _DUCK_TYPES.get(t.split("(")[0], t.lower())


def _norm_spark_type(t: str) -> str:
    return _SPARK_TYPES.get(t, t.lower())


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
    ocols, otypes, orows = run_oracle(oracle_sql, sf_dir)
    srows_raw = spark_df.collect()
    scols = spark_df.columns

    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"

    stypes = dict(spark_df.dtypes)
    o_by_col = {c.lower(): _norm_duck_type(t) for c, t in zip(ocols, otypes)}
    for c, t in stypes.items():
        st, ot = _norm_spark_type(t), o_by_col[c.lower()]
        if st != ot:
            return False, f"dtype mismatch on {c!r}: spark={st} oracle={ot}"
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
