"""Deterministic cross-engine hashing primitives.

Everything downstream (minhash, simhash, fingerprints) must produce
IDENTICAL values in Spark and in the DuckDB oracle, so hashes are derived
from md5 hex (stable everywhere) instead of engine-native hash functions
(Spark murmur3 and DuckDB's hash() disagree).

h32(s) = first 8 hex chars of md5(s) as an integer — 32 bits, fits safely
in arithmetic mod MERSENNE31 without 64-bit overflow on either engine.

All expressions are built-in column ops (JVM-side, codegen-friendly); no
Python UDFs anywhere in this pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1

# fixed affine permutation constants for minhash (shared with oracles)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (22_695_477, 7_777_777),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
    (48_271, 399_268_537),
    (16_807, 49_297),
]
BAND_SIZE = 2  # 8 sigs -> 4 bands of 2 (LSH banding)


def h32(col: Column) -> Column:
    """32-bit md5-derived hash (matches DuckDB
    ``('0x' || substr(md5(s),1,8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """The DuckDB-side twin of h32()."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"
