"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max-based data skipping.

Parquet scans prune row groups whose column min/max statistics miss the
query predicate. A table sorted on ONE key only skips well for that key;
interleaving the bits of two keys (the Morton curve) makes row groups
contiguous in BOTH dimensions, so 2-D selective queries (key1 range AND
key2 range) skip most of a 100 TB table instead of one dimension's worth.
This is the standard lakehouse OPTIMIZE ZORDER BY recipe expressed as plain
DataFrame ops: compute zvalue, range-partition + sort by it, write.

The z-value is pure integer bit arithmetic (shift/and/or), identical in
Spark and the DuckDB oracle — gate k4 pins it cross-engine. The skipping
win itself is demonstrated in tests/test_layout.py by reading parquet
footer statistics: for a square box query, the z-ordered layout touches
strictly fewer row groups than a linearly sorted one.

The reference engine has no layout control at all (Neo4j heap files);
beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns.

    c1 occupies even bit positions, c2 odd. Disjoint bit positions mean
    the sum of the shifted terms IS the bitwise OR — all JVM-side shift /
    mask arithmetic inside whole-stage codegen, no UDF.
    """
    lo1 = c1.cast("long").bitwiseAND((1 << bits) - 1)
    lo2 = c2.cast("long").bitwiseAND((1 << bits) - 1)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(lo1, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(lo2, i).bitwiseAND(1), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zvalue_sql(e1: str, e2: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zvalue` (same shift/mask arithmetic)."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({e1}) & {mask}) >> {i} & 1) << {2 * i}")
        terms.append(f"((({e2}) & {mask}) >> {i} & 1) << {2 * i + 1}")
    return "CAST((" + " + ".join(f"({t})" for t in terms) + ") AS BIGINT)"


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    path: str,
    bits: int = 16,
    n_files: int = 8,
    small_groups: bool = False,
) -> None:
    """Write ``df`` as parquet clustered along the Morton curve of two keys.

    repartitionByRange on the z-value gives each output file a contiguous
    z-range (a tile of the key plane); sortWithinPartitions orders row
    groups inside each file the same way. At cluster scale this is one
    range-shuffle — the exact cost of a single-column global sort, but the
    resulting min/max stats prune in both dimensions.
    """
    z = zvalue(F.col(cols[0]), F.col(cols[1]), bits).alias("_z")
    w = (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    if small_groups:
        # small parquet.block.size forces many row groups so the skipping
        # demo has granular min/max stats to prune against
        w = w.option("parquet.block.size", 64 * 1024)
    w.parquet(path)


def rowgroups_touched(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(touched, total) parquet row groups whose min/max stats intersect a
    conjunctive box predicate {col: (lo, hi)} — the same footer-statistics
    test a scan's row-group pruning performs, computed via pyarrow for
    layout experiments.
    """
    import pathlib

    import pyarrow.parquet as pq

    touched = total = 0
    files = (
        [pathlib.Path(path)]
        if pathlib.Path(path).is_file()
        else sorted(pathlib.Path(path).glob("*.parquet"))
    )
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in box.items():
                st = md.row_group(g).column(idx[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats -> cannot prune
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            touched += hit
    return touched, total
