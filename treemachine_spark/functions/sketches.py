"""Distributed cardinality / frequency sketches (KMV, HyperLogLog,
Count-Min) as pure column-expression plans.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact per-key top-k need a full
shuffle of every distinct value; the sketches here replace that with
fixed-size, MERGEABLE state so the combine happens map-side and the shuffle
carries kilobytes instead of the key universe. All hash positions derive
from :func:`treemachine_spark.functions.hashing.h32` (md5-based) so Spark
and the DuckDB oracles produce bit-identical sketch contents — the gates
compare the sketch tables themselves (pure integers, no float tolerance).

Design notes per sketch:

- **KMV (k minimum values)**: keep the k smallest distinct 32-bit hash
  values.  ``distinct().orderBy(h).limit(k)`` compiles to TakeOrdered —
  each partition keeps its own top-k and only k rows per partition reach
  the driver-side merge, so the plan is one narrow pass at any scale. The
  estimator (k-1) * 2^32 / h_(k) is integer arithmetic end-to-end, hence
  deterministic cross-engine. Union-mergeable: concat two sketches, re-take
  the k smallest.
- **HyperLogLog**: bucket = h mod 2^p, rho = leading-zero rank of the
  remaining (32-p) bits.  The sketch is ``groupBy(bucket).agg(max(rho))``
  — a partial-aggregating shuffle of at most 2^p rows per partition. The
  float estimator (``hll_estimate``) applies the standard bias-corrected
  formula with the linear-counting small-range branch (Flajolet et al.,
  AofA 2007); accuracy is asserted in pytest against exact counts while
  the cross-engine gate pins the integer sketch.
- **Count-Min**: depth*width counter matrix from d independent h32 seeds;
  point estimate = min over rows. Heavy-hitter top-k joins a candidate key
  set against the sketch (candidates here = distinct keys, request-scale;
  at 100 TB candidates come from a per-partition partial top-k pre-pass,
  which is the same TakeOrdered shape as KMV).

The reference engine has no sketch support (its ``count distinct`` paths
are exact Lucene/Neo4j scans, e.g. opentree/GraphExplorer.java:1008-1032
unique-source accumulation); this family is part of the beyond-reference
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from treemachine_spark.functions.hashing import h32, h32_sql

TWO32 = 4_294_967_296  # 2^32: h32 values are uniform on [0, 2^32)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct h32 values of ``col`` (one column ``h``).

    TakeOrdered plan: per-partition top-k, driver merge of k rows per
    partition — never a global sort.
    """
    return (
        df.where(F.col(col).isNotNull())
        .select(h32(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union-merge two KMV sketches: smallest k of the combined value sets."""
    return a.union(b).distinct().orderBy("h").limit(k)


def kmv_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row (est_distinct, kth_hash, k_used) — all BIGINT, deterministic.

    If fewer than k distinct hashes exist the sketch IS the exact distinct
    set; otherwise est = (k-1) * 2^32 div h_(k) (the classic KMV/bottom-k
    estimator, Bar-Yossef et al. RANDOM'02).
    """
    sk = kmv_sketch(df, col, k)
    return sk.agg(
        F.when(F.count("h") < k, F.count("h"))
        .otherwise(F.expr(f"{(k - 1) * TWO32} div max(h)"))
        .cast("long")
        .alias("est_distinct"),
        F.max("h").cast("long").alias("kth_hash"),
        F.count("h").cast("long").alias("k_used"),
    )


def kmv_sketch_sql(table: str, expr: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_sketch` (used by the oracle gates)."""
    return (
        f"SELECT DISTINCT {h32_sql(expr)} AS h FROM {table} "
        f"WHERE {expr} IS NOT NULL ORDER BY h LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_sketch(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """(bucket, max_rho) registers — integers, bit-identical cross-engine.

    rho is the 1-based position of the leftmost 1-bit in the (32-p)-bit
    word above the bucket bits: (32-p) - floor(log2(w)) computed exactly as
    ``(32-p+1) - length(bin(w))`` to avoid float log edge cases; w == 0
    maps to the maximum rank 32-p+1.
    """
    m = 1 << p
    maxrho = 32 - p + 1
    h = h32(F.col(col).cast("string"))
    bucket = (h % m).cast("int").alias("bucket")
    # h < 2^32 so h/m is exact in double; floor-div it JVM-side
    w = F.floor(h / F.lit(m)).cast("long")
    rho = (
        F.when(w == 0, F.lit(maxrho))
        .otherwise(F.lit(maxrho) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho")
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_sketch_sql(table: str, expr: str, p: int = 12) -> str:
    """DuckDB twin of :func:`hll_sketch`."""
    m = 1 << p
    maxrho = 32 - p + 1
    hs = h32_sql(expr)
    return f"""
WITH hh AS (
    SELECT {hs} AS h FROM {table} WHERE {expr} IS NOT NULL
), reg AS (
    SELECT CAST(h % {m} AS INTEGER) AS bucket,
           CAST(CASE WHEN h // {m} = 0 THEN {maxrho}
                     ELSE {maxrho} - length(bin(h // {m})) END AS INTEGER) AS rho
    FROM hh
)
SELECT bucket, CAST(max(rho) AS INTEGER) AS max_rho FROM reg GROUP BY bucket
"""


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two HLL sketches: register-wise max (the HLL union)."""
    return (
        a.union(b).groupBy("bucket").agg(F.max("max_rho").cast("int").alias("max_rho"))
    )


def hll_estimate(sketch: DataFrame, p: int = 12) -> float:
    """Bias-corrected HLL estimate with the linear-counting branch.

    Driver-side over the 2^p-row sketch (register-scale, not data-scale).
    """
    import math

    m = 1 << p
    rows = sketch.collect()
    regs = {r["bucket"]: r["max_rho"] for r in rows}
    v_zero = m - len(regs)  # registers never touched hold 0
    inv_sum = v_zero * 1.0 + sum(2.0 ** -rho for rho in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e_raw = alpha * m * m / inv_sum
    if e_raw <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return e_raw


def hll_sketch_grouped(
    df: DataFrame, col: str, groups: list[str], p: int = 12
) -> DataFrame:
    """Per-GROUP HyperLogLog register table — the distinct-count analog of
    :func:`quantile_sketch_grouped` (k7): one partial-aggregating shuffle
    carries at most (groups x 2^p) integer rows regardless of input size,
    where exact per-group countDistinct must shuffle every distinct
    (group, value) pair. Registers are integers derived from the md5 hash
    — bit-identical cross-engine, so the GATE compares the sketch itself;
    the float estimate stays a library function
    (:func:`grouped_hll_estimates`).

    The corpus-scale "distinct users per event type / distinct documents
    per language per day" shape. Returns (groups..., bucket, max_rho)."""
    m = 1 << p
    maxrho = 32 - p + 1
    h = h32(F.col(col).cast("string"))
    bucket = (h % m).cast("int").alias("bucket")
    w = F.floor(h / F.lit(m)).cast("long")
    rho = (
        F.when(w == 0, F.lit(maxrho))
        .otherwise(F.lit(maxrho) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho")
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(*groups, bucket, rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_sketch_grouped_sql(
    table: str, expr: str, groups: list[str], p: int = 12
) -> str:
    """DuckDB twin of :func:`hll_sketch_grouped`."""
    m = 1 << p
    maxrho = 32 - p + 1
    hs = h32_sql(expr)
    g = ", ".join(groups)
    return f"""
WITH hh AS (
    SELECT {g}, {hs} AS h FROM {table} WHERE {expr} IS NOT NULL
), reg AS (
    SELECT {g}, CAST(h % {m} AS INTEGER) AS bucket,
           CAST(CASE WHEN h // {m} = 0 THEN {maxrho}
                     ELSE {maxrho} - length(bin(h // {m})) END AS INTEGER) AS rho
    FROM hh
)
SELECT {g}, bucket, CAST(max(rho) AS INTEGER) AS max_rho
FROM reg GROUP BY {g}, bucket
"""


def hll_merge_grouped(
    a: DataFrame, b: DataFrame, groups: list[str]
) -> DataFrame:
    """Merge per-group HLL sketches: register-wise max within each group —
    exact (the HLL union law), so per-day/per-partition sketches roll up
    without touching source rows (the k7/s9 rollup discipline)."""
    return (
        a.unionByName(b)
        .groupBy(*groups, "bucket")
        .agg(F.max("max_rho").cast("int").alias("max_rho"))
    )


def grouped_hll_estimates(
    sketch: DataFrame, groups: list[str], p: int = 12
) -> DataFrame:
    """Distributed bias-corrected estimates from a per-group register
    table, linear-counting branch included — pure agg over the
    register-scale sketch, never the source. Floats (harmonic mean / log)
    — library surface, not gate-compared. Returns (groups..., est)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*groups).agg(
        F.count("*").alias("filled"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("inv_part"),
    )
    v_zero = (F.lit(m) - F.col("filled")).cast("double")
    e_raw = F.lit(alpha * m * m) / (v_zero + F.col("inv_part"))
    est = F.when(
        (e_raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(e_raw)
    return agg.select(*groups, est.alias("est"))


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """(d, pos, cnt) counter matrix; cnt sums are exact longs.

    Only touched cells appear (untouched cells are implicitly 0), so the
    sketch is at most depth*width rows after one partial-agg shuffle.
    """
    poss = F.array(
        *[
            (h32(F.concat(F.lit(f"cms{i}|"), F.col(col).cast("string"))) % width).cast(
                "int"
            )
            for i in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.posexplode(poss).alias("d", "pos"))
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_sketch_sql(table: str, expr: str, depth: int = 4, width: int = 2048) -> str:
    """DuckDB twin of :func:`cms_sketch`."""
    seeds = ", ".join(f"({i})" for i in range(depth))
    pos = h32_sql(f"'cms' || s.i || '|' || {expr}")
    return f"""
SELECT CAST(s.i AS INTEGER) AS d, CAST({pos} % {width} AS INTEGER) AS pos,
       count(*) AS cnt
FROM {table}, (VALUES {seeds}) s(i)
WHERE {expr} IS NOT NULL
GROUP BY 1, 2
"""


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CM sketches over the same (depth,width): cell-wise sum."""
    return a.union(b).groupBy("d", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_topk(
    df: DataFrame,
    col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 2048,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters: top-k keys by Count-Min point estimate.

    Point estimate = min over the d rows of the counter at that key's
    position (Cormode & Muthukrishnan '05). The candidate set is the
    distinct keys (request-scale here; at 100 TB it comes from a
    per-partition partial top-k pre-pass). Ties break on key ascending so
    the result is deterministic.
    """
    if sketch is None:
        sketch = cms_sketch(df, col, depth, width)
    poss = F.array(
        *[
            (
                h32(F.concat(F.lit(f"cms{i}|"), F.col("key").cast("string"))) % width
            ).cast("int")
            for i in range(depth)
        ]
    )
    cand = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).alias("key"))
        .distinct()
        .select("key", F.posexplode(poss).alias("d", "pos"))
    )
    return (
        cand.join(sketch, ["d", "pos"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("key"))
        .limit(k)
    )


def cms_topk_from_state(
    state: DataFrame, k: int, depth: int, width: int
) -> DataFrame:
    """Heavy hitters from a combined CMS+candidate state table (the
    streaming family's fold — streaming/stats.StreamingTopKSketch rows:
    ``key IS NULL`` = CMS cell, ``key IS NOT NULL`` = captured candidate).

    Each captured candidate is point-estimated from the CMS cells (min
    over the depth rows at its positions — Cormode & Muthukrishnan '05,
    the same estimator as :func:`cms_topk`), then the top k are taken
    (est desc, key asc — deterministic). Because CMS cells merge by
    cell-wise sum EXACTLY, a captured key's estimate here equals the
    single-pass ``cms_topk`` estimate over all rows seen, bit-for-bit;
    candidate capture (per-batch top-C) is the family's one
    approximation. Both sides of the join are sketch-scale (<=
    depth*width cells, <= C candidates) — never stream-scale."""
    cells = state.where(F.col("key").isNull()).select("d", "pos", "cnt")
    poss = F.array(
        *[
            (h32(F.concat(F.lit(f"cms{i}|"), F.col("key"))) % width).cast("int")
            for i in range(depth)
        ]
    )
    cand = (
        state.where(F.col("key").isNotNull())
        .select("key")
        .distinct()
        .select("key", F.posexplode(poss).alias("d", "pos"))
    )
    return (
        cand.join(cells, ["d", "pos"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("key"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch
# ---------------------------------------------------------------------------


def quantile_sketch(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """Mergeable quantile sketch: the k distinct values with the smallest
    h32 hash, each carrying its EXACT count — bottom-k (coordinated)
    sampling over the value domain (Cohen & Kaplan, "Summarizing data
    using bottom-k sketches", PODC'07).

    Why this shape instead of KLL/t-digest: KLL's compaction is randomized
    and t-digest's centroids are floats — both break this module's
    cross-engine discipline (gates pin the sketch TABLE as exact
    integers). Bottom-k sampling is deterministic given h32, mergeable,
    and its state is (hash, value, count) BIGINTs.

    Plan: one partial-aggregating shuffle of DISTINCT values (map-side
    combine collapses duplicates first — the same cost class as KMV's
    distinct()) then TakeOrdered(k) on the hash. Never a full-value
    shuffle: exact ``percentile()`` (x8) must move every row's value to
    its group; this moves one row per distinct value and keeps k.

    Merge = union + re-aggregate (``quantile_merge``) for sketches built
    over DISJOINT row sets (counts sum), e.g. per-partition or per-day
    sketches rolling up to a corpus sketch.

    Returns (h, v, cnt): h32 BIGINT, the value as BIGINT, exact count.
    ``col`` must be integer-valued (cast upstream) so the cross-engine
    string hash is unambiguous.
    """
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("long").alias("v"))
        .agg(F.count("*").alias("cnt"))
        .select(h32(F.col("v").cast("string")).alias("h"), "v", "cnt")
        .orderBy("h", "v")
        .limit(k)
    )


def quantile_sketch_sql(table: str, expr: str, k: int = 1024) -> str:
    """DuckDB twin of :func:`quantile_sketch` (integer-exact)."""
    h = h32_sql("CAST(v AS VARCHAR)")
    return f"""
WITH vals AS (
    SELECT CAST({expr} AS BIGINT) AS v, count(*) AS cnt
    FROM {table} WHERE {expr} IS NOT NULL GROUP BY 1
)
SELECT {h} AS h, v, cnt FROM vals ORDER BY h, v LIMIT {k}
"""


def quantile_merge(a: DataFrame, b: DataFrame, k: int = 1024) -> DataFrame:
    """Merge two bottom-k quantile sketches over DISJOINT row sets: same
    value -> counts sum (hash is a function of the value), then re-take
    the k smallest hashes."""
    return (
        a.union(b)
        .groupBy("h", "v")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy("h", "v")
        .limit(k)
    )


def quantile_sketch_grouped(
    df: DataFrame, col: str, groups: list[str], k: int = 1024
) -> DataFrame:
    """Per-GROUP bottom-k quantile sketch — the x4/x8 per-language
    percentile shape at corpus scale. Exact ``percentile()`` must shuffle
    every row's value to its group; this aggregates (group, value) first
    (map-side combine — one surviving row per distinct value per group)
    and then window-ranks the per-group distinct-value table by the h32
    hash, keeping the k smallest per group with their EXACT counts. The
    window's shuffle carries one row per distinct (group, value), not one
    per input row, and the state per group is k integer rows.

    Same determinism discipline as :func:`quantile_sketch`: md5-derived
    hash, (h, v) tie-break, BIGINT state — cross-engine exact.

    Returns (groups..., h, v, cnt)."""
    agg = (
        df.where(F.col(col).isNotNull())
        .groupBy(*groups, F.col(col).cast("long").alias("v"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", h32(F.col("v").cast("string")))
    )
    w = Window.partitionBy(*groups).orderBy("h", "v")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(*groups, "h", "v", "cnt")
    )


def quantile_merge_grouped(
    a: DataFrame, b: DataFrame, groups: list[str], k: int = 1024
) -> DataFrame:
    """Merge two per-group bottom-k sketches over DISJOINT row sets: same
    (group, value) -> counts sum (the hash is a function of the value),
    then re-take the k smallest hashes per group — the same union +
    re-rank law as quantile_merge, per group. This is what makes the
    grouped sketch a corpus-scale aggregate: per-partition / per-day
    sketches roll up without touching source rows."""
    merged = (
        a.unionByName(b)
        .groupBy(*groups, "h", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = Window.partitionBy(*groups).orderBy("h", "v")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(*groups, "h", "v", "cnt")
    )


def grouped_quantile_estimates(
    sketch: DataFrame, groups: list[str], qs: tuple = (0.5, 0.9)
) -> DataFrame:
    """Distributed quantile estimates from a per-group bottom-k sketch:
    for each q, the smallest sampled v whose cumulative sampled count
    reaches q * (group's total sampled count) — the inclusion probability
    cancels in the position (see quantile_estimate). Pure window + agg over
    the k-row-per-group sketch; never touches the source table.

    INTEGER-EXACT thresholding: q is carried as BIGINT micro-units and the
    comparison is cum * 1e6 >= q_micro * tot (both BIGINT), so no float
    boundary can flip a knife-edge group cross-engine. Output
    (groups..., q_micro, est_v) — type-1 (lower-value) quantiles, no
    interpolation.

    ACCURACY (pinned in tests/test_sketches.py): a group with <= k distinct
    values is sampled WHOLE — the sketch is its exact histogram and the
    estimate equals the exact type-1 quantile. Beyond k distinct values
    each distinct value is kept i.i.d.-like with the same inclusion
    probability, so the estimated quantile's RANK error concentrates like a
    Hoeffding ratio bound: |F(est) - q| = O(sqrt(ln(1/d)/k)) of the
    group's total mass with failure prob d, provided no single value holds
    a comparable mass fraction (a heavy value is always sampled-or-not
    whole; its own mass bounds the error instead)."""
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*groups)
    cum = sketch.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "tot", F.sum("cnt").over(w_tot)
    )
    # ALL quantiles in one pass: explode the q list against the k-row
    # sketch instead of one filtered-aggregate branch per q — a per-q
    # union would re-derive the whole sketch subtree INCLUDING the source
    # scan len(qs) times (the x15/x18 duplicated-scan lesson; plan pinned
    # in tests/test_plans.py)
    q_micros = F.array(
        *[F.lit(int(round(q * 1_000_000))).cast("long") for q in qs]
    )
    return (
        cum.select(*groups, "v", "cum", "tot", F.explode(q_micros).alias("q_micro"))
        .where(F.col("cum") * F.lit(1_000_000) >= F.col("q_micro") * F.col("tot"))
        .groupBy(*groups, "q_micro")
        .agg(F.min("v").alias("est_v"))
        .select(*groups, "q_micro", "est_v")
    )


def grouped_quantile_sketch_sql(
    table: str,
    expr: str,
    group_expr: str,
    qs: tuple = (0.5, 0.9),
    k: int = 1024,
    group_alias: str = "g",
) -> str:
    """DuckDB twin of quantile_sketch_grouped + grouped_quantile_estimates
    (integer-exact end-to-end). ``group_alias`` names the output group
    column to match the Spark side (the driver compares by column name)."""
    h = h32_sql("CAST(v AS VARCHAR)")
    selects = " UNION ALL ".join(
        f"""SELECT g AS {group_alias},
                   {int(round(q * 1_000_000))}::BIGINT AS q_micro,
                   min(v) AS est_v
            FROM cum WHERE cum * 1000000 >= {int(round(q * 1_000_000))} * tot
            GROUP BY g"""
        for q in qs
    )
    return f"""
WITH vals AS (
    SELECT {group_expr} AS g, CAST({expr} AS BIGINT) AS v, count(*) AS cnt
    FROM {table} WHERE {expr} IS NOT NULL GROUP BY 1, 2
), hashed AS (
    SELECT g, v, cnt, {h} AS h FROM vals
), sk AS (
    SELECT g, v, cnt FROM (
        SELECT g, v, cnt,
               row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
        FROM hashed
    ) WHERE rn <= {k}
), cum AS (
    SELECT g, v,
           CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS tot
    FROM sk
)
{selects}
"""


def quantile_estimate(sketch: DataFrame, qs: tuple = (0.5, 0.9, 0.99)) -> dict:
    """Quantile estimates from a bottom-k sketch, driver-side over the
    k-row state (register-scale, like hll_estimate).

    Every distinct value is sampled with the same probability p, so the
    sampled histogram is an unbiased 1/p-scaling of the true one and p
    CANCELS in the quantile position: q's estimate is the smallest
    sampled v whose cumulative count reaches q * (total sampled count).
    If the sketch holds fewer than k values it IS the exact histogram and
    the estimates are exact.
    """
    rows = sorted((r["v"], r["cnt"]) for r in sketch.collect())
    total = sum(c for _, c in rows)
    out = {}
    for q in qs:
        target = q * total
        acc = 0
        est = rows[-1][0] if rows else None
        for v, c in rows:
            acc += c
            if acc >= target:
                est = v
                break
        out[q] = est
    return out


def cms_topk_sql(
    table: str, expr: str, k: int = 10, depth: int = 4, width: int = 2048
) -> str:
    """DuckDB twin of :func:`cms_topk`."""
    seeds = ", ".join(f"({i})" for i in range(depth))

    def pos_of(e: str) -> str:
        return h32_sql(f"'cms' || s.i || '|' || {e}") + f" % {width}"

    return f"""
WITH sk AS (
    SELECT s.i AS d, {pos_of(expr)} AS pos, count(*) AS cnt
    FROM {table}, (VALUES {seeds}) s(i)
    WHERE {expr} IS NOT NULL GROUP BY 1, 2
), cand AS (
    SELECT DISTINCT {expr} AS key FROM {table} WHERE {expr} IS NOT NULL
), cpos AS (
    SELECT cand.key, s.i AS d, {pos_of("cand.key")} AS pos
    FROM cand, (VALUES {seeds}) s(i)
)
SELECT cpos.key AS key, min(sk.cnt) AS est_count
FROM cpos JOIN sk ON sk.d = cpos.d AND sk.pos = cpos.pos
GROUP BY cpos.key
ORDER BY est_count DESC, key ASC
LIMIT {k}
"""
