"""Deterministic sampling / split assignment for training-data pipelines.

At 100 TB you cannot re-toss coins per run: train/val/test membership must be
a pure function of the record key so every job (and every re-run after a
failure) agrees. Standard practice is hash-mod bucketing on the key — a
narrow, shuffle-free projection that Catalyst fuses into the scan, and the
md5-derived ``h32`` makes it bit-identical in the DuckDB oracle.

(The reference has no sampling surface — this is part of the beyond-reference
pipeline family, like dedup/ANN; see COVERAGE.md "Beyond-reference".)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from treemachine_spark.functions.hashing import h32


def hash_bucket(key: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the record key (+ optional salt
    so independent samples of the same table don't correlate)."""
    return h32(F.concat(key.cast("string"), F.lit(salt))) % n_buckets


def hash_sample(df: DataFrame, key_col: str, rate_pct: int, salt: str = "") -> DataFrame:
    """Keep ~rate_pct%% of rows, deterministically by key."""
    return df.where(hash_bucket(F.col(key_col), 100, salt) < rate_pct)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test' by default) from
    cumulative hash-bucket ranges. ``weights`` maps split name -> percent and
    must sum to 100; dict order defines the bucket ranges.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    assert sum(weights.values()) == 100, "split weights must sum to 100"
    b = hash_bucket(F.col(key_col), 100, salt)
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Stratified mixture sampling (beyond-reference): keep ~pct% of each
    group — how a training mixture is rebalanced (e.g. upweight low-resource
    languages by downsampling the head). Deterministic per row via the
    md5-derived hash bucket, so reruns and engines agree exactly.

    Zero shuffle: the rate lookup is a literal CASE expression compiled
    into the scan filter (groups are enum-scale), never a join.
    """
    expr = None
    for g, pct in rates.items():
        cond = F.col(group_col) == g
        expr = F.when(cond, pct) if expr is None else expr.when(cond, pct)
    pct_col = expr.otherwise(default_pct) if expr is not None else F.lit(default_pct)
    return df.where(hash_bucket(F.col(key_col), 100, salt) < pct_col)


def source_quota(
    df: DataFrame,
    per_source: int = 50,
    key_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota sampling (beyond-reference): cap the corpus at
    ``per_source`` documents per source/domain, deterministic smallest-id
    winners — the anti-domination pass a web-scale corpus runs so one crawl
    host can't swamp the mixture.

    One window shuffle keyed on the source; skewed hot domains are exactly
    the rows the quota discards, and rank<=k short-circuits per partition.
    Returns (order_col, key_col, rank_in_source).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("rank_in_source", F.row_number().over(w))
        .where(F.col("rank_in_source") <= per_source)
        .select(order_col, key_col, "rank_in_source")
    )


def mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture weights — the rate-DERIVATION step that
    feeds ``mixture_sample``: ``w_g = n_g^alpha / sum_h n_h^alpha``
    (multilingual-sampling temperature, alpha<1 upweights the tail;
    alpha=1 is proportional, alpha=0 uniform).

    One partial-aggregating groupBy on the enum-scale group column plus a
    broadcast 1-row total — nothing else touches the corpus. alpha=0.5
    compiles to ``sqrt`` (IEEE-exact, so both engines produce identical
    doubles); other alphas use ``pow``, where the last ulp is
    libm-dependent — the gate pins the sqrt case.

    Returns (group_col, n_docs, weight ROUND()ed to 6dp).
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    scaled = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(alpha))
    )
    # the normalizer is a whole-partition window over the ALREADY-AGGREGATED
    # enum-scale counts table — one corpus scan, vs duplicating the scan
    # subtree for a separate total (plan-audited)
    tot = F.sum(scaled).over(Window.partitionBy())
    return counts.select(
        group_col,
        "n_docs",
        F.round(scaled / tot, 6).alias("weight"),
    )
