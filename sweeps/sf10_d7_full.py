"""d7_jaccard_capped at sf10, FULL-COVERAGE membership tier (VERDICT r12 #2).

d4's exact-pair tier is GATED-BY-DESIGN at sf10 (13.9B candidates — the
max_candidates guard raises naming its scale twins), which is correct; but
its capped twin d7 (max_doc_freq=20, the scale path users actually run) was
only value-verified at the gated decade's 1.35M rows. This sweep graduates
d7 to a full-coverage sign at sf10 on the v7 pattern: BOTH engines compute
the COMPLETE capped-space near-dup pair set (threshold 0.3 over the
df<=20 surviving shingles) and reduce the pair SET to a per-bucket
fingerprint — pair count + an order-insensitive hash-sum over
(doc_a, doc_b) — compared exactly. Every pair's identity contributes; a
single missing/extra pair flips its bucket.

The 4dp-rounded jaccard VALUE stays out of the fingerprint deliberately
(the CLAUDE.md quantize lesson: Spark exact-decimal HALF_UP vs DuckDB
multiply-then-round diverge on knife-edge doubles at scale); pair values
are already exact-compared by the d7 driver gate at sf0.01/sf0.1 and the
sf1 full-surface sweep. Threshold MEMBERSHIP itself is engine-safe: both
sides test the RAW ratio n_inter/(|A|+|B|-n_inter), an exact IEEE
division of the same integers.

Run: cd /root/repo && python sweeps/sf10_d7_full.py | tee /tmp/sweep_d7_full.log
(SWEEP_SF_DIR=/root/testdata/sf0.1 smokes the recipe at the small decade.)
"""

from __future__ import annotations

from common import SF10, compare_rows, duck_con, get_spark, h32_sql, stage

MAX_DOC_FREQ = 20  # the d7 gate's cap — sign the exact gate semantics
THRESHOLD = 0.3
FP_MOD = 1_000_000_007
N_BUCKETS = 64  # fingerprint granularity: doc_a % 64 buckets

# the d7 oracle recipe (workload/pipeline_oracles.py d7_jaccard_capped),
# reduced to the membership fingerprint instead of projecting rounded
# jaccard values. The words+shingles prefix is IMPORTED from the
# canonical oracle module (r13 review: an inlined copy would silently
# keep signing stale shingle semantics if the canonical recipe changes),
# matching the sibling sweeps (sf10_d4_sampled / sf10_d9_capped).
_ORACLE_SUFFIX = """
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {cap})
, exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s))
, sizes AS (SELECT doc_id, COUNT(*) AS n FROM exf GROUP BY doc_id)
, inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM exf x JOIN exf y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
, pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_inter / (sa.n + sb.n - n_inter) >= {thr}
)
SELECT doc_a % {nb} AS bucket,
       COUNT(*) AS n_pairs,
       CAST(SUM(({ha} * 31 + {hb}) % {fp}) AS BIGINT) AS hash_fp
FROM pairs
GROUP BY bucket
ORDER BY bucket
"""


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.functions import dedup
    from treemachine_spark.functions.hashing import h32
    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.workload.pipeline_oracles import _SHINGLES_CTE

    con = duck_con()
    con.execute("SET temp_directory='/tmp/duck_tmp_d7'")

    with stage(
        f"duckdb: FULL capped-space pairs (df<={MAX_DOC_FREQ}, t>={THRESHOLD}) -> fingerprint"
    ):
        rel = con.sql(
            _SHINGLES_CTE + _ORACLE_SUFFIX.format(
                cap=MAX_DOC_FREQ,
                thr=THRESHOLD,
                nb=N_BUCKETS,
                fp=FP_MOD,
                ha=h32_sql("CAST(doc_a AS VARCHAR)"),
                hb=h32_sql("CAST(doc_b AS VARCHAR)"),
            )
        )
        dcols = list(rel.columns)
        drows = rel.fetchall()
        total = sum(r[1] for r in drows)
        print(f"  oracle buckets: {len(drows)}, total pairs: {total}", flush=True)

    spark = get_spark("sweep-d7-full")
    spark.sparkContext.setLogLevel("ERROR")

    with stage("spark: FULL d7 pairs -> identical fingerprint"):
        docs = load_tables(spark, SF10)["documents"]
        pairs = dedup.ngram_jaccard_pairs(
            docs, threshold=THRESHOLD, max_doc_freq=MAX_DOC_FREQ
        )
        srows = (
            pairs.groupBy((F.col("doc_a") % N_BUCKETS).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(
                    (
                        h32(F.col("doc_a").cast("string")) * 31
                        + h32(F.col("doc_b").cast("string"))
                    )
                    % F.lit(FP_MOD)
                ).alias("hash_fp"),
            )
            .orderBy("bucket")
            .collect()
        )
        stotal = sum(r["n_pairs"] for r in srows)
        print(f"  spark buckets: {len(srows)}, total pairs: {stotal}", flush=True)

    ok, msg = compare_rows(srows, drows, ["bucket", "n_pairs", "hash_fp"], dcols)
    print(f"RESULT d7_full_sf10 ok={ok} {msg} (total pairs={total})", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
