"""Derive a 10x ("sf1") dataset from the driver's sf0.1 parquet — the
next-scale-decade bench point (VERDICT r2 item 7).

Facts are replicated 10x with coherent key offsets (orderkey / custkey /
suppkey / partkey / event_id / doc_id / vec_id shifted by i*OFFSET so joins
and the hierarchy derivation scale like real TPC-H growth); the fixed dims
(region, nation) are copied once. Document text gets a per-replica suffix
so the dedup operators see 10x distinct documents, not 10 copies.

Usage: python gen_sf1.py [out_dir] [replicas]   (default /tmp/sf1-derived 10;
replicas=100 derives an "sf10" set — keys stay collision-free to 21 replicas
x OFFSET under BIGINT, and base keys are < OFFSET)
Inputs come from the driver's own testdata — nothing synthesized from
scratch; this is a deterministic amplification of sf0.1.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OFFSET = 100_000_000
REPLICAS = 10  # overridable via argv[2]

# key columns shifted per replica, by table (shared domains stay coherent:
# events.user_id joins customer.c_custkey in s4, so both shift together)
SHIFTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-derived"
    global REPLICAS
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    src_dir = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.session import get_spark

    spark = get_spark("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, src_dir)

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    for name in COPY_ONCE:
        tables[name].write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, keys in SHIFTS.items():
        df = tables[name]
        reps = []
        for i in range(REPLICAS):
            r = df
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if name == "documents" and "text" in df.columns and i > 0:
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {out.count()} rows")
    print(f"wrote {out_dir} in {round(time.time() - t0, 1)}s")


if __name__ == "__main__":
    main()
