"""Co-bucketed fact⋈fact layout bench (the q3 sf10 remedy, VERDICT r3).

Writes lineitem and orders bucketed+sorted on the order key
(operators/scale.write_bucketed), then times TPC-H-shape q3 over raw
parquet vs over the bucketed tables. The bucketed plan runs the
lineitem⋈orders sort-merge join AND the (o_orderkey, o_orderdate) group-by
with ZERO shuffle Exchange (asserted in tests/test_cobucketed_facts.py) —
the one-time layout write is the amortized cost, which is exactly the
100 TB trade: pay a single ingest-time shuffle so EVERY subsequent
order-keyed join/agg is exchange-free.

Usage: python bench_bucketed.py [sf_dir] [n_buckets]   (default /tmp/sf1 32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from treemachine_spark.io.tables import load_tables
    from treemachine_spark.operators.scale import write_bucketed
    from treemachine_spark.session import get_spark
    from treemachine_spark.workload.queries import q3_plan, q5_plan

    spark = get_spark("bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    out: dict = {"metric": "q3_cobucketed_layout", "unit": "sec", "sf_dir": sf_dir,
                 "n_buckets": n_buckets, "timings": {}}

    # written once under the io/tables._with_bucketed_facts naming
    # convention (<prefix>_lineitem / <prefix>_orders) so the SAME layout
    # also serves the real-gate phase below
    t0 = time.time()
    write_bucketed(t["lineitem"], "bkt_lineitem", "l_orderkey", n_buckets=n_buckets)
    write_bucketed(t["orders"], "bkt_orders", "o_orderkey", n_buckets=n_buckets)
    out["timings"]["layout_write_sec"] = round(time.time() - t0, 2)

    def run(label, plan_fn):
        times = []
        rows = None
        for _ in range(3):
            t0 = time.time()
            rows = plan_fn().collect()
            times.append(round(time.time() - t0, 2))
        out["timings"][label] = times
        return sorted(tuple(r) for r in rows)

    q3 = lambda li, od: q3_plan(li, od, t["customer"])
    q5 = lambda li, od: q5_plan(li, od, t["customer"], t["nation"], t["region"])
    li_b, ord_b = spark.table("bkt_lineitem"), spark.table("bkt_orders")
    base3 = run("q3_parquet_sec", lambda: q3(t["lineitem"], t["orders"]))
    bkt3 = run("q3_bucketed_sec", lambda: q3(li_b, ord_b))
    base5 = run("q5_parquet_sec", lambda: q5(t["lineitem"], t["orders"]))
    bkt5 = run("q5_bucketed_sec", lambda: q5(li_b, ord_b))
    out["rows_equal"] = base3 == bkt3 and base5 == bkt5

    plan = (
        q3_plan(li_b, ord_b, t["customer"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    out["bucketed_plan_shuffle_free"] = (
        "Exchange hashpartitioning" not in plan and "Bucketed: true" in plan
    )

    # REAL-GATE phase (VERDICT r14 #3): the exact QUERIES entries the driver
    # runs, served from the detected layout via TREEMACHINE_BUCKETED_FACTS —
    # proves the measured layout win reaches queries() unchanged.
    import os

    from treemachine_spark.workload.queries import QUERIES

    def run_gate(label, name):
        times, rows = [], None
        for _ in range(3):
            t0 = time.time()
            rows = QUERIES[name](spark, sf_dir).collect()
            times.append(round(time.time() - t0, 2))
        out["timings"][label] = times
        return sorted(tuple(r) for r in rows)

    gate_rows_equal = True
    gate_plans_free = {}
    for name in ("q3_top_orders", "q5_region_revenue"):
        os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
        base = run_gate(f"{name}_parquet_sec", name)
        os.environ["TREEMACHINE_BUCKETED_FACTS"] = "bkt"
        try:
            bkt = run_gate(f"{name}_bucketed_sec", name)
            gplan = (
                QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            os.environ.pop("TREEMACHINE_BUCKETED_FACTS", None)
        gate_rows_equal = gate_rows_equal and base == bkt
        gate_plans_free[name] = (
            "Exchange hashpartitioning" not in gplan and "Bucketed: true" in gplan
        )
    out["gate_rows_equal"] = gate_rows_equal
    out["gate_plans_shuffle_free"] = gate_plans_free

    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
