"""Full-surface oracle sweep at a derived scale decade (default /tmp/sf1)
— every queries()/oracle_sql() gate value-compared against DuckDB, with
the r7 materialized-closure recipe: the recursive ancestor closure is
built ONCE as ``paths_mat`` and every tree oracle's recursive CTE member
is substituted with a pass-through (the naive per-gate recomputation
makes each tree gate 2-3x slower and the whole sweep hours instead of
~30 min).

r10 result at /tmp/sf1 (gen_sf1.py, 10x): 49/49 compared gates green in
28.7 min — including closure_paths' full 29,293,105-row value compare —
with v4_cosine_pairs raising its DESIGNED TooManyPairsError guard at 20k
vectors (the all-pairs size gate whose scale twin is v6; the harness
reports it as gated, not failed).

Usage: python sweeps/sf1_full_surface.py [sf_dir] [out_json]
(generate the input first: python gen_sf1.py /tmp/sf1 10)

When ``out_json`` is given (e.g. SWEEP_r12.json at the repo root), the
sweep also lands a bench_ok-style ONE-LINE JSON artifact — gates
compared, green/failed counts, the GATED-BY-DESIGN list, per-gate
seconds, wall — so every round records its derived-decade sweep beside
BENCH_r{N}.json without hand-collation (VERDICT r11 #7).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    import oracle_check as oc
    from treemachine_spark.workload.oracles import _GRAPH_CTE

    paths_block = """paths(node_id, ancestor_id, depth) AS (
    SELECT child_id, parent_id, 1 FROM edges
    UNION ALL
    SELECT p.node_id, e.parent_id, p.depth + 1
    FROM paths p JOIN edges e ON p.ancestor_id = e.child_id
),"""
    paths_fast = """paths(node_id, ancestor_id, depth) AS (
    SELECT node_id, ancestor_id, depth FROM paths_mat
),"""
    assert paths_block in _GRAPH_CTE, "oracles._GRAPH_CTE changed — update the substitution"

    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET max_temp_directory_size='30GB'")
    for name in oc.TABLE_NAMES:
        path = os.path.join(sf, f"{name}.parquet")
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    t0 = time.time()
    con.execute(f"CREATE TABLE paths_mat AS {_GRAPH_CTE} SELECT * FROM paths")
    print(
        "paths_mat rows:",
        con.sql("SELECT count(*) FROM paths_mat").fetchone()[0],
        "in", round(time.time() - t0, 1), "s",
        flush=True,
    )

    def fast_run_oracle(sql, sf_dir):
        rel = con.sql(sql.replace(paths_block, paths_fast))
        return list(rel.columns), [str(t) for t in rel.types], rel.fetchall()

    oc.run_oracle = fast_run_oracle  # compare() resolves it via the module

    qs, os_ = E.queries(), E.oracle_sql()
    fails, gated, rows_only, green = 0, [], [], 0
    failed_gates: list[str] = []
    per_gate_sec: dict[str, float] = {}
    t0 = time.time()
    for name in sorted(qs):
        t1 = time.time()
        try:
            if name in os_:
                ok, msg = oc.compare(qs[name](spark, sf), os_[name], sf)
                if ok:
                    green += 1
                else:
                    fails += 1
                    failed_gates.append(name)
                print(name, ok, msg, round(time.time() - t1, 1), flush=True)
            else:
                rows_only.append(name)
                print(name, "rows-only", qs[name](spark, sf).count(), flush=True)
        except Exception as e:
            em = f"{type(e).__name__}: {e}"
            if "TooManyPairs" in em:
                gated.append(name)
                print(name, "GATED-BY-DESIGN", em[:160], flush=True)
            else:
                fails += 1
                failed_gates.append(name)
                print(name, "ERROR", em[:300], flush=True)
        per_gate_sec[name] = round(time.time() - t1, 1)
        # force a JVM GC so ContextCleaner releases finished gates' shuffle
        # files: local-mode shuffle .data files free only when their
        # dependency objects are collected, and a barely-pressured 48g heap
        # never GCs on its own — the r11 sf10 sweep accumulated 43+ GB of
        # dead shuffle files and filled the disk mid d-family without this
        spark._jvm.System.gc()
    wall = round(time.time() - t0, 1)
    print("FAILS:", fails, "gated:", gated, "elapsed", wall)
    sweep = {
        "metric": "derived_decade_sweep",
        "sf_dir": sf,
        "gates_total": len(qs),
        "compared": len(qs) - len(gated) - len(rows_only),
        "green": green,
        "fails": fails,
        "failed_gates": failed_gates,
        "gated_by_design": gated,
        "rows_only": rows_only,
        "wall_sec": wall,
        "sweep_ok": fails == 0,
        "per_gate_sec": per_gate_sec,
    }
    line = json.dumps(sweep)
    print(line, flush=True)
    if out_json:
        with open(out_json, "w") as fh:
            fh.write(line + "\n")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
