"""Paired A/B for the r15 candidate-dot auto-tier (VERDICT r14 #4).

Times the v2/v3 gate shapes (lsh_topk / ivf_topk) with the dot product
forced to the codegen fold, forced to the Arrow einsum, and on "auto", in
ONE session with alternating runs — plus a crossover-scale phase (every
corpus vector as a query) where the Arrow tier must engage and win.
Records the tier auto picks so the JSON shows WHICH side auto landed on
at each scale (the bench_skew auto-column pattern).

Usage: python bench_dottier.py [sf_dir] — default /root/testdata/sf0.1.
"""
import json
import statistics
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from treemachine_spark.session import get_spark
    from treemachine_spark.functions import similarity as sim
    from treemachine_spark.io.tables import load_tables

    spark = get_spark("bench-dottier")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    emb = load_tables(spark, sf_dir)["embeddings"]
    emb = emb.repartition(max(par // 4, 4)).cache()
    n = emb.count()
    gate_q = emb.where(F.col("vec_id") < 5)
    # crossover phase: per-shape query sets sized so expected candidate
    # rows/task sit ~3x PAST the 10^4 break-even (comfortably on the Arrow
    # side, not at the knife edge); capped at the corpus — a small corpus
    # may not reach it for the LSH shape (recorded honestly via auto_picks)
    thr = sim.ARROW_DOT_MIN_ROWS_PER_TASK
    need_lsh = min(int(3 * thr * (2 ** 8) * par / n) + 1, n)
    need_ivf = min(int(3 * thr * 8 * par / (n * 2)) + 1, n)
    lsh_q = emb.where(F.col("vec_id") < need_lsh)
    ivf_q = emb.where(F.col("vec_id") < need_ivf)
    n_lshq, n_ivfq = lsh_q.count(), ivf_q.count()

    out = {
        "metric": "dot_tier_ab", "unit": "sec", "sf_dir": sf_dir,
        "n_vectors": n, "n_lsh_big_queries": n_lshq,
        "n_ivf_big_queries": n_ivfq, "timings": {}, "auto_picks": {},
    }

    def timed(fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    shapes = {
        "lsh_gate": lambda impl: sim.lsh_topk(emb, gate_q, k=10, dot_impl=impl),
        "ivf_gate": lambda impl: sim.ivf_topk(emb, gate_q, k=10, dot_impl=impl),
        "lsh_big": lambda impl: sim.lsh_topk(emb, lsh_q, k=10, dot_impl=impl),
        "ivf_big": lambda impl: sim.ivf_topk(emb, ivf_q, k=10, dot_impl=impl),
    }
    picks = {
        "lsh_gate": n * 5 / (2 ** 8) / par,
        "ivf_gate": n * 5 * 2 / 8 / par,
        "lsh_big": n * n_lshq / (2 ** 8) / par,
        "ivf_big": n * n_ivfq * 2 / 8 / par,
    }
    for name, est in picks.items():
        out["auto_picks"][name] = (
            "arrow" if est >= sim.ARROW_DOT_MIN_ROWS_PER_TASK else "fold"
        )

    for name, fn in shapes.items():
        timed(lambda: fn("fold"))  # warm-up (scan + codegen + workers)
        runs: dict = {"fold": [], "arrow": [], "auto": []}
        for _ in range(3):
            for impl in ("fold", "arrow", "auto"):
                runs[impl].append(timed(lambda impl=impl: fn(impl)))
        out["timings"][name] = {
            impl: round(statistics.median(v), 3) for impl, v in runs.items()
        }
        out["timings"][name + "_runs"] = runs
    # auto must land within noise of the faster forced tier at every shape
    ok = True
    for name, med in out["timings"].items():
        if name.endswith("_runs"):
            continue
        faster = min(med["fold"], med["arrow"])
        ok = ok and med["auto"] <= max(1.3 * faster, faster + 0.3)
    out["auto_on_faster_side"] = ok
    print(json.dumps(out))


if __name__ == "__main__":
    main()
