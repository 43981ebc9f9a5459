"""s7_sessionize_stream at sf10: REAL stream, full-count + sampled-user
value tier (VERDICT r7 #4b).

r7 cap: the GATE wrapper's 120 s run_to_memory await is too small for the
100M-event applyInPandasWithState shuffle (the library itself has no such
bound). This sweep runs the IDENTICAL operator stack — read_event_stream
-> sessionize(open_tail="never") -> run_to_memory — with a sweep-sized
await (3600 s) and 32 state partitions, then verifies two tiers:

1. FULL row count vs the oracle's closed-session count, computed cheaply
   in DuckDB as SUM(new_session) - COUNT(DISTINCT user) (each user's
   first event opens session #1; closed = total - one open tail each).
2. EXACT values for all sessions of ~1/1000 hash-sampled users vs the
   unmodified s7 oracle SQL restricted to those users — valid because
   every oracle window is partitioned by user_id, so a user filter
   commutes with the whole query.

Run: cd /root/repo && python sweeps/sf10_s7_sampled.py | tee /tmp/sweep_s7.log
"""

from __future__ import annotations

from common import SF10, compare_rows, duck_con, get_spark, sampled_col, sampled_sql, stage

import os

K = int(os.environ.get("SWEEP_K", "1009"))  # default ~1/1000 of users

FULL_COUNT_SQL = """
WITH gapped AS (
    SELECT user_id,
           CASE WHEN epoch_us(ts) - COALESCE(
                    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
                > 1800000000 THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT CAST(SUM(new_session) AS BIGINT) - COUNT(DISTINCT user_id) FROM gapped
"""


def main() -> None:
    from pyspark.sql import functions as F

    from treemachine_spark.streaming import events as se
    from treemachine_spark.workload.oracles import ORACLES

    spark = get_spark("sweep-s7")
    spark.sparkContext.setLogLevel("ERROR")

    with stage("spark: REAL sessionize stream at sf10 (await 3600s)"):
        stream = se.read_event_stream(spark, SF10)
        out = se.run_to_memory(
            se.sessionize(stream, open_tail="never"),
            "sweep_s7_sessions",
            shuffle_partitions=32,
            await_seconds=3600,
        ).select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
        )
        out = out.localCheckpoint(eager=True)
        n_spark = out.count()
        print(f"  spark closed sessions: {n_spark}", flush=True)

    con = duck_con()
    with stage("duckdb: full closed-session count"):
        n_oracle = con.sql(FULL_COUNT_SQL).fetchone()[0]
        print(f"  oracle closed sessions: {n_oracle}", flush=True)
    count_ok = n_spark == n_oracle
    print(f"RESULT s7_full_count_sf10 ok={count_ok} spark={n_spark} oracle={n_oracle}", flush=True)

    with stage("spark: sampled-user session rows"):
        srows = out.where(sampled_col(F.col("user_id"), K)).collect()
        print(f"  spark sampled rows: {len(srows)}", flush=True)

    with stage("duckdb: sampled-user oracle"):
        sampled_oracle = ORACLES["s7_sessionize_stream"].replace(
            "FROM events",
            f"FROM events WHERE {sampled_sql('CAST(user_id AS VARCHAR)', K)}",
            1,
        )
        rel = con.sql(sampled_oracle)
        dcols = list(rel.columns)
        drows = rel.fetchall()
        print(f"  oracle sampled rows: {len(drows)}", flush=True)

    ok, msg = compare_rows(
        srows,
        drows,
        ["user_id", "session_start", "session_end", "n_events", "total_value"],
        dcols,
    )
    print(f"RESULT s7_sampled_sf10 ok={ok} {msg}", flush=True)
    if not (ok and count_ok):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
