"""Subprocess body for tests/test_atomic_concurrent.py: a REAL second
writer process (own Python, own JVM, own SparkSession) committing
batches into a shared atomic table — the optimistic-concurrency story
exercised across process boundaries instead of two writer objects in
one JVM (VERDICT r9 task #6).

argv: table_path writer_id barrier_dir n_commits mode
mode "mixed"  — n_commits/2 disjoint-key commits, then overlapping
mode "forever" — commit until killed (the parent SIGKILLs mid-stream)

Prints one JSON line per SUCCESSFUL commit: the parent reconstructs
the expected serializable history from these records.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    path, wid, barrier, n_commits, mode = (
        sys.argv[1],
        int(sys.argv[2]),
        sys.argv[3],
        int(sys.argv[4]),
        sys.argv[5],
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName(f"concurrent-writer-{wid}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable

    t = AtomicParquetTable(spark, path, keys=["k"])
    # file barrier: both writers up before either commits, so the
    # commit races are real
    open(os.path.join(barrier, f"ready-{wid}"), "w").close()
    while not os.path.exists(os.path.join(barrier, "go")):
        time.sleep(0.05)
    i = 0
    while mode == "forever" or i < n_commits:
        if mode == "mixed" and i < n_commits // 2:
            keys = range(wid * 1000, wid * 1000 + 50)  # writer-private
        else:
            keys = range(50)  # contended: both writers hit these
        ts = i * 10 + wid  # globally unique recency
        rows = [(k, float(ts), wid, ts) for k in keys]
        df = spark.createDataFrame(
            rows, "k int, v double, writer int, ts int"
        )
        ver = t.upsert(df, [F.col("ts").desc()], max_commit_retries=50)
        print(
            json.dumps(
                {"wid": wid, "i": i, "ts": ts, "version": ver,
                 "k_lo": min(keys), "k_hi": max(keys)}
            ),
            flush=True,
        )
        i += 1
    spark.stop()


if __name__ == "__main__":
    main()
