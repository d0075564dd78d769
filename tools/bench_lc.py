#!/usr/bin/env python
"""Distributed-execution bench (VERDICT r7 next-round #1): run a heavy
representative query set under ``local-cluster[N,C,MEM]`` — REAL
executor JVMs on this machine, real serialization, real shuffle
transport, python workers spawned per executor — and record warm
medians beside the single-JVM local[32] numbers from the committed
bench_detail.json. This is the topology that shakes out single-JVM
assumptions (Python DataSource pickling, broadcast over a transport,
Arrow batches crossing process boundaries, the atomic table's
driver-only _jvm calls staying driver-only); the numbers are evidence
of CORRECT distributed execution, not a like-for-like perf gate (4x8
executor cores vs 32 local threads pay real IPC).

Writes BENCH_LC_r{N}.json (env SPARK_GRAFT_ROUND, default 08).

Usage: python tools/bench_lc.py [--sf-dir /root/testdata/sf0.1]
       [--cluster 4,8,8192] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: heavy representatives: every execution surface that changes shape
#: across process boundaries — shuffles/joins/windows, Python
#: DataSource, UDTF, Arrow pandas UDF codecs, iterative checkpointed
#: graph work, the atomic commit protocol, streaming-in-batch
HEAVY = [
    "flagship_code_revenue",
    "agg_pricing_summary",
    "join_fk_chain",
    "win_topk_per_group",
    "events_asof_join",
    "dedup_minhash_lsh",
    "pipeline_near_dedup",
    "dedup_groups_cc_star",
    "sim_ivf_pq_topk",
    "text_lang_id_learned",
    "mm_jpeg_decode_block_stats",
    "corpus_chunks_udtf",
    "source_paged_filter_pushdown",
    "atomic_upsert_read",
    "atomic_merge_read",
    "atomic_index_read",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cluster", default="4,8,8192")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "08")
    out_path = os.path.join(REPO, f"BENCH_LC_r{rnd}.json")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local-cluster[{a.cluster}]")
        .appName("bench-lc")
        .config(
            "spark.executorEnv.PYTHONPATH",
            REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stupp_exclusion_etl_spark.plans import REGISTRY

    # force a distributed job first so executors register; the info
    # list includes the driver entry, so executors = len - 1
    spark.range(1 << 20).repartition(64).count()
    n_exec = len(
        spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    ) - 1
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    t_all = time.time()
    for name in HEAVY:
        try:
            REGISTRY[name].fn(spark, a.sf_dir).count()  # cold, untimed
            samples = []
            rows = None
            for _ in range(a.reps):
                t0 = time.perf_counter()
                rows = REGISTRY[name].fn(spark, a.sf_dir).count()
                samples.append(time.perf_counter() - t0)
            results[name] = {
                "lc_warm": round(statistics.median(samples), 3),
                "rows": rows,
            }
            print(f"ok   {name:38s} {results[name]['lc_warm']:7.2f}s")
        except Exception as e:  # record, keep sweeping
            errors[name] = f"{type(e).__name__}: {e}"[:400]
            print(f"FAIL {name}: {errors[name][:120]}")
    # local[32] warm medians from the committed detail for context
    try:
        with open(os.path.join(REPO, "bench_detail.json")) as fh:
            warm = json.load(fh)["queries_warm"]
        for name, rec in results.items():
            lw = warm.get(name)
            if lw:
                rec["local32_warm"] = lw
                rec["ratio_vs_local32"] = round(rec["lc_warm"] / lw, 2)
    except Exception:
        pass
    payload = {
        "metric": "local_cluster_heavy_warm",
        "master": f"local-cluster[{a.cluster}]",
        "n_executor_infos": n_exec,
        "sf_dir": a.sf_dir,
        "reps": a.reps,
        "total_sec": round(time.time() - t_all, 1),
        "queries": results,
        "errors": errors,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: payload[k] for k in (
        "metric", "master", "n_executor_infos", "total_sec")}))
    print(f"wrote {out_path}")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
