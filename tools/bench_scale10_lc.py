#!/usr/bin/env python
"""sf10 × local-cluster: the two strongest evidence axes combined
(VERDICT r8 next-round task #1).

BENCH_SCALE10 proved sf10 headroom in a single JVM (local[32]);
BENCH_LC proved the full surface under REAL executor processes at
sf0.1. Neither ran big data over real process boundaries — the axis
where serialization and real shuffle transport actually cost. This
tool runs the heavy set at sf1 AND sf10 under
``local-cluster[4,8,MEM]`` (4 executor JVMs × 8 cores), one
(query, heap-tier) per SUBPROCESS:

- subprocess isolation is mandatory at this scale — one executor OOM
  tears down the whole local-cluster app, and we want the sweep to
  survive and report it;
- each child gets its own fresh cluster, so checkpoint blocks and
  broadcast builds never accumulate across queries (the single-JVM
  runs needed explicit System.gc() between queries for this);
- a query that fails at the 8 GiB executor tier is retried once at
  16 GiB and the tier recorded — the per-(query, heap) ladder the
  memory-sizing notes prescribe.

Comparisons recorded per query: sf1→sf10 ratio under local-cluster
(the scale-behavior number, machine-state independent) beside the
committed local[32] ratios from BENCH_SCALE10_r08.json, plus sf10
stage spill bytes and executor peak heap from the UI REST API.
Superlinear flag: ratio_1_to_10 > 10 × slack (same rule as the
single-JVM run).

Writes BENCH_SCALE10_LC_r{N}.json (env SPARK_GRAFT_ROUND, default 09).

Usage:
  python tools/bench_scale10_lc.py                 # full sweep (parent)
  python tools/bench_scale10_lc.py --query NAME --exec-mb 8192  # child
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "pipeline_near_dedup",
    "dedup_groups_cc",
    "dedup_groups_cc_star",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "text_lang_id_learned",
    "join_fk_chain",
    "upsert_keep_latest",
    "atomic_upsert_read",
    "atomic_merge_read",
    "dedup_embedding_cosine",
    "sim_knn_join",
    # r12: the bucketed 1-exchange merge and the persisted-index
    # lifecycle, each a real multi-commit write workload at 15M keys /
    # 200k vectors over real executor JVMs
    "atomic_bucketed_merge",
    "sim_index_incremental",
    # r13: batched index-backed serving (route+join+window over the
    # whole query stripe) and the token-window dup-span removal (the
    # gram shuffle is the 100 TB risk surface — N x token volume)
    "sim_index_batch_topk",
    "text_dup_span_removal",
    # r14: the iterative full-frame trainer (3 groupBy passes over
    # every document — the trajectory family's scale shape) and the
    # learn+apply tokenizer pipeline (one corpus pass to the vocab,
    # then vocab-bounded merge jobs — BPE's corpus-independence claim
    # gets empirical sf10 evidence)
    "ml_kmeans_doc_features",
    "ml_bpe_apply_tokenize",
]

MID = "/tmp/scaled/sf1"
BIG = "/tmp/scaled/sf10"


def _session(exec_mb: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local-cluster[4,8,{exec_mb}]")
        .appName("bench-scale10-lc")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.executorEnv.PYTHONPATH",
            REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark's DEFAULT 10 MB broadcast threshold, NOT the 64 MB the
        # local[32] bench uses: the first sweep of this tool inherited
        # 64 MB and the three atomic/near-dedup queries OOM'd their
        # 8-16 GiB executors deserializing a ~60 MB-serialized
        # 15M-row LongHashedRelation (>1 GiB on-heap) — the textbook
        # reason the threshold must scale with EXECUTOR heap, not
        # driver convenience. Root-caused per VERDICT r8 task #1.
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    data = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ))
    return {st["stageId"]: st for st in data}


def _peak_heap(ui: str, app_id: str) -> int:
    execs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/executors"
    ))
    return max(
        (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
         for e in execs),
        default=0,
    )


def run_child(name: str, exec_mb: int) -> int:
    spark = _session(exec_mb)
    spark.sparkContext.setLogLevel("ERROR")
    from stupp_exclusion_etl_spark.plans import REGISTRY

    spark.range(1 << 20).repartition(64).count()  # executors register
    n_exec = len(
        spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    ) - 1
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    fn = REGISTRY[name].fn
    fn(spark, MID).count()  # cold, untimed
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, MID).count()
        samples.append(time.perf_counter() - t0)
    sf1 = round(statistics.median(samples), 3)

    fn(spark, BIG).count()  # cold, untimed (same shape as the r08 run)
    before = _stages(ui, app_id)
    t0 = time.perf_counter()
    rows = fn(spark, BIG).count()
    sf10 = round(time.perf_counter() - t0, 3)
    after = _stages(ui, app_id)
    new = [st for sid, st in after.items() if sid not in before]
    out = {
        "query": name,
        "exec_mb": exec_mb,
        "n_executors": n_exec,
        "sf1": sf1,
        "sf10": sf10,
        "sf10_rows": rows,
        "sf10_mem_spill_bytes": sum(
            st.get("memoryBytesSpilled", 0) for st in new
        ),
        "sf10_disk_spill_bytes": sum(
            st.get("diskBytesSpilled", 0) for st in new
        ),
        "sf10_shuffle_write_bytes": sum(
            st.get("shuffleWriteBytes", 0) for st in new
        ),
        "peak_executor_jvm_heap_bytes": _peak_heap(ui, app_id),
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query")
    ap.add_argument("--exec-mb", type=int, default=8192)
    ap.add_argument("--slack", type=float, default=1.3)
    a = ap.parse_args()
    if a.query:
        return run_child(a.query, a.exec_mb)

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "09")
    out_path = os.path.join(REPO, f"BENCH_SCALE10_LC_r{rnd}.json")
    # delta sweeps: SPARK_GRAFT_SWEEP_ONLY=a,b re-runs just the named
    # queries (e.g. the round's NEW heavy entries when the rest of the
    # surface is unchanged and the prior round's numbers stand)
    only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY")
    heavy = HEAVY
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in HEAVY]
        if unknown:
            print(f"not in HEAVY: {unknown}")
            return 2
        heavy = names
    try:
        with open(os.path.join(REPO, "BENCH_SCALE10_r08.json")) as fh:
            local32 = json.load(fh)["queries"]
    except Exception:
        local32 = {}

    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    flagged = []
    t_all = time.time()
    for name in heavy:
        rec = None
        for exec_mb in (8192, 16384):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--query", name, "--exec-mb", str(exec_mb)],
                capture_output=True, text=True, timeout=3600,
            )
            for line in p.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    rec = json.loads(line[len("CHILD_RESULT "):])
            if rec is not None:
                break
            errors[f"{name}@{exec_mb}"] = (
                (p.stderr or p.stdout).strip()[-400:]
            )
            print(f"RETRY {name}: failed at {exec_mb} MiB", flush=True)
        if rec is None:
            print(f"FAIL {name}", flush=True)
            continue
        r10 = round(rec["sf10"] / max(rec["sf1"], 0.15), 2)
        rec["ratio_1_to_10"] = r10
        l32 = local32.get(name, {})
        if l32.get("ratio_1_to_10"):
            rec["local32_ratio_1_to_10"] = l32["ratio_1_to_10"]
            rec["ratio_vs_local32_ratio"] = round(
                r10 / l32["ratio_1_to_10"], 2
            )
        if l32.get("sf10"):
            rec["local32_sf10_sec"] = l32["sf10"]
        if r10 > 10 * a.slack:
            flagged.append(name)
        results[name] = rec
        print(
            f"ok   {name:28s} sf1 {rec['sf1']:8.2f}s  sf10 "
            f"{rec['sf10']:8.2f}s  ratio {r10:5.2f}  "
            f"(local32 {l32.get('ratio_1_to_10', '?')})",
            flush=True,
        )
        # partial results survive a later failure
        payload = {
            "metric": "scale_headroom_sf10_local_cluster",
            "master": "local-cluster[4,8,8192] (16384 retry tier)",
            "dirs": {"mid": MID, "big": BIG},
            "slack": a.slack,
            "flagged_superlinear_1_to_10": flagged,
            "total_sec": round(time.time() - t_all, 1),
            "queries": results,
            "errors": errors,
        }
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
