#!/usr/bin/env python
"""sf0.1 → sf1 → sf10 memory-headroom run for the heavy queries
(VERDICT r6 directed task #3).

BENCH_SCALE proved per-query linearity at 10× data; this run extends
the evidence two ways the 100 TB claim still needed:

- a second decade (sf1 → sf10, ~1.5 GB input on local[32]) for the
  iterative family, where lineage growth / memory pressure would
  compound;
- spill + peak-memory telemetry per big-tier query (UI REST API:
  per-stage memory/diskBytesSpilled deltas, executor peak JVM heap),
  so "no spill pathology" is measured, not asserted.

Also the first scale run with the r7 COST GUARDS active: at sf1/sf10
`dedup_embedding_cosine` and `sim_knn_join` cross their budgets and
take the bounded LSH paths — their ratios here are the guarded-path
numbers the r6 verdict asked for (the unguarded 93×/54× baselines are
in BENCH_SCALE_r06.json).

Writes BENCH_SCALE10_r{N}.json (env SPARK_GRAFT_ROUND, default 07).

Usage: python tools/bench_scale_deep.py [--small /root/testdata/sf0.1]
       [--mid /tmp/scaled/sf1] [--big /tmp/scaled/sf10]

Run with SPARK_DRIVER_MEMORY=48g: local mode puts driver + all 32
executor threads in ONE heap, so the sf10 tier's shuffles + AQE
broadcast builds need real headroom (the default 8g OOMs mid-run —
an artifact of single-JVM local mode, not of the plans; on a cluster
the broadcast build happens in each executor's own heap).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stupp_exclusion_etl_spark.plans import REGISTRY  # noqa: E402
from stupp_exclusion_etl_spark.session import get_spark  # noqa: E402

# The heavy set: every iterative/checkpointed query, the LSH family,
# the write-path query, and the two (now cost-guarded) exact baselines.
HEAVY = [
    "pipeline_near_dedup",
    "dedup_groups_cc",
    "dedup_groups_cc_star",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "graph_triangle_count",
    "text_lang_id_learned",
    "ml_logreg_lang_filter",
    "atomic_upsert_read",
    "upsert_keep_latest",
    "dedup_embedding_cosine",
    "sim_knn_join",
]


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
        (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0) for e in execs),
        default=0,
    )


def measure(spark, sf_dir: str, reps: int, with_metrics: bool
            ) -> tuple[dict[str, float], dict[str, dict]]:
    REGISTRY["point_lookup"].fn(spark, sf_dir).count()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    out: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    for name in HEAVY:
        # release the previous query's localCheckpoint blocks: the
        # ContextCleaner only frees them after the Python refs are
        # gone, and 36 accumulated checkpoint sets otherwise crowd the
        # shared local-mode heap by the sf10 tier
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        before = _stages(ui, app_id) if with_metrics else {}
        REGISTRY[name].fn(spark, sf_dir).count()  # cold, untimed
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
        if with_metrics:
            after = _stages(ui, app_id)
            new = [st for sid, st in after.items() if sid not in before]
            metrics[name] = {
                "stages": len(new),
                "mem_spill_bytes": sum(
                    st.get("memoryBytesSpilled", 0) for st in new
                ),
                "disk_spill_bytes": sum(
                    st.get("diskBytesSpilled", 0) for st in new
                ),
                "shuffle_write_bytes": sum(
                    st.get("shuffleWriteBytes", 0) for st in new
                ),
            }
        print(f"  {sf_dir.rstrip('/').rsplit('/', 1)[-1]} {name}: "
              f"{out[name]}s", flush=True)
    return out, metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--mid", default="/tmp/scaled/sf1")
    ap.add_argument("--big", default="/tmp/scaled/sf10")
    ap.add_argument("--slack", type=float, default=1.3)
    ap.add_argument("--floor", type=float, default=0.15)
    a = ap.parse_args()

    spark = get_spark(app_name="bench_scale_deep", ui=True)
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    small, _ = measure(spark, a.small, reps=3, with_metrics=False)
    mid, _ = measure(spark, a.mid, reps=3, with_metrics=False)
    big, big_metrics = measure(spark, a.big, reps=1, with_metrics=True)
    peak_heap = _peak_heap(ui, app_id)

    queries = {}
    flagged = []
    for name in HEAVY:
        r1 = round(mid[name] / max(small[name], a.floor), 2)
        r10 = round(big[name] / max(mid[name], a.floor), 2)
        m = big_metrics.get(name, {})
        queries[name] = {
            "sf0.1": small[name], "sf1": mid[name], "sf10": big[name],
            "ratio_01_to_1": r1, "ratio_1_to_10": r10,
            "sf10_mem_spill_bytes": m.get("mem_spill_bytes", 0),
            "sf10_disk_spill_bytes": m.get("disk_spill_bytes", 0),
        }
        if r10 > 10 * a.slack:
            flagged.append(name)

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "07")
    result = {
        "metric": "scale_headroom_sf10",
        "dirs": {"small": a.small, "mid": a.mid, "big": a.big},
        "slack": a.slack,
        "totals_sec": {
            "sf0.1": round(sum(small.values()), 2),
            "sf1": round(sum(mid.values()), 2),
            "sf10": round(sum(big.values()), 2),
        },
        "total_ratio_1_to_10": round(sum(big.values()) / sum(mid.values()), 2),
        "flagged_superlinear_1_to_10": flagged,
        "peak_executor_jvm_heap_bytes": peak_heap,
        "total_sf10_disk_spill_bytes": sum(
            m.get("disk_spill_bytes", 0) for m in big_metrics.values()
        ),
        "queries": queries,
    }
    with open(os.path.join(REPO, f"BENCH_SCALE10_r{rnd}.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in (
        "totals_sec", "total_ratio_1_to_10", "flagged_superlinear_1_to_10",
        "peak_executor_jvm_heap_bytes", "total_sf10_disk_spill_bytes")}))


if __name__ == "__main__":
    main()
