#!/usr/bin/env python
"""Spill-path exercise (VERDICT r7 next-round #7): the sf10 headroom
run recorded ZERO spill under a 48 GB heap — good, but it means the
spill machinery itself had no evidence. This tool runs the heavy
shuffle/sort queries at sf10 TWICE in separate processes — once with a
deliberately small heap (default 8 GB, forcing sort/agg spills) and
once with the comfortable 48 GB reference heap — and proves:

- the small-heap run records NONZERO memory/disk spill bytes
  (UI REST per-stage metrics), i.e. the spill code path actually ran;
- every query's result under spill is VALUE-IDENTICAL to the
  no-spill reference (order-independent fingerprint: count + sum of
  xxhash64 over all columns stringified — computed inside Spark, no
  driver-side collect of sf10 results).

Writes BENCH_SPILL_r{N}.json (env SPARK_GRAFT_ROUND, default 08).

Usage: python tools/bench_spill.py [--sf-dir /tmp/scaled/sf10]
       [--small-heap 8g] [--ref-heap 48g]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: heavy shuffle/sort surfaces: FK-chain SMJ sorts, global window
#: sort, the LSH band shuffle, the four-stage near-dedup composite,
#: and the train/apply text pipeline
SPILL_SET = [
    "join_fk_chain",
    "win_topk_per_group",
    "dedup_minhash_lsh",
    "pipeline_near_dedup",
    "text_lang_id_learned",
]


def run_tier(sf_dir: str, heap: str, out_json: str) -> None:
    """Subprocess body: one session at `heap`, run the set, write
    {query: {fingerprint, rows, secs, spill bytes}}."""
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.plans import REGISTRY
    from stupp_exclusion_etl_spark.session import get_spark

    spark = get_spark(app_name=f"bench-spill-{heap}", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages() -> dict[int, dict]:
        data = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ))
        return {st["stageId"]: st for st in data}

    out: dict[str, dict] = {}
    for name in SPILL_SET:
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        before = stages()
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        # order-independent value fingerprint computed IN Spark
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
            ).alias("h"),
        ).first()
        secs = time.perf_counter() - t0
        after = stages()
        new = [st for sid, st in after.items() if sid not in before]
        out[name] = {
            "rows": int(row["n"]),
            "fingerprint": int(row["h"] or 0),
            "secs": round(secs, 1),
            "mem_spill_bytes": sum(
                st.get("memoryBytesSpilled", 0) for st in new
            ),
            "disk_spill_bytes": sum(
                st.get("diskBytesSpilled", 0) for st in new
            ),
        }
        print(f"  [{heap}] {name}: {out[name]}", flush=True)
    with open(out_json, "w") as fh:
        json.dump(out, fh)
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scaled/sf10")
    ap.add_argument("--small-heap", default="8g")
    ap.add_argument("--ref-heap", default="48g")
    ap.add_argument("--inner", nargs=3, metavar=("SF", "HEAP", "OUT"))
    a = ap.parse_args()
    if a.inner:
        run_tier(*a.inner)
        return 0
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "08")
    out_path = os.path.join(REPO, f"BENCH_SPILL_r{rnd}.json")
    tiers: dict[str, dict] = {}
    for heap in (a.small_heap, a.ref_heap):
        tmp = tempfile.mktemp(suffix=".json")
        env = dict(os.environ, SPARK_DRIVER_MEMORY=heap)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner",
             a.sf_dir, heap, tmp],
            env=env,
        )
        if r.returncode != 0:
            print(f"tier {heap} failed rc={r.returncode}")
            return 1
        with open(tmp) as fh:
            tiers[heap] = json.load(fh)
        os.unlink(tmp)
    small, ref = tiers[a.small_heap], tiers[a.ref_heap]
    per_query = {}
    total_spill = 0
    mismatches = []
    for name in SPILL_SET:
        s, rf = small[name], ref[name]
        match = (
            s["rows"] == rf["rows"]
            and s["fingerprint"] == rf["fingerprint"]
        )
        if not match:
            mismatches.append(name)
        spill = s["mem_spill_bytes"] + s["disk_spill_bytes"]
        total_spill += spill
        per_query[name] = {
            "rows": s["rows"],
            "values_match_no_spill_run": match,
            "small_heap_secs": s["secs"],
            "ref_heap_secs": rf["secs"],
            "small_heap_mem_spill_bytes": s["mem_spill_bytes"],
            "small_heap_disk_spill_bytes": s["disk_spill_bytes"],
            "ref_heap_spill_bytes": (
                rf["mem_spill_bytes"] + rf["disk_spill_bytes"]
            ),
        }
    payload = {
        "metric": "spill_path_correctness",
        "sf_dir": a.sf_dir,
        "small_heap": a.small_heap,
        "ref_heap": a.ref_heap,
        "total_small_heap_spill_bytes": total_spill,
        "spill_exercised": total_spill > 0,
        "value_mismatches": mismatches,
        "queries": per_query,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: payload[k] for k in (
        "metric", "total_small_heap_spill_bytes", "spill_exercised",
        "value_mismatches")}))
    print(f"wrote {out_path}")
    return 0 if (total_spill > 0 and not mismatches) else 1


if __name__ == "__main__":
    sys.exit(main())
