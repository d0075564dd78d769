#!/usr/bin/env python
"""Spill-path exercise (VERDICT r7 next-round #7): the sf10 headroom
run recorded ZERO spill under a 48 GB heap — good, but it means the
spill machinery itself had no evidence. This tool runs each heavy
shuffle/sort query at sf10 in its OWN process under a deliberately
small heap (8 GB first; a query that genuinely cannot fit 32 local
threads in 8 GB escalates to the next heap on the ladder, and the heap
that completed is recorded), plus once under the comfortable 48 GB
reference heap, and proves:

- the small-heap runs record NONZERO memory/disk spill bytes
  (UI REST per-stage metrics), i.e. the spill code path actually ran;
- every query's result under spill is VALUE-IDENTICAL to the
  no-spill reference (order-independent fingerprint: count + sum of
  xxhash64 over all columns stringified — computed inside Spark, no
  driver-side collect of sf10 results).

Per-query isolation matters: a JVM that OOMs under the small heap
takes the whole session with it, so each (query, heap) attempt is a
fresh subprocess and an OOM is that query's escalation, not the end
of the evidence.

Writes BENCH_SPILL_r{N}.json (env SPARK_GRAFT_ROUND, default 08).

Usage: python tools/bench_spill.py [--sf-dir /tmp/scaled/sf10]
       [--heaps 8g,12g,16g] [--ref-heap 48g]
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

#: spill matrix (r9, VERDICT r8 task #6): r8 proved only JOIN spill
#: (join_fk_chain's SMJ sorts under genuine 8g pressure; the rest fit
#: their heaps) — the sort/window and agg machineries need their own
#: evidence. Each entry: query, its small-heap ladder, and session
#: conf for the SMALL run only. Two forcing styles, both verified
#: hash-equal to an unforced comfortable-heap reference:
#:
#: - genuine pressure (conf {}): undersized heap, spill happens where
#:   the memory manager says so (join_fk_chain @ 8g; agg_having's
#:   1.5M-group partial maps @ 2g with 32 concurrent scan tasks);
#: - forced thresholds (documented SQLConf spill knobs): the window
#:   buffer and external-sort element thresholds make the
#:   ExternalAppendOnlyUnsafeRowArray / UnsafeExternalSorter spill
#:   paths run deterministically at ANY heap — the machinery under
#:   test is the spill+merge code itself, not the allocator.
SPILL_SET = [
    {"name": "join_fk_chain", "heaps": None, "conf": {}},
    {"name": "win_topk_per_group", "heaps": None, "conf": {}},
    {"name": "dedup_minhash_lsh", "heaps": None, "conf": {}},
    {"name": "pipeline_near_dedup", "heaps": None, "conf": {}},
    {"name": "text_lang_id_learned", "heaps": None, "conf": {}},
    # r9: window/sort spill, forced thresholds (any heap)
    {
        "name": "win_topk_per_group#forced_window_sort",
        "query": "win_topk_per_group",
        "heaps": ["8g"],
        "conf": {
            "spark.sql.windowExec.buffer.spill.threshold": "2048",
            "spark.shuffle.spill.numElementsForceSpillThreshold":
                "262144",
        },
    },
    # r9: external-sort spill inside the SMJ family, forced
    {
        "name": "join_fk_chain#forced_sort",
        "query": "join_fk_chain",
        "heaps": ["12g"],
        "conf": {
            "spark.shuffle.spill.numElementsForceSpillThreshold":
                "262144",
            "spark.sql.sortMergeJoinExec.buffer.spill.threshold":
                "4096",
        },
    },
    # r9: hash-aggregate spill, genuine pressure — ALL 1.5M o_custkey
    # groups land in ONE final-agg task (shuffle.partitions=1) whose
    # execution-memory share is squeezed to ~100 MB
    # (memory.fraction=0.05 at a 2g heap), so the
    # UnsafeFixedWidthAggregationMap cannot grow and must take the
    # destructAndCreateExternalSorter fallback. Measured: 270 MB mem +
    # 55 MB disk spilled, fingerprint equal to the unpressured run.
    # (The earlier 2g/partitions=8 attempt recorded ZERO spill — the
    # per-task maps fit; partial-mode aggregation never breached.)
    {
        "name": "agg_having#agg_pressure",
        "query": "agg_having",
        "heaps": ["2g", "3g"],
        "conf": {
            "spark.sql.shuffle.partitions": "1",
            "spark.memory.fraction": "0.05",
        },
    },
]


def run_one(name: str, sf_dir: str, out_json: str,
            conf_json: str = "{}") -> None:
    """Subprocess body: one session (heap via SPARK_DRIVER_MEMORY),
    one query → {fingerprint, rows, secs, spill bytes}. ``conf_json``
    is applied as session-level SQLConf (spill thresholds, shuffle
    partitions) before the query builds."""
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.plans import REGISTRY
    from stupp_exclusion_etl_spark.session import get_spark

    # conf goes in at BUILDER time: the spill thresholds include core
    # (static) confs like numElementsForceSpillThreshold that a live
    # session silently ignores — each inner attempt is a fresh JVM, so
    # builder-time config binds them for real
    spark = get_spark(
        app_name=f"bench-spill-{name}", ui=True,
        extra_conf=json.loads(conf_json),
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    # order-independent value fingerprint computed IN Spark. The hash
    # is folded mod 2^30 BEFORE summing: a raw sum of 64-bit xxhash64
    # values overflows long after a few million rows (ANSI mode raises
    # ARITHMETIC_OVERFLOW); mod-reduced terms keep the sum exact for
    # up to 2^33 rows while staying multiset-sensitive (unlike
    # bit_xor, which cancels duplicate rows in pairs).
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64(
                    *[F.col(c).cast("string") for c in df.columns]
                ),
                F.lit(1 << 30),
            )
        ).alias("h"),
    ).first()
    secs = time.perf_counter() - t0
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ))
    rec = {
        "rows": int(row["n"]),
        "fingerprint": int(row["h"] or 0),
        "secs": round(secs, 1),
        "mem_spill_bytes": sum(
            st.get("memoryBytesSpilled", 0) for st in stages
        ),
        "disk_spill_bytes": sum(
            st.get("diskBytesSpilled", 0) for st in stages
        ),
    }
    with open(out_json, "w") as fh:
        json.dump(rec, fh)
    print(f"    {name}: {rec}", flush=True)
    spark.stop()


def attempt(name: str, sf_dir: str, heap: str,
            conf: dict | None = None) -> dict | None:
    tmp = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, SPARK_DRIVER_MEMORY=heap)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inner",
         name, sf_dir, tmp, json.dumps(conf or {})],
        env=env,
    )
    if r.returncode != 0 or not os.path.exists(tmp):
        return None
    with open(tmp) as fh:
        rec = json.load(fh)
    os.unlink(tmp)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scaled/sf10")
    ap.add_argument("--heaps", default="8g,12g,16g")
    ap.add_argument("--ref-heap", default="48g")
    ap.add_argument("--inner", nargs=4,
                    metavar=("QUERY", "SF", "OUT", "CONF"))
    a = ap.parse_args()
    if a.inner:
        run_one(*a.inner)
        return 0
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "08")
    out_path = os.path.join(REPO, f"BENCH_SPILL_r{rnd}.json")
    default_ladder = a.heaps.split(",")
    per_query: dict[str, dict] = {}
    total_spill = 0
    mismatches = []
    for entry in SPILL_SET:
        name = entry["name"]
        query = entry.get("query", name)
        ladder = entry["heaps"] or default_ladder
        conf = entry["conf"]
        small = None
        used_heap = None
        for heap in ladder:
            print(f"[{heap}] {name} ...", flush=True)
            small = attempt(query, a.sf_dir, heap, conf)
            if small is not None:
                used_heap = heap
                break
            print(f"    {name} did not survive {heap}, escalating",
                  flush=True)
        # reference: comfortable heap, NO forcing conf — proving the
        # spilled/forced run's values equal the unspilled plan's
        print(f"[{a.ref_heap}] {name} (reference) ...", flush=True)
        ref = attempt(query, a.sf_dir, a.ref_heap)
        if small is None or ref is None:
            mismatches.append(name)
            per_query[name] = {"error": "tier failed", "heap": used_heap}
            continue
        match = (
            small["rows"] == ref["rows"]
            and small["fingerprint"] == ref["fingerprint"]
        )
        if not match:
            mismatches.append(name)
        spill = small["mem_spill_bytes"] + small["disk_spill_bytes"]
        total_spill += spill
        per_query[name] = {
            "rows": small["rows"],
            "conf": conf,
            "small_heap": used_heap,
            "values_match_no_spill_run": match,
            "small_heap_secs": small["secs"],
            "ref_heap_secs": ref["secs"],
            "small_heap_mem_spill_bytes": small["mem_spill_bytes"],
            "small_heap_disk_spill_bytes": small["disk_spill_bytes"],
            "ref_heap_spill_bytes": (
                ref["mem_spill_bytes"] + ref["disk_spill_bytes"]
            ),
        }
    payload = {
        "metric": "spill_path_correctness",
        "sf_dir": a.sf_dir,
        "heap_ladder": ladder,
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
