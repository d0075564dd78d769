#!/usr/bin/env python
"""Skew × distribution: the zipf fixture under local-cluster (VERDICT
r9 next-round task #1 — the last empty cell of the evidence matrix).

BENCH_SKEW only ever ran single-JVM (local[32]), but skew mitigation
is precisely a distributed phenomenon: AQE skew-join splits map-output
ranges ACROSS executors, the salted join exists to spread one hot
key's reducer over real processes, and a straggler is only a
straggler when the other executors sit idle waiting for it. This tool
re-runs bench_skew's probes under ``local-cluster[4,8,8192]`` — 4
real executor JVMs, real serialization, real shuffle transport —
reusing bench_scale10_lc's subprocess/tier machinery (one child
cluster per probe, so a failure is a reported row, not a dead sweep):

1. AQE skew-join ENGAGES on the unsalted hot-key join over real
   executors (broadcast disabled; lowered detection thresholds, same
   rationale as bench_skew.py — the defaults fire on this shape at
   100 TB).
2. Per skew-sensitive query: skewed vs uniform medians and their
   ratio, plus a straggler audit of every completed stage via the UI
   REST API — max task ≤ 10× stage median, the same bound the
   local[32] run gates.
3. VALUE equality across deployments: each query's result multiset is
   hashed in-engine (sum of pmod(xxhash64(cols), 2^30) + count — the
   ANSI-overflow-safe fold) on BOTH fixtures under local-cluster AND
   under plain local[32]; any divergence is a distribution-dependent
   wrong answer, which no bench ratio would catch.
4. The LSH bucket-cap audit (hot cluster must cross an explicit cap;
   emitted candidates bounded by the capped-bucket pair sum) repeated
   over real executors.

Writes BENCH_SKEW_LC_r{N}.json (env SPARK_GRAFT_ROUND, default 10).

Usage:
  python tools/bench_skew_lc.py                        # parent sweep
  python tools/bench_skew_lc.py --child lc --query Q   # LC child
  python tools/bench_skew_lc.py --child aqe            # AQE probe child
  python tools/bench_skew_lc.py --child local32        # hash baseline
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_skew import (  # noqa: E402
    QUERIES,
    gen_skew,
    straggler_report,
)

SKEW_DIR = "/tmp/skew/sf0.1"
STRAGGLER_BOUND = 10.0  # same rule the local[32] BENCH_SKEW gates

#: test-scale skew detection + multi-mapper scan splits (see
#: tools/bench_skew.py ROW_GROUP note — defaults fire at cluster scale)
_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    "spark.sql.files.maxPartitionBytes": "131072",
}


def _lc_session(app: str, exec_mb: int = 8192):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local-cluster[4,8,{exec_mb}]")
        .appName(app)
        .config("spark.driver.memory", "8g")
        .config(
            "spark.executorEnv.PYTHONPATH",
            REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # executor-heap-scaled broadcast threshold (the r9 OOM lesson)
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(10 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
    )
    for k, v in _SKEW_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).repartition(64).count()  # executors register
    return spark


def _result_hash(df) -> dict:
    """Order-independent multiset hash computed IN-ENGINE: per-row
    xxhash64 over canonicalized columns folded through pmod 2^30
    before summing (raw xxhash64 sums overflow ANSI arithmetic after a
    few million rows), plus the row count."""
    from pyspark.sql import functions as F

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        for c in sorted(df.columns)
    ]
    row = df.select(
        F.pmod(F.xxhash64(*cols), F.lit(1 << 30)).alias("h")
    ).agg(
        F.sum("h").alias("hs"), F.count(F.lit(1)).alias("n")
    ).first()
    return {"hash": int(row["hs"] or 0), "rows": int(row["n"])}


def _median_time(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    from stupp_exclusion_etl_spark.plans import REGISTRY

    REGISTRY[name].fn(spark, sf_dir).count()  # untimed warm build
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def child_lc(name: str, src: str) -> int:
    from stupp_exclusion_etl_spark.plans import REGISTRY

    spark = _lc_session(f"skew-lc-{name}")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    out = {
        "query": name,
        "skewed_sec": _median_time(spark, name, SKEW_DIR),
        "uniform_sec": _median_time(spark, name, src),
        "hash_skewed": _result_hash(REGISTRY[name].fn(spark, SKEW_DIR)),
        "hash_uniform": _result_hash(REGISTRY[name].fn(spark, src)),
    }
    stages = straggler_report(ui, app_id)
    out["straggler_stages_checked"] = len(stages)
    out["worst_task_over_median"] = max(
        (s["ratio"] for s in stages), default=0.0
    )
    out["worst_stages"] = sorted(stages, key=lambda s: -s["ratio"])[:3]
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def child_aqe() -> int:
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.catalog import table
    from tests.harness import plan_str

    spark = _lc_session("skew-lc-aqe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = table(spark, SKEW_DIR, "orders")
    c = table(spark, SKEW_DIR, "customer")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("tot"),
        )
    )
    j.collect()  # executes THIS adaptive plan (count() would build its own)
    final_plan = plan_str(j, "simple")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = straggler_report(ui, app_id)
    out = {
        "aqe_skew_join_engaged": "skew=true" in final_plan,
        "hot_join_hash": _result_hash(j),
        "straggler_stages_checked": len(stages),
        "worst_task_over_median": max(
            (s["ratio"] for s in stages), default=0.0
        ),
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def child_bucket_cap() -> int:
    """LSH bucket-cap audit over real executors (bench_skew.py's 2b)."""
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.catalog import table
    from stupp_exclusion_etl_spark.operators.dedup import (
        lsh_bands,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from stupp_exclusion_etl_spark.plans.dedup import _BAND_SIZE, _N_HASHES

    spark = _lc_session("skew-lc-bucketcap")
    cap = 500  # below the ~1000-member hot cluster (fixture-limit note)
    docs = table(spark, SKEW_DIR, "documents")
    sizes = (
        lsh_bands(
            minhash_signatures(docs, "doc_id", "text", _N_HASHES, 3),
            "doc_id", _N_HASHES, _BAND_SIZE,
        )
        .groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bstats = sizes.agg(
        F.max("n").alias("max_n"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("n_over"),
        F.sum(
            F.when(F.col("n").between(2, cap), F.expr("n * (n - 1) / 2"))
            .otherwise(0)
        ).alias("capped_pair_bound"),
    ).first()
    n_candidates = minhash_lsh_pairs(
        docs, "doc_id", "text",
        n_hashes=_N_HASHES, band_size=_BAND_SIZE, shingle_k=3,
        max_bucket=cap,
    ).count()
    out = {
        "cap": cap,
        "max_bucket_size": int(bstats.max_n),
        "buckets_over_cap": int(bstats.n_over),
        "candidate_pairs": int(n_candidates),
        "capped_pair_bound": int(bstats.capped_pair_bound),
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def child_local32(src: str) -> int:
    """Single-JVM hash baseline: the SAME queries and fixtures under
    local[32] — LC results must be value-identical."""
    from pyspark.sql import SparkSession

    from stupp_exclusion_etl_spark.plans import REGISTRY

    b = (
        SparkSession.builder.master("local[32]")
        .appName("skew-l32-baseline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _SKEW_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in QUERIES:
        out[name] = {
            "hash_skewed": _result_hash(
                REGISTRY[name].fn(spark, SKEW_DIR)
            ),
            "hash_uniform": _result_hash(REGISTRY[name].fn(spark, src)),
        }
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def _run_child(args: list[str], timeout: int = 2400):
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, timeout=timeout,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):]), None
    return None, (p.stderr or p.stdout).strip()[-400:]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=("lc", "aqe", "local32", "bucket"))
    ap.add_argument("--query")
    a = ap.parse_args()
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if a.child == "lc":
        return child_lc(a.query, src)
    if a.child == "aqe":
        return child_aqe()
    if a.child == "bucket":
        return child_bucket_cap()
    if a.child == "local32":
        return child_local32(src)

    gen_skew(src, SKEW_DIR)
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "10")
    out_path = os.path.join(REPO, f"BENCH_SKEW_LC_r{rnd}.json")
    errors: dict[str, str] = {}

    aqe, err = _run_child(["--child", "aqe"])
    if err:
        errors["aqe"] = err
    bucket, err = _run_child(["--child", "bucket"])
    if err:
        errors["bucket"] = err
    l32, err = _run_child(["--child", "local32"])
    if err:
        errors["local32"] = err

    queries: dict[str, dict] = {}
    hash_mismatches = []
    for name in QUERIES:
        rec, err = _run_child(["--child", "lc", "--query", name])
        if err:
            errors[name] = err
            print(f"FAIL {name}: {err[:120]}", flush=True)
            continue
        rec["skew_over_uniform_ratio"] = round(
            rec["skewed_sec"] / max(rec["uniform_sec"], 0.05), 2
        )
        if l32 and name in l32:
            rec["hash_matches_local32"] = (
                rec["hash_skewed"] == l32[name]["hash_skewed"]
                and rec["hash_uniform"] == l32[name]["hash_uniform"]
            )
            if not rec["hash_matches_local32"]:
                hash_mismatches.append(name)
        queries[name] = rec
        print(
            f"ok   {name:24s} skew {rec['skewed_sec']:7.2f}s  uniform "
            f"{rec['uniform_sec']:7.2f}s  ratio "
            f"{rec['skew_over_uniform_ratio']:5.2f}  worst-task "
            f"{rec['worst_task_over_median']:5.2f}x  hash "
            f"{'=' if rec.get('hash_matches_local32') else '?'}",
            flush=True,
        )

    worst = max(
        [q["worst_task_over_median"] for q in queries.values()]
        + ([aqe["worst_task_over_median"]] if aqe else []),
        default=0.0,
    )
    result = {
        "metric": "skew_robustness_local_cluster",
        "master": "local-cluster[4,8,8192]",
        "skew_shape": (
            "hot key = 20% of rows (events.user_id, orders.o_custkey); "
            "20% of documents one near-dup cluster"
        ),
        "straggler_bound": STRAGGLER_BOUND,
        "aqe": aqe,
        "lsh_bucket_cap": bucket,
        "queries": queries,
        "hash_mismatches_vs_local32": hash_mismatches,
        "worst_task_over_median": worst,
        "errors": errors,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    print(json.dumps({
        "aqe_skew_join_engaged": (aqe or {}).get("aqe_skew_join_engaged"),
        "worst_task_over_median": worst,
        "hash_mismatches": hash_mismatches,
        "errors": sorted(errors),
    }))

    assert aqe and aqe["aqe_skew_join_engaged"], (
        "AQE skew-join did not engage over real executors"
    )
    assert worst <= STRAGGLER_BOUND, (
        f"straggler over executors: max task {worst}x median"
    )
    assert not hash_mismatches, (
        f"distribution-dependent values: {hash_mismatches}"
    )
    assert bucket and bucket["buckets_over_cap"] > 0
    assert bucket["candidate_pairs"] <= bucket["capped_pair_bound"]
    assert not errors, errors
    return 0


if __name__ == "__main__":
    sys.exit(main())
