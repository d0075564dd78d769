#!/usr/bin/env python
"""Skewed-data robustness bench (VERDICT r4/r5 directed task #5).

Derives a zipf-style skewed variant of sf0.1 (one hot key ≈20% of
rows) and proves the engine's skew story empirically, not just by
plan audit:

1. AQE skew-join ENGAGES: an unsalted orders⋈customer on the skewed
   key (broadcast disabled so it plans as SMJ) must show skew
   handling in the final adaptive plan. Detection thresholds are
   lowered to test scale — at 100 TB the defaults fire on the same
   shape.
2. Hot-key robustness: the skew-sensitive headline queries
   (join_salted_skew, win_topk_per_group, dedup_minhash_lsh,
   dedup_groups_cc_star) run on skewed AND uniform data; a robust
   operator's skewed/uniform ratio stays near 1 — a straggler or a
   quadratic hot-bucket blowup shows up directly here.
3. Straggler check: per-stage task durations from the UI REST API —
   no stage with meaningful work may have max task > 10× its median
   (the single-straggler-reducer signature).

Skew shape: events.user_id→0 and orders.o_custkey→1 for 20% of rows;
20% of documents become one giant near-duplicate cluster (shared base
text + per-doc tail), which stresses the LSH bucket cap and the
connected-components giant-component path.

Writes BENCH_SKEW_r{N}.json (env SPARK_GRAFT_ROUND, default 06).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stupp_exclusion_etl_spark.plans import REGISTRY  # noqa: E402
from stupp_exclusion_etl_spark.catalog import table  # noqa: E402
from stupp_exclusion_etl_spark.session import get_spark  # noqa: E402
from tests.harness import plan_str  # noqa: E402

QUERIES = [
    "join_salted_skew",
    "win_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_groups_cc_star",
]


# Fact tables are written with small row groups: AQE splits a skewed
# reduce partition by MAP-OUTPUT RANGES, so a single-row-group file
# (= one effective mapper at this scale) can never be skew-split and
# OptimizeSkewedJoin silently declines. At 100 TB there are thousands
# of mappers and this is a non-issue; at 2.7 MB it was the whole
# reason the skew probe failed (found empirically this round).
ROW_GROUP = 10_000


def gen_skew(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "embeddings"):
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{out}/{t}.parquet")

    ev = pq.read_table(f"{src}/events.parquet")
    eid = np.asarray(ev["event_id"].combine_chunks())
    uid = np.asarray(ev["user_id"].combine_chunks()).copy()
    uid[eid % 5 == 0] = 0  # hot user: 20% of all events
    ev = ev.set_column(ev.column_names.index("user_id"), "user_id",
                       pa.array(uid, type=ev["user_id"].type))
    pq.write_table(ev, f"{out}/events.parquet", row_group_size=ROW_GROUP)

    o = pq.read_table(f"{src}/orders.parquet")
    okey = np.asarray(o["o_orderkey"].combine_chunks())
    ckey = np.asarray(o["o_custkey"].combine_chunks()).copy()
    ckey[okey % 5 == 0] = 1  # hot customer: 20% of all orders
    o = o.set_column(o.column_names.index("o_custkey"), "o_custkey",
                     pa.array(ckey, type=o["o_custkey"].type))
    pq.write_table(o, f"{out}/orders.parquet", row_group_size=ROW_GROUP)

    d = pq.read_table(f"{src}/documents.parquet")
    ids = d["doc_id"].to_pylist()
    texts = d["text"].to_pylist()
    base = next(t for t in texts if t and len(t) > 200)
    new_texts = [
        f"{base} tail{i}" if (i % 5 == 0) else t
        for i, t in zip(ids, texts)
    ]
    d = d.set_column(d.column_names.index("text"), "text",
                     pa.array(new_texts, type=d["text"].type))
    n = [None if x is None else len(x) for x in new_texts]
    d = d.set_column(d.column_names.index("n_chars"), "n_chars",
                     pa.array(n, type=d["n_chars"].type))
    pq.write_table(d, f"{out}/documents.parquet", row_group_size=1000)


def median_time(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    REGISTRY[name].fn(spark, sf_dir).count()  # untimed warm build
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def straggler_report(ui: str, app_id: str) -> list[dict]:
    """max/median task duration per completed stage with real work."""
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    out = []
    for st in stages:
        if st.get("numCompleteTasks", 0) < 8:
            continue
        sid, att = st["stageId"], st["attemptId"]
        tasks = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskList?length=5000"
            )
        )
        durs = [t.get("duration", 0) for t in tasks if t.get("status") == "SUCCESS"]
        if not durs:
            continue
        med = statistics.median(durs)
        if med < 50:  # only stages with meaningful per-task work
            continue
        out.append({
            "stage": sid,
            "name": st.get("name", "")[:60],
            "tasks": len(durs),
            "median_ms": med,
            "max_ms": max(durs),
            "ratio": round(max(durs) / max(med, 1.0), 2),
        })
    return out


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    skew_dir = "/tmp/skew/sf0.1"
    gen_skew(src, skew_dir)

    spark = get_spark(
        app_name="bench_skew",
        ui=True,
        extra_conf={
            # test-scale skew detection (defaults: 256 MB / 5x — they
            # fire on the same shape at cluster scale); small scan
            # splits so the probe has multiple mappers (see ROW_GROUP)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
            "spark.sql.files.maxPartitionBytes": "131072",
        },
    )
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    # 1. AQE skew-join engagement on an UNSALTED join over the hot key
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = table(spark, skew_dir, "orders")
        c = table(spark, skew_dir, "customer")
        j = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("tot"),
            )
        )
        # collect(), not count(): count() builds its OWN adaptive plan,
        # leaving j's queryExecution unexecuted (isFinalPlan=false)
        j.collect()
        final_plan = plan_str(j, "simple")
        aqe_engaged = "skew=true" in final_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # 2. skewed vs uniform medians for the skew-sensitive queries
    skewed = {q: median_time(spark, q, skew_dir) for q in QUERIES}
    uniform = {q: median_time(spark, q, src) for q in QUERIES}
    ratios = {
        q: round(skewed[q] / max(uniform[q], 0.05), 2) for q in QUERIES
    }

    # 2b. LSH bucket-cap audit (VERDICT r6 wrong #3): the hot-cluster
    # fixture must actually push band buckets past the cap, and the
    # operator's emitted candidate pairs must stay within the bound
    # Σ C(n_b, 2) over CAPPED buckets only — if the max_bucket guard
    # ever regresses, the giant cluster's ~C(hot, 2) pairs blow
    # straight through this assertion rather than showing up as
    # deniable wall-time drift.
    from stupp_exclusion_etl_spark.operators.dedup import (  # noqa: E402
        lsh_bands,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from stupp_exclusion_etl_spark.plans.dedup import (  # noqa: E402
        _BAND_SIZE,
        _N_HASHES,
    )

    # audit at an EXPLICIT cap below the hot-cluster size: sf0.1 has
    # 5000 docs, so the 20% hot cluster tops out near 1000 members and
    # can never exceed the operator's default cap of 1000 — asserting
    # the mechanism requires a cap the fixture actually crosses
    cap = 500
    docs = table(spark, skew_dir, "documents")
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
    bucket_audit = {
        "cap": cap,
        "max_bucket_size": int(bstats.max_n),
        "buckets_over_cap": int(bstats.n_over),
        "candidate_pairs": int(n_candidates),
        "capped_pair_bound": int(bstats.capped_pair_bound),
    }

    # 3. straggler audit over every completed stage of this app
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = straggler_report(ui, app_id)
    worst = max((s["ratio"] for s in stages), default=0.0)

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "06")
    result = {
        "metric": "skew_robustness",
        "skew_shape": "hot key = 20% of rows (events.user_id, orders.o_custkey); 20% of documents one near-dup cluster",
        "aqe_skew_join_engaged": aqe_engaged,
        "queries_skewed_sec": skewed,
        "queries_uniform_sec": uniform,
        "skew_over_uniform_ratio": ratios,
        "worst_task_over_median": worst,
        "straggler_stages_checked": len(stages),
        "lsh_bucket_cap": bucket_audit,
        "stages": sorted(stages, key=lambda s: -s["ratio"])[:10],
    }
    with open(os.path.join(REPO, f"BENCH_SKEW_r{rnd}.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in (
        "aqe_skew_join_engaged", "skew_over_uniform_ratio",
        "worst_task_over_median")}))
    assert aqe_engaged, "AQE skew-join did not engage on the hot-key join"
    assert worst <= 10, f"straggler: max task {worst}x median"
    assert bucket_audit["buckets_over_cap"] > 0, (
        "skew fixture no longer stresses the LSH bucket cap"
    )
    assert n_candidates <= bucket_audit["capped_pair_bound"], (
        f"LSH bucket cap regressed: {n_candidates:,} candidate pairs "
        f"exceed the capped-bucket bound "
        f"{bucket_audit['capped_pair_bound']:,}"
    )


if __name__ == "__main__":
    main()
