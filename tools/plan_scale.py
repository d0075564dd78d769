#!/usr/bin/env python
"""At-scale AQE plan pinning (VERDICT r9 next-round task #2).

tests/plan_snapshots.json freezes every registered query's COMPILED
plan at sf0.001 — but AQE re-plans at runtime, and plan shape is
scale- and deployment-sensitive: the r9 probe-hint OOM was exactly a
plan that was fine at sf0.1 and deadly at sf10. This module captures
the FINAL adaptive plans (isFinalPlan=true, after execution) of the
12-query heavy set at sf1 plus two scale-only scenarios the sf0.001
snapshots cannot see, normalizes them with the same shape rules as
the compile-time guard, and pins them in
tests/plan_snapshots_scale.json:

- ``aqe_skew_probe`` — the unsalted hot-key join over the zipf
  fixture: the final plan MUST carry ``skew=true`` (AQE skew-join
  split engaged).
- ``atomic_above_cap_probe`` — a key-probe semi-join whose batch side
  exceeds the 1M-key broadcast cap: the plan MUST NOT broadcast (the
  exact shape that OOM'd 8 GiB executors at sf10 before the cap).

A broadcast→SMJ flip, a lost exchange, or a skew-split regression at
scale now fails a test instead of surfacing as a bench anomaly.
Regenerate after intentional plan changes:

    python tools/plan_scale.py && git diff tests/plan_snapshots_scale.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.plan_guard import normalize  # noqa: E402
from tools.bench_scale10_lc import HEAVY  # noqa: E402

SF1 = "/tmp/scaled/sf1"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKEW_DIR = "/tmp/skew/sf0.1"
SNAPSHOT_PATH = os.path.join(REPO, "tests", "plan_snapshots_scale.json")

#: row-at-a-time Python and cartesian products must never appear in a
#: FINAL adaptive plan either (the compile-time invariant, re-checked
#: after AQE re-planning)
FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

#: skew-detection confs for the skew probe — test-scale thresholds,
#: same rationale as tools/bench_skew.py (defaults fire at 100 TB).
#: AQE only SPLITS a skewed partition into chunks of at least
#: advisoryPartitionSizeInBytes, so the advisory size must sit WELL
#: below the hot partition's compressed shuffle bytes (~50-70 KB for
#: the zipf fixture's hot key) or the "split" yields one chunk and
#: never engages: at the former 32k advisory the decision sat on the
#: 2x-advisory boundary and flipped with byte-level compression drift
#: across machine-days (r14 continuation). 8k advisory / 16k
#: threshold give ~4x margin on both sides of every comparison.
_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    "spark.sql.files.maxPartitionBytes": "131072",
}


def final_adaptive_plan(df) -> str:
    """Execute the frame's OWN query execution to drive AQE to its
    final plan (count()/collect() would build a separate execution),
    then return the normalized shape of the FINAL section only."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    s = qe.executedPlan().toString()
    cut = s.find("== Initial Plan ==")
    if cut != -1:
        s = s[:cut]
    return normalize(s)


def _skew_probe_df(spark):
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.catalog import table

    o = table(spark, SKEW_DIR, "orders")
    c = table(spark, SKEW_DIR, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("tot"),
        )
    )


def scenario_aqe_skew_probe(spark) -> str:
    """Hot-key join final plan under skew-detection confs + no
    broadcast (forced SMJ so the skew machinery is on the hook)."""
    from tools.bench_skew import gen_skew

    if not os.path.exists(os.path.join(SKEW_DIR, "orders.parquet")):
        gen_skew(SF01, SKEW_DIR)
    saved = {}
    conf = dict(_SKEW_CONF)
    conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    for k, v in conf.items():
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        return final_adaptive_plan(_skew_probe_df(spark))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def scenario_atomic_above_cap_probe(spark) -> str:
    """The sf10-LC OOM shape at real scale, no monkeypatch: a batch of
    ~1.5M distinct keys (sf1 orders) probes a same-sized table. Above
    the 1M-key cap _probe_hint must return the frame UNHINTED — with
    BOTH broadcast thresholds disabled, the ONLY way a
    BroadcastHashJoin can appear in the final plan is a hint, so its
    absence proves the cap held. (Spark remains free to broadcast
    when its own MEASURED size clears a real threshold — that is a
    sound, size-informed decision; the r9 OOM was the hint BYPASSING
    the threshold.)"""
    import tempfile

    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.sinks.atomic import (
        AtomicParquetTable,
        _probe_hint,
    )

    keys = (
        spark.read.parquet(f"{SF1}/orders.parquet")
        .select("o_orderkey")
        .distinct()
    )
    d = tempfile.mkdtemp(prefix="plan_scale_cap_")
    t = AtomicParquetTable(spark, d, keys=["o_orderkey"])
    t.upsert(
        spark.read.parquet(f"{SF1}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        ),
        [F.col("o_orderkey")],
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        probe = t.read().join(_probe_hint(keys), ["o_orderkey"], "left_semi")
        return final_adaptive_plan(
            probe.agg(F.count(F.lit(1)).alias("n"))
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


SCENARIOS = {
    "aqe_skew_probe": scenario_aqe_skew_probe,
    "atomic_above_cap_probe": scenario_atomic_above_cap_probe,
}

#: per-entry extra invariants checked besides snapshot equality
MUST_CONTAIN = {"aqe_skew_probe": ("skew=true",)}
MUST_NOT_CONTAIN = {
    "atomic_above_cap_probe": ("BroadcastHashJoin",),
}


def capture(spark) -> dict[str, str]:
    from stupp_exclusion_etl_spark.plans import REGISTRY

    out = {}
    for name in HEAVY:
        out[name] = final_adaptive_plan(REGISTRY[name].fn(spark, SF1))
        print(f"captured {name}", flush=True)
    for name, fn in SCENARIOS.items():
        out[name] = fn(spark)
        print(f"captured {name}", flush=True)
    return out


def main() -> int:
    from stupp_exclusion_etl_spark.session import get_spark

    if not os.path.exists(SF1):
        print(f"missing {SF1} — run tools/gen_scale.py first")
        return 1
    # the same session shape the pytest fixture uses, so the committed
    # snapshots are what the test will see
    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 2 and sys.argv[1] == "--capture-to":
        # capture-only mode for the pytest guard: the final adaptive
        # plan of a runtime-adaptive query is sensitive to accumulated
        # session state (the r12 full-suite flake), so the guard
        # captures in THIS fresh process — the exact environment the
        # committed snapshots were generated in — and asserts back in
        # the pytest process
        snaps = capture(spark)
        with open(sys.argv[2], "w") as fh:
            json.dump(snaps, fh, indent=1, sort_keys=True)
        print(f"captured {len(snaps)} plans to {sys.argv[2]}")
        return 0
    snaps = capture(spark)
    for name, plan in snaps.items():
        for tok in FORBIDDEN:
            assert tok not in plan, (name, tok)
        for tok in MUST_CONTAIN.get(name, ()):
            assert tok in plan, (name, tok, plan)
        for tok in MUST_NOT_CONTAIN.get(name, ()):
            assert tok not in plan, (name, tok, plan)
    with open(SNAPSHOT_PATH, "w") as fh:
        json.dump(snaps, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(snaps)} scale plan snapshots to {SNAPSHOT_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
