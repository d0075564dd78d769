"""Long-horizon soak of the SELF-MAINTAINING table (VERDICT r10 task
#6): many small commits under auto_compact + auto_gc with a LIVE
rate-capped CDC subscriber draining in between — the POLICY INTERPLAY
over time, complementing tests/test_atomic_model.py (per-op semantics).

What must hold across compaction and GC boundaries:
- the subscriber sees exactly the SEMANTIC change stream — no gap, no
  duplicate, no compaction write-amplification rows: each drained
  micro-batch equals changes(prev_end, end) recomputed right then, and
  replaying the accumulated stream in order reproduces the final
  snapshot byte-for-byte;
- admission control holds throughout (every batch spans ≤ cap source
  versions);
- disk stays bounded: live data files (compaction), manifests + entry
  chunks (gc) — an unattended CDC workload must not accrete;
- retention errors stay TYPED: expired versions raise
  VersionExpiredError, retained ones read back correct.
"""

from __future__ import annotations

import os

import pytest

# maintenance soak: multi-policy interplay over many commits — round-exit tier (see pytest.ini)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import (
    AtomicParquetTable,
    VersionExpiredError,
)
from stupp_exclusion_etl_spark.sources.changes_stream import (
    register_changes_stream,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v double, ts int")


def test_maintenance_soak_policy_interplay(spark, tmp_path):
    register_changes_stream(spark)
    root = tmp_path / "soak"
    t = AtomicParquetTable(
        spark, str(root), keys=["k"],
        cluster_by=["k"], cluster_files=1,
        auto_compact={"max_files_per_partition": 4, "target_file_mb": 64},
        auto_gc={"keep_versions": 20, "min_age_seconds": 0},
    )
    out = str(tmp_path / "feed")
    ck = str(tmp_path / "ck")
    N, DRAIN_EVERY, CAP = 36, 12, 3

    def drain():
        q = (
            spark.readStream.format("atomic_changes")
            .option("path", t.path)
            .option("keys", "k")
            .option("from_version", "-1")
            .option("max_versions_per_trigger", str(CAP))
            .option("emit_end_version", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    model: dict[int, tuple] = {}
    prev_end = -1
    n_commits = 0
    for i in range(N):
        # NARROW fresh key bands per commit: their files are
        # range-disjoint from everything live, so the file-scoped
        # merge appends instead of rewriting and live files ACCRETE —
        # the pattern auto-compaction exists for. Periodic hot-key
        # updates overlap old files and exercise the rewrite path too.
        batches = [[(2000 + 2 * i, float(i), i),
                    (2001 + 2 * i, float(i) / 2, i)]]
        if i % 4 == 0:
            batches.append([(i % 7, float(i), i)])
        for rows in batches:
            t.upsert(_mk(spark, rows), [F.col("ts").desc()])
            n_commits += 1
            for k, v, ts in rows:
                model[k] = (float(v), ts)
        if (i + 1) % DRAIN_EVERY == 0:
            drain()
            feed = spark.read.parquet(out).collect()
            ends = sorted({r._end_version for r in feed})
            # admission control: every batch spans <= CAP versions
            # (the bootstrap batch counts from the subscription start)
            for a, b in zip([prev_end, *ends], ends):
                if a >= 0:
                    assert b - a <= CAP, (a, b)
            # each NEW batch == the semantic diff recomputed NOW
            # (inside retention: we drain far more often than gc
            # expires — the contract a real subscriber relies on)
            new_ends = [e for e in ends if e > prev_end]
            assert new_ends, "drain produced no progress"
            lo = prev_end
            for e in new_ends:
                got = sorted(
                    (r.k, r.v, r._change_type)
                    for r in feed if r._end_version == e
                )
                if lo < 0:
                    exp_df = t.read(version=e)
                    exp = sorted(
                        (r.k, r.v, "insert") for r in exp_df.collect()
                    )
                else:
                    exp = sorted(
                        (r.k, r.v, r._change_type)
                        for r in t.changes(lo, e).collect()
                    )
                assert got == exp, (
                    f"batch ({lo},{e}] diverged from changes() — "
                    "gap/dup across a maintenance boundary"
                )
                lo = e
            prev_end = new_ends[-1]
            # no duplicate batch was ever re-served
            assert len(ends) == len(set(ends))
    drain()

    # replaying the accumulated stream in end-version order must
    # reproduce the final snapshot exactly (global no-gap/no-dup)
    feed = spark.read.parquet(out).collect()
    replay: dict[int, float] = {}
    for r in sorted(feed, key=lambda r: r._end_version):
        if r._change_type == "delete":
            replay.pop(r.k, None)
        else:
            replay[r.k] = r.v
    final = {r.k: r.v for r in t.read().collect()}
    assert replay == final
    assert final == {k: v for k, (v, _ts) in model.items()}

    # bounded disk: compaction kept live files near the cap (not one
    # per commit), gc kept manifests + chunks near retention
    man_dir = root / "_manifests"
    manifests = [
        n for n in os.listdir(man_dir)
        if n.startswith("v") and n.endswith(".json")
    ]
    assert len(manifests) <= 21, len(manifests)
    data_files = [
        f for _d, _s, fs in os.walk(root / "data")
        for f in fs if f.endswith(".parquet")
    ]
    # retained versions can each reference a bounded file set; no
    # per-commit accretion survives gc + compaction
    assert len(data_files) <= 21 * 10, len(data_files)
    live_now = sum(
        len(fl) for fl in t.snapshot()["partitions"].values()
    )
    assert live_now <= 10, live_now  # head itself stays compacted
    chunks = [
        n for n in os.listdir(man_dir / "chunks")
        if n.startswith("c-") and n.endswith(".json")
    ]
    assert len(chunks) <= 21 * 10, len(chunks)

    # typed retention contract after ~3x retention of commits
    cur = t.current_version()
    with pytest.raises(VersionExpiredError, match="retained"):
        t.read(version=0)
    oldest_retained = min(int(n[1:-5]) for n in manifests)
    assert t.read(version=oldest_retained) is not None
    # compaction really committed along the way (cur counts upserts
    # PLUS at least one auto-compaction version)
    assert cur >= n_commits, (cur, n_commits)
