"""Atomic multi-partition publish (sinks/atomic.py): kill-mid-publish
old-or-new reader proof, untouched-partition byte identity, emptied
partitions, concurrent-commit conflict, orphan GC."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import (
    AtomicParquetTable,
    ConcurrentWriteError,
)


def _rows(t):
    df = t.read()
    return sorted((r.k, r.part, r.v, r.ts) for r in df.collect()) if df is not None else None


def _base(spark, path, hooks=None):
    t = AtomicParquetTable(
        spark, path, keys=["k"], partition_by=["part"], hooks=hooks
    )
    return t


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, part string, v string, ts int")


BASE = [
    (1, "A", "a1", 0),
    (2, "A", "a2", 0),
    (3, "B", "b1", 0),
    (4, "C", "c1", 0),
]


@pytest.fixture()
def table(spark, tmp_path):
    t = _base(spark, str(tmp_path / "tbl"))
    t.upsert(_df(spark, BASE), [F.col("ts").desc()])
    return t


def test_first_commit_and_read(spark, table):
    assert table.current_version() == 0
    assert _rows(table) == sorted(BASE)


def test_upsert_merges_only_touched_partitions_and_is_atomic_versioned(
    spark, table
):
    batch = [(2, "A", "a2-new", 1), (5, "B", "b2", 1)]
    v = table.upsert(_df(spark, batch), [F.col("ts").desc()])
    assert v == 1
    expect = sorted(
        [(1, "A", "a1", 0), (2, "A", "a2-new", 1), (3, "B", "b1", 0),
         (5, "B", "b2", 1), (4, "C", "c1", 0)]
    )
    assert _rows(table) == expect
    # untouched partition C: manifest entry carried forward verbatim,
    # file bytes untouched on disk
    m0, m1 = table._manifest(0), table._manifest(1)
    assert m0["partitions"]["part=C"] == m1["partitions"]["part=C"]
    f = os.path.join(table.path, "data", m0["partitions"]["part=C"][0])
    assert os.path.exists(f)


def test_key_moving_partition_empties_old_partition(spark, table):
    # key 3 is partition B's only row; move it to C
    table.upsert(_df(spark, [(3, "C", "b1-moved", 1)]), [F.col("ts").desc()])
    man = table.snapshot()
    assert "part=B" not in man["partitions"]
    assert _rows(table) == sorted(
        [(1, "A", "a1", 0), (2, "A", "a2", 0), (3, "C", "b1-moved", 1),
         (4, "C", "c1", 0)]
    )


@pytest.mark.parametrize("stage", ["staged", "moved", "before_commit"])
def test_kill_mid_publish_readers_see_old_never_mixed(spark, tmp_path, stage):
    """Crash the writer at every pre-commit protocol point: the reader
    must see EXACTLY the previous snapshot — old-or-new, never a mix —
    and a clean retry must land exactly the new snapshot."""
    path = str(tmp_path / "tbl")
    t = _base(spark, path)
    t.upsert(_df(spark, BASE), [F.col("ts").desc()])
    before = _rows(t)

    class Boom(RuntimeError):
        pass

    def die():
        raise Boom()

    crashing = _base(spark, path, hooks={stage: die})
    batch = _df(spark, [(2, "A", "a2-new", 1), (6, "D", "d1", 1)])
    with pytest.raises(Boom):
        crashing.upsert(batch, [F.col("ts").desc()])

    # old snapshot intact — version unchanged, rows exactly the old set
    # (a half-published batch would show a2-new XOR d1 here)
    assert t.current_version() == 0
    assert _rows(t) == before

    # retry on a healthy writer publishes the complete new snapshot
    t.upsert(batch, [F.col("ts").desc()])
    assert t.current_version() == 1
    assert _rows(t) == sorted(
        [(1, "A", "a1", 0), (2, "A", "a2-new", 1), (3, "B", "b1", 0),
         (4, "C", "c1", 0), (6, "D", "d1", 1)]
    )

    # crash orphans are invisible; gc removes them and changes nothing
    live_before_gc = _rows(t)
    stats = t.gc()
    assert _rows(t) == live_before_gc
    # every remaining data file is manifest-listed
    remaining = {
        os.path.relpath(f, os.path.join(path, "data"))
        for f in glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                           recursive=True)
    }
    live = {
        f for files in t.snapshot()["partitions"].values() for f in files
    }
    assert remaining == live
    assert stats["live_files"] == len(live)


def test_concurrent_commit_conflict_detected(spark, table):
    """A writer losing the version race raises ConcurrentWriteError and
    the winner's snapshot is what readers see."""
    winner = _base(spark, table.path)
    loser = _base(
        spark,
        table.path,
        hooks={
            # loser reaches its commit point after the winner committed
            "before_commit": lambda: winner.upsert(
                _df(spark, [(9, "A", "winner", 1)]), [F.col("ts").desc()]
            )
            if winner.current_version() == 0
            else None
        },
    )
    with pytest.raises(ConcurrentWriteError):
        loser.upsert(_df(spark, [(8, "A", "loser", 1)]), [F.col("ts").desc()])
    assert table.current_version() == 1
    assert (9, "A", "winner", 1) in _rows(table)
    assert all(r[2] != "loser" for r in _rows(table))
    # retry after re-reading the new snapshot succeeds
    loser2 = _base(spark, table.path)
    loser2.upsert(_df(spark, [(8, "A", "loser", 1)]), [F.col("ts").desc()])
    assert (8, "A", "loser", 1) in _rows(table)
    assert (9, "A", "winner", 1) in _rows(table)


def test_unpartitioned_roundtrip_and_last_write_wins(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "flat"), keys=["k"])
    df = spark.createDataFrame(
        [(1, "old", 0), (1, "new", 1), (2, "x", 0)], "k int, v string, ts int"
    )
    t.upsert(df, [F.col("ts").desc()])
    t.upsert(
        spark.createDataFrame([(2, "x2", 2)], "k int, v string, ts int"),
        [F.col("ts").desc()],
    )
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, "new"),
        (2, "x2"),
    ]
    assert t.current_version() == 1


def test_gc_retains_requested_history(spark, table):
    table.upsert(_df(spark, [(1, "A", "a1-v1", 1)]), [F.col("ts").desc()])
    table.upsert(_df(spark, [(1, "A", "a1-v2", 2)]), [F.col("ts").desc()])
    stats = table.gc(keep_versions=2)
    assert stats["removed_manifests"] == 1  # v0 expired, v1+v2 kept
    assert table._manifest(1) and table._manifest(2)
    # time travel to the retained parent still reads cleanly: its files
    # survived gc because keep_versions=2 retains them
    v1_files = [
        f"{table.path}/data/{f}"
        for fl in table._manifest(1)["partitions"].values()
        for f in fl
    ]
    assert all(os.path.exists(f) for f in v1_files)


def test_read_none_before_first_commit(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "nothing"), keys=["k"])
    assert t.read() is None and t.current_version() is None


def test_time_travel_reads_retained_versions(spark, table):
    table.upsert(_df(spark, [(2, "A", "a2-new", 1)]), [F.col("ts").desc()])
    v0 = sorted((r.k, r.v) for r in table.read(version=0).collect())
    v1 = sorted((r.k, r.v) for r in table.read(version=1).collect())
    assert (2, "a2") in v0 and (2, "a2-new") in v1
    assert [x for x in v0 if x[0] != 2] == [x for x in v1 if x[0] != 2]


def test_delete_keys_atomic_partition_scoped(spark, table):
    m_before = table.snapshot()
    doomed = spark.createDataFrame([(2,), (3,)], "k int")
    v = table.delete_keys(doomed)
    assert v == 1
    assert _rows(table) == sorted([(1, "A", "a1", 0), (4, "C", "c1", 0)])
    m_after = table.snapshot()
    # key 3 was partition B's only row: B dropped from the manifest
    assert "part=B" not in m_after["partitions"]
    # untouched partition C carried forward verbatim
    assert m_before["partitions"]["part=C"] == m_after["partitions"]["part=C"]
    # deleting absent keys is a no-op that keeps the current version
    assert table.delete_keys(spark.createDataFrame([(99,)], "k int")) == 1


def test_compact_merges_small_files_atomically(spark, tmp_path):
    t = _base(spark, str(tmp_path / "frag"))
    # a multi-task merge stages one file per (task, partition) — with
    # AQE partition coalescing off, the keep-latest shuffle keeps 8
    # tasks and each partition lands several files (the fragmentation a
    # long-running big-partition table accumulates)
    batch = _df(
        spark,
        [(i, "A", f"v{i}", i) for i in range(64)]
        + [(100 + i, "B", f"w{i}", i) for i in range(64)],
    )
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.upsert(batch, [F.col("ts").desc()])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    before = t.snapshot()
    assert len(before["partitions"]["part=A"]) >= 4
    rows_before = _rows(t)
    v = t.compact()
    assert v == before["version"] + 1
    after = t.snapshot()
    assert len(after["partitions"]["part=A"]) == 1
    assert len(after["partitions"]["part=B"]) == 1
    assert _rows(t) == rows_before
    # pre-compaction snapshot still time-travels until gc
    assert sorted((r.k, r.v) for r in t.read(version=before["version"]).collect()) == \
        sorted((r.k, r.v) for r in t.read().collect())
    # already-compacted table: no-op, same version
    assert t.compact() == v


def test_compact_unpartitioned(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "flatc"), keys=["k"])
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.upsert(
            spark.createDataFrame(
                [(i, i) for i in range(64)], "k int, v int"
            ),
            [F.col("v").desc()],
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    assert len(t.snapshot()["partitions"][""]) >= 3
    t.compact()
    assert len(t.snapshot()["partitions"][""]) == 1
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (i, i) for i in range(64)
    ]


def test_schema_evolution_across_snapshots(spark, table):
    """A widened batch (new column) upserts cleanly; untouched
    partitions' old-schema files read back with nulls (mergeSchema)."""
    widened = spark.createDataFrame(
        [(2, "A", "a2-new", 1, "eu")],
        "k int, part string, v string, ts int, region string",
    )
    table.upsert(widened, [F.col("ts").desc()])
    out = {r.k: (r.v, r.region) for r in table.read().collect()}
    assert out[2] == ("a2-new", "eu")
    assert out[4] == ("c1", None)  # untouched partition C, old schema


def test_batch_id_makes_upsert_exactly_once(spark, tmp_path):
    from stupp_exclusion_etl_spark.sinks.atomic import streaming_upsert_sink

    t = _base(spark, str(tmp_path / "stream"))
    sink = streaming_upsert_sink(t, [F.col("ts").desc()])
    sink(_df(spark, BASE), 0)
    sink(_df(spark, [(2, "A", "a2-new", 1)]), 1)
    v_after = t.current_version()
    rows_after = _rows(t)
    # replayed micro-batch (same id): no-op, same version, same rows
    sink(_df(spark, [(2, "A", "a2-new", 1)]), 1)
    assert t.current_version() == v_after and _rows(t) == rows_after
    # maintenance commits carry the marker forward: replay after
    # compaction is STILL recognized
    t.compact()
    sink(_df(spark, [(2, "A", "a2-REPLAY", 1)]), 1)
    assert (2, "A", "a2-new", 1) in _rows(t)
    assert all(r[2] != "a2-REPLAY" for r in _rows(t))
    # the next real batch applies
    sink(_df(spark, [(7, "B", "b7", 2)]), 2)
    assert (7, "B", "b7", 2) in _rows(t)
