"""Streaming CDC source over the atomic table
(sources/changes_stream.py): version offsets, per-commit micro-batch
diffs, deterministic replay, checkpoint-restart resume without
re-serving, and compaction-invisibility — the streaming twin of the
`changes` API contract (tests/test_change_feed.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable
from stupp_exclusion_etl_spark.sources.changes_stream import (
    AtomicChangesStreamReader,
    register_changes_stream,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v double, s string, ts int")


@pytest.fixture()
def table(spark, tmp_path):
    t = AtomicParquetTable(
        spark, str(tmp_path / "cdc"), keys=["k"],
        cluster_by=["k"], cluster_files=2,
    )
    t.upsert(
        _mk(spark, [(k, float(k), "a", 0) for k in range(50)]),
        [F.col("ts").desc()],
    )
    return t


def _reader(table):
    return AtomicChangesStreamReader({"path": table.path, "keys": "k"})


def test_offsets_and_diff_unit(spark, table):
    r = _reader(table)
    off0 = r.initialOffset()
    assert off0 == {"version": 0}
    rows, off = r.read(off0)
    assert list(rows) == [] and off == off0  # caught up: empty batch
    table.upsert(
        _mk(spark, [(5, -5.0, "upd", 1), (500, 0.0, "new", 1)]),
        [F.col("ts").desc()],
    )
    table.delete_keys(spark.createDataFrame([(7,)], "k int"))
    rows, off1 = r.read(off0)
    rows = list(rows)
    assert rows == [
        (5, -5.0, "upd", 1, "update"),
        (7, 7.0, "a", 0, "delete"),
        (500, 0.0, "new", 1, "insert"),
    ]
    assert off1 == {"version": table.current_version()}
    # failure-recovery replay: manifests are immutable ⇒ bit-identical
    assert list(r.readBetweenOffsets(off0, off1)) == rows


def test_compaction_emits_no_changes(spark, table):
    r = _reader(table)
    off0 = r.initialOffset()
    for i in range(3):
        table.upsert(
            _mk(spark, [(i, -float(i), "x", 1)]), [F.col("ts").desc()]
        )
    rows, off1 = r.read(off0)
    n_sem = len(list(rows))
    v = table.compact(target_bytes_per_file=1 << 30)
    if v != off1["version"]:
        rows2, off2 = r.read(off1)
        assert list(rows2) == [], "compaction must not appear in the feed"
        assert off2 == {"version": v}
    assert n_sem == 3


def test_schema_evolution_in_stream_diff(spark, table):
    """A widened batch (new column) flows through the driver-side diff:
    the reader built AFTER the widening sees the union schema, old-file
    rows align with None for the new column, and the changed rows carry
    their new values."""
    table.upsert(
        spark.createDataFrame(
            [(3, -3.0, "w", 1, "extra")],
            "k int, v double, s string, ts int, note string",
        ),
        [F.col("ts").desc()],
    )
    r = _reader(table)  # constructed at the widened schema
    assert r.cols[-1] == "note"
    rows = list(r.readBetweenOffsets({"version": 0}, {"version": 1}))
    assert rows == [(3, -3.0, "w", 1, "extra", "update")]


def test_streaming_end_to_end_and_restart(spark, table, tmp_path):
    register_changes_stream(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_batch():
        stream = (
            spark.readStream.format("atomic_changes")
            .option("path", table.path)
            .option("keys", "k")
            .option("from_version", "0")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    table.upsert(
        _mk(spark, [(5, -5.0, "u1", 1)]), [F.col("ts").desc()]
    )
    run_batch()
    got1 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got1 == [(5, -5.0, "u1", 1, "update")]

    # restart from checkpoint: only the NEW commit's changes arrive —
    # the already-served version range is never re-served
    table.upsert(
        _mk(spark, [(6, -6.0, "u2", 2)]), [F.col("ts").desc()]
    )
    run_batch()
    got2 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got2 == [
        (5, -5.0, "u1", 1, "update"),
        (6, -6.0, "u2", 2, "update"),
    ]
