"""Streaming source connector (sources/replay_stream.py): offset
slicing, micro-batch sizing, end-to-end streaming agg, and
checkpoint-recovery resume without duplication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

EVENTS = f"{SF_SMALL}/events.parquet"


def _n_events():
    import pyarrow.parquet as pq

    return pq.ParquetFile(EVENTS).metadata.num_rows


def test_reader_offset_slices_unit():
    from stupp_exclusion_etl_spark.sources.replay_stream import (
        EventsReplayStreamReader,
    )

    r = EventsReplayStreamReader({"path": EVENTS, "rows_per_batch": 700})
    assert r.initialOffset() == {"row": 0}
    n = _n_events()
    rows1, end1 = r.read({"row": 0})
    rows1 = list(rows1)
    assert len(rows1) == 700 and end1 == {"row": 700}
    # event_id order makes offsets deterministic
    assert [t[0] for t in rows1[:3]] == [0, 1, 2]
    rows2, end2 = r.read(end1)
    assert len(list(rows2)) == min(700, n - 700)
    # replay between offsets reproduces the exact batch
    again = list(r.readBetweenOffsets({"row": 0}, {"row": 700}))
    assert [t[0] for t in again] == [t[0] for t in rows1]
    # caught up: empty batch, offset unchanged
    tail, end3 = r.read({"row": n})
    assert list(tail) == [] and end3 == {"row": n}


@pytest.fixture()
def replay(spark):
    from stupp_exclusion_etl_spark.sources.replay_stream import (
        register_replay_stream,
    )

    register_replay_stream(spark)
    return spark


def test_stream_counts_match_batch(replay, tmp_path):
    spark = replay
    stream = (
        spark.readStream.format("events_replay")
        .option("path", EVENTS)
        .option("rows_per_batch", "900")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("replay_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.event_type: (r.n, r.sum_v)
        for r in spark.sql("SELECT * FROM replay_agg").collect()
    }
    want = {
        r.event_type: (r.n, r.sum_v)
        for r in spark.read.parquet(EVENTS)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .collect()
    }
    assert got == want


def test_restart_resumes_from_checkpoint_without_duplication(replay, tmp_path):
    """Each availableNow run over the SAME checkpoint ingests exactly
    the next 800-row slice (the simple-reader wrapper prefetches one
    batch per start) — successive restarts walk the offset forward with
    zero re-serves, and a run after catch-up appends nothing."""
    spark = replay
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")

    def run_once():
        stream = (
            spark.readStream.format("events_replay")
            .option("path", EVENTS)
            .option("rows_per_batch", "800")
            .load()
        )
        q = (
            stream.select("event_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out).count()

    n = _n_events()
    counts = [run_once() for _ in range(3)]  # 800, 1000, 1000
    assert counts[0] == 800
    assert counts[1] == n  # restart resumed at row 800, not 0
    assert counts[2] == n  # caught up: nothing re-served
    ids = spark.read.parquet(out).select("event_id").distinct().count()
    assert ids == n  # no duplicates anywhere
