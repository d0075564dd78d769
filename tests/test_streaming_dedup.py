"""Streaming dedup (B9 × B14): ``dropDuplicatesWithinWatermark`` over a
real file-source micro-batch stream — the streaming half of the exact-
dedup story (operators/dedup.py is the batch half). An ingest pipeline
receiving at-least-once deliveries dedups by event id while the
watermark bounds the dedup state (the property that makes it runnable
forever at 100 TB/day: state size tracks the watermark horizon, not the
stream's history).

Pinned behaviors, demonstrated across real micro-batches:
1. a duplicate id arriving within the watermark horizon is dropped;
2. once the watermark passes id's-event-time + delay, its state is
   evicted, so a much-later replay of the same id is re-admitted —
   "within watermark" is a bounded guarantee, not global-history dedup.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "id long, ts string, value double").select(
        "id", F.col("ts").cast("timestamp"), "value"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, q, sink, want, deadline_s=60):
    """processAllAvailable until the memory sink holds `want` rows of
    interest (file source lists new files on the next trigger)."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        q.processAllAvailable()
        rows = spark.table(sink).collect()
        if want(rows):
            return rows
        time.sleep(1)
    return spark.table(sink).collect()


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    sink = f"dd_{uuid.uuid4().hex[:8]}"

    # batch 1: id=1 delivered twice inside one batch + id=2 once.
    _write_batch(
        spark,
        src,
        [
            (1, "2026-01-01 10:00:00", 1.0),
            (1, "2026-01-01 10:00:30", 1.0),  # dup, same batch
            (2, "2026-01-01 10:01:00", 1.0),
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(r.id for r in spark.table(sink).collect())
        assert ids == [1, 2], ids

        # batch 2: id=1 replayed within the watermark horizon → dropped;
        # id=3 is new → emitted.
        _write_batch(
            spark,
            src,
            [
                (1, "2026-01-01 10:02:00", 1.0),  # dup within horizon
                (3, "2026-01-01 10:03:00", 1.0),
            ],
        )
        rows = _drain(spark, q, sink, lambda rs: any(r.id == 3 for r in rs))
        ids = sorted(r.id for r in rows)
        assert ids == [1, 2, 3], ids

        # batch 3: an event far ahead advances the watermark past
        # 10:00 + 10min, evicting id=1's dedup state...
        _write_batch(spark, src, [(4, "2026-01-01 10:30:00", 1.0)])
        rows = _drain(spark, q, sink, lambda rs: any(r.id == 4 for r in rs))
        assert sorted(r.id for r in rows) == [1, 2, 3, 4]

        # ...so batch 4's replay of id=1 (fresh event time, ahead of
        # the watermark) is RE-ADMITTED: bounded-state dedup, by design.
        _write_batch(spark, src, [(1, "2026-01-01 10:31:00", 1.0)])
        rows = _drain(
            spark, q, sink, lambda rs: sum(1 for r in rs if r.id == 1) == 2
        )
        assert sorted(r.id for r in rows) == [1, 1, 2, 3, 4]
    finally:
        q.stop()
