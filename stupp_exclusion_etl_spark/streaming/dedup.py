"""Streaming exact-dedup runner (SURVEY.md §2 B9 × B14).

The reference's keyed upsert (A15, reference __main__.py:8-24) is
last-write-wins dedup at the sink; the streaming analog is
``dropDuplicatesWithinWatermark`` — at-least-once deliveries collapse
to exactly-once rows while the watermark bounds dedup state to the
horizon, which is what keeps it runnable forever at 100 TB/day (state
tracks the watermark window, not stream history). Eviction-and-readmit
semantics are pinned in tests/test_streaming_dedup.py; this module
runs the bounded-input variant whose final output is value-checkable
against batch DISTINCT.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.streaming.windows import events_stream


def run_dedup_stream(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "3650 days",
    timeout_sec: int = 120,
) -> DataFrame:
    """Replay the events stream at-least-twice (self-union — every
    event is delivered 2×, the at-least-once failure mode) and dedup by
    event_id with ``dropDuplicatesWithinWatermark`` across real
    micro-batches. The watermark delay exceeds the bounded table's
    time span, so no state is evicted mid-run and the memory-sink
    output equals batch ``SELECT DISTINCT`` — full oracle check on a
    true streaming execution. Production sets the delay to the actual
    replay horizon (e.g. '2 hours') so state stays bounded."""
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    replayed = events_stream(spark, sf_dir).union(events_stream(spark, sf_dir))
    deduped = (
        replayed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
