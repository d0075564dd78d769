"""The connector surface composed end-to-end: custom streaming source →
Structured Streaming aggregation → custom keyed upsert sink via
foreachBatch. Proves the pieces interoperate, not just pass their own
tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

EVENTS = f"{SF_SMALL}/events.parquet"


def test_replay_stream_through_keyed_sink(spark, tmp_path):
    from stupp_exclusion_etl_spark.sinks.keyed_sink import (
        register_keyed_upsert_sink,
    )
    from stupp_exclusion_etl_spark.sources.replay_stream import (
        register_replay_stream,
    )

    register_replay_stream(spark)
    register_keyed_upsert_sink(spark)
    sink_dir = str(tmp_path / "agg_table")

    stream = (
        spark.readStream.format("events_replay")
        .option("path", EVENTS)
        .option("rows_per_batch", "400")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_v")
    )

    def upsert(batch_df, _batch_id):
        # complete-mode batches carry the FULL aggregate each time;
        # last-write-wins per key converges to the final answer
        batch_df.coalesce(1).write.format("keyed_upsert").option(
            "path", sink_dir
        ).option("key", "event_type").mode("append").save()

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.read.parquet(os.path.join(sink_dir, "data.parquet"))
    got = {r.ID: (r.n, r.sum_v) for r in final.collect()}
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
    assert len(got) >= 2
