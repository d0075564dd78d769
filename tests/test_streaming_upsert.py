"""Streaming ingest through the keyed upsert sink (A14 × A15 × B14):
``writeStream.foreachBatch`` applies each micro-batch via
``upsert_parquet`` — the reference's scrape→batch→batch_write_item loop
(reference __main__.py:50-66) as a continuous pipeline. Last-write-wins
across micro-batches lands on the same keep-latest semantics the batch
sink has, and the partitioned path keeps rewrites partition-scoped per
batch."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.upsert import upsert_parquet


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "id long, status string, version long")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_foreach_batch_upsert(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")

    _write_batch(spark, src, [(1, "pending", 1), (2, "pending", 1)])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    def sink(batch_df, batch_id):
        upsert_parquet(
            batch_df, target, keys=["id"], order_by=[F.col("version").desc()]
        )

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        got = {r.id: (r.status, r.version) for r in spark.read.parquet(target).collect()}
        assert got == {1: ("pending", 1), 2: ("pending", 1)}, got

        # micro-batch 2: update key 1, insert key 3 — upsert, not append
        _write_batch(spark, src, [(1, "granted", 2), (3, "pending", 1)])
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r.id: (r.status, r.version)
                for r in spark.read.parquet(target).collect()
            }
            if 3 in got:
                break
            time.sleep(1)
        assert got == {
            1: ("granted", 2),
            2: ("pending", 1),
            3: ("pending", 1),
        }, got

        # a stale replay (version 1 for key 1) must NOT regress the row;
        # key 4 rides along as the batch-processed marker
        _write_batch(spark, src, [(1, "pending", 1), (4, "pending", 1)])
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r.id: (r.status, r.version)
                for r in spark.read.parquet(target).collect()
            }
            if 4 in got:
                break
            time.sleep(1)
        assert got[1] == ("granted", 2), got
    finally:
        q.stop()
