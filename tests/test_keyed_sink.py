"""Keyed micro-batched upsert sink connector (sinks/keyed_sink.py):
chunking, ID copy, last-write-wins, auto-create + append upsert,
atomic publish, A20 batch counters."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def sink(spark, tmp_path):
    from stupp_exclusion_etl_spark.sinks.keyed_sink import (
        register_keyed_upsert_sink,
    )

    register_keyed_upsert_sink(spark)
    return str(tmp_path / "keyed_table")


def _read(spark, path):
    return spark.read.parquet(os.path.join(path, "data.parquet"))


def test_first_write_autocreates_with_id_copy_and_batches(spark, sink):
    df = spark.range(0, 53).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    df.write.format("keyed_upsert").option("path", sink).option(
        "key", "k"
    ).mode("append").save()
    out = _read(spark, sink)
    assert out.count() == 53
    rows = {r.ID: (r.k, r.v) for r in out.collect()}
    assert rows["7"] == (7, 14)  # canonical ID copy (stringified key)
    meta = json.load(open(os.path.join(sink, "_meta.json")))
    # A14: 53 rows in one task = 2 full 20-row flushes + tail flush
    assert meta["n_batches"] == 3 and meta["n_rows"] == 53
    # staging cleaned up after publish
    assert not [d for d in os.listdir(sink) if d.startswith("_staging_")]


def test_last_write_wins_within_a_job(spark, sink):
    df = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (1, "mid"), (1, "new")], "k int, v string"
    ).coalesce(1)
    df.write.format("keyed_upsert").option("path", sink).option(
        "key", "k"
    ).mode("append").save()
    rows = {r.ID: r.v for r in _read(spark, sink).collect()}
    assert rows == {"1": "new", "2": "keep"}


def test_append_run_upserts_over_existing(spark, sink):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).coalesce(1)
    base.write.format("keyed_upsert").option("path", sink).option(
        "key", "k"
    ).mode("append").save()
    update = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k int, v string"
    ).coalesce(1)
    update.write.format("keyed_upsert").option("path", sink).option(
        "key", "k"
    ).mode("append").save()
    rows = {r.ID: r.v for r in _read(spark, sink).collect()}
    assert rows == {"1": "a", "2": "B2", "3": "c", "4": "d"}
    # idempotent replay: same update again, same table
    update.write.format("keyed_upsert").option("path", sink).option(
        "key", "k"
    ).mode("append").save()
    assert {r.ID: r.v for r in _read(spark, sink).collect()} == rows


def test_overwrite_mode_replaces_table(spark, sink):
    spark.createDataFrame([(1, "a")], "k int, v string").write.format(
        "keyed_upsert"
    ).option("path", sink).option("key", "k").mode("append").save()
    spark.createDataFrame([(9, "z")], "k int, v string").write.format(
        "keyed_upsert"
    ).option("path", sink).option("key", "k").mode("overwrite").save()
    assert {r.ID: r.v for r in _read(spark, sink).collect()} == {"9": "z"}


def test_writer_chunking_unit(tmp_path):
    """White-box: write() flushes every batch_size rows + tail."""
    from pyspark.sql.types import LongType, StructField, StructType

    from stupp_exclusion_etl_spark.sinks.keyed_sink import KeyedUpsertWriter

    schema = StructType([StructField("k", LongType())])
    w = KeyedUpsertWriter(
        {"path": str(tmp_path), "key": "k", "batch_size": 4}, schema, False
    )
    msg = w.write(iter([(i,) for i in range(10)]))
    assert (msg.n_rows, msg.n_batches) == (10, 3)  # 4+4+2
    import pyarrow.parquet as pq

    sizes = sorted(pq.read_table(f).num_rows for f in msg.files)
    assert sizes == [2, 4, 4]
    w.abort([msg])
    assert not os.path.exists(w.staging)


def _writer(path, tmp_ok=True):
    from pyspark.sql.types import LongType, StructField, StructType

    from stupp_exclusion_etl_spark.sinks.keyed_sink import KeyedUpsertWriter

    schema = StructType([StructField("k", LongType())])
    return KeyedUpsertWriter({"path": path, "key": "k"}, schema, False)


def test_file_uri_normalizes_to_local_path(spark, sink):
    """file:///abs end-to-end: staged+published under /abs, not ./file:."""
    df = spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1)
    df.write.format("keyed_upsert").option("path", "file://" + sink).option(
        "key", "k"
    ).mode("append").save()
    assert {r.ID: r.v for r in _read(spark, sink).collect()} == {"1": "a"}
    # nothing misplaced into a literal './file:' directory
    assert not os.path.exists(os.path.join(os.getcwd(), "file:"))


def test_file_uri_localhost_any_case_accepted(tmp_path):
    """URI hosts are case-insensitive: LOCALHOST == localhost (ADVICE r5)."""
    for host in ("localhost", "LOCALHOST", "LocalHost"):
        w = _writer(f"file://{host}{tmp_path}")
        assert w.path == str(tmp_path)


def test_file_uri_remote_host_rejected(tmp_path):
    with pytest.raises(ValueError, match="remote host"):
        _writer(f"file://nfs-server{tmp_path}")


def test_file_uri_query_fragment_rejected(tmp_path):
    """POSIX-legal '#'/'?' path chars must not be silently truncated
    into a different directory (ADVICE r5)."""
    for bad in (f"file://{tmp_path}/run#1", f"file://{tmp_path}/run?x=1"):
        with pytest.raises(ValueError, match="query/fragment"):
            _writer(bad)
    # percent-encoded forms ARE the path, and decode back
    w = _writer(f"file://{tmp_path}/run%231")
    assert w.path == f"{tmp_path}/run#1"


def test_file_uri_relative_and_remote_scheme_rejected(tmp_path):
    with pytest.raises(ValueError, match="malformed"):
        _writer("file:relative/dir")
    with pytest.raises(ValueError, match="remote URIs"):
        _writer("s3://bucket/x")


def test_compact_missing_table_raises_descriptive(spark, tmp_path):
    """compact_parquet on an absent root: clean FileNotFoundError, not a
    raw Py4JJavaError (ADVICE r4 item 2)."""
    from stupp_exclusion_etl_spark.sinks.upsert import compact_parquet

    with pytest.raises(FileNotFoundError, match="does not exist"):
        compact_parquet(spark, str(tmp_path / "never_written"))
