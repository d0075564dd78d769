"""Round-trip tests for the interchange format adapters: every format
must reproduce the parquet original bit-for-bit under an explicit
schema (B1/A1 source surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.sources.formats import FORMATS, read_table, write_table
from tests.conftest import SF_SMALL


@pytest.mark.parametrize("fmt", FORMATS)
def test_round_trip(spark, tmp_path, fmt):
    src = table(spark, SF_SMALL, "orders")
    path = str(tmp_path / fmt)
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_gets_pushdown(spark, tmp_path):
    """ORC scans get the same predicate pushdown as parquet."""
    src = table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orc_pd")
    write_table(src, path, "orc")
    scan = read_table(spark, path, "orc", src.schema).filter(
        F.col("o_orderkey") == 42
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan


def test_binary_file_source_reads_real_images(spark, tmp_path):
    """binaryFile source → Catalyst header parse: a directory of real
    PNG files (plus a decoy .txt the glob must skip) lands as payload
    rows with parsed geometry."""
    from stupp_exclusion_etl_spark.operators.multimodal import parse_image_meta
    from stupp_exclusion_etl_spark.sources.formats import read_binary_files
    from tests.test_multimodal import _real_png

    for i in range(1, 4):
        (tmp_path / f"img_{i}.png").write_bytes(_real_png(i * 10, i * 20))
    (tmp_path / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(tmp_path), glob="*.png")
    got = {
        r.name: (r.m.fmt, r.m.width, r.m.height, r.length)
        for r in df.select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            "length",
            parse_image_meta(F.col("content")).alias("m"),
        ).collect()
    }
    assert got == {
        f"img_{i}.png": ("png", i * 10, i * 20, 33) for i in range(1, 4)
    }


def test_quarantine_split_two_sinks_one_scan(spark, tmp_path):
    """Dead-letter pattern: one tagged pass splits clean rows from
    rejects (with reasons); both sides written, counts reconcile, and
    every reject carries a non-ok reason."""
    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.sources.ingest import quarantine_split

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("name"),
        (F.col("id") % 7 - 3).alias("qty"),
    )
    reason = (
        F.when(F.col("name").isNull(), F.lit("missing_name"))
        .when(F.col("qty") < 0, F.lit("negative_qty"))
        .otherwise(F.lit("ok"))
    )
    # Snapshot pre-existing pinned RDDs: earlier tests' localCheckpoint
    # blocks linger until the async ContextCleaner collects them, so an
    # absolute "storage is empty" assertion is order/GC-flaky. The
    # contract under test is only that the split releases ITS cache.
    sc = df.sparkSession.sparkContext._jsc.sc()
    before = {info.id() for info in sc.getRDDStorageInfo()}
    with quarantine_split(df, reason) as (clean, rejects):
        clean.write.mode("overwrite").parquet(str(tmp_path / "clean"))
        rejects.write.mode("overwrite").parquet(str(tmp_path / "rejects"))
    # context exit released the tagged cache — no NEW block left pinned
    after = {info.id() for info in sc.getRDDStorageInfo()}
    assert after <= before

    c = spark.read.parquet(str(tmp_path / "clean"))
    r = spark.read.parquet(str(tmp_path / "rejects"))
    assert c.count() + r.count() == 100
    assert "__reason" not in c.columns
    reasons = {x["__reason"] for x in r.select("__reason").distinct().collect()}
    assert reasons == {"missing_name", "negative_qty"}
    # nulls on ids 0,10..90 (10 rows); negative qty on remaining ids
    # with id%7 in {0,1,2} → reconcile exact counts
    assert r.filter(F.col("__reason") == "missing_name").count() == 10
