"""Round-14 optimization internals: driver-literal LocalRelation
frames (_local_df), prepared key probes, and observed lifecycle
metrics must not change any committed state — only remove Spark jobs.

Why these exist: createDataFrame(list) parallelizes to a LogicalRDD,
so the commit protocol's key probe paid 4 jobs per literal-batch
commit (checkpoint + capped count) and every broadcast build over the
frame was a job. _local_df renders the batch as a SQL inline VALUES
table whose optimized plan IS a LocalRelation: probes and broadcast
builds collect driver-side, zero jobs (OPTIMIZATION_r14.md)."""

import math

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import (
    AtomicParquetTable,
    _local_df,
    _sql_literal,
)


def _njobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def test_local_df_is_local_relation_and_roundtrips(spark):
    rows = [
        ("plain", 1.5, 7),
        ("qu'ote \\ back\nslash", -0.1, -2),
        (None, float("nan"), 0),
        ("inf", float("inf"), 9),
        ("ninf", float("-inf"), 10),
        ("tiny", 5e-324, 11),
        ("none-val", None, None),
    ]
    ddl = "key string, val double, ts long"
    df = _local_df(spark, rows, ddl)
    assert (
        df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
        == "LocalRelation"
    )
    j0 = _njobs(spark)
    got = df.collect()
    assert _njobs(spark) - j0 == 0, "LocalRelation collect must be job-free"
    ref = spark.createDataFrame(rows, ddl).collect()
    assert df.schema == spark.createDataFrame(rows, ddl).schema
    for g, r in zip(got, ref):
        for gv, rv in zip(g, r):
            if isinstance(rv, float) and math.isnan(rv):
                assert math.isnan(gv)
            else:
                assert gv == rv


def test_local_df_arrays_and_ints(spark):
    rows = [(0, 1, [1.5, float("nan"), None], 7), (1, 0, [], 8)]
    ddl = "s int, c int, centroid array<double>, ts long"
    df = _local_df(spark, rows, ddl)
    assert (
        df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
        == "LocalRelation"
    )
    ref = spark.createDataFrame(rows, ddl)
    assert df.schema == ref.schema
    got, want = df.collect(), ref.collect()
    assert len(got) == len(want)
    for g, r in zip(got, want):
        assert g.s == r.s and g.c == r.c and g.ts == r.ts
        assert len(g.centroid) == len(r.centroid)
        for gv, rv in zip(g.centroid, r.centroid):
            if rv is not None and math.isnan(rv):
                assert math.isnan(gv)
            else:
                assert gv == rv


def test_local_df_falls_back_on_unrenderable(spark):
    import datetime

    # timestamps are deliberately not rendered (session-tz semantics)
    rows = [(datetime.datetime(2030, 1, 2, 3, 4, 5),)]
    df = _local_df(spark, rows, "t timestamp")
    assert df.collect()[0][0] == rows[0][0]
    # and the empty batch falls back too (VALUES cannot be empty)
    assert _local_df(spark, [], "x int").count() == 0


def test_sql_literal_unsupported_types_return_none():
    assert _sql_literal(object(), "struct<a:int>") is None
    assert _sql_literal([1.0], "map<int,int>") is None


def test_commit_with_local_df_equals_createdataframe(spark, tmp_path):
    rows1 = [("a", 1.0, 0), ("b", 2.0, 0)]
    rows2 = [("b", 9.0, 1), ("c", 3.0, 1)]
    ddl = "key string, val double, ts long"
    ta = AtomicParquetTable(spark, str(tmp_path / "ta"), keys=["key"])
    tb = AtomicParquetTable(spark, str(tmp_path / "tb"), keys=["key"])
    for t, mk in ((ta, lambda r: _local_df(spark, r, ddl)),
                  (tb, lambda r: spark.createDataFrame(r, ddl))):
        t.upsert(mk(rows1), [F.col("ts").desc()])
        t.upsert(mk(rows2), [F.col("ts").desc()])
    a = sorted(tuple(r) for r in ta.read().collect())
    b = sorted(tuple(r) for r in tb.read().collect())
    assert a == b == [("a", 1.0, 0), ("b", 9.0, 1), ("c", 3.0, 1)]


def test_prepared_probe_upsert_and_delete_match_default(spark, tmp_path):
    ddl = "k long, v double, ts long"
    base = [(i, float(i), 0) for i in range(40)]
    batch = [(i, i * 10.0, 1) for i in (3, 7, 41)]
    doomed = [(5,), (9,), (99,)]

    ta = AtomicParquetTable(spark, str(tmp_path / "pa"), keys=["k"])
    tb = AtomicParquetTable(spark, str(tmp_path / "pb"), keys=["k"])
    for t in (ta, tb):
        t.upsert(spark.createDataFrame(base, ddl), [F.col("ts").desc()])
    bdf_a = spark.createDataFrame(batch, ddl)
    bdf_b = spark.createDataFrame(batch, ddl)
    ta.upsert(bdf_a, [F.col("ts").desc()])
    tb.upsert(
        bdf_b, [F.col("ts").desc()],
        _probe=(bdf_b.select("k"), True),
    )
    ta.delete_keys(spark.createDataFrame(doomed, "k long"))
    dd = spark.createDataFrame(doomed, "k long")
    tb.delete_keys(dd, _probe=(dd, True))
    a = sorted(tuple(r) for r in ta.read().collect())
    b = sorted(tuple(r) for r in tb.read().collect())
    assert a == b
    assert (41, 410.0, 1) in a and all(r[0] not in (5, 9) for r in a)


def test_build_observed_quality_matches_quality_scan(spark, tmp_path):
    """build() now derives baseline_quality from the upsert's own
    write pass (observed avg(cent_cos)); it must agree with the
    post-commit quality() scan to float tolerance."""
    from stupp_exclusion_etl_spark.operators.ann_index import (
        PersistedIvfIndex,
    )

    rows = [
        (i, [float((i % 4) + 1), float(i % 7), 1.0]) for i in range(60)
    ]
    corpus = AtomicParquetTable(spark, str(tmp_path / "c"), keys=["vec_id"])
    corpus.upsert(
        spark.createDataFrame(
            [(i, v, 0) for i, v in rows],
            "vec_id long, embedding array<float>, ts long",
        ),
        [F.col("ts").desc()],
    )
    idx = PersistedIvfIndex(
        spark, str(tmp_path / "c"), str(tmp_path / "i"),
        k_cells=4, n_probe=2, trainer="modmean",
    )
    info = idx.build()
    assert info["baseline_quality"] == pytest.approx(
        idx.quality(), abs=1e-9
    )
