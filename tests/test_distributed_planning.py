"""Distributed manifest planning (VERDICT r12 task #4): past
``spark_planning_chunks`` live chunks, read planning assembles and
filters snapshot entries with a Spark job over the chunk files
instead of the driver thread pool, keeping driver allocation
O(matching files) instead of O(table).

Pinned contracts:
- parity: the distributed path returns exactly the entries the
  in-driver path keeps, post-prune, on range / point / bloom-less
  predicates, and identical file-name sets unpredicated;
- end-to-end: real reads (predicated and not) through the forced
  distributed path return oracle-identical rows;
- scale: planning a point probe over a ≥1M-entry synthetic snapshot
  allocates a small fraction of what the in-driver full assembly
  allocates, and returns the single matching entry.
"""

from __future__ import annotations

import tracemalloc

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable


def _synth_table(spark, path: str, n_files: int, chunk_target: int):
    """A committed snapshot whose entries are SYNTHETIC (no data
    files): k is cluster-ordered (tight per-chunk ranges, so a k
    probe prunes at the chunk level), u is a pseudo-shuffled point
    stat per file (chunk u-ranges span everything, so a u probe
    admits every chunk — the shape that forces wide planning)."""
    t = AtomicParquetTable(spark, path, keys=["k"], cluster_by=["k"])
    t.chunk_target = chunk_target
    files = [f"f-{i:07d}.parquet" for i in range(n_files)]
    pool_parts = {"": files}
    pool_stats = {
        f: {
            "rows": 100,
            "cols": {
                "k": {"t": "i", "min": i * 100, "max": i * 100 + 99,
                      "nulls": 0},
                "u": {"t": "i", "min": (i * 7919) % n_files,
                      "max": (i * 7919) % n_files, "nulls": 0},
            },
        }
        for i, f in enumerate(files)
    }
    entries = t._write_chunks(pool_parts, pool_stats)
    t._publish_record(None, None, "k bigint, u bigint, v double", entries)
    return t


def _fresh(spark, path: str, threshold: int) -> AtomicParquetTable:
    t = AtomicParquetTable(spark, path, keys=["k"], cluster_by=["k"])
    t.spark_planning_chunks = threshold
    return t


def test_parity_driver_vs_spark_paths(spark, tmp_path):
    path = str(tmp_path / "t")
    _synth_table(spark, path, n_files=5000, chunk_target=50)
    drv = _fresh(spark, path, threshold=10**9)
    dst = _fresh(spark, path, threshold=1)

    for where in (
        [("k", ">=", 123400), ("k", "<", 123700)],
        [("k", "=", 777)],
        [("u", "=", 4321)],
        [("k", ">=", 0)],  # matches everything: worst case
    ):
        man_d = drv._manifest_where(0, where)
        man_s = dst._manifest_where(0, where)
        rel_d = [f for fl in man_d["partitions"].values() for f in fl]
        rel_s = [f for fl in man_s["partitions"].values() for f in fl]
        kept_d = sorted(drv._prune_files(man_d, rel_d, where))
        kept_s = sorted(dst._prune_files(man_s, rel_s, where))
        assert kept_d == kept_s, where
        # the distributed path already filtered: it returned exactly
        # the survivors, with their stats
        assert sorted(rel_s) == kept_s, where
        assert all(f in man_s["stats"] for f in kept_s), where
    # the range probe keeps exactly the 3 covering files
    man = dst._manifest_where(
        0, [("k", ">=", 123400), ("k", "<", 123700)]
    )
    assert sorted(
        f for fl in man["partitions"].values() for f in fl
    ) == [f"f-{i:07d}.parquet" for i in (1234, 1235, 1236)]
    # the point probe on the shuffled column keeps exactly one file
    man_u = dst._manifest_where(0, [("u", "=", 4321)])
    assert sum(len(fl) for fl in man_u["partitions"].values()) == 1

    # unpredicated: identical file-name sets; the slim variant drops
    # the stats payload entirely
    full = drv._manifest(0)
    slim = dst._manifest_for_read(0)
    assert slim["partitions"] == full["partitions"]
    assert slim["stats"] == {}
    assert len(full["stats"]) == 5000


def test_end_to_end_reads_through_distributed_path(spark, tmp_path):
    """Real data files, forced-distributed planning: predicated and
    unpredicated reads return exactly what the driver-planned table
    returns."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "b"), keys=["k"], bucket_by=16
    )
    t.chunk_target = 2  # 16 bucket files -> 8 chunks
    t.upsert(
        spark.createDataFrame(
            [(k, float(k)) for k in range(300)], "k long, v double"
        ),
        [F.col("v").desc()],
    )
    t.spark_planning_chunks = 1  # force the Spark planning path
    assert t._manifest_light(0)["format"] == 2
    assert len(t._manifest_light(0)["chunks"]) >= 4

    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(k, float(k)) for k in range(300)}
    assert [
        (r.k, r.v) for r in t.read(where=[("k", "=", 123)]).collect()
    ] == [(123, 123.0)]
    assert sorted(
        r.k for r in t.read(where=[("k", "in", [5, 250])]).collect()
    ) == [5, 250]
    assert t.read(where=[("k", "=", 99999)]).count() == 0


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_million_entry_planning_bounded_driver_alloc(spark, tmp_path):
    """≥1M synthetic entries (VERDICT done-criterion): a point probe
    through the distributed path succeeds, returns the single
    matching entry, and allocates a small fraction of the in-driver
    full assembly; the unpredicated slim assembly likewise undercuts
    the stats-bearing one."""
    n = 1_000_000
    path = str(tmp_path / "m")
    _synth_table(spark, path, n_files=n, chunk_target=4096)

    # the u probe admits EVERY chunk (shuffled point stats), so the
    # in-driver path must assemble the full 1M-entry snapshot while
    # the distributed path returns one row
    where = [("u", "=", 123457)]

    dst = _fresh(spark, path, threshold=1)
    tracemalloc.start()
    man_s = dst._manifest_where(0, where)
    spark_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert sum(len(fl) for fl in man_s["partitions"].values()) == 1

    drv = _fresh(spark, path, threshold=10**9)
    tracemalloc.start()
    man_d = drv._manifest_where(0, where)
    driver_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    rel_d = [f for fl in man_d["partitions"].values() for f in fl]
    assert sorted(drv._prune_files(man_d, rel_d, where)) == sorted(
        f for fl in man_s["partitions"].values() for f in fl
    )

    # the distributed probe's driver allocation is a small fraction
    # of the O(table) assembly (typically ~100x less; 4x is the
    # loose, non-flaky bound)
    assert spark_peak * 4 < driver_peak, (spark_peak, driver_peak)

    # unpredicated: slim (names-only) vs full (stats-bearing)
    dst2 = _fresh(spark, path, threshold=1)
    tracemalloc.start()
    slim = dst2._manifest_for_read(0)
    slim_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert sum(len(fl) for fl in slim["partitions"].values()) == n
    drv2 = _fresh(spark, path, threshold=10**9)
    tracemalloc.start()
    full = drv2._manifest(0)
    full_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert len(full["stats"]) == n
    assert slim_peak * 2 < full_peak, (slim_peak, full_peak)


def test_qualify_uri_resolves_schemeless_paths(spark, tmp_path):
    """ADVICE r13 (low): scheme-less table paths must reach the
    executor-side chunk reads resolved through the SAME filesystem
    the driver metadata path uses (fs.defaultFS) — _qualify_uri turns
    a bare local path into a file: URI the no-gateway executor reader
    understands, passes qualified URIs through untouched, and the
    distributed path keeps working on a scheme-less table root."""
    from stupp_exclusion_etl_spark.sinks.atomic import (
        _qualify_uri,
        _read_bytes_executor,
    )

    p = str(tmp_path / "q.bin")
    with open(p, "wb") as fh:
        fh.write(b"qualified")
    q = _qualify_uri(spark, p)
    assert q.startswith("file:"), q
    assert _read_bytes_executor(q) == b"qualified"
    assert _qualify_uri(spark, q) == q
    assert _qualify_uri(spark, "s3://bkt/tbl") == "s3://bkt/tbl"

    # end-to-end: a scheme-less root through the forced distributed
    # planning path still plans and reads
    _synth_table(spark, str(tmp_path / "t"), 64, 8)
    t2 = _fresh(spark, str(tmp_path / "t"), 1)
    man = t2._manifest_where(0, [("k", ">=", 0)])
    assert sum(len(v) for v in man["partitions"].values()) == 64
