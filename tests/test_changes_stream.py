"""Streaming CDC source over the atomic table
(sources/changes_stream.py): version offsets, per-commit micro-batch
diffs, deterministic replay, checkpoint-restart resume without
re-serving, compaction-invisibility — the streaming twin of the
`changes` API contract (tests/test_change_feed.py) — plus the
partition-planning proofs: the driver plans key-range-disjoint file
groups from manifest stats only, and change rows are produced INSIDE
Spark tasks (TaskContext present), never through the driver."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable
from stupp_exclusion_etl_spark.sources.changes_stream import (
    AtomicChangesDataSource,
    AtomicChangesStreamReader,
    _plan_groups,
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


def _reader(table, **opts):
    return AtomicChangesStreamReader(
        {"path": table.path, "keys": "k", **opts}
    )


def _batch(r, start, end):
    """All rows of the micro-batch (start, end] across its planned
    partitions — what the executors would produce, key-sorted."""
    return sorted(
        row for p in r.partitions(start, end) for row in r.read(p)
    )


def test_offsets_and_diff_unit(spark, table):
    r = _reader(table)
    off0 = r.initialOffset()
    assert off0 == {"version": 0}
    assert r.latestOffset() == off0
    assert r.partitions(off0, r.latestOffset()) == []  # caught up
    table.upsert(
        _mk(spark, [(5, -5.0, "upd", 1), (500, 0.0, "new", 1)]),
        [F.col("ts").desc()],
    )
    table.delete_keys(spark.createDataFrame([(7,)], "k int"))
    off1 = r.latestOffset()
    assert off1 == {"version": table.current_version()}
    rows = _batch(r, off0, off1)
    assert rows == [
        (5, -5.0, "upd", 1, "update"),
        (7, 7.0, "a", 0, "delete"),
        (500, 0.0, "new", 1, "insert"),
    ]
    # failure-recovery replay: manifests are immutable ⇒ re-planning
    # the same offset range is bit-identical
    assert _batch(r, off0, off1) == rows


def test_partitions_are_key_range_disjoint(spark, tmp_path):
    """The driver plans one partition per overlapping key-range group:
    a batch touching two distant file ranges yields (at least) two
    partitions whose old/new file sets cover the manifest diff exactly
    — each key's old and new rows meet inside one task."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "t"), keys=["k"],
        cluster_by=["k"], cluster_files=4,
    )
    t.upsert(
        _mk(spark, [(k, float(k), "a", 0) for k in range(100)]),
        [F.col("ts").desc()],
    )
    man0 = t.snapshot()
    t.upsert(
        _mk(spark, [(5, -5.0, "u", 1), (80, -80.0, "u", 1)]),
        [F.col("ts").desc()],
    )
    man1 = t.snapshot()
    groups = _plan_groups(man0, man1, "k", 32)
    assert len(groups) >= 2, "two distant key ranges must parallelize"
    # groups partition the manifest diff exactly (no file twice/lost)
    files0 = {f for fl in man0["partitions"].values() for f in fl}
    files1 = {f for fl in man1["partitions"].values() for f in fl}
    all_old = [f for fo, _fn in groups for f in fo]
    all_new = [f for _fo, fn in groups for f in fn]
    assert sorted(all_old) == sorted(files0 - files1)
    assert sorted(all_new) == sorted(files1 - files0)
    assert len(set(all_old)) == len(all_old)
    assert len(set(all_new)) == len(all_new)
    # the partitioned diff equals the unpartitioned table-level feed
    r = _reader(t)
    rows = _batch(r, {"version": man0["version"]},
                  {"version": man1["version"]})
    assert [(x[0], x[-1]) for x in rows] == [
        (5, "update"), (80, "update")
    ]
    # max_partitions caps the plan by merging ADJACENT groups
    assert len(_plan_groups(man0, man1, "k", 1)) == 1
    assert sorted(
        f for fo, _ in _plan_groups(man0, man1, "k", 1) for f in fo
    ) == sorted(files0 - files1)


def test_stream_on_empty_table_fails_clearly(spark, tmp_path):
    """ADVICE r7: starting the stream before the first commit raised an
    opaque TypeError from v{None:012d}; it must name the problem."""
    os.makedirs(tmp_path / "empty", exist_ok=True)
    with pytest.raises(ValueError, match="no committed table"):
        AtomicChangesStreamReader(
            {"path": str(tmp_path / "empty"), "keys": "k"}
        )
    ds = AtomicChangesDataSource(
        options={"path": str(tmp_path / "empty"), "keys": "k"}
    )
    with pytest.raises(ValueError, match="no committed table"):
        ds.schema()


def test_compaction_emits_no_changes(spark, table):
    r = _reader(table)
    off0 = r.initialOffset()
    for i in range(3):
        table.upsert(
            _mk(spark, [(i, -float(i), "x", 1)]), [F.col("ts").desc()]
        )
    off1 = r.latestOffset()
    n_sem = len(_batch(r, off0, off1))
    v = table.compact(target_bytes_per_file=1 << 30)
    if v != off1["version"]:
        off2 = r.latestOffset()
        assert off2 == {"version": v}
        assert _batch(r, off1, off2) == [], (
            "compaction must not appear in the feed"
        )
    assert n_sem == 3


def test_schema_evolution_in_stream_diff(spark, table):
    """A widened batch (new column) flows through the executor-side
    diff: the reader built AFTER the widening sees the union schema,
    old-file rows align with None for the new column, and the changed
    rows carry their new values."""
    table.upsert(
        spark.createDataFrame(
            [(3, -3.0, "w", 1, "extra")],
            "k int, v double, s string, ts int, note string",
        ),
        [F.col("ts").desc()],
    )
    r = _reader(table)  # constructed at the widened schema
    assert r.cols[-1] == "note"
    rows = _batch(r, {"version": 0}, {"version": 1})
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


def test_rows_are_produced_inside_tasks_not_on_driver(spark, tmp_path):
    """Execution-level proof that the feed does NOT transit the driver:
    a probe subclass records, at every read() invocation, whether a
    TaskContext is active (only Spark tasks have one — the old Simple
    reader's read() ran on the driver, where TaskContext.get() is
    None) and which task partition served it. The two-distant-ranges
    batch must show ≥2 distinct task partitions, all with a live
    TaskContext."""
    probe_dir = str(tmp_path / "probe")
    os.makedirs(probe_dir)

    class ProbeReader(AtomicChangesStreamReader):
        def read(self, partition):
            import uuid

            from pyspark import TaskContext

            tc = TaskContext.get()
            fname = os.path.join(self.options_probe, uuid.uuid4().hex)
            with open(fname, "w") as fh:
                fh.write(
                    f"{tc is not None},"
                    f"{tc.partitionId() if tc is not None else -1}"
                )
            return super().read(partition)

    class ProbeSource(AtomicChangesDataSource):
        @classmethod
        def name(cls) -> str:
            return "atomic_changes_probe"

        def streamReader(self, schema):
            r = ProbeReader(self.options)
            r.options_probe = self.options["probe_dir"]
            return r

    t = AtomicParquetTable(
        spark, str(tmp_path / "t"), keys=["k"],
        cluster_by=["k"], cluster_files=4,
    )
    t.upsert(
        _mk(spark, [(k, float(k), "a", 0) for k in range(100)]),
        [F.col("ts").desc()],
    )
    t.upsert(
        _mk(spark, [(5, -5.0, "u", 1), (80, -80.0, "u", 1)]),
        [F.col("ts").desc()],
    )
    spark.dataSource.register(ProbeSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("atomic_changes_probe")
        .option("path", t.path)
        .option("keys", "k")
        .option("from_version", "0")
        .option("probe_dir", probe_dir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.k, r._change_type) for r in spark.read.parquet(out).collect()
    )
    assert got == [(5, "update"), (80, "update")]
    probes = []
    for n in os.listdir(probe_dir):
        with open(os.path.join(probe_dir, n)) as fh:
            in_task, pid = fh.read().split(",")
            probes.append((in_task == "True", int(pid)))
    assert probes, "probe reader never ran"
    assert all(in_task for in_task, _ in probes), (
        "read() executed without a TaskContext — rows transited the "
        "driver"
    )
    assert len({pid for _, pid in probes}) >= 2, (
        "two distant key ranges must be served by distinct tasks"
    )


def test_partitioned_table_streams_with_virtual_columns(spark, tmp_path):
    """Partitioned CDC tables stream too (r8): partition-dir VIRTUAL
    columns are parsed from each file's Hive path on the executors and
    coerced to the declared type — including a key that MOVES
    partitions (its old and new rows live under different dirs but
    must still meet in one partition's diff and report one update),
    NULL partitions, and percent-escaped values."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "pt"), keys=["k"],
        partition_by=["etype"],
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, etype string, v double, ts int"
    )
    t.upsert(
        mk([(k, ["click", "view", None, "a=b c"][k % 4], float(k), 0)
            for k in range(40)]),
        [F.col("ts").desc()],
    )
    v0 = t.current_version()
    # k=1 moves partitions view -> click; k=2 (NULL partition) updates
    # in place; k=100 inserts into the escaped partition
    t.upsert(
        mk([(1, "click", -1.0, 1), (2, None, -2.0, 1),
            (100, "a=b c", 100.0, 1)]),
        [F.col("ts").desc()],
    )
    t.delete_keys(spark.createDataFrame([(3,)], "k int"))
    r = AtomicChangesStreamReader({"path": t.path, "keys": "k"})
    # current-manifest column order: partition cols read back LAST
    # after the first partition-scoped rewrite (k, v, ts, etype)
    assert r.cols == ["k", "v", "ts", "etype"]
    rows = _batch(r, {"version": v0}, r.latestOffset())
    assert rows == [
        (1, -1.0, 1, "click", "update"),
        (2, -2.0, 1, None, "update"),
        (3, 3.0, 0, "a=b c", "delete"),
        (100, 100.0, 1, "a=b c", "insert"),
    ]
    # and the stream feed equals the Spark-API changes() on the same
    # versions (cross-implementation differential)
    api = sorted(
        (row.k, row.v, row.ts, row.etype, row._change_type)
        for row in t.changes(v0).collect()
    )
    assert rows == api


def test_date_and_timestamp_partition_columns_stream(spark, tmp_path):
    """Date/timestamp partition columns — the most common partitioning
    scheme — coerce from their Hive path encoding ('2024-01-02',
    '2024-01-02 03%3A04%3A05') to real date/datetime values in the
    executor-side reader, and the feed stays equal to the Spark-API
    changes() differential (ADVICE r8: these previously filled as raw
    strings and broke batch construction)."""
    import datetime as dt

    d0, d1 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    t = AtomicParquetTable(
        spark, str(tmp_path / "dt"), keys=["k"], partition_by=["day"],
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, day date, v double, ts int"
    )
    t.upsert(
        mk([(k, d0 if k % 2 else d1, float(k), 0) for k in range(10)]),
        [F.col("ts").desc()],
    )
    v0 = t.current_version()
    # k=1 moves partitions d0 -> d1; k=2 updates in place
    t.upsert(
        mk([(1, d1, -1.0, 1), (2, d1, -2.0, 1)]), [F.col("ts").desc()]
    )
    r = AtomicChangesStreamReader({"path": t.path, "keys": "k"})
    rows = _batch(r, {"version": v0}, r.latestOffset())
    assert rows == [
        (1, -1.0, 1, d1, "update"),
        (2, -2.0, 1, d1, "update"),
    ]
    assert all(isinstance(row[3], dt.date) for row in rows)
    api = sorted(
        (row.k, row.v, row.ts, row.day, row._change_type)
        for row in t.changes(v0).collect()
    )
    assert rows == api

    # timestamp partition values carry percent-escaped colons
    ts0 = dt.datetime(2024, 1, 2, 3, 4, 5)
    t2 = AtomicParquetTable(
        spark, str(tmp_path / "tt"), keys=["k"],
        partition_by=["stamp"],
    )
    mk2 = lambda rows: spark.createDataFrame(
        rows, "k int, stamp timestamp, v double, ts int"
    )
    t2.upsert(
        mk2([(k, ts0, float(k), 0) for k in range(4)]),
        [F.col("ts").desc()],
    )
    v0 = t2.current_version()
    t2.upsert(mk2([(1, ts0, -1.0, 1)]), [F.col("ts").desc()])
    r2 = AtomicChangesStreamReader({"path": t2.path, "keys": "k"})
    rows2 = _batch(r2, {"version": v0}, r2.latestOffset())
    assert rows2 == [(1, -1.0, 1, ts0, "update")]
    assert isinstance(rows2[0][3], dt.datetime)


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_incremental_dedup_stream_capstone(spark, tmp_path):
    """CDC → near-dedup as ONE continuous job (VERDICT r8 task #7):
    a foreachBatch consumer of the partitioned CDC source maintains
    MinHash/LSH pair state across micro-batches — bootstrap snapshot,
    then inserts, updates (incl. update-to-empty), deletes — with
    checkpoint restarts between drains (each run() is a restart), and
    the final state is EQUAL to a from-scratch recompute over the
    final corpus. Replay of an applied batch is a no-op."""
    from stupp_exclusion_etl_spark.streaming.incremental_dedup import (
        IncrementalNearDedup,
    )

    root = str(tmp_path)
    docs = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, ts int"
    )
    base = [
        (i, f"the quick brown fox jumps over dog number {i} " * 3, 0)
        for i in range(20)
    ] + [
        (100, "alpha beta gamma delta epsilon zeta eta theta", 0),
        (101, "alpha beta gamma delta epsilon zeta eta theta", 0),
    ]
    src = AtomicParquetTable(spark, root + "/src", keys=["doc_id"])
    src.upsert(docs(base), [F.col("ts").desc()])

    job = IncrementalNearDedup(spark, root + "/src", root + "/state")
    job.run(root + "/ck")  # drain 1: bootstrap snapshot as inserts
    s1 = {(r.id1, r.id2) for r in job.state().collect()}
    assert (100, 101) in s1

    # drain 2 (checkpoint restart): insert a new near-dup, update a
    # doc onto another's text, delete one of the identical pair
    src.upsert(
        docs([
            (102, "alpha beta gamma delta epsilon zeta eta theta", 1),
            (5, "the quick brown fox jumps over dog number 7 " * 3, 1),
        ]),
        [F.col("ts").desc()],
    )
    src.delete_keys(spark.createDataFrame([(101,)], "doc_id long"))
    job.run(root + "/ck")
    s2 = {(r.id1, r.id2) for r in job.state().collect()}
    assert (100, 102) in s2 and (5, 7) in s2
    assert not any(101 in p for p in s2), "deleted doc left pairs"

    # drain 3: update-to-empty must retire the doc's pairs and bands
    src.upsert(docs([(102, "", 2)]), [F.col("ts").desc()])
    job.run(root + "/ck")
    s3 = {(r.id1, r.id2) for r in job.state().collect()}
    assert not any(102 in p for p in s3)
    assert job.bands.read().filter(F.col("doc_id") == 102).count() == 0

    # final state == from-scratch recompute over the final corpus
    # (fresh source + fresh job, one bootstrap drain)
    src2 = AtomicParquetTable(spark, root + "/src2", keys=["doc_id"])
    src2.upsert(
        src.read().select("doc_id", "text").withColumn("ts", F.lit(0)),
        [F.col("ts").desc()],
    )
    ref = IncrementalNearDedup(spark, root + "/src2", root + "/state2")
    ref.run(root + "/ck2")
    want = sorted(
        (r.id1, r.id2, r.jaccard) for r in ref.state().collect()
    )
    got = sorted(
        (r.id1, r.id2, r.jaccard) for r in job.state().collect()
    )
    assert got == want, "incremental state diverged from recompute"

    # replay idempotency: re-applying the last micro-batch by hand
    # (same batch_id the sink recorded) must change nothing
    last_bid = job.pairs._manifest(
        job.pairs.current_version()
    )["batch_id"]
    replay = spark.createDataFrame(
        [(102, "", "update")],
        "doc_id long, text string, _change_type string",
    )
    pv, bv = job.pairs.current_version(), job.bands.current_version()
    job.process_batch(replay, last_bid)
    assert job.pairs.current_version() == pv
    assert job.bands.current_version() == bv


def test_rate_cap_unit_walk(spark, table):
    """max_versions_per_trigger bounds every planned batch to K source
    versions: the offset walk drains a 6-commit backlog as ceil(6/2)=3
    batches whose union equals the uncapped feed, and the cap never
    stalls (each latestOffset strictly advances until head)."""
    for i in range(6):
        table.upsert(
            _mk(spark, [(i, -float(i), f"u{i}", i + 1)]),
            [F.col("ts").desc()],
        )
    head = table.current_version()
    uncapped = _batch(_reader(table, from_version="0"),
                      {"version": 0}, {"version": head})

    r = _reader(table, from_version="0", max_versions_per_trigger="2")
    off = r.initialOffset()
    assert off == {"version": 0}
    served, ends = [], []
    while off["version"] < head:
        nxt = r.latestOffset()
        assert 0 < nxt["version"] - off["version"] <= 2
        served += _batch(r, off, nxt)
        ends.append(nxt["version"])
        off = nxt
    assert ends == [2, 4, 6]
    # the capped drain is a partition of the uncapped feed's effect on
    # DISTINCT versions; per-key rows may differ (a key updated twice
    # lands once uncapped, twice across capped batches) — here each
    # commit touches a distinct key, so the union must match exactly
    assert sorted(served) == uncapped
    # caught up: latestOffset pins to head, partitions() plans nothing
    assert r.latestOffset() == {"version": head}
    assert r.partitions(off, r.latestOffset()) == []


def test_rate_cap_option_validation(spark, table):
    with pytest.raises(ValueError, match="max_versions_per_trigger"):
        _reader(table, max_versions_per_trigger="0")


def test_rate_cap_end_to_end_bounded_batches(spark, table, tmp_path):
    """Engine-level: a consumer subscribing from version 0 against a
    6-commit backlog with max_versions_per_trigger=2 drains it as
    multiple bounded micro-batches (every batch's _end_version steps
    by <= 2), and the accumulated output equals the uncapped feed."""
    register_changes_stream(spark)
    for i in range(6):
        table.upsert(
            _mk(spark, [(i, -float(i), f"u{i}", i + 1)]),
            [F.col("ts").desc()],
        )
    head = table.current_version()
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.format("atomic_changes")
        .option("path", table.path)
        .option("keys", "k")
        .option("from_version", "0")
        .option("max_versions_per_trigger", "2")
        .option("emit_end_version", "true")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    ends = sorted({r._end_version for r in rows})
    assert ends == [2, 4, 6], f"batch ends {ends} — cap not enforced"
    got = sorted((r.k, r.v, r._change_type) for r in rows)
    exp = sorted(
        (x[0], x[1], x[-1])
        for x in _batch(_reader(table, from_version="0"),
                        {"version": 0}, {"version": head})
    )
    assert got == exp


def test_rate_cap_checkpoint_restart_ratchets_not_stalls(
    spark, table, tmp_path
):
    """The stall-proof restart contract: a restarted capped reader has
    no start context (the API hides the checkpoint), so its first
    offers can sit at or below the committed offset — the ratchet must
    advance them until batches resume, never re-serving the already-
    committed range and never stalling. Drain 4 commits capped at 2,
    stop, add 4 more, restart on the same checkpoint: the second run
    must deliver exactly the new commits' changes, still in bounded
    batches."""
    register_changes_stream(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run(n_expected_rows):
        q = (
            spark.readStream.format("atomic_changes")
            .option("path", table.path)
            .option("keys", "k")
            .option("from_version", "0")
            .option("max_versions_per_trigger", "2")
            .option("emit_end_version", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = 120
            import time as _t
            t0 = _t.time()
            while _t.time() - t0 < deadline:
                q.processAllAvailable()
                n = spark.read.parquet(out).count()
                if n >= n_expected_rows:
                    break
            else:
                raise AssertionError("stalled: expected rows never arrived")
        finally:
            q.stop()

    for i in range(4):
        table.upsert(
            _mk(spark, [(i, -float(i), f"a{i}", i + 1)]),
            [F.col("ts").desc()],
        )
    run(4)
    first = sorted((r.k, r.v) for r in spark.read.parquet(out).collect())
    assert first == [(0, -0.0), (1, -1.0), (2, -2.0), (3, -3.0)]

    for i in range(4):
        table.upsert(
            _mk(spark, [(100 + i, float(i), f"b{i}", 10 + i)]),
            [F.col("ts").desc()],
        )
    run(8)
    rows = spark.read.parquet(out).collect()
    got = sorted((r.k, r.v, r._change_type) for r in rows)
    assert got == [
        (0, -0.0, "update"), (1, -1.0, "update"),
        (2, -2.0, "update"), (3, -3.0, "update"),
        (100, 0.0, "insert"), (101, 1.0, "insert"),
        (102, 2.0, "insert"), (103, 3.0, "insert"),
    ], "restart re-served or lost changes"
    # second run stayed bounded too: its batch ends step by <= 2
    second_ends = sorted(
        {r._end_version for r in rows if r._end_version > 4}
    )
    assert second_ends == [6, 8], second_ends


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_incremental_dedup_capped_drain_matches_uncapped(spark, tmp_path):
    """max_versions_per_trigger plumbed through the continuous
    maintenance job: a 4-commit backlog behind the bootstrap drains as
    multiple bounded micro-batches (cap 2 ⇒ 3 batches for versions
    -1..4), and the final pair state is EQUAL to an uncapped
    from-scratch job over the same corpus."""
    from stupp_exclusion_etl_spark.streaming.incremental_dedup import (
        IncrementalNearDedup,
    )

    root = str(tmp_path)
    docs = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, ts int"
    )
    src = AtomicParquetTable(spark, root + "/src", keys=["doc_id"])
    src.upsert(
        docs([
            (i, f"the quick brown fox jumps over dog number {i} " * 3, 0)
            for i in range(10)
        ]),
        [F.col("ts").desc()],
    )  # v0
    src.upsert(
        docs([(100, "alpha beta gamma delta epsilon zeta eta", 1)]),
        [F.col("ts").desc()],
    )  # v1
    src.upsert(
        docs([(101, "alpha beta gamma delta epsilon zeta eta", 1)]),
        [F.col("ts").desc()],
    )  # v2: near-dup of 100
    src.upsert(
        docs([(3, "the quick brown fox jumps over dog number 4 " * 3, 1)]),
        [F.col("ts").desc()],
    )  # v3: 3 becomes near-dup of 4
    src.delete_keys(spark.createDataFrame([(7,)], "doc_id long"))  # v4

    job = IncrementalNearDedup(
        spark, root + "/src", root + "/state", max_versions_per_trigger=2
    )
    seen_bids = []
    orig = job.process_batch
    job.process_batch = lambda df, bid: (seen_bids.append(bid), orig(df, bid))[1]
    job.run(root + "/ck")
    assert len(seen_bids) == 3, (
        f"cap 2 over versions -1..4 must drain as 3 batches, "
        f"got {len(seen_bids)}"
    )

    ref = IncrementalNearDedup(spark, root + "/src", root + "/state2")
    ref.run(root + "/ck2")
    got = sorted((r.id1, r.id2, r.jaccard) for r in job.state().collect())
    want = sorted((r.id1, r.id2, r.jaccard) for r in ref.state().collect())
    assert got == want and (100, 101, 1.0) in [
        (a, b, round(j, 2)) for a, b, j in got
    ], "capped incremental state diverged from the uncapped drain"


def test_from_timestamp_subscription(spark, table):
    """from_timestamp_ms resolves the subscription start to the
    snapshot live at the instant (stream serves changes committed
    after it); both-options and pre-creation instants are rejected."""
    table.upsert(_mk(spark, [(5, -5.0, "u1", 1)]), [F.col("ts").desc()])
    table.upsert(_mk(spark, [(6, -6.0, "u2", 2)]), [F.col("ts").desc()])
    ts = {
        m["version"]: m["committed_at_ms"]
        for m in (table._manifest(v) for v in range(3))
    }

    r = _reader(table, from_timestamp_ms=str(ts[1]))
    assert r.initialOffset() == {"version": 1}
    rows = _batch(r, r.initialOffset(), r.latestOffset())
    assert [(x[0], x[-1]) for x in rows] == [(6, "update")]
    # mid-interval instant → same snapshot
    r2 = _reader(table, from_timestamp_ms=str((ts[1] + ts[2]) // 2))
    assert r2.initialOffset() == {"version": 1}

    with pytest.raises(ValueError, match="not both"):
        _reader(table, from_version="0", from_timestamp_ms=str(ts[1]))
    with pytest.raises(ValueError, match="predates"):
        _reader(table, from_timestamp_ms=str(ts[0] - 1))


def test_engine_call_order_canary(spark, table, tmp_path):
    """SPARK-CONTRACT CANARY (VERDICT r10 task #4). The rate-cap
    ratchet and bootstrap anchoring in AtomicChangesStreamReader rest
    on OBSERVED-not-documented MicroBatchExecution behavior for python
    stream sources on pyspark 4.1.x:

      1. the engine's FIRST offset call is latestOffset — before
         initialOffset — so the cap anchor must be established at
         reader construction, not in initialOffset;
      2. within a run, commit(end) fires AFTER each completed batch
         (per trigger: partitions → commit → next latestOffset), and
         every committed end is a previously PLANNED batch end — but a
         fresh reader after a checkpoint restart sees NO commit before
         its first offer, which is exactly the stall the declined-offer
         ratchet in latestOffset() covers (writing this canary
         corrected the r10 reading that commit never fired here);
      3. a checkpoint RESTART constructs a fresh reader whose FIRST
         engine call is a pending-batch replay (partitions with the
         checkpointed offsets) or a bare latestOffset poll — never a
         commit — and planning resumes from the checkpointed offset
         without re-serving earlier versions.

    If a pyspark upgrade changes any of these, this test fails HERE
    with a pointed message instead of the stream silently stalling or
    double-serving — re-run it first on every pyspark bump and revisit
    changes_stream.py's latestOffset ratchet if it trips."""
    register_changes_stream(spark)
    for i in range(4):
        table.upsert(
            _mk(spark, [(i, -float(i), f"u{i}", i + 1)]),
            [F.col("ts").desc()],
        )
    log = str(tmp_path / "calls.log")

    def run_once():
        q = (
            spark.readStream.format("atomic_changes")
            .option("path", table.path)
            .option("keys", "k")
            .option("from_version", "0")
            .option("max_versions_per_trigger", "2")
            .option("call_log", log)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    calls = open(log).read().splitlines()
    offset_calls = [c for c in calls if c in ("latestOffset", "initialOffset")]
    assert offset_calls and offset_calls[0] == "latestOffset", (
        "MicroBatchExecution no longer polls latestOffset before "
        "initialOffset — the rate-cap anchor in changes_stream.py "
        "latestOffset() assumed this order; revisit the ratchet"
    )
    assert "initialOffset" in calls, "initialOffset never consulted"
    planned = [
        tuple(int(x) for x in c.split()[1:])
        for c in calls if c.startswith("partitions")
    ]
    real = [(a, b) for a, b in planned if b > a]
    assert real and real[0][0] == 0 and real[-1][1] == 4, real
    for a, b in real:
        assert b - a <= 2, f"cap breached in planned range ({a},{b}]"
    # commits (when the engine sends them) trail completed batches:
    # every committed end must be a planned end, in order — if this
    # ever reports an end that was never planned, offset accounting
    # broke engine-side and the ratchet's anchors need review
    commits = [int(c.split()[1]) for c in calls if c.startswith("commit")]
    ends = [b for _a, b in real]
    assert all(v in ends for v in commits), (commits, ends)
    assert commits == sorted(commits), commits
    # the first engine interaction carries no commit context — the
    # exact window the declined-offer ratchet exists for
    first_commit = calls.index(
        f"commit {commits[0]}"
    ) if commits else len(calls)
    assert "latestOffset" in calls[:first_commit], calls[:4]

    # restart with more commits: a fresh reader must resume AFTER the
    # checkpointed offset — no range may start below the prior head
    for i in range(4, 6):
        table.upsert(
            _mk(spark, [(i, -float(i), f"u{i}", i + 1)]),
            [F.col("ts").desc()],
        )
    open(log, "w").close()
    run_once()
    calls2 = open(log).read().splitlines()
    # the fresh reader's first engine interaction carries no commit
    # context: either a pending-batch REPLAY (partitions with the
    # checkpointed offsets — re-anchors via _planned_since_offer) or a
    # bare latestOffset poll (the declined-offer ratchet's case). Both
    # anchors exist precisely because commit is not the first call.
    assert calls2 and calls2[0].split()[0] in (
        "partitions", "latestOffset"
    ) and not calls2[0].startswith("commit"), calls2[:3]
    planned2 = [
        tuple(int(x) for x in c.split()[1:])
        for c in calls2 if c.startswith("partitions")
    ]
    real2 = [(a, b) for a, b in planned2 if b > a]
    assert all(a >= 4 for a, b in real2), (
        f"restart re-served pre-checkpoint versions: {real2} — the "
        "resume contract (planning starts at the checkpointed end) "
        "changed; bootstrap anchoring in changes_stream.py needs review"
    )
    assert real2 and real2[-1][1] == 6, real2


def test_from_timestamp_mtime_fallback_matches_sink(spark, table):
    """Pre-feature manifests (no in-commit timestamp) resolve
    from_timestamp_ms through the FS-mtime fallback, which is NOT
    monotone after a copy/sync rewrites mtimes. The stream-side
    _version_at must apply the same prev_ts+1 clamp as
    AtomicParquetTable.version_at (r11 ADVICE), so batch and stream
    resolve the SAME version for every instant on such a table."""
    import json

    from stupp_exclusion_etl_spark.sources.changes_stream import _version_at

    table.upsert(_mk(spark, [(5, -5.0, "u1", 1)]), [F.col("ts").desc()])
    table.upsert(_mk(spark, [(6, -6.0, "u2", 2)]), [F.col("ts").desc()])
    table.upsert(_mk(spark, [(7, -7.0, "u3", 3)]), [F.col("ts").desc()])

    # simulate a pre-feature table whose directory was later synced:
    # strip in-commit timestamps, then rewrite mtimes NON-monotonically
    mdir = os.path.join(table.path, "_manifests")
    mtimes_s = {0: 2_000, 1: 1_000, 2: 1_500, 3: 3_000}
    for v, sec in mtimes_s.items():
        p = os.path.join(mdir, f"v{v:012d}.json")
        with open(p) as fh:
            man = json.load(fh)
        man.pop("committed_at_ms", None)
        with open(p, "w") as fh:
            json.dump(man, fh)
        os.utime(p, (sec, sec))

    # fresh handle: no cached light records from the commits above
    t2 = AtomicParquetTable(spark, table.path, keys=["k"])
    # clamped sequence is [2_000_000, 2_000_001, 2_000_002, 3_000_000]
    probes = [
        2_000_000, 2_000_001, 2_000_002, 2_500_000, 3_000_000, 9_999_999,
    ]
    for q in probes:
        assert _version_at(table.path, q) == t2.version_at(q), q
    # the instant that exposed the unclamped early-exit: v1/v2 carry
    # smaller raw mtimes than v0, so the unclamped loop walked past
    # the true answer (v1) to v2
    assert _version_at(table.path, 2_000_001) == 1
    with pytest.raises(ValueError, match="predates"):
        _version_at(table.path, 1_999_999)


def test_capped_drain_surfaces_foreachbatch_failure(spark, tmp_path):
    """The capped drain runs processAllAvailable in a watchdog thread,
    where a StreamingQueryException (e.g. a foreachBatch failure)
    surfaces in the THREAD, not the caller — run() must re-check
    q.exception() after the waiter exits so a failed drain is never
    reported as success (r11 ADVICE medium). The availableNow path
    already propagates via awaitTermination; both paths must agree."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from stupp_exclusion_etl_spark.streaming.incremental_dedup import (
        IncrementalNearDedup,
    )

    root = str(tmp_path)
    src = AtomicParquetTable(spark, root + "/src", keys=["doc_id"])
    src.upsert(
        spark.createDataFrame(
            [(i, f"doc text number {i} " * 3, 0) for i in range(5)],
            "doc_id long, text string, ts int",
        ),
        [F.col("ts").desc()],
    )

    job = IncrementalNearDedup(
        spark, root + "/src", root + "/state", max_versions_per_trigger=1
    )

    def boom(df, bid):
        raise RuntimeError("synthetic foreachBatch failure")

    job.process_batch = boom
    with pytest.raises(StreamingQueryException):
        job.run(root + "/ck", timeout_sec=120)
