"""Keyed-upsert sink tests (SURVEY.md A14-A16): last-write-wins by key,
idempotent re-runs, GSI-style partitioned writes, bounded batching."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from stupp_exclusion_etl_spark.sinks.upsert import (
    foreach_batched_writer,
    micro_batches,
    partitioned_index_write,
    upsert_parquet,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, status string, version long")


def test_upsert_last_write_wins_and_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = _df(spark, [(1, "pending", 1), (2, "pending", 1)])
    upsert_parquet(v1, path, keys=["id"], order_by=[F.col("version").desc()])
    v2 = _df(spark, [(2, "granted", 2), (3, "pending", 1)])
    for _ in range(2):  # second run = re-delivery; must be a no-op
        upsert_parquet(v2, path, keys=["id"], order_by=[F.col("version").desc()])
        got = {r.id: (r.status, r.version) for r in spark.read.parquet(path).collect()}
        assert got == {1: ("pending", 1), 2: ("granted", 2), 3: ("pending", 1)}


def test_upsert_out_of_order_delivery_keeps_newest(spark, tmp_path):
    path = str(tmp_path / "t")
    upsert_parquet(
        _df(spark, [(1, "granted", 5)]), path, ["id"], [F.col("version").desc()]
    )
    # stale update arrives late: must NOT clobber the newer row
    upsert_parquet(
        _df(spark, [(1, "pending", 2)]), path, ["id"], [F.col("version").desc()]
    )
    got = spark.read.parquet(path).collect()
    assert [(r.status, r.version) for r in got] == [("granted", 5)]


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "id long, status string, version long, bucket string")


def _partition_files(path: str, part: str) -> dict[str, bytes]:
    d = os.path.join(path, f"bucket={part}")
    return {
        f: open(os.path.join(d, f), "rb").read()
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    }


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """Dynamic-partition upsert: a batch touching only bucket=a must
    leave bucket=b's data files BYTE-IDENTICAL (no 100 TB full-table
    rewrite), while bucket=a applies keep-latest."""
    path = str(tmp_path / "t")
    base = _pdf(
        spark,
        [(1, "pending", 1, "a"), (2, "pending", 1, "a"), (3, "pending", 1, "b")],
    )
    upsert_parquet(
        base, path, keys=["id"], order_by=[F.col("version").desc()],
        partition_by=["bucket"],
    )
    before_b = _partition_files(path, "b")
    assert before_b  # sanity: partition exists with data files

    batch = _pdf(spark, [(2, "granted", 2, "a"), (4, "pending", 1, "a")])
    upsert_parquet(
        batch, path, keys=["id"], order_by=[F.col("version").desc()],
        partition_by=["bucket"],
    )
    after_b = _partition_files(path, "b")
    assert after_b == before_b, "untouched partition was rewritten"
    got = {r.id: (r.status, r.version, r.bucket) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("pending", 1, "a"),
        2: ("granted", 2, "a"),
        3: ("pending", 1, "b"),
        4: ("pending", 1, "a"),
    }


def test_partitioned_upsert_key_moves_partition(spark, tmp_path):
    """A key whose new row lands in a different partition must vanish
    from its old partition (MERGE semantics), not duplicate."""
    path = str(tmp_path / "t")
    upsert_parquet(
        _pdf(spark, [(1, "pending", 1, "a"), (2, "pending", 1, "b")]),
        path, keys=["id"], order_by=[F.col("version").desc()],
        partition_by=["bucket"],
    )
    upsert_parquet(
        _pdf(spark, [(1, "granted", 2, "b")]),
        path, keys=["id"], order_by=[F.col("version").desc()],
        partition_by=["bucket"],
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 2
    got = {r.id: (r.status, r.version, r.bucket) for r in rows}
    assert got == {1: ("granted", 2, "b"), 2: ("pending", 1, "b")}


def test_partitioned_index_write_prunes(spark, tmp_path):
    path = str(tmp_path / "idx")
    df = _df(spark, [(i, "granted" if i % 2 else "denied", 1) for i in range(10)])
    partitioned_index_write(df, path, ["status"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("status=")
    ) == ["status=denied", "status=granted"]
    scan = spark.read.parquet(path).filter(F.col("status") == "granted")
    assert scan.count() == 5
    # equality predicate on the partition column must prune, not filter
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan


def test_micro_batches_bounded(spark):
    df = spark.range(0, 101).repartition(2)
    sizes = [r.batch_rows for r in micro_batches(df, batch_size=20).collect()]
    assert sum(sizes) == 101
    assert max(sizes) <= 20


def test_foreach_batched_writer_chunks(spark, tmp_path):
    out = str(tmp_path / "sink")
    os.makedirs(out)

    def write_fn(records):
        assert 0 < len(records) <= 20
        fn = os.path.join(out, f"{records[0]['id']}_{len(records)}")
        with open(fn, "w") as f:
            f.write(str(len(records)))

    df = _df(spark, [(i, "s", 1) for i in range(45)]).coalesce(1)
    foreach_batched_writer(df, write_fn, batch_size=20)
    total = sum(int(open(os.path.join(out, f)).read()) for f in os.listdir(out))
    assert total == 45


def test_compact_parquet_reduces_files_preserves_data(spark, tmp_path):
    """20 tiny appended files compact to a handful; row set identical."""
    from stupp_exclusion_etl_spark.sinks.upsert import compact_parquet

    path = str(tmp_path / "small_files")
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_bytes_per_file=1 << 30)
    assert stats["files_before"] >= 20
    assert stats["files_after"] < stats["files_before"] // 4
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before == list(range(200))


def test_compact_parquet_partitioned_keeps_layout(spark, tmp_path):
    """Partitioned compaction preserves the partition directories (the
    GSI pruning story survives the rewrite)."""
    import os

    from stupp_exclusion_etl_spark.sinks.upsert import compact_parquet

    path = str(tmp_path / "part_files")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)], "id long, bucket string"
    )
    for _ in range(5):
        df.write.mode("append").partitionBy("bucket").parquet(path)
    stats = compact_parquet(
        spark, path, target_bytes_per_file=1 << 30, partition_by=["bucket"]
    )
    assert stats["files_after"] < stats["files_before"]
    assert sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    ) == ["bucket=a", "bucket=b"]
    got = spark.read.parquet(path).groupBy("bucket").count().collect()
    assert {r.bucket: r["count"] for r in got} == {"a": 250, "b": 250}


def test_sorted_layout_write_enables_file_skipping(spark, tmp_path):
    """After a range-clustered write, parquet footer min/max stats over
    the sort key must be pairwise NON-OVERLAPPING across files — the
    property that makes a selective range predicate skip all but one
    file. Asserted on the real footers via pyarrow, not on the plan."""
    import pyarrow.parquet as pq

    from stupp_exclusion_etl_spark.catalog import table as t
    from stupp_exclusion_etl_spark.sinks.upsert import sorted_layout_write

    path = str(tmp_path / "sorted")
    orders = t(spark, SF_SMALL, "orders")
    sorted_layout_write(orders, path, ["o_totalprice"], n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            "o_totalprice"
        ]
        lo = min(
            md.row_group(g).column(col_idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(col_idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 6  # range partitioner may merge tiny bounds
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # data intact
    assert spark.read.parquet(path).count() == orders.count()


def test_zorder_layout_write_skips_on_every_dimension(spark, tmp_path):
    """Z-order clustering must let footer min/max stats skip most files
    for a selective predicate on EITHER clustered column — the property
    a single-axis sort cannot give the second column. Asserted on real
    pyarrow footers: for a narrow range on each dimension in turn,
    the fraction of files whose [min,max] interval intersects it must
    be well under 1 (here: ≤ half)."""
    import pyarrow.parquet as pq

    from stupp_exclusion_etl_spark.catalog import table as t
    from stupp_exclusion_etl_spark.sinks.upsert import zorder_layout_write

    path = str(tmp_path / "zorder")
    orders = t(spark, SF_SMALL, "orders")
    cols = ["o_custkey", "o_totalprice"]
    zorder_layout_write(orders, path, cols, n_files=16)

    stats: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            s = [md.row_group(g).column(idx[c]).statistics for g in range(md.num_row_groups)]
            stats[c].append((min(x.min for x in s), max(x.max for x in s)))

    n_files = len(stats[cols[0]])
    assert n_files >= 8
    for c in cols:
        glo = min(lo for lo, _ in stats[c])
        ghi = max(hi for _, hi in stats[c])
        width = (ghi - glo) / 16  # a 1/16-wide probe range in this dim
        probe_lo, probe_hi = glo + 7 * width, glo + 8 * width
        hit = sum(1 for lo, hi in stats[c] if hi >= probe_lo and lo <= probe_hi)
        assert hit <= n_files / 2, (
            f"{c}: {hit}/{n_files} files intersect a 1/16 probe range — "
            "z-order gave no pruning on this dimension"
        )


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Co-located join proof: orders and customer written bucketed on
    their join key (same bucket count) must sort-merge-join with ZERO
    Exchange nodes — the write-time shuffle is amortized across every
    later join. Broadcast is disabled so the plan can't cheat."""
    from stupp_exclusion_etl_spark.catalog import table as t
    from stupp_exclusion_etl_spark.sinks.upsert import bucketed_table_write

    sf = SF_SMALL
    bucketed_table_write(
        t(spark, sf, "orders"), "b_orders", str(tmp_path / "bo"), ["o_custkey"], 8
    )
    bucketed_table_write(
        t(spark, sf, "customer"), "b_customer", str(tmp_path / "bc"), ["c_custkey"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        from tests.harness import plan_str

        plan = plan_str(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() == t(spark, sf, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_zorder_value_matches_python_morton(spark):
    """zorder_value's width-bucket + bit-interleave expression must
    equal a straightforward Python Morton encoding for known inputs
    (lo=0, hi=256, bits=8 → bucket == floor(value) for ints 0..255)."""
    import random

    from stupp_exclusion_etl_spark.sinks.upsert import zorder_value

    rng = random.Random(7)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(64)]

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_value([("x", 0.0, 256.0), ("y", 0.0, 256.0)], bits=8)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z, morton(x, y))


def test_delete_keys_partition_scoped(spark, tmp_path):
    """Keyed delete: doomed keys vanish, untouched partitions' files
    stay byte-identical (never rewritten), and a partition emptied by
    the delete disappears from disk."""
    import hashlib

    from stupp_exclusion_etl_spark.sinks.upsert import delete_keys_parquet

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 4}", i * 10) for i in range(40)], "id long, part string, v long"
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)

    def file_hashes(sub):
        root = os.path.join(path, f"part={sub}")
        out = {}
        for f in sorted(os.listdir(root)):
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    before_s1 = file_hashes("s1")
    # doom: every s3 row (empties that partition) + two s0 rows
    doomed = spark.createDataFrame(
        [(i,) for i in range(40) if i % 4 == 3] + [(0,), (4,)], "id long"
    )
    delete_keys_parquet(spark, path, doomed, ["id"], partition_by=["part"])

    got = spark.read.parquet(path)
    assert got.count() == 40 - 10 - 2
    assert got.filter(F.col("id").isin(0, 4, 3, 7)).count() == 0
    assert file_hashes("s1") == before_s1, "untouched partition was rewritten"
    assert not os.path.exists(os.path.join(path, "part=s3")), "emptied partition not dropped"


def test_upsert_first_batch_dedups_and_null_keys_group(spark, tmp_path):
    """The auto-create (first-write) branch must apply keep-latest like
    every later batch — a first batch carrying a key twice lands one
    row — and NULL keys form their own group that later batches
    replace (window partitioning treats NULL as a value)."""
    from stupp_exclusion_etl_spark.sinks.upsert import upsert_parquet

    p = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (None, "c", 1), (2, "b2", 2)],
        "id long, v string, ver long",
    )
    upsert_parquet(base, p, ["id"], [F.col("ver").desc()])
    r1 = {(r.id, r.v) for r in spark.read.parquet(p).collect()}
    assert r1 == {(1, "a"), (2, "b2"), (None, "c")}, r1

    inc = spark.createDataFrame(
        [(None, "c2", 3), (1, "a2", 3)], "id long, v string, ver long"
    )
    upsert_parquet(inc, p, ["id"], [F.col("ver").desc()])
    r2 = {(r.id, r.v) for r in spark.read.parquet(p).collect()}
    assert r2 == {(1, "a2"), (2, "b2"), (None, "c2")}, r2
