"""Chunked manifests + light commit-log records (sinks/atomic.py
format 2) — the metadata plane that survives 100×.

A format-1 table serialized EVERY live file's entry + stats into one
v{N}.json per commit, and re-parsed it for every snapshot resolution:
at millions of files that is hundreds of driver-side MB per commit and
per read — the wall that pushed Iceberg to manifest-lists + reused
manifest files. Format 2 splits the metadata into immutable entry
chunks (carried forward BY NAME when untouched) and a small commit
record that doubles as the commit-log index. These tests pin the
scaling contracts with real I/O counters:

- a commit on a 100k-entry table opens O(changed chunks), not O(table)
- the commit record stays O(chunks) bytes — never O(files)
- version_at / timestamp time travel never opens an entry chunk
- restore() of a chunked snapshot is one record write referencing the
  target's chunk names (zero chunk rewrites)
- gc() reaps chunks referenced by no retained record, age-guarded
- small chunks accreted by file-scoped commits get merged (bounded
  chunk count, full-size chunks never rewritten)
- mixed format-1/format-2 history keeps read/time-travel/CDC/restore
  semantics across the boundary
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks import atomic
from stupp_exclusion_etl_spark.sinks.atomic import (
    AtomicParquetTable,
    VersionExpiredError,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v double, ts int")


@pytest.fixture()
def read_log(monkeypatch):
    """Log every metadata file the table layer reads (manifest records
    AND entry chunks) — the I/O-count probe the scaling assertions
    use."""
    calls: list[str] = []
    orig_text = atomic._read_text
    orig_bytes = atomic._read_bytes

    def counting_text(spark, path):
        calls.append(path)
        return orig_text(spark, path)

    def counting_bytes(spark, path):
        calls.append(path)
        return orig_bytes(spark, path)

    monkeypatch.setattr(atomic, "_read_text", counting_text)
    monkeypatch.setattr(atomic, "_read_bytes", counting_bytes)
    return calls


def _chunk_reads(calls):
    return [c for c in calls if "/chunks/" in c]


def _synthetic_table(spark, tmp_path, n_files=100_000, per_part=1000):
    """A 100k-ENTRY manifest built through the real commit path but
    with fabricated file names and precomputed (empty) stats — the
    metadata plane at its stated target scale without writing 100k
    parquet files."""
    t = AtomicParquetTable(spark, str(tmp_path / "big"), keys=["k"])
    new_by_part = {
        f"p={p}": [f"p={p}/f-{p:04d}-{i:04d}.parquet"
                   for i in range(per_part)]
        for p in range(n_files // per_part)
    }
    v0 = t._commit(None, new_by_part, set(), "k int, v double, ts int",
                   precomputed_stats={})
    assert v0 == 0
    return t, new_by_part


def test_commit_touches_o_changed_chunks(spark, tmp_path, read_log):
    t, by_part = _synthetic_table(spark, tmp_path)
    light0 = t._manifest_light(0)
    assert light0["format"] == 2
    assert light0["n_files"] == 100_000
    n_chunks = len(light0["chunks"])
    assert n_chunks >= 64  # 100k entries / 1024-entry target

    # file-scoped commit: retire 3 files of one partition, add one new
    read_log.clear()
    rf = {"p=7": set(by_part["p=7"][:3])}
    t._commit(
        0, {"p=7": ["p=7/f-new-0001.parquet"]}, set(),
        "k int, v double, ts int",
        replaced_files=rf, precomputed_stats={},
    )
    opened = _chunk_reads(read_log)
    # O(changed chunks): the retired files live in one or two chunks;
    # everything else is carried by name without being opened (bloom
    # false positives get a small margin)
    assert len(opened) <= 4, opened
    light1 = t._manifest_light(1)
    names0 = {c["name"] for c in light0["chunks"]}
    names1 = {c["name"] for c in light1["chunks"]}
    assert len(names0 & names1) >= n_chunks - 4  # carried BY NAME
    assert light1["n_files"] == 100_000 - 3 + 1

    # the commit RECORD is O(chunks) bytes, never O(files)
    raw = json.load(open(
        tmp_path / "big" / "_manifests" / "v000000000001.json"
    ))
    assert "partitions" not in raw and "stats" not in raw
    rec_bytes = os.path.getsize(
        tmp_path / "big" / "_manifests" / "v000000000001.json"
    )
    assert rec_bytes < 200_000  # ~100 chunk entries; format 1 was ~10MB

    # partition-scoped commit: replace one whole partition
    read_log.clear()
    t._commit(
        1, {"p=9": ["p=9/f-new-0002.parquet"]}, {"p=9"},
        "k int, v double, ts int", precomputed_stats={},
    )
    assert len(_chunk_reads(read_log)) <= 4

    # assembled snapshot still holds the exact file set
    man = t._manifest(2)
    assert sum(len(fl) for fl in man["partitions"].values()) == (
        100_000 - 3 + 1 - 1000 + 1
    )
    assert man["partitions"]["p=9"] == ["p=9/f-new-0002.parquet"]
    assert by_part["p=7"][0] not in man["partitions"]["p=7"]
    assert by_part["p=7"][3] in man["partitions"]["p=7"]


def test_version_at_never_opens_a_chunk(spark, tmp_path, read_log):
    t, _ = _synthetic_table(spark, tmp_path, n_files=10_000)
    for i in range(4):
        t._commit(
            i, {f"p=new{i}": [f"p=new{i}/f.parquet"]}, set(),
            "k int, v double, ts int", precomputed_stats={},
        )
    ts = [t._commit_time_ms(v) for v in range(5)]
    assert ts == sorted(ts)
    read_log.clear()
    t._light_cache.clear()
    assert t.version_at(ts[2]) == 2
    assert t.version_at(ts[4] + 10_000) == 4
    with pytest.raises(Exception, match="predates"):
        t.version_at(ts[0] - 10_000)
    assert _chunk_reads(read_log) == []
    # history() counts come from the records too — no chunk opened
    read_log.clear()
    h = t.history()
    assert [r["version"] for r in h] == [4, 3, 2, 1, 0]
    assert h[-1]["n_files"] == 10_000
    # changed_partitions (exact diff) may assemble; counts must not
    assert all(r["n_files"] is not None for r in h)


def test_restore_reuses_chunks(spark, tmp_path, read_log):
    t, _ = _synthetic_table(spark, tmp_path, n_files=10_000)
    t._commit(0, {"p=x": ["p=x/f.parquet"]}, set(),
              "k int, v double, ts int", precomputed_stats={})
    target = t._manifest_light(0)
    read_log.clear()
    v = t.restore(version=0)
    assert v == 2
    # zero chunk reads, zero chunk writes: the new record references
    # the target's chunk names verbatim
    assert _chunk_reads(read_log) == []
    light = t._manifest_light(2)
    assert [c["name"] for c in light["chunks"]] == [
        c["name"] for c in target["chunks"]
    ]
    assert light["n_files"] == 10_000


def test_small_chunk_maintenance_bounds_chunk_count(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "s"), keys=["k"])
    t.chunk_target = 64
    parent = t._commit(
        None,
        {"p=0": [f"p=0/base-{i:03d}.parquet" for i in range(64)]},
        set(), "k int, v double, ts int", precomputed_stats={},
    )
    # 40 file-scoped commits, each adding ONE file: without
    # maintenance that is 40 one-entry chunks
    for i in range(40):
        parent = t._commit(
            parent, {"p=0": [f"p=0/inc-{i:03d}.parquet"]}, set(),
            "k int, v double, ts int", precomputed_stats={},
        )
    light = t._manifest_light(parent)
    assert light["n_files"] == 104
    # merged: far fewer chunks than commits
    assert len(light["chunks"]) <= 10
    man = t._manifest(parent)
    assert sum(len(fl) for fl in man["partitions"].values()) == 104


def test_gc_reaps_unreferenced_chunks(spark, tmp_path):
    root = tmp_path / "g"
    t = AtomicParquetTable(spark, str(root), keys=["k"])
    for i in range(5):
        t.upsert(
            _df(spark, [(k, float(i), i) for k in range(20)]),
            [F.col("ts").desc()],
        )
    chunk_dir = root / "_manifests" / "chunks"

    def on_disk():
        return {
            n for n in os.listdir(chunk_dir)
            if n.startswith("c-")
            and (n.endswith(".json") or n.endswith(".json.gz"))
        }

    assert len(on_disk()) >= 5
    t.gc(keep_versions=2, min_age_seconds=0)
    live = set()
    for v in (3, 4):
        live.update(c["name"] for c in t._manifest_light(v)["chunks"])
    assert on_disk() == live
    # retained versions still read byte-correct; expired raise typed
    assert {r.v for r in t.read(version=3).collect()} == {3.0}
    assert {r.v for r in t.read().collect()} == {4.0}
    with pytest.raises(VersionExpiredError):
        t.read(version=0)


def test_mixed_format_history_compat(spark, tmp_path):
    """Format-1 history below, format-2 commits on top: read, time
    travel, CDC, restore and history all work across the boundary."""
    root = tmp_path / "m"
    t = AtomicParquetTable(spark, str(root), keys=["k"])
    t.upsert(_df(spark, [(k, 0.0, 0) for k in range(10)]),
             [F.col("ts").desc()])
    # rewrite v0 as a self-contained FORMAT-1 manifest (the pre-chunk
    # layout) and drop its now-unreferenced chunks
    man0 = dict(t._manifest(0))
    chunks0 = [c["name"] for c in t._manifest_light(0)["chunks"]]
    for k in ("format", "chunks", "n_files", "n_partitions"):
        man0.pop(k, None)
    mpath = root / "_manifests" / "v000000000000.json"
    json.dump(man0, open(mpath, "w"))
    for c in chunks0:
        os.unlink(root / "_manifests" / "chunks" / c)

    t = AtomicParquetTable(spark, str(root), keys=["k"])  # fresh cache
    assert t._manifest_light(0).get("format", 1) == 1
    # a commit on top of format-1 migrates: v1 is chunked
    t.upsert(_df(spark, [(k, 1.0, 1) for k in range(5)]),
             [F.col("ts").desc()])
    assert t._manifest_light(1)["format"] == 2
    # reads on both sides of the boundary
    assert {r.v for r in t.read(version=0).collect()} == {0.0}
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (k, 1.0 if k < 5 else 0.0) for k in range(10)
    ]
    # timestamp time travel across the boundary (v0 has an in-commit
    # timestamp from before the rewrite; ordering must hold)
    assert t.version_at(t._commit_time_ms(0)) == 0
    assert t.version_at(t._commit_time_ms(1)) == 1
    # CDC across the boundary: exactly the 5 updated keys
    ch = t.changes(0, 1)
    assert sorted(
        (r.k, r._change_type) for r in ch.collect()
    ) == [(k, "update") for k in range(5)]
    # restore back to the format-1 snapshot, then verify + history
    t.restore(version=0)
    assert {r.v for r in t.read().collect()} == {0.0}
    h = t.history()
    assert [r["version"] for r in h] == [2, 1, 0]
    assert h[0]["n_files"] == h[-1]["n_files"]


def test_chunked_manifest_end_to_end_real_data(spark, tmp_path):
    """Full stack over real parquet: clustered file-scoped upserts,
    stats/bloom pruning, changes(), restore — all through chunked
    manifests (chunk_target forced tiny so every path crosses chunk
    boundaries)."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "e"), keys=["k"],
        cluster_by=["k"], cluster_files=4, index_by=["v"],
    )
    t.chunk_target = 3
    t.upsert(_df(spark, [(k, float(k), 0) for k in range(40)]),
             [F.col("ts").desc()])
    t.upsert(_df(spark, [(k, float(k) + 100, 1) for k in (3, 17)]),
             [F.col("ts").desc()])
    assert len(t._manifest_light(t.current_version())["chunks"]) >= 2
    got = {r.k: r.v for r in t.read().collect()}
    assert got[3] == 103.0 and got[17] == 117.0 and got[5] == 5.0
    assert len(got) == 40
    # stats pruning still works through assembly
    rep = t.skipping_report([("k", "=", 5)])
    assert rep["files_kept"] < rep["files_total"]
    assert [r.k for r in t.read(where=[("k", "=", 5)]).collect()] == [5]
    # CDC: the two upserted keys only
    assert sorted(r.k for r in t.changes(0, 1).collect()) == [3, 17]
    # restore + read-back
    t.restore(version=0)
    assert {r.v for r in t.read().collect()} == {float(k) for k in range(40)}


def test_cdc_diff_opens_only_changed_chunks(spark, tmp_path, read_log):
    """changes()/CDC planning is O(changed chunks): between two
    versions of a 100k-entry table that differ in one partition, the
    chunk-level diff opens ≤ a handful of chunk files on each side and
    produces exactly the exclusive file sets — shared (carried-by-name)
    chunks never open; files that merely moved between chunks during
    small-chunk maintenance cancel."""
    t, by_part = _synthetic_table(spark, tmp_path)
    t._commit(
        0, {"p=7": ["p=7/f-new-0001.parquet"]}, set(),
        "k int, v double, ts int",
        replaced_files={"p=7": set(by_part["p=7"][:3])},
        precomputed_stats={},
    )
    read_log.clear()
    t._light_cache.clear()
    only_a, only_b = t._diff_sides(0, 1)
    assert len(_chunk_reads(read_log)) <= 4
    assert set(only_a) == {"p=7"} and set(only_b) == {"p=7"}
    assert only_a["p=7"] == set(by_part["p=7"][:3])
    assert only_b["p=7"] == {"p=7/f-new-0001.parquet"}
    # _changed_parts rides the same primitive
    read_log.clear()
    assert t._changed_parts(0, 1) == {"p=7"}
    assert len(_chunk_reads(read_log)) <= 4

    # stream-side twin: same bound, same diff
    from stupp_exclusion_etl_spark.sources.changes_stream import (
        _diff_versions,
    )

    fa, fb, _stats = _diff_versions(t.path, 0, 1)
    assert fa == set(by_part["p=7"][:3])
    assert fb == {"p=7/f-new-0001.parquet"}


def test_predicated_read_opens_only_matching_chunks(spark, tmp_path,
                                                    read_log):
    """read(where=...) is O(matching chunks): the commit record's
    per-chunk partition coverage and column ranges (manifest-list
    summaries) decide which chunks to open; results must equal the
    unpruned filter exactly."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "pr"), keys=["k"],
        cluster_by=["k"], cluster_files=8,
    )
    t.chunk_target = 2  # force many chunks over the 8 clustered files
    t.upsert(
        spark.createDataFrame(
            [(k, float(k), 0) for k in range(4000)],
            "k int, v double, ts int",
        ),
        [F.col("ts").desc()],
    )
    light = t._manifest_light(t.current_version())
    n_chunks = len(light["chunks"])
    assert n_chunks >= 4
    # ranges recorded for the clustered column
    assert all("ranges" in c and "k" in c["ranges"] for c in light["chunks"])

    read_log.clear()
    got = sorted(r.k for r in t.read(where=[("k", "=", 1234)]).collect())
    assert got == [1234]
    opened = _chunk_reads(read_log)
    assert 0 < len(set(opened)) < n_chunks, (len(opened), n_chunks)
    # range probe
    read_log.clear()
    got = sorted(
        r.k for r in t.read(where=[("k", ">=", 3990)]).collect()
    )
    assert got == list(range(3990, 4000))
    assert len(set(_chunk_reads(read_log))) < n_chunks

    # equality with the unpruned path on a broad predicate
    assert t.read(where=[("v", "<", 50.0)]).count() == 50


def test_partition_predicate_prunes_chunks(spark, tmp_path, read_log):
    t, _ = _synthetic_table(spark, tmp_path)  # 100 partitions, ~100 chunks
    # same layout viewed as a PARTITIONED table (the synthetic builder
    # writes Hive-style dirs but declares no partition columns)
    tp = AtomicParquetTable(
        spark, t.path, keys=["k"], partition_by=["p"]
    )
    read_log.clear()
    man = tp._manifest_where(0, [("p", "=", "x")])  # no such partition
    assert man["partitions"] == {}
    assert _chunk_reads(read_log) == []
    # a real partition opens only its covering chunks
    read_log.clear()
    man = tp._manifest_where(0, [("p", "=", "7")])
    # neighbors sharing the opened chunks ride along (the file-level
    # prune drops them); the point is the chunk count, not the payload
    assert "p=7" in man["partitions"]
    assert 0 < len(_chunk_reads(read_log)) <= 3
    assert len(man["partitions"]) <= 3 * 2  # ≤ opened chunks' coverage


def test_append_only_upsert_opens_no_chunks(spark, tmp_path, read_log):
    """A batch whose keys lie beyond every chunk's k0 range summary is
    a PROVEN append: the chunk-pruned probe assembles nothing, the
    candidate set is {} (not unknown), no existing file is re-merged
    and no chunk is opened — the metadata cost of appending to a huge
    clustered table is O(1)."""
    t = AtomicParquetTable(
        spark, str(tmp_path / "ap"), keys=["k"],
        cluster_by=["k"], cluster_files=4,
    )
    t.chunk_target = 2
    t.upsert(
        spark.createDataFrame(
            [(k, float(k), 0) for k in range(1000)],
            "k int, v double, ts int",
        ),
        [F.col("ts").desc()],
    )
    files_before = sorted(
        f for fl in t._manifest(0)["partitions"].values() for f in fl
    )
    read_log.clear()
    t.upsert(
        spark.createDataFrame(
            [(k, 1.0, 1) for k in range(5000, 5020)],
            "k int, v double, ts int",
        ),
        [F.col("ts").desc()],
    )
    assert _chunk_reads(read_log) == []  # probe + commit: zero opens
    man = t._manifest(t.current_version())
    files_after = sorted(
        f for fl in man["partitions"].values() for f in fl
    )
    # every pre-existing file carried forward; only new files added
    assert set(files_before) <= set(files_after)
    assert t.read().count() == 1020
    got = {r.k: r.v for r in t.read(where=[("k", ">=", 5000)]).collect()}
    assert got == {k: 1.0 for k in range(5000, 5020)}


def test_skipping_report_chunk_counters(spark, tmp_path):
    t = AtomicParquetTable(
        spark, str(tmp_path / "sr"), keys=["k"],
        cluster_by=["k"], cluster_files=8,
    )
    t.chunk_target = 2
    t.upsert(
        spark.createDataFrame(
            [(k, float(k), 0) for k in range(2000)],
            "k int, v double, ts int",
        ),
        [F.col("ts").desc()],
    )
    rep = t.skipping_report([("k", "=", 77)])
    assert rep["files_kept"] < rep["files_total"]
    assert 0 < rep["chunks_opened"] < rep["chunks_total"]
    rep_all = t.skipping_report([("v", ">=", 0.0)])
    assert rep_all["chunks_opened"] == rep_all["chunks_total"]


def _kstats(lo: int, hi: int) -> dict:
    return {"rows": 10, "cols": {"k": {"t": "i", "min": lo, "max": hi,
                                       "nulls": 0}}}


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_cluster_aware_packing_keeps_point_probes_o1(
    spark, tmp_path, read_log
):
    """Chunk packing orders entries by the first cluster column's
    per-file min (VERDICT r11 task #1): on a 100k-entry key-clustered
    table whose FILE NAMES are uncorrelated with key ranges (txn-uuid
    prefixes, the production shape), and after 60 interleaved
    file-scoped merges scattered across the key space, a clustered
    point probe still admits O(1) chunks — (partition, filename)
    packing would interleave key ranges and decay toward opening
    every chunk."""
    import hashlib

    t = AtomicParquetTable(
        spark, str(tmp_path / "c"), keys=["k"], cluster_by=["k"],
    )
    n = 100_000

    def fname(i: int, gen: int = 0) -> str:
        h = hashlib.md5(f"{i}-{gen}".encode()).hexdigest()[:12]
        return f"t-{h}-{i:06d}-{gen}.parquet"

    files = {i: fname(i) for i in range(n)}
    stats = {files[i]: _kstats(i * 10, i * 10 + 9) for i in range(n)}
    v = t._commit(None, {"": sorted(files.values())}, set(),
                  "k int, v double, ts int", precomputed_stats=stats)

    # 60 interleaved file-scoped merges, each retiring 3 files from
    # scattered key regions and adding same-range replacements
    for j in range(60):
        idxs = [(j * 37 + off) % n for off in (0, 33_341, 66_727)]
        retired = {files[i] for i in idxs}
        add, add_stats = [], {}
        for i in idxs:
            nf = fname(i, gen=j + 1)
            files[i] = nf
            add.append(nf)
            add_stats[nf] = _kstats(i * 10, i * 10 + 9)
        v = t._commit(
            v, {"": sorted(add)}, set(), "k int, v double, ts int",
            replaced_files={"": retired}, precomputed_stats=add_stats,
        )

    light = t._manifest_light(v)
    assert light["n_files"] == n
    n_chunks = len(light["chunks"])
    assert n_chunks >= 64

    # clustered point probes across the key space admit O(1) chunks
    for probe in (5, 500_005, 999_991):
        rep = t.skipping_report([("k", "=", probe)])
        assert rep["chunks_total"] == n_chunks
        assert rep["chunks_opened"] <= 4, (probe, rep["chunks_opened"])
        # and the file-level prune inside the admitted chunks still
        # lands on exactly the one covering file
        assert rep["files_kept"] == 1 and rep["kept"] == [
            files[probe // 10]
        ], probe

    # the predicated assembly path opens only the admitted chunks
    read_log.clear()
    t._chunk_cache.clear()
    man = t._manifest_where(v, [("k", "=", 500_005)])
    assert len(_chunk_reads(read_log)) <= 4
    assert files[50_000] in man["partitions"][""]

    # range probe over ~1% of the key space: a narrow slice of chunks
    rep = t.skipping_report([("k", ">=", 0), ("k", "<", 10_000)])
    assert rep["chunks_opened"] <= max(4, n_chunks // 20), rep


def test_chunks_are_gzipped_and_mixed_history_reads(spark, tmp_path):
    """r12: chunk payloads are gzip JSON (~10× smaller — the cold
    full-snapshot assembly is I/O-bound on chunk bytes at ~1M
    entries); a history mixing legacy plain-.json chunks with .json.gz
    chunks keeps read/time-travel/CDC semantics, and gc reaps both
    suffixes."""
    import gzip

    root = tmp_path / "z"
    t = AtomicParquetTable(spark, str(root), keys=["k"])
    t.upsert(_df(spark, [(k, 0.0, 0) for k in range(30)]),
             [F.col("ts").desc()])
    cdir = root / "_manifests" / "chunks"
    names0 = [c["name"] for c in t._manifest_light(0)["chunks"]]
    assert all(n.endswith(".json.gz") for n in names0)

    # bytes bound: gzip JSON beats the plain payload it encodes
    for n in names0:
        raw = (cdir / n).read_bytes()
        plain = gzip.decompress(raw)
        assert len(raw) < len(plain)
        json.loads(plain)  # well-formed

    # rewrite v0's chunks as LEGACY plain .json (pre-r12 history)
    light0 = json.loads(
        (root / "_manifests" / "v000000000000.json").read_text()
    )
    for c in light0["chunks"]:
        old = c["name"]
        new = old[: -len(".gz")]
        (cdir / new).write_bytes(gzip.decompress((cdir / old).read_bytes()))
        os.unlink(cdir / old)
        c["name"] = new
    (root / "_manifests" / "v000000000000.json").write_text(
        json.dumps(light0)
    )

    t = AtomicParquetTable(spark, str(root), keys=["k"])  # fresh caches
    assert t.read(version=0).count() == 30
    # a commit on top carries the legacy chunks BY NAME (no rewrite)
    t.upsert(_df(spark, [(k, 1.0, 1) for k in range(5)]),
             [F.col("ts").desc()])
    names1 = {c["name"] for c in t._manifest_light(1)["chunks"]}
    legacy = {c["name"] for c in light0["chunks"]}
    # mixed suffixes in ONE record (carried legacy + new gz), unless
    # small-chunk maintenance merged everything (then all gz)
    assert names1 & legacy or all(n.endswith(".json.gz") for n in names1)
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (k, 1.0 if k < 5 else 0.0) for k in range(30)
    ]
    assert sorted(r.k for r in t.changes(0, 1).collect()) == list(range(5))

    # stream-side twin reads both suffixes too
    from stupp_exclusion_etl_spark.sources.changes_stream import (
        _diff_versions,
    )

    fa, fb, _stats = _diff_versions(str(root), 0, 1)
    assert fb and all(f.endswith(".parquet") for f in fb)

    # gc reaps expired chunks of BOTH suffixes
    t.upsert(_df(spark, [(k, 2.0, 2) for k in range(5)]),
             [F.col("ts").desc()])
    t.gc(keep_versions=1, min_age_seconds=0)
    left = {
        n for n in os.listdir(cdir)
        if n.startswith("c-") and not n.endswith(".crc")
    }
    live = {c["name"] for c in t._manifest_light(2)["chunks"]}
    assert left == live
