"""Streaming change-data-feed source over the atomic table: each
committed manifest version becomes a micro-batch of row-level
insert/update/delete changes — `readStream` CDC consumption of the
table, the streaming twin of ``AtomicParquetTable.changes``
(sinks/atomic.py) and the connector a downstream incremental pipeline
(tokenization, indexing, dedup refresh) subscribes to instead of
rescanning snapshots. Reference parity: the scraper's repeated polling
loop re-reads whole endpoints (reference __main__.py scan loop); the
feed turns the same "what changed since last time" question into an
offset-tracked stream.

Offsets are manifest versions — ``{"version": v}`` means "all changes
through manifest v have been served", so exactly-once is structural:

- a NEW query starts from the table's current version (option
  ``from_version`` rewinds for backfill);
- a RESTARTED query resumes from the checkpointed version; manifests
  and data files are immutable, so re-planning the same offset range
  reproduces a batch bit-for-bit (failure-recovery replay);
- ``commit`` is the retention hook (a real deployment gates
  ``gc(keep_versions=...)`` on it so un-consumed versions stay
  time-travelable).

This is the partition-planning ``DataSourceStreamReader``: the DRIVER
only diffs the two manifests (metadata) and groups the entered/left
files into KEY-RANGE-DISJOINT partitions using the manifest's per-file
[min,max] stats on the first key column — two files land in the same
partition iff their key ranges touch, so every key's old and new rows
meet inside one task and the per-partition diff is complete for its
keys. Row data is then read and diffed ON EXECUTORS
(``read(partition)`` runs inside Spark tasks) — change rows never
transit the driver, unlike the Simple-reader API. Files with no usable
key stats collapse the plan to one partition (still executor-side) —
the conservative fallback, never a wrong answer. The diff itself
mirrors sinks/atomic.py `changes`: only files that entered/left the
manifest between the two versions are read; rows merely COPIED into
rewritten files compare equal and drop out, so a compaction yields an
empty feed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

#: driver-side cap on micro-batch partitions: adjacent key-range groups
#: are merged down to this many tasks (override with option
#: ``max_partitions``) — a huge backlog batch should not explode into
#: thousands of tiny tasks
_DEFAULT_MAX_PARTITIONS = 32


def _ddl_parts(ddl: str) -> list[str]:
    """Top-level `name TYPE` chunks of a DDL schema string (depth-aware
    so array<struct<a,b>> commas don't split)."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _ddl_fields(ddl: str) -> list[str]:
    return [p.split()[0] for p in _ddl_parts(ddl)]


def _ddl_types(ddl: str) -> list[str]:
    return [p.split(None, 1)[1].lower() for p in _ddl_parts(ddl)]


def _coerce(v, typ: str):
    """Undo pandas' outer-merge NaN-widening so yielded values match
    the declared Spark schema (int columns come back float64 once a
    NaN entered the frame)."""
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or (
        not isinstance(v, (str, bytes, list, tuple)) and pd.isna(v)
    ):
        return None
    if "int" in typ or typ in ("long", "short", "byte"):
        return int(v)
    if typ in ("double", "float"):
        return float(v)
    if typ == "boolean":
        return bool(v)
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    return v


def _current_version(path: str) -> int | None:
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions) if versions else None


def _manifest_light(path: str, version: int) -> dict:
    """The commit record alone — schema/timestamp/offset fields. For
    format-2 tables this never opens an entry chunk, which is what
    keeps the stream's offset math O(1) per poll on a huge table."""
    with open(
        os.path.join(path, _MANIFEST_DIR, f"v{version:012d}.json")
    ) as fh:
        return json.load(fh)


def _read_chunk_file(path: str, name: str) -> dict:
    """One entry chunk's payload — gzip (``.json.gz``, the r12 write
    format) or legacy plain JSON, dispatched on the suffix, mirroring
    the sink side's _decode_chunk_payload."""
    full = os.path.join(path, _MANIFEST_DIR, "chunks", name)
    with open(full, "rb") as fh:
        raw = fh.read()
    if name.endswith(".gz"):
        import gzip

        raw = gzip.decompress(raw)
    return json.loads(raw.decode("utf-8"))


def _manifest(path: str, version: int) -> dict:
    """Assembled snapshot (full partitions + stats): format-1 records
    as-is; format-2 records get their entry chunks merged — only the
    format-1 fallback of the diff pays this."""
    man = _manifest_light(path, version)
    if man.get("format", 1) == 1:
        return man
    parts: dict[str, list[str]] = {}
    stats: dict[str, dict] = {}
    for ch in man["chunks"]:
        data = _read_chunk_file(path, ch["name"])
        for p, fl in data["partitions"].items():
            parts.setdefault(p, []).extend(fl)
        stats.update(data.get("stats", {}))
    man = dict(man)
    man["partitions"] = {p: sorted(fl) for p, fl in sorted(parts.items())}
    man["stats"] = stats
    return man


def _diff_versions(
    path: str, va: int | None, vb: int
) -> tuple[set, set, dict]:
    """(files only at va, files only at vb, stats for those files) —
    the micro-batch's input. CHUNK-LEVEL on format-2 history (the
    stream-side twin of AtomicParquetTable._diff_sides): chunks the
    two commit records share by name are byte-identical and cannot
    contribute entered/left files, so each poll's planning opens only
    the differing chunks — O(changed chunks) driver I/O per batch, not
    O(table). A diff file's stats ride in the differing chunk that
    holds it, so key-range grouping needs nothing further. Files that
    merely moved between chunks (small-chunk maintenance) appear on
    both sides and cancel. ``va=None`` (bootstrap) serves the whole vb
    snapshot."""
    la = None if va is None else _manifest_light(path, va)
    lb = _manifest_light(path, vb)
    if (la is None or la.get("format", 1) == 2) and lb.get("format", 1) == 2:
        names_a = set() if la is None else {c["name"] for c in la["chunks"]}
        names_b = {c["name"] for c in lb["chunks"]}
        stats: dict = {}

        def side(light, other_names) -> set:
            out: set = set()
            if light is None:
                return out
            for ch in light["chunks"]:
                if ch["name"] in other_names:
                    continue
                data = _read_chunk_file(path, ch["name"])
                for fl in data["partitions"].values():
                    out.update(fl)
                stats.update(data.get("stats", {}))
            return out

        fa = side(la, names_b)
        fb = side(lb, names_a)
    else:
        man_a = (
            {"partitions": {}, "stats": {}}
            if va is None
            else _manifest(path, va)
        )
        man_b = _manifest(path, vb)
        fa = {f for fl in man_a["partitions"].values() for f in fl}
        fb = {f for fl in man_b["partitions"].values() for f in fl}
        stats = {**man_a.get("stats", {}), **man_b.get("stats", {})}
    return fa - fb, fb - fa, stats


def _partition_values(rel_path: str) -> dict[str, str | None]:
    """Hive partition-dir values parsed from a file's manifest-relative
    path (``event_type=click/part-...parquet``): percent-unescaped the
    way Spark's writer escaped them; __HIVE_DEFAULT_PARTITION__ ⇒ NULL.
    Empty for unpartitioned tables (no '=' dir segments)."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for seg in rel_path.split("/")[:-1]:
        name, eq, raw = seg.partition("=")
        if eq:
            out[name] = (
                None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
            )
    return out


def _read_rows(path: str, files, cols: list[str], types: list[str]):
    """pandas frame over a bounded file set, aligned to ``cols``
    (missing columns — schema evolution — become None). Partition-dir
    VIRTUAL columns are not stored in the files: they are parsed from
    each file's Hive path segments and filled as constants, coerced to
    the declared schema type — so partitioned CDC tables stream the
    same way unpartitioned ones do."""
    import pandas as pd
    import pyarrow.parquet as pq

    type_of = dict(zip(cols, types))
    frames = []
    for f in sorted(files):
        t = pq.read_table(os.path.join(path, _DATA_DIR, f))
        pdf = t.to_pandas()
        for name, raw in _partition_values(f).items():
            if name in pdf.columns or name not in type_of:
                continue
            typ = type_of[name]
            if raw is None:
                val = None
            elif "int" in typ or typ in ("long", "short", "byte"):
                val = int(raw)
            elif typ in ("double", "float"):
                val = float(raw)
            elif typ == "boolean":
                val = raw == "true"
            elif typ == "date":
                import datetime as _dt

                val = _dt.date.fromisoformat(raw)
            elif typ.startswith("timestamp"):
                # Spark writes partition timestamps as
                # "YYYY-MM-DD HH%3AMM%3ASS[.ffffff]"; raw arrives
                # percent-unescaped from _partition_values
                val = pd.Timestamp(raw)
            else:
                val = raw
            pdf[name] = val
        frames.append(pdf)
    if not frames:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.concat(frames, ignore_index=True)
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def _diff_files(path: str, keys: list[str], cols: list[str],
                types: list[str], files_old, files_new):
    """Row-level (values..., _change_type) tuples between two bounded
    file sets — the per-partition pandas twin of
    AtomicParquetTable.changes. Deterministic (key-sorted) so a
    checkpoint replay reproduces the batch bit-for-bit."""
    old = _read_rows(path, files_old, cols, types)
    new = _read_rows(path, files_new, cols, types)
    merged = new.merge(
        old, on=keys, how="outer", suffixes=("", "__old"),
        indicator=True,
    )
    data_cols = [c for c in cols if c not in keys]
    out = []
    for _, r in merged.iterrows():
        if r["_merge"] == "left_only":
            ct = "insert"
        elif r["_merge"] == "right_only":
            ct = "delete"
        else:
            same = all(
                (r[c] == r[f"{c}__old"])
                or (r[c] != r[c] and r[f"{c}__old"] != r[f"{c}__old"])
                or (r[c] is None and r[f"{c}__old"] is None)
                for c in data_cols
            )
            if same:
                continue
            ct = "update"
        vals = [
            _coerce(
                r[f"{c}__old"] if ct == "delete" and c not in keys
                else r[c],
                t,
            )
            for c, t in zip(cols, types)
        ]
        out.append((*vals, ct))
    # deterministic batch order for replay bit-identity
    key_idx = [cols.index(k) for k in keys]
    out.sort(key=lambda t: tuple((t[i] is None, t[i]) for i in key_idx))
    return out


def _key_bounds(man: dict, f: str, k0: str):
    """(lo, hi) of the first key column for one file from the manifest
    stats, or None when unusable for range grouping (missing stats,
    unknown bounds, or NULL keys present — a NULL can't be assigned a
    range, so such files force the single-partition fallback)."""
    st = ((man.get("stats", {}).get(f) or {}).get("cols") or {}).get(k0)
    if st is None:
        return None
    lo, hi, nulls = st.get("min"), st.get("max"), st.get("nulls")
    if lo is None or hi is None or nulls is None or nulls > 0:
        return None
    return lo, hi


def _plan_groups(
    man_a: dict, man_b: dict, k0: str, max_partitions: int
) -> list[tuple[list[str], list[str]]]:
    """Manifest-dict facade over _plan_groups_files (kept for tests /
    format-1 callers): computes the two-sided file diff and merged
    stats, then key-range-groups them."""
    files_a = {f for fl in man_a["partitions"].values() for f in fl}
    files_b = {f for fl in man_b["partitions"].values() for f in fl}
    stats = {**man_a.get("stats", {}), **man_b.get("stats", {})}
    return _plan_groups_files(
        files_a - files_b, files_b - files_a, stats, k0, max_partitions
    )


def _plan_groups_files(
    files_old: set, files_new: set, stats: dict, k0: str,
    max_partitions: int,
) -> list[tuple[list[str], list[str]]]:
    """Group the entered/left files into key-range-disjoint
    (files_old, files_new) partitions via an interval sweep over the
    manifest's per-file [min,max] on ``k0`` (metadata only — no data
    I/O on the driver). Two files share a partition iff their key
    ranges overlap (transitively), so any given key's old and new rows
    are guaranteed to meet inside exactly one partition — the property
    that makes the per-partition outer-join diff complete. Any file
    without usable bounds collapses to one partition (sound, just
    unparallel). Adjacent groups merge down to ``max_partitions``."""
    sides = [(f, 0) for f in files_old] + [(f, 1) for f in files_new]
    if not sides:
        return []
    items = []
    for f, side in sides:
        b = _key_bounds({"stats": stats}, f, k0)
        if b is None:
            return [(sorted(files_old), sorted(files_new))]
        items.append((b[0], b[1], f, side))
    items.sort(key=lambda t: (t[0], t[1], t[2]))
    groups: list[list[set]] = []
    cur_hi = None
    for lo, hi, f, side in items:
        if cur_hi is None or lo > cur_hi:
            groups.append([set(), set()])
            cur_hi = hi
        else:
            cur_hi = max(cur_hi, hi)
        groups[-1][side].add(f)
    if len(groups) > max_partitions:
        # merge ADJACENT groups (they stay key-disjoint supersets)
        step = -(-len(groups) // max_partitions)
        groups = [
            [
                set().union(*(g[0] for g in groups[i : i + step])),
                set().union(*(g[1] for g in groups[i : i + step])),
            ]
            for i in range(0, len(groups), step)
        ]
    return [(sorted(g[0]), sorted(g[1])) for g in groups]


class ChangesPartition(InputPartition):
    """One key-range-disjoint slice of a micro-batch: the old/new files
    whose rows one task reads and diffs. Self-contained (path, keys,
    schema ride along) so ``read`` needs no driver state."""

    def __init__(self, path, keys, cols, types, files_old, files_new,
                 end_version=None):
        self.path = path
        self.keys = keys
        self.cols = cols
        self.types = types
        self.files_old = files_old
        self.files_new = files_new
        # batch END version, carried per-row when emit_end_version is
        # on — a foreachBatch consumer needs it to time-travel-read
        # the source at the snapshot the batch was planned from (a
        # commit landing mid-drain otherwise skews verification)
        self.end_version = end_version


def _version_at(path: str, timestamp_ms: int) -> int:
    """Newest retained version committed at or before the instant —
    the stream-side twin of AtomicParquetTable.version_at (in-commit
    timestamp preferred, manifest-file mtime for pre-feature
    manifests). Raises when the instant predates the oldest retained
    commit: an expired starting point cannot be reconstructed."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    versions = sorted(
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ) if os.path.isdir(mdir) else []
    if not versions:
        raise ValueError(f"atomic_changes: no committed table at {path!r}")
    best = None
    prev_ts = None
    for v in versions:
        man_ts = _manifest_light(path, v).get("committed_at_ms")
        if man_ts is None:
            man_ts = int(os.path.getmtime(
                os.path.join(mdir, f"v{v:012d}.json")
            ) * 1000)
        # clamp, mirroring AtomicParquetTable.version_at: the FS-mtime
        # fallback for pre-feature manifests is not monotone (a
        # copy/sync of the table directory rewrites mtimes), and a
        # non-monotone reading would break the early exit below and
        # resolve a wrong older version
        if prev_ts is not None and man_ts <= prev_ts:
            man_ts = prev_ts + 1
        prev_ts = man_ts
        if man_ts <= timestamp_ms:
            best = v  # in-commit timestamps increase with version
        else:
            break
    if best is None:
        raise ValueError(
            f"atomic_changes: from_timestamp_ms={timestamp_ms} predates "
            f"the oldest retained commit of {path!r} (v{versions[0]}) — "
            "expired by gc() or before table creation"
        )
    return best


class AtomicChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options["path"].rstrip("/")
        self.keys = [k.strip() for k in options["keys"].split(",")]
        self.from_version = options.get("from_version")
        # startingTimestamp idiom: subscribe AT the snapshot live at
        # the instant — the stream serves changes committed after it
        from_ts = options.get("from_timestamp_ms")
        if from_ts is not None:
            if self.from_version is not None:
                raise ValueError(
                    "pass from_version or from_timestamp_ms, not both"
                )
            self.from_version = _version_at(self.path, int(from_ts))
        self.max_partitions = int(
            options.get("max_partitions", _DEFAULT_MAX_PARTITIONS)
        )
        self.emit_end_version = (
            str(options.get("emit_end_version", "false")).lower()
            == "true"
        )
        # admission control (Kafka maxOffsetsPerTrigger / Delta
        # maxFilesPerTrigger analog): cap each micro-batch at K source
        # versions so a consumer catching up through a deep backlog —
        # a writer's commit burst, a compaction storm, a bootstrap
        # subscription over a big table — drains it as bounded,
        # checkpointed increments instead of one monster batch whose
        # state update must succeed wholesale. The pyspark DataSource
        # API exposes no ReadLimit hook, so the cap is enforced by
        # latestOffset() itself, anchored to the newest offset this
        # reader has PLANNED (partitions()) — initially the
        # subscription start (from_version, or the table head frozen
        # at reader construction). The engine asks latestOffset BEFORE
        # initialOffset, so the anchor cannot wait for the latter.
        #
        # Checkpoint-restart is the one case where the anchor can sit
        # BEHIND the engine's committed offset (the API gives a
        # restarted reader no start context): a capped offer at or
        # below the committed offset is simply declined — no batch, no
        # partitions() call. The ratchet below detects the decline
        # (two latestOffset calls with no partitions() between, last
        # offer strictly above the anchor) and re-offers K versions
        # higher, so the stream provably cannot stall: each poll
        # advances the offer by K until it clears the committed offset
        # and batches resume, capped. A caught-up stream never
        # ratchets (its offer equals the anchor).
        mvpt = options.get("max_versions_per_trigger")
        self.max_versions_per_trigger = None if mvpt is None else int(mvpt)
        if (
            self.max_versions_per_trigger is not None
            and self.max_versions_per_trigger < 1
        ):
            raise ValueError(
                "max_versions_per_trigger must be >= 1, got "
                f"{self.max_versions_per_trigger}"
            )
        self._last_end: int | None = None
        self._pending_offer: int | None = None
        self._planned_since_offer = False
        # opt-in engine-call trace (option ``call_log`` = file path):
        # the rate-cap ratchet and bootstrap anchoring above depend on
        # OBSERVED-not-documented MicroBatchExecution behavior
        # (pyspark 4.1.2 processingTime sequence per trigger:
        # latestOffset BEFORE initialOffset at start; then
        # partitions → commit(end) → latestOffset per completed batch
        # — a fresh reader after checkpoint restart sees NO commit
        # before its first offer, which is what the ratchet covers;
        # this trace corrected the earlier r10 reading that commit()
        # never fired on this path at all). The reader runs
        # in its own python worker process, so tests cannot spy on it
        # in-memory — this appends one line per engine call to a file,
        # and the canary test (tests/test_changes_stream.py) fails
        # LOUDLY if a pyspark upgrade changes the call sequence those
        # mechanisms are anchored to.
        self._call_log = options.get("call_log")
        cur = _current_version(self.path)
        if cur is None:
            raise ValueError(
                f"atomic_changes: no committed table at {self.path!r} "
                "— the stream needs at least one manifest to resolve "
                "the schema; commit a first batch before starting it"
            )
        man = _manifest_light(self.path, cur)
        self.cols = _ddl_fields(man["schema_ddl"])
        self.types = _ddl_types(man["schema_ddl"])
        # subscription start frozen at construction: the rate-cap
        # anchor before any batch is planned, and what initialOffset
        # serves (reading the head again THERE could race a writer
        # past the first capped offer)
        self._start_version = (
            int(self.from_version) if self.from_version is not None else cur
        )

    # -- offsets (driver, metadata-only) ------------------------------

    def _trace(self, line: str) -> None:
        if self._call_log:
            with open(self._call_log, "a") as fh:
                fh.write(line + "\n")

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        self._trace("initialOffset")
        return {"version": self._start_version}

    def latestOffset(self) -> dict:  # noqa: N802 — API name
        self._trace("latestOffset")
        head = _current_version(self.path)
        if self.max_versions_per_trigger is None:
            return {"version": head}
        anchor = (
            self._last_end
            if self._last_end is not None
            else self._start_version
        )
        if (
            self._pending_offer is not None
            and not self._planned_since_offer
            and self._pending_offer > anchor
        ):
            # the engine declined the last offer without planning a
            # batch ⇒ its committed offset (which the API hides from
            # us — checkpoint restart) is at or past it; ratchet the
            # anchor forward so the stream cannot stall behind a
            # checkpoint this reader has never seen
            anchor = self._pending_offer
            self._last_end = anchor
        offer = min(head, anchor + self.max_versions_per_trigger)
        self._pending_offer = offer
        self._planned_since_offer = False
        return {"version": offer}

    # -- micro-batch planning (driver, metadata-only) ------------------

    def partitions(self, start: dict, end: dict):
        a, b = start["version"], end["version"]
        self._trace(f"partitions {a} {b}")
        # rate-cap anchor: every planned batch (including a pending
        # batch replayed after a checkpoint restart) re-establishes
        # where the next capped latestOffset() counts from
        self._planned_since_offer = True
        if b is not None:
            self._last_end = (
                b if self._last_end is None else max(self._last_end, b)
            )
        if b is None or b <= a:
            return []
        # from_version=-1: bootstrap subscription — diff against the
        # EMPTY baseline, so the first micro-batch serves the whole
        # snapshot as inserts and the stream tails from there (Delta
        # CDF's startingVersion=0 shape). Still partition-planned: the
        # snapshot's files group by key range like any other batch.
        # _diff_versions is chunk-level on format-2 history, so each
        # poll's planning opens O(changed chunks), not the whole
        # manifest.
        files_old, files_new, stats = _diff_versions(
            self.path, None if a < 0 else a, b
        )
        return [
            ChangesPartition(
                self.path, self.keys, self.cols, self.types, fo, fn,
                end_version=b if self.emit_end_version else None,
            )
            for fo, fn in _plan_groups_files(
                files_old, files_new, stats,
                self.keys[0],
                self.max_partitions,
            )
        ]

    # -- row production (EXECUTORS: runs inside Spark tasks) ----------

    def read(self, partition: ChangesPartition):
        rows = _diff_files(
            partition.path, partition.keys, partition.cols,
            partition.types, partition.files_old,
            partition.files_new,
        )
        if partition.end_version is not None:
            return iter(
                (*r, partition.end_version) for r in rows
            )
        return iter(rows)

    def commit(self, end: dict) -> None:
        self._trace(f"commit {end.get('version') if isinstance(end, dict) else end}")
        # retention hook: production gates gc(keep_versions) here.
        # Also a rate-cap anchor: after a checkpoint restart with no
        # pending batch, the first completed batch's commit is the
        # earliest point the API tells this reader where the stream is.
        v = end.get("version") if isinstance(end, dict) else None
        if v is not None:
            self._last_end = (
                v if self._last_end is None else max(self._last_end, v)
            )

    def stop(self) -> None:
        # intentionally a no-op: the reader is stateless between calls
        # (offsets live in the engine's checkpoint; each partitions()
        # plans from the manifest on demand), so there is nothing to
        # release — the DataSource API still requires the hook
        pass


class AtomicChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "atomic_changes"

    def schema(self) -> str:
        path = self.options["path"].rstrip("/")
        cur = _current_version(path)
        if cur is None:
            raise ValueError(
                f"atomic_changes: no committed table at {path!r} — "
                "commit a first batch before starting the stream"
            )
        man = _manifest_light(path, cur)
        ddl = man["schema_ddl"] + ", _change_type string"
        if str(self.options.get("emit_end_version", "false")).lower() == "true":
            # opt-in: the micro-batch's END version per row, so a
            # foreachBatch consumer can time-travel-read the source at
            # the exact snapshot this batch was diffed against
            ddl += ", _end_version bigint"
        return ddl

    def streamReader(self, schema):  # noqa: N802 — API name
        return AtomicChangesStreamReader(self.options)


def register_changes_stream(spark) -> None:
    spark.dataSource.register(AtomicChangesDataSource)
