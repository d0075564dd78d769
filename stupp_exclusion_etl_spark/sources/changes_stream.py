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
  and data files are immutable, so ``readBetweenOffsets`` reproduces a
  batch bit-for-bit (failure-recovery replay);
- ``commit`` is the retention hook (a real deployment gates
  ``gc(keep_versions=...)`` on it so un-consumed versions stay
  time-travelable).

The diff itself mirrors sinks/atomic.py `changes`: only files that
entered/left the manifest between the two versions are read, copied
rows compare equal and drop out. This SimpleDataSourceStreamReader
serves rows through the driver (the Simple API's contract — same as
sources/replay_stream.py); at 100 TB the same offsets would drive a
partition-planning `streamReader` or a `foreachBatch` loop calling
``changes(since, until)`` with full cluster parallelism — the offset
algebra is the part this connector pins down.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


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


def _manifest(path: str, version: int) -> dict:
    with open(
        os.path.join(path, _MANIFEST_DIR, f"v{version:012d}.json")
    ) as fh:
        return json.load(fh)


def _read_rows(path: str, files: set[str], cols: list[str]):
    """{key-agnostic} pandas frame over a bounded file set, aligned to
    ``cols`` (missing columns — schema evolution — become None)."""
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for f in sorted(files):
        t = pq.read_table(os.path.join(path, _DATA_DIR, f))
        pdf = t.to_pandas()
        # partition-dir virtual columns are not in the files; changes()
        # on partitioned tables goes through the Spark API — this
        # connector targets unpartitioned (key-clustered) CDC tables
        frames.append(pdf)
    if not frames:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.concat(frames, ignore_index=True)
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def _diff(path: str, keys: list[str], cols: list[str], types: list[str],
          man_a: dict, man_b: dict):
    """Row-level (values..., _change_type) tuples between two
    manifests — the pandas twin of AtomicParquetTable.changes."""
    files_a = {f for fl in man_a["partitions"].values() for f in fl}
    files_b = {f for fl in man_b["partitions"].values() for f in fl}
    old = _read_rows(path, files_a - files_b, cols)
    new = _read_rows(path, files_b - files_a, cols)
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


class AtomicChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options["path"].rstrip("/")
        self.keys = [k.strip() for k in options["keys"].split(",")]
        self.from_version = options.get("from_version")
        man = _manifest(self.path, _current_version(self.path))
        self.cols = _ddl_fields(man["schema_ddl"])
        self.types = _ddl_types(man["schema_ddl"])

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        if self.from_version is not None:
            return {"version": int(self.from_version)}
        return {"version": _current_version(self.path)}

    def read(self, start: dict):
        a = start["version"]
        b = _current_version(self.path)
        if b is None or b <= a:
            return iter([]), {"version": a}
        rows = _diff(
            self.path, self.keys, self.cols, self.types,
            _manifest(self.path, a), _manifest(self.path, b),
        )
        return iter(rows), {"version": b}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        rows = _diff(
            self.path, self.keys, self.cols, self.types,
            _manifest(self.path, start["version"]),
            _manifest(self.path, end["version"]),
        )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # retention hook: production gates gc(keep_versions) here


class AtomicChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "atomic_changes"

    def schema(self) -> str:
        path = self.options["path"].rstrip("/")
        man = _manifest(path, _current_version(path))
        return man["schema_ddl"] + ", _change_type string"

    def simpleStreamReader(self, schema):  # noqa: N802 — API name
        return AtomicChangesStreamReader(self.options)


def register_changes_stream(spark) -> None:
    spark.dataSource.register(AtomicChangesDataSource)
