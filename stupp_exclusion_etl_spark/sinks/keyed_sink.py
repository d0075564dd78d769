"""Keyed micro-batched upsert SINK as a Spark Python DataSource writer —
the reference's DynamoDB write path (A14 micro-batching `__main__.py:
61-66`, A15 keyed last-write-wins upsert + canonical ID copy
`__main__.py:8-24`, A16 auto-create, A20 per-entity counters) as a real
connector implementing the DataSourceWriter commit protocol, paired
with the read connector in sources/paged.py.

Faithful semantics:

- **Micro-batches of ``batch_size`` (default 20)**: each task flushes
  its rows to a staging file every 20 rows plus a tail flush — the
  reference's `len(batch) >= 20` guard before `batch_write_item` (the
  DynamoDB API caps batches at 25).
- **Canonical ID copy**: the configured ``key`` field is duplicated
  into an ``ID`` column (`'ID': document['M'][id_field]`).
- **Last-write-wins by key**: rows carry a monotone per-task sequence;
  commit() keeps the highest-sequence row per ID and merges over the
  existing table (append mode) or replaces it (overwrite). Idempotent
  re-runs converge exactly like the reference's re-scrapes.
- **Auto-create** (A16): the first commit creates the table; later
  commits upsert into it.
- **Commit protocol**: tasks stage under ``_staging_<uuid>/`` and
  report (task, rows, batches) WriterCommitMessages; commit() publishes
  atomically (temp file + os.replace) and records the A20-style batch
  counters in ``_meta.json``; abort() removes the staging dir so a
  failed job leaves the table untouched.

Scale honesty: merge mechanics in commit() are driver-side pyarrow —
right for a keyed-store EMULATION at test scale; at 100 TB commit()
instead issues the storage-native bulk upsert (DynamoDB batch_write /
Delta MERGE INTO) per staged batch, which is exactly what the staging
files are shaped for. The write-side protocol (chunking, ID copy,
sequencing, staging, atomic publish, abort) is the real thing.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _TaskCommit(WriterCommitMessage):
    task_id: str
    n_rows: int
    n_batches: int
    files: tuple


class KeyedUpsertWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.key = options.get("key", "id")
        self.batch_size = int(options.get("batch_size", 20))
        self.schema = schema
        self.overwrite = overwrite
        if self.key not in schema.fieldNames():
            raise ValueError(f"key column {self.key!r} not in schema")
        # write() injects these two columns; a user schema already carrying
        # them would be silently clobbered in the staged files.
        for reserved in ("ID", "__seq"):
            if reserved in schema.fieldNames():
                raise ValueError(
                    f"input schema must not contain reserved column "
                    f"{reserved!r} (injected by the keyed_upsert sink)"
                )
        # Shared-filesystem contract: tasks stage files with local-FS calls
        # (os.makedirs/pq.write_table) and commit() re-reads those paths on
        # the driver — correct on local[n] and any POSIX-shared mount (NFS);
        # a real multi-node object-store deployment swaps the staging I/O
        # for the store's client, same protocol. Enforced here so a
        # misconfigured remote path fails fast instead of losing staged
        # batches at commit time. file: URIs are NORMALIZED to plain local
        # paths (os.path.join would otherwise treat 'file:///x' as a
        # relative './file:' directory — the exact silent-misplacement
        # this guard exists to prevent; ADVICE r4); every other scheme is
        # rejected.
        if self.path.startswith("file:"):
            from urllib.parse import urlparse, unquote

            parsed = urlparse(self.path)
            # URI hosts are case-insensitive: compare parsed.hostname
            # (lowercased by urllib), so file://LOCALHOST/x is local.
            if parsed.hostname not in (None, "", "localhost"):
                raise ValueError(
                    f"keyed_upsert: file: URI with a remote host is not a "
                    f"local path (got {self.path!r})"
                )
            # urlparse silently strips '?query'/'#fragment', so a
            # POSIX-legal path like file:///tmp/run#1 would normalize to
            # /tmp/run and stage data in the WRONG directory — the exact
            # misplacement class this guard exists to prevent (ADVICE
            # r5). Reject instead of silently truncating.
            if parsed.query or parsed.fragment:
                raise ValueError(
                    f"keyed_upsert: file: URI {self.path!r} carries a "
                    "query/fragment component; percent-encode '?'/'#' in "
                    "the path or pass a plain local path"
                )
            local = unquote(parsed.path)
            if not local.startswith("/"):
                raise ValueError(
                    f"keyed_upsert: malformed file: URI {self.path!r}"
                )
            self.path = local
        elif "://" in self.path:
            raise ValueError(
                "keyed_upsert stages via the local filesystem; remote URIs "
                f"are not supported (got {self.path!r})"
            )
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")

    # -- executor side ----------------------------------------------------
    def write(self, rows) -> _TaskCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        task_id = uuid.uuid4().hex[:12]
        os.makedirs(self.staging, exist_ok=True)
        names = self.schema.fieldNames()
        key_idx = names.index(self.key)
        batch: list[tuple] = []
        files: list[str] = []
        n_rows = 0
        seq = 0

        def flush() -> None:
            nonlocal batch
            if not batch:
                return
            cols = {n: [r[i] for r in batch] for i, n in enumerate(names)}
            # A15: canonical ID copy + the last-write-wins sequence
            # (seq was appended as each row's final element)
            cols["ID"] = [str(r[key_idx]) for r in batch]
            cols["__seq"] = [r[-1] for r in batch]
            f = os.path.join(
                self.staging, f"{task_id}-{len(files):05d}.parquet"
            )
            pq.write_table(pa.table(cols), f)
            files.append(f)
            batch = []

        for row in rows:
            batch.append(tuple(row) + (seq,))
            seq += 1
            n_rows += 1
            if len(batch) >= self.batch_size:  # A14: flush every 20
                flush()
        flush()  # tail flush
        return _TaskCommit(task_id, n_rows, len(files), tuple(files))

    # -- driver side ------------------------------------------------------
    def _final_path(self) -> str:
        return os.path.join(self.path, "data.parquet")

    def commit(self, messages) -> None:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import pyarrow as pa

        staged = [f for m in messages if m for f in m.files]
        parts = [pq.read_table(f) for f in staged]
        final = self._final_path()
        if self.overwrite and not parts and os.path.exists(final):
            # overwrite with an empty batch REPLACES the table — the
            # old contents must not survive a mode("overwrite") save
            # that promised replacement (code review r3)
            os.remove(final)
        if not self.overwrite and os.path.exists(final):
            existing = pq.read_table(final)
            # existing rows lose to anything in this job
            existing = existing.append_column(
                "__seq", pa.array([-1] * len(existing), pa.int64())
            )
            parts.insert(0, existing)
        if parts:
            allt = pa.concat_tables(parts, promote_options="default")
            # deterministic last-write-wins: highest __seq per ID
            # (cross-task ties impossible: per-task seqs interleave but
            # a key written by two tasks takes the winner by (seq,
            # task-file order) — matching the reference, where
            # cross-batch order is a scrape artifact, not a contract)
            order = pc.sort_indices(
                allt,
                sort_keys=[("ID", "ascending"), ("__seq", "descending")],
            )
            allt = allt.take(order)
            import pandas as pd  # noqa: F401 — drop_duplicates path

            pdf = allt.to_pandas().drop_duplicates(subset=["ID"], keep="first")
            out = pa.Table.from_pandas(
                pdf.drop(columns="__seq"), preserve_index=False
            )
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(out, tmp)
            os.replace(tmp, final)  # atomic publish
        with open(os.path.join(self.path, "_meta.json"), "w") as fh:
            json.dump(
                {
                    "n_tasks": len(messages),
                    "n_rows": sum(m.n_rows for m in messages if m),
                    "n_batches": sum(m.n_batches for m in messages if m),
                    "batch_size": self.batch_size,
                },
                fh,
            )
        self._cleanup()

    def abort(self, messages) -> None:
        self._cleanup()

    def _cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class KeyedUpsertDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "keyed_upsert"

    def writer(self, schema, overwrite: bool) -> KeyedUpsertWriter:
        return KeyedUpsertWriter(self.options, schema, overwrite)


def register_keyed_upsert_sink(spark) -> None:
    spark.dataSource.register(KeyedUpsertDataSource)
