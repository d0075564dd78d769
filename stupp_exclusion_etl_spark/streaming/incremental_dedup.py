"""CDC → incremental near-dedup as ONE continuous streaming job
(SURVEY.md §2 B9 × B14 × C16; VERDICT r8 task #7).

``stream_atomic_changes`` (the partition-planned CDC source) and
``pipeline_incremental_dedup`` (the batch change-feed consumer)
existed separately; this module wires them: a Structured Streaming
job subscribes to an atomic table's change feed via the registered
``atomic_changes`` connector and maintains a MinHash/LSH near-dup
PAIRS state across micro-batches through ``foreachBatch``. State
lives in two atomic tables of their own — ``bands`` (doc_id → its
ordered band keys) and ``pairs`` (id1, id2 → jaccard) — so the state
itself gets atomic commits, time travel, exactly-once batch ids, and
the round-9 auto-compaction policy (a long-running maintenance job is
precisely the CDC-heavy accretion workload the policy exists for).

Per micro-batch (a set of insert/update/delete change rows):

1. retire every state pair touching an affected doc (their texts
   changed or vanished — recomputed below if still warranted);
2. delete band entries of docs that no longer have any (deleted, or
   updated to zero shingles), then upsert the changed docs' new band
   keys — the band index now mirrors the corpus head;
3. probe ONLY the changed docs' bands against the full band index
   (work is O(changed × bucket), never corpus² — same restriction as
   the batch consumer);
4. verify candidates with exact shingle-set Jaccard against the
   current corpus texts and upsert the surviving pairs.

Crash safety: the last step's upsert carries the micro-batch id, so a
fully-applied batch replay is a guarded no-op; a half-applied replay
re-runs steps whose effects are idempotent (key deletes of absent
keys, band upserts guarded by their own batch id) and completes the
missing pair commit. Checkpoint-restart across separate drains is the
normal operating mode (availableNow), proven in
tests/test_changes_stream.py.

Reference parity: the scraper's pipeline re-scrapes and re-writes only
changed listings per run (/root/reference/__main__.py); this is the
same incremental-maintenance contract for a derived near-dup index at
100 TB — the full recompute never runs after bootstrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.dedup import (
    _exploded_shingles,
    lsh_bands,
    minhash_signatures,
)
from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable


class IncrementalNearDedup:
    """Continuous near-dedup maintenance over an atomic table's change
    feed. ``run()`` drains everything currently committed
    (availableNow) through ``process_batch``; re-running with the same
    checkpoint resumes from the recorded offset — the restart story IS
    the steady-state operating mode."""

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        state_root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_hashes: int = 12,
        band_size: int = 3,
        shingle_k: int = 3,
        threshold: float = 0.4,
        max_versions_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.source_path = source_path
        self.id_col = id_col
        self.text_col = text_col
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.shingle_k = shingle_k
        self.threshold = threshold
        # admission control passed through to the atomic_changes
        # source: bounds every maintenance micro-batch at K source
        # versions, so a consumer resuming after a long gap (or the
        # from_version=-1 bootstrap itself) pays bounded, individually
        # checkpointed state updates instead of one monster batch
        self.max_versions_per_trigger = max_versions_per_trigger
        self.source = AtomicParquetTable(
            spark, source_path, keys=[id_col]
        )
        ac = {"max_files_per_partition": 16, "target_file_mb": 64}
        self.bands = AtomicParquetTable(
            spark, state_root + "/bands", keys=[id_col],
            cluster_by=[id_col], cluster_files=4, auto_compact=ac,
        )
        self.pairs = AtomicParquetTable(
            spark, state_root + "/pairs", keys=["id1", "id2"],
            cluster_by=["id1"], cluster_files=4, auto_compact=ac,
        )

    # -- per-micro-batch maintenance -----------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        idc, txc = self.id_col, self.text_col
        # replay guard: the pair commit is the LAST step, so a recorded
        # pair batch_id proves the whole batch was applied
        pv = self.pairs.current_version()
        if pv is not None:
            last = self.pairs._manifest(pv).get("batch_id")
            if last is not None and batch_id <= last:
                return
        # the batch's END version: every verification read below time
        # travels to the snapshot the band index was planned from — a
        # source commit landing mid-drain must not leak newer texts
        # into this batch's Jaccard checks (it gets its own batch)
        # checkpoint FIRST (including _end_version), then read the
        # version from the checkpointed frame — a separate .first() on
        # batch_df would re-run the python-source diff scan once per
        # batch just to fetch one scalar
        batch_full = batch_df.select(
            idc, txc, "_change_type", "_end_version"
        ).localCheckpoint(eager=True)
        vrow = batch_full.select("_end_version").first()
        self._end_version = None if vrow is None else vrow[0]
        batch = batch_full.select(idc, txc, "_change_type")
        affected = batch.select(idc).distinct()

        # 1. retire stale pairs touching any affected doc
        cur = self.pairs.read()
        if cur is not None:
            doomed = (
                cur.join(
                    affected.withColumnRenamed(idc, "id1"), "id1",
                    "left_semi",
                )
                .select("id1", "id2")
                .unionByName(
                    cur.join(
                        affected.withColumnRenamed(idc, "id2"), "id2",
                        "left_semi",
                    ).select("id1", "id2")
                )
                .distinct()
            )
            self.pairs.delete_keys(doomed)

        # 2. band index maintenance: per changed doc, its n_bands band
        # keys as ONE ordered array row (position = band number), so
        # the state table stays keyed by doc and keyed deletes work
        up = batch.filter(F.col("_change_type") != "delete").select(
            idc, txc
        )
        sigs = minhash_signatures(
            up, idc, txc, self.n_hashes, self.shingle_k
        )
        per_doc = (
            lsh_bands(sigs, idc, self.n_hashes, self.band_size)
            .groupBy(idc)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("band", "band_key"))
                ).alias("__bk")
            )
            .select(
                idc,
                F.col("__bk.band_key").alias("band_keys"),
                # stored recency: keep-latest must prefer THIS batch's
                # row over the state row it replaces — a constant
                # order_by would tie and keep either
                F.lit(batch_id).alias("__b"),
            )
            .localCheckpoint(eager=True)
        )
        # docs with no bands anymore: deleted, or updated to zero
        # shingles (empty text) — their index entries must go
        gone = affected.join(per_doc.select(idc), idc, "left_anti")
        if self.bands.current_version() is not None:
            self.bands.delete_keys(gone)
        self.bands.upsert(
            per_doc, [F.col("__b").desc()], batch_id=batch_id
        )

        # 3. changed bands probe the FULL index (candidates are
        # O(changed × bucket)); position in the array IS the band
        state = self.bands.read().select(
            idc,
            F.posexplode("band_keys").alias("band", "band_key"),
        )
        a = state.join(per_doc.select(idc), idc, "left_semi").select(
            F.col(idc).alias("ida"), "band", "band_key"
        )
        b = state.select(F.col(idc).alias("idb"), "band", "band_key")
        cand = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("ida") != F.col("idb"))
            .select(
                F.least("ida", "idb").alias("id1"),
                F.greatest("ida", "idb").alias("id2"),
            )
            .distinct()
        )

        # 4. exact shingle-set Jaccard over the corpus AT THE BATCH'S
        # END VERSION (not HEAD — see _end_version above)
        corpus = self.source.read(version=self._end_version).select(
            idc, txc
        )
        cand_ids = (
            cand.select(F.col("id1").alias(idc))
            .union(cand.select(F.col("id2").alias(idc)))
            .distinct()
        )
        sub = corpus.join(cand_ids, idc, "left_semi")
        ex = _exploded_shingles(sub, idc, txc, self.shingle_k).distinct()
        n = ex.groupBy(idc).agg(F.count(F.lit(1)).alias("n_sh"))
        inter = (
            cand.join(
                ex.select(F.col(idc).alias("id1"), "s"), "id1"
            )
            .join(ex.select(F.col(idc).alias("id2"), "s"), ["id2", "s"])
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        na = n.select(F.col(idc).alias("id1"), F.col("n_sh").alias("na"))
        nb = n.select(F.col(idc).alias("id2"), F.col("n_sh").alias("nb"))
        new_pairs = (
            inter.join(na, "id1")
            .join(nb, "id2")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (F.col("na") + F.col("nb") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select(
                "id1", "id2", "jaccard",
                F.lit(batch_id).alias("__b"),
            )
        )
        # unconditional (even when empty): this commit's batch_id is
        # the replay guard for the whole micro-batch
        self.pairs.upsert(
            new_pairs, [F.col("__b").desc()], batch_id=batch_id
        )

    # -- drive ----------------------------------------------------------

    def run(self, checkpoint: str, timeout_sec: int = 300) -> None:
        """One availableNow drain of every change committed so far —
        call again (same checkpoint) after more commits to process
        only the delta; a restart after a crash resumes mid-stream
        from the checkpointed offset. Subscribes at from_version=-1
        (bootstrap: the first micro-batch is the whole current
        snapshot as inserts) — only the first drain uses it, later
        drains resume from the checkpoint."""
        from stupp_exclusion_etl_spark.sources.changes_stream import (
            register_changes_stream,
        )

        register_changes_stream(self.spark)
        reader = (
            self.spark.readStream.format("atomic_changes")
            .option("path", self.source_path)
            .option("keys", self.id_col)
            .option("from_version", "-1")
            .option("emit_end_version", "true")
        )
        if self.max_versions_per_trigger is not None:
            reader = reader.option(
                "max_versions_per_trigger",
                str(self.max_versions_per_trigger),
            )
        writer = (
            reader.load()
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if self.max_versions_per_trigger is None:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination(timeout_sec)
            if q.isActive:
                q.stop()
                raise TimeoutError("incremental dedup drain timed out")
            return
        # capped drain: whether Trigger.AvailableNow keeps planning
        # batches under admission control is wrapper-dependent for
        # python sources, so the capped path uses processAllAvailable,
        # which provably keeps planning bounded batches until the
        # capped offer catches the table head (tests assert the full
        # drain AND the per-batch bound)
        # processAllAvailable has no timeout parameter, and a writer
        # committing concurrently could keep it from ever returning —
        # run it under a watchdog so run()'s timeout_sec contract holds
        # on this path too
        import threading

        q = writer.trigger(processingTime="0 seconds").start()
        try:
            def _drain():
                try:
                    q.processAllAvailable()
                except Exception:
                    # a query failure lands here too; the caller
                    # re-raises the authoritative q.exception() below
                    pass

            waiter = threading.Thread(target=_drain, daemon=True)
            waiter.start()
            waiter.join(timeout_sec)
            if waiter.is_alive():
                raise TimeoutError(
                    "incremental dedup drain timed out"
                )
            # processAllAvailable ran in a daemon thread, so a
            # StreamingQueryException (e.g. a foreachBatch failure)
            # surfaced there, not here — the waiter exits "cleanly"
            # on a dead query. Re-raise so this path keeps the same
            # failure contract as the availableNow/awaitTermination
            # path: a failed drain is never reported as complete.
            exc = q.exception()
            if exc is not None:
                raise exc
        finally:
            q.stop()

    def state(self) -> DataFrame:
        """The maintained near-dup pairs (id1 < id2, exact jaccard)."""
        out = self.pairs.read()
        if out is None:
            return self.spark.createDataFrame(
                [], "id1 long, id2 long, jaccard double"
            )
        return out.select("id1", "id2", "jaccard")
