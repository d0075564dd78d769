"""Persisted, CDC-maintained IVF index (SURVEY.md §2 B13 × C16 —
VERDICT r11 task #2: the last first-class LLM-pipeline lifecycle gap).

Every other ANN query in this engine computes its index artifacts
(centroids, cell assignments) INSIDE the query plan — correct, but a
100 TB serving path cannot re-derive its index per query, and a corpus
that churns (upserts + deletes, the reference's own re-scrape cycle,
/root/reference/__main__.py) needs the index to FOLLOW the churn
without full rebuilds. This module stores the IVF artifacts as atomic
tables of their own and maintains assignments incrementally from the
corpus table's change feed:

- ``centroids``   (cell, centroid)            — k rows, metadata-scale
- ``assignments`` (id, cell, embedding, cent_cos) — one row per corpus
  row, keyed by id, CLUSTERED by cell, so serving reads prune to the
  probed cells at both the chunk and the file level; cent_cos is the
  row's cosine against its frozen assigned centroid, stored so drift
  checks scan one column instead of re-joining the whole index
- ``meta``        (key, val)                  — the trained-at version,
  the build-time quality baseline, and the build-time applied cursor;
  each refresh advances the cursor ATOMICALLY inside its own final
  assignments commit (the manifest's ``batch_id``) instead of a
  separate meta commit, so state and cursor can never tear

Maintenance contract (the ``pipeline_incremental_dedup`` pattern):
``refresh()`` consumes ``corpus.changes(applied, head)`` — deletes
retire assignment rows, inserts/updates re-route ONLY the changed
vectors through the frozen centroids (a broadcast of k rows; O(churn),
never O(corpus)) — then advances the cursor. Because both state
tables are atomic, a crashed refresh replays idempotently (keyed
upserts/deletes) and the index itself has time travel and CDC.

Rebuild policy: ``quality()`` is the mean vector↔assigned-centroid
cosine; ``maybe_rebuild()`` re-trains and re-assigns (the only
O(corpus) operation) when quality decays more than ``max_drop`` below
the build-time baseline — index drift under churn is measured, not
guessed.

Trainers: ``modmean`` derives cell seeds deterministically
(id % k → positional mean), which makes the whole lifecycle
restatable in ANSI SQL for the DuckDB oracle; ``kmeans`` (pyspark.ml)
is the production trainer — same storage and maintenance, recall-
tested rather than oracle-hashed (clustering is partition-sensitive).

100 TB shape: build trains on a sample and assigns with one broadcast
(no shuffle); refresh is O(changed rows); serving is a probe over k
centroid rows plus a chunk/file-pruned read of the probed cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupp_exclusion_etl_spark.functions.vectors import cosine
from stupp_exclusion_etl_spark.sinks.atomic import (
    _PROBE_BROADCAST_CAP,
    AtomicParquetTable,
    _local_df,
)

#: Queries sampled for the once-per-batch recall escalation decision
#: (_batch_probe_escalation) — bounded however large the batch.
_BATCH_SAMPLE_QUERIES = 8

_META_APPLIED = "applied_version"
_META_TRAINED = "trained_version"
_META_BASELINE_Q = "baseline_quality"


class PersistedIvfIndex:
    """IVF index artifacts as atomic tables, maintained from the
    corpus table's change feed. See module docstring for the
    lifecycle; tests/test_ann_index.py pins the contracts."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_path: str,
        index_root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k_cells: int = 8,
        n_probe: int = 3,
        trainer: str = "modmean",
        pq: tuple[int, int] | None = None,
        target_cell_rows: int | None = None,
    ) -> None:
        if trainer not in ("modmean", "kmeans"):
            raise ValueError(f"unknown trainer {trainer!r}")
        if pq is not None:
            m, kc = pq
            if m < 1 or kc < 2:
                raise ValueError(f"pq=(m, k) must have m>=1, k>=2: {pq}")
        if target_cell_rows is not None and target_cell_rows < 1:
            raise ValueError(
                f"target_cell_rows must be >= 1: {target_cell_rows}"
            )
        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        # target_cell_rows (VERDICT r14 next-round #1): serving cost is
        # n_probe × cell_rows PER QUERY, so a fixed k_cells makes cells
        # — and every probe — grow linearly with the corpus (the sf10
        # sweep's 86× batch-serve blowup: the query batch AND each cell
        # both scaled 10×). When set, build()/rebuild derive
        # k_cells = max(k_cells, ceil(corpus_rows / target_cell_rows))
        # from the manifest's row stats, so probed-cell size stays
        # ~constant at any corpus scale; ``k_cells`` becomes the FLOOR
        # (small corpora keep the configured layout exactly — nothing
        # changes below k_cells × target_cell_rows rows).
        self.k_cells = k_cells
        self._k_floor = k_cells
        self.target_cell_rows = target_cell_rows
        self.n_probe = n_probe
        self.trainer = trainer
        # optional product quantization: the serving layout stores m
        # small ints per vector alongside its cell, and ADC serving
        # reads ONLY (id, cell, codes) — at 100 TB the probed-cell
        # scan is m bytes/vector instead of the raw embedding
        self.pq = pq
        self.corpus = AtomicParquetTable(spark, corpus_path, keys=[id_col])
        self.centroids = AtomicParquetTable(
            spark, index_root.rstrip("/") + "/centroids", keys=["cell"]
        )
        # clustered by cell: the serving read prunes to probed cells
        # at chunk AND file level; small cluster_files keeps per-cell
        # file counts low so a probe reads a handful of files
        self.assignments = AtomicParquetTable(
            spark, index_root.rstrip("/") + "/assignments",
            keys=[id_col], cluster_by=["cell"], cluster_files=4,
            auto_compact={"max_files_per_partition": 16,
                          "target_file_mb": 64},
        )
        self.meta = AtomicParquetTable(
            spark, index_root.rstrip("/") + "/meta", keys=["key"]
        )
        self.codebook = (
            AtomicParquetTable(
                spark, index_root.rstrip("/") + "/codebook",
                keys=["s", "c"],
            )
            if pq is not None
            else None
        )

    # -- training -----------------------------------------------------

    def _train_centroids(self, snapshot: DataFrame) -> DataFrame:
        """(cell, centroid array<double>) from the snapshot. modmean:
        positional mean per (id % k) seed group — deterministic and
        SQL-restatable. kmeans: pyspark.ml, seeded (deterministic per
        layout, not across engines)."""
        if self.trainer == "modmean":
            from stupp_exclusion_etl_spark.operators.similarity import (
                mean_centroids,
            )

            seeded = snapshot.withColumn(
                "cell",
                (F.col(self.id_col) % self.k_cells).cast("int"),
            )
            return mean_centroids(seeded, "cell", self.vec_col)
        from stupp_exclusion_etl_spark.operators.similarity import (
            ivf_kmeans_cells,
        )

        _assigned, cents = ivf_kmeans_cells(
            snapshot, k=self.k_cells, vec_col=self.vec_col
        )
        return cents

    #: Above this cell count the literal-fold projection gets unwieldy
    #: (k×d literal doubles in the plan, k fold expressions per row);
    #: route through the Arrow/numpy argmax instead (_assign_arrow).
    _ASSIGN_FOLD_MAX_CELLS = 64

    def _centroid_state(self) -> tuple[list, str] | None:
        """((cell, centroid) tuples sorted by cell, cell dtype
        simpleString) of the FROZEN centroid table — memoized per
        centroids VERSION. The table only changes on build/rebuild, so
        every assign after the first (each refresh re-routes through
        the same frozen centroids) reuses the collected k rows instead
        of paying a read+collect job; a rebuild bumps the version and
        invalidates (guide §1.2: don't recompute what you already
        have). The dtype rides the cache (ADVICE r14): the fold path
        needs it for the cell cast, and fetching it via a fresh
        read() per assign re-paid the manifest read the memo exists to
        avoid."""
        v = self.centroids.current_version()
        if v is None:
            return None
        cached = getattr(self, "_cent_cache", None)
        if cached is not None and cached[0] == v:
            return cached[1], cached[2]
        cents = self.centroids.read(version=v)
        rows = sorted(
            (
                (r[0], [float(x) for x in r[1]])
                for r in cents.select("cell", "centroid").collect()
            ),
            key=lambda r: r[0],
        )
        cell_t = cents.schema["cell"].dataType.simpleString()
        self._cent_cache = (v, rows, cell_t)
        return rows, cell_t

    def _assign(self, vectors: DataFrame) -> DataFrame:
        """Route vectors to their nearest frozen centroid. The
        centroid table is k metadata-scale rows, so it is collected
        once and embedded as LITERAL arrays: the k cosines project
        into one array column and a codegen'd argmax fold (strict >,
        ascending cell order) picks the cell — a ZERO-shuffle,
        map-only pass. The previous shape (crossJoin the broadcast
        centroids, row_number window per id) multiplied every vector
        row k× and shuffled ALL of it for the window — an 8× corpus
        exchange at build time (guide §2.3/§2.4); the fold removes the
        exchange entirely. Tie/NULL semantics are bit-identical to
        row_number over (cosine DESC NULLS LAST, cell ASC): a
        candidate wins only when non-NULL and strictly greater, so
        ties and all-NULL rows (zero vectors) keep the lowest cell.
        Very large k (> _ASSIGN_FOLD_MAX_CELLS) routes through ONE
        numpy matmul per Arrow batch instead (_assign_arrow) — still
        zero-shuffle map-only, with plan size O(1) in k."""
        state = self._centroid_state()
        if state is None:
            raise ValueError("index not built: no centroids committed")
        rows, cell_t = state
        if not rows:
            raise ValueError("index not built: centroid table is empty")
        if len(rows) > self._ASSIGN_FOLD_MAX_CELLS:
            return self._assign_arrow(vectors, rows, cell_t)
        v = F.col(self.vec_col)
        # argmax via array_max + array_position so every cosine
        # appears in the plan EXACTLY ONCE — a nested CASE fold would
        # duplicate the k×d centroid literals O(k²) times, and the
        # resulting multi-hundred-KB expression tree costs seconds of
        # py4j construction + analysis per commit (measured; guide
        # §7.3 "very large plans"). Semantics match row_number over
        # (cosine DESC NULLS LAST, cell ASC) exactly: array_max skips
        # NULLs (zero vectors), array_position returns the FIRST
        # (lowest-cell) index on bit-equal ties, and the all-NULL row
        # coalesces to the lowest cell with a NULL cent_cos.
        scored = vectors.select(
            F.col(self.id_col),
            v,
            F.array(
                *[
                    cosine(v, F.lit([float(x) for x in r[1]]))
                    for r in rows
                ]
            ).alias("__cs"),
        )
        best = F.array_max(F.col("__cs"))
        pos = F.coalesce(
            F.array_position(F.col("__cs"), best), F.lit(1)
        ).cast("int")
        cell = F.element_at(
            F.lit([r[0] for r in rows]), pos
        ).cast(cell_t)
        return scored.select(
            self.id_col,
            cell.alias("cell"),
            self.vec_col,
            best.alias("cent_cos"),
        )

    def _assign_arrow(
        self, vectors: DataFrame, rows: list, cell_t: str
    ) -> DataFrame:
        """Large-k assignment route: one numpy matmul per Arrow batch
        against the collected k×d centroid matrix — zero-shuffle,
        map-only, like the literal fold, but the plan carries no
        centroid literals at all (guide §4.2: hand whole batches to
        vectorized native code; the pre-r15 fallback here was a
        crossJoin + row_number window that multiplied the corpus k×
        and SHUFFLED all of it). Semantics match the fold path:
        cosines in float64 with try_divide's NULL on zero norms, a
        NULL cosine never wins, ties take the lowest cell, and rows
        whose cosine is NULL against EVERY cell (zero vectors, NULL /
        ragged / null-element embeddings — any of which NULL the
        fold's zip_with dot too) keep the lowest cell with NULL
        cent_cos. One documented difference: BLAS pairwise summation
        can differ from the fold's left-to-right accumulation in the
        final ulp, so an argmax between two cells whose cosines agree
        to ~1e-16 could land differently — every oracle-checked layout
        (k ≤ 64) takes the bit-exact fold path above."""
        import numpy as np
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import to_arrow_type

        cells_np = np.asarray([r[0] for r in rows])
        C = np.asarray([r[1] for r in rows], dtype=np.float64)
        cn = np.linalg.norm(C, axis=1)
        d = C.shape[1]
        id_t = vectors.schema[self.id_col].dataType.simpleString()
        vec_t = vectors.schema[self.vec_col].dataType.simpleString()
        cell_pa = to_arrow_type(T._parse_datatype_string(cell_t))
        src = vectors.select(self.id_col, self.vec_col)
        # plain-value captures only: the task closure must not drag
        # `self` (and its SparkSession) through pickle
        id_name, vec_name = self.id_col, self.vec_col

        def route(batches):
            import pyarrow as pa

            f64 = pa.float64()
            names = [id_name, "cell", vec_name, "cent_cos"]
            for b in batches:
                n = b.num_rows
                ids, emb = b.column(0), b.column(1)
                if n == 0:
                    yield pa.RecordBatch.from_arrays(
                        [
                            ids,
                            pa.array([], type=cell_pa),
                            emb,
                            pa.array([], type=f64),
                        ],
                        names=names,
                    )
                    continue
                if emb.offset != 0:
                    # rebase a sliced array so offsets index `values`
                    # directly (Spark emits unsliced batches; guard
                    # anyway)
                    emb = emb.take(pa.array(range(n), type=pa.int64()))
                offs = emb.offsets.to_numpy()
                lens = offs[1:] - offs[:-1]
                valid = (~np.asarray(emb.is_null())) & (lens == d)
                ev = emb.values
                if ev.null_count and valid.any():
                    # a null ELEMENT nulls the fold's dot for every
                    # cell — same all-NULL handling as a null row
                    evn = np.asarray(ev.is_null())
                    for i in np.flatnonzero(valid):
                        if evn[offs[i]:offs[i + 1]].any():
                            valid[i] = False
                idx = np.zeros(n, dtype=np.int64)
                best = np.full(n, np.nan, dtype=np.float64)
                if valid.any():
                    vals = ev.to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    take = (
                        offs[:-1][valid][:, None]
                        + np.arange(d)[None, :]
                    )
                    V = vals[take]
                    num = V @ C.T
                    den = np.linalg.norm(V, axis=1)[:, None] * cn[None, :]
                    with np.errstate(
                        divide="ignore", invalid="ignore"
                    ):
                        cos = num / den
                    cos[~np.isfinite(cos)] = -np.inf
                    vi = np.argmax(cos, axis=1)
                    vb = cos[np.arange(len(vi)), vi]
                    dead = ~np.isfinite(vb)  # all cosines NULL
                    vi[dead] = 0
                    idx[valid] = vi
                    bv = best[valid]
                    bv[~dead] = vb[~dead]
                    best[valid] = bv
                null_cos = ~np.isfinite(best)
                yield pa.RecordBatch.from_arrays(
                    [
                        ids,
                        pa.array(cells_np[idx], type=cell_pa),
                        emb,
                        pa.array(best, type=f64, mask=null_cos),
                    ],
                    names=names,
                )

        return src.mapInArrow(
            route,
            f"{self.id_col} {id_t}, cell {cell_t}, "
            f"{self.vec_col} {vec_t}, cent_cos double",
        )

    def _train_codebook(self, snapshot: DataFrame) -> list:
        """codebook[s][c]: modmean seeds subvector centroids from the
        k smallest-id vectors (deterministic, SQL-restatable — the
        generalization of operators.similarity.pq_seed_codebook's
        ids-1..k convention); kmeans learns them per subspace."""
        m, kc = self.pq
        if self.trainer == "kmeans":
            from stupp_exclusion_etl_spark.operators.similarity import (
                pq_kmeans_codebook,
            )

            return pq_kmeans_codebook(
                snapshot, m=m, k=kc, vec_col=self.vec_col
            )
        rows = (
            snapshot.select(self.id_col, self.vec_col)
            .orderBy(self.id_col)
            .limit(kc)
            .collect()
        )
        if len(rows) < kc:
            raise ValueError(
                f"PQ needs >= {kc} corpus vectors to seed, got {len(rows)}"
            )
        dim = len(rows[0][1])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by pq m={m}")
        d = dim // m
        return [
            [
                [float(x) for x in rows[c][1][s * d : (s + 1) * d]]
                for c in range(kc)
            ]
            for s in range(m)
        ]

    def _store_codebook(self, book: list, ts: int) -> None:
        rows = [
            (s, c, book[s][c], ts)
            for s in range(len(book))
            for c in range(len(book[s]))
        ]
        # _local_df: LocalRelation literal batch — the commit's key
        # probe and broadcast builds run zero Spark jobs (guide §1.2)
        self.codebook.upsert(
            _local_df(
                self.spark, rows,
                "s int, c int, centroid array<double>, ts long",
            ),
            [F.col("ts").desc()],
        )

    def _load_codebook(self) -> list:
        """The persisted codebook as codebook[s][c] — an m×k-row
        collect, metadata-scale like the centroid probe."""
        rows = self.codebook.read()
        if rows is None:
            raise ValueError("index not built: no codebook committed")
        got = rows.select("s", "c", "centroid").collect()
        m = 1 + max(r.s for r in got)
        kc = 1 + max(r.c for r in got)
        book = [[None] * kc for _ in range(m)]
        for r in got:
            book[r.s][r.c] = [float(x) for x in r.centroid]
        return book

    def _with_codes(self, routed: DataFrame, vectors: DataFrame, book):
        """Join PQ codes (frozen codebook, map-only encode) onto the
        routed assignment rows."""
        from stupp_exclusion_etl_spark.operators.similarity import (
            pq_encode,
        )

        codes = pq_encode(
            vectors, book, id_col=self.id_col, vec_col=self.vec_col
        )
        return routed.join(codes, self.id_col)

    def _put_meta(self, pairs: dict[str, float], ts: int) -> None:
        # _local_df: see _store_codebook — a zero-probe-job commit
        parent = self.meta.current_version()
        v = self.meta.upsert(
            _local_df(
                self.spark,
                [(k, float(v), ts) for k, v in pairs.items()],
                "key string, val double, ts long",
            ),
            [F.col("ts").desc()],
        )
        # keep the per-version value memo (see _get_meta) warm: the
        # committed state is exactly (what we knew at parent) + pairs
        cached = getattr(self, "_meta_cache", None)
        if parent is None:
            base: dict | None = {}
        elif cached is not None and cached[0] == parent:
            base = dict(cached[1])
        else:
            base = None  # unknown parent contents: reload lazily
        if base is not None:
            base.update({k: float(x) for k, x in pairs.items()})
            self._meta_cache = (v, base)

    def _get_meta(self, key: str) -> float | None:
        """Meta value lookup, memoized per meta-table VERSION: the
        cursor/baseline reads every refresh and drift check make are
        driver-side dict hits instead of a filter+collect job each
        (guide §1.2); any foreign commit bumps the version and
        invalidates. A fresh handle pays one collect, then rides the
        memo."""
        v = self.meta.current_version()
        if v is None:
            return None
        cached = getattr(self, "_meta_cache", None)
        if cached is None or cached[0] != v:
            vals = {
                r[0]: float(r[1])
                for r in self.meta.read(version=v)
                .select("key", "val")
                .collect()
            }
            self._meta_cache = (v, vals)
        return self._meta_cache[1].get(key)

    # -- lifecycle ----------------------------------------------------

    def build(self) -> dict:
        """Train centroids on the current corpus snapshot, assign every
        vector, record the cursor + quality baseline. The only
        O(corpus) operation besides an explicit rebuild."""
        head = self.corpus.current_version()
        snap = self.corpus.read(version=head)
        if snap is None or snap.isEmpty():
            raise ValueError("empty corpus: nothing to index")
        if self.target_cell_rows is not None:
            # scale-adaptive layout (see __init__): cell count derives
            # from the manifest's per-file row stats — zero jobs — so
            # probed-cell size stays ~target_cell_rows at any corpus
            # scale; a rebuild re-derives it for the corpus it sees
            n = self.corpus.row_count(head)
            if n is None:
                n = snap.count()
            self.k_cells = max(
                self._k_floor,
                -(-int(n) // self.target_cell_rows),
            )
        # Train, then COLLECT the k metadata-scale centroid rows once:
        # the commit becomes a zero-probe LocalRelation write instead
        # of re-running the training aggregate inside the write job
        # (and inside the key probe), and the collected rows seed the
        # per-version assign cache so the build's own assignment pass
        # pays no further centroid read (guide §1.2; the old shape
        # spent 7 jobs here: 6 in centroids.upsert over the live
        # training lineage + 1 re-collect in _assign).
        from pyspark.sql import types as T

        tr = self._train_centroids(snap).select("cell", "centroid")
        got = sorted(
            ((r[0], [float(x) for x in r[1]]) for r in tr.collect()),
            key=lambda r: r[0],
        )
        sch = T.StructType(
            list(tr.schema.fields)
            + [T.StructField("ts", T.LongType(), False)]
        )
        # same 2v(+1) recency stamp as the assignment rows below —
        # strict ordering against any same-version earlier build
        cur_cents = self.centroids.read()
        cent_stamp = 2 * int(head) + (1 if cur_cents is not None else 0)
        cents = _local_df(
            self.spark,
            [(c, v, cent_stamp) for c, v in got],
            sch,
        )
        if cur_cents is None:
            self.centroids.upsert(cents, [F.col("ts").desc()])
        else:
            # retrain: retire cells that no longer exist, then upsert
            old = cur_cents.select("cell")
            doomed = old.join(cents.select("cell"), "cell", "left_anti")
            if not doomed.isEmpty():
                self.centroids.delete_keys(doomed)
            self.centroids.upsert(cents, [F.col("ts").desc()])
        self._cent_cache = (
            self.centroids.current_version(),
            got,
            tr.schema["cell"].dataType.simpleString(),
        )
        prev = self.assignments.read()
        # Assignment-row recency stamp: 2·version for build/refresh,
        # 2·version + 1 for a REBUILD. A rebuild typically runs at the
        # SAME corpus version the last refresh applied (drift comes
        # from commits the refresh just consumed), so stamping the raw
        # version would TIE the rebuild's re-routed rows against that
        # refresh's rows in keep-latest's row_number — an arbitrary
        # winner, i.e. stale cells/cent_cos surviving a rebuild
        # (surfaced by the stored-cent_cos drift metric; latent before
        # it). The 2v(+1) lamport keeps every ordering strict: last
        # refresh 2v < rebuild 2v+1 < next refresh 2v' ≥ 2v+2. (Two
        # rebuilds at one version still tie, but the trainers are
        # deterministic per layout, so the tied rows are identical.)
        stamp = 2 * int(head) + (1 if prev is not None else 0)
        assigned = self._assign(
            snap.select(self.id_col, self.vec_col)
        ).withColumn("ts", F.lit(stamp).cast("long"))
        if self.pq is not None:
            book = self._train_codebook(snap)
            self._store_codebook(book, ts=stamp)
            assigned = self._with_codes(
                assigned, snap.select(self.id_col, self.vec_col), book
            )
        stale = None
        if prev is not None:
            stale = prev.select(self.id_col).join(
                assigned.select(self.id_col), self.id_col, "left_anti"
            )
        # Baseline quality rides the upsert's own write pass as an
        # observed metric: post-commit the live index is exactly the
        # assigned rows (stale keys are retired below), so
        # avg(cent_cos) over the batch IS quality() — without the
        # full assignments re-scan + centroid re-join the old
        # post-commit quality() call paid (guide §1.2: don't recompute
        # what the write pass already evaluates). cent_cos is KEPT in
        # the stored row (VERDICT r14 next-round #5): it is exactly
        # cosine(vector, frozen assigned centroid), so later drift
        # checks become a single-column scan instead of a full
        # assignments pass + centroid broadcast join (guide §2.3 —
        # 8 bytes/row buys back a whole index read per check at
        # 100 TB; every refresh re-route stores its own cent_cos the
        # same way, so the column always reflects the live frozen
        # centroids).
        from pyspark.sql import Observation

        obs = Observation()
        batch = assigned.observe(obs, F.avg("cent_cos").alias("q"))
        # The batch's distinct keys are the corpus snapshot's keys
        # (assignment is 1:1), and the manifest's per-file row stats
        # bound them without a count job — skip the probe's
        # checkpoint + capped count (at 100 TB: no executor-storage
        # copy of every corpus key).
        n_rows = self.corpus.row_count(head)
        probe = (
            (snap.select(self.id_col), n_rows <= _PROBE_BROADCAST_CAP)
            if n_rows is not None
            else None
        )
        self.assignments.upsert(
            batch, [F.col("ts").desc()], _probe=probe
        )
        if stale is not None and not stale.isEmpty():
            self.assignments.delete_keys(stale)
        qv = obs.get["q"]
        if qv is None:
            # avg over zero non-NULL cent_cos rows — same refusal as
            # quality() on an empty index
            raise ValueError(
                "index is empty: no assignment rows to score"
            )
        q = float(qv)
        self._put_meta(
            {_META_APPLIED: head, _META_TRAINED: head, _META_BASELINE_Q: q},
            ts=stamp,
        )
        return {"trained_version": head, "baseline_quality": q}

    def refresh(self) -> dict:
        """Consume corpus changes since the applied cursor: deletes
        retire assignment rows; inserts/updates re-route only the
        changed vectors through the FROZEN centroids. O(churn).

        Cursor transactionality (VERDICT r14 next-round #3): the
        applied position rides the refresh's FINAL data commit as its
        ``batch_id``, atomically inside the assignments table's own
        manifest record — the separate meta-table commit every refresh
        used to make (2 jobs) and the torn window between "assignments
        updated" and "cursor advanced" are both gone. The cursor read
        is max(meta applied — builds still record it there —,
        assignments.last_batch_id()), all metadata-only. A refresh
        that crashes mid-way replays exactly: intermediate commits
        carry no batch_id and re-apply idempotently (keyed
        delete/upsert of the same feed), and the position only
        advances with the final commit."""
        meta_applied = self._get_meta(_META_APPLIED)
        if meta_applied is None:
            raise ValueError("index not built: call build() first")
        riding = self.assignments.last_batch_id()
        applied = max(
            int(meta_applied), -1 if riding is None else int(riding)
        )
        head = self.corpus.current_version()
        if head <= applied:
            return {"from": applied, "to": applied,
                    "n_deleted": 0, "n_upserted": 0}
        # Materialize the change feed once: its full-outer CDC join
        # would otherwise re-run for every consumer below (the
        # delete's anti-join, the upsert's merge — six evaluations
        # measured), and BOTH change-kind counts ride the
        # materialization job itself as observed metrics instead of a
        # separate aggregate (guide §1.2: don't recompute what you
        # already have; the feed is O(churn), never O(corpus)).
        from pyspark.sql import Observation

        obs = Observation()
        ch = self.corpus.changes(applied, head).observe(
            obs,
            F.sum(
                (F.col("_change_type") == "delete").cast("long")
            ).alias("n_del"),
            F.sum(
                F.col("_change_type")
                .isin("insert", "update")
                .cast("long")
            ).alias("n_up"),
        ).localCheckpoint(eager=True)
        kinds = obs.get
        n_del = int(kinds["n_del"] or 0)
        n_up = int(kinds["n_up"] or 0)
        if n_del:
            doomed = ch.filter(
                F.col("_change_type") == "delete"
            ).select(self.id_col)
            # the CDC feed is keyed (one row per changed key), so
            # ``doomed`` IS the distinct-key frame and n_del its size:
            # hand both to the commit so it skips the probe's
            # checkpoint + capped-count jobs over an uncacheable plan.
            # batch_id rides ONLY the refresh's final commit (a crash
            # in between must replay the whole feed — see docstring).
            self.assignments.delete_keys(
                doomed,
                batch_id=None if n_up else int(head),
                _probe=(doomed, n_del <= _PROBE_BROADCAST_CAP),
            )
        changed = ch.filter(
            F.col("_change_type").isin("insert", "update")
        ).select(self.id_col, self.vec_col)
        if n_up:
            # cent_cos rides along (see build): re-routed rows carry
            # their cosine against the frozen centroid they landed on,
            # keeping the drift metric a single-column scan. The 2v
            # lamport matches build()'s 2v(+1) stamping — see there.
            routed = self._assign(changed).withColumn(
                "ts", F.lit(2 * int(head)).cast("long")
            )
            if self.pq is not None:
                # changed vectors re-encode through the FROZEN
                # codebook — O(churn), like the cell re-route
                routed = self._with_codes(
                    routed, changed, self._load_codebook()
                )
            # routing (and PQ encode) is 1:1, so the batch's distinct
            # keys are exactly the changed keys — same probe skip.
            # batch_id = the cursor riding this (final) commit.
            self.assignments.upsert(
                routed, [F.col("ts").desc()],
                batch_id=int(head),
                _probe=(
                    changed.select(self.id_col),
                    n_up <= _PROBE_BROADCAST_CAP,
                ),
            )
        if not (n_del or n_up):
            # empty net feed (e.g. compaction-only corpus commits): no
            # data commit carried the cursor, so advance it in meta the
            # pre-r15 way — otherwise every refresh re-reads this feed
            self._put_meta({_META_APPLIED: head}, ts=2 * int(head))
        return {"from": applied, "to": head,
                "n_deleted": n_del, "n_upserted": n_up}

    # -- quality / drift ----------------------------------------------

    def quality(self) -> float:
        """Mean vector↔assigned-centroid cosine over the live index —
        the drift metric. A single-column aggregate over the STORED
        cent_cos (VERDICT r14 next-round #5): every assignment row
        recorded its cosine against the frozen centroid it was routed
        to at build/refresh time, and the centroid table only changes
        on rebuild (which rewrites every row), so the stored value IS
        cosine(vector, assigned centroid) — bit-identical to the
        broadcast join + re-fold this method used to pay (same fold
        over the same doubles), at one column's scan cost instead of a
        full index pass per drift check."""
        a = self.assignments.read()
        if a is None:
            raise ValueError("index not built")
        row = a.agg(F.avg("cent_cos").alias("q")).collect()
        if row[0][0] is None:
            # avg over zero assignment rows is NULL (churn deleted the
            # whole corpus) — drift is undefined, not a TypeError
            raise ValueError(
                "index is empty: no assignment rows to score"
            )
        return float(row[0][0])

    def maybe_rebuild(self, max_drop: float = 0.05) -> bool:
        """Re-train + re-assign when assignment quality decayed more
        than ``max_drop`` below the build-time baseline. Returns
        whether a rebuild ran. The check is one aggregate; the rebuild
        is the only O(corpus) path and runs only past the fence."""
        base = self._get_meta(_META_BASELINE_Q)
        if base is None:
            raise ValueError("index not built")

        def _emptiness(tbl) -> bool:
            # manifest per-file row stats answer emptiness with zero
            # jobs; only a stats-less legacy manifest pays the take-1
            if tbl.current_version() is None:
                return True
            n = tbl.row_count()
            if n is not None:
                return n == 0
            df = tbl.read()
            return df is None or df.limit(1).count() == 0

        if _emptiness(self.assignments):
            # churn drained the index: quality() is undefined (NULL
            # aggregate). Decide instead of crashing — an empty index
            # over an empty corpus is trivially in sync; a non-empty
            # corpus with a drained index needs the rebuild.
            if _emptiness(self.corpus):
                return False
            self.build()
            return True
        if base - self.quality() <= max_drop:
            return False
        self.build()
        return True

    # -- serving ------------------------------------------------------

    def probe_cells(self, query: DataFrame, n_probe: int | None = None):
        """The query's nearest cells — k-row metadata collect, same
        contract as operators.similarity.ivf_probe_cells."""
        n = self.n_probe if n_probe is None else n_probe
        cents = self.centroids.read()
        if cents is None:
            raise ValueError("index not built")
        rows = (
            cents.crossJoin(F.broadcast(query))
            .select(
                "cell",
                cosine(F.col("centroid"), F.col("q")).alias("__c"),
            )
            .orderBy(F.col("__c").desc_nulls_last(), F.col("cell"))
            .limit(n)
            .collect()
        )
        return [r[0] for r in rows]

    def topk(
        self,
        query: DataFrame,
        k: int = 10,
        n_probe: int | None = None,
        recall_target: float | None = None,
        max_n_probe: int | None = None,
    ) -> DataFrame:
        """Serve top-k from the PERSISTED index: probe cells against
        the k-row centroid table, then an exact-cosine scan of ONLY
        the probed cells' assignment rows — a chunk/file-pruned
        ``read(where=[("cell","in",...)])``, never the corpus.
        ``query`` is a 1-row DataFrame with column ``q``.

        ``recall_target`` (VERDICT r12 task #6 — the recall contract,
        wired from operators.recall like the knn-join reroute): a
        bounded deterministic sample of assignment rows estimates
        recall@k per probe depth (fraction of the sample's exact
        top-m whose assigned cell is probed), and the serve ESCALATES
        n_probe — up to ``max_n_probe`` (default: all cells, which is
        exact over the index) — until the estimate clears the target.
        The decision is surfaced via recall.last_reroute_info
        ('persisted_ivf_topk') and warnings.warn when the target is
        unreachable within the cap. Opt-in: it adds one ~256-row
        sample collect per served query."""
        if recall_target is not None:
            from stupp_exclusion_etl_spark.operators import recall as _rc

            n = self.n_probe if n_probe is None else n_probe
            cap = self.k_cells if max_n_probe is None else min(
                max_n_probe, self.k_cells
            )
            if cap < 1:
                raise ValueError(
                    "max_n_probe must be >= 1 (got %r)" % (max_n_probe,)
                )
            # The cap wins over the index default: a caller ceiling
            # tighter than self.n_probe must not produce an empty
            # escalation range (ADVICE r13, recall.py choose_ivf_probe).
            n = min(n, cap)
            order = self.probe_cells(query, self.k_cells)
            a = self.assignments.read()
            if a is None:
                raise ValueError("index not built")
            rows = (
                a.select(self.id_col, "cell", self.vec_col)
                .orderBy(
                    F.xxhash64(F.col(self.id_col)), F.col(self.id_col)
                )
                .limit(256)
                .collect()
            )
            sample = [
                (r[0], r[1], [float(x) for x in r[2]]) for r in rows
            ]
            qv = [float(x) for x in query.select("q").collect()[0][0]]
            info = _rc.choose_ivf_probe(
                sample, qv, k, order, n, recall_target, cap
            )
            _rc.record_probe_decision(
                "persisted_ivf_topk", info, recall_target
            )
            cells = order[: info["n_probe"]]
            cand = self.assignments.read(where=[("cell", "in", cells)])
            scored = cand.crossJoin(F.broadcast(query)).select(
                F.col(self.id_col),
                F.col("cell"),
                F.round(
                    cosine(F.col(self.vec_col), F.col("q")), 6
                ).alias("cos_sim"),
            )
            return scored.orderBy(
                F.col("cos_sim").desc_nulls_last(), F.col(self.id_col)
            ).limit(k)
        cells = self.probe_cells(query, n_probe)
        cand = self.assignments.read(where=[("cell", "in", cells)])
        scored = cand.crossJoin(F.broadcast(query)).select(
            F.col(self.id_col),
            F.col("cell"),
            F.round(
                cosine(F.col(self.vec_col), F.col("q")), 6
            ).alias("cos_sim"),
        )
        return scored.orderBy(
            F.col("cos_sim").desc_nulls_last(), F.col(self.id_col)
        ).limit(k)

    def _batch_routes(
        self,
        queries: DataFrame,
        n_probe: int,
        qid_col: str,
        qvec_col: str,
    ) -> tuple[DataFrame, list]:
        """(routes, probed_cells) for a query TABLE: one broadcast
        join of the k-row centroid table onto the queries, window
        top-n_probe cells per query — no per-query driver round-trip.
        The ONLY collect is the union of probed cells (≤ k_cells
        values regardless of the batch size), which drives the
        chunk/file-pruned assignments read."""
        cents = self.centroids.read()
        if cents is None:
            raise ValueError("index not built: no centroids committed")
        scored = (
            queries.select(qid_col, qvec_col)
            .crossJoin(F.broadcast(cents.select("cell", "centroid")))
            .withColumn(
                "__pc", cosine(F.col(qvec_col), F.col("centroid"))
            )
        )
        wp = Window.partitionBy(qid_col).orderBy(
            F.col("__pc").desc_nulls_last(), F.col("cell").asc()
        )
        routes = (
            scored.withColumn("__rn", F.row_number().over(wp))
            .filter(F.col("__rn") <= n_probe)
            .select(qid_col, "cell", qvec_col)
        )
        cells = sorted(
            r[0] for r in routes.select("cell").distinct().collect()
        )
        return routes, cells

    def _batch_probe_escalation(
        self,
        queries: DataFrame,
        k: int,
        n: int,
        recall_target: float,
        max_n_probe: int | None,
        qid_col: str,
        qvec_col: str,
        op: str,
    ) -> int:
        """Batch twin of the single-query recall fence (VERDICT r13
        next-round #4): the escalation is decided ONCE per batch from
        a bounded deterministic sample of queries — never per query,
        so a 10k-query serve pays the same two small collects as a
        1-query serve. A ~256-row assignment sample estimates
        recall@k per probe depth for each of ≤ ``_BATCH_SAMPLE_QUERIES``
        sampled queries (xxhash64-ordered: deterministic,
        content-spread); the served depth is the smallest at which the
        WORST sampled query clears the target, capped at
        ``max_n_probe`` (default: all cells — exact over the index).
        The decision is surfaced via recall.last_reroute_info(op) and
        warnings.warn when the target is unreachable within the cap.
        Probe-cell orders for the sampled queries are computed
        driver-side over the k_cells-row centroid collect — same
        k-row metadata the routing join broadcasts."""
        from stupp_exclusion_etl_spark.operators import recall as _rc

        cap = self.k_cells if max_n_probe is None else min(
            max_n_probe, self.k_cells
        )
        if cap < 1:
            raise ValueError(
                "max_n_probe must be >= 1 (got %r)" % (max_n_probe,)
            )
        n = min(n, cap)
        cents = self.centroids.read()
        if cents is None:
            raise ValueError("index not built")
        a = self.assignments.read()
        if a is None:
            raise ValueError("index not built")
        crows = cents.select("cell", "centroid").collect()
        srows = (
            a.select(self.id_col, "cell", self.vec_col)
            .orderBy(F.xxhash64(F.col(self.id_col)), F.col(self.id_col))
            .limit(256)
            .collect()
        )
        sample = [
            (r[0], r[1], [float(x) for x in r[2]]) for r in srows
        ]
        qrows = (
            queries.select(qid_col, qvec_col)
            .orderBy(
                F.xxhash64(F.col(qid_col).cast("string")),
                F.col(qid_col),
            )
            .limit(_BATCH_SAMPLE_QUERIES)
            .collect()
        )
        import numpy as np

        cellids = [r[0] for r in crows]
        C = np.asarray(
            [[float(x) for x in r[1]] for r in crows], dtype=np.float64
        )
        nC = np.linalg.norm(C, axis=1)
        nC[nC == 0] = 1.0
        qvecs, orders = [], []
        for r in qrows:
            qv = [float(x) for x in r[1]]
            q = np.asarray(qv, dtype=np.float64)
            nq = float(np.linalg.norm(q)) or 1.0
            cs = (C @ q) / (nC * nq)
            order = [
                c
                for _neg, c in sorted(
                    zip((-cs).tolist(), cellids)
                )
            ]
            qvecs.append(qv)
            orders.append(order)
        info = _rc.choose_ivf_probe_batch(
            sample, qvecs, k, orders, n, recall_target, cap
        )
        _rc.record_probe_decision(op, info, recall_target)
        return int(info["n_probe"])

    def topk_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int | None = None,
        qid_col: str = "qid",
        qvec_col: str = "q",
        recall_target: float | None = None,
        max_n_probe: int | None = None,
    ) -> DataFrame:
        """Batched index-backed serving (VERDICT r12 task #3): top-k
        for a query TABLE with ZERO per-query driver work — ``topk``
        collects probe cells once per query (10k queries = 10k driver
        round-trips); here ALL queries route to their probe cells via
        one broadcast join against the k-row centroid table, one
        bounded collect takes the UNION of probed cells (≤ k_cells
        values however large the batch) into the chunk/file-pruned
        assignments read, and the per-query candidate sets re-form by
        joining the (query, cell) routes against the pruned
        candidates on cell (routes broadcast: a query batch is tiny
        next to the corpus). One window top-k per query. Per-query
        results are EXACTLY ``topk``'s — same cosine expression, same
        rounding, same tie-break — pinned by tests/test_ann_index.py.

        ``queries``: (qid_col, qvec_col) rows. Output: (qid, id,
        cell, cos_sim), k rows per query.

        ``recall_target`` (VERDICT r13 #4): the single-query fence's
        batch twin — ONE escalation decision for the whole batch from
        a bounded query sample (_batch_probe_escalation), surfaced at
        recall.last_reroute_info('persisted_ivf_topk_batch')."""
        n = self.n_probe if n_probe is None else n_probe
        if recall_target is not None:
            n = self._batch_probe_escalation(
                queries, k, n, recall_target, max_n_probe,
                qid_col, qvec_col, "persisted_ivf_topk_batch",
            )
        routes, cells = self._batch_routes(queries, n, qid_col, qvec_col)
        cand = self.assignments.read(where=[("cell", "in", cells)])
        scored = cand.join(F.broadcast(routes), "cell").select(
            qid_col,
            self.id_col,
            "cell",
            F.round(
                cosine(F.col(self.vec_col), F.col(qvec_col)), 6
            ).alias("cos_sim"),
        )
        ws = Window.partitionBy(qid_col).orderBy(
            F.col("cos_sim").desc_nulls_last(), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("__rn", F.row_number().over(ws))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def topk_batch_adc(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int | None = None,
        qid_col: str = "qid",
        qvec_col: str = "q",
        recall_target: float | None = None,
        max_n_probe: int | None = None,
    ) -> DataFrame:
        """Batched PQ-ADC serving: same zero-per-query routing as
        ``topk_batch``, but the candidate scan reads ONLY (id, cell,
        codes) — m small ints per vector, never the raw embeddings —
        and scores each (query, candidate) pair asymmetrically
        against the frozen codebook, embedded as per-subspace centroid
        literals. The accumulation order (0-seeded left-to-right
        per-subspace dot, subspace terms added left to right, round 6)
        is bit-identical to ``topk_adc``'s driver-side LUT — the LUT
        contraction simply happens row-wise against the query column
        instead of folding to literals; tests pin per-query equality."""
        if self.pq is None:
            raise ValueError("index built without pq=(m, k)")
        from stupp_exclusion_etl_spark.operators.similarity import _dlit

        book = self._load_codebook()
        m = len(book)
        kc = len(book[0])
        d = len(book[0][0])
        n = self.n_probe if n_probe is None else n_probe
        if recall_target is not None:
            # same once-per-batch escalation as topk_batch (routing
            # is identical; only candidate scoring differs)
            n = self._batch_probe_escalation(
                queries, k, n, recall_target, max_n_probe,
                qid_col, qvec_col, "persisted_ivf_topk_batch_adc",
            )
        routes, cells = self._batch_routes(queries, n, qid_col, qvec_col)
        cand = self.assignments.read(
            where=[("cell", "in", cells)]
        ).select(self.id_col, "cell", "codes")
        joined = cand.join(F.broadcast(routes), "cell")
        terms = []
        for s in range(m):
            cents_lit = "array(" + ", ".join(
                "array(" + ", ".join(_dlit(x) for x in book[s][c]) + ")"
                for c in range(kc)
            ) + ")"
            sub = f"slice({qvec_col}, {s * d + 1}, {d})"
            terms.append(
                f"aggregate(zip_with({sub}, "
                f"element_at({cents_lit}, codes[{s}] + 1), "
                f"(a, b) -> CAST(a AS DOUBLE) * b), "
                f"0.0D, (acc, x) -> acc + x)"
            )
        score = " + ".join(terms)
        out = joined.selectExpr(
            qid_col, self.id_col, f"round({score}, 6) AS adc_score"
        )
        ws = Window.partitionBy(qid_col).orderBy(
            F.col("adc_score").desc(), F.col(self.id_col).asc()
        )
        return (
            out.withColumn("__rn", F.row_number().over(ws))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def topk_adc(
        self,
        query_vec: list[float],
        k: int = 10,
        n_probe: int | None = None,
    ) -> DataFrame:
        """PQ-ADC serving from the persisted codes: probe cells, then
        asymmetric-distance top-k over ONLY the probed cells'
        (id, codes) rows — the billion-vector layout (IVF routes, PQ
        codes score): the candidate scan reads m small ints per
        vector, never the raw embeddings."""
        if self.pq is None:
            raise ValueError("index built without pq=(m, k)")
        from stupp_exclusion_etl_spark.operators.similarity import (
            pq_adc_topk,
        )

        # LocalRelation literal (zero-job probe collect — see _local_df)
        q = _local_df(
            self.spark,
            [([float(x) for x in query_vec],)], "q array<float>",
        )
        cells = self.probe_cells(q, n_probe)
        cand = self.assignments.read(
            where=[("cell", "in", cells)]
        ).select(self.id_col, "codes")
        return pq_adc_topk(
            cand, self._load_codebook(), [float(x) for x in query_vec],
            k=k, id_col=self.id_col,
        )
