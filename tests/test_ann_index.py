"""Persisted, CDC-maintained IVF index (operators/ann_index.py —
VERDICT r11 task #2). The oracle-hashed lifecycle runs as the
registered ``sim_index_incremental`` query; these tests pin the
contracts the oracle can't see:

- refresh() is O(churn): its counters equal the commit's change-set
  size and the assignments table's own CDC shows ONLY changed ids
- deletes leave no stale assignment row
- the index is durable: a fresh handle over the same paths serves the
  identical top-k without rebuilding
- serving is pruned: the probed-cell read keeps a strict subset of
  the assignment files
- the drift fence: adversarial churn degrades quality past the
  threshold, maybe_rebuild() retrains, quality recovers, and the
  full-probe serve equals brute force again
- the kmeans trainer uses the same storage/maintenance plane
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.ann_index import PersistedIvfIndex
from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable

DIM = 8
N_CLUSTERS = 4


def _vec(cluster: int, jitter: int) -> list[float]:
    """Deterministic clustered vector: a dominant axis pair per
    cluster plus a small id-dependent perturbation."""
    v = [0.05 * ((jitter * (i + 3)) % 7 - 3) for i in range(DIM)]
    v[cluster * 2] += 4.0
    v[cluster * 2 + 1] += 2.0
    return [float(x) for x in v]


def _mk_corpus(spark, path, n=200):
    rows = [
        (i, _vec(i % N_CLUSTERS, i), 0)
        for i in range(1, n + 1)
    ]
    t = AtomicParquetTable(spark, path, keys=["vec_id"])
    t.upsert(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, ts long"
        ),
        [F.col("ts").desc()],
    )
    return t


def _brute(spark, corpus, qvec, k=10):
    from stupp_exclusion_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    q = spark.createDataFrame([(qvec,)], "q array<float>")
    return sorted(
        (r[0], r[1])
        for r in brute_force_topk(
            corpus.read(), q, k=k, vec_col="embedding", id_col="vec_id"
        ).collect()
    )


def _served(idx, spark, qvec, k=10, n_probe=None):
    q = spark.createDataFrame([(qvec,)], "q array<float>")
    return sorted(
        (r.vec_id, r.cos_sim)
        for r in idx.topk(q, k=k, n_probe=n_probe).collect()
    )


def test_refresh_is_o_churn_and_delete_hygiene(spark, tmp_path):
    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    info = idx.build()
    assert info["baseline_quality"] > 0.8  # clustered data: tight cells

    a_v0 = idx.assignments.current_version()
    # churn: 5 updates (move to another cluster's vector), 3 inserts,
    # 4 deletes — three commits, three refreshes
    upd = spark.createDataFrame(
        [(i, _vec((i + 1) % N_CLUSTERS, i + 7), 1) for i in (1, 5, 9, 13, 17)],
        "vec_id long, embedding array<float>, ts long",
    )
    corpus.upsert(upd, [F.col("ts").desc()])
    r1 = idx.refresh()
    assert (r1["n_upserted"], r1["n_deleted"]) == (5, 0)

    ins = spark.createDataFrame(
        [(i, _vec(i % N_CLUSTERS, i), 2) for i in (501, 502, 503)],
        "vec_id long, embedding array<float>, ts long",
    )
    corpus.upsert(ins, [F.col("ts").desc()])
    r2 = idx.refresh()
    assert (r2["n_upserted"], r2["n_deleted"]) == (3, 0)

    corpus.delete_keys(
        spark.createDataFrame([(i,) for i in (2, 6, 10, 501)], "vec_id long")
    )
    r3 = idx.refresh()
    assert (r3["n_upserted"], r3["n_deleted"]) == (0, 4)

    # the assignments table's OWN change feed across the whole
    # maintenance window touches exactly the churned ids — the
    # incremental contract, observed from the state table itself
    ch = idx.assignments.changes(a_v0, idx.assignments.current_version())
    touched = {(r.vec_id, r._change_type) for r in ch.collect()}
    # endpoint-snapshot semantics: 501 (inserted then deleted inside
    # the window) nets out of the feed entirely
    assert touched == (
        {(i, "update") for i in (1, 5, 9, 13, 17)}
        | {(i, "insert") for i in (502, 503)}
        | {(i, "delete") for i in (2, 6, 10)}
    ), touched

    # no stale assignment rows for deleted keys
    live = {r.vec_id for r in idx.assignments.read().collect()}
    assert not live & {2, 6, 10, 501}
    assert live == {r.vec_id for r in corpus.read().collect()}

    # full-probe serve equals brute force on the final snapshot
    qv = _vec(1, 999)
    assert _served(idx, spark, qv, n_probe=N_CLUSTERS) == _brute(
        spark, corpus, qv
    )


def test_index_is_durable_across_handles(spark, tmp_path):
    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    idx.build()
    qv = _vec(2, 123)
    before = _served(idx, spark, qv)

    # a brand-new handle (fresh process in production) serves the
    # same answer from the persisted tables — no build, no retrain
    idx2 = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    assert _served(idx2, spark, qv) == before
    # and its cursor survives too: refresh on an unchanged corpus is
    # the cheap no-op
    r = idx2.refresh()
    assert (r["n_upserted"], r["n_deleted"]) == (0, 0)


def test_serving_read_is_pruned_to_probed_cells(spark, tmp_path):
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus", n=400)
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=1,
    )
    idx.build()
    q = spark.createDataFrame([(_vec(0, 42),)], "q array<float>")
    cells = idx.probe_cells(q, n_probe=1)
    assert len(cells) == 1
    rep = idx.assignments.skipping_report([("cell", "in", cells)])
    # cell-clustered layout: the probe reads a strict subset of files
    assert 0 < rep["files_kept"] < rep["files_total"], rep


def test_drift_fence_triggers_rebuild_and_recovers(spark, tmp_path):
    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    info = idx.build()
    base_q = info["baseline_quality"]

    # benign churn stays inside the fence
    assert idx.maybe_rebuild(max_drop=0.05) is False

    # adversarial churn: rotate EVERY vector to a different cluster's
    # axis pair — frozen centroids now describe the wrong geometry
    shifted = spark.createDataFrame(
        [
            (i, _vec((i + 2) % N_CLUSTERS, i * 3 + 1), 9)
            for i in range(1, 201)
        ],
        "vec_id long, embedding array<float>, ts long",
    )
    corpus.upsert(shifted, [F.col("ts").desc()])
    idx.refresh()
    # refresh kept the index CONSISTENT (each vector at its nearest
    # frozen centroid) — quality may not crater on symmetric shifts,
    # so degrade the geometry for real: collapse all vectors toward a
    # diagonal no frozen centroid points at
    diag = [1.0] * DIM
    mush = spark.createDataFrame(
        [
            (i, [x + 0.03 * i for x in diag], 10)
            for i in range(1, 201)
        ],
        "vec_id long, embedding array<float>, ts long",
    )
    corpus.upsert(mush, [F.col("ts").desc()])
    idx.refresh()
    q_drifted = idx.quality()
    assert q_drifted < base_q - 0.05, (base_q, q_drifted)

    assert idx.maybe_rebuild(max_drop=0.05) is True
    q_rebuilt = idx.quality()
    assert q_rebuilt > q_drifted
    # retrained index serves brute-force-exact again under full probe
    qv = [1.0] * DIM
    assert _served(idx, spark, qv, n_probe=N_CLUSTERS) == _brute(
        spark, corpus, qv
    )
    # and the baseline was re-anchored so the fence re-arms
    assert idx.maybe_rebuild(max_drop=0.05) is False


def test_kmeans_trainer_same_plane(spark, tmp_path):
    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2, trainer="kmeans",
    )
    info = idx.build()
    # real k-means on 4 synthetic clusters: near-perfect cells
    assert info["baseline_quality"] > 0.9
    qv = _vec(3, 77)
    assert _served(idx, spark, qv, n_probe=N_CLUSTERS) == _brute(
        spark, corpus, qv
    )
    # incremental maintenance identical under the kmeans plane
    corpus.upsert(
        spark.createDataFrame(
            [(999, _vec(3, 5), 1)],
            "vec_id long, embedding array<float>, ts long",
        ),
        [F.col("ts").desc()],
    )
    r = idx.refresh()
    assert (r["n_upserted"], r["n_deleted"]) == (1, 0)
    assert 999 in {r.vec_id for r in idx.assignments.read().collect()}


def test_pq_codes_persisted_and_adc_serving(spark, tmp_path):
    """pq=(m, k): the codebook and per-vector codes persist as index
    artifacts; refresh re-encodes ONLY changed vectors through the
    frozen codebook; full-probe ADC from the persisted codes equals
    ADC over a from-scratch encode of the final corpus (the
    maintenance-correctness oracle); a fresh handle serves without
    retraining."""
    from stupp_exclusion_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2, pq=(4, 8),
    )
    idx.build()
    # codebook persisted: m*k rows
    assert idx.codebook.read().count() == 4 * 8
    book = idx._load_codebook()
    assert len(book) == 4 and len(book[0]) == 8 and len(book[0][0]) == 2

    # churn: updates + insert + delete, maintained incrementally
    corpus.upsert(
        spark.createDataFrame(
            [(i, _vec((i + 1) % N_CLUSTERS, i + 3), 1) for i in (2, 9, 33)]
            + [(777, _vec(1, 5), 1)],
            "vec_id long, embedding array<float>, ts long",
        ),
        [F.col("ts").desc()],
    )
    corpus.delete_keys(spark.createDataFrame([(4,)], "vec_id long"))
    r = idx.refresh()
    assert r["n_upserted"] == 4 and r["n_deleted"] == 1

    qv = [float(x) for x in _vec(1, 321)]
    served = sorted(
        (r.vec_id, r.adc_score)
        for r in idx.topk_adc(qv, k=10, n_probe=N_CLUSTERS).collect()
    )
    fresh_codes = pq_encode(corpus.read(), book)
    want = sorted(
        (r.vec_id, r.adc_score)
        for r in pq_adc_topk(fresh_codes, book, qv, k=10).collect()
    )
    assert served == want, "persisted codes diverged from re-encode"

    # pruned ADC probe reads only probed cells' rows and stays sane
    top1 = idx.topk_adc(qv, k=1, n_probe=1).collect()
    assert len(top1) == 1

    # durability: a new handle loads the codebook from its table
    idx2 = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2, pq=(4, 8),
    )
    served2 = sorted(
        (r.vec_id, r.adc_score)
        for r in idx2.topk_adc(qv, k=10, n_probe=N_CLUSTERS).collect()
    )
    assert served2 == served


def _jobs_for(spark, group: str, fn) -> int:
    """Run fn under a job group and count the Spark jobs it launched
    — the driver-work meter for the batched-serving contract."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_batch_topk_equals_looped_topk(spark, tmp_path):
    """VERDICT r12 task #3: topk_batch over a query TABLE returns,
    per query, EXACTLY what the looped single-query topk returns —
    same cosine, same rounding, same tie-break."""
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    idx.build()
    qvecs = {i: _vec(i % N_CLUSTERS, 100 + i) for i in range(1, 10)}
    queries = spark.createDataFrame(
        [(i, v) for i, v in qvecs.items()], "qid long, q array<float>"
    )
    by_qid: dict[int, list] = {}
    for r in idx.topk_batch(queries, k=5).collect():
        by_qid.setdefault(r.qid, []).append((r.vec_id, r.cell, r.cos_sim))
    assert sorted(by_qid) == sorted(qvecs)
    for i, v in qvecs.items():
        q = spark.createDataFrame([(v,)], "q array<float>")
        want = [
            (r.vec_id, r.cell, r.cos_sim)
            for r in idx.topk(q, k=5, n_probe=2).collect()
        ]
        assert sorted(by_qid[i]) == sorted(want), i


def test_batch_topk_adc_equals_looped_adc(spark, tmp_path):
    """Batched PQ-ADC: per-query parity with the looped topk_adc —
    the row-wise LUT contraction must be bit-identical to the
    driver-side literal LUT (same accumulation order, same round)."""
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2, pq=(4, 8),
    )
    idx.build()
    qvecs = {i: [float(x) for x in _vec(i % N_CLUSTERS, 55 + i)]
             for i in range(1, 7)}
    queries = spark.createDataFrame(
        [(i, v) for i, v in qvecs.items()], "qid long, q array<float>"
    )
    by_qid: dict[int, list] = {}
    for r in idx.topk_batch_adc(queries, k=5).collect():
        by_qid.setdefault(r.qid, []).append((r.vec_id, r.adc_score))
    # the batch reads q as array<float>: hand the looped path the
    # same float32-quantized values, not the raw float64 inputs
    quantized = {r.qid: [float(x) for x in r.q] for r in queries.collect()}
    for i in qvecs:
        want = [
            (r.vec_id, r.adc_score)
            for r in idx.topk_adc(quantized[i], k=5, n_probe=2).collect()
        ]
        assert sorted(by_qid[i]) == sorted(want), i


def test_batch_topk_driver_work_is_flat_in_batch_size(spark, tmp_path):
    """The scale contract: the looped path pays driver round-trips
    PER QUERY (probe collect + serve), so its job count grows with
    the batch; topk_batch launches a batch-size-INDEPENDENT number of
    jobs (routing collect + one serve plan)."""
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    idx.build()

    def mk_queries(n):
        return spark.createDataFrame(
            [(i, _vec(i % N_CLUSTERS, 200 + i)) for i in range(n)],
            "qid long, q array<float>",
        )

    jb3 = _jobs_for(
        spark, "tb3", lambda: idx.topk_batch(mk_queries(3), k=5).collect()
    )
    jb9 = _jobs_for(
        spark, "tb9", lambda: idx.topk_batch(mk_queries(9), k=5).collect()
    )
    assert jb9 <= jb3 + 1, (jb3, jb9)

    def looped(n):
        for i in range(n):
            q = spark.createDataFrame(
                [(_vec(i % N_CLUSTERS, 200 + i),)], "q array<float>"
            )
            idx.topk(q, k=5, n_probe=2).collect()

    jl3 = _jobs_for(spark, "tl3", lambda: looped(3))
    jl9 = _jobs_for(spark, "tl9", lambda: looped(9))
    # looped driver work scales with the batch; batched does not
    assert jl9 >= jl3 + 6, (jl3, jl9)
    assert jb9 < jl9, (jb9, jl9)


def test_recall_contract_on_persisted_topk(spark, tmp_path):
    """VERDICT r12 task #6: serving with recall_target= estimates
    recall per probe depth from a bounded sample and ESCALATES
    n_probe until the estimate clears the target. Low-locality
    fixture (pseudo-random vectors, so modmean cells carry no
    geometry): n_probe=1 misses most true neighbors; the fenced serve
    escalates, reports its estimate, and the estimate tracks the
    recall measured against brute force."""
    import warnings as _w

    from stupp_exclusion_etl_spark.operators.recall import (
        last_reroute_info,
    )

    root = str(tmp_path)
    rows = [
        (
            i,
            [float(((i * 37 + d * 101) % 17) - 8) for d in range(DIM)],
            0,
        )
        for i in range(1, 301)
    ]
    corpus = AtomicParquetTable(spark, root + "/corpus", keys=["vec_id"])
    corpus.upsert(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, ts long"
        ),
        [F.col("ts").desc()],
    )
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index", k_cells=8, n_probe=1
    )
    idx.build()
    qv = [float(((d * 53) % 15) - 7) for d in range(DIM)]

    def measured_recall(served_ids):
        truth = {i for i, _c in _brute(spark, corpus, qv, k=10)}
        return len(set(served_ids) & truth) / len(truth)

    # unfenced n_probe=1: low-locality routing misses true neighbors
    base_ids = [
        r.vec_id
        for r in idx.topk(
            spark.createDataFrame([(qv,)], "q array<float>"), k=10,
            n_probe=1,
        ).collect()
    ]
    base_recall = measured_recall(base_ids)
    assert base_recall < 0.9, base_recall

    # fenced serve: escalates past n_probe=1, reports its estimate
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        served = idx.topk(
            spark.createDataFrame([(qv,)], "q array<float>"), k=10,
            n_probe=1, recall_target=0.7,
        ).collect()
    info = last_reroute_info("persisted_ivf_topk")
    assert info is not None and info["escalated"], info
    assert info["n_probe"] > 1
    assert info["recall_est"] >= 0.7
    got_recall = measured_recall([r.vec_id for r in served])
    assert got_recall >= base_recall
    # the estimate tracks reality (sample-sized tolerance)
    assert abs(info["recall_est"] - got_recall) <= 0.3, (
        info["recall_est"], got_recall,
    )

    # unreachable target within a hard cap -> argmax config + warning
    with pytest.warns(UserWarning, match="estimated recall"):
        idx.topk(
            spark.createDataFrame([(qv,)], "q array<float>"), k=10,
            n_probe=1, recall_target=0.999, max_n_probe=2,
        ).collect()
    capped = last_reroute_info("persisted_ivf_topk")
    assert capped["n_probe"] == 2

    # full-probe target is always reachable: estimate hits 1.0 and the
    # served set IS the brute-force set
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        full = idx.topk(
            spark.createDataFrame([(qv,)], "q array<float>"), k=10,
            n_probe=1, recall_target=1.0,
        ).collect()
    assert last_reroute_info("persisted_ivf_topk")["recall_est"] == 1.0
    assert measured_recall([r.vec_id for r in full]) == 1.0


def test_recall_cap_below_default_n_probe(spark, tmp_path):
    """ADVICE r13 (medium): max_n_probe BELOW the effective n_probe
    must not crash choose_ivf_probe with an empty escalation range —
    the cap wins and the serve runs at the capped depth."""
    import warnings as _w

    from stupp_exclusion_etl_spark.operators.recall import (
        choose_ivf_probe,
        last_reroute_info,
    )

    # unit level: empty-range regression (n_probe=3 > max_n_probe=2)
    sample = [
        (i, i % 3, [float((i * 7 + d) % 5) for d in range(4)])
        for i in range(30)
    ]
    info = choose_ivf_probe(
        sample, [1.0, 0.0, 2.0, 1.0], 5, [0, 1, 2], 3, 0.9, 2
    )
    assert info is not None and info["n_probe"] <= 2

    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index", k_cells=4, n_probe=3
    )
    idx.build()
    q = spark.createDataFrame([(_vec(1, 999),)], "q array<float>")
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        rows = idx.topk(
            q, k=5, recall_target=0.9, max_n_probe=2
        ).collect()
    assert len(rows) == 5
    assert last_reroute_info("persisted_ivf_topk")["n_probe"] <= 2
    with pytest.raises(ValueError, match="max_n_probe"):
        idx.topk(q, k=5, recall_target=0.9, max_n_probe=0)


def test_recall_fence_on_never_built_index(spark, tmp_path):
    """ADVICE r13 (low): the recall_target branch on a never-built
    index raises the same 'index not built' ValueError as the
    unfenced path, not AttributeError on a None assignments read."""
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus")
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index", k_cells=4, n_probe=1
    )
    q = spark.createDataFrame([(_vec(0, 7),)], "q array<float>")
    with pytest.raises(ValueError, match="index not built"):
        idx.topk(q, k=5, recall_target=0.9).collect()


def test_recall_contract_on_batched_serving(spark, tmp_path):
    """VERDICT r13 next-round #4: topk_batch(recall_target=) shares
    topk's estimate-and-escalate machinery with the escalation
    decided ONCE per batch. Low-locality fixture (pseudo-random
    vectors): the batch path escalates n_probe past the floor, the
    reported (conservative, min-over-sampled-queries) estimate
    tracks recall measured against brute force, and the unfenced
    batch result is unchanged by the feature's existence."""
    import warnings as _w

    from stupp_exclusion_etl_spark.operators.recall import (
        last_reroute_info,
    )

    root = str(tmp_path)
    rows = [
        (
            i,
            [float(((i * 37 + d * 101) % 17) - 8) for d in range(DIM)],
            0,
        )
        for i in range(1, 301)
    ]
    corpus = AtomicParquetTable(spark, root + "/corpus", keys=["vec_id"])
    corpus.upsert(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, ts long"
        ),
        [F.col("ts").desc()],
    )
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index", k_cells=8, n_probe=1
    )
    idx.build()
    qvs = [
        (j, [float(((d * 53 + j * 11) % 15) - 7) for d in range(DIM)])
        for j in range(1, 4)
    ]
    qdf = spark.createDataFrame(qvs, "qid long, q array<float>")

    def recalls(served_rows):
        by_q = {}
        for r in served_rows:
            by_q.setdefault(r.qid, set()).add(r.vec_id)
        out = {}
        for qid, qv in qvs:
            truth = {i for i, _c in _brute(spark, corpus, qv, k=10)}
            out[qid] = len(by_q.get(qid, set()) & truth) / len(truth)
        return out

    base = idx.topk_batch(qdf, k=10, n_probe=1).collect()
    base_rec = recalls(base)
    assert min(base_rec.values()) < 0.9, base_rec

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        fenced = idx.topk_batch(
            qdf, k=10, n_probe=1, recall_target=0.7
        ).collect()
    info = last_reroute_info("persisted_ivf_topk_batch")
    assert info is not None and info["escalated"], info
    assert info["n_probe"] > 1
    assert info["recall_est"] >= 0.7
    assert info["sampled_queries"] == 3
    fr = recalls(fenced)
    # conservative min-estimate: every query's measured recall is
    # within sample tolerance of the reported floor
    for qid in fr:
        assert fr[qid] >= base_rec[qid] - 1e-9, (qid, fr, base_rec)
    assert abs(info["recall_est"] - min(fr.values())) <= 0.3, (
        info, fr,
    )

    # full-probe target: served set IS brute force for every query
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        full = idx.topk_batch(
            qdf, k=10, n_probe=1, recall_target=1.0
        ).collect()
    assert last_reroute_info("persisted_ivf_topk_batch")[
        "recall_est"
    ] == 1.0
    assert all(v == 1.0 for v in recalls(full).values())

    # unreachable target under a hard cap -> warning + capped depth
    with pytest.warns(UserWarning, match="estimated recall"):
        idx.topk_batch(
            qdf, k=10, n_probe=1, recall_target=0.999, max_n_probe=2
        ).collect()
    assert last_reroute_info("persisted_ivf_topk_batch")["n_probe"] == 2

    # ADC twin records under its own op key
    root2 = str(tmp_path / "pq")
    idxp = PersistedIvfIndex(
        spark, root + "/corpus", root2, k_cells=8, n_probe=1,
        pq=(4, 8),
    )
    idxp.build()
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        adc = idxp.topk_batch_adc(
            qdf, k=10, n_probe=1, recall_target=0.7
        ).collect()
    inf2 = last_reroute_info("persisted_ivf_topk_batch_adc")
    assert inf2 is not None and inf2["n_probe"] > 1
    assert len(adc) == 30


# -- scale-adaptive layout + large-k Arrow assignment (r15) ------------


def test_target_cell_rows_derives_k_from_corpus(spark, tmp_path):
    """target_cell_rows makes the cell count scale with the corpus so
    probed-cell size stays bounded (VERDICT r14 next-round #1); the
    configured k_cells is the FLOOR, so small corpora keep the fixed
    layout byte-identically."""
    root = str(tmp_path)
    _mk_corpus(spark, root + "/corpus", n=200)
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx_scaled",
        k_cells=4, n_probe=2, target_cell_rows=32,
    )
    idx.build()
    assert idx.k_cells == 7  # ceil(200 / 32)
    assert idx.centroids.read().count() == 7
    assert idx.assignments.read().count() == 200

    idx_floor = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx_floor",
        k_cells=4, n_probe=2, target_cell_rows=1000,
    )
    idx_floor.build()
    assert idx_floor.k_cells == 4  # floor wins below k * target rows


def test_arrow_assign_matches_join_window_reference(spark, tmp_path):
    """k > _ASSIGN_FOLD_MAX_CELLS routes assignment through the numpy
    mapInArrow path; pin it cell-for-cell against the reference
    crossJoin + row_number argmax (the pre-r15 fallback route),
    including a zero vector (every cosine NULL under try_divide ->
    lowest cell, NULL cent_cos)."""
    from pyspark.sql.window import Window

    from stupp_exclusion_etl_spark.functions.vectors import cosine

    root = str(tmp_path)
    n = 299
    rows = [(i, _vec(i % N_CLUSTERS, i), 0) for i in range(1, n + 1)]
    rows.append((n + 1, [0.0] * DIM, 0))  # zero vector
    t = AtomicParquetTable(spark, root + "/corpus", keys=["vec_id"])
    t.upsert(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, ts long"
        ),
        [F.col("ts").desc()],
    )
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx",
        k_cells=72, n_probe=3,
    )
    assert idx.k_cells > idx._ASSIGN_FOLD_MAX_CELLS
    idx.build()

    assigned = idx._assign(t.read().select("vec_id", "embedding"))
    got = {r.vec_id: (r.cell, r.cent_cos) for r in assigned.collect()}

    cents = idx.centroids.read().select("cell", "centroid")
    scored = (
        t.read()
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .withColumn("__c", cosine(F.col("embedding"), F.col("centroid")))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__c").desc_nulls_last(), F.col("cell").asc()
    )
    ref = {
        r["vec_id"]: (r["cell"], r["__c"])
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert set(got) == set(ref) and len(got) == n + 1
    for vid, (cell, cos) in got.items():
        rcell, rcos = ref[vid]
        assert cell == rcell, f"vec {vid}: arrow cell {cell} != {rcell}"
        assert (cos is None) == (rcos is None), f"vec {vid} null mismatch"
        if cos is not None:
            assert cos == pytest.approx(rcos, abs=1e-12)
    # the zero vector: all-NULL cosines keep the lowest cell
    assert got[n + 1][0] == min(r[0] for r in cents.select("cell").collect())
    assert got[n + 1][1] is None


def test_scaled_layout_batch_serving_matches_looped(spark, tmp_path):
    """End-to-end under an auto-scaled k > 64 layout (arrow-assigned
    build): batched serving still equals the looped single-query serve
    per query."""
    root = str(tmp_path)
    t = _mk_corpus(spark, root + "/corpus", n=280)
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx",
        k_cells=8, n_probe=3, target_cell_rows=4,
    )
    idx.build()
    assert idx.k_cells == 70  # ceil(280 / 4) -> arrow assign path
    qvecs = [(100 + j, _vec(j % N_CLUSTERS, 31 * j + 5)) for j in range(3)]
    qdf = spark.createDataFrame(qvecs, "qid long, q array<float>")
    batch = idx.topk_batch(qdf, k=5, n_probe=3).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.qid, []).append((r.vec_id, r.cell, r.cos_sim))
    for qid, qv in qvecs:
        single = spark.createDataFrame([(qv,)], "q array<float>")
        loop = [
            (r.vec_id, r.cell, r.cos_sim)
            for r in idx.topk(single, k=5, n_probe=3).collect()
        ]
        assert by_q[qid] == loop, f"query {qid} batch != looped"


def test_stored_cent_cos_equals_recomputed_quality(spark, tmp_path):
    """quality() now aggregates the STORED cent_cos column; pin it
    bit-for-bit against the pre-r15 recompute (broadcast centroid join
    + cosine re-fold) after build AND after churn refreshes, and pin
    the drift check's job count (manifest-stats emptiness + one
    single-column aggregate + the meta lookup)."""
    from stupp_exclusion_etl_spark.functions.vectors import cosine

    root = str(tmp_path)
    t = _mk_corpus(spark, root + "/corpus", n=120)
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    idx.build()

    def recomputed() -> float:
        a = idx.assignments.read()
        cents = idx.centroids.read().select("cell", "centroid")
        return float(
            a.join(F.broadcast(cents), "cell")
            .select(
                cosine(F.col("embedding"), F.col("centroid")).alias("c")
            )
            .agg(F.avg("c"))
            .collect()[0][0]
        )

    assert idx.quality() == recomputed()

    # churn: re-embed a stripe, refresh, metric must track the stored
    # column identically
    upd = [
        (i, _vec((i + 1) % N_CLUSTERS, i + 7), 1)
        for i in range(1, 121, 9)
    ]
    t.upsert(
        spark.createDataFrame(
            upd, "vec_id long, embedding array<float>, ts long"
        ),
        [F.col("ts").desc()],
    )
    idx.refresh()
    assert idx.quality() == recomputed()

    jobs = _jobs_for(
        spark, "drift-check", lambda: idx.maybe_rebuild(max_drop=0.9)
    )
    assert jobs <= 4, f"drift check ran {jobs} jobs (want <= 4)"


def test_cursor_rides_final_commit_and_crash_replays(spark, tmp_path):
    """The applied cursor rides the refresh's FINAL data commit as its
    batch_id (no separate meta commit, no torn window). Pin:
    (a) a refresh writes NO meta version — the cursor is recovered
        from assignments.last_batch_id() and a fresh handle still
        no-ops on an unchanged corpus;
    (b) a refresh that crashes between its delete and upsert commits
        replays to exactly the uninterrupted outcome (the cursor only
        advances with the final commit);
    (c) a replayed refresh after success is a no-op."""
    root = str(tmp_path)
    corpus = _mk_corpus(spark, root + "/corpus", n=100)
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    idx.build()
    meta_v_after_build = idx.meta.current_version()

    # churn with BOTH deletes and upserts in one commit window
    corpus.delete_keys(
        spark.createDataFrame([(i,) for i in (3, 7)], "vec_id long")
    )
    corpus.upsert(
        spark.createDataFrame(
            [(i, _vec((i + 1) % N_CLUSTERS, i + 11), 5) for i in (4, 8, 101)],
            "vec_id long, embedding array<float>, ts long",
        ),
        [F.col("ts").desc()],
    )

    # simulate the crash: run ONLY the delete half of the refresh the
    # way refresh() does (no batch_id on the non-final commit), then
    # "crash" before the upsert — the cursor must NOT have advanced
    head = corpus.current_version()
    doomed = spark.createDataFrame([(3,), (7,)], "vec_id long")
    idx.assignments.delete_keys(doomed, batch_id=None, _probe=(doomed, True))
    assert idx.assignments.last_batch_id() is None  # cursor unmoved

    # replay: the full refresh re-consumes the SAME feed idempotently
    r = idx.refresh()
    assert (r["n_deleted"], r["n_upserted"]) == (2, 3)
    live = {row.vec_id for row in idx.assignments.read().collect()}
    assert live == {row.vec_id for row in corpus.read().collect()}
    assert 3 not in live and 7 not in live and 101 in live

    # (a) cursor rode the data commit: meta untouched since build,
    # last_batch_id is the corpus head
    assert idx.meta.current_version() == meta_v_after_build
    assert idx.assignments.last_batch_id() == head

    # (c) replay after success: no-op, and a FRESH handle agrees
    r2 = idx.refresh()
    assert (r2["n_deleted"], r2["n_upserted"]) == (0, 0)
    idx2 = PersistedIvfIndex(
        spark, root + "/corpus", root + "/idx",
        k_cells=N_CLUSTERS, n_probe=2,
    )
    r3 = idx2.refresh()
    assert (r3["n_deleted"], r3["n_upserted"]) == (0, 0)
