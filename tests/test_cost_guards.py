"""Cost fences for the intrinsically-quadratic exact operators
(VERDICT r6 wrong #1/#2): the estimate trips on oversized inputs, the
re-routed bounded paths still find true near neighbors, and under
budget the guarded plans return results identical to the unguarded
ones (the CORRECTNESS-green property at driver scales)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.budget import CostBudgetExceeded
from stupp_exclusion_etl_spark.operators.dedup import embedding_neardup_pairs
from stupp_exclusion_etl_spark.operators.similarity import knn_join

from tests.conftest import SF_SMALL


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic pseudo-random unit-ish vector per id
    return [
        int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
        for d in range(dim)
    ]


@pytest.fixture(scope="module")
def hot_bucket(spark):
    """200 vectors in ONE bucket (est pairs = 19,900) with 40 planted
    exact-duplicate pairs (i, i+160 share a vector for i < 40)."""
    rows = [
        (i, _vec(i if i < 160 else i - 160), "hot")
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_pair_budget_trips_on_oversized_bucket(hot_bucket):
    with pytest.raises(CostBudgetExceeded, match="max_pairs"):
        embedding_neardup_pairs(
            hot_bucket, "vec_id", "embedding", F.col("label"), 0.9,
            max_pairs=1000,
        ).collect()


def test_pair_budget_subdivide_bounds_work_and_keeps_true_dups(hot_bucket):
    """The LSH sub-bucket route must (a) emit a SUBSET of the exact
    pairs (sub-bucketing can only drop cross-bucket pairs, never
    invent or mis-score one) and (b) keep every planted exact
    duplicate — identical vectors always share every sign bit."""
    exact = {
        (r.id1, r.id2)
        for r in embedding_neardup_pairs(
            hot_bucket, "vec_id", "embedding", F.col("label"), 0.9
        ).collect()
    }
    guarded = {
        (r.id1, r.id2)
        for r in embedding_neardup_pairs(
            hot_bucket, "vec_id", "embedding", F.col("label"), 0.9,
            max_pairs=1000, on_exceed="subdivide", dim=8,
        ).collect()
    }
    assert guarded <= exact
    planted = {(i, i + 160) for i in range(40)}
    assert planted <= guarded
    assert planted <= exact


def test_pair_budget_under_budget_identical_to_unguarded(spark):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    unguarded = embedding_neardup_pairs(
        e, "vec_id", "embedding", F.col("label"), 0.35
    ).collect()
    guarded = embedding_neardup_pairs(
        e, "vec_id", "embedding", F.col("label"), 0.35,
        max_pairs=2_000_000, on_exceed="subdivide", dim=64,
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, unguarded))


@pytest.fixture(scope="module")
def knn_corpus(spark):
    """300 corpus vectors; queries 9001..9003 are exact copies of
    corpus vectors 1..3 (cos = 1.0 planted rank-1 neighbors)."""
    corpus = spark.createDataFrame(
        [(i, _vec(i, 16)) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(9000 + i, _vec(i, 16)) for i in (1, 2, 3)],
        "q_id long, q array<double>",
    )
    return corpus, queries


def test_knn_budget_trips(knn_corpus):
    corpus, queries = knn_corpus
    with pytest.raises(CostBudgetExceeded, match="max_comparisons"):
        knn_join(corpus, queries, k=5, max_comparisons=100).collect()


def test_knn_lsh_route_bounded_and_finds_planted_neighbors(knn_corpus):
    """est = 900 comparisons > budget 400 → LSH route. Output shape
    must be intact (rnk 1..k per query, scores true cosines) and each
    query's planted exact copy must surface at rank 1 (identical
    vectors share every LSH bucket bit deterministically)."""
    corpus, queries = knn_corpus
    out = knn_join(
        corpus, queries, k=5,
        max_comparisons=400, on_exceed="lsh", dim=16,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {9001, 9002, 9003}
    for qid, rows in by_q.items():
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        top = min(rows, key=lambda r: r.rnk)
        assert top.vec_id == qid - 9000 and top.cos_sim == 1.0


def test_knn_under_budget_identical_to_unguarded(knn_corpus):
    corpus, queries = knn_corpus
    unguarded = knn_join(corpus, queries, k=5).collect()
    guarded = knn_join(
        corpus, queries, k=5, max_comparisons=10_000, on_exceed="lsh"
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, unguarded))


def test_lsh_max_bucket_cap_drops_degenerate_bucket(spark):
    """The minhash-LSH skew guard (VERDICT r6 wrong #3, now asserted,
    not implied): a degenerate bucket — here 120 byte-identical
    documents, which collide in EVERY band — must be dropped entirely
    once its size exceeds max_bucket, while ordinary-sized near-dup
    clusters below the cap keep their full pair set."""
    from stupp_exclusion_etl_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(120)]  # one giant identical cluster
    rows += [(1000 + i, f"totally unrelated text number {i} with words "
              f"alpha beta gamma delta {i}") for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=12, band_size=3, max_bucket=None
    ).count()
    assert uncapped >= 120 * 119 // 2  # the quadratic blowup is real

    capped = minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=12, band_size=3, max_bucket=100
    )
    giant = capped.filter((F.col("id1") < 1000) & (F.col("id2") < 1000))
    assert giant.count() == 0, "over-cap bucket must contribute no pairs"

    # a small cluster (40 < cap) is untouched by the guard
    small = spark.createDataFrame(
        [(i, base) for i in range(40)], "doc_id long, text string"
    )
    assert (
        minhash_lsh_pairs(
            small, "doc_id", "text", n_hashes=12, band_size=3, max_bucket=100
        ).count()
        == 40 * 39 // 2
    )


def test_registered_queries_take_exact_path_at_test_scale(spark):
    """The two registered (cost-guarded) queries must remain
    oracle-identical at driver scale — the guard must not perturb the
    exact path below budget."""
    from tests.harness import check

    check(spark, SF_SMALL, "dedup_embedding_cosine")
    check(spark, SF_SMALL, "sim_knn_join")


def test_estimate_cache_hits_and_invalidates(spark, tmp_path):
    """The guard's estimate job is memoized per (plan, input-file)
    fingerprint (retires the r7 bench-gate exception): a re-built frame
    over the same files computes once; rewriting a file invalidates;
    non-file-backed frames never consult the cache."""
    import time

    from stupp_exclusion_etl_spark.operators import budget

    p = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, _vec(i), "hot") for i in range(50)],
        "vec_id long, embedding array<double>, label string",
    ).coalesce(1).write.parquet(p)

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return 42

    df1 = spark.read.parquet(p).select("vec_id", "label")
    df2 = spark.read.parquet(p).select("vec_id", "label")  # re-built
    assert budget.cached_estimate("t", (df1,), compute) == 42
    assert budget.cached_estimate("t", (df2,), compute) == 42
    assert calls["n"] == 1, "identical plan+files must cache-hit"
    # a different plan over the same files is a different key
    df3 = spark.read.parquet(p).select("vec_id")
    assert budget.cached_estimate("t", (df3,), compute) == 42
    assert calls["n"] == 2
    # rewriting the files invalidates (size/mtime change)
    time.sleep(0.01)
    spark.createDataFrame(
        [(i, _vec(i), "hot") for i in range(60)],
        "vec_id long, embedding array<double>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df4 = spark.read.parquet(p).select("vec_id", "label")
    budget.cached_estimate("t", (df4,), compute)
    assert calls["n"] == 3, "rewritten input must recompute"
    # non-file-backed frames skip the cache entirely
    mem = spark.createDataFrame([(1,)], "a int")
    budget.cached_estimate("t", (mem,), compute)
    budget.cached_estimate("t", (mem,), compute)
    assert calls["n"] == 5


def test_estimate_cache_skips_hybrid_inmem_plans(spark, tmp_path):
    """A frame that MIXES a file-backed scan with an in-memory relation
    (createDataFrame union/join) has non-empty inputFiles() but a plan
    string that hides the in-memory rows ('LogicalRDD [id#3L], false'
    prints identically for different data) — it must never cache, or
    two different in-memory inputs would share a stale estimate."""
    from stupp_exclusion_etl_spark.operators import budget

    p = str(tmp_path / "hyb")
    spark.range(10).selectExpr("id", "id * 2 as v").write.parquet(p)
    base = spark.read.parquet(p)

    results = []

    hy1 = base.union(
        spark.createDataFrame([(100, 200)], "id long, v long")
    )
    hy2 = base.union(
        spark.createDataFrame([(100, 200), (101, 202)], "id long, v long")
    )
    assert budget._plan_fingerprint(hy1) is None, (
        "in-memory leaf plans must be uncacheable"
    )
    budget.cached_estimate("h", (hy1,), lambda: results.append(1) or 1)
    budget.cached_estimate("h", (hy2,), lambda: results.append(2) or 2)
    assert results == [1, 2], (
        "different in-memory inputs must each recompute"
    )


def test_guarded_query_estimates_once_across_calls(spark, tmp_path):
    """End-to-end: two calls of the guarded operator over the same
    parquet input run the pair-estimate aggregate exactly once — the
    second call plans no estimate job (the warm-tier cost the bench
    gate flagged in r7)."""
    from stupp_exclusion_etl_spark.operators import budget, dedup

    p = str(tmp_path / "emb2")
    spark.createDataFrame(
        [(i, _vec(i), f"b{i % 3}") for i in range(90)],
        "vec_id long, embedding array<double>, label string",
    ).write.parquet(p)

    real = dedup._estimate_bucket_pairs
    calls = {"n": 0}

    def spy(e, c):
        calls["n"] += 1
        return real(e, c)

    dedup._estimate_bucket_pairs = spy
    try:
        for _ in range(2):
            e = spark.read.parquet(p)
            out = embedding_neardup_pairs(
                e, "vec_id", "embedding", F.col("label"), 0.99,
                max_pairs=1_000_000,
            )
            out.count()
    finally:
        dedup._estimate_bucket_pairs = real
    assert calls["n"] == 1, (
        "the estimate must be fingerprint-cached across calls"
    )


def test_rerouted_paths_recall_gate(spark):
    """Committed recall floor for the budget reroutes (VERDICT r7
    wrong #2): on the planted-cluster fixture deliberately ABOVE both
    budgets — the regime the operators' own thresholds target
    (intra-cluster cosine ≈ 0.99) — the LSH-routed knn_join must keep
    recall@5 ≥ 0.95 and sub-bucketed embedding_neardup_pairs must keep
    pair recall ≥ 0.9 with precision 1.0. The same fixture/budgets
    produce RECALL_r08.json (tools/recall_metrics.py); a silent
    routing regression fails here, not just in the JSON."""
    import tools.recall_metrics as rm

    cl = rm.clustered_vectors()
    knn_r, _, _ = rm.knn_recall(spark, cl)
    assert knn_r >= 0.95, f"LSH-routed knn recall@5 degraded: {knn_r}"
    pair_r, n_exact, _, _ = rm.neardup_recall(spark, cl, threshold=0.95)
    assert n_exact > 0
    assert pair_r >= 0.9, f"sub-bucketed pair recall degraded: {pair_r}"


def test_neardup_configs_never_empty():
    """ADVICE r9: when est/max_pairs > 2^30 every ladder rung exceeds
    the 30-bit ceiling and neardup_configs returned [], crashing
    choose_neardup_config at configs[0] — exactly the quadratic-pair
    regime the budget guard exists for. The ladder must clamp to
    (30, 1) like knn_configs' 16-plane fallback."""
    from stupp_exclusion_etl_spark.operators import recall as rc

    assert rc.neardup_configs(2**40, 1) == [(30, 1)]
    # a config therefore always exists for the chooser
    cfg = rc.choose_neardup_config(
        sample=[], threshold=0.9, est=2**40, max_pairs=1,
        recall_target=None,
    )
    assert (cfg["n_bits"], cfg["n_tables"]) == (30, 1)
    # and with a target, the analytic fallback ranks the single rung
    cfg2 = rc.choose_neardup_config(
        sample=[], threshold=0.9, est=2**40, max_pairs=1,
        recall_target=0.99,
    )
    assert (cfg2["n_bits"], cfg2["n_tables"]) == (30, 1)
    # normal regime unchanged: T=1 first, bits nondecreasing with T,
    # every rung's expected candidate work within budget
    ladder = rc.neardup_configs(10_000_000, 10_000)
    assert ladder[0] == (10, 1)
    assert all(
        b2 >= b1 for (b1, _), (b2, _) in zip(ladder, ladder[1:])
    )
    assert all(
        t * 10_000_000 / 2**b <= 10_000 for b, t in ladder
    )


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_adversarial_reroute_estimates_and_escalation(spark):
    """The r8 silent-quality-cliff gate (VERDICT r8 wrong #1): on the
    ADVERSARIAL-random fixture — uniform vectors with no locality, the
    hardest case for sign-projection LSH — the reroutes must now (a)
    ESTIMATE their recall within ±0.15 of the measured truth (both
    sides deterministic: md5 fixture, md5 hyperplanes), (b) WARN that
    results are incomplete, and (c) ESCALATE under recall_target to a
    measurably better config within the SAME budget, clearing floors
    the un-escalated route cannot (RECALL_r09: neardup 0.076 → 0.197,
    knn 0.643 → 0.872)."""
    import warnings

    import tools.recall_metrics as rm
    from stupp_exclusion_etl_spark.operators import recall as rc

    rd = rm.random_vectors()

    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        base_pr, n_exact, _, base_info = rm.neardup_recall(
            spark, rd, threshold=0.5
        )
    assert n_exact > 0
    assert any(
        "embedding_neardup_pairs" in str(w.message)
        and "recall" in str(w.message)
        for w in ws
    ), "low-recall reroute must warn"
    assert base_info["recall_est"] is not None
    assert abs(base_info["recall_est"] - base_pr) <= 0.15, (
        f"neardup recall estimate off: est {base_info['recall_est']} "
        f"vs measured {base_pr}"
    )

    esc_pr, _, _, esc_info = rm.neardup_recall(
        spark, rd, threshold=0.5, recall_target=0.5
    )
    assert esc_info["escalated"] and esc_info["n_tables"] > 1
    assert abs(esc_info["recall_est"] - esc_pr) <= 0.15
    assert esc_pr > base_pr, "escalation must improve adversarial recall"
    assert esc_pr >= 0.15, f"escalated neardup pair recall floor: {esc_pr}"

    base_kr, _, kinfo = rm.knn_recall(spark, rd)
    assert abs(kinfo["recall_est"] - base_kr) <= 0.15
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        esc_kr, _, ekinfo = rm.knn_recall(spark, rd, recall_target=0.9)
    assert ekinfo["escalated"]
    assert abs(ekinfo["recall_est"] - esc_kr) <= 0.15
    assert esc_kr > base_kr
    assert esc_kr >= 0.75, f"escalated knn recall@5 floor: {esc_kr}"


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_budget_escalation_opt_in(spark):
    """VERDICT r9 task #3: within the fixed budget the adversarial
    fixture tops out near the information-theoretic LSH ceiling
    (~0.2 pair recall) — the warning says "raise the budget" but
    nothing let the caller authorize that. budget_escalation=10 is
    that knob: when the in-budget estimate misses recall_target, the
    chooser may spend up to 10× the budget, decided by the SAME sample
    estimator. Gates: measured AND estimated recall ≥ 0.5 on the
    adversarial fixture, the report names the actual work multiple,
    and the knob is inert when the in-budget ladder already clears the
    target (clustered fixture: multiplier stays 1.0)."""
    import warnings

    import tools.recall_metrics as rm

    rd = rm.random_vectors()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pr, n_exact, _, info = rm.neardup_recall(
            spark, rd, threshold=0.5, recall_target=0.5,
            budget_escalation=10.0,
        )
    assert n_exact > 0
    assert info["escalated"] and info["budget_multiplier"] > 1.0
    assert info["budget_multiplier"] <= 10.0
    assert info["recall_est"] is not None and info["recall_est"] >= 0.5
    assert pr >= 0.5, f"10x-escalated neardup pair recall: {pr}"
    assert abs(info["recall_est"] - pr) <= 0.15

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        kr, _, kinfo = rm.knn_recall(
            spark, rd, recall_target=0.9, budget_escalation=10.0
        )
    assert kinfo["budget_multiplier"] >= 1.0 <= 10.0
    assert kr >= 0.5 and kinfo["recall_est"] >= 0.5
    assert abs(kinfo["recall_est"] - kr) <= 0.15

    # inert when in-budget already clears the target
    cl = rm.clustered_vectors()
    pr_cl, _, _, cinfo = rm.neardup_recall(
        spark, cl, threshold=0.95, recall_target=0.9,
        budget_escalation=10.0,
    )
    assert cinfo["budget_multiplier"] == 1.0
    assert pr_cl >= 0.9
