"""Quality gates for the rows-only queries: where no SQL oracle
exists, assert the property that makes the result right — sketch error
bounds for approx-distinct, batch equivalence for the streaming job."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL


def test_approx_distinct_within_error_bound(spark):
    """HLL++ at rsd=0.02: each group's estimate must sit within ~10
    relative standard deviations of the exact count (an astronomically
    safe bound; Spark's HLL is seedless, so this is deterministic)."""
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_orders)
        for r in REGISTRY["agg_approx_distinct"].fn(spark, SF_SMALL).collect()
    }
    li = table(spark, SF_SMALL, "lineitem")
    exact = {
        r.l_returnflag: (r.parts, r.orders)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, (ep, eo) in approx.items():
        xp, xo = exact[k]
        assert abs(ep - xp) <= 0.2 * xp + 5, (k, ep, xp)
        assert abs(eo - xo) <= 0.2 * xo + 5, (k, eo, xo)


def test_approx_distinct_cross_engine_duckdb(spark):
    """Cross-engine sanity: Spark's HLL++ estimate and DuckDB's
    approx_count_distinct must agree within both sketches' combined
    error on the same parquet — the two engines independently bound
    the same truth, so a bug in either shows up as divergence."""
    from tests.harness import duck_con

    spark_est = {
        r.l_returnflag: (r.approx_parts, r.approx_orders)
        for r in REGISTRY["agg_approx_distinct"].fn(spark, SF_SMALL).collect()
    }
    con = duck_con(SF_SMALL)
    duck_est = {
        f: (p, o)
        for f, p, o in con.execute(
            "SELECT l_returnflag, approx_count_distinct(l_partkey),"
            " approx_count_distinct(l_orderkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    con.close()
    assert set(spark_est) == set(duck_est)
    for k in spark_est:
        for s, d in zip(spark_est[k], duck_est[k]):
            assert abs(s - d) <= 0.1 * max(s, d) + 5, (k, s, d)


def test_approx_percentiles_cross_engine_duckdb(spark):
    """Spark approx_percentile vs DuckDB approx_quantile on the same
    parquet: both pick near-quantile data values; at these group sizes
    they must land within a few percent of each other."""
    from tests.harness import duck_con

    spark_est = {
        r.o_orderpriority: (r.p25, r.p50, r.p75)
        for r in REGISTRY["agg_approx_percentiles"].fn(spark, SF_SMALL).collect()
    }
    con = duck_con(SF_SMALL)
    duck_est = {
        pri: (p25, p50, p75)
        for pri, p25, p50, p75 in con.execute(
            "SELECT o_orderpriority, approx_quantile(o_totalprice, 0.25),"
            " approx_quantile(o_totalprice, 0.5), approx_quantile(o_totalprice, 0.75)"
            " FROM orders GROUP BY 1"
        ).fetchall()
    }
    con.close()
    assert set(spark_est) == set(duck_est)
    for k in spark_est:
        for s, d in zip(spark_est[k], duck_est[k]):
            assert abs(s - d) <= 0.05 * abs(d) + 1, (k, s, d)


def test_stream_tumbling_equals_batch_window(spark):
    """The micro-batch streaming job and the batch window() aggregation
    share the same expression (streaming.windows.tumbling_agg) — their
    results must be identical on bounded input."""
    from stupp_exclusion_etl_spark.streaming.windows import tumbling_agg

    stream = REGISTRY["stream_tumbling_micro_batch"].fn(spark, SF_SMALL)
    batch = tumbling_agg(table(spark, SF_SMALL, "events"), minutes=10)
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    got = {key(r): (r.n, r.sum_value) for r in stream.collect()}
    want = {key(r): (r.n, r.sum_value) for r in batch.collect()}
    assert got == want


def test_approx_percentiles_near_exact(spark):
    """approx_percentile returns an actual data value near the true
    quantile; with accuracy 10000 on these group sizes the relative
    gap to the exact interpolated percentile stays small."""
    approx = {
        r.o_orderpriority: (r.p25, r.p50, r.p75)
        for r in REGISTRY["agg_approx_percentiles"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r.o_orderpriority: (r.p25, r.p50, r.p75)
        for r in REGISTRY["agg_percentiles"].fn(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for k in approx:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) <= 0.02 * abs(e) + 1, (k, a, e)


def test_learned_lang_id_learns_separable_corpus(spark):
    """The testdata documents carry RANDOM lang labels over one shared
    vocabulary (unlearnable by construction — verified), so the
    learning property is gated on a synthetic corpus whose languages
    have distinct character distributions: train profiles on 80%,
    predict the held-out 20%, expect near-perfect accuracy."""
    import random

    from stupp_exclusion_etl_spark.plans.text import (
        lang_id_learned_apply,
        learned_trigram_profiles,
    )

    vocab = {
        "aa": ["karamba", "tratata", "barbara", "calamar", "panorama"],
        "bb": ["zwischen", "schwer", "brücke", "fünfzig", "größe"],
        "cc": ["oiseaux", "beaucoup", "heureux", "plusieurs", "jeunesse"],
    }
    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choices(vocab[lang], k=12)), lang)
        for i, lang in enumerate(
            [lang for lang in vocab for _ in range(40)]
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    profiles = learned_trigram_profiles(train, top_n=15)
    pred = lang_id_learned_apply(test, profiles)
    acc = pred.filter(F.col("predicted_lang") == F.col("lang")).count() / test.count()
    assert acc >= 0.95, acc


def test_hll_shard_union_accuracy_and_merge_consistency(spark):
    """agg_hll_shard_union quality gate: (a) the union-of-shard-sketch
    estimate must sit within HLL error of the exact distinct count;
    (b) merging shard sketches must agree with sketching the raw column
    directly — the mergeability property the operator exists for."""
    from stupp_exclusion_etl_spark.catalog import table
    from pyspark.sql import functions as F

    merged = {
        r.l_returnflag: r.est_orders
        for r in REGISTRY["agg_hll_shard_union"].fn(spark, SF_SMALL).collect()
    }
    li = table(spark, SF_SMALL, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("exact"))
        .collect()
    }
    direct = {
        r.l_returnflag: r.est
        for r in li.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est"))
        .collect()
    }
    assert set(merged) == set(exact)
    for k in merged:
        assert abs(merged[k] - exact[k]) <= 0.05 * exact[k] + 5, (
            k, merged[k], exact[k],
        )
        assert abs(merged[k] - direct[k]) <= 0.02 * direct[k] + 2, (
            k, merged[k], direct[k],
        )
