"""ANN recall checks: the approximate paths (LSH bucket probe, IVF
cell probe) are rows-only for the driver, so their quality gate lives
here — recall@10 against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    lsh_assign_buckets,
)
from stupp_exclusion_etl_spark.plans.registry import REGISTRY

from tests.conftest import SF_SMALL

K = 10


def _exact_ids(spark) -> set[int]:
    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    top = brute_force_topk(e.filter(F.col("vec_id") != 0), q, k=K)
    return {r.vec_id for r in top.collect()}


def test_lsh_recall_vs_brute_force(spark):
    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    approx = ann_topk_lsh(e.filter(F.col("vec_id") != 0), q, dim=64, k=K, n_planes=4)
    got = {r.vec_id for r in approx.collect()}
    recall = len(got & _exact_ids(spark)) / K
    assert recall >= 0.5, f"LSH recall@{K} too low: {recall}"


def test_ivf_recall_vs_brute_force(spark):
    got = {r.vec_id for r in REGISTRY["sim_ivf_topk"].fn(spark, SF_SMALL).collect()}
    recall = len(got & _exact_ids(spark)) / K
    assert recall >= 0.5, f"IVF recall@{K} too low: {recall}"


def test_lsh_buckets_deterministic_and_bounded(spark):
    e = table(spark, SF_SMALL, "embeddings").limit(50)
    b1 = lsh_assign_buckets(e, "embedding", dim=64, n_planes=4)
    rows = {r.vec_id: r.lsh_bucket for r in b1.collect()}
    rows2 = {r.vec_id: r.lsh_bucket for r in b1.collect()}
    assert rows == rows2
    assert all(0 <= b < 16 for b in rows.values())


def test_ivf_kmeans_recall(spark):
    """IVF over LEARNED k-means cells must beat the label-standin floor
    — real cells concentrate neighbors, so probing 4 of 10 cells keeps
    most of the true top-10."""
    from stupp_exclusion_etl_spark.operators.similarity import (
        ivf_kmeans_cells,
        ivf_topk,
    )

    e = table(spark, SF_SMALL, "embeddings")
    assigned, cents = ivf_kmeans_cells(e.filter(F.col("vec_id") != 0), k=10)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = {r.vec_id for r in ivf_topk(assigned, cents, q, k=K, n_probe=4).collect()}
    recall = len(got & _exact_ids(spark)) / K
    assert recall >= 0.6, f"k-means IVF recall@{K}: {recall}"
