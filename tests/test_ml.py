"""Distributed GD logistic regression (operators/ml.py): learning
actually happens, NULL rows drop out of the gradient consistently,
and degenerate frames don't corrupt the weights."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.ml import (
    logreg_predict,
    logreg_train_gd,
)


def _sep_frame(spark, n=400):
    """Linearly separable by x1: y = 1 iff x1 > 0."""
    return spark.range(n).select(
        F.lit(1.0).alias("x0"),
        ((F.col("id") % 21).cast("double") / 10.0 - 1.0).alias("x1"),
        F.when((F.col("id") % 21) > 10, 1.0).otherwise(0.0).alias("y"),
    )


def _logloss(spark, df, feats, w):
    p = logreg_predict(feats, w)
    eps = 1e-12
    return df.select(
        F.avg(
            -(F.col("y") * F.log(p + eps)
              + (1 - F.col("y")) * F.log(1 - p + eps))
        ).alias("ll")
    ).first()["ll"]


def test_gd_descends_and_separates(spark):
    df = _sep_frame(spark)
    feats = ["x0", "x1"]
    w1 = logreg_train_gd(df, feats, "y", lr=2.0, iters=1)
    w10 = logreg_train_gd(df, feats, "y", lr=2.0, iters=10)
    ll0 = _logloss(spark, df, feats, [0.0, 0.0])  # = ln 2
    ll1 = _logloss(spark, df, feats, w1)
    ll10 = _logloss(spark, df, feats, w10)
    assert math.isclose(ll0, math.log(2.0), rel_tol=1e-9)
    assert ll1 < ll0 and ll10 < ll1  # each extra epoch descends
    assert w10[1] > 0  # learned the sign of the separating feature
    # the trained model actually separates: mean p on positives > negatives
    scored = df.withColumn("p", logreg_predict(feats, w10))
    means = {
        r.y: r.mp
        for r in scored.groupBy("y").agg(F.avg("p").alias("mp")).collect()
    }
    assert means[1.0] > 0.7 > 0.3 > means[0.0]


def test_null_features_drop_out_of_gradient(spark):
    feats = ["x0", "x1"]
    clean = _sep_frame(spark, 200)
    # the same frame plus NULL-feature rows with extreme labels: if
    # NULLs leaked into the gradient averages, weights would differ
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(1.0, None, 1.0)] * 10 + [(None, 5.0, 0.0)] * 10,
            "x0 double, x1 double, y double",
        )
    )
    w_clean = logreg_train_gd(clean, feats, "y", lr=2.0, iters=3)
    w_noisy = logreg_train_gd(noisy, feats, "y", lr=2.0, iters=3)
    assert w_clean == pytest.approx(w_noisy, rel=1e-12)


def test_empty_and_allnull_frames_keep_zero_weights(spark):
    feats = ["x0", "x1"]
    empty = spark.createDataFrame([], "x0 double, x1 double, y double")
    assert logreg_train_gd(empty, feats, "y") == [0.0, 0.0]
    allnull = spark.createDataFrame(
        [(None, 1.0, 1.0)] * 5, "x0 double, x1 double, y double"
    )
    assert logreg_train_gd(allnull, feats, "y") == [0.0, 0.0]
