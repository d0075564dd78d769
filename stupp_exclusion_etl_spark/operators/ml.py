"""Distributed iterative model training on DataFrames (north-star
extension: the train-a-quality/language-classifier-on-the-corpus step
of an LLM data pipeline, e.g. a fasttext-style filter, expressed as
plain Spark aggregates).

Batch gradient descent for logistic regression: each step is ONE
hash-aggregate job over the (arbitrarily large) training frame —
gradient_j = avg((sigmoid(w·x) - y) * x_j) — with the current weights
inlined as literals, so the per-step cost is a single column-pruned
scan + map-side-combined avg, and the only driver-side state is the
weight vector itself (metadata-scale, like IVF's probe cells or
zorder's bounds). At 100 TB each epoch is exactly one pass; no
per-row Python, no parameter server.

Determinism contract (oracle-checkable): fixed zero init, fixed
iteration count and learning rate, float math entirely in built-in
expressions (exp/avg) — DuckDB reproduces the same unrolled
iterations as chained CTEs to ~1e-13, far inside the 6-dp output
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(feature_cols: list[str], weights: list[float]) -> Column:
    z = F.lit(0.0)
    for w, c in zip(weights, feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_train_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 3,
) -> list[float]:
    """Train logistic regression by full-batch gradient descent.

    `df` must carry numeric feature columns (include a literal-1.0
    column for the intercept) and a 0/1 double label. Rows where any
    feature or the label is NULL drop out of every gradient average
    (NULL propagates through the per-row term; avg ignores NULLs) —
    identical semantics to the SQL oracle's avg.

    Returns the final weights as plain floats. Each iteration is one
    aggregate job; on an empty (or all-NULL) frame the gradient is
    NULL and the weights stay at their current values."""
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        err = _sigmoid(_margin(feature_cols, w)) - F.col(label_col)
        grad_row = df.agg(
            *[F.avg(err * F.col(c)).alias(f"g{j}") for j, c in enumerate(feature_cols)]
        ).first()
        grads = [grad_row[f"g{j}"] for j in range(len(feature_cols))]
        if any(g is None for g in grads):
            break  # no trainable rows: keep current weights
        w = [wj - lr * gj for wj, gj in zip(w, grads)]
    return w


def logreg_predict(feature_cols: list[str], weights: list[float]) -> Column:
    """P(y=1 | x) under the trained weights — a plain codegen'd
    expression; apply with .withColumn on any frame carrying the same
    feature columns."""
    return _sigmoid(_margin(feature_cols, weights))
