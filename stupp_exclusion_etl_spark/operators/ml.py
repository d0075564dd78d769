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
    # same materialize-once as kmeans_train below: one pass builds the
    # numeric feature frame, every gradient step reads the blocks
    df = df.localCheckpoint(eager=True)
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


# ---------------------------------------------------------------------------
# k-means (Lloyd's algorithm) — the semantic-clustering step of a data
# pipeline (topic bucketing, semantic dedup groups, IVF coarse
# quantizer training), with the same execution shape as logreg above:
# per iteration ONE hash-aggregate job over the full frame, driver
# state = the k centroids (metadata-scale).
# ---------------------------------------------------------------------------


def kmeans_assign(feature_cols: list[str], centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared euclidean), ties broken
    toward the LOWEST index — a chain of strict-less comparisons, so
    the winner is the first index attaining the minimum. All plain
    codegen'd arithmetic on literals; rows with a NULL feature must be
    filtered out by the caller (NULL comparisons would otherwise take
    engine-specific CASE fallthrough paths)."""
    dists: list[Column] = []
    for c in centroids:
        d = F.lit(0.0)
        for w, col in zip(c, feature_cols):
            diff = F.col(col) - F.lit(float(w))
            d = d + diff * diff
        dists.append(d)
    best = F.lit(0)
    best_d = dists[0]
    for i in range(1, len(dists)):
        closer = dists[i] < best_d
        best = F.when(closer, F.lit(i)).otherwise(best)
        best_d = F.when(closer, dists[i]).otherwise(best_d)
    return best


def kmeans_train(
    df: DataFrame,
    feature_cols: list[str],
    init: list[list[float]],
    iters: int = 3,
) -> list[list[float]]:
    """Lloyd's k-means by full-batch iteration: assign each row to its
    nearest centroid (codegen'd argmin over k literal centroids), then
    recompute each centroid as the per-cluster mean — ONE groupBy job
    per iteration, collecting exactly k rows. Empty clusters keep
    their previous centroid.

    Determinism contract: centroids are ROUNDED to 6 dp after every
    update (in the aggregate expression, so Spark and the SQL oracle
    round the same HALF_UP way on the same IEEE doubles) — float
    summation-order noise (~1e-13) cannot leak into the discrete
    assignment argmin except in the measure-zero case of a mean
    landing within float error of a rounding boundary. At 100 TB each
    iteration is one column-pruned scan with map-side partial
    aggregation; nothing driver-side ever exceeds k×d floats."""
    cents = [list(map(float, c)) for c in init]
    # One materialization of the (tiny-width) feature projection —
    # Lloyd's re-reads it every iteration, and each groupBy action
    # would otherwise re-run the source scan + projection per round.
    # The standard k-means trade: a few numeric columns per row,
    # MEMORY_AND_DISK, spill-safe (guide §5 caching: reused AND
    # recomputation costs a full input pass per reuse).
    df = df.localCheckpoint(eager=True)
    for _ in range(iters):
        cl = kmeans_assign(feature_cols, cents)
        rows = (
            df.groupBy(cl.alias("cl"))
            .agg(
                *[
                    F.round(F.avg(c), 6).alias(f"m{j}")
                    for j, c in enumerate(feature_cols)
                ]
            )
            .collect()
        )
        by_cl = {r["cl"]: r for r in rows}
        cents = [
            (
                [by_cl[i][f"m{j}"] for j in range(len(feature_cols))]
                if i in by_cl
                else cents[i]
            )
            for i in range(len(cents))
        ]
    return cents


# ---------------------------------------------------------------------------
# BPE merge learning — the tokenizer-training step of an LLM data
# pipeline. The scale trick is the classic one: merges are learned on
# the word VOCABULARY (one corpus pass builds word counts; every
# iteration after that touches only the vocab frame, whose size is
# bounded by distinct words, independent of corpus size).
# ---------------------------------------------------------------------------


def _adjacent_pairs(syms: Column) -> Column:
    """'h e l l o' → ['h e', 'e l', 'l l', 'l o'] (overlapping
    adjacent symbol pairs). Guarded for single-symbol strings —
    F.sequence(1, 0) would count DOWN, so short arrays must short-
    circuit to an empty list."""
    arr = F.split(syms, " ")
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_learn_merges(
    vocab: DataFrame, n_merges: int = 6
) -> list[tuple[int, str, int, int]]:
    """Learn byte-pair-encoding merges from a word-count vocabulary.

    ``vocab`` carries ``s`` (the word as a single-space-separated
    symbol string, e.g. ``'h e l l o'``) and ``cnt`` (corpus
    occurrences). Each merge step is two vocabulary-sized aggregate
    jobs: (1) explode overlapping adjacent pairs, weight by cnt,
    hash-aggregate, take the single best pair (count DESC, pair ASC —
    integer counts, so fully deterministic); (2) apply the merge as a
    DOUBLE leftmost-non-overlapping string replace of ``' a b '``
    within the padded symbol string, and recount total corpus symbols.
    Two passes are exact: a non-rescanning replace can only skip an
    occurrence whose leading space was consumed by the immediately
    preceding match, so pass-1 leftovers are never adjacent and pass 2
    (a fresh scan) catches every one. Spark, DuckDB and Python
    replace() share the non-rescanning semantics — pinned by
    tests/test_ml.py. Driver state per step is one (pair, count) row.

    Returns [(step, 'a b', pair_count, corpus_syms_after)] — the
    whole training trajectory, integer-exact."""
    out: list[tuple[int, str, int, int]] = []
    # Materialize the vocabulary ONCE: it is the product of the single
    # corpus pass (tokenize → word counts), and every merge step runs
    # two actions whose lineage would otherwise replay that corpus
    # pass from scratch — 2×n_merges full corpus scans for work that
    # is vocab-bounded by design (guide §1.2: the documented "one
    # corpus pass" contract, now actually one pass). The checkpoint is
    # distinct-word-sized; each step's replace chain re-applies over
    # the materialized blocks only.
    cur = vocab.localCheckpoint(eager=True)
    for step in range(1, n_merges + 1):
        best = (
            cur.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("s"))).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("pr"))
            .first()
        )
        if best is None or best["total"] is None:
            break  # no pairs left anywhere: vocabulary fully merged
        pair, total = best["pr"], int(best["total"])
        merged = pair.replace(" ", "")
        applied = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        for _ in range(2):  # double pass: see docstring
            applied = F.replace(applied, F.lit(f" {pair} "), F.lit(f" {merged} "))
        cur = cur.select(F.trim(applied).alias("s"), F.col("cnt"))
        syms_after = int(
            cur.select(
                F.sum(F.col("cnt") * F.size(F.split(F.col("s"), " "))).alias("n")
            ).first()["n"]
        )
        out.append((step, pair, total, syms_after))
    return out
