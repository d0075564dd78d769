"""Mergeable summary sketches (north star: 100 TB heavy-hitter mining).

Misra–Gries is the bounded-memory answer to "which tokens appear more
than N/k times": each partition keeps at most k counters regardless of
input cardinality, summaries merge by counter addition + decrement, and
the merged candidate set PROVABLY contains every item with true
frequency > N/k. A second, candidate-only exact pass then removes the
false positives — so the final answer is exact while the full-
cardinality shuffle of a naive groupBy(token) never happens: only
|candidates| ≤ k keys are shuffled, not the vocabulary.

Reference anchor: generalizes the per-group record counting the
reference logs (reference __main__.py:53-55) to cardinality-unbounded
token streams."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame, item_col: str, k: int
) -> DataFrame:
    """Per-partition Misra–Gries(k) over `item_col`, merged driver-free:
    each partition emits its ≤ k surviving (item, weight) counters via
    Arrow (mapInPandas, never row-at-a-time Python), and a weight-sum
    merge keeps every positive-weight candidate. Output: at most
    k · num_partitions candidate items (size the broadcast in callers
    accordingly), a SUPERSET of every item with true count > N/k (the
    MG guarantee; weights are lower bounds, not exact counts)."""

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # Batch-MG (Agarwal et al., mergeable summaries): fold the
            # batch's exact value_counts in (C-speed), then restore the
            # k-counter bound by subtracting the (k+1)-th largest weight
            # and dropping non-positives — the merge that preserves the
            # "underestimates by at most N/k" invariant.
            vc = pdf[item_col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                thresh = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: w - thresh for key, w in counters.items() if w > thresh
                }
        if counters:
            yield pd.DataFrame(
                {item_col: list(counters), "w": list(counters.values())}
            )

    item_type = items.schema[item_col].dataType.simpleString()
    partials = items.mapInPandas(mg, f"{item_col} {item_type}, w long")
    # Weight-sum merge: an item with true count C > N/k keeps summed
    # weight ≥ C - Σ_p N_p/k = C - N/k > 0, so EVERY true heavy hitter
    # survives. All positive-weight candidates are kept (≤ k·partitions
    # rows — broadcast-scale), no top-k cut that could break the bound.
    return (
        partials.groupBy(item_col)
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") > 0)
        .select(item_col)
    )


def heavy_hitters_exact(
    items: DataFrame, item_col: str, k: int, top: int
) -> DataFrame:
    """Exact heavy hitters above the N/k support threshold: MG candidate
    pass (bounded memory, ≤ k keys shuffled) → exact count restricted to
    candidates via broadcast semi-join → keep count > N/k (inside the MG
    guarantee, so the result equals what a full groupBy would give) →
    top-`top`. Two scans of the input, zero full-vocabulary shuffles."""
    cands = misra_gries_candidates(items, item_col, k)
    total = items.select(F.count("*").alias("n_total"))
    exact = (
        items.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(item_col, "cnt")
        .orderBy(F.col("cnt").desc(), item_col)
        .limit(top)
    )
