"""Pipeline observability (SURVEY.md §2 A20).

The reference instruments its loop with tqdm/log counters per record
(reference __main__.py:47,53-55,80-82,106-109). The Spark-native
equivalent is `df.observe`: named aggregate metrics collected ON THE
EXECUTORS during the action that computes the DataFrame — zero extra
jobs, zero extra scans, visible to listeners and the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, name: str = "pipeline", value_col: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row-count (and optional sum/null-count) metrics to a
    DataFrame. Returns (df, observation); read `observation.get` after
    the first action on the returned DataFrame.

    This is the A20 progress-counter analog: one metrics row per
    action, aggregated map-side — unlike a separate .count() it does
    not re-execute the plan.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(F.sum(F.col(value_col)).alias(f"sum_{value_col}"))
        metrics.append(
            F.count(F.when(F.col(value_col).isNull(), 1)).alias(
                f"nulls_{value_col}"
            )
        )
    return df.observe(obs, *metrics), obs
