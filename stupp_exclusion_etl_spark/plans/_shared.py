"""Shared helpers for query plans.

Float policy: every double-typed aggregate/computed output column is
rounded to a fixed decimal count on BOTH the Spark side and the DuckDB
oracle side. Sums of money-like 2-4dp inputs are decimal-exact at 4dp,
so ROUND(x, 4) lands on a grid point far from any rounding boundary and
the two engines agree bit-for-bit after rounding regardless of
accumulation order. (SURVEY.md §5 oracle-differential strategy.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The A17 fan-out analog: the reference iterates 83 HTS codes serially
# (reference config.py:58-142); we express the same scan as ONE
# partition-pruned `isin` filter (FIXTURES.md stand-in: part.p_size).
CODES = [3, 7, 11, 15, 19, 23, 27, 31, 35, 39, 43, 47]


def r4(c: Column) -> Column:
    return F.round(c, 4)


def revenue() -> Column:
    """TPC-H style revenue measure: extendedprice * (1 - discount)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def spread(df, n: int | None = None):
    """Round-robin repartition a SMALL, CPU-heavy input before an
    expensive per-row transform (char-trigram explode, shingling).

    Why: a compressed text corpus packs millions of tokens into a few
    parquet row groups, and Spark's scan parallelism is bounded by row
    groups — locally one ~1.5 MB file = ONE task doing all the explode
    CPU. The exchange this inserts moves only the raw corpus bytes
    (trivial next to the explode's output), and aggregate results are
    partition-layout-independent so semantics are unchanged. At 100 TB
    the input already has thousands of splits — and there this IS a
    no-op: when the plan already yields >= target partitions the
    exchange would cost more than the parallelism it buys (measured:
    wrapping an already-32-split corpus scan regressed dedup_minhash_lsh
    1.88x at sf0.1), so we return the input untouched. The repartition
    only fires for genuinely under-partitioned compressed inputs —
    the standard "parallelize the decode" idiom, not a scale crutch.

    The partition-count probe (`df.rdd.getNumPartitions()`) runs
    physical planning but NO job — metadata-only, once per query build.
    """
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
