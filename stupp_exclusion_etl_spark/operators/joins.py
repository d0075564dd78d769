"""Join operators beyond plain equi-joins (SURVEY.md §2 B4).

- `range_join_bucketed`: interval-containment join decomposed into an
  equi-join on coarse buckets + residual predicate, avoiding the
  broadcast-nested-loop cartesian when BOTH sides are large.
- `asof_join`: merge-based as-of join (latest right row at-or-before
  each left row) via union + carry-forward window — one shuffle on the
  key, no per-row subquery, the 100 TB-safe formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def range_join_bucketed(
    probes: DataFrame,
    probe_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join probes.x into intervals [lo, hi] containing it.

    Each interval is exploded into the coarse buckets it overlaps; each
    probe maps to exactly one bucket; the equi-join on bucket then a
    residual BETWEEN filter gives the exact result. Fan-out is
    (interval width / bucket_width) rows per interval — choose
    bucket_width near the typical interval width.
    """
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor(F.col(hi_col) / b).cast("long"),
            )
        ),
    )
    pr = probes.withColumn("__bucket", F.floor(F.col(probe_col) / b).cast("long"))
    return (
        pr.join(iv, "__bucket")
        .filter(F.col(probe_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts and the same key.

    Implementation: tag and union both sides, sort within key by
    (ts, side) with right rows first at equal ts, and carry the right
    payload forward with last(ignorenulls) — a single window over one
    shuffle. This is the merge-join formulation that scales; the naive
    per-row max-subquery plan is quadratic.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(*[F.col(c) for c in right_cols])

    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__right"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("p"))
            .schema["p"]
            .dataType.simpleString()
        ).alias("__left"),
        payload.alias("__right"),
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__matched", F.last("__right", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__matched.{c}").alias(f"right_{c}") for c in right_cols],
    )
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: a hot key on the big side would send
    its entire volume to one reducer; salting splits each key into
    `n_salts` sub-keys (big side: pseudo-random salt per row; small
    side: replicated across all salts) so the hot key spreads over
    n_salts tasks. Result is identical to big.join(small, on, how) for
    how ∈ {inner, left, left_semi, left_anti}: each big row carries
    exactly one salt, so it matches (or misses) exactly one replica of
    the small side. For right/full_outer the replication would emit
    every unmatched small row n_salts times, so those shapes are
    rejected — de-salt the small side (keep-one per key) or use AQE's
    skew-join instead.

    AQE's skew-join handles most cases at runtime (enabled in
    session.get_spark); explicit salting remains for deterministic
    plans and non-AQE engines.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            "rows across salts; only inner/left/semi/anti are supported"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), n_salts)
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")
