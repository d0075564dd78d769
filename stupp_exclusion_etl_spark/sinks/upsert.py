"""Keyed upsert sink (SURVEY.md §2 A14-A16).

The reference's sink is DynamoDB batch_write_item: last-write-wins by
key, 20-item batches, auto-created tables with keys-only GSIs
(reference __main__.py:8-24, clients/dynamodb.py:9-42). On a data-lake
engine that maps to:

- upsert = anti-join existing ∪ new, or keep-latest window over the
  union (plain parquet has no MERGE; on Delta/Iceberg this is
  MERGE INTO — same logical spec, table format supplies atomicity);
- GSIs = partitionBy on write → partition pruning serves the
  equality/range query surface the indexes existed for (§1.3);
- 20-item batching = per-partition chunked writes for rate-limited
  targets.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.operators.dedup import keep_latest


def upsert_parquet(
    new_data: DataFrame,
    path: str,
    keys: list[str],
    order_by: list[Column],
    partition_by: list[str] | None = None,
) -> None:
    """Last-write-wins upsert into a parquet table: union existing data
    with new, keep the newest row per key, rewrite. At 100 TB use
    Delta `MERGE INTO` / dynamic partition overwrite so only touched
    partitions rewrite; the keep-latest spec is identical."""
    spark = new_data.sparkSession
    try:
        existing = spark.read.parquet(path)
        merged = existing.unionByName(new_data, allowMissingColumns=True)
    except Exception:  # first write: no table yet (A16 auto-create)
        merged = new_data
    result = keep_latest(merged, keys, order_by)
    writer = result.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def partitioned_index_write(df: DataFrame, path: str, index_cols: list[str]) -> None:
    """GSI stand-in (A16): write partitioned by the indexed columns so
    equality/range predicates on them become partition pruning."""
    df.write.mode("overwrite").partitionBy(*index_cols).parquet(path)


def micro_batches(df: DataFrame, batch_size: int = 20) -> DataFrame:
    """The reference's bounded-buffer batching (A14): chunk each
    partition into ≤ batch_size groups sink-side. Returns per-batch
    sizes (partition_id, batch_index, n) for observability — the actual
    write callback would consume the same iterator."""

    def chunk(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            for start in range(0, n, batch_size):
                yield pd.DataFrame(
                    {"batch_rows": [min(batch_size, n - start)]}
                )

    return df.mapInPandas(chunk, "batch_rows long")


def foreach_batched_writer(
    df: DataFrame, write_fn: Callable[[list[dict]], None], batch_size: int = 20
) -> None:
    """Push rows to a record-oriented external sink in ≤ batch_size
    chunks per call (the batch_write_item pattern). `write_fn` runs on
    executors — it must be serializable and idempotent (task retries)."""

    def handle(partition: Iterator) -> None:
        buf: list[dict] = []
        for row in partition:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                write_fn(buf)
                buf = []
        if buf:
            write_fn(buf)

    df.foreachPartition(handle)
