"""Query registry: name -> (spark plan builder, DuckDB oracle SQL).

Every registered query is a callable ``(spark, sf_dir) -> DataFrame``.
``oracle`` is equivalent ANSI SQL runnable by DuckDB over the same
parquet tables (pre-registered views); ``None`` marks queries whose
semantics aren't SQL-expressible (driver falls back to rows-only).

Column-name contract: Spark output columns and oracle output columns
must carry identical names — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco
