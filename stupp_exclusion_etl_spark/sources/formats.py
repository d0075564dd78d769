"""Source/sink format adapters (SURVEY.md §2 A1/A6 generalized, B1).

The engine's canonical storage is parquet (columnar, statistics,
pushdown); these adapters cover the interchange formats an ingest
boundary actually sees — CSV, JSON-lines, ORC — with explicit schemas
(schema inference is a convenience for exploration, a bug in
production: it costs an extra scan and can silently drift between
batches).

Scale notes: CSV/JSON are row-oriented and splittable-but-unindexed —
land them once, convert to parquet, and run queries there. ORC gets
the same pushdown treatment as parquet from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write a DataFrame in the given interchange format. Timestamps
    are ISO-8601 in text formats so round-trips are lossless with
    read_table's schema."""
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option(
            "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Read a table with an EXPLICIT schema (never inferred — one scan,
    no drift). Text formats parse timestamps via the matching ISO
    pattern."""
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option(
            "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    return r.load(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-media ingestion via the built-in ``binaryFile`` source:
    (path, modificationTime, length, content binary) per file — the
    entry point that turns a directory of image/audio files into the
    payload + metadata layout (feed ``content`` to
    operators.multimodal.parse_image_meta / image_meta_scan, then land
    as parquet with the media struct).

    Scale notes: ``spark.sql.files.maxPartitionBytes`` packs many small
    files into one task (the small-files problem is handled by the
    source, not a driver listing loop); ``pathGlobFilter`` prunes at
    listing time so non-matching files are never opened; filters on
    ``length``/``modificationTime`` push down to the listing as well."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
