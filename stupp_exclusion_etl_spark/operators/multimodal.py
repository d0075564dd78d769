"""Multimodal column operators (north-star: BASELINE.json multimodal
family; reference anchor: opaque scraped values, SURVEY.md §1.1).

Media (image/audio/video) travel as opaque ``binary`` payload columns
plus a typed metadata struct — the 100 TB pattern where blobs live
inline in parquet (or as object-store pointers) and all planning
happens on the cheap metadata columns.

The actual codec step (JPEG decode, PCM resample, H.264 frame-grab) is
STUBBED: the container has no image/audio libraries, so ``decode_media``
raises ``NotImplementedError`` with the production recipe, and tests
exercise ``byte_histogram`` — a real Arrow-batched ``mapInPandas``
feature extractor with the exact signature/batching a decoder would
use. Everything Spark-side (schema, partition spread, Arrow batch
shape, metadata pruning) is real and tested.

Scale notes:
- metadata filters (``media_type = 'video'``) prune before any byte of
  payload is touched — parquet column pruning means the payload column
  is never read for metadata-only plans;
- feature extraction repartitions by id first so CPU-bound Python work
  spreads across all cores instead of following parquet file locality;
- frame sampling is pure Catalyst (``sequence`` + ``explode``) — no
  Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

#: Metadata struct carried next to every payload column.
MEDIA_META_FIELDS = (
    ("media_type", "string"),
    ("n_bytes", "long"),
    ("width", "int"),  # image/video
    ("height", "int"),  # image/video
    ("n_frames", "int"),  # video
    ("sample_rate", "int"),  # audio
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic fake media payload + typed metadata from a
    text column (the container has no real media; the bytes are the
    UTF-8 encoding of the text, which keeps every downstream byte-level
    check oracle-reproducible).

    Output columns: ``payload binary``, ``media struct<...>`` per
    MEDIA_META_FIELDS. media_type cycles image/audio/video by id;
    dimensions/frames/rate are deterministic functions of the byte
    length so plans over them are value-checkable.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.length(payload).cast("long")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    is_img = mt == "image"
    is_aud = mt == "audio"
    is_vid = mt == "video"
    meta = F.struct(
        mt.alias("media_type"),
        n_bytes.alias("n_bytes"),
        F.when(is_img | is_vid, (16 + n_bytes % 32).cast("int")).alias("width"),
        F.when(is_img | is_vid, (16 + n_bytes % 16).cast("int")).alias("height"),
        F.when(is_vid, (1 + F.floor(n_bytes / 32)).cast("int")).alias("n_frames"),
        F.when(is_aud, F.lit(16000).cast("int")).alias("sample_rate"),
    )
    return df.withColumn("payload", payload).withColumn("media", meta)


def sample_frames(df: DataFrame, id_col: str, every_k: int = 4) -> DataFrame:
    """Frame sampling for video rows: every ``every_k``-th frame index
    from the metadata — pure Catalyst (`sequence` + `explode`), no
    decode, no Python. The payload column is untouched, so parquet
    never reads it for this plan.
    Returns (id, frame_no) rows.
    """
    vids = df.filter(F.col("media.media_type") == "video")
    idx = F.sequence(
        F.lit(0), F.col("media.n_frames") - 1, F.lit(every_k)
    )
    return vids.select(
        F.col(id_col), F.explode(idx).alias("frame_no")
    )


_HIST_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("bin", IntegerType()),
        StructField("cnt", LongType()),
    ]
)


def byte_histogram(
    df: DataFrame, id_col: str, payload_col: str = "payload", n_bins: int = 8
) -> DataFrame:
    """Per-payload byte histogram (bin = byte // (256 // n_bins)) as
    (id, bin, cnt) rows — the stand-in feature extractor proving the
    Arrow-batched ``mapInPandas`` plumbing a real decoder would use.

    numpy does the per-byte work vectorized inside each Arrow batch;
    the input is repartitioned by id so the CPU-bound stage spreads
    across cores rather than inheriting parquet file locality (one
    small file = one partition = one busy core). The partition count is
    left to AQE coalescing: tiny inputs collapse to a few Python tasks
    (per-task Arrow/worker overhead dominates them), huge inputs fan
    out to the shuffle-partition ceiling.
    """
    import numpy as np
    import pandas as pd

    width = 256 // n_bins

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, bins, cnts = [], [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8) // width
                hist = np.bincount(arr, minlength=n_bins)
                for b in np.nonzero(hist)[0]:
                    ids.append(i)
                    bins.append(int(b))
                    cnts.append(int(hist[b]))
            yield pd.DataFrame({"id": ids, "bin": bins, "cnt": cnts})

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(extract, _HIST_SCHEMA)


def decode_media(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Decode payloads into typed media tensors. STUB — the container
    ships no codec libraries. Production implementation (same plumbing
    as ``byte_histogram``):

    - image: ``mapInPandas`` batch → ``PIL.Image.open(io.BytesIO(b))``
      → resize → ``np.asarray`` → flatten to ``array<float>``;
    - audio: ``soundfile.read`` → resample to media.sample_rate →
      fixed-length window → ``array<float>``;
    - video: ``av.open`` → keyframe iterator → sample via
      ``sample_frames`` indices → per-frame image path.

    Output schema would be ``(id long, features array<float>)``; Arrow
    batch size governed by spark.sql.execution.arrow.maxRecordsPerBatch
    (tune down for large payloads so a batch fits executor memory).
    """
    raise NotImplementedError(
        "media codecs are not installed in this container; see docstring "
        "for the production mapInPandas recipe. Use byte_histogram() for "
        "the tested Arrow plumbing."
    )


def resize_images(
    df: DataFrame, id_col: str, width: int, height: int
) -> DataFrame:
    """Image resize. STUB — see ``decode_media``; production is a
    mapInPandas stage emitting a re-encoded binary column with updated
    media metadata (width/height replaced, n_bytes recomputed)."""
    raise NotImplementedError("see decode_media: codec libraries unavailable")


def attach_media_pointers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The 100 TB variant of attach_media: payloads stay in an object
    store and rows carry a typed POINTER struct (uri, offset, length)
    plus the same metadata — parquet holds only cheap columns, planning
    and pruning never touch a byte of media, and fetch happens inside
    the Arrow-batched stage that needs pixels (fetch_payloads).

    Deterministic fake: uri/offset/length are derived from the row so
    every downstream check is reproducible; offset models packing many
    blobs per store object (4 MiB stripes)."""
    n_bytes = F.length(F.encode(F.col(text_col), "UTF-8")).cast("long")
    stripe = F.lit(4 * 1024 * 1024).cast("long")
    ref = F.struct(
        F.concat(
            F.lit("s3://media-bucket/stripe-"),
            (F.col(id_col) / 512).cast("long").cast("string"),
            F.lit(".bin"),
        ).alias("uri"),
        (F.col(id_col) % 512 * stripe / 512).cast("long").alias("offset"),
        n_bytes.alias("length"),
    )
    out = attach_media(df, id_col, text_col).drop("payload")
    return out.withColumn("media_ref", ref)


def fetch_payloads(
    df: DataFrame, id_col: str, ref_col: str = "media_ref"
) -> DataFrame:
    """Resolve pointer structs to payload bytes. STUB — production is a
    mapInPandas stage doing ranged GETs (uri, offset, length) with a
    per-partition client and retry/backoff; batch size tuned so
    in-flight bytes fit executor memory. See byte_histogram for the
    tested Arrow plumbing the fetched bytes feed into."""
    raise NotImplementedError(
        "no object store in this container; production recipe in docstring"
    )
