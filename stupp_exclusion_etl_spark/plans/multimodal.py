"""Multimodal-column plans (north-star multimodal family).

The payload/metadata derivation (operators.multimodal.attach_media) is
deterministic from ``documents.text``, so even the byte-level plans are
fully oracle-checkable: DuckDB re-derives the same payload via
``encode(text)`` (the corpus is pure ASCII — verified — so char ops
equal byte ops on the oracle side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.operators.multimodal import (
    attach_media,
    byte_histogram,
    sample_frames,
)
from stupp_exclusion_etl_spark.plans.registry import register

# Oracle-side re-derivation of attach_media's metadata.
_MT = "['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]"
_NB = "octet_length(encode(text))"


@register(
    "mm_payload_stats",
    oracle=f"""
    SELECT {_MT} AS media_type,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({_NB}) AS BIGINT) AS total_bytes,
           CAST(max({_NB}) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
    tags=("B1", "B5"),
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over media columns: per-type doc count and
    byte volume. The plan touches only the metadata struct — parquet
    column pruning never reads payload bytes (check ReadSchema)."""
    d = attach_media(table(spark, sf_dir, "documents"), "doc_id", "text")
    return d.groupBy(F.col("media.media_type").alias("media_type")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("media.n_bytes").alias("total_bytes"),
        F.max("media.n_bytes").alias("max_bytes"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id, CAST(u.f AS BIGINT) AS frame_no
    FROM (SELECT doc_id, 1 + {_NB} // 32 AS n_frames
          FROM documents WHERE {_MT} = 'video'),
         UNNEST(range(0, CAST(n_frames AS BIGINT), 4)) AS u(f)
    """,
    tags=("B11", "B14"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over video rows — pure Catalyst
    sequence+explode from metadata; zero decode, zero Python
    (operators.multimodal.sample_frames)."""
    d = attach_media(table(spark, sf_dir, "documents"), "doc_id", "text")
    out = sample_frames(d, "doc_id", every_k=4)
    return out.select("doc_id", F.col("frame_no").cast("long"))


@register(
    "mm_byte_histogram",
    oracle=f"""
    SELECT doc_id,
           CAST(ord(u.c) // 32 AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT doc_id, text FROM documents
          -- len(text) > 0: DuckDB split('', '') yields [''] whose
          -- ord('') = 0 would count a phantom byte for empty payloads
          -- (the engine correctly emits nothing; adversarial sweep)
          WHERE doc_id < 100 AND len(text) > 0),
         UNNEST(split(text, '')) AS u(c)
    GROUP BY 1, 2
    """,
    tags=("B15", "B12"),
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary
    payloads (operators.multimodal.byte_histogram): 8-bin byte
    histogram per document as (doc_id, bin, cnt). This is the tested
    plumbing a real media decoder drops into — numpy vectorized per
    Arrow batch, repartitioned by id for core spread. Oracle side
    re-derives per-char (ASCII corpus ⇒ char == byte)."""
    d = attach_media(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100),
        "doc_id",
        "text",
    )
    out = byte_histogram(d, "doc_id", "payload", n_bins=8)
    return out.select(F.col("id").alias("doc_id"), "bin", "cnt")


@register(
    "mm_pointer_stripe_stats",
    oracle=f"""
    SELECT 's3://media-bucket/stripe-' || CAST(doc_id // 512 AS VARCHAR) || '.bin' AS uri,
           CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(sum({_NB}) AS BIGINT) AS stripe_bytes
    FROM documents
    GROUP BY 1
    """,
    tags=("B1", "B5"),
)
def mm_pointer_stripe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store pointer path (operators.multimodal.
    attach_media_pointers): per-stripe blob count and byte volume from
    pointer metadata alone — the plan never materializes payload bytes
    (there are none; rows carry (uri, offset, length) structs)."""
    from stupp_exclusion_etl_spark.operators.multimodal import attach_media_pointers

    d = attach_media_pointers(table(spark, sf_dir, "documents"), "doc_id", "text")
    return d.groupBy(F.col("media_ref.uri").alias("uri")).agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("media_ref.length").alias("stripe_bytes"),
    )


@register(
    "mm_image_meta_decode",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           CAST(16 + doc_id % 240 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 240 AS INT) AS height
    FROM documents
    """,
    tags=("B15", "B11"),
)
def mm_image_meta_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real header decode round-trip, pure Catalyst end to end: build a
    valid-geometry PNG payload per document (operators.multimodal.
    png_payload — signature + IHDR with doc_id-derived dimensions),
    then parse width/height back out of the BYTES with
    parse_image_meta (substring + hex arithmetic, no UDF). The oracle
    states the expected geometry arithmetically; genuine parsing of
    real externally-crafted PNG/GIF/BMP/JPEG files is pinned in
    tests/test_multimodal.py."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        parse_image_meta,
        png_payload,
    )

    d = table(spark, sf_dir, "documents")
    w = (F.lit(16) + F.col("doc_id") % 240).cast("int")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 240).cast("int")
    payload = png_payload(w, h)
    meta = parse_image_meta(payload)
    return d.select(
        "doc_id",
        meta["fmt"].alias("fmt"),
        meta["width"].alias("width"),
        meta["height"].alias("height"),
    )


@register(
    "mm_frame_byte_ranges",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id,
             's3://media-bucket/stripe-' || CAST(doc_id // 512 AS VARCHAR) || '.bin' AS uri,
             (doc_id % 512) * (4194304 // 512) AS base_off,
             {_NB} AS n_bytes,
             1 + {_NB} // 32 AS n_frames
      FROM documents WHERE {_MT} = 'video')
    SELECT doc_id, CAST(u.f AS BIGINT) AS frame_no, uri,
           CAST(base_off + u.f * 32 AS BIGINT) AS byte_start,
           CAST(least(32, n_bytes - u.f * 32) AS BIGINT) AS byte_len
    FROM vids, UNNEST(range(0, CAST(n_frames AS BIGINT), 4)) AS u(f)
    WHERE least(32, n_bytes - u.f * 32) > 0
    """,
    tags=("B1", "B11"),
)
def mm_frame_byte_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranged-GET serving plan for frame sampling on POINTER media:
    every-4th frame of each video resolves to (uri, byte_start,
    byte_len) — computed entirely from pointer + metadata columns
    (32-byte frames at media_ref.offset), so the fetch stage receives
    exact byte ranges and object-store I/O is frames-read × 32 bytes,
    never whole blobs. Pure Catalyst; zero payload bytes touched at
    plan time."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        attach_media_pointers,
        sample_frames,
    )

    d = attach_media_pointers(table(spark, sf_dir, "documents"), "doc_id", "text")
    frames = sample_frames(d, "doc_id", every_k=4).join(
        d.select(
            "doc_id",
            F.col("media_ref.uri").alias("uri"),
            F.col("media_ref.offset").alias("base_off"),
            F.col("media_ref.length").alias("n_bytes"),
        ),
        "doc_id",
    )
    return (
        frames.select(
            "doc_id",
            F.col("frame_no").cast("long"),
            "uri",
            (F.col("base_off") + F.col("frame_no") * 32).cast("long").alias("byte_start"),
            F.least(F.lit(32), F.col("n_bytes") - F.col("frame_no") * 32)
            .cast("long")
            .alias("byte_len"),
        )
        .filter(F.col("byte_len") > 0)
    )


# Shared geometry for the synthetic BMP corpus: W varies 7..9 so the
# 4-byte stride padding is exercised (21→24, 24→24, 27→28).
_BMP_GEOM_SQL = """
  SELECT doc_id, 7 + doc_id % 3 AS w, 6 AS h, doc_id % 251 AS seed,
         ((7 + doc_id % 3) * 3 + 3) // 4 * 4 AS stride
  FROM documents WHERE doc_id < 200
"""


def _bmp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stupp_exclusion_etl_spark.operators.multimodal import bmp_payload

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        bmp_payload(
            (F.lit(7) + F.col("doc_id") % 3).cast("int"),
            F.lit(6),
            F.col("doc_id") % 251,
        ).alias("payload"),
    )


@register(
    "mm_bmp_decode_channel_stats",
    oracle=f"""
    WITH g AS ({_BMP_GEOM_SQL}),
    v AS (
      SELECT g.doc_id, CAST(c.c AS INT) AS ch,
             CAST((g.seed + (g.h - 1 - y.y) * g.stride + x.x * 3 + c.c) % 256
                  AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.h)) AS y(y), UNNEST(range(0, g.w)) AS x(x),
           UNNEST(range(0, 3)) AS c(c))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_bmp_decode_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image pixel decode, no codec library: synthesize a
    spec-valid 24-bit BMP per document in pure Catalyst
    (operators.multimodal.bmp_payload — variable width exercises stride
    padding), FULLY decode it (header walk, bottom-up rows, padding
    strip) in the Arrow mapInPandas decoder (decode_media), then reduce
    pixels to per-channel means JVM-side. The oracle recomputes every
    pixel from the generator's closed form — any header, stride, or
    row-order mistake in generator OR decoder breaks the hash match."""
    from stupp_exclusion_etl_spark.operators.multimodal import decode_media

    dec = decode_media(_bmp_docs(spark, sf_dir), "doc_id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(F.round(F.avg("col"), 4).alias("mean_val"))
    )


@register(
    "mm_image_resize_pixels",
    oracle=f"""
    WITH g AS ({_BMP_GEOM_SQL})
    SELECT doc_id,
           CAST(y2.y * 12 + x2.x * 3 + c.c AS INT) AS pos,
           CAST((seed + (h - 1 - (y2.y * h // 3)) * stride
                 + (x2.x * w // 4) * 3 + c.c) % 256 AS INT) AS val
    FROM g, UNNEST(range(0, 3)) AS y2(y), UNNEST(range(0, 4)) AS x2(x),
         UNNEST(range(0, 3)) AS c(c)
    """,
    tags=("B15", "B11"),
)
def mm_image_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize (4×3) → BMP re-encode → decode
    AGAIN, emitting every resized pixel value. The double decode means
    the oracle (closed-form source pixel at (x2*W//4, y2*H//3)) checks
    the whole loop: generator bytes, decoder, numpy index-map resample,
    and the re-encoder's header/stride/row-order — one wrong byte
    anywhere shifts some pixel and fails the hash."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        resize_images,
    )

    resized = resize_images(_bmp_docs(spark, sf_dir), "doc_id", 4, 3)
    dec = decode_media(resized, "id")
    return dec.select(F.col("id").alias("doc_id"), F.posexplode("data")).select(
        "doc_id", F.col("pos").cast("int"), F.col("col").cast("int").alias("val")
    )


@register(
    "mm_wav_decode_energy",
    oracle="""
    WITH aud AS (
      SELECT doc_id, list_transform(split(text, ''),
               c -> CAST((ord(c) - 128) * (ord(c) - 128) AS BIGINT)) AS sq
      FROM documents WHERE doc_id < 200)
    SELECT doc_id, CAST(u.f AS BIGINT) AS frame_no,
           ROUND(sqrt(CAST(list_sum(
             list_slice(sq, CAST(u.f * 16 + 1 AS BIGINT),
                            CAST(u.f * 16 + 16 AS BIGINT))) AS DOUBLE) / 16.0),
                 4) AS energy,
           CAST(16000 AS INT) AS rate
    FROM aud, UNNEST(range(0, len(sq) // 16)) AS u(f)
    """,
    tags=("B15", "B14"),
)
def mm_wav_decode_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio decode through a REAL container format: wrap
    each document's bytes in a spec-valid RIFF/WAVE (Catalyst
    wav_payload — stdlib `wave` opens it, pinned in tests), parse the
    container back in decode_media (chunk walk, fmt fields, 8-bit PCM
    centering), then frame to 16-sample RMS relationally (posexplode →
    groupBy frame). Complete-frames-only via HAVING count = 16. The
    decoded sample_rate is emitted so the fmt-chunk parse is
    value-checked, not just the sample bytes."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        wav_payload,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wavs = d.select(
        "doc_id", wav_payload(F.encode(F.col("text"), "UTF-8")).alias("payload")
    )
    dec = decode_media(wavs, "doc_id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.col("rate"), F.posexplode("data"))
        .groupBy("doc_id", F.floor(F.col("pos") / 16).alias("frame_no"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(
                F.sqrt(F.sum(F.col("col") * F.col("col")) / 16.0), 4
            ).alias("energy"),
            F.first("rate").alias("rate"),
        )
        .filter(F.col("__n") == 16)
        .select("doc_id", "frame_no", "energy", "rate")
    )


@register(
    "mm_audio_frame_energy",
    oracle=f"""
    WITH aud AS (
      SELECT doc_id,
             list_transform(split(text, ''),
               c -> CAST((ord(c) - 128) * (ord(c) - 128) AS BIGINT)) AS sq
      FROM documents WHERE {_MT} = 'audio'),
    fr AS (
      SELECT doc_id, CAST(u.f AS BIGINT) AS frame_no,
             ROUND(sqrt(CAST(list_sum(
               list_slice(sq, CAST(u.f * 16 + 1 AS BIGINT),
                              CAST(u.f * 16 + 16 AS BIGINT))) AS DOUBLE) / 16.0),
                   4) AS energy
      FROM aud, UNNEST(range(0, len(sq) // 16)) AS u(f))
    SELECT doc_id, frame_no, energy FROM fr
    """,
    tags=("B15", "B14"),
)
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio feature extraction — the one multimodal decode
    path that needs no codec library: payload bytes ARE the samples
    (unsigned 8-bit PCM), so operators.multimodal.audio_frame_energy
    decodes them with np.frombuffer inside an Arrow mapInPandas stage
    and emits per-16-sample-frame RMS energy. Fully value-checked: the
    oracle re-derives identical energies from character codes (ASCII
    corpus => char == byte). The exactness argument lives in the
    operator docstring (integer squares, power-of-two divide)."""
    from stupp_exclusion_etl_spark.operators.multimodal import audio_frame_energy

    d = attach_media(table(spark, sf_dir, "documents"), "doc_id", "text").filter(
        F.col("media.media_type") == "audio"
    )
    out = audio_frame_energy(d, "doc_id", "payload", frame=16)
    return out.select(F.col("id").alias("doc_id"), "frame_no", "energy")


@register(
    "mm_jpeg_decode_block_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, (doc_id * 17) % 256 AS seed,
             8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      FROM documents WHERE doc_id < 60)
    SELECT doc_id,
           CAST(u.x AS INT) AS bx, CAST(v.y AS INT) AS by,
           CAST((seed + 7 * u.x + 13 * v.y) % 256 AS DOUBLE) AS lo,
           CAST((seed + 7 * u.x + 13 * v.y) % 256 AS DOUBLE) AS hi,
           CAST(64 AS BIGINT) AS n_px
    FROM g, UNNEST(range(0, w // 8)) AS u(x), UNNEST(range(0, h // 8)) AS v(y)
    """,
    tags=("B15", "B11"),
)
def mm_jpeg_decode_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END ENTROPY-CODED image decode, no codec library: per
    document synthesize a spec-valid baseline JPEG (synth_jpeg_gray —
    canonical Huffman DHT, DC prediction, FF stuffing) whose 8x8 block
    (bx, by) is the constant (seed + 7*bx + 13*by) % 256, fully decode
    it back (decode_media's _decode_jpeg_pixels: segment walk, Huffman,
    dequant, dezigzag, IDCT), and reduce per block JVM-side. min = max
    = closed form and n_px = 64 prove EVERY pixel of every block
    survived the entropy-coded round trip — one wrong Huffman bit, DC
    prediction, zigzag slot, or IDCT term breaks the hash match. With
    the all-ones quant table the round trip is exact (DC = 8*(v-128)
    integral, AC quantize to 0), so the oracle needs no tolerance."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_jpeg_gray,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60).select(
        "doc_id",
        (F.col("doc_id") * 17 % 256).alias("seed"),
        (8 * (2 + F.col("doc_id") % 3)).cast("int").alias("w"),
        (8 * (1 + F.col("doc_id") % 2)).cast("int").alias("h"),
    )
    jp = synth_jpeg_gray(d, "doc_id", "seed", "w", "h")
    dec = decode_media(jp, "id")
    px = dec.select(
        F.col("id").alias("doc_id"),
        F.col("shape")[1].alias("w"),
        F.posexplode("data"),
    )
    return px.groupBy(
        "doc_id",
        F.floor((F.col("pos") % F.col("w")) / 8).cast("int").alias("bx"),
        F.floor(F.floor(F.col("pos") / F.col("w")) / 8).cast("int").alias("by"),
    ).agg(
        F.min("col").alias("lo"),
        F.max("col").alias("hi"),
        F.count(F.lit(1)).alias("n_px"),
    )


@register(
    "mm_jpeg_progressive_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, (doc_id * 29) % 256 AS seed,
             8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
      FROM documents WHERE doc_id < 48)
    SELECT doc_id,
           CAST(u.x AS INT) AS bx, CAST(v.y AS INT) AS by,
           CAST((seed + 7 * u.x + 13 * v.y) % 256 AS DOUBLE) AS lo,
           CAST((seed + 7 * u.x + 13 * v.y) % 256 AS DOUBLE) AS hi,
           CAST(64 AS BIGINT) AS n_px
    FROM g, UNNEST(range(0, w // 8)) AS u(x), UNNEST(range(0, h // 8)) AS v(y)
    """,
    tags=("B15", "B11"),
)
def mm_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode end to end: per document
    synthesize the six-scan successive-approximation stream (DC
    first/refine at Al=1→0, AC first/refine over two spectral bands
    with EOBn runs — synth_jpeg_gray(progressive=True)), decode it
    back through the multi-scan coefficient store
    (_jpeg_apply_scan: G.2 DC/AC first + refinement procedures), and
    reduce per 8x8 block JVM-side. min = max = the closed form and
    n_px = 64 prove every coefficient survived ALL SIX scans — a wrong
    EOB run length, refinement correction bit, or point-transform
    shift breaks the hash. Same all-ones-quant exactness argument as
    the baseline query; seed differs so the two queries can't mask
    each other."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_jpeg_gray,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select(
        "doc_id",
        (F.col("doc_id") * 29 % 256).alias("seed"),
        (8 * (2 + F.col("doc_id") % 3)).cast("int").alias("w"),
        (8 * (1 + F.col("doc_id") % 2)).cast("int").alias("h"),
    )
    jp = synth_jpeg_gray(d, "doc_id", "seed", "w", "h", progressive=True)
    dec = decode_media(jp, "id")
    px = dec.select(
        F.col("id").alias("doc_id"),
        F.col("shape")[1].alias("w"),
        F.posexplode("data"),
    )
    return px.groupBy(
        "doc_id",
        F.floor((F.col("pos") % F.col("w")) / 8).cast("int").alias("bx"),
        F.floor(F.floor(F.col("pos") / F.col("w")) / 8).cast("int").alias("by"),
    ).agg(
        F.min("col").alias("lo"),
        F.max("col").alias("hi"),
        F.count(F.lit(1)).alias("n_px"),
    )


@register(
    "mm_jpeg_420_subsampled_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, (doc_id * 23) % 256 AS seed,
             2 + 2 * (doc_id % 2) AS wb, 2 + 2 * (doc_id % 3) AS hb
      FROM documents WHERE doc_id < 48),
    blocks AS (
      SELECT g.doc_id, CAST(u.x AS INT) AS bx, CAST(v.y AS INT) AS by,
             (g.seed + 5 * u.x + 11 * v.y) % 256 AS yv,
             (3 * g.seed + 7 * (u.x // 2) + 13 * (v.y // 2)) % 256 AS cb,
             (5 * g.seed + 3 * (u.x // 2) + 17 * (v.y // 2)) % 256 AS cr
      FROM g, UNNEST(range(0, g.wb)) AS u(x), UNNEST(range(0, g.hb)) AS v(y)),
    chans AS (
      SELECT doc_id, bx, by, 0 AS ch,
             LEAST(255, GREATEST(0, ROUND(yv + 1.402 * (cr - 128)))) AS val
      FROM blocks
      UNION ALL
      SELECT doc_id, bx, by, 1,
             LEAST(255, GREATEST(0, ROUND(
               yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))))
      FROM blocks
      UNION ALL
      SELECT doc_id, bx, by, 2,
             LEAST(255, GREATEST(0, ROUND(yv + 1.772 * (cb - 128))))
      FROM blocks)
    SELECT doc_id, bx, by, CAST(ch AS INT) AS ch,
           CAST(val AS DOUBLE) AS lo, CAST(val AS DOUBLE) AS hi,
           CAST(64 AS BIGINT) AS n_px
    FROM chans
    """,
    tags=("B15", "B11"),
)
def mm_jpeg_420_subsampled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHROMA-SUBSAMPLED (4:2:0) color JPEG decode end to end: per
    document synthesize a real MCU-interleaved stream (four Y blocks +
    Cb + Cr per MCU, per-component DC prediction —
    operators.multimodal.synth_jpeg_420), decode it through the MCU
    geometry path (_jpeg_decode_subsampled: sampling-factor block
    layout, per-plane IDCT, nearest-neighbor chroma reconstruction,
    YCbCr→RGB), and reduce per (luma block, channel) JVM-side.
    Block-constant planes + all-ones quant make the round trip exact,
    and min = max = the closed-form converted value proves every
    pixel: a block misplaced in the MCU walk, a swapped chroma plane,
    or a wrong upsample offset breaks the hash. Synth constants are
    tie-free (no conversion lands on exact .5), so SQL's
    round-half-away and numpy's round-half-even agree."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_jpeg_420,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select(
        "doc_id",
        (F.col("doc_id") * 23 % 256).alias("seed"),
        (2 + 2 * (F.col("doc_id") % 2)).cast("int").alias("wb"),
        (2 + 2 * (F.col("doc_id") % 3)).cast("int").alias("hb"),
    )
    jp = synth_jpeg_420(d, "doc_id", "seed", "wb", "hb")
    dec = decode_media(jp, "id")
    px = dec.select(
        F.col("id").alias("doc_id"),
        F.col("shape")[1].alias("w"),
        F.posexplode("data"),
    )
    idx = F.floor(F.col("pos") / 3)
    return px.groupBy(
        "doc_id",
        F.floor((idx % F.col("w")) / 8).cast("int").alias("bx"),
        F.floor(F.floor(idx / F.col("w")) / 8).cast("int").alias("by"),
        (F.col("pos") % 3).cast("int").alias("ch"),
    ).agg(
        F.min("col").alias("lo"),
        F.max("col").alias("hi"),
        F.count(F.lit(1)).alias("n_px"),
    )


@register(
    "mm_jpeg_prog_420_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, (doc_id * 23) % 256 AS seed,
             2 + 2 * (doc_id % 2) AS wb, 2 + 2 * (doc_id % 3) AS hb
      FROM documents WHERE doc_id < 48),
    blocks AS (
      SELECT g.doc_id, CAST(u.x AS INT) AS bx, CAST(v.y AS INT) AS by,
             (g.seed + 5 * u.x + 11 * v.y) % 256 AS yv,
             (3 * g.seed + 7 * (u.x // 2) + 13 * (v.y // 2)) % 256 AS cb,
             (5 * g.seed + 3 * (u.x // 2) + 17 * (v.y // 2)) % 256 AS cr
      FROM g, UNNEST(range(0, g.wb)) AS u(x), UNNEST(range(0, g.hb)) AS v(y)),
    chans AS (
      SELECT doc_id, bx, by, 0 AS ch,
             LEAST(255, GREATEST(0, ROUND(yv + 1.402 * (cr - 128)))) AS val
      FROM blocks
      UNION ALL
      SELECT doc_id, bx, by, 1,
             LEAST(255, GREATEST(0, ROUND(
               yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))))
      FROM blocks
      UNION ALL
      SELECT doc_id, bx, by, 2,
             LEAST(255, GREATEST(0, ROUND(yv + 1.772 * (cb - 128))))
      FROM blocks)
    SELECT doc_id, bx, by, CAST(ch AS INT) AS ch,
           CAST(val AS DOUBLE) AS lo, CAST(val AS DOUBLE) AS hi,
           CAST(64 AS BIGINT) AS n_px
    FROM chans
    """,
    tags=("B15", "B11"),
)
def mm_jpeg_prog_420_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE + CHROMA-SUBSAMPLED JPEG decode end to end — the
    combination the r7 guard blocked, now real: per document
    synthesize an SOF2 4:2:0 stream (interleaved DC-first scan in MCU
    order, then per-component full-band AC-first scans over each
    component's OWN block raster with EOB runs —
    operators.multimodal._encode_jpeg_420_progressive), decode through
    the unified T.81 A.2 scan walk, and reduce per (luma block,
    channel) JVM-side. Spectral selection restores coefficients
    exactly, so the oracle is the SAME closed-form block constants as
    mm_jpeg_420_subsampled_stats (tie-free seed multiplier 23): any
    error in the progressive MCU geometry, the non-interleaved index
    remap, or the EOB-run accounting breaks the hash."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_jpeg_420,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select(
        "doc_id",
        (F.col("doc_id") * 23 % 256).alias("seed"),
        (2 + 2 * (F.col("doc_id") % 2)).cast("int").alias("wb"),
        (2 + 2 * (F.col("doc_id") % 3)).cast("int").alias("hb"),
    )
    jp = synth_jpeg_420(d, "doc_id", "seed", "wb", "hb", progressive=True)
    dec = decode_media(jp, "id")
    px = dec.select(
        F.col("id").alias("doc_id"),
        F.col("shape")[1].alias("w"),
        F.posexplode("data"),
    )
    idx = F.floor(F.col("pos") / 3)
    return px.groupBy(
        "doc_id",
        F.floor((idx % F.col("w")) / 8).cast("int").alias("bx"),
        F.floor(F.floor(idx / F.col("w")) / 8).cast("int").alias("by"),
        (F.col("pos") % 3).cast("int").alias("ch"),
    ).agg(
        F.min("col").alias("lo"),
        F.max("col").alias("hi"),
        F.count(F.lit(1)).alias("n_px"),
    )


@register(
    "mm_wav_g711_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, (doc_id * 13) % 256 AS seed,
             64 + (doc_id % 5) * 16 AS n
      FROM documents WHERE doc_id < 64),
    s AS (
      SELECT doc_id, 255 - ((seed + 7 * u.i) % 256) AS c
      FROM g, UNNEST(range(0, n)) AS u(i)),
    v AS (
      SELECT doc_id,
             CASE WHEN c >= 128
                  THEN 132 - (((c % 16) * 8 + 132) << ((c // 16) % 8))
                  ELSE (((c % 16) * 8 + 132) << ((c // 16) % 8)) - 132
             END AS val
      FROM s)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(MIN(val) AS BIGINT) AS min_val,
           CAST(MAX(val) AS BIGINT) AS max_val
    FROM v GROUP BY doc_id
    """,
    tags=("B15", "B5"),
)
def mm_wav_g711_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 μ-LAW telephony decode end to end: per document a RIFF
    stream (fmt code 7, mono 8 kHz) whose companded bytes sweep
    ``(seed + 7*i) % 256`` — every μ-law code point is hit — decoded
    through the WAV chunk walk + table expansion
    (operators.multimodal._g711_table) and reduced per document
    JVM-side. The oracle re-derives each linear sample from the SPEC
    formula (complement, mantissa/exponent, ±0x84 bias) in pure SQL,
    so a single wrong table entry, sign branch, or bias breaks the
    hash. All-integer outputs: no rounding tolerance anywhere."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_wav_g711,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id",
        (F.col("doc_id") * 13 % 256).alias("seed"),
        (64 + (F.col("doc_id") % 5) * 16).cast("int").alias("n"),
    )
    wav = synth_wav_g711(d, "doc_id", "seed", "n", law="u")
    dec = decode_media(wav, "id")
    s = dec.select(F.col("id").alias("doc_id"), F.explode("data").alias("val"))
    return s.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("val").cast("long").alias("sum_val"),
        F.min("val").cast("long").alias("min_val"),
        F.max("val").cast("long").alias("max_val"),
    )


@register(
    "mm_png_decode_channel_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 5 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 251 AS seed
      FROM documents WHERE doc_id < 200),
    v AS (
      SELECT g.doc_id, CAST(c.c AS INT) AS ch,
             CAST((g.seed + (y.y * g.w + x.x) * 3 + c.c) % 256 AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.h)) AS y(y), UNNEST(range(0, g.w)) AS x(x),
           UNNEST(range(0, 3)) AS c(c))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_png_decode_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END PNG round trip with a REAL DEFLATE stream (stdlib
    zlib — no codec lib): synthesize an 8-bit RGB PNG per document
    whose scanline filters cycle through all five spec types
    (operators.multimodal.png_synthesize), decode it back — chunk walk
    with CRC checks, inflate, full unfilter (_decode_png_pixels) —
    and reduce pixels to per-channel means JVM-side. Heights ≥ 6 so
    every image exercises None/Sub/Up/Average/Paeth. The oracle
    recomputes each pixel from the generator's closed form; a filter
    or predictor slip in encoder OR decoder shifts pixels and fails
    the hash (asymmetric-golden tests in tests/test_multimodal.py pin
    the two against the spec independently)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        png_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    geom = d.select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 251).alias("seed"),
    )
    payloads = png_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(F.round(F.avg("col"), 4).alias("mean_val"))
    )


@register(
    "mm_gif_decode_palette_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
             doc_id % 97 AS seed
      FROM documents WHERE doc_id < 200),
    v AS (
      SELECT g.doc_id, CAST(c.c AS INT) AS ch,
             CAST((((g.seed + p.p) % 16)
                   * CASE c.c WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END)
                  % 256 AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h)) AS p(p),
           UNNEST(range(0, 3)) AS c(c))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_gif_decode_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END GIF round trip with REAL LZW compression (pure
    Python — LZW is ~40 lines, no codec lib): synthesize a GIF87a per
    document (operators.multimodal.gif_synthesize: deterministic
    16-color global palette, closed-form index plane, dictionary-
    building LZW encoder), decode it back — screen/palette walk,
    sub-block reassembly, LZW inflate with width growth / CLEAR /
    KwKwK handling, palette mapping (_decode_gif_pixels) — and reduce
    to per-channel means JVM-side. The oracle recomputes every channel
    value from (index, palette) closed forms; the LZW decoder is
    additionally pinned to hand-derived spec bitstreams in
    tests/test_multimodal.py so encoder and decoder cannot be
    symmetrically wrong."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        gif_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    geom = d.select(
        "doc_id",
        (F.lit(6) + F.col("doc_id") % 5).alias("w"),
        (F.lit(4) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 97).alias("seed"),
    )
    payloads = gif_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(F.round(F.avg("col"), 4).alias("mean_val"))
    )


@register(
    "mm_png_adam7_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 9 + doc_id % 7 AS w, 10 + doc_id % 6 AS h,
             doc_id % 251 AS seed
      FROM documents WHERE doc_id < 150),
    v AS (
      SELECT g.doc_id, CAST(p.p % 3 AS INT) AS ch, p.p AS pos,
             CAST((g.seed + p.p) % 256 AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h * 3)) AS p(p))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_png_adam7_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAM7-interlaced PNG round trip (retires the r6 guard): the
    synthesizer writes interlace=1 streams — seven passes, each
    filtered as an independent sub-image with the filter picker still
    cycling all five types — and the decoder walks the pass grid,
    unfilters per pass, and scatters rows/columns back into place.
    The reduction is POSITION-weighted (sum of val x flat position)
    on top of the channel mean, because a de-interlace bug permutes
    pixels, which channel means cannot see — the weighted checksum
    breaks on any single misplaced row, column, or pass boundary.
    Geometry (w >= 9, h >= 10) keeps all seven passes non-empty."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        png_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    geom = d.select(
        "doc_id",
        (F.lit(9) + F.col("doc_id") % 7).alias("w"),
        (F.lit(10) + F.col("doc_id") % 6).alias("h"),
        (F.col("doc_id") % 251).alias("seed"),
    )
    payloads = png_synthesize(geom, "doc_id", "w", "h", "seed", interlace=True)
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias("pos_weighted"),
        )
    )


@register(
    "mm_png_palette_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 5 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 101 AS seed
      FROM documents WHERE doc_id < 200),
    v AS (
      SELECT g.doc_id, CAST(p.p % 3 AS INT) AS ch, p.p AS pos,
             CAST(CASE WHEN g.doc_id % 2 = 0 THEN
                    (((g.seed + p.p // 3) % 32)
                     * CASE p.p % 3 WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END)
                    % 256
                  ELSE (g.seed + 2 * (p.p // 3)) % 256
                  END AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h * 3)) AS p(p))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_png_palette_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PALETTE and GRAYSCALE PNG round trip (VERDICT r10 task #3 —
    the color types a scraped web corpus actually carries, retiring
    the truecolor-only guard): even docs synthesize color-type-3
    streams (32-entry closed-form PLTE, index plane (seed+p)%32),
    odd docs color-type-0 grayscale ((seed+2p)%256); the decoder
    PLTE-maps palette indices and replicates gray to RGB, so both
    variants reduce in one 3-channel aggregation. The oracle
    recomputes each decoded channel value from the palette/gray
    closed forms — an index-mapping or expansion slip shifts values
    and fails the hash; the POSITION-weighted checksum additionally
    breaks on any pixel permutation. Alpha variants (tRNS, color
    types 4/6) are pinned by closed-form round trips in
    tests/test_multimodal.py."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        png_variant_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    geom = d.select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 101).alias("seed"),
    )
    payloads = png_variant_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias(
                "pos_weighted"
            ),
        )
    )


@register(
    "mm_gif_interlaced_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 6 + doc_id % 5 AS w, 8 + doc_id % 5 AS h,
             doc_id % 97 AS seed
      FROM documents WHERE doc_id < 150),
    v AS (
      SELECT g.doc_id, CAST(p.p % 3 AS INT) AS ch, p.p AS pos,
             CAST((((g.seed + p.p // 3) % 16)
                   * CASE p.p % 3 WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END)
                  % 256 AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h * 3)) AS p(p))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_gif_interlaced_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interlaced-GIF round trip (retires the r6 guard): rows are
    LZW-stored in the spec's four-pass order (descriptor flag 0x40)
    and the decoder re-interleaves them. Position-weighted checksum
    for the same reason as mm_png_adam7_decode_stats — a row put back
    in the wrong place leaves every channel MEAN identical and must
    still break the hash. h >= 8 exercises all four passes."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        gif_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    geom = d.select(
        "doc_id",
        (F.lit(6) + F.col("doc_id") % 5).alias("w"),
        (F.lit(8) + F.col("doc_id") % 5).alias("h"),
        (F.col("doc_id") % 97).alias("seed"),
    )
    payloads = gif_synthesize(
        geom, "doc_id", "w", "h", "seed", interlace=True
    )
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias("pos_weighted"),
        )
    )


@register(
    "mm_png16_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 5 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 103 AS seed
      FROM documents WHERE doc_id < 180),
    v AS (
      SELECT g.doc_id, CAST(p.p % 3 AS INT) AS ch, p.p AS pos,
             CAST(CASE WHEN g.doc_id % 2 = 0 THEN
                    (g.seed * 257 + p.p * 101) % 65536
                  ELSE (g.seed * 131 + (p.p // 3) * 257) % 65536
                  END AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h * 3)) AS p(p))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_png16_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT PNG round trip (VERDICT r11 task #6 — the highest-
    frequency remaining codec guard: scientific/medical corpora ship
    depth-16 streams): even docs synthesize truecolor-16 (color type
    2), odd docs grayscale-16 (color type 0); the decoder runs the
    spec's byte-level filters with a 2-byte unit, reassembles samples
    big-endian to RAW 0..65535 values (never rescaled), and gray
    replicates to RGB. The oracle recomputes every decoded sample
    from the closed forms — an endianness slip, a mis-sized filter
    unit, or a sneaky 8-bit rescale all shift values and fail the
    hash; the position-weighted checksum breaks on any pixel
    permutation. Alpha 16-bit variants (types 4/6) are pinned by
    round trips in tests/test_multimodal.py."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        png16_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 180)
    geom = d.select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 103).alias("seed"),
    )
    payloads = png16_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias(
                "pos_weighted"
            ),
        )
    )


@register(
    "mm_png_packed_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 5 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
             doc_id % 97 AS seed
      FROM documents WHERE doc_id < 160),
    v AS (
      SELECT g.doc_id, CAST(p.p % 3 AS INT) AS ch, p.p AS pos,
             CAST(CASE WHEN g.doc_id % 2 = 0 THEN
                    (((g.seed + p.p // 3) % 16)
                     * CASE p.p % 3 WHEN 0 THEN 17 WHEN 1 THEN 29 ELSE 41 END)
                    % 256
                  ELSE (g.seed + 3 * (p.p // 3)) % 4
                  END AS DOUBLE) AS val
      FROM g, UNNEST(range(0, g.w * g.h * 3)) AS p(p))
    SELECT doc_id, ch, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2
    """,
    tags=("B15", "B5"),
)
def mm_png_packed_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-BYTE packed PNG round trip (r12 — retires the LAST PNG
    guard: every spec-legal (color type, depth) pair now decodes):
    even docs synthesize 4-bit PALETTE streams (16-entry closed-form
    PLTE, packed two indices per byte), odd docs 2-bit GRAYSCALE
    (four samples per byte); rows pad to byte boundaries, bits unpack
    MSB-first, the filter unit is one byte, and grayscale raw values
    (0..3) replicate to RGB UNRESCALED. The oracle recomputes every
    decoded value from the closed forms — a bit-order slip, a padding
    error, or a sneaky rescale shifts values and fails the hash; the
    position-weighted checksum breaks on any pixel permutation.
    Adam7 + packed placement is pinned by a hand-assembled stream in
    tests/test_multimodal.py."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        png_packed_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 160)
    geom = d.select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 5).alias("w"),
        (F.lit(6) + F.col("doc_id") % 4).alias("h"),
        (F.col("doc_id") % 97).alias("seed"),
    )
    payloads = png_packed_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id", (F.col("pos") % 3).cast("int").alias("ch"))
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias(
                "pos_weighted"
            ),
        )
    )


@register(
    "mm_decode_reject_audit",
    oracle="""
    WITH g AS (
      SELECT doc_id, 5 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 251 AS seed, CAST(doc_id % 5 AS INT) AS cls
      FROM documents WHERE doc_id < 250),
    px AS (
      SELECT CAST((g.seed + p.p) % 256 AS DOUBLE) AS val
      FROM g, UNNEST(range(0, CAST(g.w * g.h * 3 AS BIGINT))) AS p(p)
      WHERE g.cls = 0),
    r AS (
      SELECT CASE cls WHEN 0 THEN 'ok'
                  WHEN 1 THEN 'corrupt_payload'
                  WHEN 2 THEN 'corrupt_payload'
                  WHEN 3 THEN 'unsupported_format'
                  ELSE 'null_payload' END AS reason
      FROM g)
    SELECT reason, CAST(count(*) AS BIGINT) AS n_docs,
           CASE WHEN reason = 'ok'
                THEN (SELECT ROUND(AVG(val), 4) FROM px) END AS mean_px
    FROM r GROUP BY 1
    """,
    tags=("B15", "A18"),
)
def mm_decode_reject_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-media quarantine channel (VERDICT r12 task #2 — the
    media twin of ingest_reject_audit): synthesize a valid 8-bit RGB
    PNG per document, then DETERMINISTICALLY poison four of every
    five — mid-IHDR truncation (doc_id%5==1), a zeroed IHDR CRC field
    (==2, the bit-rot shape), unknown magic bytes (==3), NULL payload
    (==4) — and route the mix through operators.multimodal.
    decode_audit: the same Arrow mapInPandas stage as decode_media,
    but every record yields ok_row(tensor) | error_row(reason,
    detail), so the poisoned blobs become audited reject rows instead
    of task failures. Output: per-reason doc counts plus the mean
    pixel value over the successfully-decoded rows — the oracle
    restates both (reject classes from doc_id arithmetic; ok pixels
    from the generator's closed form), so a decoder that silently
    'succeeds' on a corrupt payload, or quarantines a valid one,
    fails the hash."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_audit,
        png_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    geom = d.select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 251).alias("seed"),
    )
    payloads = png_synthesize(geom, "doc_id", "w", "h", "seed")
    cls = F.col("id") % 5
    poisoned = payloads.withColumn(
        "payload",
        F.when(cls == 1, F.substring(F.col("payload"), 1, 20))
        .when(
            cls == 2,
            F.overlay(
                F.col("payload"), F.lit(b"\x00\x00\x00\x00"), F.lit(30)
            ),
        )
        .when(cls == 3, F.lit(b"\x00" * 8))
        .when(cls == 4, F.lit(None).cast("binary"))
        .otherwise(F.col("payload")),
    )
    aud = decode_audit(poisoned, "id")
    # per-doc pixel sums via one higher-order-function pass (no
    # explode blowup), then one rollup: n_docs per reason + the mean
    # pixel value over every ok row's tensor
    per_doc = aud.select(
        "reason",
        F.aggregate(
            "data", F.lit(0.0), lambda acc, x: acc + x
        ).alias("px_sum"),
        F.when(F.col("data").isNotNull(), F.size("data")).alias("px_n"),
    )
    return per_doc.groupBy("reason").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("px_sum") / F.sum("px_n"), 4).alias("mean_px"),
    )


@register(
    "mm_gif_animated_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 7 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 97 AS seed
      FROM documents WHERE doc_id < 150),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.seed, f.f AS frame,
             y.y AS y, x.x AS x, c.c AS ch
      FROM g, UNNEST(range(0, 3)) AS f(f), UNNEST(range(0, g.h)) AS y(y),
           UNNEST(range(0, g.w)) AS x(x), UNNEST(range(0, 3)) AS c(c)),
    v AS (
      SELECT doc_id, frame, CAST(ch AS INT) AS ch,
             (y * w + x) * 3 + ch AS fpos,
             CAST((((seed + 17 * wr +
                   CASE wr WHEN 2 THEN (y - 1) * (w - 4) + (x - 3)
                           WHEN 1 THEN (y - 2) * (w - 2) + (x - 1)
                           ELSE y * w + x END) % 16)
                  * CASE ch WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END)
                  % 256 AS DOUBLE) AS val
      FROM (SELECT *,
                   CASE WHEN frame >= 2 AND x BETWEEN 3 AND w - 2
                             AND y BETWEEN 1 AND h - 2 THEN 2
                        WHEN frame >= 1 AND x BETWEEN 1 AND w - 2
                             AND y BETWEEN 2 AND h - 2 THEN 1
                        ELSE 0 END AS wr
            FROM px) q)
    SELECT doc_id, CAST(frame AS INT) AS frame, ch,
           ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * fpos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2, 3
    """,
    tags=("B15", "B5"),
)
def mm_gif_animated_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL-FRAME animated GIF round trip (r13 — retires the
    partial-frame guard): each document synthesizes a GIF89a
    animation — frame 0 full-screen, frames 1-2 sub-rects with
    graphic-control extensions — and the decoder composites every
    frame onto the logical-screen canvas (operators.multimodal.
    _decode_gif_pixels: GCE walk, per-frame LZW inflate, rect
    placement, last-writer-wins under disposal 1). Output: per
    (doc, frame, channel) mean over the COMPOSITED canvas plus a
    position-weighted checksum that breaks on any misplaced rect.
    The oracle recomputes every canvas pixel from the closed forms
    by resolving, per (frame, x, y), the LAST frame whose rect
    covers the pixel; transparency and disposal-2 compositing are
    pinned byte-exact in tests/test_multimodal.py."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        gif_animated_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    geom = d.select(
        "doc_id",
        (F.lit(7) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 97).alias("seed"),
    )
    payloads = gif_animated_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    per = dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
    fsz = (F.lit(7) + F.col("doc_id") % 4) * (
        F.lit(6) + F.col("doc_id") % 3
    ) * 3
    return per.groupBy(
        "doc_id",
        F.floor(F.col("pos") / fsz).cast("int").alias("frame"),
        (F.col("pos") % 3).cast("int").alias("ch"),
    ).agg(
        F.round(F.avg("col"), 4).alias("mean_val"),
        F.sum(F.col("col") * (F.col("pos") % fsz)).cast("long").alias(
            "pos_weighted"
        ),
    )


@register(
    "mm_gif_disposal_restore",
    oracle="""
    WITH g AS (
      SELECT doc_id, 7 + doc_id % 4 AS w, 6 + doc_id % 3 AS h,
             doc_id % 97 AS seed
      FROM documents WHERE doc_id < 150),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.seed, f.f AS frame,
             y.y AS y, x.x AS x, c.c AS ch
      FROM g, UNNEST(range(0, 3)) AS f(f), UNNEST(range(0, g.h)) AS y(y),
           UNNEST(range(0, g.w)) AS x(x), UNNEST(range(0, 3)) AS c(c)),
    v AS (
      SELECT doc_id, frame, CAST(ch AS INT) AS ch,
             (y * w + x) * 3 + ch AS fpos,
             CAST((((seed + 17 * wr +
                   CASE wr WHEN 2 THEN (y - 1) * (w - 4) + (x - 3)
                           WHEN 1 THEN (y - 2) * (w - 2) + (x - 1)
                           ELSE y * w + x END) % 16)
                  * CASE ch WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END)
                  % 256 AS DOUBLE) AS val
      FROM (SELECT *,
                   CASE WHEN frame = 2 AND x BETWEEN 3 AND w - 2
                             AND y BETWEEN 1 AND h - 2 THEN 2
                        WHEN frame = 1 AND x BETWEEN 1 AND w - 2
                             AND y BETWEEN 2 AND h - 2 THEN 1
                        ELSE 0 END AS wr
            FROM px) q)
    SELECT doc_id, CAST(frame AS INT) AS frame, ch,
           ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * fpos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1, 2, 3
    """,
    tags=("B15", "B5"),
)
def mm_gif_disposal_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restore-to-previous animated GIF round trip (r14 — retires
    the last common-in-the-wild GIF guard): the same partial-frame
    animation as mm_gif_animated_stats but every frame's
    graphic-control extension declares disposal method 3, so after
    each partial frame displays, the canvas reverts to its PRE-frame
    state (one saved canvas — the spec restores to the previous
    canvas, not arbitrary history; operators/multimodal.py
    _decode_gif_pixels). The observable difference from disposal 1
    is exactly the oracle's wr resolution: frame 2's canvas shows
    frame 0 everywhere outside frame 2's OWN rect — frame 1's rect
    is gone — whereas mm_gif_animated_stats' wr keeps frame 1's
    writes wherever frame 2 doesn't overpaint. Same per-(doc, frame,
    channel) mean + position-weighted checksum, so a decoder that
    ignored disposal 3 (treating it as 1) hash-mismatches."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        gif_animated_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    geom = d.select(
        "doc_id",
        (F.lit(7) + F.col("doc_id") % 4).alias("w"),
        (F.lit(6) + F.col("doc_id") % 3).alias("h"),
        (F.col("doc_id") % 97).alias("seed"),
    )
    payloads = gif_animated_synthesize(
        geom, "doc_id", "w", "h", "seed", disposal=3
    )
    dec = decode_media(payloads, "id")
    per = dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
    fsz = (F.lit(7) + F.col("doc_id") % 4) * (
        F.lit(6) + F.col("doc_id") % 3
    ) * 3
    return per.groupBy(
        "doc_id",
        F.floor(F.col("pos") / fsz).cast("int").alias("frame"),
        (F.col("pos") % 3).cast("int").alias("ch"),
    ).agg(
        F.round(F.avg("col"), 4).alias("mean_val"),
        F.sum(F.col("col") * (F.col("pos") % fsz)).cast("long").alias(
            "pos_weighted"
        ),
    )


@register(
    "mm_jpeg_lossless_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 6 + doc_id % 5 AS w, 5 + doc_id % 4 AS h,
             doc_id % 251 AS seed,
             CASE WHEN doc_id % 2 = 0 THEN 256 ELSE 4096 END AS m
      FROM documents WHERE doc_id < 150),
    v AS (
      SELECT doc_id, p.p AS pos,
             CAST((seed + p.p * 7) % m AS DOUBLE) AS val
      FROM g, UNNEST(range(0, CAST(g.w * g.h AS BIGINT))) AS p(p))
    SELECT doc_id, ROUND(AVG(val), 4) AS mean_val,
           CAST(SUM(val * pos) AS BIGINT) AS pos_weighted
    FROM v GROUP BY 1
    """,
    tags=("B15", "B5"),
)
def mm_jpeg_lossless_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS JPEG round trip (r13 — retires the SOF3 guard): each
    document synthesizes a predictive lossless JPEG (predictor
    1 + doc%7, so all seven spec predictors run across the corpus;
    8-bit for even docs, 12-bit for odd — the archival/medical
    depths; no block grid, so dimensions are arbitrary) and decodes
    it back through operators.multimodal._decode_jpeg_lossless. The
    decode is EXACT by the process's definition, so the oracle
    recomputes raw sample values from the generator's closed form
    with no tolerance at all — a one-bit slip in any predictor,
    boundary rule, or DIFF category fails the hash; the
    position-weighted checksum breaks on pixel permutations."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        jpeg_lossless_synthesize,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    geom = d.select(
        "doc_id",
        (F.lit(6) + F.col("doc_id") % 5).alias("w"),
        (F.lit(5) + F.col("doc_id") % 4).alias("h"),
        (F.col("doc_id") % 251).alias("seed"),
    )
    payloads = jpeg_lossless_synthesize(geom, "doc_id", "w", "h", "seed")
    dec = decode_media(payloads, "id")
    return (
        dec.select(F.col("id").alias("doc_id"), F.posexplode("data"))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("col"), 4).alias("mean_val"),
            F.sum(F.col("col") * F.col("pos")).cast("long").alias(
                "pos_weighted"
            ),
        )
    )
