"""Multimodal column operators (north-star: BASELINE.json multimodal
family; reference anchor: opaque scraped values, SURVEY.md §1.1).

Media (image/audio/video) travel as opaque ``binary`` payload columns
plus a typed metadata struct — the 100 TB pattern where blobs live
inline in parquet (or as object-store pointers) and all planning
happens on the cheap metadata columns.

Header/metadata decode is REAL: ``parse_image_meta`` reads PNG/GIF/BMP
geometry in pure Catalyst (substring + hex arithmetic — no UDF), and
``image_meta_scan`` walks JPEG SOF markers in an Arrow-batched
``mapInPandas`` stage — both tested against handcrafted real files.

PIXEL/SAMPLE decode is REAL for every format expressible without an
external codec library: ``decode_media`` fully decodes 24-bit
uncompressed BMP (header walk, bottom-up rows, 4-byte stride padding),
RIFF/WAVE PCM (chunk walk, 8/16-bit samples), 8-bit RGB PNG (stdlib
zlib inflate + all five scanline unfilters — DEFLATE ships in the
standard library, r6) and baseline JPEG (pure-numpy Huffman/IDCT),
all inside Arrow ``mapInPandas`` stages; ``resize_images`` is a real
nearest-neighbor resample that re-encodes valid BMP bytes. Only
codec-library formats (H.264/AV1 frames) and the guarded JPEG/PNG
variants raise ``NotImplementedError`` with the production recipe.
``bmp_payload`` / ``wav_payload`` synthesize deterministic real files
in pure Catalyst, ``png_synthesize`` via zlib in Python, so every
decode path is value-checkable end-to-end against a closed-form
oracle.

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
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
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
                if payload is None:  # NULL media: nothing to histogram
                    continue
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


_ENERGY_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_no", LongType()),
        StructField("energy", DoubleType()),
    ]
)


def audio_frame_energy(
    df: DataFrame, id_col: str, payload_col: str = "payload", frame: int = 16
) -> DataFrame:
    """Frame-level RMS energy over audio payloads decoded as unsigned
    8-bit PCM (silence = 128): the real decode-and-feature stage of an
    audio pipeline — np.frombuffer needs no codec library, so unlike
    decode_media this path runs end-to-end in this container. Each
    Arrow batch is processed vectorized (frombuffer → reshape →
    per-frame RMS); payloads short of one frame emit nothing, tail
    samples are dropped. Returns (id, frame_no, energy) with energy
    rounded to 4dp. Repartitioned by id first so the CPU-bound stage
    spreads across cores instead of inheriting parquet file locality
    (same rationale as byte_histogram)."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids: list[int] = []
            fns: list[int] = []
            ens: list[float] = []
            for i, payload in zip(pdf["id"], pdf["p"]):
                if payload is None:  # NULL media: no frames
                    continue
                arr = (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                    - 128.0
                )
                n = arr.size // frame
                if n == 0:
                    continue
                # Squares and their 16-term sums are exact in f64
                # (< 2^53) and /frame is a power-of-two divide, so the
                # value under sqrt is bit-identical to the oracle's
                # integer-sum derivation.
                rms = np.sqrt((arr[: n * frame].reshape(n, frame) ** 2).mean(axis=1))
                ids.extend([int(i)] * n)
                fns.extend(range(n))
                ens.extend(np.round(rms, 4))
            yield pd.DataFrame({"id": ids, "frame_no": fns, "energy": ens})

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(extract, _ENERGY_SCHEMA)


PNG_SIG_HEX = "89504E470D0A1A0A"


def png_payload(width: Column, height: Column) -> Column:
    """Minimal VALID-geometry PNG byte stream built in pure Catalyst:
    8-byte signature + IHDR chunk (13-byte body: width/height as
    big-endian u32, bit depth 8, color type 2/RGB, compression 0,
    filter 0, interlace 0). CRC bytes are zeroed — geometry parsers
    read IHDR fields, CRC validation belongs to pixel decode. Used to
    synthesize deterministic image payloads whose header decode is
    value-checkable end-to-end."""

    def be32(c: Column) -> Column:
        return F.lpad(F.hex(c.cast("int")), 8, "0")

    return F.unhex(
        F.concat(
            F.lit(PNG_SIG_HEX),
            F.lit("0000000D"),  # IHDR body length = 13
            F.lit("49484452"),  # "IHDR"
            be32(width),
            be32(height),
            F.lit("08"),  # bit depth
            F.lit("02"),  # color type: truecolor RGB
            F.lit("000000"),  # compression, filter, interlace
            F.lit("00000000"),  # CRC (zeroed; see docstring)
        )
    )


def _le_hex(c: Column, n_bytes: int) -> Column:
    """Little-endian hex encoding of a non-negative integer column in
    ``n_bytes`` bytes (values < 2^32, so double flooring is exact)."""
    return F.concat(
        *[
            F.lpad(
                F.hex(F.floor(c.cast("long") / F.lit(256**k)).cast("long") % 256),
                2,
                "0",
            )
            for k in range(n_bytes)
        ]
    )


def bmp_stride(width: Column) -> Column:
    """BMP row stride: pixel rows are padded to 4-byte boundaries."""
    return (F.floor((width.cast("long") * 3 + 3) / 4) * 4).cast("long")


def bmp_payload(width: Column, height: Column, seed: Column) -> Column:
    """A complete, spec-valid 24-bit uncompressed BMP built in pure
    Catalyst: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)
    + bottom-up pixel rows padded to 4-byte stride. Pixel-array byte at
    file-order position ``i`` (0-based, padding included) has value
    ``(seed + i) % 256``, so the decoded pixel (x, y, channel c — BGR
    as stored) is ``(seed + (H-1-y)*stride + x*3 + c) % 256``: a closed
    form both the decoder tests and the DuckDB oracle reproduce without
    touching bytes. Generalizes the reference's derived-column synthesis
    (SURVEY.md A10) to binary media columns."""
    w = width.cast("long")
    h = height.cast("long")
    stride = bmp_stride(width)
    n_px = h * stride
    file_size = n_px + 54
    pixels = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_px - 1),
            lambda i: F.lpad(F.hex((seed.cast("long") + i) % 256), 2, "0"),
        ),
        "",
    )
    return F.unhex(
        F.concat(
            F.lit("424D"),  # "BM"
            _le_hex(file_size, 4),
            F.lit("00000000"),  # reserved
            F.lit("36000000"),  # pixel-data offset = 54
            F.lit("28000000"),  # BITMAPINFOHEADER size = 40
            _le_hex(w, 4),
            _le_hex(h, 4),  # positive height = bottom-up rows
            F.lit("0100"),  # planes = 1
            F.lit("1800"),  # bpp = 24
            F.lit("00000000"),  # compression = BI_RGB
            _le_hex(n_px, 4),  # image size
            F.lit("00" * 16),  # x/y ppm, palette counts
            pixels,
        )
    )


def wav_payload(samples: Column, sample_rate: int = 16000) -> Column:
    """A complete RIFF/WAVE container around a binary column of
    unsigned 8-bit mono PCM samples, built in pure Catalyst: RIFF
    header + canonical 16-byte fmt chunk + data chunk. The sample bytes
    travel unmodified, so any byte-level oracle over the raw samples
    holds for the decoded container too."""
    n = F.length(samples).cast("long")
    byte_rate = sample_rate * 1 * 1  # mono, 1 byte/sample
    return F.concat(
        F.unhex(
            F.concat(
                F.lit("52494646"),  # "RIFF"
                _le_hex(n + 36, 4),
                F.lit("57415645"),  # "WAVE"
                F.lit("666D7420"),  # "fmt "
                F.lit("10000000"),  # fmt chunk size = 16
                F.lit("0100"),  # audio format = 1 (PCM)
                F.lit("0100"),  # channels = 1
                _le_hex(F.lit(sample_rate), 4),
                _le_hex(F.lit(byte_rate), 4),
                F.lit("0100"),  # block align = 1
                F.lit("0800"),  # bits per sample = 8
                F.lit("64617461"),  # "data"
                _le_hex(n, 4),
            )
        ),
        samples,
    )


def parse_image_meta(payload: Column) -> Column:
    """Parse ``struct<fmt string, width int, height int>`` from an image
    payload's header — pure Catalyst (substring + hex + conv), zero
    Python, zero codec libraries. Covers the formats whose geometry
    sits at a FIXED offset:

    - PNG: IHDR big-endian u32 pair at byte offsets 17 and 21 (1-based)
    - GIF87a/89a: logical-screen little-endian u16 pair at 7 and 9
    - BMP: BITMAPINFOHEADER little-endian i32 pair at 19 and 23

    JPEG's geometry lives in a SOF marker at a VARIABLE offset (after
    arbitrary APPn/DQT segments) — that scan is `image_meta_scan`'s
    Arrow-batched job. Unknown signatures yield fmt='unknown' with null
    dimensions."""

    def be(off: int, ln: int) -> Column:
        return F.conv(F.hex(F.substring(payload, off, ln)), 16, 10).cast("int")

    def le16(off: int) -> Column:
        return (be(off, 1) + be(off + 1, 1) * 256).cast("int")

    def le32(off: int) -> Column:
        return (
            be(off, 1)
            + be(off + 1, 1) * 256
            + be(off + 2, 1) * 65536
            + be(off + 3, 1) * 16777216
        ).cast("int")

    sig8 = F.hex(F.substring(payload, 1, 8))
    sig3 = F.hex(F.substring(payload, 1, 3))
    sig2 = F.hex(F.substring(payload, 1, 2))
    ni = F.lit(None).cast("int")
    fmt = (
        F.when(sig8 == PNG_SIG_HEX, F.lit("png"))
        .when(sig3 == "474946", F.lit("gif"))  # "GIF"
        .when(sig2 == "424D", F.lit("bmp"))  # "BM"
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(sig8 == PNG_SIG_HEX, be(17, 4))
        .when(sig3 == "474946", le16(7))
        .when(sig2 == "424D", le32(19))
        .otherwise(ni)
    )
    height = (
        F.when(sig8 == PNG_SIG_HEX, be(21, 4))
        .when(sig3 == "474946", le16(9))
        .when(sig2 == "424D", le32(23))
        .otherwise(ni)
    )
    return F.struct(fmt.alias("fmt"), width.alias("width"), height.alias("height"))


_IMG_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _header_geometry(b: bytes) -> tuple[str, int | None, int | None]:
    """Pure-Python header parse shared by image_meta_scan: JPEG SOF
    marker walk plus the fixed-offset formats, so one scan stage covers
    a mixed-format corpus."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return "png", int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
    if b[:3] == b"GIF" and len(b) >= 10:
        return "gif", int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
    if b[:2] == b"BM" and len(b) >= 26:
        return "bmp", int.from_bytes(b[18:22], "little"), int.from_bytes(b[22:26], "little")
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOF
        pos = 2
        while pos + 9 <= len(b):
            if b[pos] != 0xFF:
                break
            marker = b[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3: geometry
                return (
                    "jpeg",
                    int.from_bytes(b[pos + 7 : pos + 9], "big"),
                    int.from_bytes(b[pos + 5 : pos + 7], "big"),
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD9:
                pos += 2  # standalone marker, no length field
            else:
                pos += 2 + int.from_bytes(b[pos + 2 : pos + 4], "big")
        return "jpeg", None, None
    return "unknown", None, None


def image_meta_scan(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image-header scan for formats whose geometry sits
    at a VARIABLE offset — JPEG's SOF marker hides behind arbitrary
    APPn/COM/DQT segments, which Catalyst substring arithmetic can't
    chase. Fixed-offset formats are handled too (one stage for a mixed
    corpus), but prefer `parse_image_meta` when the corpus is known
    PNG/GIF/BMP — it stays JVM-side. Only headers are inspected: the
    cost per row is bounded by segment-walk length, not payload size."""
    import pandas as pd

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, fmts, ws, hs = [], [], [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                if payload is None:  # NULL media: no header to parse
                    continue
                fmt, w, h = _header_geometry(bytes(payload))
                ids.append(i)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"id": ids, "fmt": fmts, "width": ws, "height": hs})

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(scan, _IMG_META_SCHEMA)


def _decode_bmp_pixels(b: bytes) -> tuple[tuple[int, int, int], "object"]:
    """Decode a 24-bit uncompressed BMP: header walk (pixel offset,
    signed dimensions, bpp, compression), bottom-up row order unless
    height is negative, 4-byte stride padding stripped. Returns
    ((h, w, 3), flat float64 array in top-down row-major BGR order)."""
    import numpy as np

    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB decodes "
            "without codec libraries"
        )
    h_abs, top_down = abs(h), h < 0
    stride = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(b, dtype=np.uint8, count=h_abs * stride, offset=off)
    rows = arr.reshape(h_abs, stride)[:, : w * 3]
    if not top_down:
        rows = rows[::-1]
    return (h_abs, w, 3), rows.reshape(-1).astype(np.float64)


def _decode_wav_samples(b: bytes) -> tuple[tuple[int, int], int, "object"]:
    """Decode RIFF/WAVE PCM: chunk walk (word-aligned) to the fmt and
    data chunks; 8-bit samples centered at 0 (u8 - 128), 16-bit as
    little-endian i16. Returns ((n_per_channel, n_channels),
    sample_rate, flat float64 interleaved samples)."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = max(1, int.from_bytes(fmt[2:4], "little"))
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt == 1 and bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif audio_fmt == 1 and bits == 16:
        s = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.float64)
    elif audio_fmt in (6, 7) and bits == 8:
        # G.711 companded telephony audio: 256-entry expansion table
        # (A-law fmt 6, μ-law fmt 7), vectorized gather to 13/14-bit
        # linear PCM — the classic logarithmic codec, no library needed
        table = _g711_table("a" if audio_fmt == 6 else "u")
        s = table[np.frombuffer(data, dtype=np.uint8)].astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format={audio_fmt} bits={bits}: only integer PCM and "
            "G.711 A-law/mu-law decode without codec libraries"
        )
    n = s.size // n_ch
    return (n, n_ch), rate, s[: n * n_ch]


_G711_TABLES: dict = {}


def _g711_table(law: str):
    """Lazily-built G.711 expansion tables from the spec formulas.

    μ-law ("u"): complement the byte, then linear =
    ((8m + 0x84) << e) - 0x84 with the sign bit selecting the negative
    branch (14-bit range). A-law ("a"): XOR 0x55, segment 0 is linear,
    higher segments shift — 13-bit range; sign bit SET is positive."""
    import numpy as np

    if law not in _G711_TABLES:
        ulaw = np.zeros(256, dtype=np.int64)
        for b in range(256):
            c = ~b & 0xFF
            t = (((c & 0x0F) << 3) + 0x84) << ((c >> 4) & 0x07)
            ulaw[b] = (0x84 - t) if (c & 0x80) else (t - 0x84)
        alaw = np.zeros(256, dtype=np.int64)
        for b in range(256):
            a = b ^ 0x55
            t = (a & 0x0F) << 4
            seg = (a >> 4) & 0x07
            if seg == 0:
                t += 8
            else:
                t = (t + 0x108) << (seg - 1)
            alaw[b] = t if (a & 0x80) else -t
        _G711_TABLES["u"] = ulaw
        _G711_TABLES["a"] = alaw
    return _G711_TABLES[law]


# --- baseline JPEG codec (pure numpy — no codec library) -------------------
#
# ITU-T T.81 baseline sequential DCT, the subset every JFIF file uses:
# segment walk, DHT canonical Huffman tables, DC prediction + magnitude
# categories, AC run/size with EOB/ZRL, FF00 byte unstuffing, dequant,
# dezigzag, orthonormal 8x8 IDCT. Decodes grayscale and 3-component
# YCbCr in baseline (SOF0), 12-bit (SOF1) and progressive (SOF2)
# modes, with chroma subsampling up to 2x2 and restart intervals — in
# ANY combination (one A.2-geometry scan walk covers them all);
# lossless/arithmetic/hierarchical SOFs raise NotImplementedError with
# the exact feature named. The matching encoder emits spec-valid
# grayscale baseline JPEG (standard Annex K Huffman tables, caller's
# quant table) so decode paths are value-checkable end-to-end: with an
# all-ones quant table, block-constant images round-trip EXACTLY
# (DC = 8*(v-128) is integral; AC quantize to 0), giving a closed-form
# oracle for the full entropy-coded pipeline.

#: Zigzag scan order: position k in the scan -> natural row-major index.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K "typical" luminance tables: (counts per code length 1..16, symbols).
_JPEG_STD_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_STD_DC_VALS = tuple(range(12))
_JPEG_STD_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_STD_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _huff_canonical(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): for each length 1..16,
    codes increase by one; doubling when the length grows. Returns
    {(length, code): symbol}."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _dct8_matrix():
    """Orthonormal 8-point DCT-II matrix A: coeff = A @ px @ A.T,
    px = A.T @ coeff @ A."""
    import numpy as np

    n = np.arange(8)
    a = np.cos((2 * n + 1) * n.reshape(-1, 1) * np.pi / 16) * np.sqrt(0.25)
    a[0] *= np.sqrt(0.5)
    return a


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    unstuffing done up front."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bits(self, count: int) -> int:
        while self.n < count:
            if self.pos >= len(self.data):
                # A well-formed scan ends with every block decoded before
                # the buffered bits run out (the final byte's alignment
                # padding is already in self.buf); needing MORE bytes means
                # the entropy stream was truncated — fail loudly like every
                # other malformed-input path instead of decoding garbage.
                raise ValueError("truncated JPEG entropy stream")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= count
        out = (self.buf >> self.n) & ((1 << count) - 1)
        self.buf &= (1 << self.n) - 1
        return out

    def huff(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_ac_first(reader, tab, blk, ss, se, al, state) -> None:
    """Progressive AC first scan for one block (T.81 G.2.2 /
    libjpeg-structure): run-length coded band [ss, se] with EOBn runs;
    decoded values enter at magnitude << al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = reader.huff(tab)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(s), s) << al
            k += 1
        elif r != 15:  # EOBn: run of (1<<r)+bits(r) blocks incl. this
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.bits(r)
            return
        else:  # ZRL
            k += 16


def _jpeg_ac_refine(reader, tab, blk, ss, se, al, state) -> None:
    """Progressive AC refinement for one block: newly-visible ±1<<al
    coefficients plus one correction bit per already-nonzero
    coefficient traversed — including through EOB runs."""
    p1, m1 = 1 << al, -1 << al

    def correct(z: int) -> None:
        if reader.bits(1) and (blk[z] & p1) == 0:
            blk[z] += p1 if blk[z] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = reader.huff(tab)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s:  # s is 1 by spec: a coefficient becomes visible
                newval = p1 if reader.bits(1) else m1
            elif r != 15:
                state["eobrun"] = 1 << r
                if r:
                    state["eobrun"] += reader.bits(r)
                break
            # advance over r zero-history slots, correcting nonzero ones
            while k <= se:
                z = _JPEG_ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                blk[_JPEG_ZIGZAG[k]] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = _JPEG_ZIGZAG[k]
            if blk[z] != 0:
                correct(z)
            k += 1
        state["eobrun"] -= 1


def _jpeg_seq_block(reader, tabs, dct, act, blk, pred: int) -> int:
    """Sequential (full-band) decode of one 8x8 block: DC diff + AC
    run-length symbols into natural-order ``blk``. Returns the new DC
    predictor."""
    t = reader.huff(tabs[(0, dct)])
    pred += _jpeg_extend(reader.bits(t), t)
    blk[0] = pred
    k = 1
    while k < 64:
        sym = reader.huff(tabs[(1, act)])
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL: 16 zeros
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(size), size)
        k += 1
    return pred


def _jpeg_apply_scan(coef, sc: dict, samp: dict, grids, comp_dims: dict,
                     idx_of: dict, mcx: int, mcy: int) -> None:
    """Apply one scan (sequential full-band, progressive DC, or
    progressive AC — first or refinement) onto the per-component
    coefficient stores, with REAL T.81 A.2 geometry so every sampling
    x mode combination shares one walk:

    - an INTERLEAVED scan (>1 component) visits MCUs in raster order,
      each carrying h_i x v_i data units per component written into
      that component's MCU-padded grid; restart intervals count MCUs.
    - a NON-interleaved scan (single component — every progressive AC
      scan by spec, and legal for DC/sequential too) visits that
      component's OWN ceil(w_i/8) x ceil(h_i/8) block raster (NOT the
      padded grid — T.81 A.2.2), remapped into the padded store;
      restart intervals count data units.

    With 1x1 sampling both geometries degenerate to the plain block
    grid, which is why baseline, progressive, subsampled and
    progressive+subsampled all decode through this one function.
    Restart segments reset predictor, EOB run and bit alignment."""
    comps, ss, se = sc["comps"], sc["ss"], sc["se"]
    ah, al, ri, tabs = sc["ah"], sc["al"], sc["ri"], sc["tabs"]
    segments = sc["segments"]
    seg_i = 0
    reader = _JpegBitReader(segments[0])
    pred = [0] * len(comps)
    state = {"eobrun": 0}
    interleaved = len(comps) > 1
    if interleaved:
        nunits = mcx * mcy
    else:
        bw_c, bh_c = comp_dims[comps[0][0]]
        nunits = bw_c * bh_c

    def apply_unit(blk, ci: int, dct: int, act: int) -> None:
        if ss == 0 and se == 63:  # sequential: DC+AC full band
            pred[ci] = _jpeg_seq_block(
                reader, tabs, dct, act, blk, pred[ci]
            )
        elif ss == 0:  # progressive DC scan (first or refinement)
            if ah == 0:
                t = reader.huff(tabs[(0, dct)])
                pred[ci] += _jpeg_extend(reader.bits(t), t)
                blk[0] = pred[ci] << al
            elif reader.bits(1):
                blk[0] |= 1 << al
        else:  # progressive AC (single-component by spec)
            if ah == 0:
                _jpeg_ac_first(reader, tabs[(1, act)], blk, ss, se, al, state)
            else:
                _jpeg_ac_refine(reader, tabs[(1, act)], blk, ss, se, al, state)

    if interleaved and ss != 0:
        raise ValueError("interleaved progressive AC scan is not valid T.81")
    for m in range(nunits):
        if ri and m and m % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _JpegBitReader(segments[seg_i])
            pred = [0] * len(comps)
            state["eobrun"] = 0
        if interleaved:
            mx, my = m % mcx, m // mcx
            for ci, (cid, dct, act) in enumerate(comps):
                hh, vv = samp[cid]
                cols = grids[idx_of[cid]][1]
                for by in range(vv):
                    for bx in range(hh):
                        bi = (my * vv + by) * cols + (mx * hh + bx)
                        apply_unit(coef[idx_of[cid]][bi], ci, dct, act)
        else:
            cid, dct, act = comps[0]
            cols = grids[idx_of[cid]][1]
            r, c = divmod(m, bw_c)
            apply_unit(coef[idx_of[cid]][r * cols + c], 0, dct, act)


def _decode_jpeg_pixels(b: bytes) -> tuple[tuple[int, int, int], "object"]:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG to
    ((h, w, ncomp), flat float64 pixels in top-down row-major order;
    3-component output converted YCbCr→RGB). Progressive scans apply
    T.81 G.2's spectral-selection + successive-approximation
    procedures (DC first/refine, AC first/refine with EOB runs) onto a
    shared coefficient store; restart intervals (DRI/RSTn) reset the
    entropy state per segment in both modes; chroma subsampling
    composes with either mode (interleaved scans walk MCUs,
    non-interleaved scans walk the component's own block raster).
    Raises NotImplementedError only for the features genuinely out of
    scope (lossless/arithmetic/hierarchical SOFs, >2x sampling)."""
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    quant: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, qid)])
    scans: list[dict] = []
    ri = 0  # restart interval in MCUs; 0 = none
    lossless = False  # SOF3 (r13): predictive, no DCT
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG segment desync")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
        body = b[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                width = 2 if prec else 1  # 16-bit entries when Pq=1
                tbl = np.zeros(64)
                for k in range(64):
                    off = i + 1 + k * width
                    tbl[_JPEG_ZIGZAG[k]] = int.from_bytes(
                        body[off : off + width], "big"
                    )
                quant[tid] = tbl.reshape(8, 8)
                i += 1 + 64 * width
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + nvals])
                huff[(cls, tid)] = _huff_canonical(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # +SOF3 lossless (r13)
            if marker == 0xC3:
                lossless = True
                if not 2 <= body[0] <= 16:
                    raise ValueError(
                        f"{body[0]}-bit precision is not spec-valid "
                        "for lossless JPEG (2-16)"
                    )
            elif body[0] not in (8, 12):
                raise NotImplementedError(
                    f"{body[0]}-bit JPEG sample precision"
                )
            precision = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            comps = []
            samp = {}
            for c in range(body[5]):
                cid, hv, qid = body[6 + 3 * c : 9 + 3 * c]
                hh, vv = hv >> 4, hv & 0x0F
                if marker == 0xC3 and (hh, vv) != (1, 1):
                    raise NotImplementedError(
                        "subsampled lossless JPEG (sampling is "
                        "spec-legal but no archival corpus we model "
                        "emits it)"
                    )
                if hh not in (1, 2) or vv not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hh}x{vv} (1x1/2x1/1x2/"
                        "2x2 supported)"
                    )
                samp[cid] = (hh, vv)
                comps.append((cid, qid))
            if len(comps) not in (1, 3):
                raise NotImplementedError(f"{len(comps)}-component JPEG")
            frame = (h, w, comps, samp, precision)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical JPEG (SOF5+)"
            )
        elif marker == 0xDD:
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — one scan's entropy data follows
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            # unstuff FF00 → FF; split at RSTn; stop at any other marker
            segments: list[bytes] = []
            cur = bytearray()
            j = pos
            while j < len(b):
                if b[j] == 0xFF:
                    nxt = b[j + 1] if j + 1 < len(b) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytes(cur))
                        cur = bytearray()
                        j += 2
                        continue
                    break
                cur.append(b[j])
                j += 1
            segments.append(bytes(cur))
            pos = j
            scans.append({
                "comps": scan_comps, "ss": ss, "se": se, "ah": ah,
                "al": al, "segments": segments, "ri": ri,
                # snapshot: DHT may legally redefine tables between scans
                "tabs": dict(huff),
            })
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    if lossless:
        return _decode_jpeg_lossless(frame, scans)
    h, w, comps, samp, precision = frame
    shift = float(1 << (precision - 1))  # level shift: 128 / 2048
    maxv = (1 << precision) - 1
    a_mat = _dct8_matrix()
    idx_of = {cid: i for i, (cid, _qid) in enumerate(comps)}

    def idct_planes(coef, grids):
        """grids: per comp (rows, cols) of 8x8 blocks in raster order →
        dequantized, IDCT'd sample planes (one vectorized einsum per
        component)."""
        out = []
        for ci, (_cid, qid) in enumerate(comps):
            rows, cols = grids[ci]
            blocks = (
                coef[ci] * quant[qid].reshape(-1)
            ).reshape(rows * cols, 8, 8)
            px = np.einsum("ij,njk,kl->nil", a_mat.T, blocks, a_mat) + shift
            out.append(
                px.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3)
                .reshape(rows * 8, cols * 8)
            )
        return out

    # one geometry for every mode combination: per-component
    # MCU-padded coefficient stores (1x1 ⇒ the plain block grid);
    # baseline fills them in one scan, progressive accumulates across
    # scans — including progressive + subsampled, whose interleaved DC
    # scans walk MCUs while its AC scans walk each component's own
    # ceil-dims raster
    hmax = max(hh for hh, _vv in samp.values())
    vmax = max(vv for _hh, vv in samp.values())
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    comp_dims = {}
    for cid, _qid in comps:
        hh, vv = samp[cid]
        grids.append((mcy * vv, mcx * hh))
        w_i = -(-(w * hh) // hmax)  # ceil: component resolution
        h_i = -(-(h * vv) // vmax)
        comp_dims[cid] = (-(-w_i // 8), -(-h_i // 8))
    coef = [
        np.zeros((rows * cols, 64), dtype=np.int64) for rows, cols in grids
    ]
    for sc in scans:
        _jpeg_apply_scan(coef, sc, samp, grids, comp_dims, idx_of, mcx, mcy)
    planes = []
    for (cid, _qid), plane in zip(comps, idct_planes(coef, grids)):
        hh, vv = samp[cid]
        if (hh, vv) != (hmax, vmax):
            # nearest-neighbor replication (box reconstruction)
            plane = np.repeat(
                np.repeat(plane, vmax // vv, axis=0), hmax // hh, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, maxv)
        return (h, w, 1), out.reshape(-1)
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - shift),
            y - 0.344136 * (cb - shift) - 0.714136 * (cr - shift),
            y + 1.772 * (cb - shift),
        ],
        axis=-1,
    )
    return (h, w, 3), np.clip(np.round(rgb), 0, maxv).reshape(-1)


class _JpegBitWriter:
    """MSB-first bit writer with FF00 stuffing and 1-fill alignment."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def bits(self, value: int, count: int) -> None:
        self.buf = (self.buf << count) | (value & ((1 << count) - 1))
        self.n += count
        while self.n >= 8:
            self.n -= 8
            byte = (self.buf >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.buf &= (1 << self.n) - 1

    def finish(self) -> bytes:
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.out)


def _decode_jpeg_lossless(frame, scans):
    """T.81 Annex H lossless (SOF3, process 14) reconstruction —
    r13: the lossless guard is retired for the 1x1-sampled,
    single-scan shape archival corpora actually emit. DC-class
    Huffman categories 0-16 (16 = no appended bits, DIFF ≡ 32768),
    the seven spec predictors with the Annex H.1.2 boundary rules
    (first sample 2^(P-Pt-1); first row uses the left neighbor,
    first column the one above), modulo-2^16 reconstruction, and the
    point transform's final <<Pt. Interleaved multi-component MCUs
    (one sample per component at 1x1) decode with independent
    per-component prediction state. Output samples are RAW (no level
    shift, no clipping — the decode IS exact)."""
    import numpy as np

    h, w, comps, _samp, precision = frame
    if len(scans) != 1:
        raise NotImplementedError("multi-scan lossless JPEG")
    sc = scans[0]
    if sc["ri"] or len(sc["segments"]) != 1:
        raise NotImplementedError(
            "lossless JPEG with restart intervals"
        )
    pred_sel, pt = sc["ss"], sc["al"]
    if not 1 <= pred_sel <= 7:
        raise ValueError(f"invalid lossless predictor {pred_sel}")
    order = []  # scan order, mapped onto frame component planes
    frame_idx = {cid: i for i, (cid, _qid) in enumerate(comps)}
    for cid, td, _ta in sc["comps"]:
        order.append((frame_idx[cid], sc["tabs"][(0, td)]))
    reader = _JpegBitReader(sc["segments"][0])
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    default = 1 << (precision - pt - 1)
    for r in range(h):
        for c in range(w):
            for ci, tab in order:
                s = reader.huff(tab)
                if s == 16:
                    diff = 32768
                elif s:
                    diff = _jpeg_extend(reader.bits(s), s)
                else:
                    diff = 0
                p_ = planes[ci]
                if r == 0 and c == 0:
                    pred = default
                elif r == 0:
                    pred = int(p_[0, c - 1])
                elif c == 0:
                    pred = int(p_[r - 1, 0])
                else:
                    a = int(p_[r, c - 1])
                    bb = int(p_[r - 1, c])
                    cc = int(p_[r - 1, c - 1])
                    pred = (
                        a, bb, cc, a + bb - cc,
                        a + ((bb - cc) >> 1), bb + ((a - cc) >> 1),
                        (a + bb) >> 1,
                    )[pred_sel - 1]
                p_[r, c] = (pred + diff) & 0xFFFF
    out = np.stack(
        [pl << pt for pl in planes], axis=-1
    ).astype(np.float64)
    return (h, w, len(comps)), out.reshape(-1)


def _encode_jpeg_lossless(
    px, predictor: int = 1, precision: int = 8, point_transform: int = 0
) -> bytes:
    """Spec-valid single-component SOF3 lossless JPEG (the encode twin
    of _decode_jpeg_lossless): one full-coverage DC-class Huffman
    table (categories 0-16 at a single code length), the selected
    predictor in the SOS Ss field, the point transform in Al, DIFFs
    reduced mod 2^16 into [-32768, 32767] with the category-16
    no-appended-bits special case. Round trip is EXACT by
    construction — that is the point of the process."""
    import numpy as np

    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1-7, got {predictor}")
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2-16, got {precision}")
    px = np.asarray(px, dtype=np.int64)
    if point_transform:
        px = px >> point_transform
    h, w = px.shape
    dc_bits = (0, 0, 0, 0, 0, 17) + (0,) * 10
    dc_vals = tuple(range(17))
    enc = {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(
            dc_bits, dc_vals
        ).items()
    }
    head = b"\xff\xd8"
    head += _jpeg_seg(
        0xC3,
        bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + b"\x01\x11\x00",
    )
    head += _jpeg_seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))
    head += _jpeg_seg(
        0xDA, b"\x01\x01\x00" + bytes([predictor, 0, point_transform])
    )
    wtr = _JpegBitWriter()
    default = 1 << (precision - point_transform - 1)
    for r in range(h):
        for c in range(w):
            if r == 0 and c == 0:
                pred = default
            elif r == 0:
                pred = int(px[0, c - 1])
            elif c == 0:
                pred = int(px[r - 1, 0])
            else:
                a = int(px[r, c - 1])
                bb = int(px[r - 1, c])
                cc = int(px[r - 1, c - 1])
                pred = (
                    a, bb, cc, a + bb - cc,
                    a + ((bb - cc) >> 1), bb + ((a - cc) >> 1),
                    (a + bb) >> 1,
                )[predictor - 1]
            diff = ((int(px[r, c]) - pred + 32768) & 0xFFFF) - 32768
            if diff == -32768:
                code, length = enc[16]
                wtr.bits(code, length)
                continue
            s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
            code, length = enc[s]
            wtr.bits(code, length)
            if s:
                wtr.bits(
                    diff if diff >= 0 else diff + (1 << s) - 1, s
                )
    return head + bytes(wtr.finish()) + b"\xff\xd9"


def jpeg_lossless_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
) -> DataFrame:
    """Arrow-batched lossless-JPEG writer over (id, w, h, seed) rows:
    pixel p (raster order) = (seed + 7p) mod 2^P with P = 8 for even
    ids and 12 for odd (archival/medical bit depths), predictor
    1 + id%7 — every spec predictor exercised across a corpus. No
    8-multiple dimension requirement (lossless has no block grid)."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                i, w, h, seed = int(i), int(w), int(h), int(seed)
                prec = 8 + 4 * (i % 2)
                px = (
                    (seed + 7 * np.arange(w * h, dtype=np.int64))
                    % (1 << prec)
                ).reshape(h, w)
                ids.append(i)
                payloads.append(
                    _encode_jpeg_lossless(
                        px, predictor=1 + i % 7, precision=prec
                    )
                )
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


def _jpeg_enc_tables():
    """Annex K tables as sym → (code, length) for the encoders."""
    enc_dc = {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(
            _JPEG_STD_DC_BITS, _JPEG_STD_DC_VALS
        ).items()
    }
    enc_ac = {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(
            _JPEG_STD_AC_BITS, _JPEG_STD_AC_VALS
        ).items()
    }
    return enc_dc, enc_ac


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _jpeg_quantized_blocks(px, q, shift: float = 128.0):
    """Raster-order (nb, 64) zigzag-ordered quantized coefficients for
    a grayscale image (the shared front half of both encoders)."""
    import numpy as np

    a_mat = _dct8_matrix()
    h, w = px.shape
    zz = []
    for by in range(h // 8):
        for bx in range(w // 8):
            block = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - shift
            coeff = np.round((a_mat @ block @ a_mat.T) / q).astype(np.int64)
            zz.append(coeff.reshape(-1)[list(_JPEG_ZIGZAG)])
    return zz


def _jpeg_gray_headers(h: int, w: int, q, sof_marker: int,
                       precision: int = 8) -> bytes:
    import numpy as np  # noqa: F401  (q is an ndarray)

    head = b"\xff\xd8"  # SOI
    zz_q = bytes(int(q.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    head += _jpeg_seg(0xDB, b"\x00" + zz_q)
    head += _jpeg_seg(
        sof_marker,
        bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + b"\x01\x11\x00",
    )
    head += _jpeg_seg(
        0xC4, b"\x00" + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS)
    )
    head += _jpeg_seg(
        0xC4, b"\x10" + bytes(_JPEG_STD_AC_BITS) + bytes(_JPEG_STD_AC_VALS)
    )
    return head


def _encode_jpeg_gray(px, quant=None, restart_interval: int = 0,
                      precision: int = 8) -> bytes:
    """Encode a (h, w) uint8 array (h, w multiples of 8) as spec-valid
    grayscale baseline JPEG: forward orthonormal DCT, caller's quant
    table (default all-ones — lossless for block-constant images),
    zigzag, DC prediction, Annex K Huffman tables, FF stuffing, and
    (with ``restart_interval`` > 0) DRI + RSTn markers every that many
    MCUs with predictor reset and byte alignment. The stdlib-free twin
    of ``_decode_jpeg_pixels`` used to synthesize deterministic
    payloads for end-to-end decode checks."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires dimensions that are multiples of 8")
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    enc_dc, enc_ac = _jpeg_enc_tables()
    tsel = b"\x00"
    if precision == 12:
        # 12-bit (SOF1 extended sequential): DC diffs reach size 15 and
        # AC magnitudes size 14 — beyond the Annex K 8-bit tables, so
        # ship full-coverage tables as id 1 (the same construction the
        # progressive encoder uses). q[0,0] >= 2 keeps the DC diff
        # range within size 15 (size-16 needs the appended-bits-free
        # special case this test encoder doesn't implement).
        if q[0, 0] < 2:
            raise ValueError("12-bit encoder requires quant[0,0] >= 2")
        dc_bits = (0, 0, 0, 0, 16) + (0,) * 11
        dc_vals = tuple(range(16))
        ac_bits = (0,) * 8 + (255, 1) + (0,) * 6
        ac_vals = tuple(range(255)) + (255,)
        enc_dc = {
            sym: (code, length)
            for (length, code), sym in _huff_canonical(
                dc_bits, dc_vals
            ).items()
        }
        enc_ac = {
            sym: (code, length)
            for (length, code), sym in _huff_canonical(
                ac_bits, ac_vals
            ).items()
        }
        tsel = b"\x11"
    elif precision != 8:
        raise ValueError(f"precision {precision}")
    head = _jpeg_gray_headers(
        h, w, q, 0xC1 if precision == 12 else 0xC0, precision
    )
    if precision == 12:
        head += _jpeg_seg(0xC4, b"\x01" + bytes(dc_bits) + bytes(dc_vals))
        head += _jpeg_seg(0xC4, b"\x11" + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        head += _jpeg_seg(0xDD, restart_interval.to_bytes(2, "big"))
    head += _jpeg_seg(0xDA, b"\x01" + b"\x01" + tsel + b"\x00\x3f\x00")

    body = bytearray()
    wtr = _JpegBitWriter()
    pred = 0

    def put(table, sym: int, extra: int, t: int) -> None:
        code, length = table[sym]
        wtr.bits(code, length)
        if t:
            wtr.bits(extra if extra >= 0 else extra + (1 << t) - 1, t)

    for m, zz in enumerate(
        _jpeg_quantized_blocks(px, q, float(1 << (precision - 1)))
    ):
        if restart_interval and m and m % restart_interval == 0:
            body += wtr.finish()
            body += bytes([0xFF, 0xD0 + (m // restart_interval - 1) % 8])
            wtr = _JpegBitWriter()
            pred = 0
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = int(abs(diff)).bit_length()
        put(enc_dc, t, diff, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                put(enc_ac, 0xF0, 0, 0)
                run -= 16
            s = abs(v).bit_length()
            put(enc_ac, (run << 4) | s, v, s)
            run = 0
        if run:
            put(enc_ac, 0x00, 0, 0)  # EOB
    return head + bytes(body) + wtr.finish() + b"\xff\xd9"  # EOI


def _encode_jpeg_420(y, cb, cr, quant=None, samp=(2, 2)) -> bytes:
    """Encode YCbCr subsampled baseline JPEG (Y sampled ``samp`` =
    (hh, vv), chroma 1x1; default 2x2 = 4:2:0, (2, 1) = 4:2:2,
    (1, 2) = 4:4:0; h, w multiples of 8*vv / 8*hh): real MCU
    interleaving — hh*vv Y blocks then one Cb and one Cr per MCU,
    per-component DC prediction, shared all-ones default quant.
    Test-vector twin of the subsampled decode path."""
    import numpy as np

    hh, vv = samp
    y = np.asarray(y, dtype=np.float64)
    cb = np.asarray(cb, dtype=np.float64)
    cr = np.asarray(cr, dtype=np.float64)
    h, w = y.shape
    if h % (8 * vv) or w % (8 * hh):
        raise ValueError(
            f"{samp} encoder requires h % {8 * vv} == 0, w % {8 * hh} == 0"
        )
    if cb.shape != (h // vv, w // hh) or cr.shape != (h // vv, w // hh):
        raise ValueError("chroma planes must be 1/vv x 1/hh resolution")
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    enc_dc, enc_ac = _jpeg_enc_tables()
    a_mat = _dct8_matrix()

    head = b"\xff\xd8"
    zz_q = bytes(int(q.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    head += _jpeg_seg(0xDB, b"\x00" + zz_q)
    head += _jpeg_seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + bytes([1, (hh << 4) | vv, 0])
        + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    head += _jpeg_seg(
        0xC4, b"\x00" + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS)
    )
    head += _jpeg_seg(
        0xC4, b"\x10" + bytes(_JPEG_STD_AC_BITS) + bytes(_JPEG_STD_AC_VALS)
    )
    head += _jpeg_seg(
        0xDA, b"\x03" + b"\x01\x00" + b"\x02\x00" + b"\x03\x00"
        + b"\x00\x3f\x00"
    )

    wtr = _JpegBitWriter()

    def put(table, sym: int, extra: int, t: int) -> None:
        code, length = table[sym]
        wtr.bits(code, length)
        if t:
            wtr.bits(extra if extra >= 0 else extra + (1 << t) - 1, t)

    def enc_block(plane, r0: int, c0: int, pred: int) -> int:
        block = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
        coeff = np.round((a_mat @ block @ a_mat.T) / q).astype(np.int64)
        zz = coeff.reshape(-1)[list(_JPEG_ZIGZAG)]
        diff = int(zz[0]) - pred
        t = int(abs(diff)).bit_length()
        put(enc_dc, t, diff, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                put(enc_ac, 0xF0, 0, 0)
                run -= 16
            s = abs(v).bit_length()
            put(enc_ac, (run << 4) | s, v, s)
            run = 0
        if run:
            put(enc_ac, 0x00, 0, 0)
        return int(zz[0])

    preds = [0, 0, 0]
    for my in range(h // (8 * vv)):
        for mx in range(w // (8 * hh)):
            for by in range(vv):
                for bx in range(hh):
                    preds[0] = enc_block(
                        y, (my * vv + by) * 8, (mx * hh + bx) * 8,
                        preds[0],
                    )
            preds[1] = enc_block(cb, my * 8, mx * 8, preds[1])
            preds[2] = enc_block(cr, my * 8, mx * 8, preds[2])
    return head + wtr.finish() + b"\xff\xd9"


def _encode_jpeg_gray_progressive(px, quant=None) -> bytes:
    """Encode a (h, w) uint8 array as spec-valid grayscale PROGRESSIVE
    JPEG (SOF2) with a six-scan script exercising every G.2 decode
    path: DC first at Al=1, AC first over bands [1,5] and [6,63] at
    Al=1 (with EOBn run accumulation across blocks), then DC
    refinement and AC refinement of both bands down to Al=0 —
    successive approximation restores the coefficients EXACTLY, so the
    decode must be bit-identical to the baseline decode of the same
    pixels. Test-vector twin of the progressive half of
    ``_decode_jpeg_pixels``."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires dimensions that are multiples of 8")
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    enc_dc, _ = _jpeg_enc_tables()
    # the Annex K baseline AC table has no EOBn (r<<4, s=0) symbols —
    # progressive scans ship their own DHT covering all 256 symbols
    # (255 at length 9, 0xFF at length 10; the all-ones code stays
    # reserved as T.81 C.2 requires), registered as AC table 1
    prog_bits = (0,) * 8 + (255, 1) + (0,) * 6
    prog_vals = tuple(range(255)) + (255,)
    enc_ac = {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(
            prog_bits, prog_vals
        ).items()
    }
    blocks = _jpeg_quantized_blocks(px, q)
    out = bytearray(_jpeg_gray_headers(h, w, q, 0xC2))
    out += _jpeg_seg(0xC4, b"\x11" + bytes(prog_bits) + bytes(prog_vals))

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        # DC scans use std DC table 0; AC scans the progressive AC
        # table 1 (Td<<4 | Ta in the component spec byte)
        tsel = b"\x00" if se == 0 else b"\x01"
        return _jpeg_seg(
            0xDA,
            b"\x01" + b"\x01" + tsel
            + bytes([ss, se, (ah << 4) | al]),
        )

    def put(wtr, table, sym: int, extra: int, t: int) -> None:
        code, length = table[sym]
        wtr.bits(code, length)
        if t:
            wtr.bits(extra if extra >= 0 else extra + (1 << t) - 1, t)

    def flush_eobrun(wtr, pend) -> None:
        n = pend["eobrun"]
        if n == 0:
            return
        r = n.bit_length() - 1
        put(wtr, enc_ac, r << 4, 0, 0)
        if r:
            wtr.bits(n - (1 << r), r)
        for bit in pend["bits"]:
            wtr.bits(bit, 1)
        pend["eobrun"] = 0
        pend["bits"] = []

    # scan 1: DC first, Al=1 (arithmetic shift keeps diff coding exact
    # under refinement: (x>>1<<1)|(x&1) == x in two's complement)
    out += sos(0, 0, 0, 1)
    wtr = _JpegBitWriter()
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> 1
        diff = v - pred
        pred = v
        t = int(abs(diff)).bit_length()
        put(wtr, enc_dc, t, diff, t)
    out += wtr.finish()

    # scans 2-3: AC first per spectral band, Al=1, EOBn accumulation
    for lo, hi in ((1, 5), (6, 63)):
        out += sos(lo, hi, 0, 1)
        wtr = _JpegBitWriter()
        pend = {"eobrun": 0, "bits": []}
        for zz in blocks:
            vals = []
            for k in range(lo, hi + 1):
                v = int(zz[k])
                vals.append((abs(v) >> 1) * (1 if v >= 0 else -1))
            if not any(vals):
                pend["eobrun"] += 1
                if pend["eobrun"] == 0x7FFF:
                    flush_eobrun(wtr, pend)
                continue
            flush_eobrun(wtr, pend)
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals):
                if i > last_nz:
                    pend["eobrun"] += 1  # trailing zeros end this block
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put(wtr, enc_ac, 0xF0, 0, 0)
                    run -= 16
                s = abs(v).bit_length()
                put(wtr, enc_ac, (run << 4) | s, v, s)
                run = 0
            else:
                pass  # band ended exactly on a nonzero: no EOB needed
        flush_eobrun(wtr, pend)
        out += wtr.finish()

    # scan 4: DC refinement Ah=1 → Al=0 (one raw bit per block)
    out += sos(0, 0, 1, 0)
    wtr = _JpegBitWriter()
    for zz in blocks:
        wtr.bits(int(zz[0]) & 1, 1)
    out += wtr.finish()

    # scans 5-6: AC refinement per band, Ah=1 → Al=0
    for lo, hi in ((1, 5), (6, 63)):
        out += sos(lo, hi, 1, 0)
        wtr = _JpegBitWriter()
        pend = {"eobrun": 0, "bits": []}
        for zz in blocks:
            vals = [int(zz[k]) for k in range(lo, hi + 1)]
            ab = [abs(v) for v in vals]
            eob_idx = -1
            for i, a in enumerate(ab):
                if a == 1:  # newly visible at this precision
                    eob_idx = i
            run = 0
            bits_buf: list[int] = []
            for i, v in enumerate(vals):
                a = ab[i]
                if a == 0:
                    run += 1
                    continue
                while run > 15 and i <= eob_idx:
                    flush_eobrun(wtr, pend)
                    put(wtr, enc_ac, 0xF0, 0, 0)
                    for bit in bits_buf:
                        wtr.bits(bit, 1)
                    bits_buf = []
                    run -= 16
                if a > 1:  # already visible: one correction bit
                    bits_buf.append(a & 1)
                    continue
                flush_eobrun(wtr, pend)
                put(wtr, enc_ac, (run << 4) | 1, 0, 0)
                wtr.bits(1 if v > 0 else 0, 1)
                for bit in bits_buf:
                    wtr.bits(bit, 1)
                bits_buf = []
                run = 0
            if run > 0 or bits_buf:
                pend["eobrun"] += 1
                pend["bits"].extend(bits_buf)
                if pend["eobrun"] == 0x7FFF:
                    flush_eobrun(wtr, pend)
        flush_eobrun(wtr, pend)
        out += wtr.finish()

    return bytes(out) + b"\xff\xd9"  # EOI


def _encode_jpeg_420_progressive(y, cb, cr, quant=None,
                                 samp=(2, 2)) -> bytes:
    """Encode YCbCr 4:2:0 PROGRESSIVE (SOF2) JPEG — the combined
    geometry the r7 guard blocked: scan 1 is the interleaved DC-first
    scan in MCU order (four Y DC diffs then Cb, Cr per MCU, Al=0);
    scans 2-4 are per-component AC-first scans over the FULL band
    [1,63] at Al=0, each walking that component's OWN ceil-dims block
    raster (T.81 A.2.2) with EOBn run accumulation. Spectral selection
    only (no successive approximation), so coefficients are restored
    exactly and the decode must equal the baseline decode of the same
    planes. ``samp`` = Y's (hh, vv): 2x2 = 4:2:0 (default), (2, 1) =
    4:2:2, (1, 2) = 4:4:0. Accepts any h, w multiples of 8 (chroma
    planes at ceil-1/vv x ceil-1/hh resolution): when h or w is not a
    multiple of the MCU span the padded MCU grid is LARGER than the AC
    scans' ceil-dims rasters, exercising the decoder's non-interleaved
    index remap for real."""
    import numpy as np

    hh, vv = samp
    y = np.asarray(y, dtype=np.float64)
    cb = np.asarray(cb, dtype=np.float64)
    cr = np.asarray(cr, dtype=np.float64)
    h, w = y.shape
    if h % 8 or w % 8:
        raise ValueError("progressive subsampled encoder needs 8-multiples")
    h2, w2 = -(-h // vv), -(-w // hh)
    if cb.shape != (h2, w2) or cr.shape != (h2, w2):
        raise ValueError("chroma planes must be ceil-1/vv x 1/hh resolution")
    q = np.ones((8, 8)) if quant is None else np.asarray(
        quant, dtype=np.float64
    )
    mcx, mcy = -(-w // (8 * hh)), -(-h // (8 * vv))

    def pad_to(plane, rows, cols):
        ph, pw = plane.shape
        return np.pad(plane, ((0, rows - ph), (0, cols - pw)), "edge")

    # padded block stores (the decoder's grids); ceil-dims per comp
    yp = pad_to(y, mcy * 8 * vv, mcx * 8 * hh)
    cbp = pad_to(cb, mcy * 8, mcx * 8)
    crp = pad_to(cr, mcy * 8, mcx * 8)
    blk_store = [
        _jpeg_quantized_blocks(p, q) for p in (yp, cbp, crp)
    ]
    grid_cols = [mcx * hh, mcx, mcx]
    ceil_dims = [
        (-(-w // 8), -(-h // 8)), (-(-w2 // 8), -(-h2 // 8)),
        (-(-w2 // 8), -(-h2 // 8)),
    ]
    enc_dc, _ = _jpeg_enc_tables()
    prog_bits = (0,) * 8 + (255, 1) + (0,) * 6
    prog_vals = tuple(range(255)) + (255,)
    enc_ac = {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(
            prog_bits, prog_vals
        ).items()
    }

    head = b"\xff\xd8"
    zz_q = bytes(int(q.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    head += _jpeg_seg(0xDB, b"\x00" + zz_q)
    head += _jpeg_seg(
        0xC2,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + bytes([1, (hh << 4) | vv, 0])
        + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    head += _jpeg_seg(
        0xC4, b"\x00" + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS)
    )
    head += _jpeg_seg(0xC4, b"\x11" + bytes(prog_bits) + bytes(prog_vals))
    out = bytearray(head)

    def put(wtr, table, sym: int, extra: int, t: int) -> None:
        code, length = table[sym]
        wtr.bits(code, length)
        if t:
            wtr.bits(extra if extra >= 0 else extra + (1 << t) - 1, t)

    # scan 1: interleaved DC first (MCU order, per-component pred)
    out += _jpeg_seg(
        0xDA,
        b"\x03" + b"\x01\x00" + b"\x02\x00" + b"\x03\x00"
        + bytes([0, 0, 0]),
    )
    wtr = _JpegBitWriter()
    preds = [0, 0, 0]

    def put_dc(ci: int, bi: int) -> None:
        v = int(blk_store[ci][bi][0])
        diff = v - preds[ci]
        preds[ci] = v
        t = int(abs(diff)).bit_length()
        put(wtr, enc_dc, t, diff, t)

    for my in range(mcy):
        for mx in range(mcx):
            for by in range(vv):
                for bx in range(hh):
                    put_dc(
                        0, (my * vv + by) * grid_cols[0] + mx * hh + bx
                    )
            put_dc(1, my * grid_cols[1] + mx)
            put_dc(2, my * grid_cols[2] + mx)
    out += wtr.finish()

    # scans 2-4: per-component AC first over [1,63], Al=0, EOBn runs —
    # walked over the component's ceil-dims raster, remapped into the
    # padded store exactly like the decoder
    for ci, comp_id in ((0, 1), (1, 2), (2, 3)):
        out += _jpeg_seg(
            0xDA,
            b"\x01" + bytes([comp_id, 0x01]) + bytes([1, 63, 0]),
        )
        wtr = _JpegBitWriter()
        eobrun = 0

        def flush() -> None:
            nonlocal eobrun
            if eobrun == 0:
                return
            r = eobrun.bit_length() - 1
            put(wtr, enc_ac, r << 4, 0, 0)
            if r:
                wtr.bits(eobrun - (1 << r), r)
            eobrun = 0

        bw_c, bh_c = ceil_dims[ci]
        for m in range(bw_c * bh_c):
            r0, c0 = divmod(m, bw_c)
            zz = blk_store[ci][r0 * grid_cols[ci] + c0]
            vals = [int(zz[k]) for k in range(1, 64)]
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals):
                if i > last_nz:
                    eobrun += 1
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put(wtr, enc_ac, 0xF0, 0, 0)
                    run -= 16
                s = abs(v).bit_length()
                put(wtr, enc_ac, (run << 4) | s, v, s)
                run = 0
        flush()
        out += wtr.finish()
    return bytes(out) + b"\xff\xd9"


_JPEG_SYNTH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synth_jpeg_gray(df: DataFrame, id_col: str, seed_col: str,
                    w_col: str, h_col: str,
                    progressive: bool = False) -> DataFrame:
    """Deterministic JPEG corpus generator: per row, encode a (h, w)
    grayscale image whose 8x8 block at (bx, by) is the constant
    ``(seed + 7*bx + 13*by) % 256`` — closed-form recomputable by a SQL
    oracle, and exactly recoverable through the all-ones-quant codec
    (DC-only blocks). ``progressive=True`` emits the SOF2 six-scan
    successive-approximation stream instead of baseline; both decode
    to identical pixels. Arrow-batched mapInPandas, repartitioned by
    id like every CPU-bound media stage."""
    import numpy as np
    import pandas as pd

    enc = _encode_jpeg_gray_progressive if progressive else _encode_jpeg_gray

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads, ws, hs = [], [], [], []
            for i, seed, w, h in zip(pdf["id"], pdf["s"], pdf["w"], pdf["h"]):
                bx = (np.arange(int(w)) // 8).reshape(1, -1)
                by = (np.arange(int(h)) // 8).reshape(-1, 1)
                img = ((int(seed) + 7 * bx + 13 * by) % 256).astype(np.uint8)
                ids.append(int(i))
                payloads.append(enc(img))
                ws.append(int(w))
                hs.append(int(h))
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "width": ws, "height": hs}
            )

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(seed_col).cast("long").alias("s"),
        F.col(w_col).cast("int").alias("w"),
        F.col(h_col).cast("int").alias("h"),
    ).repartition("id")
    return src.mapInPandas(gen, _JPEG_SYNTH_SCHEMA)


def synth_jpeg_420(df: DataFrame, id_col: str, seed_col: str,
                   wb_col: str, hb_col: str,
                   progressive: bool = False) -> DataFrame:
    """Deterministic 4:2:0 color JPEG generator: per row encode a
    (hb*8, wb*8) YCbCr image (wb, hb EVEN — 4:2:0 needs 16-multiple
    dims) whose luma 8x8 block (bx, by) is ``(seed + 5*bx + 11*by) %
    256`` and whose chroma planes are constant per CHROMA block
    (cx, cy) = (bx//2, by//2): Cb = ``(3*seed + 7*cx + 13*cy) % 256``,
    Cr = ``(5*seed + 3*cx + 17*cy) % 256``. Block-constant planes +
    all-ones quant make the subsampled round trip exact, so an oracle
    recomputes every decoded RGB value in closed form (the constants
    are chosen so no YCbCr→RGB conversion lands on an exact .5 —
    rounding-mode-proof). ``progressive=True`` emits the SOF2
    interleaved-DC + per-component-AC scan script instead of baseline;
    spectral selection restores coefficients exactly, so both decode
    to identical pixels. Arrow-batched mapInPandas."""
    import numpy as np
    import pandas as pd

    enc = _encode_jpeg_420_progressive if progressive else _encode_jpeg_420

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads, ws, hs = [], [], [], []
            for i, seed, wb, hb in zip(
                pdf["id"], pdf["s"], pdf["wb"], pdf["hb"]
            ):
                seed, wb, hb = int(seed), int(wb), int(hb)
                bx = np.arange(wb).reshape(1, -1)
                by = np.arange(hb).reshape(-1, 1)
                y = np.repeat(
                    np.repeat((seed + 5 * bx + 11 * by) % 256, 8, 0), 8, 1
                ).astype(np.float64)
                cx = np.arange(wb // 2).reshape(1, -1)
                cy = np.arange(hb // 2).reshape(-1, 1)
                cb = np.repeat(
                    np.repeat((3 * seed + 7 * cx + 13 * cy) % 256, 8, 0),
                    8, 1,
                ).astype(np.float64)
                cr = np.repeat(
                    np.repeat((5 * seed + 3 * cx + 17 * cy) % 256, 8, 0),
                    8, 1,
                ).astype(np.float64)
                ids.append(int(i))
                payloads.append(enc(y, cb, cr))
                ws.append(wb * 8)
                hs.append(hb * 8)
            yield pd.DataFrame(
                {"id": ids, "payload": payloads, "width": ws, "height": hs}
            )

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(seed_col).cast("long").alias("s"),
        F.col(wb_col).cast("int").alias("wb"),
        F.col(hb_col).cast("int").alias("hb"),
    ).repartition("id")
    return src.mapInPandas(gen, _JPEG_SYNTH_SCHEMA)


def synth_wav_g711(df: DataFrame, id_col: str, seed_col: str,
                   n_col: str, law: str = "u") -> DataFrame:
    """Deterministic G.711 telephony-WAV generator: per row a RIFF
    stream with fmt code 7 (μ-law) or 6 (A-law), mono 8 kHz, whose
    companded bytes are ``(seed + 7*i) % 256`` — every byte value (and
    so every table entry) is exercised, and a SQL oracle recomputes
    the expanded linear samples from the spec formula without touching
    bytes. Arrow-batched mapInPandas."""
    import pandas as pd

    fmt_code = 7 if law == "u" else 6

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i, seed, n in zip(pdf["id"], pdf["s"], pdf["n"]):
                seed, n = int(seed), int(n)
                data = bytes((seed + 7 * j) % 256 for j in range(n))
                fmt = (
                    fmt_code.to_bytes(2, "little")
                    + (1).to_bytes(2, "little")       # mono
                    + (8000).to_bytes(4, "little")    # rate
                    + (8000).to_bytes(4, "little")    # byte rate
                    + (1).to_bytes(2, "little")       # block align
                    + (8).to_bytes(2, "little")       # bits
                )
                payload = (
                    b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
                    + b"fmt " + (16).to_bytes(4, "little") + fmt
                    + b"data" + n.to_bytes(4, "little") + data
                )
                ids.append(int(i))
                payloads.append(payload)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(seed_col).cast("long").alias("s"),
        F.col(n_col).cast("int").alias("n"),
    ).repartition("id")
    return src.mapInPandas(
        gen,
        StructType([
            StructField("id", LongType()),
            StructField("payload", BinaryType()),
        ]),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("kind", StringType()),
        StructField("shape", ArrayType(IntegerType())),
        StructField("rate", IntegerType()),
        StructField("data", ArrayType(DoubleType())),
    ]
)


def decode_media(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Decode payloads into typed tensors — REAL for the formats that
    need no codec library (same Arrow plumbing as ``byte_histogram``):

    - 24-bit uncompressed BMP → (h, w, 3) pixels, top-down BGR,
      flattened into ``data`` with shape=[h, w, 3];
    - RIFF/WAVE integer PCM → centered samples, shape=[n, channels],
      ``rate`` from the fmt chunk;
    - 8-bit RGB PNG → (h, w, 3) top-down RGB via stdlib zlib inflate +
      full scanline unfilter (_decode_png_pixels) — PNG's entropy
      coding is DEFLATE, so no external codec lib is needed;
    - baseline JPEG → (h, w, 3) via the pure-numpy Huffman/IDCT codec.

    Codec-library formats stay honestly unimplemented: H.264/AV1
    frames and the guarded JPEG/PNG variants raise
    ``NotImplementedError`` (production: the identical mapInPandas
    stage calling ``PIL.Image.open`` /
    ``soundfile.read`` / ``av.open``; tune
    spark.sql.execution.arrow.maxRecordsPerBatch down so one batch of
    payloads fits executor memory). Repartitioned by id so CPU-bound
    decode spreads across cores rather than inheriting parquet file
    locality."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, kinds, shapes, rates, datas = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                if payload is None:  # NULL media decodes to nothing
                    continue
                kind, shape, rate, flat = _dispatch_decode(bytes(payload))
                ids.append(int(i))
                kinds.append(kind)
                shapes.append(list(shape))
                rates.append(rate)
                datas.append(flat.tolist())
            yield pd.DataFrame(
                {"id": ids, "kind": kinds, "shape": shapes, "rate": rates, "data": datas}
            )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(decode, _DECODE_SCHEMA)


def _dispatch_decode(b: bytes):
    """Magic-byte dispatch shared by decode_media (raise-on-failure)
    and decode_audit (per-record quarantine): (kind, shape, rate,
    flat) for the supported container formats."""
    if b[:2] == b"BM":
        shape, flat = _decode_bmp_pixels(b)
        return "bmp", shape, None, flat
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        shape, rate, flat = _decode_wav_samples(b)
        return "wav", shape, rate, flat
    if b[:2] == b"\xff\xd8":
        shape, flat = _decode_jpeg_pixels(b)
        return "jpeg", shape, None, flat
    if b[:8] == _PNG_SIG:
        shape, flat = _decode_png_pixels(b)
        return "png", shape, None, flat
    if b[:3] == b"GIF":
        shape, flat = _decode_gif_pixels(b)
        return "gif", shape, None, flat
    raise NotImplementedError(
        "payload is not BMP, WAV, PNG, GIF, or baseline "
        "JPEG; codec-library formats (H.264/AV1) are out "
        "of scope in this container — see decode_media "
        "docstring"
    )


_AUDIT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("reason", StringType()),
        StructField("kind", StringType()),
        StructField("shape", ArrayType(IntegerType())),
        StructField("rate", IntegerType()),
        StructField("data", ArrayType(DoubleType())),
        StructField("error", StringType()),
    ]
)


def decode_audit(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Quarantine-channel decode (VERDICT r12 task #2 — the media twin
    of the ingest dead-letter contract): same dispatch, same Arrow
    ``mapInPandas`` stage as decode_media, but every record yields
    exactly ONE row — an ok row carrying the decoded tensor, or an
    error row carrying a deterministic reject ``reason`` plus the
    exception detail — so one poisoned blob in 100 TB of scraped
    media becomes an audited reject row instead of a task failure
    Spark retries twice and then kills the job with.

    Reasons (coarse taxonomy, deterministic for a given payload —
    what a rollup oracle can restate; ``error`` carries the precise
    exception for operators):

    - ``ok`` — decoded; kind/shape/rate/data as decode_media
    - ``null_payload`` — NULL media column (decode_media silently
      skips these; the audit channel accounts for every record)
    - ``unsupported_format`` — no known magic bytes / guarded codec
      variant (NotImplementedError)
    - ``corrupt_payload`` — known container, broken body: truncation,
      CRC mismatch, invalid entropy stream, desynced segments (any
      other exception)
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["p"]):
                rid = int(i)
                if payload is None:
                    rows.append(
                        (rid, "null_payload", None, None, None, None, None)
                    )
                    continue
                try:
                    kind, shape, rate, flat = _dispatch_decode(
                        bytes(payload)
                    )
                    rows.append(
                        (rid, "ok", kind, list(shape), rate,
                         flat.tolist(), None)
                    )
                except NotImplementedError as e:
                    rows.append(
                        (rid, "unsupported_format", None, None, None,
                         None, f"{type(e).__name__}: {str(e)[:160]}")
                    )
                except Exception as e:  # noqa: BLE001 — per-record
                    # quarantine IS the contract: any decoder failure
                    # becomes a reject row, never a task failure
                    rows.append(
                        (rid, "corrupt_payload", None, None, None,
                         None, f"{type(e).__name__}: {str(e)[:160]}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "reason", "kind", "shape", "rate", "data",
                    "error",
                ],
            )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(decode, _AUDIT_SCHEMA)


def decode_audit_observed(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    name: str = "decode_audit",
):
    """A20 observability twin of the quarantine channel (VERDICT r13
    polish #7): decode_audit with per-reason reject metrics attached
    via ``df.observe`` — counts aggregate MAP-SIDE during whatever
    action consumes the audit frame (zero extra jobs, zero extra
    decode passes; Observation is the listener-backed mechanism, so
    the same named metrics surface in QueryExecutionListener /
    SparkListener events at production scale). Returns
    (audited_df, observation); read ``observation.get`` after the
    first action for {n_records, n_ok, n_null_payload,
    n_unsupported_format, n_corrupt_payload} — the reject RATE per
    reason without a second scan of 100 TB of media."""
    from pyspark.sql import Observation

    out = decode_audit(df, id_col, payload_col)
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_records")]
    for r in (
        "ok",
        "null_payload",
        "unsupported_format",
        "corrupt_payload",
    ):
        metrics.append(
            F.count(F.when(F.col("reason") == r, 1)).alias(f"n_{r}")
        )
    return out.observe(obs, *metrics), obs


def _bmp_header_bytes(w: int, h: int) -> bytes:
    """Python-side twin of ``bmp_payload``'s Catalyst header (shared
    layout; used by the re-encode path)."""
    stride = (w * 3 + 3) // 4 * 4
    n_px = h * stride
    return (
        b"BM"
        + (54 + n_px).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 4
        + n_px.to_bytes(4, "little")
        + b"\x00" * 16
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    df: DataFrame, id_col: str, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL nearest-neighbor image resize over 24-bit BMP payloads:
    decode (``_decode_bmp_pixels``), index-map resample — output pixel
    (x2, y2) reads source pixel (x2*W//width, y2*H//height) — and
    re-encode spec-valid BMP bytes (zeroed stride padding). Emits
    (id, payload, width, height, n_bytes) so callers refresh media
    metadata alongside the bytes. numpy does the resample vectorized
    per Arrow batch (``np.ix_`` gather, no Python pixel loop);
    entropy-coded inputs raise as in ``decode_media``."""
    import numpy as np
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i, payload in zip(pdf["id"], pdf["p"]):
                if payload is None:  # NULL media: nothing to resize
                    continue
                (h, w, _), flat = _decode_bmp_pixels(bytes(payload))
                px = flat.astype(np.uint8).reshape(h, w, 3)
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                out_px = px[np.ix_(ys, xs)]
                stride2 = (width * 3 + 3) // 4 * 4
                rows = np.zeros((height, stride2), dtype=np.uint8)
                rows[:, : width * 3] = out_px.reshape(height, width * 3)
                ids.append(int(i))
                payloads.append(_bmp_header_bytes(width, height) + rows[::-1].tobytes())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("p")
    ).repartition("id")
    return src.mapInPandas(resize, _RESIZE_SCHEMA)


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


# ---------------------------------------------------------------------------
# PNG — REAL decode, no codec library needed: PNG's entropy coding is
# DEFLATE, and zlib ships in the Python standard library. (The module's
# "entropy-coded formats need codec libs" line predates this; it now
# applies to H.264/AV1-class formats only.)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: Adam7 pass grid: (row start, col start, row step, col step). The
#: seven passes partition the pixel grid; each pass is filtered as an
#: independent sub-image (prior row resets per pass — PNG spec 8.2).
_ADAM7 = [
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
]


def _filter_scanlines(rows, bpp: int, pick, y_base: int = 0) -> bytes:
    """Apply PNG scanline filters to a (n_rows, rowbytes) block —
    one sub-image: the whole image when non-interlaced, one Adam7 pass
    when interlaced (prior starts at zero per call, per spec)."""
    import numpy as np

    n_rows, rowbytes = rows.shape
    out = []
    prior = np.zeros(rowbytes, dtype=np.int64)
    for y in range(n_rows):
        cur = rows[y].astype(np.int64)
        f = pick(y_base + y)
        if f == 0:
            filt = cur.copy()
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = (cur - left) % 256
        elif f == 2:  # Up
            filt = (cur - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = (cur - (left + prior) // 2) % 256
        elif f == 4:  # Paeth
            filt = np.empty_like(cur)
            for x in range(len(cur)):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                filt[x] = (cur[x] - _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"invalid PNG filter {f}")
        out.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prior = cur
    return b"".join(out)


def _unfilter_scanlines(raw: bytes, n_rows: int, rowbytes: int, bpp: int):
    """Reverse PNG scanline filters over one sub-image block (the
    exact inverse of _filter_scanlines): (n_rows, rowbytes) int64."""
    import numpy as np

    rowlen = 1 + rowbytes
    out = np.empty((n_rows, rowbytes), dtype=np.int64)
    prior = np.zeros(rowbytes, dtype=np.int64)
    for y in range(n_rows):
        row = raw[y * rowlen : (y + 1) * rowlen]
        f = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up (vectorized)
            rec = (cur + prior) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.empty_like(cur)
            for x in range(len(cur)):
                a = rec[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + prior[x]) // 2
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    pred = _paeth(int(a), int(prior[x]), int(c))
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"invalid PNG scanline filter {f}")
        out[y] = rec
        prior = out[y]
    return out


def encode_png_rgb8(pixels, filter_for_row=None, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a spec-valid 8-bit RGB PNG
    (color type 2). ``filter_for_row(y)`` picks each scanline's filter
    type (default cycles 0..4 so every filter in the spec —
    None/Sub/Up/Average/Paeth — appears in the stream; a real encoder
    picks per-row by heuristic, same mechanics). ``interlace=True``
    writes Adam7: the seven passes' sub-images are filtered
    independently (prior resets per pass) and concatenated into one
    IDAT stream; the filter picker keeps cycling across passes so
    every filter still appears."""
    import struct
    import zlib as _z

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    bpp = 3
    pick = filter_for_row or (lambda y: y % 5)
    if interlace:
        parts = []
        y_base = 0
        for y0, x0, dy, dx in _ADAM7:
            sub = px[y0::dy, x0::dx, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes no bytes (spec)
            rows = sub.reshape(sub.shape[0], -1).astype(np.int64)
            parts.append(_filter_scanlines(rows, bpp, pick, y_base))
            y_base += sub.shape[0]
        body = b"".join(parts)
    else:
        body = _filter_scanlines(
            px.reshape(h, w * bpp).astype(np.int64), bpp, pick
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(body, 6))
        + _png_chunk(b"IEND", b"")
    )


def _encode_png_samples(
    samples, ctype: int, w: int, h: int,
    plte=None, trns=None, filter_for_row=None,
) -> bytes:
    """Spec-valid non-interlaced 8-bit PNG from raw (h, w, bpp)
    samples of any color type (the non-RGB twin of encode_png_rgb8 —
    filter types cycle 0..4 by default so every spec filter appears).
    ``plte`` is an (n, 3) palette for ctype 3; ``trns`` optional
    per-entry alpha bytes."""
    import struct
    import zlib as _z

    import numpy as np

    bpp = _PNG_CTYPE_BPP[ctype]
    px = np.asarray(samples, dtype=np.uint8).reshape(h, w * bpp)
    pick = filter_for_row or (lambda y: y % 5)
    body = _filter_scanlines(px.astype(np.int64), bpp, pick)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(
            b"PLTE", np.asarray(plte, dtype=np.uint8).tobytes()
        )
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(bytearray(trns)))
    return (
        out
        + _png_chunk(b"IDAT", _z.compress(body, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray8(pixels, filter_for_row=None) -> bytes:
    """8-bit grayscale PNG (color type 0) from an (h, w) array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return _encode_png_samples(px, 0, w, h, filter_for_row=filter_for_row)


def encode_png_palette8(
    indices, palette, trns=None, filter_for_row=None
) -> bytes:
    """8-bit palette PNG (color type 3) from an (h, w) index array and
    an (n, 3) palette; ``trns`` (optional) is per-entry alpha."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    return _encode_png_samples(
        idx, 3, w, h, plte=palette, trns=trns,
        filter_for_row=filter_for_row,
    )


def encode_png_graya8(pixels, filter_for_row=None) -> bytes:
    """8-bit gray+alpha PNG (color type 4) from an (h, w, 2) array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return _encode_png_samples(px, 4, w, h, filter_for_row=filter_for_row)


def encode_png_rgba8(pixels, filter_for_row=None) -> bytes:
    """8-bit RGBA PNG (color type 6) from an (h, w, 4) array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return _encode_png_samples(px, 6, w, h, filter_for_row=filter_for_row)


#: PNG color type → raw samples per pixel (8-bit depth)
_PNG_CTYPE_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png_pixels(b: bytes) -> tuple[tuple[int, int, int], "object"]:
    """Decode an 8-bit PNG of ANY spec color type — 0 grayscale,
    2 truecolor RGB, 3 palette (PLTE lookup, optional tRNS alpha),
    4 gray+alpha, 6 RGBA — non-interlaced OR Adam7-interlaced: chunk
    walk with CRC verification, multi-IDAT zlib inflate, per-scanline
    unfilter (all five spec filters, exact Paeth predictor, bpp per
    color type), and for interlace=1 the seven-pass de-interleave
    (each pass unfiltered independently, then scattered onto the
    _ADAM7 grid). Output channels are EXPANDED to a uniform pixel
    space so downstream stats don't branch on the source layout:
    grayscale replicates to RGB → (h, w, 3); palette maps through
    PLTE → (h, w, 3), or (h, w, 4) when tRNS supplies per-entry alpha
    (entries past the tRNS length are opaque 255, per spec);
    gray+alpha → (h, w, 4); RGBA stays (h, w, 4). Returns
    ((h, w, c), flat float64, top-down). EVERY spec-legal
    (color type, depth) pair decodes (r12): depth 16
    (scientific/medical corpora) filters byte-level with a 2-byte
    unit and reassembles big-endian to raw 0..65535; the packed
    sub-byte depths (1/2/4-bit gray and palette — fax scans, icons,
    screenshots) unpack MSB-first bit groups from byte-padded rows
    with a one-byte filter unit. Raw sample values are never
    rescaled: stats oracles recompute exact closed forms. Non-spec
    (ctype, depth) combinations are invalid data and fail loudly —
    no coverage guards remain in the PNG path."""
    import struct
    import zlib as _z

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    trns = None
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if _z.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if ln % 3 != 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    #: spec-legal depths per color type (PNG spec table 11.1)
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if ctype not in _PNG_CTYPE_BPP:
        raise ValueError(f"invalid PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if depth not in legal[ctype]:
        raise ValueError(
            f"{depth}-bit depth is not spec-valid for color type {ctype}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    raw = _z.decompress(b"".join(idat))
    samples = _PNG_CTYPE_BPP[ctype]
    # spec: filtering operates on BYTES with bpp = the byte-rounded
    # pixel unit — samples×2 at depth 16, samples at 8, and ONE byte
    # for the packed sub-byte depths (1/2/4-bit gray or palette,
    # samples == 1 there by the legality table)
    funit = max(1, (samples * depth) // 8)

    def row_bytes(width: int) -> int:
        return (width * samples * depth + 7) // 8

    def assemble(rows, width: int, height: int):
        """(height, row_bytes) unfiltered BYTE rows → (height, width,
        samples) int64 samples: 16-bit combines big-endian pairs,
        8-bit reshapes, sub-byte depths unpack MSB-first bit groups
        (rows are padded to a byte boundary per spec). Raw values are
        never rescaled — stats oracles recompute exact closed forms."""
        if depth == 16:
            b2 = rows.reshape(height, width, samples, 2)
            return b2[:, :, :, 0] * 256 + b2[:, :, :, 1]
        if depth == 8:
            return rows.reshape(height, width, samples)
        bits = np.unpackbits(
            rows.astype(np.uint8), axis=1
        )[:, : width * depth].reshape(height, width, depth)
        weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.int64)
        return (bits.astype(np.int64) * weights).sum(axis=2)[
            :, :, None
        ]

    if interlace == 0:
        rowlen = 1 + row_bytes(w)
        if len(raw) != h * rowlen:
            raise ValueError("PNG pixel data length mismatch")
        out = assemble(
            _unfilter_scanlines(raw, h, row_bytes(w), funit), w, h
        )
    else:
        # Adam7: consume each pass's block, unfilter it as its own
        # sub-image (sub-byte passes pad each PASS row to a byte
        # boundary independently, per spec), scatter onto the grid
        out = np.empty((h, w, samples), dtype=np.int64)
        pos = 0
        for y0, x0, dy, dx in _ADAM7:
            ph = len(range(y0, h, dy))
            pw = len(range(x0, w, dx))
            if ph == 0 or pw == 0:
                continue
            block = raw[pos : pos + ph * (1 + row_bytes(pw))]
            pos += ph * (1 + row_bytes(pw))
            sub = _unfilter_scanlines(block, ph, row_bytes(pw), funit)
            out[y0::dy, x0::dx, :] = assemble(sub, pw, ph)
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    bpp = samples
    # expand to the uniform pixel space
    if ctype == 0:  # gray → RGB replication
        out = np.repeat(out, 3, axis=2)
    elif ctype == 3:  # palette indices → PLTE colors (+ tRNS alpha)
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx].astype(np.int64)
        if trns is not None:
            alpha = np.full((h, w, 1), 255, dtype=np.int64)
            in_trns = idx < len(trns)
            alpha[:, :, 0][in_trns] = trns[idx[in_trns]]
            out = np.concatenate([rgb, alpha], axis=2)
        else:
            out = rgb
    elif ctype == 4:  # gray+alpha → (g, g, g, a)
        out = np.concatenate(
            [np.repeat(out[:, :, :1], 3, axis=2), out[:, :, 1:]], axis=2
        )
    c = out.shape[2]
    return (h, w, c), out.reshape(-1).astype(np.float64)


def encode_png16(samples, ctype: int, filter_for_row=None) -> bytes:
    """Spec-valid non-interlaced 16-bit PNG from raw (h, w, s) uint16
    samples — color type 0 (s=1), 2 (s=3), 4 (s=2 gray+alpha) or
    6 (s=4 RGBA) — the 16-bit twin of _encode_png_samples: big-endian
    sample bytes, filter unit bpp = s×2, filter types cycling 0..4 by
    default so every spec filter crosses the 2-byte-unit path."""
    import struct
    import zlib as _z

    import numpy as np

    px = np.asarray(samples, dtype=np.uint16)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, s = px.shape
    if (ctype, s) not in ((0, 1), (2, 3), (4, 2), (6, 4)):
        raise ValueError(f"ctype {ctype} with {s} samples")
    rows = (
        np.frombuffer(px.astype(">u2").tobytes(), dtype=np.uint8)
        .reshape(h, w * s * 2)
        .astype(np.int64)
    )
    pick = filter_for_row or (lambda y: y % 5)
    body = _filter_scanlines(rows, s * 2, pick)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(body, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_packed(
    samples, depth: int, ctype: int, plte=None, trns=None,
    filter_for_row=None,
) -> bytes:
    """Spec-valid non-interlaced sub-byte PNG from (h, w) sample
    values — depth 1/2/4, color type 0 (grayscale) or 3 (palette
    indices): bits pack MSB-first, rows pad to a byte boundary, the
    filter unit is ONE byte, filter types cycle 0..4 by default so
    every spec filter crosses the packed path."""
    import struct
    import zlib as _z

    import numpy as np

    if depth not in (1, 2, 4):
        raise ValueError(f"packed encoder: depth must be 1/2/4, got {depth}")
    if ctype not in (0, 3):
        raise ValueError(f"packed depths are spec-legal for ctype 0/3 only")
    px = np.asarray(samples, dtype=np.int64)
    h, w = px.shape
    if px.min(initial=0) < 0 or px.max(initial=0) >= (1 << depth):
        raise ValueError(f"sample out of range for depth {depth}")
    # MSB-first bit groups, each row padded to a whole byte
    bits = (
        (px[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(h, w * depth).astype(np.uint8)
    rows = np.packbits(bits, axis=1).astype(np.int64)
    pick = filter_for_row or (lambda y: y % 5)
    body = _filter_scanlines(rows, 1, pick)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(
            b"PLTE", np.asarray(plte, dtype=np.uint8).tobytes()
        )
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(bytearray(trns)))
    return (
        out
        + _png_chunk(b"IDAT", _z.compress(body, 6))
        + _png_chunk(b"IEND", b"")
    )


def png_packed_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
) -> DataFrame:
    """Arrow-batched sub-byte PNG writer over (id, w, h, seed) rows:
    EVEN ids become 4-bit PALETTE streams (16-entry closed-form
    palette ((i*17)%256, (i*29)%256, (i*41)%256), index plane
    (seed + p) % 16); ODD ids 2-bit GRAYSCALE (g(p) = (seed + 3p) % 4).
    Closed forms, so oracles recompute decoded values without
    touching bytes."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        pal = np.stack(
            [
                (np.arange(16) * 17) % 256,
                (np.arange(16) * 29) % 256,
                (np.arange(16) * 41) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                i, w, h, seed = int(i), int(w), int(h), int(seed)
                if i % 2 == 0:
                    idx = (
                        seed + np.arange(h * w, dtype=np.int64)
                    ).reshape(h, w) % 16
                    payloads.append(
                        encode_png_packed(idx, 4, 3, plte=pal)
                    )
                else:
                    g = (
                        seed + 3 * np.arange(h * w, dtype=np.int64)
                    ).reshape(h, w) % 4
                    payloads.append(encode_png_packed(g, 2, 0))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


def png16_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
) -> DataFrame:
    """Arrow-batched 16-bit PNG writer over (id, w, h, seed) rows —
    the 16-bit twin of png_variant_synthesize: EVEN ids become
    truecolor-16 streams (color type 2) with sample
    (p) = (seed*257 + p*101) % 65536 over the flat RGB index p; ODD
    ids grayscale-16 (color type 0) with g(i) = (seed*131 + i*257)
    % 65536 per pixel i. Closed forms, so oracles recompute decoded
    values without touching bytes."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                i, w, h, seed = int(i), int(w), int(h), int(seed)
                if i % 2 == 0:
                    flat = (
                        seed * 257
                        + np.arange(h * w * 3, dtype=np.int64) * 101
                    ) % 65536
                    px = flat.reshape(h, w, 3).astype(np.uint16)
                    payloads.append(encode_png16(px, 2))
                else:
                    g = (
                        seed * 131
                        + np.arange(h * w, dtype=np.int64) * 257
                    ) % 65536
                    px = g.reshape(h, w).astype(np.uint16)
                    payloads.append(encode_png16(px, 0))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


def png_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
    interlace: bool = False,
) -> DataFrame:
    """Arrow-batched PNG writer over (id, w, h, seed) rows: pixel
    (x, y, c) = (seed + (y*w + x)*3 + c) % 256 — the same closed-form
    generator contract as bmp_payload, so oracles recompute pixels
    without touching bytes — encoded through encode_png_rgb8 with the
    filter type cycling 0..4 by row (every spec filter is exercised in
    every image taller than 4 rows); ``interlace`` emits Adam7 streams
    instead. DEFLATE runs here (zlib), so unlike bmp_payload this
    synthesis is a Python stage, not Catalyst expressions."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                w, h, seed = int(w), int(h), int(seed)
                flat = (seed + np.arange(h * w * 3, dtype=np.int64)) % 256
                px = flat.reshape(h, w, 3).astype(np.uint8)
                ids.append(int(i))
                payloads.append(encode_png_rgb8(px, interlace=interlace))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


def png_variant_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
) -> DataFrame:
    """Arrow-batched writer for the NON-RGB PNG color types a scraped
    web corpus actually carries: even ids become 8-bit PALETTE PNGs
    (color type 3 — 32-entry closed-form palette
    ``((i*7)%256, (i*11)%256, (i*13)%256)``, index plane
    ``(seed + p) % 32``), odd ids become 8-bit GRAYSCALE PNGs (color
    type 0 — pixel ``(seed + 2p) % 256``). Both generators are closed
    form so oracles recompute decoded channel values without touching
    bytes: palette pixels decode to ``palette[(seed+p)%32][c]``, gray
    pixels replicate to RGB. Filter types cycle 0..4 per row like
    png_synthesize."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        pal = np.stack(
            [
                (np.arange(32, dtype=np.int64) * 7) % 256,
                (np.arange(32, dtype=np.int64) * 11) % 256,
                (np.arange(32, dtype=np.int64) * 13) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                i, w, h, seed = int(i), int(w), int(h), int(seed)
                if i % 2 == 0:
                    idx = (
                        (seed + np.arange(h * w, dtype=np.int64)) % 32
                    ).reshape(h, w)
                    payloads.append(encode_png_palette8(idx, pal))
                else:
                    px = (
                        (seed + 2 * np.arange(h * w, dtype=np.int64)) % 256
                    ).reshape(h, w)
                    payloads.append(encode_png_gray8(px))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


# ---------------------------------------------------------------------------
# GIF — REAL decode: GIF's entropy coding is LZW, which is ~40 lines of
# plain Python (patent-expired, spec-public). With this, every classic
# still-image format (BMP, GIF, PNG, JPEG) decodes for real in this
# container; only motion codecs (H.264/AV1) remain honestly guarded.
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/END control codes,
    code width grows after the dictionary fills a width, capped at 12
    bits until the encoder sends CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out.append(-1)  # placeholder replaced below
            out[-1:] = entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real dictionary-building GIF LZW encoder (not the uncompressed-
    GIF trick): greedy longest-match, emits CLEAR when the table hits
    4096, grows code width exactly when the next code would not fit."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            # width grows when the NEXT emitted code could be next_code
            if next_code == (1 << width):
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_palette(n: int) -> list[tuple[int, int, int]]:
    """Deterministic palette the oracle reproduces in closed form."""
    return [((i * 7) % 256, (i * 11) % 256, (i * 13) % 256) for i in range(n)]


def _gif_interlace_order(h: int) -> list[int]:
    """GIF interlace row STORAGE order (spec appendix E): pass 1 every
    8th row from 0, pass 2 every 8th from 4, pass 3 every 4th from 2,
    pass 4 every 2nd from 1."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def encode_gif_indexed(
    w: int, h: int, indices: list[int], n_colors: int = 16,
    interlace: bool = False,
) -> bytes:
    """Spec-valid GIF87a: logical screen + global color table
    (_gif_palette) + one full-frame image with real LZW-compressed
    index data in 255-byte sub-blocks. ``interlace=True`` sets the
    image-descriptor interlace flag and stores rows in the four-pass
    order of the spec."""
    import struct

    assert n_colors in (2, 4, 8, 16, 32, 64, 128, 256)
    depth = max(1, n_colors.bit_length() - 1)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    for r, g, b in _gif_palette(n_colors):
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code = max(2, depth)
    out.append(min_code)
    if interlace:
        indices = [
            indices[y * w + x]
            for y in _gif_interlace_order(h)
            for x in range(w)
        ]
    data = _lzw_encode(indices, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_gif_pixels(b: bytes):
    """Decode a GIF87a/89a to RGB float64 — ALL frames, composited
    (r13: the partial-frame guard is retired): screen/color-table
    walk, graphic-control extensions (transparency + disposal),
    sub-block reassembly, LZW inflate, four-pass de-interlace when a
    descriptor flags it, palette mapping, and per-frame compositing
    onto the logical-screen canvas at each frame's (left, top) rect.

    Disposal methods per GIF89a §23: 0/1 leave the rendered frame in
    place; 2 restores the frame's rect to the background color after
    the frame is emitted; 3 (restore-to-previous, r14 — guard
    retired) restores the canvas to its state BEFORE the frame was
    rendered. The spec restores to the pre-frame canvas, not
    arbitrary history, so the bounded implementation keeps exactly
    ONE saved canvas per frame — no unbounded history. A transparent
    index (GCE flag) leaves the underlying canvas pixel unchanged.
    The canvas starts as the header's background color (GCT[bg];
    zeros without a GCT).

    Returns ((h, w, 3), flat) for a single-frame stream — the
    pre-r13 contract, byte-identical for every existing oracle — and
    ((n_frames, h, w, 3), flat of the composited canvas AFTER each
    frame) for animations."""
    import struct

    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else (0, 0, 0)
    canvas = np.empty((h, w, 3), dtype=np.float64)
    canvas[:, :] = bg_rgb
    frames = []
    transparent = None  # from the pending GCE, consumed per frame
    disposal = 0
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: label + sub-blocks
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and b[pos] >= 4:
                flags = b[pos + 1]
                tidx = b[pos + 4]
                disposal = (flags >> 2) & 0x7
                transparent = tidx if flags & 0x1 else None
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:
            left, top, iw, ih, ipacked = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
                pos += 3 * n
            interlaced = bool(ipacked & 0x40)
            if left + iw > w or top + ih > h:
                raise ValueError("GIF frame rect exceeds logical screen")
            if pal is None:
                raise ValueError("GIF frame with no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data underrun")
            idx = idx[: iw * ih]
            if interlaced:
                rows = [None] * ih
                for stored, actual in enumerate(_gif_interlace_order(ih)):
                    rows[actual] = idx[stored * iw : (stored + 1) * iw]
                idx = [i for row in rows for i in row]
            ia = np.array(idx, dtype=np.int64).reshape(ih, iw)
            # disposal 3 restores to the PRE-frame canvas: one saved
            # copy is the whole history the spec requires
            saved = canvas.copy() if disposal == 3 else None
            rect = canvas[top : top + ih, left : left + iw]
            pal_arr = np.array(pal, dtype=np.float64)
            rendered = pal_arr[ia]
            if transparent is not None:
                mask = ia != transparent
                rect[mask] = rendered[mask]
            else:
                rect[:, :] = rendered
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top : top + ih, left : left + iw] = bg_rgb
            elif disposal == 3:
                canvas = saved
            transparent = None
            disposal = 0
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    if len(frames) == 1:
        return (h, w, 3), frames[0].reshape(-1)
    out = np.stack(frames)
    return (len(frames), h, w, 3), out.reshape(-1)


def gif_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
    n_colors: int = 16,
    interlace: bool = False,
) -> DataFrame:
    """Arrow-batched GIF writer over (id, w, h, seed) rows: palette
    index at (x, y) = (seed + y*w + x) % n_colors, palette entry i =
    (7i, 11i, 13i) % 256 — closed form for the oracle — LZW-compressed
    for real by _lzw_encode. ``interlace`` stores rows in the spec's
    four-pass order (and flags the image descriptor)."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                w, h, seed = int(w), int(h), int(seed)
                idx = [(seed + p) % n_colors for p in range(w * h)]
                ids.append(int(i))
                payloads.append(
                    encode_gif_indexed(w, h, idx, n_colors, interlace)
                )
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")


def gif_frame_rects(w: int, h: int, n_frames: int) -> list[tuple]:
    """Deterministic partial-frame rects (left, top, fw, fh) for
    frames 1..n_frames-1 of the animated fixture — closed form of the
    screen geometry, shared with the SQL oracle. Requires w >= 7,
    h >= 5 so every rect is non-empty."""
    rects = [(1, 2, w - 2, h - 3), (3, 1, w - 4, h - 2)]
    return rects[: n_frames - 1]


def encode_gif_animated(
    w: int,
    h: int,
    seed: int,
    n_frames: int = 3,
    n_colors: int = 16,
    transparent_from: int | None = None,
    disposal: int = 1,
) -> bytes:
    """Spec-valid GIF89a ANIMATION: logical screen + global color
    table (_gif_palette), then frame 0 full-screen and frames
    1..n_frames-1 as PARTIAL rects (gif_frame_rects), each preceded
    by a graphic-control extension (``disposal``, default 1 =
    do-not-dispose; 3 = restore-to-previous for the r14 fixture).
    Frame f's index at rect-relative (x, y) = (seed + 17*f +
    y*fw + x) % n_colors — closed form for the oracle. Real LZW per
    frame. ``transparent_from``: when set, frames >= 1 declare that
    palette index transparent in their GCE, so matching pixels leave
    the canvas unchanged (the compositing edge the hand unit test
    pins; the oracled query leaves it None)."""
    import struct

    assert n_colors in (2, 4, 8, 16, 32, 64, 128, 256)
    depth = max(1, n_colors.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    for r, g, b in _gif_palette(n_colors):
        out += bytes((r, g, b))
    frames = [(0, 0, w, h)] + gif_frame_rects(w, h, n_frames)
    min_code = max(2, depth)
    for f, (left, top, fw, fh) in enumerate(frames):
        if f > 0:
            tflag = 1 if transparent_from is not None else 0
            tidx = transparent_from or 0
            # GCE: caller-chosen disposal, delay 0
            out += bytes(
                (0x21, 0xF9, 4, ((disposal & 7) << 2) | tflag,
                 0, 0, tidx, 0)
            )
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out.append(min_code)
        idx = [
            (seed + 17 * f + p) % n_colors for p in range(fw * fh)
        ]
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_animated_synthesize(
    df: DataFrame,
    id_col: str,
    width_col: str = "w",
    height_col: str = "h",
    seed_col: str = "seed",
    n_frames: int = 3,
    n_colors: int = 16,
    disposal: int = 1,
) -> DataFrame:
    """Arrow-batched animated-GIF writer over (id, w, h, seed) rows —
    the partial-frame fixture generator (encode_gif_animated);
    ``disposal`` feeds every frame's GCE (1 = leave in place, 3 =
    restore-to-previous)."""
    import pandas as pd

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i, w, h, seed in zip(pdf["id"], pdf["w"], pdf["h"], pdf["s"]):
                ids.append(int(i))
                payloads.append(
                    encode_gif_animated(
                        int(w), int(h), int(seed),
                        n_frames=n_frames, n_colors=n_colors,
                        disposal=disposal,
                    )
                )
            yield pd.DataFrame({"id": ids, "payload": payloads})

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(seed_col).cast("long").alias("s"),
    ).repartition("id")
    return src.mapInPandas(synth, "id long, payload binary")
