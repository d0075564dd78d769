"""Unit tests for the multimodal column plumbing
(operators.multimodal): payload/metadata derivation, Arrow-batched
feature extraction, Catalyst frame sampling, and the decode stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.operators.multimodal import (
    attach_media,
    byte_histogram,
    decode_media,
    resize_images,
    sample_frames,
)

from tests.conftest import SF_SMALL


def _docs(spark, n=30):
    return attach_media(
        table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < n),
        "doc_id",
        "text",
    )


def test_attach_media_payload_and_meta(spark):
    rows = _docs(spark).select("doc_id", "text", "payload", "media").collect()
    assert rows
    for r in rows:
        assert bytes(r.payload) == r.text.encode("utf-8")
        m = r.media
        assert m.media_type == ("image", "audio", "video")[r.doc_id % 3]
        assert m.n_bytes == len(r.text.encode("utf-8"))
        if m.media_type == "video":
            assert m.n_frames == 1 + m.n_bytes // 32 and m.width is not None
        elif m.media_type == "audio":
            assert m.sample_rate == 16000 and m.width is None
        else:
            assert m.n_frames is None and m.sample_rate is None


def test_byte_histogram_matches_numpy(spark):
    got = {
        (r.id, r.bin): r.cnt
        for r in byte_histogram(_docs(spark), "doc_id", n_bins=8).collect()
    }
    for r in _docs(spark).select("doc_id", "text").collect():
        arr = np.frombuffer(r.text.encode(), dtype=np.uint8) // 32
        hist = np.bincount(arr, minlength=8)
        for b in range(8):
            assert got.get((r.doc_id, b), 0) == hist[b]


def test_sample_frames_pure_catalyst(spark):
    d = _docs(spark)
    out = sample_frames(d, "doc_id", every_k=4)
    frames = {}
    for r in out.collect():
        frames.setdefault(r.doc_id, []).append(r.frame_no)
    metas = {r.doc_id: r.media for r in d.collect() if r.media.media_type == "video"}
    assert set(frames) == set(metas)
    for did, fs in frames.items():
        assert sorted(fs) == list(range(0, metas[did].n_frames, 4))
    # no Python stage: plan must not contain a Python/Arrow eval node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decode_unsupported_format_raises(spark):
    """Entropy-coded / unknown payloads still fail loudly: attach_media
    payloads are raw UTF-8 bytes (no container), so decoding them must
    raise the NotImplementedError from inside the Arrow stage."""
    d = _docs(spark)
    with pytest.raises(Exception, match="BMP or WAV"):
        decode_media(d, "doc_id").collect()
    with pytest.raises(Exception, match="not a BMP"):
        resize_images(d, "doc_id", 32, 32).collect()


def test_bmp_decode_handcrafted_pixels(spark):
    """Decode a hand-assembled 24-bit BMP (2×2, bottom-up rows, 8-byte
    stride) byte-for-byte: the decoder must undo row order and strip
    padding."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _bmp_header_bytes,
        _decode_bmp_pixels,
    )

    px = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    rows = np.zeros((2, 8), np.uint8)
    rows[:, :6] = px.reshape(2, 6)
    payload = _bmp_header_bytes(2, 2) + rows[::-1].tobytes()
    shape, flat = _decode_bmp_pixels(payload)
    assert shape == (2, 2, 3)
    assert flat.tolist() == list(range(1, 13))
    src = spark.createDataFrame([(7, bytearray(payload))], "id long, payload binary")
    row = decode_media(src, "id").collect()[0]
    assert row.kind == "bmp" and row.shape == [2, 2, 3] and row.rate is None
    assert row.data == [float(v) for v in range(1, 13)]


def test_bmp_topdown_negative_height(spark):
    """Negative BMP height means top-down row order — no flip."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _bmp_header_bytes,
        _decode_bmp_pixels,
    )

    header = bytearray(_bmp_header_bytes(2, 2))
    header[22:26] = (-2).to_bytes(4, "little", signed=True)
    rows = np.zeros((2, 8), np.uint8)
    rows[0, :6] = [1, 2, 3, 4, 5, 6]
    rows[1, :6] = [7, 8, 9, 10, 11, 12]
    shape, flat = _decode_bmp_pixels(bytes(header) + rows.tobytes())
    assert shape == (2, 2, 3) and flat.tolist() == list(range(1, 13))


def test_resize_nearest_neighbor_known_map(spark):
    """4×4 upsample of a 2×2 image must replicate each source pixel in
    a 2×2 block (nearest neighbor, floor mapping), and the re-encoded
    payload must be a valid BMP that both parsers agree on."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _bmp_header_bytes,
        _decode_bmp_pixels,
        _header_geometry,
        parse_image_meta,
    )

    px = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    rows = np.zeros((2, 8), np.uint8)
    rows[:, :6] = px.reshape(2, 6)
    payload = _bmp_header_bytes(2, 2) + rows[::-1].tobytes()
    src = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    out = resize_images(src, "id", 4, 4).collect()[0]
    assert (out.width, out.height) == (4, 4)
    b = bytes(out.payload)
    assert _header_geometry(b) == ("bmp", 4, 4)
    m = (
        spark.createDataFrame([(bytearray(b),)], "p binary")
        .select(parse_image_meta(F.col("p")).alias("m"))
        .collect()[0]
        .m
    )
    assert (m.fmt, m.width, m.height) == ("bmp", 4, 4)
    shape, flat = _decode_bmp_pixels(b)
    expect = px[np.ix_((np.arange(4) * 2) // 4, (np.arange(4) * 2) // 4)]
    assert shape == (4, 4, 3)
    assert flat.tolist() == [float(v) for v in expect.reshape(-1)]


def test_wav_payload_opens_with_stdlib_wave(spark):
    """The Catalyst-built RIFF container must be a real WAV: stdlib
    `wave` (an independent parser) reads rate/channels/width/frames,
    and decode_media returns centered samples + the fmt-chunk rate."""
    import io
    import wave

    from stupp_exclusion_etl_spark.operators.multimodal import wav_payload

    text = "stupp-exclusion-etl!" * 3
    df = spark.createDataFrame([(5, text)], "id long, text string").select(
        "id", wav_payload(F.encode(F.col("text"), "UTF-8")).alias("payload")
    )
    b = bytes(df.collect()[0].payload)
    wf = wave.open(io.BytesIO(b))
    assert (
        wf.getframerate(),
        wf.getnchannels(),
        wf.getsampwidth(),
        wf.getnframes(),
    ) == (16000, 1, 1, len(text))
    assert wf.readframes(len(text)) == text.encode()
    row = decode_media(df, "id").collect()[0]
    assert row.kind == "wav" and row.rate == 16000
    assert row.shape == [len(text), 1]
    assert row.data == [float(ord(c)) - 128.0 for c in text]


def test_wav_decode_16bit_stereo():
    """16-bit little-endian stereo PCM decodes signed with channel
    count preserved (pure decoder path, built with stdlib wave)."""
    import io
    import wave

    from stupp_exclusion_etl_spark.operators.multimodal import _decode_wav_samples

    samples = np.array([-32768, 32767, -1, 2, 100, -100], dtype="<i2")
    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(2)
    wf.setsampwidth(2)
    wf.setframerate(44100)
    wf.writeframes(samples.tobytes())
    wf.close()
    shape, rate, flat = _decode_wav_samples(buf.getvalue())
    assert shape == (3, 2) and rate == 44100
    assert flat.tolist() == [float(v) for v in samples]


def test_media_pointers_metadata_only(spark):
    from stupp_exclusion_etl_spark.operators.multimodal import (
        attach_media_pointers,
        fetch_payloads,
    )

    d = table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 40)
    p = attach_media_pointers(d, "doc_id", "text")
    assert "payload" not in p.columns  # no inline bytes at 100 TB
    rows = p.select("doc_id", "text", "media_ref", "media").collect()
    for r in rows:
        assert r.media_ref.uri.startswith("s3://media-bucket/stripe-")
        assert r.media_ref.length == len(r.text.encode())
        assert 0 <= r.media_ref.offset < 4 * 1024 * 1024
        assert r.media.n_bytes == r.media_ref.length
    with pytest.raises(NotImplementedError):
        fetch_payloads(p, "doc_id")


def _real_png(w: int, h: int) -> bytes:
    """A spec-correct PNG header: signature + IHDR with a REAL zlib
    CRC32 — proves the parser reads actual PNG structure, not just our
    own synthesized bytes."""
    import struct
    import zlib

    body = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    chunk = b"IHDR" + body
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(body))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _real_jpeg(w: int, h: int) -> bytes:
    """Minimal real JPEG structure: SOI, a JFIF APP0, a COM segment
    (forces the SOF scan past variable-length segments), SOF0 with the
    geometry, EOI."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"padding"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def _real_gif(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _real_bmp(w: int, h: int) -> bytes:
    import struct

    return (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
    )


def test_parse_image_meta_real_headers(spark):
    """Catalyst-only parser vs real handcrafted files of every
    fixed-offset format, plus an unknown blob."""
    from stupp_exclusion_etl_spark.operators.multimodal import parse_image_meta

    rows = [
        (1, _real_png(640, 480)),
        (2, _real_gif(320, 200)),
        (3, _real_bmp(800, 600)),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r.id: (r.m.fmt, r.m.width, r.m.height)
        for r in df.select("id", parse_image_meta(F.col("payload")).alias("m")).collect()
    }
    assert got == {
        1: ("png", 640, 480),
        2: ("gif", 320, 200),
        3: ("bmp", 800, 600),
        4: ("unknown", None, None),
    }
    # pure Catalyst: no Python eval node in the plan
    plan = (
        df.select(parse_image_meta(F.col("payload")).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_image_meta_scan_jpeg_and_mixed(spark):
    """Arrow-batched scan chases JPEG's SOF past APP0/COM segments and
    handles a mixed-format corpus in one stage."""
    from stupp_exclusion_etl_spark.operators.multimodal import image_meta_scan

    rows = [
        (1, _real_jpeg(1920, 1080)),
        (2, _real_png(64, 32)),
        (3, _real_gif(10, 20)),
        (4, b"\xff\xd8\xff\xd9"),  # JPEG with no SOF: fmt known, dims null
        (5, b"junk"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r.id: (r.fmt, r.width, r.height) for r in image_meta_scan(df, "id").collect()
    }
    assert got == {
        1: ("jpeg", 1920, 1080),
        2: ("png", 64, 32),
        3: ("gif", 10, 20),
        4: ("jpeg", None, None),
        5: ("unknown", None, None),
    }


def test_png_payload_roundtrip_matches_stdlib_parse(spark):
    """png_payload's bytes must parse identically via the pure-Python
    header parser AND the Catalyst parser."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _header_geometry,
        parse_image_meta,
        png_payload,
    )

    df = spark.range(1, 6).select(
        F.col("id"),
        png_payload((F.col("id") * 100).cast("int"), (F.col("id") * 50).cast("int")).alias("payload"),
    )
    rows = df.select("id", "payload", parse_image_meta(F.col("payload")).alias("m")).collect()
    for r in rows:
        assert _header_geometry(bytes(r.payload)) == ("png", r.id * 100, r.id * 50)
        assert (r.m.fmt, r.m.width, r.m.height) == ("png", r.id * 100, r.id * 50)
