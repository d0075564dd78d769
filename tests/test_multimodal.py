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
    with pytest.raises(Exception, match="BMP, WAV, PNG, GIF, or baseline"):
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


# --- baseline JPEG codec ----------------------------------------------------


def _block_img(w, h, seed=37):
    img_bx = (np.arange(w) // 8).reshape(1, -1)
    img_by = (np.arange(h) // 8).reshape(-1, 1)
    return ((seed + 7 * img_bx + 13 * img_by) % 256).astype(np.uint8)


def test_jpeg_roundtrip_block_constant_exact():
    """With the all-ones quant table, block-constant images survive the
    full entropy-coded round trip EXACTLY (DC = 8*(v-128) is integral,
    AC quantize to 0) — the closed-form contract the
    mm_jpeg_decode_block_stats oracle relies on."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
        _header_geometry,
    )

    for w, h, seed in ((8, 8, 0), (24, 16, 37), (40, 32, 250), (16, 48, 129)):
        img = _block_img(w, h, seed)
        payload = _encode_jpeg_gray(img)
        assert _header_geometry(payload) == ("jpeg", w, h)
        (dh, dw, nc), flat = _decode_jpeg_pixels(payload)
        assert (dh, dw, nc) == (h, w, 1)
        assert np.array_equal(flat.reshape(h, w), img.astype(float))


def test_jpeg_roundtrip_arbitrary_within_one():
    """Arbitrary images: all-ones quant only rounds DCT coefficients,
    so reconstruction is within 1 grey level — exercises nonzero AC
    runs, ZRL, negative DC diffs, and FF byte stuffing."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    payload = _encode_jpeg_gray(img)
    assert b"\xff\x00" in payload  # stuffing actually exercised
    (h, w, _), flat = _decode_jpeg_pixels(payload)
    assert np.abs(flat.reshape(h, w) - img.astype(float)).max() <= 1.0


def test_jpeg_decoder_rejects_out_of_scope_features():
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    payload = bytearray(_encode_jpeg_gray(_block_img(8, 8)))
    sof = payload.index(b"\xff\xc0")
    oversampled = bytearray(payload)
    oversampled[sof + 11] = 0x33  # 3x3 sampling factors: out of scope
    with pytest.raises(NotImplementedError, match="sampling factors"):
        _decode_jpeg_pixels(bytes(oversampled))
    # SOF3 decodes since r13 (test_jpeg_lossless_roundtrip_all_
    # predictors); the still-out-of-scope SOFs remain guarded
    arith = bytes(payload[:sof + 1]) + b"\xc9" + bytes(payload[sof + 2:])
    with pytest.raises(NotImplementedError, match="arithmetic"):
        _decode_jpeg_pixels(arith)
    # subsampled lossless is spec-legal but guarded
    sub = bytearray(payload)
    sub[sof + 1] = 0xC3
    sub[sof + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampled lossless"):
        _decode_jpeg_pixels(bytes(sub))


def test_jpeg_12bit_precision_decode():
    """SOF1 extended sequential at 12-bit precision: level shift 2048,
    clip ceiling 4095, full-coverage Huffman tables for the wider
    DC/AC size categories. Block-constant even values with q=2 round
    trip exactly; random 12-bit content stays within quantization
    noise."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    rng = np.random.default_rng(5)
    q = np.full((8, 8), 2.0)
    vals = rng.integers(0, 2048, (2, 3)) * 2  # even ⇒ DC/2 integral
    px = np.repeat(np.repeat(vals.astype(float), 8, 0), 8, 1)
    (h, w, n), flat = _decode_jpeg_pixels(
        _encode_jpeg_gray(px, q, precision=12)
    )
    assert (h, w, n) == (16, 24, 1)
    assert np.array_equal(np.asarray(flat).reshape(h, w), px)
    rnd = rng.integers(0, 4096, (16, 24)).astype(float)
    (_, _, _), flat = _decode_jpeg_pixels(
        _encode_jpeg_gray(rnd, q, precision=12)
    )
    assert np.abs(np.asarray(flat).reshape(16, 24) - rnd).max() <= 8
    with pytest.raises(ValueError, match="quant"):
        _encode_jpeg_gray(px, np.ones((8, 8)), precision=12)


def test_jpeg_16bit_quant_table_decode():
    """DQT with Pq=1 (16-bit entries) parses and decodes identically
    to the same table written 8-bit."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (16, 16)).astype(float)
    base = bytearray(_encode_jpeg_gray(px))
    i = base.index(b"\xff\xdb")
    seglen = int.from_bytes(base[i + 2 : i + 4], "big")
    entries = b"".join((1).to_bytes(2, "big") for _ in range(64))
    wide = (
        b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10" + entries
    )
    pay16 = bytes(base[:i]) + wide + bytes(base[i + 2 + seglen :])
    (_, _, _), f16 = _decode_jpeg_pixels(pay16)
    (_, _, _), f8 = _decode_jpeg_pixels(bytes(base))
    assert np.array_equal(f16, f8)


def test_wav_g711_decode_both_laws():
    """G.711 table expansion: μ-law and A-law byte sweeps decode to
    the spec formulas for every code point, through the real RIFF
    chunk walk (fmt codes 7 and 6)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_wav_samples,
        _g711_table,
    )

    data = bytes(range(256))
    for law, code in (("u", 7), ("a", 6)):
        fmt = (
            code.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        )
        payload = (
            b"RIFF" + (292).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + (256).to_bytes(4, "little") + data
        )
        (n, ch), rate, s = _decode_wav_samples(payload)
        assert (n, ch, rate) == (256, 1, 8000)
        assert np.array_equal(s, _g711_table(law).astype(float))
    # μ-law spec anchors: 0xFF encodes +0, 0x7F encodes -0
    ul = _g711_table("u")
    assert ul[0xFF] == 0 and ul[0x7F] == 0
    # 16-bit-aligned expansion, the G.711 software convention
    assert ul.min() == -32124 and ul.max() == 32124
    # A-law full-scale magnitude at the same alignment
    assert _g711_table("a").max() == 32256


def test_jpeg_420_subsampled_decode():
    """Real MCU geometry (4 Y blocks + Cb + Cr per MCU, per-component
    DC prediction, nearest-neighbor chroma reconstruction): with
    block-constant planes and all-ones quant the round trip is exact
    against the closed-form YCbCr→RGB conversion of the replicated
    chroma; random content stays within DCT integer-rounding
    tolerance."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_420,
    )

    rng = np.random.default_rng(3)
    h, w = 32, 48

    def expected(y, cb, cr):
        cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1)
        crf = np.repeat(np.repeat(cr, 2, 0), 2, 1)
        return np.clip(np.round(np.stack([
            y + 1.402 * (crf - 128.0),
            y - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0),
            y + 1.772 * (cbf - 128.0),
        ], axis=-1)), 0, 255)

    def blocky(rows, cols):
        return np.repeat(
            np.repeat(
                rng.integers(0, 256, (rows, cols)).astype(float), 8, 0
            ), 8, 1,
        )

    y, cb, cr = blocky(h // 8, w // 8), blocky(h // 16, w // 16), blocky(
        h // 16, w // 16
    )
    (hh, ww, nc), flat = _decode_jpeg_pixels(_encode_jpeg_420(y, cb, cr))
    assert (hh, ww, nc) == (h, w, 3)
    assert np.array_equal(
        np.asarray(flat).reshape(h, w, 3), expected(y, cb, cr)
    )

    y = rng.integers(0, 256, (h, w)).astype(float)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(float)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(float)
    (_, _, _), flat = _decode_jpeg_pixels(_encode_jpeg_420(y, cb, cr))
    diff = np.abs(np.asarray(flat).reshape(h, w, 3) - expected(y, cb, cr))
    assert diff.max() <= 3.0


def test_jpeg_progressive_decodes_identical_to_baseline():
    """SOF2 six-scan script (DC first/refine at Al=1→0, AC first/
    refine over bands [1,5] and [6,63] with EOBn runs): successive
    approximation restores every coefficient exactly, so progressive
    and baseline decodes of the same pixels must be bit-identical."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
        _encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(11)
    for h, w in ((8, 8), (16, 24), (48, 40)):
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        q = np.ones((8, 8))
        q[0, 1], q[1, 0] = 2, 3
        (hb, wb, cb), pb = _decode_jpeg_pixels(_encode_jpeg_gray(img, q))
        (hp, wp, cp), pp = _decode_jpeg_pixels(
            _encode_jpeg_gray_progressive(img, q)
        )
        assert (hb, wb, cb) == (hp, wp, cp) == (h, w, 1)
        assert np.array_equal(pb, pp)
    # smooth gradient + coarse quant: long zero runs exercise the EOBn
    # accumulation and refinement correction-bit paths
    yy, xx = np.mgrid[0:32, 0:32]
    img = (128 + 60 * np.sin(xx / 10.0) * np.cos(yy / 14.0)).astype(np.uint8)
    q = np.full((8, 8), 16.0)
    (_, _, _), pb = _decode_jpeg_pixels(_encode_jpeg_gray(img, q))
    (_, _, _), pp = _decode_jpeg_pixels(_encode_jpeg_gray_progressive(img, q))
    assert np.array_equal(pb, pp)


def test_jpeg_progressive_block_constant_exact():
    """All-ones quant + block-constant image: DC = 8*(v-128) integral,
    AC = 0 — the closed-form oracle must hold through the progressive
    path exactly, like the baseline one."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray_progressive,
    )

    img = _block_img(24, 16)  # (w, h) → a 16x24 array
    (h, w, n), flat = _decode_jpeg_pixels(
        _encode_jpeg_gray_progressive(img)
    )
    assert (h, w, n) == (16, 24, 1)
    assert np.array_equal(flat.reshape(h, w), img.astype(float))


def test_jpeg_restart_intervals_decode():
    """DRI + RSTn: predictor reset and byte realignment per restart
    segment must reproduce the no-restart decode exactly, and a
    missing restart segment must fail loudly."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    with_rst = _encode_jpeg_gray(img, restart_interval=2)
    assert any(
        bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8)
    ), "restart markers actually emitted"
    (_, _, _), pd = _decode_jpeg_pixels(with_rst)
    (_, _, _), pl = _decode_jpeg_pixels(_encode_jpeg_gray(img))
    assert np.array_equal(pd, pl)
    # truncate away the final restart segment: decoder must not
    # silently decode garbage
    last_rst = max(
        with_rst.rfind(bytes([0xFF, 0xD0 + i])) for i in range(8)
    )
    with pytest.raises(ValueError):
        _decode_jpeg_pixels(with_rst[: last_rst + 2] + b"\xff\xd9")


def _encode_jpeg_3comp_neutral_chroma(px):
    """Spec-valid 3-component (YCbCr 1x1) baseline stream: Y from the
    image, Cb = Cr = 128 (zero after level shift) — decoded RGB must
    equal Y in all three channels."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _JPEG_STD_AC_BITS,
        _JPEG_STD_AC_VALS,
        _JPEG_STD_DC_BITS,
        _JPEG_STD_DC_VALS,
        _JPEG_ZIGZAG,
        _JpegBitWriter,
        _dct8_matrix,
        _huff_canonical,
    )

    h, w = px.shape
    enc_dc = {s: (c, ln) for (ln, c), s in
              _huff_canonical(_JPEG_STD_DC_BITS, _JPEG_STD_DC_VALS).items()}
    enc_ac = {s: (c, ln) for (ln, c), s in
              _huff_canonical(_JPEG_STD_AC_BITS, _JPEG_STD_AC_VALS).items()}

    def seg(m, body):
        return bytes([0xFF, m]) + (len(body) + 2).to_bytes(2, "big") + body

    head = b"\xff\xd8"
    head += seg(0xDB, b"\x00" + bytes([1] * 64))
    head += seg(0xC0, b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00")
    head += seg(0xC4, b"\x00" + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS))
    head += seg(0xC4, b"\x10" + bytes(_JPEG_STD_AC_BITS) + bytes(_JPEG_STD_AC_VALS))
    head += seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    wtr = _JpegBitWriter()
    a = _dct8_matrix()
    pred = [0, 0, 0]

    def put_block(ci, block):
        coeff = np.round(a @ (block - 128.0) @ a.T).astype(int)
        zz = coeff.reshape(-1)[list(_JPEG_ZIGZAG)]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = abs(diff).bit_length()
        code, ln = enc_dc[t]
        wtr.bits(code, ln)
        if t:
            wtr.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
        assert not zz[1:].any()  # constant blocks only in this helper
        code, ln = enc_ac[0x00]  # EOB
        wtr.bits(code, ln)

    neutral = np.full((8, 8), 128.0)
    for img_by in range(h // 8):
        for img_bx in range(w // 8):
            put_block(0, px[img_by * 8:img_by * 8 + 8,
                            img_bx * 8:img_bx * 8 + 8].astype(float))
            put_block(1, neutral)
            put_block(2, neutral)
    return head + wtr.finish() + b"\xff\xd9"


def test_jpeg_three_component_ycbcr_decode():
    from stupp_exclusion_etl_spark.operators.multimodal import _decode_jpeg_pixels

    img = _block_img(24, 16, 77)
    payload = _encode_jpeg_3comp_neutral_chroma(img)
    (h, w, nc), flat = _decode_jpeg_pixels(payload)
    assert (h, w, nc) == (16, 24, 3)
    rgb = flat.reshape(h, w, 3)
    for ch in range(3):
        assert np.array_equal(rgb[:, :, ch], img.astype(float))


def test_jpeg_through_decode_media_spark(spark):
    """End to end on the engine: synthesize per-row JPEGs in one Arrow
    stage, decode them in another, and check every pixel against the
    generator's closed form."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_media,
        synth_jpeg_gray,
    )

    src = spark.range(6).select(
        F.col("id"),
        (F.col("id") * 31 % 256).alias("seed"),
        F.lit(24).alias("w"),
        F.lit(16).alias("h"),
    )
    jp = synth_jpeg_gray(src, "id", "seed", "w", "h")
    rows = decode_media(jp, "id").collect()
    assert len(rows) == 6
    for r in rows:
        assert (r.kind, list(r.shape)) == ("jpeg", [16, 24, 1])
        got = np.array(r.data).reshape(16, 24)
        want = _block_img(24, 16, (r.id * 31) % 256).astype(float)
        assert np.array_equal(got, want), r.id


def test_jpeg_codec_property_roundtrip():
    """Property: ANY uint8 image (dims multiples of 8) survives the
    all-ones-quant baseline codec within one grey level, and any
    block-constant image survives EXACTLY — over random geometries and
    content, not just the handcrafted cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_gray,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.integers(1, 4),  # width in blocks
        st.integers(1, 4),  # height in blocks
        st.integers(0, 2**31 - 1),
    )
    def check(wb, hb, seed):
        rng = np.random.default_rng(seed)
        w, h = wb * 8, hb * 8
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        (dh, dw, _), flat = _decode_jpeg_pixels(_encode_jpeg_gray(img))
        assert (dh, dw) == (h, w)
        assert np.abs(flat.reshape(h, w) - img.astype(float)).max() <= 1.0
        const = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        (_, _, _), flat_c = _decode_jpeg_pixels(_encode_jpeg_gray(const))
        assert np.array_equal(flat_c.reshape(h, w), const.astype(float))

    check()


# ---------------------------------------------------------------------------
# PNG codec (r6): decoder pinned to the SPEC via hand-filtered golden
# bytes (independent of the encoder, so a symmetric encoder+decoder
# mistake cannot cancel out), then the encoder proven as its inverse.
# ---------------------------------------------------------------------------


def _hand_png(w, h, filtered_rows, depth=8, ctype=2, interlace=0):
    """Build PNG bytes directly (struct+zlib, NOT encode_png_rgb8) from
    already-filtered scanlines [(filter_type, bytes), ...]."""
    import struct
    import zlib

    from stupp_exclusion_etl_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    raw = b"".join(bytes([f]) + bytes(row) for f, row in filtered_rows)
    return (
        sig
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decoder_matches_spec_golden_all_filters():
    """Every scanline filter reconstructed against hand-computed spec
    arithmetic (w=2, h=5, one row per filter type)."""
    from stupp_exclusion_etl_spark.operators.multimodal import _decode_png_pixels

    filtered = [
        (0, [1, 2, 3, 4, 5, 6]),           # None
        (1, [10, 10, 10, 2, 3, 4]),        # Sub
        (2, [1, 2, 3, 10, 10, 10]),        # Up
        (3, [16, 16, 17, 13, 13, 13]),     # Average
        (4, [10, 10, 10, 10, 10, 10]),     # Paeth
    ]
    expect = [
        [1, 2, 3, 4, 5, 6],
        [10, 10, 10, 12, 13, 14],
        [11, 12, 13, 22, 23, 24],
        [21, 22, 23, 34, 35, 36],
        [31, 32, 33, 44, 45, 46],
    ]
    shape, flat = _decode_png_pixels(_hand_png(2, 5, filtered))
    assert shape == (5, 2, 3)
    got = flat.reshape(5, 6).astype(int).tolist()
    assert got == expect


def test_png_paeth_predictor_truth_table():
    from stupp_exclusion_etl_spark.operators.multimodal import _paeth

    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 5) == 20   # p=25: pb=5 smallest -> up
    assert _paeth(20, 10, 5) == 20   # p=25: pa=5 smallest -> left
    assert _paeth(10, 20, 30) == 10  # p=0: pa=10=pb tie -> left wins
    assert _paeth(100, 100, 1) == 100
    assert _paeth(5, 6, 10) == 5     # p=1: pa=4 < pb=5 -> left


def test_png_roundtrip_every_filter_and_random_pixels():
    """encode_png_rgb8 is the exact inverse of the spec-pinned decoder,
    for each fixed filter type and for the cycling default."""
    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_rgb8,
    )

    h, w = 7, 5
    px = ((np.arange(h * w * 3, dtype=np.int64) * 97 + 13) % 256).reshape(
        h, w, 3
    ).astype(np.uint8)
    for f in range(5):
        shape, flat = _decode_png_pixels(encode_png_rgb8(px, lambda y, f=f: f))
        assert shape == (h, w, 3)
        assert (flat.reshape(h, w, 3) == px).all(), f"filter {f}"
    shape, flat = _decode_png_pixels(encode_png_rgb8(px))  # cycle 0..4
    assert (flat.reshape(h, w, 3) == px).all()


def test_png_guards_and_corruption():
    import pytest

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_rgb8,
    )

    row = [(0, [0, 0, 0])]
    # every spec-legal (ctype, depth) pair DECODES since r12; a
    # non-spec combination (4-bit truecolor) is invalid DATA
    with pytest.raises(ValueError, match="not spec-valid"):
        _decode_png_pixels(_hand_png(1, 1, row, depth=4))
    # every SPEC color type decodes since r11; non-spec values are
    # invalid data, not a coverage guard
    with pytest.raises(ValueError, match="color type"):
        _decode_png_pixels(_hand_png(1, 1, row, ctype=7))
    # palette stream without its PLTE chunk is invalid
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png_pixels(_hand_png(1, 1, [(0, [0])], ctype=3))
    # interlace=1 DECODES since r7 (a 1x1 Adam7 stream is pass 1 only,
    # byte-identical to the sequential stream)
    shape, flat = _decode_png_pixels(_hand_png(1, 1, [(0, [7, 8, 9])],
                                               interlace=1))
    assert shape == (1, 1, 3) and flat.tolist() == [7.0, 8.0, 9.0]
    with pytest.raises(ValueError, match="interlace"):
        _decode_png_pixels(_hand_png(1, 1, row, interlace=2))
    import numpy as np

    good = bytearray(encode_png_rgb8(np.zeros((1, 1, 3), dtype=np.uint8)))
    good[20] ^= 0xFF  # flip a byte inside IHDR data -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        _decode_png_pixels(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png_pixels(b"BM123456")


# ---------------------------------------------------------------------------
# GIF codec (r6): LZW decoder pinned to HAND-DERIVED spec bitstreams
# (codes packed LSB-first by hand, independent of _lzw_encode), KwKwK
# corner, width growth + dictionary reset under stress, full-file
# round trip, and honest guards.
# ---------------------------------------------------------------------------


def test_gif_lzw_decoder_matches_hand_derived_spec_stream():
    """pixels [1,1,0,2] @ min_code=2: codes (CLEAR=4)(1)(1)(0) at 3
    bits, then — after table entry 8 is assigned — (2)(END=5) at 4
    bits; LSB-first packing gives bytes 4C 20 05 (derived by hand from
    the GIF LZW spec, not from the encoder)."""
    from stupp_exclusion_etl_spark.operators.multimodal import _lzw_decode

    assert _lzw_decode(bytes.fromhex("4c2005"), 2) == [1, 1, 0, 2]


def test_gif_lzw_decoder_kwkwk_case():
    """pixels [0,0,0]: the middle code (6) names a table entry that is
    being defined BY this very code — the KwKwK case. Hand-packed:
    codes (4)(0)(6)(5) at 3 bits -> bytes 84 0B."""
    from stupp_exclusion_etl_spark.operators.multimodal import _lzw_decode

    assert _lzw_decode(bytes.fromhex("840b"), 2) == [0, 0, 0]


def test_gif_lzw_roundtrip_width_growth_and_reset():
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    idx = [(i * 7919 + (i >> 3) * 31) % 16 for i in range(300_000)]
    enc = _lzw_encode(idx, 4)
    assert len(enc) < len(idx) // 10  # real compression, many resets
    assert _lzw_decode(enc, 4) == idx


def test_gif_file_roundtrip_and_palette():
    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_gif_pixels,
        _gif_palette,
        encode_gif_indexed,
    )

    w, h, seed, n = 23, 17, 5, 16
    idx = [(seed + p) % n for p in range(w * h)]
    shape, flat = _decode_gif_pixels(encode_gif_indexed(w, h, idx, n))
    assert shape == (h, w, 3)
    pal = _gif_palette(n)
    expect = np.array([pal[i] for i in idx], dtype=float).reshape(-1)
    assert (flat == expect).all()


def test_gif_guards():
    import pytest

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_gif_pixels,
        encode_gif_indexed,
    )

    plain = encode_gif_indexed(2, 2, [0, 1, 2, 3], 4)
    good = bytearray(plain)
    # flip the interlace bit in the image descriptor's packed byte:
    # since r7 this DECODES, and for h=2 the spec's pass order is the
    # identity (pass 1 row 0, pass 4 row 1), so pixels are unchanged
    pos = good.index(0x2C)
    good[pos + 9] |= 0x40
    _, flat_i = _decode_gif_pixels(bytes(good))
    _, flat_p = _decode_gif_pixels(plain)
    assert flat_i.tolist() == flat_p.tolist()
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif_pixels(b"PNG???")


# ---------------------------------------------------------------------------
# Interlacing (r7): Adam7 PNG and four-pass GIF, each pinned to a
# HAND-DERIVED pass layout (independent of the shared encoder/decoder
# helpers, so a symmetric grid mistake cannot cancel out).
# ---------------------------------------------------------------------------


def test_png_adam7_decoder_spec_golden_placement():
    """3x3 Adam7 stream hand-assembled in the spec's pass storage
    order — p1:(0,0)  p4:(0,2)  p5:(2,0),(2,2)  p6:(0,1),(2,1)
    p7:(1,0),(1,1),(1,2) (passes 2/3 empty at this size) — with pixel
    (y,x,c) = 100y+10x+c so any misplacement is visible. The decoder
    must scatter every stored scanline back to its grid position."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
    )

    def px(y, x):
        return [100 * y + 10 * x + c for c in range(3)]

    filtered = [
        (0, px(0, 0)),                        # pass 1
        (0, px(0, 2)),                        # pass 4
        (0, px(2, 0) + px(2, 2)),             # pass 5
        (0, px(0, 1)),                        # pass 6, row 0
        (0, px(2, 1)),                        # pass 6, row 2
        (0, px(1, 0) + px(1, 1) + px(1, 2)),  # pass 7
    ]
    shape, flat = _decode_png_pixels(_hand_png(3, 3, filtered, interlace=1))
    assert shape == (3, 3, 3)
    arr = flat.reshape(3, 3, 3).astype(int)
    for y in range(3):
        for x in range(3):
            assert arr[y][x].tolist() == px(y, x), (y, x)


def test_png_adam7_roundtrip_all_filters_and_sizes():
    """encode(interlace=True) inverts through the decoder for sizes
    that exercise all seven passes, sizes with empty passes, and every
    fixed filter type (filters run per-pass with prior reset)."""
    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_rgb8,
    )

    for h, w in [(13, 11), (10, 9), (8, 8), (2, 2), (1, 1), (5, 3)]:
        px = ((np.arange(h * w * 3, dtype=np.int64) * 31 + 7) % 256).reshape(
            h, w, 3
        ).astype(np.uint8)
        shape, flat = _decode_png_pixels(encode_png_rgb8(px, interlace=True))
        assert shape == (h, w, 3)
        assert (flat.reshape(h, w, 3) == px).all(), (h, w)
    px = ((np.arange(9 * 10 * 3, dtype=np.int64) * 13) % 256).reshape(
        9, 10, 3
    ).astype(np.uint8)
    for f in range(5):
        _, flat = _decode_png_pixels(
            encode_png_rgb8(px, lambda y, f=f: f, interlace=True)
        )
        assert (flat.reshape(9, 10, 3) == px).all(), f"filter {f}"


def test_gif_interlace_storage_order_matches_hand_derived_spec():
    """For h=8 the spec's four passes store rows as 0,4,2,6,1,3,5,7 —
    hard-coded here BY HAND, then checked against the LZW stream the
    interlaced encoder actually wrote (sub-blocks parsed and inflated
    directly, no decoder involved)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _lzw_decode,
        encode_gif_indexed,
    )

    w, h, n = 3, 8, 16
    natural = [y for y in range(h) for _x in range(w)]  # index = row no.
    b = encode_gif_indexed(w, h, natural, n, interlace=True)
    pos = 13 + 3 * n  # header + screen + global color table
    assert b[pos] == 0x2C and b[pos + 9] & 0x40
    pos += 10  # descriptor
    min_code = b[pos]
    pos += 1
    data = bytearray()
    while b[pos] != 0:
        ln = b[pos]
        data += b[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    stored = _lzw_decode(bytes(data), min_code)
    hand_order = [0, 4, 2, 6, 1, 3, 5, 7]
    assert stored == [y for y in hand_order for _x in range(w)]


def test_gif_interlaced_roundtrip_odd_height():
    """Interlaced decode equals the non-interlaced decode of the same
    frame for an odd height (h=7: passes 0 | 4 | 2,6 | 1,3,5)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_gif_pixels,
        encode_gif_indexed,
    )

    w, h, n = 5, 7, 8
    idx = [(3 + p * 5) % n for p in range(w * h)]
    _, flat_p = _decode_gif_pixels(encode_gif_indexed(w, h, idx, n))
    shape, flat_i = _decode_gif_pixels(
        encode_gif_indexed(w, h, idx, n, interlace=True)
    )
    assert shape == (h, w, 3)
    assert flat_i.tolist() == flat_p.tolist()


def test_jpeg_progressive_420_combined_decode():
    """PROGRESSIVE + SUBSAMPLED (the r7 guard, now implemented):
    the SOF2 4:2:0 stream — interleaved DC-first scan in MCU order,
    per-component full-band AC-first scans over each component's OWN
    ceil-dims block raster — must decode identically to the baseline
    4:2:0 stream of the same planes (spectral selection restores
    coefficients exactly), and a non-multiple-of-16 frame exercises
    the padded-grid ≠ ceil-dims index remap for real."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_420,
        _encode_jpeg_420_progressive,
    )

    def mk(h, w, seed):
        bx = (np.arange(w) // 8).reshape(1, -1)
        by = (np.arange(h) // 8).reshape(-1, 1)
        y = ((seed + 5 * bx + 11 * by) % 256).astype(float)
        h2, w2 = -(-h // 2), -(-w // 2)
        cx = (np.arange(w2) // 8).reshape(1, -1)
        cy = (np.arange(h2) // 8).reshape(-1, 1)
        cb = ((3 * seed + 7 * cx + 13 * cy) % 256).astype(float)
        cr = ((5 * seed + 3 * cx + 17 * cy) % 256).astype(float)
        return y, cb, cr

    # 16-multiple frame: progressive == baseline bit-for-bit
    y, cb, cr = mk(32, 48, 77)
    s0, p0 = _decode_jpeg_pixels(_encode_jpeg_420(y, cb, cr))
    s1, p1 = _decode_jpeg_pixels(_encode_jpeg_420_progressive(y, cb, cr))
    assert s0 == s1 == (32, 48, 3)
    assert np.array_equal(p0, p1)

    # 24x40: MCU grid (2x3) pads past the Y ceil grid (3x5) — the
    # non-interleaved AC walk must remap into the padded store; verify
    # against the closed-form converted block constants
    h, w, seed = 24, 40, 9
    y, cb, cr = mk(h, w, seed)
    s1, p1 = _decode_jpeg_pixels(_encode_jpeg_420_progressive(y, cb, cr))
    assert s1 == (h, w, 3)
    bx = (np.arange(w) // 8).reshape(1, -1)
    by = (np.arange(h) // 8).reshape(-1, 1)
    yv = (seed + 5 * bx + 11 * by) % 256
    cxp = ((np.arange(w) // 2) // 8).reshape(1, -1)
    cyp = ((np.arange(h) // 2) // 8).reshape(-1, 1)
    cbv = (3 * seed + 7 * cxp + 13 * cyp) % 256
    crv = (5 * seed + 3 * cxp + 17 * cyp) % 256
    exp = np.clip(np.round(np.stack([
        yv + 1.402 * (crv - 128.0),
        yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0),
        yv + 1.772 * (cbv - 128.0),
    ], axis=-1)), 0, 255)
    assert np.array_equal(np.asarray(p1).reshape(h, w, 3), exp)

    # random content within DCT integer-rounding tolerance
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (32, 32)).astype(float)
    cb = rng.integers(0, 256, (16, 16)).astype(float)
    cr = rng.integers(0, 256, (16, 16)).astype(float)
    sb, pb = _decode_jpeg_pixels(_encode_jpeg_420(y, cb, cr))
    sp, pp = _decode_jpeg_pixels(_encode_jpeg_420_progressive(y, cb, cr))
    assert sb == sp
    assert np.array_equal(pb, pp), (
        "spectral-selection progressive must restore the exact same "
        "coefficients as baseline"
    )


def test_jpeg_progressive_422_and_440_combined_decode():
    """PROGRESSIVE + 4:2:2 (and 4:4:0) — the last plausible-in-the-wild
    JPEG guard combination (VERDICT r8 task #8): the r8 unified MCU
    geometry already decodes any {1,2}x{1,2} sampling in either mode,
    so retiring it only needed encoder test-vectors. For both 2x1 and
    1x2 Y sampling: progressive decodes bit-identically to the
    baseline stream of the same planes, both at MCU-aligned dims and
    at a frame whose padded MCU grid exceeds the AC scans' ceil-dims
    rasters (the non-interleaved index remap)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_420,
        _encode_jpeg_420_progressive,
    )

    def mk(h, w, seed, hh, vv):
        bx = (np.arange(w) // 8).reshape(1, -1)
        by = (np.arange(h) // 8).reshape(-1, 1)
        y = ((seed + 5 * bx + 11 * by) % 256).astype(float)
        h2, w2 = -(-h // vv), -(-w // hh)
        cx = (np.arange(w2) // 8).reshape(1, -1)
        cy = (np.arange(h2) // 8).reshape(-1, 1)
        cb = ((3 * seed + 7 * cx + 13 * cy) % 256).astype(float)
        cr = ((5 * seed + 3 * cx + 17 * cy) % 256).astype(float)
        return y, cb, cr

    for samp in ((2, 1), (1, 2)):
        hh, vv = samp
        # MCU-aligned: progressive == baseline bit-for-bit
        h, w = 8 * vv * 2, 8 * hh * 3
        y, cb, cr = mk(h, w, 77, hh, vv)
        s0, p0 = _decode_jpeg_pixels(_encode_jpeg_420(y, cb, cr, samp=samp))
        s1, p1 = _decode_jpeg_pixels(
            _encode_jpeg_420_progressive(y, cb, cr, samp=samp)
        )
        assert s0 == s1 == (h, w, 3), samp
        assert np.array_equal(p0, p1), samp

        # non-MCU-aligned frame: padded grid != ceil-dims raster; the
        # progressive decode must still match the closed-form block
        # constants through YCbCr->RGB
        h = 8 * (2 * vv + 1)  # odd multiple of 8 along the vv axis
        w = 8 * (2 * hh + 1)
        seed = 9
        y, cb, cr = mk(h, w, seed, hh, vv)
        s1, p1 = _decode_jpeg_pixels(
            _encode_jpeg_420_progressive(y, cb, cr, samp=samp)
        )
        assert s1 == (h, w, 3), samp
        bx = (np.arange(w) // 8).reshape(1, -1)
        by = (np.arange(h) // 8).reshape(-1, 1)
        yv = (seed + 5 * bx + 11 * by) % 256
        cxp = ((np.arange(w) // hh) // 8).reshape(1, -1)
        cyp = ((np.arange(h) // vv) // 8).reshape(-1, 1)
        cbv = (3 * seed + 7 * cxp + 13 * cyp) % 256
        crv = (5 * seed + 3 * cxp + 17 * cyp) % 256
        want = np.stack(
            [
                yv + 1.402 * (crv - 128.0),
                yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0),
                yv + 1.772 * (cbv - 128.0),
            ],
            axis=-1,
        )
        want = np.clip(np.round(want), 0, 255).reshape(-1)
        assert np.array_equal(p1, want), samp


# ---------------------------------------------------------------------------
# PNG non-RGB color types (r11): palette / grayscale / alpha variants
# ---------------------------------------------------------------------------


def test_png_gray_and_palette_round_trip_all_filters():
    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_gray8,
        encode_png_palette8,
    )

    g = ((np.arange(9 * 7, dtype=np.int64) * 5 + 3) % 256).reshape(9, 7)
    pal = np.stack(
        [(np.arange(32) * 7) % 256, (np.arange(32) * 11) % 256,
         (np.arange(32) * 13) % 256], axis=1,
    ).astype(np.uint8)
    idx = (np.arange(9 * 7) % 32).reshape(9, 7)
    for f in range(5):  # pin each filter type alone, then the cycle
        shape, flat = _decode_png_pixels(
            encode_png_gray8(g, lambda y, f=f: f)
        )
        assert shape == (9, 7, 3)
        assert (flat.reshape(9, 7, 3) == g[:, :, None]).all()
        shape, flat = _decode_png_pixels(
            encode_png_palette8(idx, pal, filter_for_row=lambda y, f=f: f)
        )
        assert shape == (9, 7, 3)
        assert (flat.reshape(9, 7, 3) == pal[idx]).all()
    shape, flat = _decode_png_pixels(encode_png_gray8(g))  # cycle 0..4
    assert (flat.reshape(9, 7, 3) == g[:, :, None]).all()


def test_png_alpha_variants_round_trip():
    import numpy as np
    import pytest

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_graya8,
        encode_png_palette8,
        encode_png_rgba8,
    )

    # RGBA (color type 6): decoded verbatim as 4 channels
    rgba = ((np.arange(6 * 5 * 4) * 3) % 256).reshape(6, 5, 4)
    shape, flat = _decode_png_pixels(encode_png_rgba8(rgba))
    assert shape == (6, 5, 4)
    assert (flat.reshape(6, 5, 4) == rgba).all()
    # gray+alpha (color type 4): (g, a) -> (g, g, g, a)
    ga = ((np.arange(6 * 5 * 2) * 9 + 1) % 256).reshape(6, 5, 2)
    shape, flat = _decode_png_pixels(encode_png_graya8(ga))
    assert shape == (6, 5, 4)
    out = flat.reshape(6, 5, 4)
    assert (out[:, :, 0] == ga[:, :, 0]).all()
    assert (out[:, :, 1] == ga[:, :, 0]).all()
    assert (out[:, :, 2] == ga[:, :, 0]).all()
    assert (out[:, :, 3] == ga[:, :, 1]).all()
    # palette + tRNS: alpha per entry, opaque past the tRNS length
    pal = np.stack([np.arange(8) * 30] * 3, axis=1).astype(np.uint8)
    idx = (np.arange(4 * 4) % 8).reshape(4, 4)
    shape, flat = _decode_png_pixels(
        encode_png_palette8(idx, pal, trns=[0, 128, 255])
    )
    assert shape == (4, 4, 4)
    out = flat.reshape(4, 4, 4)
    assert (out[:, :, :3] == pal[idx]).all()
    exp = np.where(idx == 0, 0,
                   np.where(idx == 1, 128,
                            np.where(idx == 2, 255, 255)))
    assert (out[:, :, 3] == exp).all()
    # an index past the palette is corrupt data, loudly
    with pytest.raises(ValueError, match="palette index"):
        _decode_png_pixels(
            encode_png_palette8(np.full((2, 2), 9), pal[:4])
        )


def test_png16_round_trip_all_color_types():
    """Depth-16 decode (r12): byte-level filters with a 2-byte unit,
    big-endian sample reassembly to RAW 0..65535 (no rescale), the
    same channel expansion as 8-bit — for every 16-bit-legal color
    type (0/2/4/6; 16-bit palette is not spec-valid and is rejected
    as invalid data, not guarded)."""
    import numpy as np
    import pytest

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png16,
    )

    rng = np.random.RandomState(12)
    # truecolor 16: verbatim 3 channels
    px = rng.randint(0, 65536, size=(7, 6, 3)).astype(np.uint16)
    shape, flat = _decode_png_pixels(encode_png16(px, 2))
    assert shape == (7, 6, 3)
    assert (flat.reshape(7, 6, 3) == px).all()
    assert flat.max() > 255, "16-bit values must not be rescaled"
    # grayscale 16 → RGB replication
    g = rng.randint(0, 65536, size=(6, 5, 1)).astype(np.uint16)
    shape, flat = _decode_png_pixels(encode_png16(g, 0))
    assert shape == (6, 5, 3)
    assert (flat.reshape(6, 5, 3) == np.repeat(g, 3, axis=2)).all()
    # gray+alpha 16 → (g, g, g, a)
    ga = rng.randint(0, 65536, size=(5, 4, 2)).astype(np.uint16)
    shape, flat = _decode_png_pixels(encode_png16(ga, 4))
    out = flat.reshape(5, 4, 4)
    assert shape == (5, 4, 4)
    assert (out[:, :, :3] == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    assert (out[:, :, 3] == ga[:, :, 1]).all()
    # RGBA 16: verbatim 4 channels
    rgba = rng.randint(0, 65536, size=(4, 5, 4)).astype(np.uint16)
    shape, flat = _decode_png_pixels(encode_png16(rgba, 6))
    assert shape == (4, 5, 4)
    assert (flat.reshape(4, 5, 4) == rgba).all()
    # every filter type crosses the 2-byte unit: tall image cycles 0..4
    tall = rng.randint(0, 65536, size=(11, 3, 3)).astype(np.uint16)
    shape, flat = _decode_png_pixels(encode_png16(tall, 2))
    assert (flat.reshape(11, 3, 3) == tall).all()
    # 16-bit palette: invalid data, loud
    with pytest.raises(ValueError, match="palette"):
        _decode_png_pixels(_hand_png(1, 1, [(0, [0])], ctype=3, depth=16))


def test_png_packed_depths_round_trip():
    """1/2/4-bit packed PNG (r12 — the last PNG guard retired): bits
    unpack MSB-first from byte-padded rows, the filter unit is one
    byte, palette indices map through PLTE (+tRNS), grayscale raw
    values replicate to RGB unrescaled. Widths chosen so rows need
    bit padding; heights so every spec filter appears."""
    import numpy as np
    import pytest

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png_packed,
    )

    rng = np.random.RandomState(5)
    pal = np.stack([(np.arange(16) * 17) % 256,
                    (np.arange(16) * 29) % 256,
                    (np.arange(16) * 41) % 256], axis=1).astype(np.uint8)
    for depth in (1, 2, 4):
        g = rng.randint(0, 1 << depth, size=(11, 13))
        shape, flat = _decode_png_pixels(encode_png_packed(g, depth, 0))
        assert shape == (11, 13, 3)
        assert (flat.reshape(11, 13, 3)
                == np.repeat(g[:, :, None], 3, axis=2)).all()
        idx = rng.randint(0, min(16, 1 << depth), size=(7, 9))
        shape, flat = _decode_png_pixels(
            encode_png_packed(idx, depth, 3, plte=pal)
        )
        assert shape == (7, 9, 3)
        assert (flat.reshape(7, 9, 3) == pal[idx]).all()
    # palette + tRNS at depth 2: per-entry alpha, opaque past length
    idx = (np.arange(6 * 5) % 4).reshape(6, 5)
    shape, flat = _decode_png_pixels(
        encode_png_packed(idx, 2, 3, plte=pal[:4], trns=[9, 200])
    )
    assert shape == (6, 5, 4)
    out = flat.reshape(6, 5, 4)
    assert (out[:, :, 3] == np.where(idx == 0, 9,
                                     np.where(idx == 1, 200, 255))).all()
    # non-spec combination is invalid data
    with pytest.raises(ValueError, match="range"):
        encode_png_packed(np.full((2, 2), 4), 2, 0)


def test_png_packed_adam7_placement():
    """Adam7 + packed depth: each PASS packs its own rows to a byte
    boundary independently (spec) — a hand-assembled interlaced 1-bit
    stream must scatter back to the exact sequential image."""
    import struct
    import zlib

    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _ADAM7,
        _decode_png_pixels,
        _png_chunk,
    )

    rng = np.random.RandomState(9)
    w, h, depth = 10, 9, 1
    img = rng.randint(0, 2, size=(h, w))
    body = b""
    for y0, x0, dy, dx in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            bits = np.zeros(((len(row) + 7) // 8) * 8, dtype=np.uint8)
            bits[: len(row)] = row
            packed = np.packbits(bits).tobytes()
            body += b"\x00" + packed  # filter 0 per scanline
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
    b = (sig + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", zlib.compress(body))
         + _png_chunk(b"IEND", b""))
    shape, flat = _decode_png_pixels(b)
    assert shape == (h, w, 3)
    assert (flat.reshape(h, w, 3)[:, :, 0] == img).all()


def test_decode_audit_quarantines_per_record(spark):
    """VERDICT r12 task #2: decode_audit yields exactly ONE row per
    input record — ok rows identical to decode_media's output, each
    poison class mapped to its deterministic reason with the
    exception detail preserved — and a poisoned blob in the batch
    never fails the stage (the 100 TB retry-storm scenario)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_audit,
        decode_media,
        png_synthesize,
    )

    geom = spark.createDataFrame(
        [(i, 5 + i % 4, 6 + i % 3, i % 251) for i in range(10)],
        "doc_id long, w int, h int, seed int",
    )
    clean = png_synthesize(geom, "doc_id", "w", "h", "seed")
    cls = F.col("id") % 5
    poisoned = clean.withColumn(
        "payload",
        F.when(cls == 1, F.substring(F.col("payload"), 1, 20))
        .when(cls == 2, F.overlay(
            F.col("payload"), F.lit(b"\x00\x00\x00\x00"), F.lit(30)))
        .when(cls == 3, F.lit(b"\x00" * 8))
        .when(cls == 4, F.lit(None).cast("binary"))
        .otherwise(F.col("payload")),
    )
    rows = {r.id: r for r in decode_audit(poisoned, "id").collect()}
    assert sorted(rows) == list(range(10)), "one row per input record"
    want = {0: "ok", 1: "corrupt_payload", 2: "corrupt_payload",
            3: "unsupported_format", 4: "null_payload"}
    for i, r in rows.items():
        assert r.reason == want[i % 5], (i, r.reason, r.error)
    # reject rows carry the exception detail; ok rows carry none
    assert "struct.error" in rows[1].error or "error" in rows[1].error
    assert "CRC mismatch" in rows[2].error
    assert "NotImplementedError" in rows[3].error
    assert rows[4].error is None and rows[4].data is None
    assert rows[0].error is None
    # ok rows decode EXACTLY as the raise-on-failure path does
    ok_ref = {
        r.id: r
        for r in decode_media(clean.filter(cls == 0), "id").collect()
    }
    for i in (0, 5):
        assert rows[i].kind == "png"
        assert rows[i].shape == ok_ref[i].shape
        assert rows[i].data == ok_ref[i].data
    # ...while decode_media on the same poisoned mix DOES fail the
    # stage — the audit channel is the only way through dirty media
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_media(poisoned.filter(cls == 2), "id").collect()


def test_gif_partial_frame_compositing_and_disposal():
    """r13: the partial-frame GIF guard is retired. Multi-frame GIF89a
    with sub-rect frames composites onto the logical screen
    (disposal 1 leaves frames in place; a GCE transparent index
    leaves underlying pixels unchanged; disposal 2 restores the rect
    to background after the frame) — decoded canvases equal the
    numpy compositing model frame for frame."""
    import struct

    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_gif_pixels,
        _gif_palette,
        _lzw_encode,
        encode_gif_animated,
        gif_frame_rects,
    )

    w, h, seed, nc, nf = 9, 7, 5, 16, 3
    pal = np.array(_gif_palette(nc), float)
    shape, flat = _decode_gif_pixels(
        encode_gif_animated(w, h, seed, n_frames=nf, n_colors=nc)
    )
    assert shape == (nf, h, w, 3)
    canvas = np.empty((h, w, 3))
    canvas[:, :] = pal[0]
    want = []
    for f, (l, t, fw, fh) in enumerate(
        [(0, 0, w, h)] + gif_frame_rects(w, h, nf)
    ):
        idx = np.array(
            [(seed + 17 * f + p) % nc for p in range(fw * fh)]
        ).reshape(fh, fw)
        canvas[t : t + fh, l : l + fw] = pal[idx]
        want.append(canvas.copy())
    assert np.array_equal(np.asarray(flat), np.stack(want).reshape(-1))

    # transparency: frames >= 1 declare index 3 transparent — those
    # pixels must show through from the prior canvas
    shape2, flat2 = _decode_gif_pixels(
        encode_gif_animated(w, h, seed, n_frames=2, n_colors=nc,
                            transparent_from=3)
    )
    canvas = np.empty((h, w, 3))
    canvas[:, :] = pal[0]
    want2 = []
    for f, (l, t, fw, fh) in enumerate(
        [(0, 0, w, h)] + gif_frame_rects(w, h, 2)
    ):
        idx = np.array(
            [(seed + 17 * f + p) % nc for p in range(fw * fh)]
        ).reshape(fh, fw)
        rect = canvas[t : t + fh, l : l + fw]
        if f >= 1:
            m = idx != 3
            rect[m] = pal[idx][m]
        else:
            rect[:, :] = pal[idx]
        want2.append(canvas.copy())
    assert shape2 == (2, h, w, 3)
    assert np.array_equal(np.asarray(flat2), np.stack(want2).reshape(-1))

    # disposal 2 (restore to background), hand-assembled 4x3 stream:
    # frame 0 full, frame 1 rect (1,1,2,2) all color 3 under
    # disposal=2, frame 2 single pixel (0,0) color 2 — frame 2's
    # canvas must show the rect RESTORED to the background color 1
    sw, sh, bg = 4, 3, 1
    pal4 = np.array(_gif_palette(4), float)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 1, bg, 0)
    for r, g, bl in _gif_palette(4):
        out += bytes((r, g, bl))

    def frame(left, top, fw, fh, idx, disposal=0):
        seg = bytearray()
        if disposal:
            seg += bytes((0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0))
        seg += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        seg.append(2)
        data = _lzw_encode(idx, 2)
        for i in range(0, len(data), 255):
            seg.append(len(data[i : i + 255]))
            seg += data[i : i + 255]
        seg += b"\x00"
        return seg

    f0 = [p % 4 for p in range(sw * sh)]
    out += frame(0, 0, sw, sh, f0)
    out += frame(1, 1, 2, 2, [3, 3, 3, 3], disposal=2)
    out += frame(0, 0, 1, 1, [2])
    out += b"\x3b"
    shape3, flat3 = _decode_gif_pixels(bytes(out))
    assert shape3 == (3, sh, sw, 3)
    got = np.asarray(flat3).reshape(3, sh, sw, 3)
    c0 = pal4[np.array(f0).reshape(sh, sw)]
    assert np.array_equal(got[0], c0)
    c1 = c0.copy()
    c1[1:3, 1:3] = pal4[3]
    assert np.array_equal(got[1], c1)
    c2 = c0.copy()
    c2[1:3, 1:3] = pal4[bg]  # disposal 2 restored the rect
    c2[0, 0] = pal4[2]
    assert np.array_equal(got[2], c2)

    # restore-to-previous (disposal 3, r14 — guard retired): frame 1
    # paints a rect under disposal=3, frame 2 a single pixel. Frame
    # 2's canvas must show frame 1's rect RESTORED to the PRE-frame-1
    # canvas (frame 0's pixels, NOT the background color — the
    # distinction from disposal 2 this fixture exists to pin).
    out3 = bytearray(b"GIF89a")
    out3 += struct.pack("<HHBBB", sw, sh, 0x80 | 1, bg, 0)
    for r, g, bl in _gif_palette(4):
        out3 += bytes((r, g, bl))
    out3 += frame(0, 0, sw, sh, f0)
    out3 += frame(1, 1, 2, 2, [3, 3, 3, 3], disposal=3)
    out3 += frame(0, 0, 1, 1, [2])
    out3 += b"\x3b"
    shape4, flat4 = _decode_gif_pixels(bytes(out3))
    assert shape4 == (3, sh, sw, 3)
    got3 = np.asarray(flat4).reshape(3, sh, sw, 3)
    assert np.array_equal(got3[0], c0)
    d1 = c0.copy()
    d1[1:3, 1:3] = pal4[3]
    assert np.array_equal(got3[1], d1)
    d2 = c0.copy()  # rect restored to frame 0's pixels, not bg
    d2[0, 0] = pal4[2]
    assert np.array_equal(got3[2], d2)


def test_jpeg_lossless_roundtrip_all_predictors():
    """r13: the lossless-JPEG guard is retired. SOF3 round trip is
    EXACT (the point of process 14) for every spec predictor 1-7 at
    8/12/16-bit precision, with the point transform, and through the
    extreme-DIFF category-16 path; boundary prediction follows Annex
    H.1.2 (default first sample, left on row 0, above on column 0)."""
    import numpy as np

    from stupp_exclusion_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_lossless,
    )

    rng = np.random.RandomState(7)
    for pred in range(1, 8):
        for prec in (8, 12, 16):
            h, w = 9, 11
            px = rng.randint(0, 1 << prec, size=(h, w))
            shape, flat = _decode_jpeg_pixels(
                _encode_jpeg_lossless(px, predictor=pred, precision=prec)
            )
            assert shape == (h, w, 1)
            assert np.array_equal(
                np.asarray(flat).reshape(h, w).astype(np.int64), px
            ), (pred, prec)
    # point transform: Al low bits drop at encode, decode scales back
    px = rng.randint(0, 256, size=(6, 5))
    _shape, flat = _decode_jpeg_pixels(
        _encode_jpeg_lossless(px, predictor=4, precision=8,
                              point_transform=2)
    )
    assert np.array_equal(
        np.asarray(flat).reshape(6, 5).astype(np.int64), (px >> 2) << 2
    )
    # extreme alternation at 16-bit exercises the +-32768 wrap
    px = np.zeros((4, 4), np.int64)
    px[::2, ::2] = 65535
    px[1::2, 1::2] = 65535
    _shape, flat = _decode_jpeg_pixels(
        _encode_jpeg_lossless(px, predictor=1, precision=16)
    )
    assert np.array_equal(
        np.asarray(flat).reshape(4, 4).astype(np.int64), px
    )
    # genuinely-out-of-scope shapes stay guarded
    b = bytearray(_encode_jpeg_lossless(px, predictor=1, precision=16))
    sof = b.find(b"\xff\xc3")
    b[sof + 1] = 0xC5  # SOF5: differential sequential (hierarchical)
    with pytest.raises(NotImplementedError, match="hierarchical"):
        _decode_jpeg_pixels(bytes(b))


def test_decode_audit_observed_metrics(spark):
    """VERDICT r13 polish #7 (A20 twin): decode_audit_observed
    surfaces per-reason quarantine counts through df.observe — the
    listener-backed Observation mechanism — during the SAME action
    that consumes the audit frame, and the metrics equal the frame's
    own groupBy(reason) rollup (no second decode pass, no extra
    job)."""
    from stupp_exclusion_etl_spark.operators.multimodal import (
        decode_audit_observed,
        png_synthesize,
    )

    geom = spark.createDataFrame(
        [(i, 5 + i % 4, 6 + i % 3, i % 251) for i in range(10)],
        "doc_id long, w int, h int, seed int",
    )
    clean = png_synthesize(geom, "doc_id", "w", "h", "seed")
    cls = F.col("id") % 5
    poisoned = clean.withColumn(
        "payload",
        F.when(cls == 1, F.substring(F.col("payload"), 1, 20))
        .when(cls == 2, F.overlay(
            F.col("payload"), F.lit(b"\x00\x00\x00\x00"), F.lit(30)))
        .when(cls == 3, F.lit(b"\x00" * 8))
        .when(cls == 4, F.lit(None).cast("binary"))
        .otherwise(F.col("payload")),
    )
    audited, obs = decode_audit_observed(poisoned, "id")
    by_reason = {
        r.reason: r.n
        for r in audited.groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    m = obs.get  # populated by the action above — no extra job
    assert m["n_records"] == 10
    assert m["n_ok"] == by_reason["ok"] == 2
    assert m["n_corrupt_payload"] == by_reason["corrupt_payload"] == 4
    assert (
        m["n_unsupported_format"]
        == by_reason["unsupported_format"]
        == 2
    )
    assert m["n_null_payload"] == by_reason["null_payload"] == 2
