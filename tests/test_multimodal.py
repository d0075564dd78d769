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


def test_decode_stubs_raise(spark):
    d = _docs(spark)
    with pytest.raises(NotImplementedError):
        decode_media(d, "doc_id")
    with pytest.raises(NotImplementedError):
        resize_images(d, "doc_id", 32, 32)


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
