"""Multimodal column operators: real header parsing + byte features,
stubbed decode plumbing (schema/batch-shape contracts)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import Row

from clinical_data_lake_spark.llm import multimodal as mm


def _png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    # SOI + APP0 stub + SOF0 with dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03\x00\x00\x00"
    return b"\xff\xd8" + app0 + sof0


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, content=_png_bytes(640, 480)),
        Row(media_id=2, content=_jpeg_bytes(1920, 1080)),
        Row(media_id=3, content=b"RIFF" + b"\x00" * 4 + b"WAVE" + b"\x00" * 32),
        Row(media_id=4, content=b"\x00" * 100),  # opaque blob
        Row(media_id=5, content=None),
    ]
    return spark.createDataFrame(rows, schema="media_id long, content binary")


def test_probe_media_metadata(spark, media):
    got = {r.media_id: r.meta for r in mm.probe_media_metadata(media).collect()}
    assert got[1].media_type == "image/png" and (got[1].width, got[1].height) == (640, 480)
    assert got[2].media_type == "image/jpeg" and (got[2].width, got[2].height) == (1920, 1080)
    assert got[3].media_type == "audio/wav" and got[3].valid
    assert got[4].media_type == "application/octet-stream"
    assert got[5].media_type == "unknown" and not got[5].valid and got[5].n_bytes == 0


def test_byte_histogram_entropy_closed_forms(spark):
    df = spark.createDataFrame(
        [
            Row(media_id=1, content=bytes(range(256)) * 4),  # uniform -> 8 bits
            Row(media_id=2, content=b"\x07" * 512),  # constant -> 0 bits
        ],
        schema="media_id long, content binary",
    )
    got = {r.media_id: r for r in mm.byte_histogram_features(df).collect()}
    assert got[1].entropy == pytest.approx(8.0)
    assert got[2].entropy == pytest.approx(0.0)
    assert got[1].n_bytes == 1024
    assert len(got[1].features) == 64
    assert sum(got[1].features) == pytest.approx(1.0)
    # constant byte 0x07 falls in bin 1 (64 bins of width 4)
    assert got[2].features[1] == pytest.approx(1.0)


def test_resize_images_stub_contract(spark, media):
    out = mm.resize_images(media.filter("content IS NOT NULL"), width=4, height=3)
    rows = out.collect()
    assert {r.media_id for r in rows} == {1, 2, 3, 4}
    for r in rows:
        assert (r.width, r.height) == (4, 3)
        assert len(r.pixels) == 4 * 3 * 3
        assert all(0 <= p <= 255 for p in r.pixels)
    # deterministic: same content -> same pixels across runs
    again = {r.media_id: r.pixels for r in
             mm.resize_images(media.filter("content IS NOT NULL"), 4, 3).collect()}
    assert {r.media_id: r.pixels for r in rows} == again


def test_sample_frames_shape(spark, media):
    out = mm.sample_frames(media, n_frames=4)
    rows = out.collect()
    assert len(rows) == 5 * 4  # one row per (blob, frame)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_idx for r in by_id[1]) == [0, 1, 2, 3]
    # frames of a non-empty blob reassemble a prefix of the original
    png = _png_bytes(640, 480)
    frames = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert b"".join(bytes(f.frame) for f in frames) == png[: len(png) // 4 * 4]


def test_synthesize_media_from_text(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="héllo")])
    got = mm.synthesize_media_from_text(docs).collect()[0]
    assert bytes(got.content) == "héllo".encode()
    assert got.media_id == 1


def _jpeg_progressive_padded(w: int, h: int) -> bytes:
    # SOI, 0xFF fill bytes before markers, DRI standalone-length segment,
    # a restart-range marker region is not valid pre-SOS, so emulate the
    # hard cases: fill padding + APP0 + progressive SOF2
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03\x00\x00\x00"
    return b"\xff\xd8" + b"\xff" * 3 + app0 + b"\xff\xff" + sof2


def _jpeg_arithmetic(w: int, h: int) -> bytes:
    sof9 = b"\xff\xc9" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03\x00\x00\x00"
    return b"\xff\xd8" + sof9


def _jpeg_no_sof() -> bytes:
    # SOI + APP0 then straight to EOI: structurally JPEG, no dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    return b"\xff\xd8" + app0 + b"\xff\xd9"


def test_probe_jpeg_hardened_variants(spark):
    rows = [
        Row(media_id=1, content=_jpeg_progressive_padded(800, 600)),
        Row(media_id=2, content=_jpeg_arithmetic(320, 240)),
        Row(media_id=3, content=_jpeg_no_sof()),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, content binary")
    got = {r.media_id: r.meta for r in mm.probe_media_metadata(df).collect()}
    assert got[1].valid and (got[1].width, got[1].height) == (800, 600)
    assert got[2].valid and (got[2].width, got[2].height) == (320, 240)
    assert got[3].media_type == "image/jpeg" and not got[3].valid


def test_byte_histogram_rejects_non_divisor_bins(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, content=b"\x00\x01")], schema="media_id long, content binary"
    )
    with pytest.raises(ValueError, match="bins"):
        mm.byte_histogram_features(df, bins=100)
