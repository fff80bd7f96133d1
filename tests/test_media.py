"""Multimodal plumbing: media span extraction, mapInPandas decode stub,
resize bookkeeping, and the byte-identity of media spans under pipeline."""

import pyspark.sql.functions as F


def test_media_extraction_and_decode(spark, tables):
    from refined_spark.operators.media import decode_media, media_from_documents, FEATURE_DIM

    media = media_from_documents(tables["documents"])
    n = media.count()
    assert n > 0  # fixtures interleave ~10% media spans
    decoded = decode_media(media)
    rows = decoded.limit(5).collect()
    for r in rows:
        assert r.media_ref.startswith("img://")
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.features) == FEATURE_DIM
    assert decoded.count() == n


def test_decode_deterministic(spark, tables):
    from refined_spark.operators.media import decode_media, media_from_documents

    media = media_from_documents(tables["documents"]).limit(10)
    a = sorted((r.media_ref, r.features) for r in decode_media(media).collect())
    b = sorted((r.media_ref, r.features) for r in decode_media(media).collect())
    assert a == b


def test_resize_plan(spark, tables):
    from refined_spark.operators.media import decode_media, media_from_documents, resize_plan

    decoded = decode_media(media_from_documents(tables["documents"]).limit(20))
    plan = resize_plan(decoded, max_side=100).collect()
    for r in plan:
        assert max(r.out_width, r.out_height) <= 100
        assert 0 < r.scale <= 1.0


def test_stub_gate(spark, tables, monkeypatch):
    import pytest

    from refined_spark.operators.media import _decode_stub

    monkeypatch.setenv("REFINED_SPARK_ALLOW_MEDIA_STUB", "0")
    with pytest.raises(NotImplementedError):
        _decode_stub(b"bytes", "img://x")


def test_png_real_decode(spark, monkeypatch):
    """PNG payloads are decoded FOR REAL (IHDR parse), end-to-end through
    the Spark decode UDF and resize_plan — even with the stub disabled —
    against checked-in PNG files of known dimensions."""
    import os

    from refined_spark.operators.media import (
        decode_media,
        parse_png_header,
        resize_plan,
    )

    data = os.path.join(os.path.dirname(__file__), "data")
    px1 = open(os.path.join(data, "one_pixel.png"), "rb").read()
    px32 = open(os.path.join(data, "three_by_two.png"), "rb").read()
    assert parse_png_header(px1) == (1, 1)
    assert parse_png_header(px32) == (3, 2)
    assert parse_png_header(b"not a png at all, definitely") is None

    monkeypatch.setenv("REFINED_SPARK_ALLOW_MEDIA_STUB", "0")  # PNG path is real
    media = spark.createDataFrame(
        [("d1", "img://one", "image", bytearray(px1), None),
         ("d2", "img://three", "image", bytearray(px32), None)],
        "doc_id string, media_ref string, media_type string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int>",
    )
    rows = {r.media_ref: r for r in decode_media(media).collect()}
    assert (rows["img://one"].width, rows["img://one"].height) == (1, 1)
    assert (rows["img://three"].width, rows["img://three"].height) == (3, 2)
    plan = {r.media_ref: r for r in
            resize_plan(decode_media(media), max_side=2).collect()}
    # 3x2 scales by 2/3; 1x1 is already under the cap
    assert plan["img://one"].scale == 1.0
    assert (plan["img://three"].out_width, plan["img://three"].out_height) == (2, 2)


def test_jpeg_real_decode(spark, monkeypatch):
    """JPEG payloads are decoded FOR REAL (SOFn marker scan), end-to-end
    through the Spark decode UDF and resize_plan — even with the stub
    disabled — against checked-in minimal-but-valid baseline JPEGs
    (grayscale, one 8x8 MCU, trivial one-code Huffman tables) of known
    dimensions, plus in-memory progressive/robustness cases."""
    import os
    import struct

    from refined_spark.operators.media import (
        decode_media,
        parse_jpeg_header,
        resize_plan,
    )

    data = os.path.join(os.path.dirname(__file__), "data")
    j1 = open(os.path.join(data, "one_pixel.jpg"), "rb").read()
    j53 = open(os.path.join(data, "five_by_three.jpg"), "rb").read()
    assert parse_jpeg_header(j1) == (1, 1)
    assert parse_jpeg_header(j53) == (5, 3)

    # progressive SOF2 behind an APP1 + fill byte + COM segment
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    prog = (b"\xff\xd8" + seg(0xE1, b"Exif\x00\x00" + b"x" * 20) + b"\xff"
            + seg(0xFE, b"a comment")
            + seg(0xC2, b"\x08" + struct.pack(">HH", 37, 53)
                  + b"\x01\x01\x11\x00"))
    assert parse_jpeg_header(prog) == (53, 37)
    # DHT (C4) must NOT be mistaken for a frame header
    dht_first = (b"\xff\xd8"
                 + seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
                 + seg(0xC0, b"\x08" + struct.pack(">HH", 9, 7)
                       + b"\x01\x01\x11\x00"))
    assert parse_jpeg_header(dht_first) == (7, 9)
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None   # EOI before SOF
    assert parse_jpeg_header(b"not a jpeg") is None
    assert parse_jpeg_header(None) is None

    monkeypatch.setenv("REFINED_SPARK_ALLOW_MEDIA_STUB", "0")  # JPEG is real
    media = spark.createDataFrame(
        [("d1", "img://j1", "image", bytearray(j1), None),
         ("d2", "img://j53", "image", bytearray(j53), None)],
        "doc_id string, media_ref string, media_type string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int>",
    )
    rows = {r.media_ref: r for r in decode_media(media).collect()}
    assert (rows["img://j1"].width, rows["img://j1"].height) == (1, 1)
    assert (rows["img://j53"].width, rows["img://j53"].height) == (5, 3)
    plan = {r.media_ref: r for r in
            resize_plan(decode_media(media), max_side=4).collect()}
    # 5x3 scales by 4/5 -> 4x3 (ceil of 2.4); 1x1 stays
    assert plan["img://j1"].scale == 1.0
    assert (plan["img://j53"].out_width, plan["img://j53"].out_height) == (4, 3)
