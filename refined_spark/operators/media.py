"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs; all
transforms run as Arrow-batched pandas UDFs over mapInPandas so executors
stream record batches without materializing whole partitions. The actual
codec work (decode/resize/frame-sample) is STUBBED — no image/audio
libraries ship in this container — behind `_decode_stub`, which produces a
deterministic fake so the Spark-side plumbing (schema, batching, partition
behavior) is real and tested. Swap `_decode_stub` for PIL/ffmpeg calls in a
real deployment; nothing else changes.

Schema contract:
    media(doc_id string, media_ref string, media_type string,
          payload binary, meta struct<width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_png_header(payload: bytes) -> tuple[int, int] | None:
    """REAL (pure-Python, no external libs) PNG dimension decode: verify the
    8-byte signature and that the first chunk is IHDR, then read width and
    height as the two big-endian uint32s at bytes 16-24 (PNG spec — RFC
    2083 §3.1/§4.1.1). Returns None for non-PNG payloads (the caller falls
    back to the stub for formats whose codecs don't ship here)."""
    import struct

    if payload is None or len(payload) < 24:
        return None
    if payload[:8] != _PNG_MAGIC or payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    if width <= 0 or height <= 0:
        return None
    return width, height


_JPEG_SOI = b"\xff\xd8"
# SOFn markers carry the frame header (dims); C4=DHT, C8=JPG, CC=DAC are
# NOT frame headers despite living in the C0-CF range (JPEG T.81 B.1.1.3)
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def parse_jpeg_header(payload: bytes | None) -> tuple[int, int] | None:
    """REAL (pure-Python, no external libs) JPEG dimension decode: walk the
    marker-segment stream from SOI, skipping APPn/COM/DQT/DHT/... segments
    by their big-endian length fields, until the first SOFn frame header
    (baseline C0, extended C1, progressive C2, lossless C3, and the
    differential/arithmetic variants C5-CF minus DHT/JPG/DAC), whose body
    is precision(1) + height(2 BE) + width(2 BE) (ITU T.81 §B.2.2).
    Returns (width, height), or None for non-JPEG / truncated payloads
    (the caller falls back to the stub)."""
    if payload is None or len(payload) < 4 or payload[:2] != _JPEG_SOI:
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None  # desynced — not a marker where one must be
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2) — resync
            i += 1
            continue
        # standalone markers (no length field)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if i + 9 > n:
                return None
            height = int.from_bytes(payload[i + 5:i + 7], "big")
            width = int.from_bytes(payload[i + 7:i + 9], "big")
            if width <= 0 or height <= 0:
                return None
            return width, height
        i += 2 + seg_len
    return None


def _decode_stub(payload: bytes | None, media_ref: str) -> dict:
    """Decode one media payload. PNG and JPEG dimensions are decoded FOR
    REAL (parse_png_header / parse_jpeg_header — pure-Python IHDR parse and
    SOFn marker scan), so resize_plan downstream computes from actual pixel
    dimensions. Everything else — other formats, and the feature vector (a
    model's job, not a codec's) — is a deterministic disclosed stand-in
    derived from the payload/ref hash. Replace with PIL/ffmpeg calls in
    production — raise if someone ships the stub path: set
    REFINED_SPARK_ALLOW_MEDIA_STUB=0 to turn the fallback into
    NotImplementedError (PNG/JPEG decode still works: it is real)."""
    import os

    h = (
        hashlib.md5(((media_ref or "") + "|").encode("utf-8")).digest()
        if payload is None
        else hashlib.md5(payload).digest()
    )
    feats = [((h[i % 16] / 255.0) * 2 - 1) for i in range(FEATURE_DIM)]
    if payload is not None:
        dims = parse_png_header(payload) or parse_jpeg_header(payload)
        if dims is not None:
            return {"width": dims[0], "height": dims[1], "features": feats}
    if os.environ.get("REFINED_SPARK_ALLOW_MEDIA_STUB", "1") != "1":
        raise NotImplementedError(
            "non-PNG/JPEG media decoding requires PIL/ffmpeg")
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "features": feats,
    }


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one batch of
    (doc_id, media_ref, width, height, features) out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(p, r)
                for p, r in zip(pdf["payload"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_ref": pdf["media_ref"].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.mapInPandas(fn, DECODED_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved documents table into the
    media schema (payload null — refs point at external object storage; at
    100 TB media bytes never travel through the documents table)."""
    s = documents.select("doc_id", F.explode("spans").alias("sp"))
    return s.where(F.col("sp.kind") == "media").select(
        "doc_id",
        F.col("sp.media_ref").alias("media_ref"),
        F.lit("image").alias("media_type"),
        F.lit(None).cast(BinaryType()).alias("payload"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize bookkeeping (scale factors + output dims) — pure column math;
    the pixel work would live in the decode UDF in production."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "doc_id",
        "media_ref",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )
