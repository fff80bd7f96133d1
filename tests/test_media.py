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
