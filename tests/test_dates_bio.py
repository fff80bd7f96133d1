"""F6/F7/C10 date resolution and C6 BIO decoding."""

import pyspark.sql.functions as F

from refined_spark.operators.bio import decode_bio
from refined_spark.operators.dates import (
    format_parsed_string,
    parse_date_py,
    resolve_date_spans,
)


def test_parse_date_kernel():
    d = parse_date_py("5 June 1988")
    assert (d["day"], d["month"], d["year"]) == (5, 6, 1988)
    assert d["known_format"] is True
    d = parse_date_py("late June 1988")
    assert (d["day"], d["month"], d["year"]) == (None, 6, 1988)
    d = parse_date_py("13/05/1999")
    assert (d["day"], d["month"]) == (13, 5)  # forced day-first (13 > 12)
    d = parse_date_py("05/06/1999")
    assert d["ambiguous"] is True and (d["day"], d["month"]) == (6, 5)
    assert parse_date_py("not a date at all") is None
    assert parse_date_py(None) is None


def test_doc_format_consensus(spark):
    rows = [
        # doc A contains an unambiguous day-first date -> 05/06 flips to day-first
        ("A", "m1", "13/05/1999"),
        ("A", "m2", "05/06/1999"),
        # doc B has only the ambiguous one -> stays month-first (dateutil default)
        ("B", "m3", "05/06/1999"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, mention_id string, text string")
    out = {r.mention_id: r.date for r in resolve_date_spans(df).collect()}
    assert (out["m1"].day, out["m1"].month) == (13, 5)
    assert (out["m2"].day, out["m2"].month) == (5, 6)  # re-parsed day-first
    assert (out["m3"].day, out["m3"].month) == (6, 5)  # month-first default


def test_parsed_string(spark):
    df = spark.createDataFrame(
        [("A", "m1", "June 1988")], "doc_id string, mention_id string, text string"
    )
    out = format_parsed_string(resolve_date_spans(df)).collect()[0]
    assert out.parsed_string == "1988-06-??"


def test_bio_decode(spark):
    rows = [
        # doc1: "Barack Obama visited Paris" -> PER(0,12), LOC(21,5)
        ("d1", 0, 0, 6, "B-PER"),
        ("d1", 1, 7, 12, "I-PER"),
        ("d1", 2, 13, 20, "O"),
        ("d1", 3, 21, 26, "B-LOC"),
        # doc2: malformed I- without B starts a span
        ("d2", 0, 0, 5, "I-ORG"),
        ("d2", 1, 6, 10, "I-ORG"),
        ("d2", 2, 11, 15, "O"),
        # doc2: type change inside I-run starts a new span
        ("d2", 3, 16, 20, "I-PER"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, token_idx int, start int, end int, tag string"
    )
    got = {(r.doc_id, r.start, r.ln, r.coarse_type) for r in decode_bio(df).collect()}
    assert got == {
        ("d1", 0, 12, "PER"),
        ("d1", 21, 5, "LOC"),
        ("d2", 0, 10, "ORG"),
        ("d2", 16, 4, "PER"),
    }


def test_weak_tagger_roundtrip_and_aida_e2e(spark, tmp_path):
    """The C6 producer: weak_label_bio_tags over the AIDA fixture docs,
    decode_bio back to spans, and the DECODED spans (not the gold ones)
    re-derive every mention surface via substring — the EL-mode loop
    reader -> tags -> decode -> mentions runs end-to-end."""
    from refined_spark.fixtures import generate_eval_datasets
    from refined_spark.operators.bio import decode_bio, weak_label_bio_tags
    from refined_spark.sources.datasets import read_aida_jsonl

    fx = generate_eval_datasets(str(tmp_path), n_docs=25, seed=11)
    red = spark.read.json(fx["redirects"],
                          schema="src_title string, dest_title string")
    wq = spark.read.json(fx["wiki_qcode"],
                         schema="wiki_title string, qcode string")
    out = read_aida_jsonl(spark, fx["aida"], red, wq, None)
    docs, md = out["docs"], out["md_spans"]

    tags = weak_label_bio_tags(docs, md.select("doc_id", "start",
                                               F.col("length").alias("ln")))
    decoded = decode_bio(tags)

    gold = {(r.doc_id, r.start, r.length) for r in md.collect()}
    got = {(r.doc_id, r.start, r.ln) for r in decoded.collect()}
    assert got == gold  # token-aligned spans round-trip exactly

    # mentions FROM DECODED SPANS: surfaces must equal the gold span texts
    mentions = decoded.join(docs, "doc_id").select(
        "doc_id", "start",
        F.expr("substring(text, start + 1, ln)").alias("surface"),
    )
    gold_surf = {(r.doc_id, r.start, r.span_text) for r in md.collect()}
    got_surf = {(r.doc_id, r.start, r.surface) for r in mentions.collect()}
    assert got_surf == gold_surf
