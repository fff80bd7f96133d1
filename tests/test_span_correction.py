"""P5 span correction + F6 date range split + J9/P8 eval bookkeeping —
golden cases hand-derived from the reference rules."""

from pyspark.sql import functions as F

from refined_spark.operators.dates import split_date_ranges
from refined_spark.operators.metrics import filter_nil_spans, gold_recall
from refined_spark.operators.spans import correct_spans


def _spans(spark, rows):
    return spark.createDataFrame(
        [(d, s, len(t), t) for d, s, t in rows],
        "doc_id string, start long, ln long, text string",
    )


def test_correct_spans_goldens(spark):
    """Each case mirrors general_utils.py:144-209."""
    out = correct_spans(_spans(spark, [
        ("d1", 10, '"Quoted'),          # unbalanced lead quote stripped
        ("d1", 80, 'Trail"'),           # unbalanced trail quote stripped
        ("d1", 30, '"Both"'),           # balanced -> untouched
        ("d2", 50, "\nAlpha\n"),        # newline strip both sides
        ("d2", 60, "\n\nBeta"),         # two leading newlines
        ("d3", 5, "the"),               # dropped
        ("d3", 7, "x"),                 # single char dropped
        ("d3", 9, "\n\n"),              # pure newlines dropped
        ("d3", 11, "\nthe\n"),          # strips to 'the' -> dropped
        ("d4", 0, "Title\n\nFirst mention"),  # glued split
        ("d5", 3, "ok"),                # len 2 passes untouched
    ])).collect()
    got = sorted((r.doc_id, r.start, r.ln, r.text) for r in out)
    assert got == sorted([
        ("d1", 11, 6, "Quoted"),
        ("d1", 80, 5, "Trail"),
        ("d1", 30, 6, '"Both"'),
        ("d2", 51, 5, "Alpha"),
        ("d2", 62, 4, "Beta"),
        ("d4", 0, 5, "Title"),
        ("d4", 7, 13, "First mention"),
        ("d5", 3, 2, "ok"),
    ])


def test_split_date_ranges_offsets(spark):
    dm = spark.createDataFrame(
        [("m1", "1988 to 1999"), ("m2", "20/01/2020"),
         ("m3", "1988 -- 1990"), ("m4", "May 1 - June 2")],
        "mention_id string, text string",
    )
    out = {(r.mention_id, r.part_idx): (r.part_text, r.part_offset)
           for r in split_date_ranges(dm).collect()}
    assert out[("m1", 0)] == ("1988", 0)
    assert out[("m1", 1)] == ("1999", 8)
    assert out[("m2", 0)] == ("20/01/2020", 0)
    assert out[("m3", 0)] == ("1988", 0)
    assert out[("m3", 1)] == ("1990", 8)
    assert out[("m4", 0)] == ("May 1", 0)
    assert out[("m4", 1)] == ("June 2", 8)
    # every part's offset indexes back into the original span text
    texts = {r.mention_id: r.text for r in dm.collect()}
    for (mid, _), (part, off) in out.items():
        assert texts[mid][off:off + len(part)] == part


def test_gold_recall_counts(spark):
    gold = spark.createDataFrame(
        [("m1", "Q1"), ("m2", "Q2"), ("m3", "Q3")], "mention_id string, qcode string"
    )
    cands = spark.createDataFrame(
        [("m1", "Q1"), ("m1", "Q9"), ("m2", "Q8"), ("m3", "Q3"), ("m3", "Q3")],
        "mention_id string, qcode string",
    )
    row = gold_recall(gold, cands).collect()[0]
    assert (row.n_gold, row.n_gold_in_candidates) == (3, 2)
    assert abs(row.gold_recall - round(2 / 3, 6)) < 1e-12


def test_filter_nil_spans(spark):
    md = spark.createDataFrame(
        [("d1", "Acme", 0, None), ("d1", "Bob", 10, "Q5")],
        "doc_id string, span_text string, start long, qcode string",
    )
    pred = spark.createDataFrame(
        [("d1", "Acme", 0, "Q9"),   # aligns with NIL span -> dropped
         ("d1", "Bob", 10, "Q5"),   # aligns with linked span -> kept
         ("d1", "Acme", 99, "Q9")],  # different offset -> kept
        "doc_id string, span_text string, start long, qcode string",
    )
    kept = {(r.span_text, r.start) for r in filter_nil_spans(pred, md).collect()}
    assert kept == {("Bob", 10), ("Acme", 99)}
