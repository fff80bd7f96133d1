"""S5 dataset readers + F4 anchor extraction + J5 weak labels, against the
deterministic eval fixtures (fixtures.generate_eval_datasets). Goldens are
hand-derived from the fixture construction rules."""

import json

import pytest
from pyspark.sql import functions as F

from refined_spark.fixtures import generate_eval_datasets
from refined_spark.sources.anchors import (
    clean_anchor_links,
    extract_anchors,
    strip_anchor_tags,
    weak_label_main_entity,
)
from refined_spark.sources.datasets import (
    read_aida_jsonl,
    read_standard_jsonl,
    read_webqsp_jsonl,
)


@pytest.fixture(scope="module")
def evalfix(tmp_path_factory):
    out = tmp_path_factory.mktemp("evalfix")
    return generate_eval_datasets(str(out), n_docs=40, seed=7)


@pytest.fixture(scope="module")
def maps(spark, evalfix):
    red = spark.read.json(evalfix["redirects"],
                          schema="src_title string, dest_title string")
    wq = spark.read.json(evalfix["wiki_qcode"],
                         schema="wiki_title string, qcode string")
    dis = spark.read.json(evalfix["disambig"], schema="qcode string")
    return red, wq, dis


def test_aida_reader_policies(spark, evalfix, maps):
    red, wq, dis = maps
    out = read_aida_jsonl(spark, evalfix["aida"], *maps)
    spans = out["spans"].collect()
    assert spans, "no gold spans parsed"
    # filter_not_in_kb: no unmappable titles, no disambiguation qcodes
    dis_set = {r.qcode for r in dis.collect()}
    for r in spans:
        assert r.qcode is not None and r.qcode not in dis_set
        assert not r.title.startswith("No_Such_Page")
    # redirect-only titles resolved through the hop
    redirected = [r for r in spans if r.title.endswith("_(old)")]
    assert redirected, "fixture guarantees redirect-only links"
    # span_text really is text[start:start+length]
    docs = {r.doc_id: r.text for r in out["docs"].collect()}
    for r in spans:
        assert docs[r.doc_id][r.start:r.start + r.length] == r.span_text
    # md_spans keep NIL/unlinked mentions too (include_mentions_for_nil)
    assert out["md_spans"].count() > len(spans)

    # filter_not_in_kb=False keeps them as Q0
    loose = read_aida_jsonl(spark, evalfix["aida"], red, wq, dis,
                            filter_not_in_kb=False)["spans"]
    assert loose.where(F.col("qcode") == "Q0").count() > 0


def test_standard_reader_nil_handling(spark, evalfix, maps):
    out = read_standard_jsonl(spark, evalfix["standard"], *maps)
    raw = [json.loads(l) for l in open(evalfix["standard"])]
    n_mentions = sum(len(r["mentions"]) for r in raw)
    n_nil = sum(1 for r in raw for m in r["mentions"]
                if m["wiki_name"] in (None, "NIL"))
    assert out["md_spans"].count() == n_mentions
    spans = out["spans"]
    assert spans.count() <= n_mentions - n_nil
    # titles with spaces were underscored before the join
    assert spans.where(F.col("title").contains(" ")).count() == 0


def test_webqsp_reader_zip(spark, evalfix):
    out = read_webqsp_jsonl(spark, evalfix["webqsp"])
    raw = [json.loads(l) for l in open(evalfix["webqsp"])]
    assert out["spans"].count() == sum(len(r["mentions"]) for r in raw)
    docs = {r.doc_id: r.text for r in out["docs"].collect()}
    for r in out["spans"].collect():
        assert docs[r.doc_id][r.start:r.start + r.length] == r.span_text
        assert r.qcode.startswith("Q")


def test_anchor_offsets_rebased(spark, evalfix):
    """F4 invariant: clean_text[start:end] == surface_form for every
    extracted anchor (the reference's delta_string_length bookkeeping,
    merge_files_and_extract_links.py:52-68)."""
    pages = spark.read.json(
        evalfix["wikipages"],
        schema="title string, text string, "
               "md_spans array<struct<start:long,ln:long,text:string>>",
    )
    docs = pages.select(F.col("title").alias("doc_id"), "text")
    anchors = extract_anchors(docs).collect()
    assert anchors
    clean = {r.doc_id: r.text for r in strip_anchor_tags(docs).collect()}
    for a in anchors:
        assert clean[a.doc_id][a.start:a.end] == a.surface_form, a
    # offsets rebased: at least one anchor's raw-text position differs
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert any(raw[a.doc_id][a.start:a.end] != a.surface_form for a in anchors)


def test_anchor_uri_canonicalization(spark, evalfix, maps):
    """%20-encoded URIs and lowercase-first titles map to the same qcodes
    as their plain forms; redirect-only URIs resolve through the hop."""
    pages = spark.read.json(
        evalfix["wikipages"],
        schema="title string, text string, "
               "md_spans array<struct<start:long,ln:long,text:string>>",
    )
    docs = pages.select(F.col("title").alias("doc_id"), "text")
    cleaned = clean_anchor_links(extract_anchors(docs), *maps)
    rows = cleaned.collect()
    assert rows
    wq = {r.wiki_title: r.qcode for r in maps[1].collect()}
    for r in rows:
        assert r.qcode in set(wq.values())
        assert "%" not in r.title and " " not in r.title


def test_weak_label_main_entity(spark, evalfix, maps):
    red, wq, dis = maps
    pages = spark.read.json(
        evalfix["wikipages"],
        schema="title string, text string, "
               "md_spans array<struct<start:long,ln:long,text:string>>",
    )
    docs = pages.select(F.col("title").alias("doc_id"), "title", "text")
    md = pages.select(
        F.col("title").alias("doc_id"), F.explode("md_spans").alias("sp")
    ).select("doc_id", F.col("sp.start").alias("start"),
             F.col("sp.ln").alias("ln"), F.col("sp.text").alias("text"))
    hyper = clean_anchor_links(
        extract_anchors(docs.select("doc_id", "text")), red, wq, dis
    ).select("doc_id", "start", (F.col("end") - F.col("start")).alias("ln"),
             F.col("surface_form").alias("text"), "qcode")
    meta = spark.read.json(evalfix["entity_meta"],
                           schema="qcode string, label string")
    humans = spark.read.json(evalfix["humans"], schema="qcode string")
    out = weak_label_main_entity(
        docs.select("doc_id", "title"), md, hyper, red, wq, meta, humans
    )
    rows = out.collect()
    wq_map = {r.wiki_title: r.qcode for r in wq.collect()}
    human_set = {r.qcode for r in humans.collect()}

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        main_q = wq_map.get(doc_id)
        # offset-0 rule: the md span at start 0 carries the page qcode
        zero = [s for s in spans if s.start == 0]
        if main_q is not None:
            assert zero and zero[0].qcode == main_q, (doc_id, spans)
        # surname rule: humans' later surname mention also labeled
        if main_q in human_set:
            assert sum(1 for s in spans if s.qcode == main_q) >= 2, spans
        # the non-matching 'yesterday' md span never gets a label
        assert not any(s.text == "yesterday" for s in spans)
        # no overlapping output spans (J6 merged correctly)
        ivs = sorted((s.start, s.start + s.ln) for s in spans)
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 <= a2, (doc_id, ivs)
