"""Labeled eval-dataset readers (operator S5) — Spark re-expression of the
reference's dataset factory.

The reference stream-parses three JSONL shapes into Doc objects:
  - AIDA:     /root/reference/src/refined/dataset_reading/entity_linking/
              dataset_factory.py:21-114 — spans carry candidate `uris`;
              the reader keeps the first en.wikipedia.org URI, maps
              title -> qcode, and (optionally) drops NIL / disambiguation
              entities while keeping every mention as an md_span.
  - standard: dataset_factory.py:116-184 (MSNBC/AQUAINT/ACE2004/CWEB/WIKI)
              — spans carry `wiki_name` ("NIL"/null = unlinked).
  - WebQSP:   dataset_factory.py:262-320 — parallel arrays of [start,end]
              offsets and qcodes (no title mapping needed).

Here each reader is one spark.read.json scan with an explicit schema (no
inference pass) -> explode -> title canonicalization (redirect hop J2 +
title->qcode J3 via sources.dumps.title_with_redirects) -> NIL policy
filters (P4). Everything is built-in column expressions; the only joins
are against the (dimension-sized) redirect and title->qcode tables, which
AQE broadcasts. doc_id is md5(text): deterministic, partition-order-free,
and computable by the DuckDB oracle.

Output contract (all three readers):
  docs(doc_id, text)
  spans(doc_id, start, length, span_text, qcode[, title]) — gold-labeled
  md_spans(doc_id, start, length, span_text) — every annotated mention,
      including NIL ones (the input to P8's nil-span filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from refined_spark.sources.dumps import title_with_redirects

WIKI_PREFIX = "http://en.wikipedia.org/wiki/"

AIDA_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("start", LongType()),
        StructField("length", LongType()),
        StructField("uris", ArrayType(StringType())),
    ]))),
])

STANDARD_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("mentions", ArrayType(StructType([
        StructField("start", LongType()),
        StructField("length", LongType()),
        StructField("wiki_name", StringType()),
    ]))),
])

WEBQSP_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("mentions", ArrayType(ArrayType(LongType()))),
    StructField("wikidata_id", ArrayType(StringType())),
])


def _finalize_gold(
    cand: DataFrame,
    disambiguation_qcodes: DataFrame | None,
    filter_not_in_kb: bool,
) -> DataFrame:
    """Shared NIL policy (dataset_factory.py:66-73 / :146-153):
    filter_not_in_kb=True drops unmappable titles and disambiguation
    pages; False keeps them with qcode='Q0'."""
    if filter_not_in_kb:
        out = cand.where(F.col("qcode").isNotNull())
        if disambiguation_qcodes is not None:
            out = out.join(
                disambiguation_qcodes.select("qcode"), "qcode", "left_anti"
            )
        return out
    return cand.withColumn("qcode", F.coalesce("qcode", F.lit("Q0")))


def read_aida_jsonl(
    spark: SparkSession,
    path: str,
    redirects: DataFrame,
    wiki_to_qcode: DataFrame,
    disambiguation_qcodes: DataFrame | None = None,
    filter_not_in_kb: bool = True,
    include_mentions_for_nil: bool = True,
) -> dict[str, DataFrame]:
    """AIDA-CoNLL-shaped JSONL -> {docs, spans, md_spans}.
    Mirrors dataset_factory.py:21-114: keep the first en.wikipedia URI per
    span, chase one redirect hop, map title->qcode, apply the
    NIL/disambiguation policy. include_mentions_for_nil=True registers
    EVERY span as an md_span (the reference's NIL-recall bookkeeping)."""
    raw = spark.read.json(path, schema=AIDA_SCHEMA)
    docs = raw.select(F.md5("text").alias("doc_id"), "text", "spans")

    ex = docs.select("doc_id", "text", F.explode("spans").alias("sp")).select(
        "doc_id",
        F.col("sp.start").alias("start"),
        F.col("sp.length").alias("length"),
        F.substring("text", F.col("sp.start") + 1, F.col("sp.length")).alias("span_text"),
        F.try_element_at(
            F.transform(
                F.filter(F.col("sp.uris"), lambda u: u.contains(WIKI_PREFIX)),
                lambda u: F.replace(u, F.lit(WIKI_PREFIX), F.lit("")),
            ),
            F.lit(1),
        ).alias("title"),
    )
    md_spans = ex.select("doc_id", "start", "length", "span_text") if \
        include_mentions_for_nil else None

    linked = ex.where(F.col("title").isNotNull())
    mapped = title_with_redirects(linked, redirects, wiki_to_qcode, title_col="title")
    spans = _finalize_gold(mapped, disambiguation_qcodes, filter_not_in_kb)
    if md_spans is None:
        md_spans = spans.select("doc_id", "start", "length", "span_text")
    return {"docs": docs.select("doc_id", "text"), "spans": spans,
            "md_spans": md_spans}


def read_standard_jsonl(
    spark: SparkSession,
    path: str,
    redirects: DataFrame,
    wiki_to_qcode: DataFrame,
    disambiguation_qcodes: DataFrame | None = None,
    filter_not_in_kb: bool = True,
) -> dict[str, DataFrame]:
    """MSNBC/AQUAINT/ACE2004/CWEB/WIKI-shaped JSONL -> {docs, spans,
    md_spans}. Mirrors dataset_factory.py:116-184: every mention is an
    md_span; wiki_name null/'NIL' means unlinked; titles get spaces
    replaced by underscores before the redirect/qcode joins."""
    raw = spark.read.json(path, schema=STANDARD_SCHEMA)
    docs = raw.select(F.md5("text").alias("doc_id"), "text", "mentions")

    ex = docs.select("doc_id", "text", F.explode("mentions").alias("sp")).select(
        "doc_id",
        F.col("sp.start").alias("start"),
        F.col("sp.length").alias("length"),
        F.substring("text", F.col("sp.start") + 1, F.col("sp.length")).alias("span_text"),
        F.col("sp.wiki_name").alias("wiki_name"),
    )
    md_spans = ex.select("doc_id", "start", "length", "span_text")

    linked = ex.where(
        F.col("wiki_name").isNotNull() & (F.col("wiki_name") != "NIL")
    ).withColumn("title", F.replace("wiki_name", F.lit(" "), F.lit("_"))).drop("wiki_name")
    mapped = title_with_redirects(linked, redirects, wiki_to_qcode, title_col="title")
    spans = _finalize_gold(mapped, disambiguation_qcodes, filter_not_in_kb)
    return {"docs": docs.select("doc_id", "text"), "spans": spans,
            "md_spans": md_spans}


def read_webqsp_jsonl(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """WebQSP-shaped JSONL -> {docs, spans, md_spans}. Mirrors
    dataset_factory.py:262-320: parallel `mentions` [start,end] and
    `wikidata_id` arrays zip positionally; qcodes come straight from the
    file (no title mapping)."""
    raw = spark.read.json(path, schema=WEBQSP_SCHEMA)
    docs = raw.select(F.md5("text").alias("doc_id"), "text", "mentions",
                      "wikidata_id")
    ex = docs.select(
        "doc_id", "text",
        F.explode(F.arrays_zip("mentions", "wikidata_id")).alias("z"),
    ).select(
        "doc_id",
        F.element_at("z.mentions", 1).alias("start"),
        (F.element_at("z.mentions", 2) - F.element_at("z.mentions", 1)).alias("length"),
        F.substring(
            "text",
            F.element_at("z.mentions", 1) + 1,
            F.element_at("z.mentions", 2) - F.element_at("z.mentions", 1),
        ).alias("span_text"),
        F.col("z.wikidata_id").alias("qcode"),
    )
    return {
        "docs": docs.select("doc_id", "text"),
        "spans": ex,
        "md_spans": ex.select("doc_id", "start", "length", "span_text"),
    }
