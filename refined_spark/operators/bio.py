"""BIO tag-sequence decoding (operator C6) — mention detection output to
character spans, expressed with window functions.

Reference: token-level BIO tags are decoded to (start, length, type) spans,
where a malformed I without a preceding B still STARTS a span
(/root/reference/src/refined/utilities/md_dataset_utils.py:136-192).

Distributed shape: tokens(doc_id, token_idx, start, end, tag) where tag is
'B-TYPE' | 'I-TYPE' | 'O'. A span starts at a token whose tag is B-*, or
I-* whose previous tag is O / different type / first token. A running sum
of start flags over the doc-ordered window yields a segment id; spans are
one groupBy over (doc_id, segment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tokenize_with_offsets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> tokens(doc_id, token_idx, start, end, token).
    Split on the single space character, so every separator is exactly one
    char and token offsets are an exact prefix sum of len(token)+1 — the
    same window prefix-sum shape as the anchor offset rebasing
    (sources/anchors.py); no Python, one shuffle on doc_id. Empty tokens
    (consecutive spaces) are dropped AFTER the offsets are fixed, so
    remaining offsets stay exact."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split(text_col, " ")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    start = F.coalesce(
        F.sum(F.length("token") + 1).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        toks.withColumn("start", start.cast("int"))
        .where(F.length("token") > 0)
        .withColumn(
            "token_idx",
            F.row_number().over(w) - 1,
        )
        .select(
            "doc_id", "token_idx", "start",
            (F.col("start") + F.length("token")).alias("end"), "token",
        )
    )


def weak_label_bio_tags(
    docs: DataFrame,
    spans: DataFrame,
    coarse_type: str = "MENTION",
    text_col: str = "text",
) -> DataFrame:
    """Dictionary/weak-label BIO tagger — the producer for decode_bio (C6).
    The reference's mention detector is the standalone neural MD model
    (run_span_detection.py:72-121, out of scope by north rule); this is
    the classical stand-in: known spans (gold md_spans, anchor spans, or a
    dictionary match) project onto whitespace tokens as B-/I-/O tags, so
    the EL-mode loop runs end-to-end: reader -> tags -> decode_bio ->
    span-overlap merge -> pipeline.

    docs(doc_id, text) + spans(doc_id, start, ln) ->
    tokens(doc_id, token_idx, start, end, tag). A token is inside a span
    iff it lies fully within [start, start+ln); the first such token gets
    B-<type>, the rest I-<type>, everything else O. Shape: one equi-join
    on doc_id with a range predicate inside the doc's partition (both
    sides shuffle on doc_id once — skew follows document length, never
    entity popularity), then a per-doc window for the B/I split."""
    toks = tokenize_with_offsets(docs, text_col)
    sp = spans.select(
        F.col("doc_id").alias("s_doc"),
        F.col("start").alias("s_start"),
        (F.col("start") + F.col("ln")).alias("s_end"),
    )
    j = toks.join(
        sp,
        (F.col("doc_id") == F.col("s_doc"))
        & (F.col("start") >= F.col("s_start"))
        & (F.col("end") <= F.col("s_end")),
        "left",
    )
    # a token inside two overlapping spans keeps the earlier-starting one
    # (merge_spans_overlap upstream makes this a no-op on clean input)
    picked = j.groupBy("doc_id", "token_idx", "start", "end").agg(
        F.min("s_start").alias("s_start")
    )
    w = Window.partitionBy("doc_id", "s_start").orderBy("token_idx")
    tag = (
        F.when(F.col("s_start").isNull(), F.lit("O"))
        .when(F.row_number().over(w) == 1, F.lit(f"B-{coarse_type}"))
        .otherwise(F.lit(f"I-{coarse_type}"))
    )
    return picked.select("doc_id", "token_idx", "start", "end", tag.alias("tag"))


def decode_bio(tokens: DataFrame) -> DataFrame:
    """tokens(doc_id, token_idx int, start int, end int, tag string) ->
    spans(doc_id, start, ln, coarse_type)."""
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    tag_type = F.when(F.col("tag") == "O", F.lit(None)).otherwise(
        F.substring_index("tag", "-", -1)
    )
    prev_type = F.lag(tag_type).over(w)
    prev_tag = F.lag("tag").over(w)
    is_start = F.when(F.col("tag").startswith("B-"), True).otherwise(
        # malformed I-: starts a span if previous token was O / other type /
        # none (md_dataset_utils.py malformed-I rule)
        F.col("tag").startswith("I-")
        & (
            prev_tag.isNull()
            | (prev_tag == "O")
            | (prev_type != tag_type)
        )
    )
    seg = F.sum(F.when(is_start, 1).otherwise(0)).over(w)
    tagged = (
        tokens.withColumn("t", tag_type)
        .withColumn("seg", seg)
        .where(F.col("t").isNotNull())
    )
    return (
        tagged.groupBy("doc_id", "seg")
        .agg(
            F.min("start").alias("start"),
            (F.max("end") - F.min("start")).alias("ln"),
            F.min_by("t", "token_idx").alias("coarse_type"),
        )
        .drop("seg")
    )
