"""Span-level operators over the interleaved `documents` table.

documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)

- extract_mentions: explode text spans -> one row per mention (the reference
  iterates Doc.spans per document: /root/reference/src/refined/inference/
  processor.py:135-195; here it's a single explode, fully parallel).
- doc_text: reassemble the textual context of each doc (offset-ordered).
- span_signature / assert_span_invariant: the per-row invariant mandated by
  BASELINE.json input_hint — span-sequence equality on
  (kind, text, media_ref, order-by-offset) after every stage that rewrites
  `documents` (reference sorts spans by start: doc_types.py:35-38).
- merge_spans_overlap: J6 interval anti-join — merge additional spans into
  prioritized spans, dropping overlaps (general_utils.py:212-238 semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_spans(c: Column) -> Column:
    """Spans ordered by offset (struct compare uses first field)."""
    return F.array_sort(
        F.transform(
            c,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def span_signature(c: Column) -> Column:
    """Deterministic string signature of the (kind, text, media_ref, order)
    sequence. Two documents rows are invariant-equal iff signatures match."""
    return F.md5(
        F.array_join(
            F.transform(
                sorted_spans(c),
                lambda s: F.concat_ws(
                    "", s["kind"], s["text"], s["media_ref"]
                ),
            ),
            "",
        )
    )


def with_span_signature(documents: DataFrame) -> DataFrame:
    return documents.withColumn("span_sig", span_signature(F.col("spans")))


def assert_span_invariant(before: DataFrame, after: DataFrame) -> None:
    """Distributed check: every doc's span signature is unchanged. Runs as
    one join + count (no collect of data)."""
    b = before.select("doc_id", span_signature(F.col("spans")).alias("sig_b"))
    a = after.select("doc_id", span_signature(F.col("spans")).alias("sig_a"))
    bad = (
        b.join(a, "doc_id", "full_outer")
        .where(
            F.col("sig_b").isNull()
            | F.col("sig_a").isNull()
            | (F.col("sig_b") != F.col("sig_a"))
        )
        .count()
    )
    if bad:
        raise AssertionError(f"span-sequence invariant violated for {bad} docs")


def extract_mentions(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, mention_id, surface, offset). Media spans pass
    through the pipeline untouched (they only participate in the invariant)."""
    s = documents.select("doc_id", F.explode("spans").alias("sp"))
    return (
        s.where((F.col("sp.kind") == "text") & (F.length("sp.text") > 0))
        .select(
            "doc_id",
            F.concat_ws("#", "doc_id", F.col("sp.offset").cast("string")).alias("mention_id"),
            F.col("sp.text").alias("surface"),
            F.col("sp.offset").alias("offset"),
        )
    )


def doc_text(documents: DataFrame) -> DataFrame:
    """(doc_id, text): offset-ordered concatenation of text spans — the
    mention-context input to the embedding featurizer."""
    return documents.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(sorted_spans(F.col("spans")), lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
    )


def merge_spans_overlap(
    prioritized: DataFrame, additional: DataFrame
) -> DataFrame:
    """Operator J6: union spans, dropping any `additional` span overlapping a
    `prioritized` span of the same doc. Interval-overlap anti-join: equi on
    doc_id + range predicate (Catalyst executes equi part as hash join).
    Columns: (doc_id, start, ln, ...)."""
    p = prioritized.select(
        F.col("doc_id").alias("p_doc"), F.col("start").alias("p_start"), F.col("ln").alias("p_ln")
    )
    cond = (
        (additional["doc_id"] == p["p_doc"])
        & (additional["start"] < p["p_start"] + p["p_ln"])
        & (p["p_start"] < additional["start"] + additional["ln"])
    )
    survivors = additional.join(p, cond, "left_anti")
    return prioritized.unionByName(survivors, allowMissingColumns=True)
