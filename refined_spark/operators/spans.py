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


def mention_window_texts(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, mention_id, text): for EVERY text span (== every mention,
    extract_mentions semantics), the offset-ordered concatenation of the
    text spans whose offset lies within +/- k of that span's offset — the
    per-mention context window for the C1 featurizer (the reference pools
    per-mention token windows: refined_model.py:345-380).

    Entirely from the documents table — no join against the mentions frame
    (each mention IS a text span, and mention_id = doc_id#offset matches
    extract_mentions exactly), and entirely JVM-side: nested higher-order
    functions over the span array, so the only cost is the explode. Media
    spans never enter a window, but they DO occupy offset space, so a
    mention surrounded by media gets a smaller textual window — the
    interleaved-document semantics the input_hint mandates."""
    sp = F.filter(
        sorted_spans(F.col("spans")),
        lambda s: (s["kind"] == F.lit("text")) & (F.length(s["text"]) > 0),
    )
    wins = F.transform(
        sp,
        lambda s: F.struct(
            F.concat_ws(
                "#", F.col("doc_id"), s["offset"].cast("string")
            ).alias("mention_id"),
            F.array_join(
                F.transform(
                    F.filter(
                        sp,
                        lambda t: (t["offset"] >= s["offset"] - k)
                        & (t["offset"] <= s["offset"] + k),
                    ),
                    lambda t: t["text"],
                ),
                " ",
            ).alias("text"),
        ),
    )
    return documents.select(
        "doc_id", F.explode(wins).alias("w")
    ).select("doc_id", "w.mention_id", "w.text")


def assemble_doc_spans(flat_spans: DataFrame, span_cols: list[str]) -> DataFrame:
    """Operator A8: regroup flat per-span rows back into their documents as
    an offset-ordered array — the reference's doc re-assembly after batch
    inference (processor.py:266-271). One hash aggregate + a JVM array
    sort; `span_cols` must start with the ordering column (offset/start)."""
    return flat_spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in span_cols]))
        ).alias("spans")
    )


def correct_spans(spans: DataFrame) -> DataFrame:
    """Operator P5 — the reference's span-correction rules
    (/root/reference/src/refined/utilities/general_utils.py:144-209),
    applied to every EL-mode document before inference. Input: one row per
    span (doc_id, start, ln, text). Rules, in reference order:

      1. drop spans whose text is a single char, pure "\\n\\n"(x1-2 more),
         or "the";
      2. for spans longer than 2 chars: strip up to TWO leading and TWO
         trailing newlines (adjusting start/ln), then an unbalanced
         leading or trailing double-quote, then drop if the remainder is
         "the";
      3. a span at offset 0 containing exactly one "\\n\\n" is a glued
         title+first-mention — split it into two spans.

    Pure built-in expressions: column rewrites + one explode for the split
    case. (The reference mutates the list during iteration — remove() while
    iterating — which can skip the element after a removal; this operator
    implements the documented intent: every span is tested.)"""
    t0, s0 = F.col("text"), F.col("start")
    kept = spans.where(
        ~(
            (F.length(t0) == 1)
            | t0.isin("\n\n", "\n\n\n", "\n\n\n\n")
            | (t0 == "the")
        )
    )
    # step 2 (len > 2 branch): each strip is conditional; short spans pass
    # through untouched
    big = F.length(t0) > 2
    lead = F.when(big, F.length(F.regexp_extract(t0, r"^(\n{1,2})", 1))).otherwise(F.lit(0))
    t1 = F.substring(t0, lead + 1, F.length(t0) - lead)
    s1 = s0 + lead
    trail = F.when(big, F.length(F.regexp_extract(t1, r"(\n{1,2})$", 1))).otherwise(F.lit(0))
    t2 = F.substring(t1, 1, F.length(t1) - trail)
    lq = F.when(
        big & t2.startswith('"') & ~t2.endswith('"'), F.lit(1)
    ).otherwise(F.lit(0))
    t3 = F.substring(t2, lq + 1, F.length(t2) - lq)
    s3 = s1 + lq
    tq = F.when(
        big & t3.endswith('"') & ~t3.startswith('"'), F.lit(1)
    ).otherwise(F.lit(0))
    t4 = F.substring(t3, 1, F.length(t3) - tq)

    fixed = kept.select(
        "doc_id", s3.alias("start"), t4.alias("text")
    ).where(F.col("text") != "the")

    # step 3: split a glued offset-0 span on its single "\n\n"
    t, s = F.col("text"), F.col("start")
    two_nl = F.instr(t, "\n\n")
    split_case = (s == 0) & (F.size(F.split(t, r"\n\n")) == 2)
    first = F.split(t, r"\n\n")[0]
    second = F.split(t, r"\n\n")[1]
    pieces = F.when(
        split_case,
        F.array(
            F.struct(F.lit(0).cast("long").alias("start"), first.alias("text")),
            F.struct((two_nl + 1).cast("long").alias("start"), second.alias("text")),
        ),
    ).otherwise(F.array(F.struct(s.cast("long").alias("start"), t.alias("text"))))
    return (
        fixed.select("doc_id", F.explode(pieces).alias("p"))
        .select(
            "doc_id",
            F.col("p.start").alias("start"),
            F.length("p.text").cast("long").alias("ln"),
            F.col("p.text").alias("text"),
        )
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
