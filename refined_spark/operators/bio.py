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
