"""Pairwise mention-candidate scoring + resolution (operators C2/C4/C5/P7).

Replaces the reference's ED layer (/root/reference/src/refined/
model_components/entity_disambiguation_layer.py:36-119 and ed_layer_2.py:
61-132) with the north rule's classical features:

    score = W_PRIOR * prior
          + W_JW    * jaro_winkler(block_key, normalized entity label)
          + W_LEV   * lev_sim(block_key, normalized entity label)
          + W_COS   * max(cosine(mention_context_emb, entity_emb), 0)

  (lev_sim = normalized Levenshtein, Spark's builtin JVM kernel — the
  north rule's 'Jaro-Winkler/Levenshtein' pair, F11)

- The entity side arrives via one hash join to entity_meta/entity_embeddings
  (J8 — the distributed analog of the reference's memmap row gather,
  data_lookups.py:37-42).
- jaro_winkler is an Arrow pandas UDF (functions/similarity.py).
- cosine stays JVM-side (zip_with/aggregate fold) so engine and oracle
  accumulate in the same order.
- mention context embedding: deterministic hashed bag-of-words of the doc
  text, computed once per doc in an Arrow pandas UDF, then joined (never
  recomputed per candidate).
- Resolution (C5 + P7): argmax via max_by over a tie-broken sort key; NIL
  when best score < ED_THRESHOLD — the variable-length-array equivalent of
  the reference's pad-to-30 + (-1e8 mask) + 0-logit NOTA
  (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from refined_spark.config import ED_THRESHOLD, W_COS, W_JW, W_LEV, W_PRIOR
from refined_spark.fixtures import hash_embed_batch
from refined_spark.functions.joins import maybe_broadcast
from refined_spark.functions.normalize import normalize_surface_udf
from refined_spark.functions.similarity import (
    cosine_seq_udf,
    jaro_winkler_udf,
    lev_sim_col,
)


@pandas_udf(ArrayType(DoubleType()))
def doc_embed_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched doc-context featurizer (the engine's stand-in for the
    reference's transformer mention encoding, refined_model.py:345-380).
    Whole-batch numpy scatter-add (hash_embed_batch) — no per-row Python in
    the hot path; bit-identical to the scalar hash_embed oracle."""
    mat = hash_embed_batch(text.tolist())
    return pd.Series(list(mat))


def mention_context_embeddings(doc_text_df: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, ctx_emb array<double>)."""
    return doc_text_df.select(
        "doc_id", doc_embed_udf(F.col("text")).alias("ctx_emb")
    )


def score_candidates(
    candidates: DataFrame,
    entity_meta: DataFrame,
    entity_embeddings: DataFrame,
    ctx_emb: DataFrame,
) -> DataFrame:
    """candidates(doc_id, mention_id, block_key, offset, qcode, prior[, jw])
    -> + (jw, cos, score). Null-qcode rows (dictionary misses) score null
    and resolve to NIL downstream.

    When candidates already carry jw (precomputed on the dictionary by
    pem.attach_jw — the at-scale path), no string-kernel pass runs here.
    Otherwise jw is computed once per DISTINCT (block_key, qcode) pair and
    hash-joined back (orders of magnitude fewer Python-UDF rows than
    per-candidate).

    No broadcast hints on emb/meta/jw_tbl: the entity-embedding table is
    33.8M x 300 floats (~40-80 GB) at reference scale and jw_tbl is
    corpus-sized distinct pairs — a hard hint is not demotable and OOMs at
    100x (functions/joins.py policy); AQE still broadcasts them at sandbox
    scale from observed sizes."""
    emb = maybe_broadcast(
        entity_embeddings.select(
            "qcode", F.col("emb").cast("array<double>").alias("ent_emb")
        )
    )

    if "jw" in candidates.columns:
        scored = candidates.join(emb, "qcode", "left").join(
            ctx_emb, "doc_id", "left"
        )
    else:
        meta = entity_meta.select(
            "qcode", normalize_surface_udf(F.col("label")).alias("norm_label")
        )
        lbl = F.coalesce(F.col("norm_label"), F.lit(""))
        jw_tbl = (
            candidates.where(F.col("qcode").isNotNull())
            .select("block_key", "qcode")
            .distinct()
            .join(maybe_broadcast(meta), "qcode", "left")
            .select(
                "block_key",
                "qcode",
                jaro_winkler_udf(F.col("block_key"), lbl).alias("jw"),
                lev_sim_col(F.col("block_key"), lbl).alias("lev"),
            )
        )
        scored = (
            candidates.join(maybe_broadcast(jw_tbl), ["block_key", "qcode"], "left")
            .join(emb, "qcode", "left")
            .join(ctx_emb, "doc_id", "left")
        )
    # Arrow-vectorized cosine kernel (north rule: "embedding cosine pandas
    # UDFs, no per-row Python"); bit-exact with the oracle's seq_dot/seq_norm
    # — and ~10x faster than the interpreted zip_with/aggregate fold this
    # replaced (profiled at 67s -> <7s for 10M candidate rows on 8 cores)
    cos = cosine_seq_udf(F.col("ctx_emb"), F.col("ent_emb"))
    return (
        scored.withColumn("cos", cos)
        .withColumn(
            "score",
            F.when(F.col("qcode").isNull(), F.lit(None)).otherwise(
                F.lit(W_PRIOR) * F.col("prior")
                + F.lit(W_JW) * F.col("jw")
                + F.lit(W_LEV) * F.col("lev")
                + F.lit(W_COS) * F.greatest(F.col("cos"), F.lit(0.0))
            ),
        )
        .drop("ent_emb", "ctx_emb")
    )


def resolve(scored: DataFrame, threshold: float = ED_THRESHOLD) -> DataFrame:
    """C5 argmax + P7 threshold. One hash aggregate per mention; ties break
    toward the smaller numeric qcode (same as the oracle). Returns
    (doc_id, mention_id, block_key, offset, qcode, score) with qcode null
    for NIL mentions."""
    qnum = F.regexp_replace("qcode", "^Q", "").cast("long")
    # max_by over a struct orders by score, then -qnum (so smaller qcode wins ties)
    pick = F.max_by(
        F.struct(F.col("qcode"), F.col("score")),
        F.struct(F.col("score").alias("s"), (-qnum).alias("nq")),
    )
    # group on mention_id alone (it is unique) — (doc_id, block_key, offset)
    # ride along as max() so the shuffle hashes one short key, not four
    out = scored.groupBy("mention_id").agg(
        F.max("doc_id").alias("doc_id"),
        F.max("block_key").alias("block_key"),
        F.max("offset").alias("offset"),
        pick.alias("best"),
    )
    return out.select(
        "doc_id",
        "mention_id",
        "block_key",
        "offset",
        F.when(F.col("best.score") >= threshold, F.col("best.qcode")).alias("qcode"),
        F.col("best.score").alias("score"),
    )
