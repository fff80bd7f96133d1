"""P(e|m) alias-dictionary operators: the build (A1/A2/A3) and the blocking
join (J1), with explicit skew handling for web scale.

Reference: the PEM table is built by counting (surface, entity) link
evidence and normalizing to priors per surface
(/root/reference/src/refined/offline_data_generation/generate_pem.py:46-170),
then probed as an O(1) dict at inference
(/root/reference/src/refined/doc_preprocessing/candidate_generator.py:62-72).
Distributed, the probe is an equi-join on the normalized surface form; hot
aliases ("england") make that join skew, so the dimension side is small
enough to broadcast at dictionary scales (~18M rows ~ a few GB -> broadcast
per-executor once) and, when it is not, `candidate_join_salted` replicates
the hot keys S ways (SURVEY.md §4(a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from refined_spark.config import MAX_CANDIDATES


def build_pem(link_evidence: DataFrame, max_candidates: int = MAX_CANDIDATES) -> DataFrame:
    """A1 + A2 + A3. Input: link_evidence(surface_form, qcode, cnt) — the
    union of evidence sources (labels, aliases, hyperlinks, titles,
    redirects), already normalized. Output:
    pem(surface_form, candidates array<struct<qcode,prior>> sorted desc,
    len <= max_candidates, priors sum to 1 before truncation.

    Plan shape: one partial+final hash aggregate, one window-free
    normalization via a second aggregate (no shuffle beyond the groupBy —
    the sum-per-surface reuses the same partitioning), then a JVM-side
    sort/slice on the collected array. No Python.
    """
    counts = link_evidence.groupBy("surface_form", "qcode").agg(
        F.sum("cnt").alias("cnt")
    )
    # groupBy(surface_form) reuses the hash-partitioning Catalyst already
    # produced for the previous agg -> no extra shuffle (verified via explain).
    return (
        counts.groupBy("surface_form")
        .agg(
            F.sum("cnt").alias("total"),
            F.collect_list(F.struct("qcode", "cnt")).alias("cands"),
        )
        .select(
            "surface_form",
            F.slice(
                F.array_sort(
                    F.transform(
                        F.col("cands"),
                        lambda c: F.struct(
                            (-c["cnt"] / F.col("total")).alias("neg_prior"),
                            c["qcode"].alias("qcode"),
                        ),
                    )
                ),
                1,
                max_candidates,
            ).alias("sorted_cands"),
        )
        .select(
            "surface_form",
            F.transform(
                F.col("sorted_cands"),
                lambda c: F.struct(
                    c["qcode"].alias("qcode"), (-c["neg_prior"]).alias("prior")
                ),
            ).alias("candidates"),
        )
    )


def pem_flat(pem: DataFrame) -> DataFrame:
    """pem -> (surface_form, qcode, prior, rank) long format."""
    # posexplode_outer: avoids the size()>0 pushdown filter that would
    # duplicate the candidates expression (see queries.q_minhash_signatures)
    return pem.where(F.size("candidates") > 0).select(
        "surface_form", F.posexplode_outer("candidates").alias("pos", "c")
    ).select(
        "surface_form",
        F.col("c.qcode").alias("qcode"),
        F.col("c.prior").alias("prior"),
        (F.col("pos") + 1).alias("rank"),
    )


def qcode_index(pem: DataFrame) -> DataFrame:
    """Operator A4: enumerate every distinct qcode in the dictionary from 1
    (the reference's qcode_to_idx build, preprocess_all.py:101-122 — it
    packs qcodes into tensor row indices). Spark joins on qcode directly so
    this exists only for embedding-matrix packing; the enumeration is a
    zipWithIndex-free window over a sorted distinct set (deterministic,
    unlike monotonically_increasing_id)."""
    from pyspark.sql import Window

    q = pem.select(F.explode("candidates").alias("c")).select(
        F.col("c.qcode").alias("qcode")
    ).distinct()
    return q.withColumn(
        "idx", F.row_number().over(Window.orderBy("qcode"))
    )


def attach_jw(flat: DataFrame, entity_meta: DataFrame) -> DataFrame:
    """Precompute the string-similarity features — jaro_winkler and
    normalized levenshtein of (surface_form, normalized entity label) — as
    DICTIONARY attributes: they depend only on the (surface_form, qcode)
    pair, so they belong in the PEM build, not in a per-corpus scoring
    pass. At 10^12 docs this turns 10^12 string-kernel evaluations into
    |dictionary| (~10^8) — computed once per dictionary refresh.
    Levenshtein is Spark's builtin (JVM/codegen); only JW needs the Arrow
    UDF. North rule: 'batched Jaro-Winkler/Levenshtein'.

    Labels are normalized with the SAME kernel as mentions
    (normalize_surface_udf, the shared Python/oracle kernel) — a split
    kernel would make engine JW disagree with oracle JW on any label
    outside the builtin approximation's domain (SURVEY §7.4.2)."""
    from refined_spark.functions.joins import maybe_broadcast
    from refined_spark.functions.normalize import normalize_surface_udf
    from refined_spark.functions.similarity import jaro_winkler_udf, lev_sim_col

    meta = entity_meta.select(
        "qcode", normalize_surface_udf(F.col("label")).alias("norm_label")
    )
    lbl = F.coalesce(F.col("norm_label"), F.lit(""))
    return (
        flat.join(maybe_broadcast(meta), "qcode", "left")
        .withColumn("jw", jaro_winkler_udf(F.col("surface_form"), lbl))
        .withColumn("lev", lev_sim_col(F.col("surface_form"), lbl))
        .drop("norm_label")
    )


def candidate_join(
    mentions: DataFrame, pem: DataFrame, entity_meta: DataFrame | None = None
) -> DataFrame:
    """J1 — the blocking join. mentions must carry `block_key` (normalized
    surface). Returns one row per (mention, candidate):
    (doc_id, mention_id, block_key, offset, qcode, prior[, jw]).

    The dictionary side carries NO broadcast hint: at reference scale
    (~18M surfaces, top-30 candidates) the flat dictionary is a few GB —
    sometimes broadcastable, sometimes not, and a plan-time hint cannot be
    demoted when it is not. AQE broadcasts it from observed size when it
    fits (under broadcast, mention-side skew on hot aliases is harmless —
    no fact-side shuffle happens at all) and falls back to a shuffle join
    otherwise; for the shuffle case with hot aliases use
    candidate_join_salted. Mentions with no dictionary hit are kept (left
    join) with null qcode — they become NIL downstream, matching the
    reference's empty-candidate path.

    With entity_meta, the jaro-winkler feature rides in on the dictionary
    (see attach_jw) so scoring needs no separate string-kernel pass."""
    from refined_spark.functions.joins import maybe_broadcast

    flat = pem_flat(pem)
    if entity_meta is not None:
        flat = attach_jw(flat, entity_meta)
    return mentions.join(
        maybe_broadcast(flat),
        mentions["block_key"] == flat["surface_form"],
        "left",
    ).drop("surface_form")


def candidate_join_salted(
    mentions: DataFrame, pem: DataFrame, salt: int = 8,
    entity_meta: DataFrame | None = None,
) -> DataFrame:
    """J1 at shuffle scale: explicit key salting for when the dictionary is
    too large to broadcast. The fact side appends pmod(hash(mention_id), S)
    to the key; the dimension side is replicated S ways via explode. Same
    output contract as candidate_join."""
    base = pem_flat(pem)
    if entity_meta is not None:
        base = attach_jw(base, entity_meta)
    flat = base.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    m = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("mention_id"), F.lit(salt)).cast("int")
    )
    out = m.join(
        flat,
        (m["block_key"] == flat["surface_form"]) & (m["salt"] == flat["salt"]),
        "left",
    )
    return out.drop("surface_form").drop(flat["salt"]).drop(m["salt"])
