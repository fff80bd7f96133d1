"""End-to-end entity-resolution pipeline (north-rule architecture, SURVEY §7.1):

documents ─ 0 validate (span invariant)
          ─ 1 mentions      explode + normalize           [repartition(block_key)]
          ─ 2 candidates    PEM blocking join (J1)
          ─ 3 coref         person-name propagation (J4)
          ─ 4 scored        prior + JW + cosine (C2/C4)
          ─ 5 resolved      argmax + threshold (C5/P7)
          ─ 6 clusters      CC over winner edges
          ─ 7 eval          pairwise F1 vs gold pairs

Every numbered stage commits a snapshot via StageStore (resume-safe); the
`run` entrypoint recomputes only uncommitted stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from refined_spark.functions.normalize import normalize_surface_udf
from refined_spark.operators import clustering, coref, metrics, pem, scoring, spans
from refined_spark.plans.snapshots import StageStore

STAGES = ["mentions", "candidates", "coref", "scored", "resolved", "clusters"]


def build_mentions(documents: DataFrame) -> DataFrame:
    m = spans.extract_mentions(documents)
    return m.withColumn("block_key", normalize_surface_udf(F.col("surface")))


def run(
    spark: SparkSession,
    documents: DataFrame,
    pem_df: DataFrame,
    entity_meta: DataFrame,
    entity_embeddings: DataFrame,
    human_qcodes: DataFrame,
    store: StageStore | None = None,
    salted: bool = False,
    lsh_blocking: bool = False,
) -> DataFrame:
    """Returns (mention_id, doc_id, block_key, offset, qcode, score,
    cluster_id). With a StageStore, each stage is committed/resumable."""

    def stage(name: str, make, repartition_by: str | None = None) -> DataFrame:
        if store is None:
            return make()
        if store.is_committed(name):
            return store.read(spark, name)
        return store.commit(make(), name, repartition_by=repartition_by)

    # spread the scan ONLY when it arrives under-partitioned: a single small
    # parquet file is ONE split, and everything before the first shuffle
    # (normalize UDF, doc-text UDF) would run on one core. At 100 TB the
    # input already has thousands of splits and this branch never fires — an
    # unconditional repartition would be one full extra shuffle of the
    # entire corpus (tune spark.sql.files.maxPartitionBytes instead).
    parallelism = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < parallelism:
        documents = documents.repartition(parallelism)

    mentions = stage("mentions", lambda: build_mentions(documents), "block_key")

    # the jaro-winkler feature is a dictionary attribute (pem.attach_jw):
    # candidates arrive pre-scored on the string kernel, so scoring is a
    # single linear pass and `merged` is consumed exactly once — no
    # materialization needed between coref and scoring
    if salted:
        candidates = stage(
            "candidates",
            lambda: pem.candidate_join_salted(mentions, pem_df, entity_meta=entity_meta),
        )
    elif lsh_blocking:
        # two-channel blocking (north star): exact alias keys first, then
        # MinHash-LSH bands over mention n-grams for the exact-miss tail
        from refined_spark.operators import blocking

        candidates = stage(
            "candidates",
            lambda: blocking.candidate_join_with_lsh_fallback(
                mentions, pem_df, entity_meta=entity_meta
            ),
        )
    else:
        candidates = stage(
            "candidates",
            lambda: pem.candidate_join(mentions, pem_df, entity_meta=entity_meta),
        )

    merged = stage(
        "coref",
        lambda: coref.propagate_person_coref(
            candidates, human_qcodes, mentions=mentions, entity_meta=entity_meta
        ),
    )
    if store is not None:
        # the coref snapshot is committed (materialized) — drop the
        # intermediate `donated` cache so long-lived sessions don't leak it
        coref.release_cache()

    def make_scored():
        ctx = scoring.mention_context_embeddings(spans.doc_text(documents))
        return scoring.score_candidates(merged, entity_meta, entity_embeddings, ctx)

    scored = stage("scored", make_scored)
    resolved = stage("resolved", lambda: scoring.resolve(scored))
    if store is None:
        # resolved feeds both the CC job and the final join — materialize it
        # once instead of recomputing the whole upstream twice
        resolved = resolved.localCheckpoint(eager=True)
    clusters = stage("clusters", lambda: clustering.cluster_assignments(resolved))

    return resolved.join(clusters, "mention_id")


def evaluate(
    resolved_clusters: DataFrame, gold_mentions: DataFrame
) -> dict:
    """Pairwise F1 of predicted clusters vs gold entity labels, restricted
    to pairs at the same blocking key (north-rule metric)."""
    pred = metrics.cluster_pairs(
        resolved_clusters.where(F.col("qcode").isNotNull()).select(
            "mention_id", "cluster_id", "block_key"
        )
    )
    gold = metrics.pairs_within(
        gold_mentions.select("mention_id", "gold_qcode", "block_key"),
        ["gold_qcode", "block_key"],
    )
    return metrics.pairwise_f1_df(pred, gold)
