"""Greedy discriminative class selection (operator A5) and the
deterministic entity-typing producer (operator C3).

A5 — reference semantics (/root/reference/src/refined/offline_data_generation/
class_selection.py:69-198, select_classes / ent_good_classes): iterate over
labeled (mention, gold entity) pairs; for each, a class is "good" if the
gold entity has it, it is not already chosen, and the already-chosen
classes do NOT yet separate the gold entity from its top candidate
entities (i.e. gold and some candidate share every already-chosen class).
Greedily add the most frequently "good" class, re-scan, repeat until
`number_of_classes` are chosen. The reference streams pages sequentially
and adds a class every N pages; the Spark re-expression makes each round a
full corpus pass (strictly more evidence per pick) — one groupBy().count()
aggregate + a driver-side argmax per round. This is the one genuinely
iterative aggregation in the reference's ETL: a driver loop over tiny
(class, count) aggregates, with the corpus-side work fully distributed —
the loop state (chosen classes) is a broadcast-size set.

C3 — reference semantics (/root/reference/src/refined/model_components/
entity_typing_layer.py:26-47: sigmoid(linear(mention_embedding)) over the
chosen-class vocabulary; applied in processor.py:347-361). The trained
weight matrix is out of scope (north rule replaces the neural stack), so
the producer is a deterministic seeded linear layer over the SAME hashed
context embedding the scorer uses: scores = sigmoid(ctx_emb @ W[seed]),
predicted_types = classes with score >= threshold. The Spark plumbing —
Arrow-batched matmul in a pandas UDF, class vocabulary as a broadcast
list, long-format output feeding T4 (prune_implied_classes) and T5
(class_consistency_flag) — is the real operator; the weights are an
honest stand-in, like the media codec stub (media.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def good_classes_per_mention(
    labeled: DataFrame,
    entity_classes: DataFrame,
    chosen: list[str],
    top_candidates: int = 10,
) -> DataFrame:
    """One A5 round's distributed half. labeled: (mention_id, gold_qcode,
    cand_qcodes array<string> — top candidates excluding gold);
    entity_classes: (qcode, class_id) long form. Returns
    (class_id, cnt): how many mentions each not-yet-chosen class would
    help separate.

    Shape: two collect_set aggregates + one explode + one count — the
    per-round cost is two shuffles on qcode/mention_id, and `chosen` rides
    along as a literal array (driver state is O(|chosen|), broadcast in
    the task closure)."""
    chosen_arr = F.array([F.lit(c) for c in chosen]) if chosen else F.array().cast(
        "array<string>"
    )
    classes_of = entity_classes.groupBy("qcode").agg(
        F.collect_set("class_id").alias("classes")
    )
    g = labeled.join(
        classes_of.select(
            F.col("qcode").alias("gold_qcode"),
            F.col("classes").alias("gold_classes"),
        ),
        "gold_qcode",
        "left",
    ).withColumn("gold_classes", F.coalesce("gold_classes", F.array().cast("array<string>")))

    cand = labeled.select(
        "mention_id",
        F.explode(F.slice("cand_qcodes", 1, top_candidates)).alias("qcode"),
    ).join(classes_of, "qcode", "left").withColumn(
        "cand_classes", F.coalesce("classes", F.array().cast("array<string>"))
    )

    # a candidate is "already separated" from gold iff its chosen-class
    # fingerprint differs from gold's (class_selection.py:96-104); an
    # UNSEPARATED candidate vetoes gold classes it shares, minus gold's
    # already-chosen ones (class_selection.py:106-110)
    j = cand.join(
        g.select("mention_id", "gold_classes"), "mention_id"
    ).withColumn(
        "gold_chosen", F.array_sort(F.array_intersect("gold_classes", chosen_arr))
    ).withColumn(
        "cand_chosen", F.array_sort(F.array_intersect("cand_classes", chosen_arr))
    )
    unseparated = F.col("gold_chosen") == F.col("cand_chosen")
    per_mention = j.groupBy("mention_id").agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(
                    F.when(
                        unseparated,
                        F.array_except("cand_classes", "gold_chosen"),
                    ).otherwise(F.array().cast("array<string>"))
                )
            )
        ).alias("conflict_classes"),
        F.max(unseparated.cast("int")).alias("any_unseparated"),
        F.max((F.size("cand_classes") > 0).cast("int")).alias("any_has_class"),
        F.count("*").alias("n_cands"),
    )
    # emit gate (class_selection.py:112-115): >=2 non-gold candidates, at
    # least one candidate typed, and at least one still unseparated
    good = (
        g.join(per_mention, "mention_id")
        .where(
            (F.col("n_cands") > 1)
            & (F.col("any_has_class") == 1)
            & (F.col("any_unseparated") == 1)
        )
        .select(
            "mention_id",
            F.explode(
                F.array_except(
                    F.array_except("gold_classes", chosen_arr),
                    F.col("conflict_classes"),
                )
            ).alias("class_id"),
        )
    )
    return good.groupBy("class_id").agg(F.count("*").alias("cnt"))


def select_classes(
    labeled: DataFrame,
    entity_classes: DataFrame,
    number_of_classes: int,
    seed_classes: tuple[str, ...] = ("Q16889133",),
    top_candidates: int = 10,
) -> list[str]:
    """A5's driver loop: greedily add the class with the highest
    separation count until `number_of_classes` are chosen or no class
    helps. Each round is one distributed aggregate; the driver touches
    only a 2-column argmax row (class_selection.py:165-172; the seed class
    Q16889133 'class' itself is :132-134). Deterministic: ties break on
    class_id."""
    chosen: list[str] = list(seed_classes)
    while len(chosen) < number_of_classes:
        counts = good_classes_per_mention(
            labeled, entity_classes, chosen, top_candidates
        )
        top = counts.orderBy(F.desc("cnt"), F.asc("class_id")).limit(1).collect()
        if not top or top[0]["cnt"] == 0:
            break
        chosen.append(top[0]["class_id"])
    return chosen


TYPING_DIM_DEFAULT = 64


def _typing_weights(n_classes: int, emb_dim: int, seed: int) -> np.ndarray:
    """Deterministic stand-in weight matrix (emb_dim x n_classes), seeded —
    the honest replacement for the trained linear layer's checkpoint."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((emb_dim, n_classes)).astype(np.float64)


def predict_types(
    ctx_emb: DataFrame,
    class_vocab: list[str],
    emb_dim: int,
    threshold: float = 0.5,
    seed: int = 13,
) -> DataFrame:
    """C3: (doc_id, ctx_emb) -> (doc_id, class_id, type_score) long form,
    keeping classes with sigmoid score >= threshold. One Arrow-batched
    matmul per batch (batch_rows x emb_dim @ emb_dim x n_classes), then a
    JVM-side posexplode + filter — no per-row Python. Output feeds T4/T5
    (closure.prune_implied_classes / class_consistency_flag)."""
    w = _typing_weights(len(class_vocab), emb_dim, seed)

    @F.pandas_udf(ArrayType(DoubleType()))
    def type_scores_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        logits = mat @ w
        scores = 1.0 / (1.0 + np.exp(-logits))
        return pd.Series(list(scores))

    vocab = F.array([F.lit(c) for c in class_vocab])
    scored = ctx_emb.select(
        "doc_id", F.posexplode(type_scores_udf(F.col("ctx_emb"))).alias("pos", "type_score")
    )
    return scored.where(F.col("type_score") >= threshold).select(
        "doc_id",
        F.element_at(vocab, F.col("pos") + 1).alias("class_id"),
        F.round("type_score", 6).alias("type_score"),
    )
