"""Transitive closure over the subclass DAG (operator T3) + class pruning
(T4) and consistency checks (T5).

The reference explores class ancestors recursively with an LRU memo
(/root/reference/src/refined/doc_preprocessing/class_handler.py:22-85);
distributed, the closure is the iterative frontier join

    closure := edges
    frontier := edges
    repeat: frontier := frontier ⋈ edges (child=parent hop), minus closure
            closure  := closure ∪ frontier
    until frontier empty

with per-round localCheckpoint (Catalyst has no recursion). Bounded by DAG
depth, not diameter tricks — class hierarchies are shallow (~12 levels in
Wikidata P279)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, max_depth: int = 20) -> DataFrame:
    """edges(child, parent) -> implied(child, ancestor): all (strict)
    ancestor pairs. Input must be a DAG; cycles would loop until max_depth
    (a convergence guard, mirroring the reference's visited-set)."""
    closure = edges.select(
        F.col("child"), F.col("parent").alias("ancestor")
    ).distinct().localCheckpoint(eager=True)
    frontier = closure
    hop = edges.select(F.col("child").alias("h_child"), F.col("parent").alias("h_parent"))
    for _ in range(max_depth):
        nxt = (
            frontier.join(hop, frontier["ancestor"] == hop["h_child"])
            .select(frontier["child"], F.col("h_parent").alias("ancestor"))
            .distinct()
            .exceptAll(closure)
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return closure


def max_classes_width(entity_classes: DataFrame) -> int:
    """Operator A7: the widest per-entity class list — the tensor width the
    reference sizes its qcode->class memmap with
    (generate_qcode_to_type_indices.py:47-58). One aggregate, one scalar.
    entity_classes: (qcode, class_id) long form."""
    row = (
        entity_classes.groupBy("qcode")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("w"))
        .collect()
    )
    return int(row[0]["w"]) if row and row[0]["w"] is not None else 0


def prune_implied_classes(predicted: DataFrame, implied: DataFrame) -> DataFrame:
    """T4: minimal antichain — drop predicted classes that are ancestors of
    another predicted class for the same key (class_handler.py:87-102).
    predicted: (key, class_id); implied: (child, ancestor)."""
    anc = (
        predicted.alias("p")
        .join(implied, F.col("p.class_id") == implied["child"])
        .select(F.col("p.key").alias("key"), F.col("ancestor").alias("class_id"))
        .distinct()
    )
    return predicted.join(anc, ["key", "class_id"], "left_anti")


def class_consistency_flag(
    winners: DataFrame, entity_classes: DataFrame, implied: DataFrame,
    predicted_types: DataFrame,
) -> DataFrame:
    """T5: flag winners whose implied class set is disjoint from the
    mention's predicted types (class_handler.py:104-118). winners:
    (mention_id, qcode); entity_classes: (qcode, class_id) long form;
    predicted_types: (mention_id, class_id). Returns
    (mention_id, qcode, failed_class_check boolean)."""
    ent_all = entity_classes.unionByName(
        entity_classes.join(implied, entity_classes["class_id"] == implied["child"])
        .select("qcode", F.col("ancestor").alias("class_id"))
    ).distinct()
    hit = (
        winners.join(ent_all, "qcode")
        .join(predicted_types, ["mention_id", "class_id"], "left_semi")
        .select("mention_id")
        .distinct()
        .withColumn("ok", F.lit(True))
    )
    return winners.join(hit, "mention_id", "left").select(
        "mention_id", "qcode", F.coalesce(~F.col("ok"), F.lit(True)).alias("failed_class_check")
    )
