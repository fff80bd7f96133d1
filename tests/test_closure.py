"""T3 transitive closure on toy DAGs (closure_goldens), T4 pruning, T5 check."""

import pyspark.sql.functions as F


def _closure(spark, edges):
    from refined_spark.operators.closure import transitive_closure

    df = spark.createDataFrame(edges, "child string, parent string")
    return {(r.child, r.ancestor) for r in transitive_closure(df).collect()}


def test_chain_closure(spark):
    got = _closure(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")}


def test_dag_diamond(spark):
    got = _closure(spark, [("x", "l"), ("x", "r"), ("l", "top"), ("r", "top")])
    assert got == {("x", "l"), ("x", "r"), ("x", "top"), ("l", "top"), ("r", "top")}


def test_prune_implied(spark):
    from refined_spark.operators.closure import prune_implied_classes, transitive_closure

    edges = spark.createDataFrame(
        [("human", "mammal"), ("mammal", "animal")], "child string, parent string"
    )
    implied = transitive_closure(edges)
    predicted = spark.createDataFrame(
        [("m1", "human"), ("m1", "animal"), ("m2", "mammal")],
        "key string, class_id string",
    )
    got = {(r.key, r.class_id) for r in prune_implied_classes(predicted, implied).collect()}
    # 'animal' is implied by 'human' -> dropped for m1; m2 keeps mammal
    assert got == {("m1", "human"), ("m2", "mammal")}


def test_class_consistency_flag(spark):
    from refined_spark.operators.closure import class_consistency_flag, transitive_closure

    edges = spark.createDataFrame([("human", "animal")], "child string, parent string")
    implied = transitive_closure(edges)
    winners = spark.createDataFrame(
        [("m1", "Q1"), ("m2", "Q2")], "mention_id string, qcode string"
    )
    ent_classes = spark.createDataFrame(
        [("Q1", "human"), ("Q2", "rock")], "qcode string, class_id string"
    )
    pred_types = spark.createDataFrame(
        [("m1", "animal"), ("m2", "animal")], "mention_id string, class_id string"
    )
    got = {r.mention_id: r.failed_class_check
           for r in class_consistency_flag(winners, ent_classes, implied, pred_types).collect()}
    # Q1 implies animal (via closure) -> consistent; Q2 (rock) fails
    assert got == {"m1": False, "m2": True}
