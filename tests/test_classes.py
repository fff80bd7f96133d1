"""A5 greedy class selection + C3 typing producer (operators/classes.py)."""

from pyspark.sql import functions as F

from refined_spark.operators.classes import (
    good_classes_per_mention,
    predict_types,
    select_classes,
)
from refined_spark.operators.closure import class_consistency_flag


def _fixture(spark):
    """Three entity families: politicians {C_pol}, cities {C_city},
    rivers {C_riv}; every mention's candidate set mixes families, so the
    first chosen class must be the one separating the most mentions."""
    entity_classes = spark.createDataFrame(
        [("Q1", "C_pol"), ("Q2", "C_pol"), ("Q3", "C_city"),
         ("Q4", "C_city"), ("Q5", "C_riv")],
        "qcode string, class_id string",
    )
    labeled = spark.createDataFrame(
        [
            # gold politician vs city+politician candidates: C_pol is good
            # only until chosen; C_city separates nothing for these
            ("m1", "Q1", ["Q3", "Q2"]),
            ("m2", "Q1", ["Q4", "Q2"]),
            ("m3", "Q2", ["Q3", "Q1"]),
            # gold city vs river+city
            ("m4", "Q3", ["Q5", "Q4"]),
            ("m5", "Q4", ["Q5", "Q3"]),
            # gold river vs city
            ("m6", "Q5", ["Q3", "Q4"]),
        ],
        "mention_id string, gold_qcode string, cand_qcodes array<string>",
    )
    return labeled, entity_classes


def test_good_classes_first_round(spark):
    labeled, ec = _fixture(spark)
    counts = {r.class_id: r.cnt
              for r in good_classes_per_mention(labeled, ec, []).collect()}
    # round 1: every mention unseparated; gold classes not shared with a
    # conflicting candidate count. C_pol: m1,m2 gold has C_pol but a
    # candidate (Q2) also has it -> vetoed there; m3 likewise. C_city is
    # good for m4,m5 (river candidate lacks it, city candidate shares ->
    # vetoed)... the veto removes classes SHARED with unseparated
    # candidates, so only classes unique to gold within the candidate set
    # survive: m6 gold C_riv vs city candidates -> C_riv counts.
    assert counts.get("C_riv", 0) >= 1
    # no chosen classes yet -> nothing separated, every gold class vetoed
    # when shared with a candidate
    assert "C_pol" not in counts  # Q2/Q1 conflict within m1-m3


def test_select_classes_converges(spark):
    labeled, ec = _fixture(spark)
    chosen = select_classes(labeled, ec, number_of_classes=4,
                            seed_classes=("C_seed",))
    assert chosen[0] == "C_seed"
    assert len(chosen) == len(set(chosen))
    # deterministic across runs
    again = select_classes(labeled, ec, number_of_classes=4,
                           seed_classes=("C_seed",))
    assert chosen == again
    # once a family class is chosen, mentions separated by it stop
    # contributing, so the loop terminates before inventing classes
    assert set(chosen) - {"C_seed"} <= {"C_pol", "C_city", "C_riv"}


def test_predict_types_shapes_and_determinism(spark):
    from refined_spark.fixtures import hash_embed

    emb_dim = 16
    ctx = spark.createDataFrame(
        [("d1", hash_embed("alpha beta", emb_dim)),
         ("d2", hash_embed("gamma delta", emb_dim))],
        "doc_id string, ctx_emb array<double>",
    )
    vocab = [f"C{i}" for i in range(5)]
    out1 = predict_types(ctx, vocab, emb_dim, threshold=0.5).collect()
    out2 = predict_types(ctx, vocab, emb_dim, threshold=0.5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert out1, "threshold 0.5 keeps ~half the classes"
    for r in out1:
        assert r.class_id in vocab and r.type_score >= 0.5
    # lower threshold keeps strictly more
    out_all = predict_types(ctx, vocab, emb_dim, threshold=0.0).collect()
    assert len(out_all) == 2 * len(vocab)


def test_typing_feeds_class_consistency(spark):
    """C3 output drives T5: a winner whose entity classes intersect the
    mention's predicted types passes the check."""
    from refined_spark.fixtures import hash_embed

    emb_dim = 16
    ctx = spark.createDataFrame(
        [("d1", hash_embed("some text", emb_dim))],
        "doc_id string, ctx_emb array<double>",
    )
    vocab = ["C_a", "C_b", "C_c", "C_d"]
    ptypes = predict_types(ctx, vocab, emb_dim, threshold=0.0).select(
        F.lit("m1").alias("mention_id"), "class_id"
    )
    winners = spark.createDataFrame([("m1", "Q1"), ("m2", "Q2")],
                                    "mention_id string, qcode string")
    ec = spark.createDataFrame([("Q1", "C_a"), ("Q2", "C_zzz")],
                               "qcode string, class_id string")
    implied = spark.createDataFrame([], "child string, ancestor string")
    flags = {r.mention_id: r.failed_class_check
             for r in class_consistency_flag(winners, ec, implied, ptypes).collect()}
    assert flags["m1"] is False   # C_a predicted for m1, Q1 has C_a
    assert flags["m2"] is True    # nothing predicted for m2
