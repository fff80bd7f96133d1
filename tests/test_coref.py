"""J4 person-coref propagation: cap 0.80, floor 0.05, order-free, max-merge."""

import math

from refined_spark.operators.coref import propagate_person_coref


def _run(spark, cand_rows, humans):
    cands = spark.createDataFrame(
        cand_rows,
        "doc_id string, mention_id string, block_key string, offset int, qcode string, prior double",
    )
    hq = spark.createDataFrame([(h,) for h in humans], "qcode string")
    out = propagate_person_coref(cands, hq)
    return {(r.mention_id, r.qcode): r.prior for r in out.collect()}


def test_donation_with_cap(spark):
    got = _run(
        spark,
        [
            ("d1", "m1", "donald trump", 0, "Q1", 0.95),
            ("d1", "m2", "trump", 10, "Q7", 0.30),
        ],
        humans=["Q1"],
    )
    assert math.isclose(got[("m2", "Q1")], 0.80)  # capped
    assert math.isclose(got[("m2", "Q7")], 0.30)  # direct kept
    assert math.isclose(got[("m1", "Q1")], 0.95)  # donor unchanged


def test_floor_blocks_weak_donor(spark):
    got = _run(
        spark,
        [
            ("d1", "m1", "donald trump", 0, "Q1", 0.04),
            ("d1", "m2", "trump", 10, "Q7", 0.30),
        ],
        humans=["Q1"],
    )
    assert ("m2", "Q1") not in got


def test_nonhuman_never_donates(spark):
    got = _run(
        spark,
        [
            ("d1", "m1", "acme corp", 0, "Q9", 0.95),
            ("d1", "m2", "acme", 10, "Q7", 0.30),
        ],
        humans=[],
    )
    assert ("m2", "Q9") not in got


def test_backward_order_free(spark):
    # surname BEFORE full name in offset order still receives the donation
    got = _run(
        spark,
        [
            ("d1", "m1", "trump", 0, "Q7", 0.30),
            ("d1", "m2", "donald trump", 50, "Q1", 0.60),
        ],
        humans=["Q1"],
    )
    assert math.isclose(got[("m1", "Q1")], 0.60)


def test_doc_boundary(spark):
    got = _run(
        spark,
        [
            ("d1", "m1", "donald trump", 0, "Q1", 0.9),
            ("d2", "m2", "trump", 0, "Q7", 0.3),
        ],
        humans=["Q1"],
    )
    assert ("m2", "Q1") not in got


def test_max_merge_direct_beats_donation(spark):
    got = _run(
        spark,
        [
            ("d1", "m1", "donald trump", 0, "Q1", 0.5),
            ("d1", "m2", "trump", 10, "Q1", 0.9),  # direct prior higher than donated 0.5
        ],
        humans=["Q1"],
    )
    assert math.isclose(got[("m2", "Q1")], 0.9)


def test_dictionary_miss_row_dropped_when_donated(spark):
    # m2 has no direct candidates (null qcode) but receives a donation:
    # the null row must disappear
    got = _run(
        spark,
        [
            ("d1", "m1", "donald trump", 0, "Q1", 0.9),
            ("d1", "m2", "trump", 10, None, None),
        ],
        humans=["Q1"],
    )
    assert ("m2", None) not in got
    assert math.isclose(got[("m2", "Q1")], 0.80)
