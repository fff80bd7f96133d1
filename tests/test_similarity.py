"""Jaro-Winkler kernel goldens (classic published values) + cosine
fold-order parity between the Spark column expression and the oracle."""

import math

import pyspark.sql.functions as F
import pytest

from refined_spark.functions.similarity import (
    cosine_sim_col,
    jaro_winkler_py,
    jaro_winkler_udf,
)
from refined_spark.oracle import cosine as oracle_cosine

JW_GOLDENS = [
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("", "abc", 0.0),
    ("a", "a", 1.0),
]


@pytest.mark.parametrize("a,b,expected", JW_GOLDENS)
def test_jw_goldens(a, b, expected):
    assert math.isclose(jaro_winkler_py(a, b), expected, abs_tol=1e-12)


def test_jw_udf_matches_kernel(spark):
    df = spark.createDataFrame([(a, b) for a, b, _ in JW_GOLDENS], "a string, b string")
    rows = df.select("a", "b", jaro_winkler_udf("a", "b").alias("jw")).collect()
    for r in rows:
        assert math.isclose(r.jw, jaro_winkler_py(r.a, r.b), abs_tol=1e-12)


def test_cosine_fold_order_parity(spark):
    vecs = [
        ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ([0.1] * 64, [0.2] * 64),
        ([1e-8, 1e8, -1e-8], [1e8, 1e-8, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "a array<double>, b array<double>")
    rows = df.select(cosine_sim_col(F.col("a"), F.col("b")).alias("c")).collect()
    for (a, b), r in zip(vecs, rows):
        assert r.c == oracle_cosine(a, b)  # exact, same fold order


def test_levenshtein_builtin_matches_py_kernel(spark):
    """F11's second kernel: Spark's builtin levenshtein vs the oracle's
    pure-Python DP, plus the normalized similarity column twin."""
    from pyspark.sql import functions as F

    from refined_spark.functions.similarity import (
        lev_sim_col,
        lev_sim_py,
        levenshtein_py,
    )

    pairs = [
        ("kitten", "sitting"), ("", ""), ("a", ""), ("", "b"),
        ("alpha corp", "alpha corporation"), ("ost", "oest"),
        ("exact", "exact"), ("ab", "ba"),
    ]
    assert levenshtein_py("kitten", "sitting") == 3
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a", "b",
        F.levenshtein("a", "b").alias("d"),
        lev_sim_col(F.col("a"), F.col("b")).alias("s"),
    ).collect()
    for r in rows:
        assert r.d == levenshtein_py(r.a, r.b), (r.a, r.b)
        assert r.s == lev_sim_py(r.a, r.b), (r.a, r.b)
