"""F1 normalization goldens — semantics pinned to the reference's
normalize_surface_form (loaders.py:137-148): lowercase, leading-article
strip, ASCII fold, possessive/punct removal, whitespace collapse.
The Python kernel and the builtin column expression must agree."""

import pyspark.sql.functions as F
import pytest

from refined_spark.functions.normalize import (
    normalize_surface_col,
    normalize_surface_py,
    normalize_surface_udf,
    remove_wiki_brackets_col,
    qcode_to_int_col,
)

GOLDENS = [
    ("The Beatles", "beatles"),
    ("the beatles", "beatles"),
    ("U.S.A.", "usa"),
    ("O'Brien's", "obrien"),
    ("Donald Trump's", "donald trump"),
    ("Donald Trump's hotel", "donald trump hotel"),
    ("  Angela   Merkel ", "angela merkel"),
    ("Müller", "muller"),
    ("García", "garcia"),
    # the divergent-fold domain: chars NFKD cannot decompose (Ø, ß, œ, æ)
    # — these used to split the py/builtin kernels (round-1 VERDICT) and
    # now pin the shared unidecode-style tables
    ("Øst", "ost"),
    ("œuvre", "oeuvre"),
    ("straße", "strasse"),
    ("Æther", "aether"),
    ("Łódź", "lodz"),
    ("Þór", "thor"),
    ("MACRON", "macron"),
    ("the  The", "the"),
    ('"England"', "england"),
    ("`quoted`", "quoted"),
    ("Theodore", "theodore"),  # leading 'the ' only strips the word
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_normalize_py(raw, expected):
    assert normalize_surface_py(raw) == expected


def test_normalize_none():
    assert normalize_surface_py(None) is None


def test_udf_and_builtin_agree(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDENS if r], "raw string")
    rows = df.select(
        "raw",
        normalize_surface_udf(F.col("raw")).alias("py"),
        normalize_surface_col(F.col("raw")).alias("builtin"),
    ).collect()
    for r in rows:
        assert r.py == r.builtin, f"kernel drift on {r.raw!r}: {r.py!r} vs {r.builtin!r}"
        expected = dict(GOLDENS)[r.raw]
        assert r.py == expected


def test_wiki_brackets(spark):
    df = spark.createDataFrame([("Boston (band)",), ("Boston",)], "t string")
    out = [r[0] for r in df.select(remove_wiki_brackets_col(F.col("t"))).collect()]
    assert out == ["Boston", "Boston"]


def test_qcode_to_int(spark):
    df = spark.createDataFrame([("Q42",), ("Q1",)], "q string")
    assert [r[0] for r in df.select(qcode_to_int_col(F.col("q"))).collect()] == [42, 1]
