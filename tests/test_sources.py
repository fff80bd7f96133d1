"""Raw-dump ETL scans: entity-dump parse (S2/P1), demux (S8), SQL-dump scan
(S3), alias TSV (S4), redirect-hop + sitelink joins (J2/J3)."""

import pyspark.sql.functions as F
import pytest

from refined_spark import fixtures
from refined_spark.sources import dumps


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    out = tmp_path_factory.mktemp("raw")
    return fixtures.generate_raw_dumps(str(out), n_entities=30, seed=42)


def test_entity_dump_scan_and_projection(spark, raw):
    parsed = dumps.scan_entity_dump(spark, raw["entity_dump"])
    proj = dumps.project_entities(parsed)
    rows = {r.qcode: r for r in proj.collect()}
    assert len(rows) == 30
    r = rows["Q1"]
    assert r.label and r.enwiki_title == r.label.replace(" ", "_")
    # only wikibase-item claims survive into triples (P17 string dropped)
    assert all(t.pcode in ("P31", "P279") for t in r.triples)


def test_demux(spark, raw):
    proj = dumps.project_entities(dumps.scan_entity_dump(spark, raw["entity_dump"]))
    outs = dumps.demux(proj)
    assert outs["labels"].count() == 30
    humans = {r.qcode for r in outs["human_qcodes"].collect()}
    # fixture: i % 10 < 7 -> human
    assert "Q1" in humans and len(humans) == 21
    sub = outs["subclass_edges"].collect()
    assert all(r.parent == "Q43229" for r in sub)
    assert outs["aliases"].count() > 0


def test_sql_dump_scan(spark, raw):
    df = dumps.scan_sql_dump(spark, raw["redirect_sql"], n_fields=3)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["f1"].endswith("_old")


def test_alias_tsv(spark, raw):
    df = dumps.scan_alias_tsv(spark, raw["alias_tsv"])
    rows = df.collect()
    assert len(rows) == 20
    assert not rows[0].surface_form.startswith('"')


def test_redirect_and_sitelink_join(spark, raw):
    proj = dumps.project_entities(dumps.scan_entity_dump(spark, raw["entity_dump"]))
    outs = dumps.demux(proj)
    sql = dumps.scan_sql_dump(spark, raw["redirect_sql"], n_fields=3)
    redirects = sql.select(
        F.col("f1").alias("src_title"), F.col("f2").alias("dest_title")
    )
    src = redirects.first().src_title
    titles = spark.createDataFrame([(src,)], "title string")
    out = dumps.title_with_redirects(titles, redirects, outs["sitelinks"])
    r = out.collect()[0]
    assert r.qcode is not None


def test_etl_pem_matches_relational_fixture(spark, raw, tmp_path):
    """End-to-end ETL check: dump -> labels+aliases evidence -> build_pem
    reproduces the fixture's PEM keys."""
    from refined_spark.functions.normalize import normalize_surface_udf
    from refined_spark.operators.pem import build_pem

    proj = dumps.project_entities(dumps.scan_entity_dump(spark, raw["entity_dump"]))
    outs = dumps.demux(proj)
    ev = (
        outs["labels"].select(F.col("label").alias("raw"), "qcode", F.lit(6.0).alias("cnt"))
        .unionByName(
            outs["aliases"].select(F.col("alias").alias("raw"), "qcode", F.lit(1.0).alias("cnt"))
        )
        .select(normalize_surface_udf(F.col("raw")).alias("surface_form"), "qcode", "cnt")
        .where(F.col("surface_form") != "")
    )
    pem = build_pem(ev)
    paths = fixtures.generate(str(tmp_path / "rel"), n_docs=5, n_entities=30, seed=42)
    expected_keys = {
        r.surface_form for r in spark.read.parquet(paths["pem"]).collect()
    }
    got_keys = {r.surface_form for r in pem.collect()}
    assert expected_keys == got_keys