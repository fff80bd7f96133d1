"""Raw-dump scans and the offline ETL demux — Spark re-expression of the
reference's offline_data_generation stage (SURVEY.md §2.1/§3.3).

The reference stream-parses a bz2 Wikidata JSON dump line by line
(/root/reference/src/refined/offline_data_generation/process_wikidata_dump.py:132-139),
projects each entity (:10-48) and fans out to 16 output files (:94-204);
Wikipedia SQL dumps are regex-parsed (process_wiki.py:61-113). Here:

  - scan_entity_dump: spark.read.text + trailing-comma strip + from_json
    (bz2 text is splittable after repack; the parse itself is one
    whole-stage-codegen projection, no Python).
  - project_entities (P1): nested JSON -> flat typed columns.
  - demux (S8): ONE cached scan -> N filtered writes (or one long-format
    entity_relations table).
  - scan_sql_dump (S3): MySQL INSERT tuples -> rows via explode+regex.
  - scan_tsv (S4): alias TSV pairs.

All functions take DataFrames/paths of SYNTHETIC dumps (fixtures) — no
external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ENTITY_DUMP_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField(
            "labels",
            MapType(StringType(), StructType([StructField("value", StringType())])),
        ),
        StructField(
            "descriptions",
            MapType(StringType(), StructType([StructField("value", StringType())])),
        ),
        StructField(
            "aliases",
            MapType(
                StringType(),
                ArrayType(StructType([StructField("value", StringType())])),
            ),
        ),
        StructField(
            "claims",
            MapType(
                StringType(),
                ArrayType(
                    StructType(
                        [
                            StructField("type", StringType()),
                            StructField("value", StringType()),
                        ]
                    )
                ),
            ),
        ),
        StructField(
            "sitelinks",
            MapType(StringType(), StructType([StructField("title", StringType())])),
        ),
    ]
)


def scan_entity_dump(spark: SparkSession, path: str) -> DataFrame:
    """S2: JSON-array-per-line dump (one entity per line, optional trailing
    comma / bracket lines) -> parsed entities."""
    lines = spark.read.text(path)
    cleaned = lines.select(
        F.regexp_replace(F.trim(F.col("value")), r",$", "").alias("j")
    ).where((F.col("j") != "[") & (F.col("j") != "]") & (F.length("j") > 2))
    return cleaned.select(
        F.from_json("j", ENTITY_DUMP_SCHEMA).alias("e")
    ).select("e.*").where(F.col("id").isNotNull())


def project_entities(parsed: DataFrame) -> DataFrame:
    """P1: project to {qcode, label, desc, aliases, sitelink, n_claims,
    wikibase-item triples} keeping only entity-valued claims."""
    triples = F.filter(
        F.flatten(
            F.transform(
                F.map_entries(F.col("claims")),
                lambda kv: F.transform(
                    kv["value"],
                    lambda c: F.struct(
                        kv["key"].alias("pcode"),
                        c["type"].alias("vtype"),
                        c["value"].alias("value_qcode"),
                    ),
                ),
            )
        ),
        lambda t: t["vtype"] == "wikibase-item",
    )
    return parsed.select(
        F.col("id").alias("qcode"),
        F.col("labels")["en"]["value"].alias("label"),
        F.col("descriptions")["en"]["value"].alias("description"),
        F.coalesce(
            F.transform(F.col("aliases")["en"], lambda a: a["value"]),
            F.array().cast("array<string>"),
        ).alias("aliases"),
        F.col("sitelinks")["enwiki"]["title"].alias("enwiki_title"),
        F.size(F.map_entries(F.coalesce(F.col("claims"), F.map_from_arrays(F.array(), F.array()).cast("map<string,array<struct<type:string,value:string>>>")))).alias("n_claim_props"),
        F.transform(
            triples, lambda t: F.struct(t["pcode"].alias("pcode"), t["value_qcode"].alias("value_qcode"))
        ).alias("triples"),
    )


def entity_relations(projected: DataFrame) -> DataFrame:
    """S8 as one long table instead of 16 files: (qcode, pcode, value_qcode)."""
    return projected.select(
        "qcode", F.explode_outer("triples").alias("t")
    ).where(F.col("t").isNotNull()).select(
        "qcode", F.col("t.pcode").alias("pcode"), F.col("t.value_qcode").alias("value_qcode")
    )


def demux(projected: DataFrame) -> dict[str, DataFrame]:
    """S8: one cached scan -> the reference's fan-out outputs as DataFrames
    (labels, aliases, descriptions, sitelinks, humans, instance_of (P31),
    subclass edges (P279)). Caller writes each; the scan runs once."""
    projected = projected.persist()
    rel = entity_relations(projected)
    return {
        "labels": projected.select("qcode", "label").where(F.col("label").isNotNull()),
        "descriptions": projected.select("qcode", "description").where(
            F.col("description").isNotNull()
        ),
        "aliases": projected.select(
            "qcode", F.explode("aliases").alias("alias")
        ),
        "sitelinks": projected.select(
            F.col("enwiki_title").alias("wiki_title"), "qcode"
        ).where(F.col("enwiki_title").isNotNull()),
        "instance_of": rel.where(F.col("pcode") == "P31"),
        "subclass_edges": rel.where(F.col("pcode") == "P279").select(
            F.col("qcode").alias("child"), F.col("value_qcode").alias("parent")
        ),
        "human_qcodes": rel.where(
            (F.col("pcode") == "P31") & F.col("value_qcode").isin("Q5", "Q15632617")
        ).select("qcode").distinct(),
        "relations": rel,
    }


def scan_sql_dump(
    spark: SparkSession,
    path: str,
    n_fields: int = 3,
    ns_field: int | None = None,
    ns_value: str = "0",
) -> DataFrame:
    """S3: MySQL dump 'INSERT INTO t VALUES (a,b,c),(d,e,f);' -> one row per
    tuple, fields as strings (regex split). Pure column expressions.

    ns_field applies the P3 namespace filter at the scan (the reference
    keeps only namespace-0 = article pages when parsing page/redirect
    dumps, process_wiki.py:70-76): rows whose f{ns_field} != ns_value are
    dropped before anything downstream sees them — the predicate sits
    directly on the projected scan so Catalyst keeps it pre-shuffle."""
    lines = spark.read.text(path).where(F.col("value").startswith("INSERT INTO"))
    tuples = lines.select(
        F.explode(
            F.split(
                F.regexp_extract("value", r"VALUES\s*\((.*)\);?\s*$", 1), r"\),\s*\("
            )
        ).alias("t")
    )
    cols = [
        F.regexp_replace(
            F.trim(F.split("t", ",")[i]), r"^'(.*)'$", r"$1"
        ).alias(f"f{i}")
        for i in range(n_fields)
    ]
    out = tuples.select(*cols)
    if ns_field is not None:
        out = out.where(F.col(f"f{ns_field}") == ns_value)
    return out


def scan_alias_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S4: (surface_form, wiki_page) TSV with quoted first column."""
    df = spark.read.csv(path, sep="\t").toDF("surface_form", "wiki_page")
    return df.select(
        F.regexp_replace("surface_form", r'^"|"$', "").alias("surface_form"),
        F.col("wiki_page"),
    )


def title_with_redirects(
    titles: DataFrame, redirects: DataFrame, wiki_to_qcode: DataFrame,
    title_col: str = "title",
) -> DataFrame:
    """J2 + J3: canonicalize a title (one redirect hop, like the reference —
    generate_pem.py:38-42 chases exactly one) then map to qcode."""
    r = redirects.select(
        F.col("src_title").alias("__src"), F.col("dest_title").alias("__dst")
    )
    hopped = titles.join(r, titles[title_col] == r["__src"], "left").withColumn(
        "__final", F.coalesce("__dst", title_col)
    ).drop("__src", "__dst")
    w = wiki_to_qcode.select(
        F.col("wiki_title").alias("__final"), F.col("qcode")
    )
    return hopped.join(w, "__final", "left").drop("__final")
