"""Date-span resolution (operators F6 / F7 / C10).

The reference fuzzy-parses date mentions with dateutil, strips qualifier
prefixes ('early|late|mid'), splits ranges into multiple dates, and then
applies a DOC-LEVEL format consensus: if any date in the document
disambiguates day-first vs month-first, ambiguous dates are re-parsed with
that hint (/root/reference/src/refined/utilities/numeric_handling/
date_utils.py:97-229, 120-160).

Spark shape:
  - parse_dates_udf: Arrow pandas UDF wrapping dateutil (the fuzzy grammar
    has no builtin equivalent); returns struct<day,month,year,known_format,
    day_first_evidence,month_first_evidence>.
  - doc_format_consensus (F7): groupBy(doc_id) collect evidence -> join the
    hint back -> conditional re-parse of ambiguous dates. Group-wise second
    pass == Window.partitionBy(doc_id) semantics, expressed as agg+join
    (cheaper: the agg output is tiny).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

DATE_STRUCT = StructType(
    [
        StructField("day", IntegerType()),
        StructField("month", IntegerType()),
        StructField("year", IntegerType()),
        StructField("known_format", BooleanType()),
        StructField("ambiguous", BooleanType()),
    ]
)

_QUALIFIER = ("early ", "late ", "mid ", "mid-", "the ")


def parse_date_py(text: str | None, day_first: bool = False) -> dict | None:
    """Pure-Python kernel (shared with tests): fuzzy-parse one date mention."""
    if not text:
        return None
    from dateutil import parser as du

    t = text.strip().lower()
    for q in _QUALIFIER:
        if t.startswith(q):
            t = t[len(q):]
    t = t.strip()
    if not t:
        return None

    # detect whether day/month order is observable (e.g. '13/05/1999' is
    # unambiguous because 13 > 12; '05/06/1999' is ambiguous)
    try:
        d1 = du.parse(t, dayfirst=day_first, default=None, fuzzy=False)
    except (ValueError, OverflowError, TypeError):
        return None
    try:
        d2 = du.parse(t, dayfirst=not day_first, fuzzy=False)
        ambiguous = (d1.day, d1.month) != (d2.day, d2.month)
    except (ValueError, OverflowError, TypeError):
        ambiguous = False

    # figure out which components were actually present
    sentinel1 = du.parse(t, dayfirst=day_first, default=pd.Timestamp(2001, 1, 1))
    sentinel2 = du.parse(t, dayfirst=day_first, default=pd.Timestamp(2002, 2, 2))
    day = sentinel1.day if sentinel1.day == sentinel2.day else None
    month = sentinel1.month if sentinel1.month == sentinel2.month else None
    year = sentinel1.year if sentinel1.year == sentinel2.year else None
    return {
        "day": day,
        "month": month,
        "year": year,
        "known_format": not ambiguous,
        "ambiguous": ambiguous,
    }


@pandas_udf(DATE_STRUCT)
def parse_date_udf(texts: pd.Series) -> pd.DataFrame:
    out = [parse_date_py(t) or {"day": None, "month": None, "year": None,
                                "known_format": None, "ambiguous": None}
           for t in texts]
    return pd.DataFrame(out)


@pandas_udf(DATE_STRUCT)
def parse_date_dayfirst_udf(texts: pd.Series) -> pd.DataFrame:
    out = [parse_date_py(t, day_first=True) or
           {"day": None, "month": None, "year": None,
            "known_format": None, "ambiguous": None}
           for t in texts]
    return pd.DataFrame(out)


DATE_SPLIT_RE = r"\s?--\s?| - | to "


def split_date_ranges(
    date_mentions: DataFrame, text_col: str = "text", id_col: str = "mention_id"
) -> DataFrame:
    """Operator F6 (range split) — '1988 to 1999' is TWO dates. Mirrors
    the reference's _split_date_text (/root/reference/src/refined/
    utilities/numeric_handling/date_utils.py:105,162-181): split on
    ' -- ' / ' - ' / ' to ', keeping each part's character offset within
    the original span text.

    Spark shape: split() gives the parts, regexp_extract_all the
    delimiters; part i's offset is the exclusive prefix sum of
    len(part_j)+len(delim_j) — one per-mention window, all built-ins.
    Output: input columns (minus text) + (part_idx, part_text,
    part_offset); single-date spans pass through as one row with
    offset 0."""
    carried = [c for c in date_mentions.columns if c != text_col]
    parts = date_mentions.select(
        *carried,
        F.split(text_col, DATE_SPLIT_RE).alias("__segs"),
        F.regexp_extract_all(
            text_col, F.lit(f"({DATE_SPLIT_RE})"), 1
        ).alias("__delims"),
    )
    # part i's offset = sum_{j<i} len(seg_j) + len(delim_j): a per-row
    # array prefix sum (arrays are a handful of parts long), computed
    # BEFORE the explode — the Window.partitionBy(mention_id) this
    # replaces shuffled and sorted every exploded part just to add
    # integers that never leave their source row.
    structs = F.transform(
        F.col("__segs"),
        lambda s, i: F.struct(
            i.alias("part_idx"),
            s.alias("part_text"),
            (
                F.aggregate(F.slice(F.col("__segs"), 1, i), F.lit(0),
                            lambda a, x: a + F.length(x))
                + F.aggregate(F.slice(F.col("__delims"), 1, i), F.lit(0),
                              lambda a, x: a + F.length(x))
            ).cast("long").alias("part_offset"),
        ),
    )
    return parts.select(*carried, F.explode(structs).alias("__p")).select(
        *carried, "__p.part_idx", "__p.part_text", "__p.part_offset"
    )


def resolve_date_spans(date_mentions: DataFrame) -> DataFrame:
    """C10: (doc_id, mention_id, text) -> parsed dates with doc-level
    format consensus applied to ambiguous ones.

    Consensus rule (mirroring date_utils.py:120-160): if the document
    contains any unambiguous date whose day-first reading was required
    (month position > 12 case), ambiguous dates re-parse with
    day_first=True."""
    parsed = date_mentions.withColumn("d", parse_date_udf(F.col("text")))

    # evidence: a doc is day-first if re-parsing an unambiguous date with
    # dayfirst=True yields the SAME result (i.e. day-first is consistent)
    # while month-first parse failed to match — approximated by: any
    # unambiguous date with day > 12 that dateutil put in the day slot.
    evidence = (
        parsed.where(F.col("d.known_format") & (F.col("d.day") > 12))
        .groupBy("doc_id")
        .agg(F.lit(True).alias("doc_day_first"))
    )
    out = parsed.join(evidence, "doc_id", "left")
    reparsed = F.when(
        F.col("d.ambiguous") & F.col("doc_day_first"),
        parse_date_dayfirst_udf(F.col("text")),
    ).otherwise(F.col("d"))
    return out.withColumn("date", reparsed).drop("d", "doc_day_first")


def format_parsed_string(dates: DataFrame) -> DataFrame:
    """The reference's parsed_string output (Date -> display string)."""
    d = F.col("date")
    return dates.withColumn(
        "parsed_string",
        F.concat_ws(
            "-",
            F.lpad(F.coalesce(d["year"].cast("string"), F.lit("????")), 4, "0"),
            F.lpad(F.coalesce(d["month"].cast("string"), F.lit("??")), 2, "0"),
            F.lpad(F.coalesce(d["day"].cast("string"), F.lit("??")), 2, "0"),
        ),
    )
