"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query at sf0.001 — the dictionary-blocking spine
  (normalize -> PEM prior build -> candidate join -> argmax) over the
  driver's documents corpus.
- queries()/oracle_sql(): the operator catalog from refined_spark.queries.
  oracle_sql() is a SUBSET of queries(): every batch query has a
  DuckDB-runnable ANSI-SQL twin (verified side-by-side in
  tests/test_oracle_parity.py before shipping); the one streaming entry
  (incremental_resolve) is not ANSI-SQL-expressible and carries its
  equality evidence in-query (it raises unless the incremental result
  equals a full batch recompute) — consumers iterating queries() must
  use oracle_sql().get(name), not [name].
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from refined_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: blocking join + per-mention argmax on /root/testdata/sf0.001."""
    return _q.q_candidate_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
