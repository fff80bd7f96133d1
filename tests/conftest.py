import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# sandbox-only: keep shuffle spill off the IOPS-throttled virtual disk
os.environ.setdefault("REFINED_SPARK_TMPFS_SHUFFLE", "1")

from refined_spark import fixtures  # noqa: E402
from refined_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="refined_spark_tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_paths(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixtures")
    return fixtures.generate(str(out), n_docs=120, n_entities=40, seed=42)


@pytest.fixture(scope="session")
def tables(spark, fixture_paths):
    return {k: spark.read.parquet(v) for k, v in fixture_paths.items()}
