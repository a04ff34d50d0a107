import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from logprep_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("logprep-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def rows(df):
    """Collect to a list of plain dicts sorted stably for comparison."""
    return [r.asDict(recursive=True) for r in df.collect()]
