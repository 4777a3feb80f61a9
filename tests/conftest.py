import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tripsu_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        master="local[4]",
        app_name="tripsu-spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


def rows_to_set(df):
    """Order-insensitive comparison helper: DataFrame -> frozenset of tuples."""
    return frozenset(tuple(r) for r in df.collect())
