import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import pytest

from pygrametl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")


def assert_df_set_equal(actual, expected_rows, columns=None):
    """DTT-style set assertion (ref drawntabletesting/__init__.py:241-297):
    actual DataFrame equals the expected multiset of rows."""
    rows = [tuple(r) for r in actual.collect()]
    if columns:
        assert sorted(actual.columns) == sorted(columns), (actual.columns, columns)
    assert sorted(map(repr, rows)) == sorted(map(repr, [tuple(r) for r in expected_rows])), (
        sorted(rows),
        sorted(expected_rows),
    )
