from __future__ import annotations

import pytest

from neosync_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="neosync_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s


def assert_pdf_equal(actual, expected, sort_cols, msg=""):
    """Order-insensitive frame equality under a stable sort."""
    import pandas as pd

    a = actual.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    e = expected.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    a = a[sorted(a.columns)]
    e = e[sorted(e.columns)]
    pd.testing.assert_frame_equal(a, e, check_dtype=False, obj=msg or "frame")
