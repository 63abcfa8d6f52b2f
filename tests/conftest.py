"""Shared Spark session for the test suite (module-scoped: one JVM)."""

from __future__ import annotations

import pytest

from safedata_validator_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="sdv-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def dims(spark):
    from safedata_validator_spark.data.synth import dims as _dims

    return _dims(spark)


def rows(df, *order_cols):
    """Collect to a list of dicts ordered deterministically."""
    if order_cols:
        df = df.orderBy(*order_cols)
    return [r.asDict(recursive=True) for r in df.collect()]
