"""Cross-check every registered harness query against its DuckDB oracle —
the local mirror of the driver's correctness gate, at the driver's sf
(0.01) with exact value comparison."""

from __future__ import annotations

import pytest

from lakehouse_platform_nyc_taxi_spark import harness

from .conftest import SF_ORACLE
from .oracle_utils import assert_matches_oracle


def _specs():
    return [
        pytest.param(spec, id=name) for name, spec in sorted(harness.registry().items())
    ]


@pytest.mark.parametrize("spec", _specs())
def test_query_matches_oracle(spark, duck_oracle, spec):
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_matches_oracle(df, duck_oracle, spec.oracle, name=spec.name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
