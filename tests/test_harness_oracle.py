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


def test_approx_distinct_within_error_bound(spark):
    """agg_approx_distinct folds its accuracy claim into the result as a
    `within_bound` flag (|approx-exact| <= max(3*rsd*exact, 5) at
    rsd=0.05) that the DuckDB oracle pins TRUE — this checks the flag
    and the underlying estimate directly."""
    rows = harness.registry()["agg_approx_distinct"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.within_bound, (r.event_type, r.exact_users)


def test_every_registered_query_in_coverage_md():
    """COVERAGE.md is the parity ledger: every harness.queries() name must
    appear in it (as `name` in a table row) so new registrations can't
    silently skip documentation (VERDICT r6 'Next round' #4)."""
    import pathlib

    cov = pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    text = cov.read_text()
    missing = [n for n in harness.registry() if f"`{n}`" not in text]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_driver_attestation_window_is_exactly_50():
    """The driver's correctness pass attests only the FIRST 50 registered
    queries. _PRIORITY must therefore be exactly 50 names and be exactly
    the head of the registry ordering — a 51st entry silently falls out
    of the window (ADVICE r10 #1: ``set_except_all`` lost its r10 row
    this way)."""
    names = list(harness.registry())
    assert len(harness._PRIORITY) == 50, (
        f"_PRIORITY has {len(harness._PRIORITY)} names; the driver window is 50"
    )
    assert names[:50] == harness._PRIORITY
    # No duplicates anywhere in the ordering lists.
    ordering = harness._PRIORITY + harness._KEEP + harness._ROTATE_OUT
    assert len(ordering) == len(set(ordering))


def test_approx_percentile_high_cardinality_error_bound(spark, duck_oracle):
    """The genuinely-approximate sketch case (high-cardinality price):
    GK with accuracy a guarantees rank error <= n/a; check the returned
    value sits within the exact value's neighborhood (0.5% relative —
    far looser than the rank bound implies on this data)."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

    from .conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem")
    got = {
        r.l_returnflag: list(r.ap)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("ap")
        )
        .collect()
    }
    exact = {
        flag: [p50, p90, p99]
        for flag, p50, p90, p99 in duck_oracle.execute(
            """
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.5),
                   quantile_disc(l_extendedprice, 0.9),
                   quantile_disc(l_extendedprice, 0.99)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for flag in got:
        for a, e in zip(got[flag], exact[flag]):
            assert abs(a - e) / e < 0.005, (flag, a, e)
