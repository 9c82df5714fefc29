from __future__ import annotations

import duckdb
import pytest

from lakehouse_platform_nyc_taxi_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata registered as views, matching
    how the driver's oracle runs oracle_sql()."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    con = make_duck(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_oracle():
    con = make_duck(SF_ORACLE)
    yield con
    con.close()
