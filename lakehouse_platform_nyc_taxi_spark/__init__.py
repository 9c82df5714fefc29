"""PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse platform (Spark ingest -> Iceberg -> Trino + dbt),
re-expressed idiomatically on a single PySpark stack: parquet managed
tables, composable DataFrame model functions, a declarative assertion
runner, and `spark.sql` as the ad-hoc surface. See SURVEY.md for the
operator inventory this package implements.
"""

__version__ = "0.1.0"
