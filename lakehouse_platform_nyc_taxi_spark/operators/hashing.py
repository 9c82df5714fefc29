"""Cross-engine deterministic hashing primitives.

Everything the dedup/similarity/text operators hash goes through
``md5_long``: the top 60 bits of md5 as a non-negative int64. It is
reproducible in any engine with an md5 function (DuckDB:
``('0x' || substr(md5(x), 1, 15))::BIGINT``), unlike Spark's
``xxhash64``/``hash`` whose algorithms other engines don't ship.
Pure Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB rendering of md5_long(x) for oracle SQL.
MD5_LONG_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def md5_long(col: Column) -> Column:
    """First 15 hex digits of md5 as BIGINT (non-negative, < 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_md5_long(col: Column, seed: int) -> Column:
    """A family of independent hash functions via seed suffixing."""
    return md5_long(F.concat(col, F.lit(f"#{seed}")))


def seeded_md5_long_sql(x: str, seed: int) -> str:
    return MD5_LONG_SQL.format(x=f"{x} || '#{seed}'")
