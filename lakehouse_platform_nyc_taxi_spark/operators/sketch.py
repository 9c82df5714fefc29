"""Count-min sketch (Cormode & Muthukrishnan 2005, public): mergeable
frequency estimation for heavy-hitter queries over keys too numerous to
count exactly.

Spark 4's DataSketches surface ships HLL/KLL/theta/frequent-items but no
CMS, so this one is hand-rolled in pure Catalyst expressions — which also
makes it exactly replayable by the DuckDB oracle (every cell count and
every estimate is integer arithmetic over the same md5 hash family; no
floats, no pinned bounds needed).

Distributed shape: the sketch IS a (depth x width) cell-count table —
``depth * width`` rows regardless of input size. Building it is one
explode (depth rows per input row, map-side-combined immediately) plus
one groupBy — the aggregation state per partition is bounded by the
table size, and two sketches over different data merge by adding cell
counts (the property that makes CMS the streaming/sharded counter at
100 TB: per-shard sketches sum without re-scanning rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import seeded_md5_long


def _cell(key: Column, d: int, width: int) -> Column:
    return seeded_md5_long(key.cast("string"), d) % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: one row per non-empty (row, cell) with its
    count. Missing cells are zero by convention (estimates must
    coalesce). Output: ``d, cell, cnt`` — at most depth*width rows."""
    key = F.col(key_col)
    cells = df.select(
        F.posexplode(
            F.array(*[_cell(key, d, width) for d in range(depth)])
        ).alias("d", "cell")
    )
    return cells.groupBy("d", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate every probe key: min over the sketch's depth rows
    of the key's cell counts. The probe side explodes to depth rows per
    key and joins the (bounded, broadcast) cell table — never the raw
    data. CMS never underestimates; overestimation is bounded by
    collision mass (~ e*N/width with prob 1 - e^-depth per key).

    Output: one row per probe key — ``<key_col>, cms_est``."""
    key = F.col(key_col)
    probe_cells = probes.select(
        key_col,
        F.posexplode(
            F.array(*[_cell(key, d, width) for d in range(depth)])
        ).alias("d", "cell"),
    )
    return (
        probe_cells.join(F.broadcast(cms), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): cell-wise
    count addition — the full-outer union-of-cells, so sparse sketches
    stay sparse."""
    return (
        a.select("d", "cell", F.col("cnt").alias("_ca"))
        .join(b.select("d", "cell", F.col("cnt").alias("_cb")), ["d", "cell"], "full")
        .select(
            "d",
            "cell",
            (
                F.coalesce(F.col("_ca"), F.lit(0))
                + F.coalesce(F.col("_cb"), F.lit(0))
            )
            .cast("bigint")
            .alias("cnt"),
        )
    )
