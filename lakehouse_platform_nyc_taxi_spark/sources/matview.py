"""Incrementally-maintained materialized aggregates over snapshot tables.

The lakehouse pattern Delta/Snowflake call an incremental materialized
view: a grouped aggregate (count / sum per key) stored as its own
snapshot table, refreshed from the BASE TABLE'S CHANGE FEED instead of
recomputed. Because copy-on-write changes are (insert, delete) row
multisets (``snapshots.table_changes``), any distributive aggregate
refreshes by folding SIGNED deltas: +1/+x for inserts, -1/-x for
deletes, then merging the delta rows into the view by group key.

Scale: a refresh reads only the files churned since the last refresh
(the change feed's guarantee), aggregates them (map-side combine on the
group key), and folds them into the view in ONE merge-shaped commit with
manifest-stats file pruning — cost proportional to the CHANGE volume plus
the touched view files, not the base table or the whole view. The
commit is atomic and tags the base version it reflects, so a crashed
refresh reruns from the same state (all-or-nothing, never half-applied).

Only distributive aggregates (count, sum) — and averages derived from
them at read time — fold by signed deltas alone; min/max need the base
table on deletes (a delete may remove the current extremum), so they are
deliberately not offered here: recompute those, or layer them on the
exact percentile path.

``approx_distinct_cols`` maintains per-group Apache DataSketches HLL
sketches (binary, mergeable): inserts fold by ``hll_union`` — sketch
union is the distributive path, no base read — while a delete taints
only ITS groups, which recompute from the current base scoped by a
semi-join on the tainted keys (manifest-stats pruning keeps that scan
proportional to the churned key range, not the table). Estimates come
from ``read_mv_estimates`` at read time; the stored sketch stays
mergeable for further refreshes and cross-view rollups.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import snapshots as snap


def _view_state(mv_path: str) -> tuple[int, dict]:
    """(current mv version, newest manifest carrying the MV tags).

    Maintenance commits on the view itself (``optimize_table``
    compaction/clustering) are data-preserving but carry no MV tags, so
    the state walk takes the newest manifest that HAS ``base_version`` —
    clustering a view must not break refresh."""
    v = snap.current_version(mv_path)
    if v is None:
        raise ValueError(f"no materialized view at {mv_path}")
    for cand in reversed(snap._versions(mv_path)):
        m = snap._read_manifest(mv_path, cand)
        if "base_version" in m:
            return v, m
    raise ValueError(f"{mv_path} is not a materialized view (no base_version)")


def create_grouped_mv(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    approx_distinct_cols: Sequence[str] = (),
) -> int:
    """Materialize ``SELECT group_cols, count(*) AS n_rows,
    sum(c) AS sum_<c>..., hll_sketch_agg(c) AS hll_<c>... FROM base
    GROUP BY group_cols`` as a snapshot table tagged with the base
    version it reflects."""
    base_v = snap.current_version(base_path)
    if base_v is None:
        raise ValueError(f"no snapshot table at {base_path}")
    df = snap.read_table(spark, base_path, base_v)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c)).alias(f"sum_{c}") for c in sum_cols],
        *[
            F.hll_sketch_agg(F.col(c)).alias(f"hll_{c}")
            for c in approx_distinct_cols
        ],
    )
    if snap._versions(mv_path):
        raise ValueError(f"materialized view already exists at {mv_path}")
    os.makedirs(os.path.join(mv_path, snap._SNAP_DIR), exist_ok=True)
    files, stats = snap._write_data_files(agg, mv_path)
    # record the view schema like create_table does: refreshes pin their
    # reads AND their null-literal types to it, so kept and rewritten
    # files never diverge in column types
    snap._commit(
        mv_path, files, "mv-create", parent=None,
        schema_json=agg.schema.json(), new_stats=stats,
        extra={"base_version": base_v,
               "mv_group_cols": list(group_cols),
               "mv_sum_cols": list(sum_cols),
               "mv_hll_cols": list(approx_distinct_cols)},
    )
    return base_v


def refresh_mv(
    spark: SparkSession, base_path: str, mv_path: str
) -> tuple[int, int]:
    """Fold the base table's changes since the last refresh into the
    view. Returns ``(base_version_before, base_version_after)``; a no-op
    (base unchanged) returns equal versions and commits nothing.

    The delta aggregation carries a sign column (+1 insert, -1 delete),
    so one map-side-combined ``groupBy`` produces per-key adjustments;
    groups whose count drops to zero leave the view. The merge into the
    view rewrites only key-range-intersecting files.
    """
    mv_v, m = _view_state(mv_path)
    reflected = int(m["base_version"])
    group_cols = list(m["mv_group_cols"])
    sum_cols = list(m["mv_sum_cols"])
    hll_cols = list(m.get("mv_hll_cols", []))
    base_now = snap.current_version(base_path)
    if base_now == reflected:
        return reflected, reflected
    changes = snap.table_changes(spark, base_path, reflected, base_now)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    deltas = (
        changes.withColumn("_sign", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").alias("_d_n"),
            *[
                F.sum(F.col(c) * F.col("_sign")).alias(f"_d_sum_{c}")
                for c in sum_cols
            ],
            # insert-only sketches union into the view; a delete taints
            # the group (sketches can't subtract) -> base recompute below
            *[
                F.hll_sketch_agg(
                    F.when(F.col("_sign") == 1, F.col(c))
                ).alias(f"_d_hll_{c}")
                for c in hll_cols
            ],
            *(
                [
                    F.max(
                        F.when(F.col("_sign") == -1, F.lit(1)).otherwise(F.lit(0))
                    ).alias("_d_del")
                ]
                if hll_cols
                else []
            ),
        )
        # fence: deltas feed three consumers (range probe, anti-join,
        # right join); without the checkpoint each would re-read and
        # re-aggregate the churned base files
        .localCheckpoint(eager=True)
    )
    rec = None
    if hll_cols:
        tainted = deltas.filter(F.col("_d_del") == 1).select(*group_cols)
        # recompute sketches ONLY for delete-tainted groups: churn-sized
        # semi-join key set; the base read prunes files via manifest stats
        rec = (
            snap.read_table(spark, base_path, base_now)
            .join(F.broadcast(tainted), on=group_cols, how="left_semi")
            .groupBy(*group_cols)
            .agg(
                *[
                    F.hll_sketch_agg(F.col(c)).alias(f"_r_hll_{c}")
                    for c in hll_cols
                ]
            )
        )
    # One atomic merge-shaped commit (refresh must be all-or-nothing so
    # a crashed refresh can simply rerun): prune view files by the delta
    # key range, carry untouched files, rewrite candidates as
    # (survivors without delta keys) UNION (adjusted groups with n > 0)
    # — removals are just groups that don't come back.
    mv_manifest = snap._read_manifest(mv_path, mv_v)
    old_files = mv_manifest["files"]
    k0 = group_cols[0]
    lo, hi = deltas.agg(F.min(k0), F.max(k0)).collect()[0]
    if lo is None:
        candidates: list[str] = []
    else:
        candidates = snap._candidate_files(mv_path, mv_manifest, k0, lo, hi)
    kept = [f for f in old_files if f not in set(candidates)]
    # the view's column types are the contract every refresh must keep
    # writing (kept files and rewritten files read as ONE parquet set):
    # take them from the manifest schema, falling back to the stored
    # files for views created before schemas were recorded
    view_schema = snap._table_schema(mv_path, mv_v)
    if view_schema is None:
        view_schema = snap.read_table(spark, mv_path, mv_v).schema
    if candidates:
        cand = snap._read_files_pinned(spark, mv_path, candidates, mv_v)
        survivors = cand.join(
            deltas.select(*group_cols), on=group_cols, how="left_anti"
        )
        touched = cand.join(deltas, on=group_cols, how="right")
    else:
        survivors = None
        touched = deltas.select(
            *group_cols,
            F.lit(None).cast(view_schema["n_rows"].dataType).alias("n_rows"),
            *[
                F.lit(None)
                .cast(view_schema[f"sum_{c}"].dataType)
                .alias(f"sum_{c}")
                for c in sum_cols
            ],
            *[
                F.lit(None).cast("binary").alias(f"hll_{c}")
                for c in hll_cols
            ],
            F.col("_d_n"),
            *[F.col(f"_d_sum_{c}") for c in sum_cols],
            *[F.col(f"_d_hll_{c}") for c in hll_cols],
            *([F.col("_d_del")] if hll_cols else []),
        )
    if rec is not None:
        touched = touched.join(rec, on=group_cols, how="left")

    def _hll_next(c: str):
        old, d = F.col(f"hll_{c}"), F.col(f"_d_hll_{c}")
        merged = (
            F.when(old.isNull(), d)
            .when(d.isNull(), old)
            .otherwise(F.hll_union(old, d))
        )
        return (
            F.when(F.col("_d_del") == 1, F.col(f"_r_hll_{c}")).otherwise(merged)
            if rec is not None
            else merged
        ).alias(f"hll_{c}")

    adjusted = touched.select(
        *group_cols,
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("_d_n"))
        .cast(view_schema["n_rows"].dataType)
        .alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_sum_{c}"), F.lit(0))
            )
            .cast(view_schema[f"sum_{c}"].dataType)
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
        *[_hll_next(c) for c in hll_cols],
    ).filter(F.col("n_rows") > 0)
    rewrite = (
        adjusted if survivors is None else survivors.unionByName(adjusted)
    )
    written, new_stats = snap._write_data_files(rewrite, mv_path)
    files = kept + written
    snap._commit(
        mv_path, files, "mv-refresh", parent=mv_v, new_stats=new_stats,
        extra={"base_version": base_now,
               "mv_group_cols": group_cols,
               "mv_sum_cols": sum_cols,
               "mv_hll_cols": hll_cols},
    )
    return reflected, base_now


def read_mv(spark: SparkSession, mv_path: str) -> DataFrame:
    """Current view contents (plain snapshot read; time travel works via
    ``snapshots.read_table`` directly)."""
    return snap.read_table(spark, mv_path)


def read_mv_estimates(spark: SparkSession, mv_path: str) -> DataFrame:
    """View contents with each stored HLL sketch rendered as
    ``approx_distinct_<c>`` (the sketch column itself is dropped — it
    stays in the table for mergeability, estimates are a read-time
    projection)."""
    _, m = _view_state(mv_path)
    hll_cols = list(m.get("mv_hll_cols", []))
    df = snap.read_table(spark, mv_path)
    for c in hll_cols:
        df = df.withColumn(
            f"approx_distinct_{c}", F.hll_sketch_estimate(F.col(f"hll_{c}"))
        ).drop(f"hll_{c}")
    return df
