"""Snapshot-versioned parquet tables: ACID-ish DML without table-format
jars.

The reference registers its layers as Iceberg tables and leans on
Iceberg DML — ``DELETE FROM t WHERE year=Y AND month=M`` plus snapshot
reads (scripts/nyc_taxi/ingest_spark_bulk.py:73-76). This container
ships no Iceberg/Delta jars, so this module rebuilds the metadata layer
those formats provide, on plain parquet:

- a table is a directory of immutable data files plus ``_snapshots/``
  manifest JSONs; each manifest lists exactly the files belonging to one
  table version (the Iceberg/Delta design: data immutable, state =
  manifest);
- writers never mutate data files — append adds files, delete rewrites
  only the files that contain matching rows (copy-on-write) — and
  commit a new manifest via write-temp + atomic ``os.link`` claim
  (put-if-absent CAS on the version number), so a concurrent reader
  sees the old version or the new one, never a half-state, and of two
  racing writers exactly one wins the commit (the optimistic-concurrency
  protocol Delta/Iceberg use);
- old manifests stay, so any historical version remains readable
  (time travel) and ``rollback`` is just re-committing an old file list.

Scale notes: delete prunes files by parquet footer min/max stats BEFORE
touching data (only candidate files are read or rewritten — on a
partitioned/sorted layout a point delete rewrites one file, not the
table), and the rewrite of all candidate files is ONE distributed job,
not a per-file loop. Manifests carry relative paths, so tables relocate.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


def _table_dirs(path: str) -> tuple[str, str]:
    return os.path.join(path, _SNAP_DIR), os.path.join(path, _DATA_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _SNAP_DIR, f"v{version:08d}.json")


def _versions(path: str) -> list[int]:
    snap_dir, _ = _table_dirs(path)
    if not os.path.isdir(snap_dir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(snap_dir)
        if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _commit(
    path: str,
    files: list[str],
    op: str,
    parent: int | None,
    extra: dict | None = None,
) -> int:
    """Atomically publish a new version.

    The manifest is written to a temp file, then *claimed* with
    ``os.link(tmp, target)`` — a true compare-and-swap on the version
    number: link fails with EEXIST if any other writer already committed
    this version, so two racing writers cannot both win (the loser gets
    RuntimeError and must re-read the table and retry on the new parent).
    Readers still never observe a torn manifest: the link makes the fully
    written file appear at the target name in one atomic step. This is
    the optimistic-concurrency commit protocol Delta/Iceberg use on
    stores with atomic put-if-absent.
    """
    version = (parent or 0) + 1
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "committed_at": time.time(),
        "files": sorted(files),
        **(extra or {}),
    }
    target = _manifest_path(path, version)
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise RuntimeError(
            f"version {version} already committed at {path} — lost the "
            "commit race to a concurrent writer; re-read the table and "
            "retry the operation against the new current version"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def _write_data_files(df: DataFrame, path: str) -> list[str]:
    """Write df as new immutable data files; return their table-relative
    paths. Files land in a fresh uuid-named subdir of data/, so no write
    ever collides with an existing file (immutability invariant)."""
    batch = uuid.uuid4().hex
    out_dir = os.path.join(path, _DATA_DIR, batch)
    df.write.mode("error").parquet(out_dir)
    rel = []
    for root, _dirs, names in os.walk(out_dir):
        for n in names:
            if n.endswith(".parquet"):
                rel.append(
                    os.path.relpath(os.path.join(root, n), path)
                )
    return rel


def current_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def create_table(df: DataFrame, path: str) -> int:
    """CTAS: v1 of a new snapshot table."""
    if _versions(path):
        raise ValueError(f"snapshot table already exists at {path}")
    os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
    files = _write_data_files(df, path)
    return _commit(path, files, "create", parent=None)


def append(df: DataFrame, path: str) -> int:
    """Append-only commit: new files + previous version's files."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    files = _read_manifest(path, parent)["files"] + _write_data_files(df, path)
    return _commit(path, files, "append", parent=parent)


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the latest. The returned
    DataFrame stays valid even if later commits change the table — its
    file list is frozen (immutable data files are never rewritten)."""
    v = version if version is not None else current_version(path)
    if v is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, v)
    if not manifest["files"]:
        raise ValueError(f"version {v} of {path} is empty")
    return spark.read.parquet(*[os.path.join(path, f) for f in manifest["files"]])


def _stats_may_match(
    file_path: str, column: str, lo, hi
) -> bool:
    """Footer min/max pruning: can this file contain rows with
    column in [lo, hi]? Unknown stats -> conservatively True."""
    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(file_path).metadata
    except Exception:
        return True
    idx = None
    for i in range(len(meta.schema)):
        if meta.schema.column(i).name == column:
            idx = i
            break
    if idx is None:
        return True
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return True
        try:
            if not (hi < st.min or lo > st.max):
                return True
        except TypeError:
            # Bounds incomparable with the footer-stat type (e.g. str
            # bounds on an int column): keep the documented contract —
            # unknown answers are conservatively True, never an error.
            return True
    return False


def delete_range(
    spark: SparkSession, path: str, column: str, lo, hi
) -> int:
    """Copy-on-write ``DELETE WHERE column BETWEEN lo AND hi``.

    Safe-by-construction variant of :func:`delete_where`: the row filter
    and the footer-stats file prune are built from the SAME (column, lo,
    hi), so they cannot diverge. Prefer this whenever the delete
    predicate is a range — it is the shape Iceberg's partition-scoped
    ``DELETE FROM t WHERE year=Y AND month=M`` takes
    (scripts/nyc_taxi/ingest_spark_bulk.py:73-76).
    """
    pred = F.col(column).between(F.lit(lo), F.lit(hi))
    return delete_where(spark, path, pred, prune=(column, lo, hi))


def delete_where(
    spark: SparkSession,
    path: str,
    predicate: Column,
    prune: tuple[str, object, object] | None = None,
) -> int:
    """Copy-on-write DELETE: rewrite only the files that may contain
    matching rows, keep every other file untouched in the new manifest.

    ``prune`` = (column, lo, hi) narrows the candidate set by parquet
    footer stats before any data is read — the file-skipping Iceberg
    gets from manifest stats. Candidates are rewritten in ONE
    distributed job (read together, filter NOT predicate, write new
    files); rewritten inputs and now-empty files drop out of the new
    version. Readers pinned to older versions are unaffected.

    **CORRECTNESS REQUIREMENT on ``prune``**: every row matching
    ``predicate`` must satisfy ``lo <= column <= hi`` (the range must
    OVER-approximate the predicate). Files wholly outside the range are
    carried into the new version UNSCANNED — if the range is narrower
    than the predicate, matching rows in skipped files silently survive
    the delete. When the predicate *is* a range, use
    :func:`delete_range`, which derives both from one spec and cannot
    diverge.
    """
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    old_files = _read_manifest(path, parent)["files"]
    if prune is not None:
        col, lo, hi = prune
        candidates = [
            f for f in old_files if _stats_may_match(os.path.join(path, f), col, lo, hi)
        ]
    else:
        candidates = list(old_files)
    cand_set = set(candidates)
    kept = [f for f in old_files if f not in cand_set]
    new_files = kept
    if candidates:
        survivors = spark.read.parquet(
            *[os.path.join(path, f) for f in candidates]
        ).filter(~predicate)
        new_files = kept + _write_data_files(survivors, path)
    return _commit(path, new_files, "delete", parent=parent)


def rollback(path: str, version: int) -> int:
    """Restore an old version's file list as a NEW commit (history is
    append-only, like Iceberg rollback — nothing is erased)."""
    if version not in _versions(path):
        raise ValueError(f"version {version} does not exist at {path}")
    parent = current_version(path)
    files = _read_manifest(path, version)["files"]
    return _commit(path, files, f"rollback-to-{version}", parent=parent)


def history(path: str) -> list[dict]:
    """Commit log, oldest first: version, op, parent, file count."""
    out = []
    for v in _versions(path):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "op": m["op"],
                "parent": m["parent"],
                "n_files": len(m["files"]),
                "committed_at": m["committed_at"],
            }
        )
    return out


def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Vacuum: drop all but the newest ``keep_last`` manifests and
    delete data files no surviving version references. Time travel to
    expired versions is gone afterwards — the storage-reclaim tradeoff
    Iceberg's expire_snapshots makes explicit."""
    vs = _versions(path)
    if len(vs) <= keep_last:
        return []
    expired, kept_versions = vs[:-keep_last], vs[-keep_last:]
    live = {
        f for v in kept_versions for f in _read_manifest(path, v)["files"]
    }
    for v in expired:
        for f in _read_manifest(path, v)["files"]:
            if f not in live:
                full = os.path.join(path, f)
                if os.path.exists(full):
                    os.remove(full)
        os.remove(_manifest_path(path, v))
    return expired


def optimize_table(
    spark: SparkSession,
    path: str,
    cluster_by: Sequence[str] = (),
    target_files: int | None = None,
) -> int:
    """Compaction + clustering rewrite (Iceberg ``rewrite_data_files`` /
    Delta ``OPTIMIZE ... ZORDER BY``'s role): rewrite the current version
    into ``target_files`` files, range-clustered on ``cluster_by``.

    Why it matters at 100 TB: ``delete_where``/reader pruning skips files
    by footer min/max stats, which only bite when each file covers a
    NARROW value range. Appends produce arrival-ordered files whose
    ranges all overlap (every file "may match" everything); clustering
    makes ranges disjoint, so point/range operations touch O(1) files
    instead of O(all). Small-file compaction is the same rewrite with an
    empty ``cluster_by``.

    One distributed job (repartitionByRange + sortWithinPartitions +
    write); readers pinned to older versions are untouched, and the
    commit CAS protects against concurrent writers like any other op.
    """
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    df = read_table(spark, path, parent)
    if target_files is None:
        target_files = max(1, spark.sparkContext.defaultParallelism)
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        df = df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.coalesce(target_files)
    files = _write_data_files(df, path)
    return _commit(path, files, "optimize", parent=parent)


def committed_stream_batches(path: str) -> set[int]:
    """Stream batch ids already durably committed to this table."""
    out = set()
    for v in _versions(path):
        m = _read_manifest(path, v)
        if "stream_batch_id" in m:
            out.add(int(m["stream_batch_id"]))
    return out


def append_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once streaming append into a snapshot table — the Delta/
    Iceberg streaming-sink pattern on plain parquet.

    ``foreachBatch`` turns each micro-batch into one snapshot commit that
    records its ``stream_batch_id`` in the manifest. Structured
    Streaming replays a batch if the sink fails before the checkpoint
    advances; the replay sees its id in ``committed_stream_batches`` and
    skips — so every batch lands EXACTLY once no matter where a crash
    falls:

    - crash before the commit: no manifest references the batch's data
      files (orphans; ``vacuum_orphans`` reclaims), replay rewrites;
    - crash after commit, before checkpoint: replay is a no-op;
    - two concurrent drains of the same stream: the manifest CAS makes
      one commit win, the loser errors instead of double-appending.

    Drains with ``trigger(availableNow)`` and blocks until done. The
    first batch bootstraps the table if ``path`` has no version yet.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_stream_batches(path):
            return
        if current_version(path) is None:
            # bootstrap must be ONE tagged commit: create-then-tag would
            # leave an untagged v1 if the tag commit is lost, and the
            # replay would append the same batch again
            os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
            files = _write_data_files(batch_df, path)
            _commit(
                path, files, "stream-append", parent=None,
                extra={"stream_batch_id": int(batch_id)},
            )
            return
        parent = current_version(path)
        files = _read_manifest(path, parent)["files"] + _write_data_files(
            batch_df, path
        )
        _commit(
            path, files, "stream-append", parent=parent,
            extra={"stream_batch_id": int(batch_id)},
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def vacuum_orphans(path: str, min_age_seconds: float = 3600.0) -> list[str]:
    """Delete data files no manifest (any version) references — the
    debris of writers that crashed after writing files but before
    committing (e.g. a failed micro-batch of :func:`append_stream`).

    ``min_age_seconds`` is the same safety valve Delta's VACUUM has: a
    writer may have finished its files but not yet committed, so only
    files older than the grace period are touched. Age is mtime-based.
    Complements :func:`expire_snapshots`, which removes files referenced
    only by *expired versions*; this removes files referenced by *no*
    version at all.
    """
    _, data_dir = _table_dirs(path)
    if not os.path.isdir(data_dir):
        return []
    referenced = {
        f for v in _versions(path) for f in _read_manifest(path, v)["files"]
    }
    now = time.time()
    removed = []
    for root, _dirs, names in os.walk(data_dir):
        for n in names:
            full = os.path.join(root, n)
            rel = os.path.relpath(full, path)
            if rel in referenced or not n.endswith(".parquet"):
                continue
            if now - os.path.getmtime(full) >= min_age_seconds:
                os.remove(full)
                removed.append(rel)
    return removed
