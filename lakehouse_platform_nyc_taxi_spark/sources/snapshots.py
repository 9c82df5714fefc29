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

Scale notes: delete/merge prune files by per-file min/max column stats
recorded IN THE MANIFEST at write time (the Iceberg manifest-stats /
Delta Add-stats design) — candidate selection is a pure metadata
operation over one already-open JSON, never an O(files) footer-probe
loop against the filesystem. Only candidate files are read or rewritten
(on a clustered layout a point delete rewrites one file, not the
table), and the rewrite of all candidates is ONE distributed job, not a
per-file loop. Files committed by pre-stats versions of this module
fall back to a footer read, once, and re-enter the manifest with stats
on their next rewrite. Manifests carry relative paths, so tables
relocate.
"""

from __future__ import annotations

import hashlib
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
    schema_json: str | None = None,
    new_stats: dict[str, dict] | None = None,
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
    inherited: dict = {}
    parent_stats: dict = {}
    if parent is not None:
        # table metadata rides the manifest chain (the Delta-log
        # pattern): ops that don't change it inherit schema/constraints/
        # deletion vectors (extra={"dv": ...} overrides — tombstones for
        # files that later leave the manifest are inert on read and are
        # dropped at materialize_dvs time)
        pm = _read_manifest(path, parent)
        for key in ("schema", "constraints", "dv", "column_mapping"):
            if pm.get(key) is not None:
                inherited[key] = pm[key]
        parent_stats = pm.get("stats") or {}
    if schema_json is not None:
        inherited["schema"] = schema_json
    # per-file column stats ride the manifest chain too: surviving files
    # keep their parent-recorded stats, freshly written files bring
    # their own — so pruning never touches the filesystem again
    file_set = set(files)
    stats = {f: s for f, s in parent_stats.items() if f in file_set}
    for f, s in (new_stats or {}).items():
        if f in file_set:
            stats[f] = s
    if stats:
        inherited["stats"] = stats
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "committed_at": time.time(),
        "files": sorted(files),
        **inherited,
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


def _enc_stat(v):
    """JSON-encode one min/max footer value; None = not encodable (the
    column is then simply absent from manifest stats -> conservative)."""
    import datetime
    import decimal

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return {"t": "dec", "v": str(v)}
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "date", "v": v.isoformat()}
    return None


def _dec_stat(v):
    if isinstance(v, dict):
        import datetime
        import decimal

        if v["t"] == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v["t"] == "date":
            return datetime.date.fromisoformat(v["v"])
        if v["t"] == "dec":
            return decimal.Decimal(v["v"])
    return v


def _collect_file_stats(full_path: str) -> dict[str, list]:
    """Per-column [min, max] of one freshly WRITTEN parquet file, for the
    manifest (Iceberg records the same stats in its manifests at commit
    time). Cost is one footer read per NEW file at write time — O(batch),
    never O(table) — after which every future prune is metadata-only.
    Columns with absent/partial/unencodable stats are omitted."""
    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(full_path).metadata
    except Exception:
        return {}
    out: dict[str, list] = {}
    for i in range(len(meta.schema)):
        col = meta.schema.column(i)
        if "." in col.path:  # nested leaf — skip
            continue
        mn = mx = None
        ok = True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn = st.min if mn is None or st.min < mn else mn
            mx = st.max if mx is None or st.max > mx else mx
        if not ok:
            continue
        emn, emx = _enc_stat(mn), _enc_stat(mx)
        if emn is not None and emx is not None:
            out[col.path] = [emn, emx]
    return out


def _write_data_files(
    df: DataFrame, path: str
) -> tuple[list[str], dict[str, dict]]:
    """Write df as new immutable data files; return their table-relative
    paths plus per-file manifest stats. Files land in a fresh uuid-named
    subdir of data/, so no write ever collides with an existing file
    (immutability invariant). Input frames carry LOGICAL column names;
    the current version's column mapping translates them back to the
    PHYSICAL names all data files share (manifest stats therefore stay
    keyed physically, consistent with file footers)."""
    v = current_version(path)
    if v is not None:
        df = _to_physical(df, _column_mapping(_read_manifest(path, v)))
    batch = uuid.uuid4().hex
    out_dir = os.path.join(path, _DATA_DIR, batch)
    df.write.mode("error").parquet(out_dir)
    rel, stats = [], {}
    for root, _dirs, names in os.walk(out_dir):
        for n in names:
            if n.endswith(".parquet"):
                full = os.path.join(root, n)
                r = os.path.relpath(full, path)
                rel.append(r)
                stats[r] = _collect_file_stats(full)
                # file size rides the manifest under a reserved key ("::"
                # is not producible by _collect_file_stats column paths),
                # so compaction planning never lists the filesystem
                stats[r]["::bytes"] = [os.path.getsize(full)]
    return rel, stats


def current_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def create_table(df: DataFrame, path: str) -> int:
    """CTAS: v1 of a new snapshot table. The schema is recorded in the
    manifest (the Delta-log pattern) so reads never depend on which data
    file the reader happens to open first."""
    if _versions(path):
        raise ValueError(f"snapshot table already exists at {path}")
    os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
    files, stats = _write_data_files(df, path)
    return _commit(
        path, files, "create", parent=None,
        schema_json=df.schema.json(), new_stats=stats,
    )


def _table_schema(path: str, version: int):
    from pyspark.sql.types import StructType

    sj = _read_manifest(path, version).get("schema")
    return StructType.fromJson(json.loads(sj)) if sj else None


# ---------------------------------------------------------------------------
# Column mapping — zero-rewrite RENAME/DROP COLUMN (Delta column-mapping
# "name" mode / Iceberg field-id renames). Data files keep their original
# PHYSICAL column names forever; the manifest carries an ordered
# {logical -> physical} mapping that reads apply as a final projection
# and writes apply in reverse. Renaming or dropping a column is a
# manifest-only commit — no data file is touched, and time travel to
# pre-rename versions still shows the old names (each version's mapping
# rides its own manifest).
# ---------------------------------------------------------------------------


def _column_mapping(manifest: dict) -> dict[str, str] | None:
    """{logical: physical} (insertion order = column order) or None.

    Stored in the manifest as a LIST of [logical, physical] pairs —
    the manifest writer sorts dict keys for stable serialization, which
    would destroy column order if the mapping were a dict."""
    raw = manifest.get("column_mapping")
    if raw is None:
        return None
    return dict(raw)


def _to_logical(df: DataFrame, manifest: dict) -> DataFrame:
    """Physical scan -> logical view (rename + drop projection)."""
    mapping = _column_mapping(manifest)
    if not mapping:
        return df
    cols = set(df.columns)
    return df.select(
        *[
            (F.col(phys) if phys in cols else F.lit(None)).alias(log)
            for log, phys in mapping.items()
        ]
    )


def _to_physical(df: DataFrame, mapping: dict[str, str] | None) -> DataFrame:
    """Logical frame -> physical column names for writing. Columns not
    in the mapping (schema-evolution newcomers) pass through — their
    physical name IS their logical name."""
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def append(
    df: DataFrame, path: str, merge_schema: bool = False, retries: int = 5
) -> int:
    """Append-only commit: new files + previous version's files.

    Schema is enforced against the manifest: a drifted batch fails fast
    unless ``merge_schema`` is set, in which case NEW columns extend the
    table schema (Delta ``mergeSchema`` / the reference's
    ``accept-any-schema`` + ``append_new_columns`` contract,
    ingest_spark_bulk.py:150) — old files simply read the added columns
    as NULL. Type changes on existing columns are never merged.

    Concurrency: appends COMMUTE, so a lost commit race is retried
    automatically (the Iceberg fast-append path) — the already-written
    data files are re-linked onto the new current version without
    rewriting anything; only the manifest attempt repeats. Non-commuting
    ops (delete/merge/optimize) do NOT auto-retry: their rewrite read a
    snapshot that the winning commit may have invalidated, so the caller
    must re-run them against the new state.
    """

    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    schema_json = _validate_append_schema(df, path, parent, merge_schema)
    _enforce_constraints(df, path)
    new_files, new_stats = _write_data_files(df, path)
    return _commit_append_with_retry(
        df, path, parent, schema_json, new_files, new_stats,
        merge_schema, retries,
    )


def _validate_append_schema(
    df: DataFrame, path: str, parent: int, merge_schema: bool
) -> str | None:
    """Append-time schema contract (see :func:`append`): type changes on
    existing columns always fail; new columns evolve the manifest schema
    only under ``merge_schema``. Returns the evolved schema JSON (or
    None when unchanged)."""
    schema_json = None
    table_schema = _table_schema(path, parent)
    mapping = _column_mapping(_read_manifest(path, parent))
    if table_schema is not None:
        phys_types = {f.name: f.dataType for f in table_schema.fields}
        if mapping:
            # validate against the LOGICAL view of the table
            existing = {
                log: phys_types[phys]
                for log, phys in mapping.items()
                if phys in phys_types
            }
        else:
            existing = phys_types
        incoming = {f.name: f.dataType for f in df.schema.fields}
        clashes = [
            n for n, t in incoming.items()
            if n in existing and existing[n] != t
        ]
        if clashes:
            raise ValueError(
                f"append schema changes types of existing columns "
                f"{clashes}; snapshot tables never merge type changes"
            )
        new_cols = [f for f in df.schema.fields if f.name not in existing]
        if new_cols and mapping:
            raise ValueError(
                f"append adds columns {[f.name for f in new_cols]} to a "
                "column-mapped table; schema evolution after RENAME/DROP "
                "COLUMN is not supported — evolve first, or rewrite the "
                "table to materialize the mapping"
            )
        if new_cols and not merge_schema:
            raise ValueError(
                f"append adds columns {[f.name for f in new_cols]}; pass "
                "merge_schema=True to evolve the table schema"
            )
        if new_cols:
            from pyspark.sql.types import StructType

            schema_json = StructType(
                list(table_schema.fields) + new_cols
            ).json()
    return schema_json


def _commit_append_with_retry(
    df: DataFrame,
    path: str,
    parent: int,
    schema_json: str | None,
    new_files: list[str],
    new_stats: dict[str, dict],
    merge_schema: bool,
    retries: int,
) -> int:
    for attempt in range(retries + 1):
        files = _read_manifest(path, parent)["files"] + new_files
        try:
            return _commit(
                path, files, "append", parent=parent,
                schema_json=schema_json, new_stats=new_stats,
            )
        except RuntimeError:
            if attempt == retries:
                raise
            # lost the race: revalidate against the winner's state and
            # re-link the same data files onto the new parent
            parent = current_version(path)
            schema_json = _validate_append_schema(
                df, path, parent, merge_schema
            )


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the latest. The returned
    DataFrame stays valid even if later commits change the table — its
    file list is frozen (immutable data files are never rewritten).
    When the manifest carries a schema, the scan is pinned to it —
    evolved tables read pre-evolution files with NULL new columns, and
    time travel sees each version's own schema."""
    v = version if version is not None else current_version(path)
    if v is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, v)
    if not manifest["files"]:
        raise ValueError(f"version {v} of {path} is empty")
    df = _scan_files(spark, path, manifest["files"], v)
    return _to_logical(_apply_dvs(spark, path, manifest, df), manifest)


def read_table_where(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Scan-planned read: open only the files whose manifest stats say
    they MAY hold rows with ``column`` in [lo, hi] — the read-side half
    of the manifest-stats design (Iceberg scan planning / Delta data
    skipping). The row-level filter is still applied on top, so results
    equal ``read_table(...).filter(column BETWEEN lo AND hi)`` exactly;
    what changes is that a point/range read of a clustered table opens
    O(matching) files instead of listing the whole table into the scan.
    On a pruned-to-empty range the result is an empty DataFrame with the
    table schema (no files opened at all).
    """
    v = version if version is not None else current_version(path)
    if v is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, v)
    pred = F.col(column).between(F.lit(lo), F.lit(hi))
    files = _candidate_files(path, manifest, column, lo, hi)
    if not files:
        schema = _table_schema(path, v)
        if schema is not None:
            # the manifest schema is PHYSICAL — apply the version's
            # column mapping so the empty result carries the same
            # logical names as the non-empty path (a rename/drop must
            # not leak old physical names through the pruned branch)
            return _to_logical(spark.createDataFrame([], schema), manifest)
        return read_table(spark, path, v).filter(pred).limit(0)
    return _read_files_pinned(spark, path, files, v).filter(pred)


def _read_files_pinned(
    spark: SparkSession, path: str, files: list[str], version: int
) -> DataFrame:
    """Read a subset of a version's data files with the scan pinned to
    that version's manifest schema — rewrite paths (delete/merge/CDF)
    MUST use this, or a rewrite that touches pre-evolution files would
    silently drop evolved columns (mixed-schema parquet reads take one
    file's schema). Deletion vectors of the version are applied, so
    copy-on-write rewrites of MOR-deleted rows can never resurrect
    them. The version's column mapping is applied, so callers always
    see LOGICAL names."""
    m = _read_manifest(path, version)
    df = _scan_files(spark, path, files, version)
    return _to_logical(_apply_dvs(spark, path, m, df), m)


def _scan_files(
    spark: SparkSession, path: str, files: list[str], version: int
) -> DataFrame:
    """Schema-pinned scan WITHOUT deletion-vector filtering."""
    paths = [os.path.join(path, f) for f in files]
    schema = _table_schema(path, version)
    if schema is not None:
        return spark.read.schema(schema).parquet(*paths)
    return spark.read.parquet(*paths)


# ---------------------------------------------------------------------------
# Deletion vectors — merge-on-read DELETE (Delta DV / Iceberg positional
# deletes). A MOR delete writes only (file, position) tombstones; data
# files are untouched, so delete cost is O(matching rows), not O(files
# rewritten) — the difference between a sub-second and a multi-hour
# DELETE on a 100 TB table. Readers anti-join the (tiny) DV set; the
# debt is repaid by materialize_dvs (compaction).
# ---------------------------------------------------------------------------

_DV_DIR = "_dv"


def _dv_key_expr() -> Column:
    """Stable per-file key from the scan's ``_metadata.file_path``:
    the last two path components (uuid batch dir + part file name) —
    identical no matter how the file is referenced (directly or through
    a shallow clone's ``../src/...`` relative path)."""
    parts = F.split(F.col("_metadata.file_path"), "/")
    return F.concat_ws(
        "/", F.element_at(parts, -2), F.element_at(parts, -1)
    )


def _dv_key_of(rel_path: str) -> str:
    """The same two-component key for a manifest-relative file entry."""
    segs = rel_path.replace(os.sep, "/").split("/")
    return "/".join(segs[-2:])


def _read_dv(spark: SparkSession, path: str, manifest: dict) -> DataFrame | None:
    """The version's deletion-vector rows (file key, pos), or None."""
    dv_files = manifest.get("dv") or []
    if not dv_files:
        return None
    return spark.read.schema("file string, pos long").parquet(
        *[os.path.join(path, f) for f in dv_files]
    )


def _keyed_scan(
    spark: SparkSession, path: str, files: list[str], version: int
) -> DataFrame:
    """Schema-pinned scan carrying the DV join key columns; data
    columns come out LOGICAL (column mapping applied)."""
    m = _read_manifest(path, version)
    df = _scan_files(spark, path, files, version)
    keyed = df.select(
        "*",
        _dv_key_expr().alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    mapping = _column_mapping(m)
    if not mapping:
        return keyed
    cols = set(df.columns)
    return keyed.select(
        *[
            (F.col(phys) if phys in cols else F.lit(None)).alias(log)
            for log, phys in mapping.items()
        ],
        "__dv_file",
        "__dv_pos",
    )


def _apply_dvs_keyed(
    spark: SparkSession, path: str, manifest: dict, keyed: DataFrame
) -> DataFrame:
    dv = _read_dv(spark, path, manifest)
    if dv is None:
        return keyed
    return keyed.join(
        dv,
        (keyed["__dv_file"] == dv["file"]) & (keyed["__dv_pos"] == dv["pos"]),
        "left_anti",
    )


def _apply_dvs(
    spark: SparkSession, path: str, manifest: dict, df: DataFrame
) -> DataFrame:
    """Filter MOR-deleted rows out of a scan: anti-join on (file key,
    row_index). The DV side is tombstone-sized (rows deleted since the
    last compaction), so AQE plans it as a broadcast; row_index comes
    from parquet scan metadata — no data-column cost."""
    if not (manifest.get("dv") or []):
        return df
    cols = df.columns
    keyed = df.select(
        "*",
        _dv_key_expr().alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    return _apply_dvs_keyed(spark, path, manifest, keyed).select(*cols)


def _write_dv_files(df: DataFrame, path: str) -> list[str]:
    """Write (file, pos) tombstones as immutable parquet under _dv/;
    one distributed job, same uuid-batch layout as data files."""
    batch = uuid.uuid4().hex
    out_dir = os.path.join(path, _DV_DIR, batch)
    df.select(
        F.col("file").cast("string"), F.col("pos").cast("long")
    ).write.mode("error").parquet(out_dir)
    rel = []
    for root, _dirs, names in os.walk(out_dir):
        for n in names:
            if n.endswith(".parquet"):
                rel.append(os.path.relpath(os.path.join(root, n), path))
    return rel


def delete_where_mor(
    spark: SparkSession,
    path: str,
    predicate: Column,
    prune: tuple[str, object, object] | None = None,
    retries: int = 2,
) -> int:
    """Merge-on-read DELETE: append (file, position) tombstones instead
    of rewriting data files — Delta deletion vectors / Iceberg
    positional deletes.

    One distributed job reads the candidate files (manifest-stats
    pruned via ``prune``, same OVER-approximation contract as
    :func:`delete_where`) with their parquet row indexes, filters to
    ``predicate`` matches not already tombstoned, and writes the
    positions; the commit references every data file unchanged. Every
    read path (read_table, scan-planned reads, COW rewrites, CDF,
    streaming sources over snapshots) applies the vectors, so results
    are indistinguishable from a COW delete. Read-side anti-join debt
    accumulates per MOR delete — :func:`materialize_dvs` compacts it
    away. Returns the new version.

    Commit races auto-retry (``retries``): unlike COW ops, the safe MOR
    retry is a full recompute against the new head — rows the racing
    writer already tombstoned or rewrote are re-resolved, never blindly
    re-linked; the losing attempt's tombstone files become orphans that
    ``vacuum_orphans`` sweeps."""
    return _mor_retry(
        retries,
        lambda: _delete_where_mor_once(spark, path, predicate, prune),
    )


def _mor_retry(retries: int, attempt_fn):
    for attempt in range(retries + 1):
        try:
            return attempt_fn()
        except RuntimeError:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")


def _delete_where_mor_once(
    spark: SparkSession,
    path: str,
    predicate: Column,
    prune: tuple[str, object, object] | None,
) -> int:
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    if prune is not None:
        col, lo, hi = prune
        candidates = _candidate_files(path, manifest, col, lo, hi)
    else:
        candidates = list(manifest["files"])
    dv_files = list(manifest.get("dv") or [])
    if candidates:
        keyed = _keyed_scan(spark, path, candidates, parent)
        live = _apply_dvs_keyed(spark, path, manifest, keyed)
        hits = live.filter(predicate).select(
            F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
        )
        dv_files += _write_dv_files(hits, path)
    return _commit(
        path,
        list(manifest["files"]),
        "delete_mor",
        parent=parent,
        extra={"dv": sorted(dv_files)},
    )


def materialize_dvs(spark: SparkSession, path: str) -> int:
    """Compaction for deletion vectors: rewrite ONLY the files that
    carry tombstones (dropping their dead rows) and commit with an
    empty DV set — the read-side anti-join disappears. Files without
    tombstones carry over unscanned. Returns the new version."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    dv = _read_dv(spark, path, manifest)
    if dv is None:
        return parent
    # Bounded driver metadata: the distinct file keys carrying
    # tombstones (<= files touched since last compaction), never rows.
    dead_keys = {r["file"] for r in dv.select("file").distinct().collect()}
    candidates = [
        f for f in manifest["files"] if _dv_key_of(f) in dead_keys
    ]
    kept = [f for f in manifest["files"] if _dv_key_of(f) not in dead_keys]
    new_files, new_stats = kept, {}
    if candidates:
        survivors = _read_files_pinned(spark, path, candidates, parent)
        written, new_stats = _write_data_files(survivors, path)
        new_files = kept + written
    return _commit(
        path,
        new_files,
        "materialize_dv",
        parent=parent,
        extra={"dv": []},
        new_stats=new_stats,
    )


def _candidate_files(
    path: str, manifest: dict, column: str, lo, hi
) -> list[str]:
    """Files of ``manifest`` that MAY contain rows with column in
    [lo, hi], decided from the manifest's own per-file stats — a pure
    metadata operation, no filesystem access (the Iceberg manifest-stats
    design; at 100 TB / 10^6 files a footer-probe loop would be an
    O(files) sequential driver scan with a storage round-trip each).
    Files without manifest stats (committed by a pre-stats version of
    this module) fall back to one footer read; unknown -> True."""
    stats = manifest.get("stats") or {}
    mapping = _column_mapping(manifest)
    if mapping:
        column = mapping.get(column, column)  # stats keys are physical
    out = []
    for f in manifest["files"]:
        fs = stats.get(f)
        if fs is None:
            if _stats_may_match(os.path.join(path, f), column, lo, hi):
                out.append(f)
            continue
        if column not in fs:
            out.append(f)
            continue
        mn, mx = _dec_stat(fs[column][0]), _dec_stat(fs[column][1])
        try:
            if not (hi < mn or lo > mx):
                out.append(f)
        except TypeError:
            # bounds incomparable with the recorded stat type: keep the
            # contract — unknown answers are conservatively True
            out.append(f)
    return out


def _stats_may_match(
    file_path: str, column: str, lo, hi
) -> bool:
    """Footer min/max pruning: can this file contain rows with
    column in [lo, hi]? Unknown stats -> conservatively True.
    Legacy fallback only — new commits carry stats in the manifest and
    are pruned by :func:`_candidate_files` without touching footers."""
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
    and the manifest-stats file prune are built from the SAME (column,
    lo, hi), so they cannot diverge. Prefer this whenever the delete
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

    ``prune`` = (column, lo, hi) narrows the candidate set by the
    manifest's per-file min/max stats before any data is read — the
    file-skipping Iceberg gets from manifest stats, metadata-only on
    the driver. Candidates are rewritten in ONE
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
    manifest = _read_manifest(path, parent)
    old_files = manifest["files"]
    if prune is not None:
        col, lo, hi = prune
        candidates = _candidate_files(path, manifest, col, lo, hi)
    else:
        candidates = list(old_files)
    cand_set = set(candidates)
    kept = [f for f in old_files if f not in cand_set]
    new_files, new_stats = kept, {}
    if candidates:
        survivors = _read_files_pinned(spark, path, candidates, parent).filter(
            ~predicate
        )
        written, new_stats = _write_data_files(survivors, path)
        new_files = kept + written
    return _commit(path, new_files, "delete", parent=parent, new_stats=new_stats)


def update_where(
    spark: SparkSession,
    path: str,
    condition: Column,
    assignments: dict[str, Column],
    prune: tuple[str, object, object] | None = None,
) -> int:
    """Copy-on-write ``UPDATE ... SET col = expr WHERE condition`` — the
    third DML verb next to :func:`delete_where` and :func:`merge_into`.

    Candidate files come from the manifest stats (``prune`` must
    OVER-approximate ``condition``, same contract as ``delete_where``);
    they are rewritten in ONE distributed job that applies each
    assignment under ``F.when(condition, expr).otherwise(col)`` — rows
    not matching the condition pass through byte-identical. Untouched
    files carry into the new version unscanned. Assignments cannot
    change column types (snapshot tables never merge type changes), and
    the rewritten rows are validated against the table's CHECK
    constraints before the commit.
    """
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    old_files = manifest["files"]
    if prune is not None:
        col, lo, hi = prune
        candidates = _candidate_files(path, manifest, col, lo, hi)
    else:
        candidates = list(old_files)
    cand_set = set(candidates)
    kept = [f for f in old_files if f not in cand_set]
    new_files, new_stats = kept, {}
    if candidates:
        target = _read_files_pinned(spark, path, candidates, parent)
        unknown = [c for c in assignments if c not in target.columns]
        if unknown:
            raise ValueError(
                f"UPDATE assigns to columns not in the table: {unknown}"
            )
        rewritten = target.select(
            *[
                F.when(condition, assignments[c].cast(target.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in assignments
                else F.col(c)
                for c in target.columns
            ]
        )
        _enforce_constraints(rewritten, path)
        written, new_stats = _write_data_files(rewritten, path)
        new_files = kept + written
    return _commit(path, new_files, "update", parent=parent, new_stats=new_stats)


def rollback(path: str, version: int) -> int:
    """Restore an old version's file list as a NEW commit (history is
    append-only, like Iceberg rollback — nothing is erased)."""
    if version not in _versions(path):
        raise ValueError(f"version {version} does not exist at {path}")
    parent = current_version(path)
    m = _read_manifest(path, version)
    # restore that version's schema too — rolling back past a schema
    # evolution must not leave new-column ghosts; its file stats come
    # along as well (the parent may not reference these files anymore).
    # dv / column_mapping / constraints must come from the TARGET
    # version, not ride parent inheritance: rolling back past a MOR
    # delete would otherwise keep the head's deletion vectors (hiding
    # rows the restored version owns), and rolling back past a
    # rename/drop would keep the head's column view.
    return _commit(
        path, m["files"], f"rollback-to-{version}", parent=parent,
        schema_json=m.get("schema"), new_stats=m.get("stats"),
        extra={
            "dv": m.get("dv") or [],
            "column_mapping": m.get("column_mapping"),
            "constraints": m.get("constraints"),
        },
    )


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
    live = set()
    for v in kept_versions:
        m = _read_manifest(path, v)
        live.update(m["files"])
        live.update(m.get("dv") or [])
    for v in expired:
        m = _read_manifest(path, v)
        for f in list(m["files"]) + list(m.get("dv") or []):
            if f not in live:
                full = os.path.join(path, f)
                if os.path.exists(full):
                    os.remove(full)
        os.remove(_manifest_path(path, v))
    return expired


def _zorder_value(
    cols: Sequence[str], stats: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Morton (Z-order) interleave: each column is min/max-scaled to a
    ``bits``-bit integer, then the columns' bits are interleaved into one
    long. Rows close in EVERY dimension get close z-values, so a range
    sort on z gives multi-column file locality — the property Delta's
    ``OPTIMIZE ... ZORDER BY`` exploits, built here from pure Catalyst
    bit arithmetic (shift/and/or — whole-stage-codegen'd, no UDF)."""
    from ..operators.layout import morton_interleave

    # clamp BEFORE scaling (morton_interleave re-clamps identically):
    # rank values must never exceed the interleaved resolution, or the
    # dropped high bits would break locality (5+ columns get coarser
    # locality, never wrong clustering)
    bits = min(bits, 63 // len(cols))
    return morton_interleave(_scaled_ranks(cols, stats, bits), bits)


def _scaled_ranks(
    cols: Sequence[str], stats: dict[str, tuple[float, float]], bits: int
) -> list[Column]:
    """Min/max-scale each column to a ``bits``-bit integer rank, clamped
    into [0, 2**bits - 1] (out-of-stats values from concurrent appends
    land in the edge cells rather than corrupting the interleave)."""
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[c]
        span = (hi - lo) or 1.0
        s = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                    "long"
                ),
            ),
        )
        scaled.append(s)
    return scaled


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Incremental small-file compaction (Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files`` with a size filter): bin-pack ONLY the files
    below ``target_bytes`` into ~target-sized files; files already at
    target carry into the new version untouched.

    This is the steady-state maintenance op for streaming/micro-batch
    ingest (every ``append_stream`` batch lands a few small files):
    unlike :func:`optimize_table`, cost is O(small-file bytes), not
    O(table) — on a 100 TB table with 1 GB steady-state files and a
    day's worth of small appends, it rewrites the day, not the table.

    Planning is metadata-only: file sizes ride the manifest stats under
    the reserved ``::bytes`` key (recorded at write time); files
    committed by a pre-size version of this module fall back to one
    ``os.path.getsize`` each. The rewrite itself uses ``coalesce`` —
    partition concatenation, NO shuffle. Tombstones of compacted files
    are spent by the DV-aware read; returns the unchanged current
    version if fewer than ``min_files`` files qualify."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    stats = manifest.get("stats") or {}

    def _size(f: str) -> int:
        fs = stats.get(f) or {}
        if "::bytes" in fs:
            return int(fs["::bytes"][0])
        try:
            return os.path.getsize(os.path.join(path, f))
        except OSError:
            return 0

    small = [f for f in manifest["files"] if _size(f) < target_bytes]
    if len(small) < min_files:
        return parent
    kept = [f for f in manifest["files"] if f not in set(small)]
    total = sum(_size(f) for f in small)
    n_out = max(1, -(-total // target_bytes))  # ceil
    survivors = _read_files_pinned(spark, path, small, parent)
    written, new_stats = _write_data_files(survivors.coalesce(n_out), path)
    return _commit(
        path,
        kept + written,
        "compact",
        parent=parent,
        new_stats=new_stats,
    )


def optimize_table(
    spark: SparkSession,
    path: str,
    cluster_by: Sequence[str] = (),
    target_files: int | None = None,
    zorder_by: Sequence[str] = (),
    curve: str = "zorder",
) -> int:
    """Compaction + clustering rewrite (Iceberg ``rewrite_data_files`` /
    Delta ``OPTIMIZE ... ZORDER BY``'s role): rewrite the current version
    into ``target_files`` files, range-clustered on ``cluster_by``.

    Why it matters at 100 TB: DML and ``read_table_where`` pruning skip
    files by the manifest's min/max stats, which only bite when each
    file covers a NARROW value range. Appends produce arrival-ordered files whose
    ranges all overlap (every file "may match" everything); clustering
    makes ranges disjoint, so point/range operations touch O(1) files
    instead of O(all). Small-file compaction is the same rewrite with an
    empty ``cluster_by``.

    ``cluster_by`` is a lexicographic range-cluster: perfect pruning on
    the FIRST column, none on later ones. ``zorder_by`` (mutually
    exclusive) Morton-interleaves the columns' scaled bits so every
    listed column gets partial locality — the right choice when queries
    filter on different columns of the same table (Delta's ZORDER BY).
    Z-order columns must be numeric/date-castable; the min/max scaling
    stats come from one distributed agg.

    ``curve`` picks the space-filling curve for ``zorder_by``:
    ``"zorder"`` (Morton, any column count) or ``"hilbert"`` (exactly
    two columns — no quadrant jumps, so per-file ranges are tighter and
    pruning is dimension-balanced at non-power-of-4 file counts; the
    curve behind Databricks liquid clustering).

    One distributed job (repartitionByRange + sortWithinPartitions +
    write); readers pinned to older versions are untouched, and the
    commit CAS protects against concurrent writers like any other op.
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}: expected 'zorder' or 'hilbert'")
    if curve == "hilbert" and len(zorder_by) != 2:
        raise ValueError("curve='hilbert' requires exactly two zorder_by columns")
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    df = read_table(spark, path, parent)
    if target_files is None:
        target_files = max(1, spark.sparkContext.defaultParallelism)
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        df = df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    elif zorder_by:
        # scratch columns the clustering rewrite materializes internally:
        # a user column with one of these names would be silently
        # overwritten (then dropped) by withColumn — refuse loudly
        reserved = {"__z", "__hx", "__hy", "_hx", "_hy", "_hd"}
        taken = sorted(reserved.intersection(df.columns))
        if taken:
            raise ValueError(
                f"zorder_by rewrite reserves column names {taken}; "
                "rename those columns before OPTIMIZE"
            )
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in zorder_by],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in zorder_by],
        ).collect()[0]
        stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in zorder_by}
        for c, (lo, hi) in stats.items():
            if lo is None or hi is None:
                raise ValueError(
                    f"zorder column {c!r} is all-NULL or non-numeric"
                )
        if curve == "hilbert":
            from ..operators.layout import with_hilbert

            # 8-bit ranks = a 65536-cell grid, far finer than any
            # realistic target_files; keeps the chained-projection
            # state machine short (operators/layout.py::with_hilbert)
            hx, hy = _scaled_ranks(zorder_by, stats, bits=8)
            df = with_hilbert(
                df.withColumn("__hx", hx).withColumn("__hy", hy),
                "__hx",
                "__hy",
                out="__z",
                bits=8,
            ).drop("__hx", "__hy")
        else:
            df = df.withColumn("__z", _zorder_value(zorder_by, stats))
        df = (
            df.repartitionByRange(target_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        df = df.coalesce(target_files)
    files, stats = _write_data_files(df, path)
    # the full rewrite read DV-filtered rows, so tombstones are spent
    return _commit(
        path, files, "optimize", parent=parent, new_stats=stats,
        extra={"dv": []},
    )


def committed_stream_batches(
    path: str, stream_id: str | None = None
) -> set[int]:
    """Stream batch ids already durably committed to this table.

    Batch ids are only unique *within* one streaming query's checkpoint
    (every query numbers from 0), so idempotence must be scoped to the
    stream identity — the same reason Delta's idempotent sink keys on
    ``(txnAppId, txnVersion)``. With ``stream_id`` given, only batches
    committed by that stream count; ``None`` returns ids from every
    stream (diagnostics only — never use the unscoped set to skip a
    batch, two different streams legitimately share batch id 0).
    """
    out = set()
    for v in _versions(path):
        m = _read_manifest(path, v)
        if "stream_batch_id" in m and (
            stream_id is None or m.get("stream_id") == stream_id
        ):
            out.add(int(m["stream_batch_id"]))
    return out


def append_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    app_id: str | None = None,
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

    Batch ids restart at 0 for every checkpoint, so the skip check is
    scoped to a *stream identity* — ``app_id`` if given (the Delta
    ``txnAppId`` pattern), else a digest of the checkpoint path — and the
    manifest records ``(stream_id, stream_batch_id)``. Two different
    streams appending to one table therefore never swallow each other's
    batch 0; only a true replay of the SAME stream's batch is skipped.

    Drains with ``trigger(availableNow)`` and blocks until done. The
    first batch bootstraps the table if ``path`` has no version yet.
    """
    stream_id = app_id or hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode("utf-8")
    ).hexdigest()[:16]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_stream_batches(path, stream_id):
            return
        _enforce_constraints(batch_df, path)
        if current_version(path) is None:
            # bootstrap must be ONE tagged commit: create-then-tag would
            # leave an untagged v1 if the tag commit is lost, and the
            # replay would append the same batch again; it records the
            # batch schema like create_table does, so schema-drift
            # enforcement / pinned reads / CDF work on stream-created
            # tables exactly as on CTAS tables
            os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
            files, stats = _write_data_files(batch_df, path)
            _commit(
                path, files, "stream-append", parent=None,
                schema_json=batch_df.schema.json(), new_stats=stats,
                extra={
                    "stream_batch_id": int(batch_id),
                    "stream_id": stream_id,
                },
            )
            return
        parent = current_version(path)
        new_files, stats = _write_data_files(batch_df, path)
        files = _read_manifest(path, parent)["files"] + new_files
        _commit(
            path, files, "stream-append", parent=parent, new_stats=stats,
            extra={
                "stream_batch_id": int(batch_id),
                "stream_id": stream_id,
            },
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
    referenced = set()
    for v in _versions(path):
        m = _read_manifest(path, v)
        referenced.update(m["files"])
        referenced.update(m.get("dv") or [])
    now = time.time()
    removed = []
    for scan_dir in (data_dir, os.path.join(path, _DV_DIR)):
        if not os.path.isdir(scan_dir):
            continue
        for root, _dirs, names in os.walk(scan_dir):
            for n in names:
                full = os.path.join(root, n)
                rel = os.path.relpath(full, path)
                if rel in referenced or not n.endswith(".parquet"):
                    continue
                if now - os.path.getmtime(full) >= min_age_seconds:
                    os.remove(full)
                    removed.append(rel)
    return removed


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    when_matched: str = "update",
    validate_source_keys: bool = True,
    commit_extra: dict | None = None,
    allow_bootstrap: bool = False,
    merge_schema: bool = False,
) -> int:
    """Keyed MERGE (Delta ``MERGE INTO`` / dbt ``delete+insert`` upsert's
    modern form), copy-on-write:

    - ``when_matched="update"``: target rows whose key appears in
      ``source`` are replaced by the source row; unmatched source rows
      are inserted (upsert).
    - ``when_matched="delete"``: matched target rows are deleted and
      NOTHING is inserted (the CDC-retract shape).

    Scale design — the merge never rewrites the whole table:

    1. the source's first-key min/max (one distributed agg, a 2-value
       collect) prunes candidate files by the manifest's per-file stats,
       the same manifest-stats skip Iceberg's MERGE does — an upsert
       touching one day of a date-keyed table rewrites that day's files
       only, and the prune itself reads no data files;
    2. surviving target rows come from ONE ``left_anti`` join of the
       candidate files against the source keys (AQE broadcasts the key
       side when small);
    3. kept files move into the new manifest untouched; the rewrite +
       append is one distributed job, committed via the manifest CAS.

    Like Delta, a source with duplicate keys would make "replace the
    matched row" ambiguous — ``validate_source_keys`` fails fast on that
    (one cheap agg on the source; disable if the source is known-unique).

    ``commit_extra`` rides into the manifest (streaming sinks tag their
    ``(stream_id, batch_id)`` here); ``allow_bootstrap`` lets an upsert
    against a not-yet-existing table create it from the source in the
    same single commit (the streaming first-batch case).

    ``merge_schema`` gives the merge the same evolution contract as
    :func:`append` (Delta's ``schema.autoMerge`` / dbt
    ``on_schema_change='append_new_columns'``): NEW source columns
    extend the table schema in one commit with the data, old files read
    them as NULL, and source batches missing some table columns insert
    NULL there. Type changes on existing columns are never merged.
    Without it, a drifted source fails fast, like ``append``.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if not key_cols:
        raise ValueError("merge_into requires at least one key column")
    parent = current_version(path)
    if parent is None:
        if not (allow_bootstrap and when_matched == "update"):
            raise ValueError(f"no snapshot table at {path}")
        os.makedirs(os.path.join(path, _SNAP_DIR), exist_ok=True)
        files, stats = _write_data_files(source, path)
        return _commit(
            path, files, "merge-update", parent=None,
            schema_json=source.schema.json(), new_stats=stats,
            extra=commit_extra,
        )
    if validate_source_keys and when_matched == "update":
        dup = (
            source.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1)
        )
        if dup.count() > 0:
            raise ValueError(
                "merge source has duplicate keys — replacing one target "
                "row with several source rows is ambiguous (Delta raises "
                "the same way); dedup the source first"
            )
    if when_matched == "update":
        _enforce_constraints(source, path)
    manifest = _read_manifest(path, parent)
    schema_json = None
    table_schema = _table_schema(path, parent)
    if table_schema is not None and when_matched == "update":
        existing = {f.name: f.dataType for f in table_schema.fields}
        clashes = [
            f.name for f in source.schema.fields
            if f.name in existing and existing[f.name] != f.dataType
        ]
        if clashes:
            raise ValueError(
                f"merge source changes types of existing columns {clashes}; "
                "snapshot tables never merge type changes"
            )
        new_cols = [f for f in source.schema.fields if f.name not in existing]
        if new_cols and not merge_schema:
            raise ValueError(
                f"merge source adds columns {[f.name for f in new_cols]}; "
                "pass merge_schema=True to evolve the table schema"
            )
        if new_cols:
            from pyspark.sql.types import StructType

            schema_json = StructType(
                list(table_schema.fields) + new_cols
            ).json()
    old_files = manifest["files"]
    k0 = key_cols[0]
    lo, hi = source.agg(F.min(k0), F.max(k0)).collect()[0]
    if lo is None:
        candidates: list[str] = []
    else:
        candidates = _candidate_files(path, manifest, k0, lo, hi)
    cand_set = set(candidates)
    kept = [f for f in old_files if f not in cand_set]
    keys = source.select(*key_cols).dropDuplicates(list(key_cols))
    new_files = list(kept)
    new_stats: dict[str, dict] = {}
    rewrite = None
    if candidates:
        target = _read_files_pinned(spark, path, candidates, parent)
        rewrite = target.join(keys, on=list(key_cols), how="left_anti")
    if when_matched == "update":
        if rewrite is not None and merge_schema:
            # evolved union: new source columns extend, missing source
            # columns read NULL; the pinned manifest schema (committed
            # below) resolves parquet columns by name, so order is free
            rewrite = rewrite.unionByName(source, allowMissingColumns=True)
        elif rewrite is not None:
            # column order pinned to the table schema so parquet files
            # stay homogeneous across versions
            src = source.select([F.col(c.name) for c in rewrite.schema.fields])
            rewrite = rewrite.unionByName(src)
        else:
            rewrite = source
    if rewrite is not None:
        written, new_stats = _write_data_files(rewrite, path)
        new_files += written
    return _commit(
        path, new_files, f"merge-{when_matched}", parent=parent,
        extra=commit_extra, new_stats=new_stats, schema_json=schema_json,
    )


def update_where_mor(
    spark: SparkSession,
    path: str,
    condition: Column,
    assignments: dict[str, Column],
    prune: tuple[str, object, object] | None = None,
    retries: int = 2,
) -> int:
    """Merge-on-read ``UPDATE ... SET``: tombstone the matching rows and
    append their updated images as new files — the third MOR verb next
    to :func:`delete_where_mor` and :func:`merge_into_mor`. Cost is
    O(matching rows); :func:`update_where` (copy-on-write) rewrites
    whole candidate files. Same ``prune`` over-approximation contract;
    updated images are validated against the table's CHECK constraints.
    Commit races auto-retry by full recompute (see
    :func:`delete_where_mor`). Returns the new version."""
    return _mor_retry(
        retries,
        lambda: _update_where_mor_once(spark, path, condition, assignments, prune),
    )


def _update_where_mor_once(
    spark: SparkSession,
    path: str,
    condition: Column,
    assignments: dict[str, Column],
    prune: tuple[str, object, object] | None,
) -> int:
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    if prune is not None:
        col, lo, hi = prune
        candidates = _candidate_files(path, manifest, col, lo, hi)
    else:
        candidates = list(manifest["files"])
    dv_files = list(manifest.get("dv") or [])
    new_files = list(manifest["files"])
    new_stats: dict[str, dict] = {}
    if candidates:
        keyed = _keyed_scan(spark, path, candidates, parent)
        live = _apply_dvs_keyed(spark, path, manifest, keyed)
        matched = live.filter(condition)
        data_cols = [
            c for c in keyed.columns if c not in ("__dv_file", "__dv_pos")
        ]
        unknown = [c for c in assignments if c not in data_cols]
        if unknown:
            raise ValueError(
                f"UPDATE assigns to columns not in the table: {unknown}"
            )
        # one job writes both sides from a shared scan: cache the (tiny)
        # matched set so tombstones and images agree even under retries
        matched = matched.localCheckpoint(eager=True)
        hits = matched.select(
            F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
        )
        images = matched.select(
            *[
                (
                    assignments[c]
                    .cast(matched.schema[c].dataType)
                    .alias(c)
                    if c in assignments
                    else F.col(c)
                )
                for c in data_cols
            ]
        )
        _enforce_constraints(images, path)
        dv_files += _write_dv_files(hits, path)
        written, new_stats = _write_data_files(images, path)
        new_files += written
    return _commit(
        path,
        new_files,
        "update_mor",
        parent=parent,
        extra={"dv": sorted(dv_files)},
        new_stats=new_stats,
    )


def merge_into_mor(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    when_matched: str = "update",
    validate_source_keys: bool = True,
    retries: int = 2,
    commit_extra: dict | None = None,
) -> int:
    """Merge-on-read MERGE: tombstone the matched target rows (deletion
    vectors) and, in update mode, append the source rows as new files —
    NO existing data file is rewritten. The upsert cost is O(matched
    rows + source rows); :func:`merge_into` (copy-on-write) rewrites
    whole candidate files for the same result. Use MOR for frequent
    small upserts (CDC trickle), COW when a batch touches most rows of
    the files it hits anyway.

    Same contracts as :func:`merge_into`: ``when_matched`` update (upsert)
    or delete (CDC retract), duplicate-source-key validation, CHECK
    constraints on inserted rows, manifest-stats file pruning on the
    first key's source min/max. Schema evolution is not supported here
    (use the COW merge) — the source must carry exactly the table's
    columns for update mode, and at least the key columns for delete.
    Commit races auto-retry by full recompute (see
    :func:`delete_where_mor`).
    Returns the new version."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if not key_cols:
        raise ValueError("merge_into_mor requires at least one key column")
    return _mor_retry(
        retries,
        lambda: _merge_into_mor_once(
            spark, path, source, key_cols, when_matched,
            validate_source_keys, commit_extra,
        ),
    )


def _merge_into_mor_once(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    when_matched: str,
    validate_source_keys: bool,
    commit_extra: dict | None = None,
) -> int:
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    manifest = _read_manifest(path, parent)
    table_cols = [f.name for f in read_table(spark, path, parent).schema.fields]
    if when_matched == "update":
        if sorted(source.columns) != sorted(table_cols):
            raise ValueError(
                "MOR merge needs the exact table columns "
                f"{table_cols}; got {source.columns} — schema evolution "
                "goes through the copy-on-write merge_into"
            )
        if validate_source_keys:
            dup = (
                source.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
            )
            if dup.count() > 0:
                raise ValueError(
                    "merge source has duplicate keys — replacing one "
                    "target row with several source rows is ambiguous; "
                    "dedup the source first"
                )
        _enforce_constraints(source, path)
    k0 = key_cols[0]
    lo, hi = source.agg(F.min(k0), F.max(k0)).collect()[0]
    candidates = (
        _candidate_files(path, manifest, k0, lo, hi) if lo is not None else []
    )
    dv_files = list(manifest.get("dv") or [])
    if candidates:
        keys = source.select(*key_cols).dropDuplicates(list(key_cols))
        keyed = _keyed_scan(spark, path, candidates, parent)
        live = _apply_dvs_keyed(spark, path, manifest, keyed)
        hits = live.join(keys, on=list(key_cols), how="left_semi").select(
            F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
        )
        dv_files += _write_dv_files(hits, path)
    new_files = list(manifest["files"])
    new_stats: dict[str, dict] = {}
    if when_matched == "update":
        aligned = source.select(*table_cols)
        written, new_stats = _write_data_files(aligned, path)
        new_files += written
    return _commit(
        path,
        new_files,
        f"merge_mor-{when_matched}",
        parent=parent,
        extra={"dv": sorted(dv_files), **(commit_extra or {})},
        new_stats=new_stats,
    )


def table_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """Change data feed between two versions: every row with a
    ``_change_type`` of ``insert`` or ``delete`` (an update under
    copy-on-write is a delete + an insert of the new image) — Delta CDF /
    Iceberg changelog semantics recovered from immutable snapshots.

    Scale design: data files are immutable, so any file present in both
    manifests is byte-identical and contributes no changes — only files
    ADDED or REMOVED between the versions are read. Row-level changes are
    the multiset differences between those two sides (``exceptAll`` both
    ways: a COW rewrite's surviving rows appear on both sides and cancel
    out). A merge that touched 3 files of a 10k-file table diffs 3 files'
    worth of rows, not the table.
    """
    vs = _versions(path)
    if from_version not in vs or to_version not in vs:
        raise ValueError(
            f"versions {from_version}..{to_version} not both present at {path}"
        )
    m_old = _read_manifest(path, from_version)
    m_new = _read_manifest(path, to_version)
    old, new = set(m_old["files"]), set(m_new["files"])
    added = sorted(new - old)
    removed = sorted(old - new)

    # Pin both sides to the TO-version schema (a superset after any
    # mergeSchema evolution): pre-evolution files read added columns as
    # NULL, and exceptAll sees one consistent schema even when the feed
    # spans the evolution commit.
    schema = _table_schema(path, to_version)

    def _read(files: list[str], dv_manifest: dict) -> DataFrame | None:
        if not files:
            return None
        paths = [os.path.join(path, f) for f in files]
        if schema is not None:
            df = spark.read.schema(schema).parquet(*paths)
        else:
            df = spark.read.parquet(*paths)
        # both sides project through the TO-version mapping so the feed
        # speaks the destination's logical names even across a rename
        return _to_logical(_apply_dvs(spark, path, dv_manifest, df), m_new)

    # Each side nets out its own deletion vectors: added files minus
    # to-version tombstones (rows appended then MOR-deleted inside the
    # span never existed for the feed), removed files minus from-version
    # tombstones (rows already dead at `from` aren't deleted again).
    a, r = _read(added, m_new), _read(removed, m_old)

    # MOR deletes on files present in BOTH versions: the rows at
    # positions tombstoned inside the span. Only the files carrying new
    # tombstones are read (their keys are bounded driver metadata —
    # O(files touched since `from`), never rows).
    mor = None
    dv_new_df = _read_dv(spark, path, m_new)
    if dv_new_df is not None:
        dv_old_df = _read_dv(spark, path, m_old)
        delta = (
            dv_new_df.exceptAll(dv_old_df)
            if dv_old_df is not None
            else dv_new_df
        ).distinct()
        keys = {row["file"] for row in delta.select("file").distinct().collect()}
        touched = sorted(f for f in (old & new) if _dv_key_of(f) in keys)
        if touched:
            keyed = _keyed_scan(spark, path, touched, to_version)
            data_cols = [
                c for c in keyed.columns if c not in ("__dv_file", "__dv_pos")
            ]
            mor = keyed.join(
                delta,
                (keyed["__dv_file"] == delta["file"])
                & (keyed["__dv_pos"] == delta["pos"]),
                "left_semi",
            ).select(*data_cols)

    if a is None and r is None and mor is None:
        # no file or tombstone churn between the versions -> empty feed
        # with the table's schema
        cur = read_table(spark, path, to_version)
        empty = cur.limit(0)
        return empty.withColumn("_change_type", F.lit("insert"))
    inserted = a.exceptAll(r) if (a is not None and r is not None) else a
    deleted = r.exceptAll(a) if (a is not None and r is not None) else r
    if mor is not None:
        deleted = mor if deleted is None else deleted.unionByName(mor)
    parts = []
    if inserted is not None:
        parts.append(inserted.withColumn("_change_type", F.lit("insert")))
    if deleted is not None:
        parts.append(deleted.withColumn("_change_type", F.lit("delete")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# CHECK constraints — Delta's table-level data contracts
# ---------------------------------------------------------------------------


def table_constraints(path: str) -> dict[str, str]:
    """Active CHECK constraints: name -> SQL boolean expression."""
    v = current_version(path)
    if v is None:
        raise ValueError(f"no snapshot table at {path}")
    return dict(_read_manifest(path, v).get("constraints") or {})


def add_constraint(
    spark: SparkSession, path: str, name: str, expression: str
) -> int:
    """ADD CONSTRAINT name CHECK (expression).

    Like Delta, the EXISTING data must already satisfy the constraint —
    one distributed scan validates it before the metadata commit (the
    commit itself moves no data; the file list is unchanged). Writers
    then validate every incoming batch against all active constraints
    (see :func:`_enforce_constraints`), so the contract holds by
    construction from this version forward.
    """
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    cons = table_constraints(path)
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists")
    # SAME predicate as _enforce_constraints: a CHECK must evaluate to
    # true, so NULL evaluations are violations here too — otherwise a
    # constraint could be added over NULL-evaluating rows that every
    # later re-append of the same rows would then reject
    bad = (
        read_table(spark, path, parent)
        .filter(~F.coalesce(F.expr(expression), F.lit(False)))
        .limit(1)
    )
    if bad.count() > 0:
        raise ValueError(
            f"existing rows violate CHECK ({expression}); constraint "
            f"{name!r} not added"
        )
    cons[name] = expression
    files = _read_manifest(path, parent)["files"]
    return _commit(
        path, files, f"add-constraint-{name}", parent=parent,
        extra={"constraints": cons},
    )


def drop_constraint(path: str, name: str) -> int:
    """DROP CONSTRAINT: metadata-only commit."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    cons = table_constraints(path)
    if name not in cons:
        raise ValueError(f"constraint {name!r} does not exist")
    del cons[name]
    files = _read_manifest(path, parent)["files"]
    return _commit(
        path, files, f"drop-constraint-{name}", parent=parent,
        extra={"constraints": cons},
    )


def _enforce_constraints(df: DataFrame, path: str) -> None:
    """Raise if any incoming row violates an active constraint. Cost is
    one pass over the BATCH (never the table); NULL evaluations violate,
    matching Delta (a CHECK must evaluate to true)."""
    v = current_version(path)
    if v is None:
        return
    cons = _read_manifest(path, v).get("constraints") or {}
    for name, expr in cons.items():
        bad = df.filter(
            ~F.coalesce(F.expr(expr), F.lit(False))
        ).limit(1)
        if bad.count() > 0:
            raise ValueError(
                f"batch violates CHECK constraint {name!r} ({expr})"
            )


def _current_mapping_or_identity(path: str, parent: int) -> dict[str, str]:
    m = _read_manifest(path, parent)
    mapping = _column_mapping(m)
    if mapping:
        return dict(mapping)
    schema = _table_schema(path, parent)
    if schema is None:
        raise ValueError(
            f"table at {path} has no manifest schema — RENAME/DROP "
            "COLUMN needs one (tables created by create_table have it)"
        )
    return {f.name: f.name for f in schema.fields}


def _guard_constraints_reference(path: str, column: str) -> None:
    import re as _re

    for cname, expr in table_constraints(path).items():
        if _re.search(rf"\b{_re.escape(column)}\b", expr):
            raise ValueError(
                f"column {column!r} is referenced by CHECK constraint "
                f"{cname!r} ({expr!r}); drop the constraint first"
            )


def rename_column(path: str, old: str, new: str) -> int:
    """Zero-rewrite RENAME COLUMN (Delta column-mapping "name" mode):
    data files keep their physical column names forever; this commit
    only updates the manifest's {logical -> physical} mapping. Reads,
    DML predicates, constraints, CDF, and the streaming change feed all
    speak logical names from the next version on; time travel to older
    versions still shows the old name (each version's mapping rides its
    own manifest). Schema evolution is rejected on mapped tables (a new
    logical column could collide with a retired physical name).
    Returns the new version."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    mapping = _current_mapping_or_identity(path, parent)
    if old not in mapping:
        raise ValueError(f"no column {old!r} (have {sorted(mapping)})")
    if new in mapping:
        raise ValueError(f"column {new!r} already exists")
    _guard_constraints_reference(path, old)
    new_mapping = [
        [new if log == old else log, phys] for log, phys in mapping.items()
    ]
    m = _read_manifest(path, parent)
    return _commit(
        path,
        list(m["files"]),
        "rename_column",
        parent=parent,
        extra={"column_mapping": new_mapping},
    )


def drop_column(path: str, column: str) -> int:
    """Zero-rewrite DROP COLUMN: the manifest mapping stops projecting
    the column; data files are untouched (old versions still read it
    via time travel). Same mapped-table evolution restriction as
    :func:`rename_column`. Returns the new version."""
    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    mapping = _current_mapping_or_identity(path, parent)
    if column not in mapping:
        raise ValueError(f"no column {column!r} (have {sorted(mapping)})")
    if len(mapping) == 1:
        raise ValueError("cannot drop the only column")
    _guard_constraints_reference(path, column)
    new_mapping = [
        [log, phys] for log, phys in mapping.items() if log != column
    ]
    m = _read_manifest(path, parent)
    return _commit(
        path,
        list(m["files"]),
        "drop_column",
        parent=parent,
        extra={"column_mapping": new_mapping},
    )


def shallow_clone(
    src_path: str, dst_path: str, version: int | None = None
) -> int:
    """Zero-copy clone (Delta ``CLONE``): the new table's v1 manifest
    references the SOURCE's immutable data files by relative path — no
    data moves, clone cost is one manifest write regardless of table
    size. Schema, CHECK constraints, and per-file pruning stats carry
    over (stats re-keyed to the clone-relative paths, so scan planning
    works unchanged).

    Writes to the clone land in the clone's own data dir; copy-on-write
    rewrites migrate touched files out of the source as a side effect,
    so the clone diverges without ever mutating the source. Caveats
    (same as Delta shallow clones): the clone must stay on the same
    filesystem as the source, and expiring/vacuuming the SOURCE can
    remove files a clone still references — deep-copy (CTAS from
    ``read_table``) when lifecycles must be independent.
    """
    v = version if version is not None else current_version(src_path)
    if v is None:
        raise ValueError(f"no snapshot table at {src_path}")
    if _versions(dst_path):
        raise ValueError(f"snapshot table already exists at {dst_path}")
    m = _read_manifest(src_path, v)
    os.makedirs(os.path.join(dst_path, _SNAP_DIR), exist_ok=True)
    os.makedirs(os.path.join(dst_path, _DATA_DIR), exist_ok=True)
    src_abs, dst_abs = os.path.abspath(src_path), os.path.abspath(dst_path)
    rel = {
        f: os.path.relpath(os.path.join(src_abs, f), dst_abs)
        for f in m["files"]
    }
    stats = {
        rel[f]: s for f, s in (m.get("stats") or {}).items() if f in rel
    }
    extra: dict = {"cloned_from": src_abs, "cloned_version": v}
    if m.get("constraints"):
        extra["constraints"] = m["constraints"]
    if m.get("dv"):
        # deletion vectors carry over by reference too; their (batch,
        # file) keys are path-prefix-independent, so they keep matching
        # the re-referenced data files
        extra["dv"] = sorted(
            os.path.relpath(os.path.join(src_abs, f), dst_abs)
            for f in m["dv"]
        )
    if m.get("column_mapping"):
        extra["column_mapping"] = m["column_mapping"]
    return _commit(
        dst_path, [rel[f] for f in m["files"]], "clone", parent=None,
        extra=extra, schema_json=m.get("schema"), new_stats=stats,
    )


class AuditFailed(RuntimeError):
    """Write-audit-publish rejection: the staged files were NOT
    committed; per-expectation violation counts attached."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        bad = {k: v for k, v in counts.items() if v and k != "_rows_observed"}
        super().__init__(f"audit failed, commit withheld: {bad}")


def audited_append(
    df: DataFrame,
    path: str,
    expectations,
    merge_schema: bool = False,
    retries: int = 5,
) -> tuple[int, dict[str, int]]:
    """Write-audit-publish append (Iceberg WAP / DLT fail-expectations
    done atomically): stage the batch's data files with expectation
    counters riding the SAME write job (``Dataset.observe`` — zero extra
    scans), then commit the manifest ONLY if every expectation came back
    clean. On violations the commit is withheld — readers never see the
    batch, because visibility IS the manifest — and the staged files are
    left as orphans for :func:`vacuum_orphans`; ``AuditFailed`` carries
    the counts.

    ``expectations`` maps name -> boolean VIOLATION column (true = bad
    row, the quality/ convention). Returns ``(version, counts)`` on a
    clean audit. Schema validation, CHECK constraints, and the
    commuting-append CAS retry behave exactly like :func:`append`.
    """
    from pyspark.sql import Observation

    parent = current_version(path)
    if parent is None:
        raise ValueError(f"no snapshot table at {path}")
    schema_json = _validate_append_schema(df, path, parent, merge_schema)
    _enforce_constraints(df, path)
    metrics = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in expectations.items()
    ] + [F.count(F.lit(1)).alias("_rows_observed")]
    obs = Observation()
    new_files, new_stats = _write_data_files(df.observe(obs, *metrics), path)
    counts = {k: int(v) for k, v in obs.get.items()}
    if any(v for k, v in counts.items() if k != "_rows_observed"):
        raise AuditFailed(counts)
    version = _commit_append_with_retry(
        df, path, parent, schema_json, new_files, new_stats,
        merge_schema, retries,
    )
    return version, counts
