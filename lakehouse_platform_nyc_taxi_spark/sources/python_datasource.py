"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-document generator, registered as a real
pluggable format — ``spark.read.format("doc_corpus")``.

Why it matters for this engine: the DataSource API is how Python-side
connectors (feed APIs, proprietary corpus stores, queue snapshots)
enter the DataFrame world WITHOUT driver-side materialization — the
reader declares partitions, executors call ``read(partition)`` in
parallel, and everything downstream is ordinary Catalyst. This source
doubles as an unbounded test-corpus generator: content is pure
``md5(seed|doc_id)`` arithmetic, so any slice of any size is
reproducible bit-for-bit on any cluster layout.

Usage::

    spark.dataSource.register(DocCorpusDataSource)
    df = (spark.read.format("doc_corpus")
          .option("numDocs", 10000).option("numPartitions", 32)
          .option("seed", "r5").load())
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: Small fixed vocabulary — same spirit as the driver's synthetic docs.
_VOCAB = (
    "spark shuffle join scan filter sort merge hash batch stream row column "
    "table key value part query data line window group vector small big "
    "fast slow order the a customer agg"
).split()


class DocCorpusDataSource(DataSource):
    """``format("doc_corpus")`` — deterministic synthetic documents."""

    @classmethod
    def name(cls) -> str:
        return "doc_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> "DocCorpusReader":
        return DocCorpusReader(self.options)


class DocCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("numdocs", 1000))
        self.n_parts = max(1, int(options.get("numpartitions", 8)))
        self.seed = str(options.get("seed", "0"))

    def partitions(self):
        per = math.ceil(self.n_docs / self.n_parts)
        return [
            InputPartition((lo, min(lo + per, self.n_docs)))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition):
        lo, hi = partition.value
        v = len(_VOCAB)
        for doc_id in range(lo, hi):
            digest = hashlib.md5(f"{self.seed}|{doc_id}".encode()).digest()
            # doc length 30..93 words; successive words from rehashing
            n_words = 30 + digest[0] % 64
            words = []
            h = int.from_bytes(digest, "big")
            for _ in range(n_words):
                words.append(_VOCAB[h % v])
                h //= v
                if h < v:
                    digest = hashlib.md5(digest).digest()
                    h = int.from_bytes(digest, "big")
            text = " ".join(words)
            yield (doc_id, text, "en", f"src{doc_id % 3}", len(text))


# ---------------------------------------------------------------------------
# Streaming change-feed source over snapshot tables (Delta-streaming
# analogue): ``spark.readStream.format("snapshot_cdf")``. Offsets are
# table VERSIONS — monotonic, checkpointed by the engine, replayable
# from immutable manifests — so restarts resume exactly-once with no
# source-side state. Appends stream as inserts, merge-on-read deletes
# stream as per-tombstone delete rows; copy-on-write commits (file
# removals) raise by default or are skipped under
# ``skipChangeCommits`` — the same contract Delta's streaming source
# exposes.
#
# Scale design: the driver's partitions() touches only MANIFESTS
# (metadata); each input partition is one added data file or one
# tombstone file, read executor-side with pyarrow. A 10k-file append
# fans out as 10k parallel partitions.
# ---------------------------------------------------------------------------


class SnapshotCdfDataSource(DataSource):
    """``format("snapshot_cdf")`` — streaming change feed of a snapshot
    table. Options: ``path`` (required), ``startingVersion`` (default 0
    = full history), ``skipChangeCommits`` (default false)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def _table_schema(self):
        """(logical StructType, physical column names) — the manifest
        schema with the current column mapping applied, so a renamed
        table streams under its logical names while executors read the
        files' physical columns."""
        from pyspark.sql.types import StructField, StructType

        from .snapshots import _read_manifest, current_version

        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_cdf requires .option('path', ...)")
        v = current_version(path)
        if v is None:
            raise ValueError(f"no snapshot table at {path}")
        m = _read_manifest(path, v)
        sj = m.get("schema")
        if sj is None:
            raise ValueError(
                f"snapshot table at {path} has no manifest schema — "
                "snapshot_cdf needs one to declare its stream schema "
                "(tables created by create_table/append always have it)"
            )
        import json as _json

        phys = StructType.fromJson(_json.loads(sj))
        mapping = m.get("column_mapping")
        if not mapping:
            # force nullable: files written before a merge_schema
            # evolution null-fill the new columns, even if the column's
            # own writes were non-null (a non-nullable declared field
            # would NPE Spark's UnsafeProjection on the fill)
            fields = [
                StructField(f.name, f.dataType, True) for f in phys.fields
            ]
            return StructType(fields), [f.name for f in phys.fields]
        types = {f.name: f for f in phys.fields}
        fields, phys_names = [], []
        for log, ph in dict(mapping).items():
            fields.append(StructField(log, types[ph].dataType, True))
            phys_names.append(ph)
        return StructType(fields), phys_names

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        base, _phys = self._table_schema()
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
            ]
        )

    def streamReader(self, schema) -> "SnapshotCdfStreamReader":
        _base, phys = self._table_schema()
        return SnapshotCdfStreamReader(self.options, phys)


class SnapshotCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options, field_names):
        self.path = options["path"]
        self.starting = int(options.get("startingversion", 0))
        self.skip_changes = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self.fields = field_names

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        from .snapshots import current_version

        return {"version": current_version(self.path) or self.starting}

    def partitions(self, start: dict, end: dict):
        import os as _os

        from .snapshots import _read_manifest

        out = []
        for v in range(start["version"] + 1, end["version"] + 1):
            m = _read_manifest(self.path, v)
            prev_files: set = set()
            prev_dv: set = set()
            if m.get("parent") is not None:
                pm = _read_manifest(self.path, m["parent"])
                prev_files = set(pm["files"])
                prev_dv = set(pm.get("dv") or [])
            added = sorted(set(m["files"]) - prev_files)
            removed = sorted(prev_files - set(m["files"]))
            dv_added = sorted(set(m.get("dv") or []) - prev_dv)
            if removed:
                if self.skip_changes:
                    continue
                raise ValueError(
                    f"snapshot_cdf: version {v} ({m.get('op')}) rewrote "
                    "data files — copy-on-write commits cannot stream as "
                    "row-level changes; set .option('skipChangeCommits', "
                    "'true') to ignore them (Delta streaming-source "
                    "semantics)"
                )
            abs_of = {
                _dv_key(f): _os.path.abspath(_os.path.join(self.path, f))
                for f in m["files"]
            }
            for f in added:
                out.append(
                    InputPartition(
                        ("insert", v,
                         _os.path.abspath(_os.path.join(self.path, f)),
                         None)
                    )
                )
            for f in dv_added:
                out.append(
                    InputPartition(
                        ("delete", v,
                         _os.path.abspath(_os.path.join(self.path, f)),
                         abs_of)
                    )
                )
        return out

    def _read_evolved(self, pq, data_path, positions=None):
        """Read ``self.fields`` from a data file, null-filling columns
        the file predates: files written before a merge_schema evolution
        lack the new columns, and streaming full history (default
        startingVersion=0) of an evolved table must null-fill them like
        every other read path, not raise in pyarrow."""
        present = set(pq.read_schema(data_path).names)
        cols = [c for c in self.fields if c in present]
        tbl = pq.read_table(data_path, columns=cols)
        if positions is not None:
            tbl = tbl.take(sorted(positions))
        for row in tbl.to_pylist():
            yield tuple(row.get(c) for c in self.fields)

    def read(self, partition):
        import pyarrow.parquet as pq

        kind, version, file_path, abs_of = partition.value
        if kind == "insert":
            for vals in self._read_evolved(pq, file_path):
                yield vals + ("insert", version)
            return
        dv = pq.read_table(file_path).to_pylist()
        by_file: dict = {}
        for r in dv:
            by_file.setdefault(r["file"], []).append(r["pos"])
        for key, positions in by_file.items():
            data_path = abs_of.get(key)
            if data_path is None:
                continue  # tombstone for a file no longer in the version
            for vals in self._read_evolved(pq, data_path, positions):
                yield vals + ("delete", version)

    def commit(self, end: dict) -> None:
        pass  # offsets are table versions; manifests are immutable


def _dv_key(rel_path: str) -> str:
    """Last-two-component key, identical to snapshots._dv_key_of."""
    segs = rel_path.replace("\\", "/").split("/")
    return "/".join(segs[-2:])
