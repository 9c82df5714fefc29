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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
