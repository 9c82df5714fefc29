"""JSONL/CSV corpus ingestion: schema contract, corrupt-record quarantine,
normalization to the documents contract."""

from __future__ import annotations

from lakehouse_platform_nyc_taxi_spark.sources.corpus import (
    normalize_documents,
    read_csv_corpus,
    read_jsonl_corpus,
    split_corrupt,
)


def test_jsonl_roundtrip_with_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "text": "bonjour"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": null, "source": "book"}\n'
    )
    df = read_jsonl_corpus(spark, str(p))
    good, bad = split_corrupt(df)
    assert good.count() == 3
    assert bad.count() == 1
    assert bad.first().raw_line.startswith("this line")

    docs = normalize_documents(good)
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {1, 2}          # doc 3 dropped: no text
    assert rows[1].n_chars == 11
    assert rows[2].lang == "und" and rows[2].source == "unknown"
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_jsonl_feeds_downstream_operators(spark, tmp_path):
    from lakehouse_platform_nyc_taxi_spark.operators.curation import curate_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and then keeps running "
        "through many plain words until the token minimum is comfortably met"
    )
    lines = "\n".join(
        f'{{"doc_id": {i}, "text": "{base} v{i}", "source": "web"}}' for i in range(12)
    )
    p = tmp_path / "c.jsonl"
    p.write_text(lines + "\n")
    good, _ = split_corrupt(read_jsonl_corpus(spark, str(p)))
    curated = curate_corpus(normalize_documents(good), cap_per_source=50)
    assert curated.count() == 12


def test_csv_corpus_schema_contract(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"a b c",en,web,5\n'
        '2,"d e f",,web,\n'
    )
    good, bad = split_corrupt(read_csv_corpus(spark, str(p)))
    assert bad.count() == 0
    rows = {r.doc_id: r for r in normalize_documents(good).collect()}
    assert rows[2].n_chars == 5 and rows[2].lang == "und"


def test_python_datasource_doc_corpus(spark):
    from lakehouse_platform_nyc_taxi_spark.sources.python_datasource import (
        DocCorpusDataSource,
    )

    spark.dataSource.register(DocCorpusDataSource)
    df = (
        spark.read.format("doc_corpus")
        .option("numDocs", 500)
        .option("numPartitions", 4)
        .option("seed", "t")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 500
    rows = {r.doc_id: r for r in df.collect()}
    assert sorted(rows) == list(range(500))
    # deterministic: a second read (different partitioning) is identical
    df2 = (
        spark.read.format("doc_corpus")
        .option("numDocs", 500)
        .option("numPartitions", 7)
        .option("seed", "t")
        .load()
    )
    rows2 = {r.doc_id: r for r in df2.collect()}
    assert all(rows[i].text == rows2[i].text for i in range(500))
    # generated docs flow straight into the text operators
    from lakehouse_platform_nyc_taxi_spark.operators import text as T

    stats = T.text_stats(df)
    assert stats.count() == 500
    assert rows[0].n_chars == len(rows[0].text)


# ---------------------------------------------------------------------------
# snapshot_cdf: streaming change-feed source over snapshot tables
# ---------------------------------------------------------------------------


def _cdf_setup(spark, tmp_path):
    import pyspark.sql.functions as F

    from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap
    from lakehouse_platform_nyc_taxi_spark.sources.python_datasource import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    path = str(tmp_path / "cdf_table")
    snap.create_table(
        spark.range(0, 20).select(
            F.col("id"), (F.col("id") % 5).alias("bucket")
        ).repartition(2),
        path,
    )
    snap.append(
        spark.range(20, 30).select(
            F.col("id"), F.lit(0).cast("long").alias("bucket")
        ),
        path,
    )
    snap.delete_where_mor(spark, path, F.col("id") < 3)
    return snap, path


def _drain_cdf(spark, path, out, ckpt, **options):
    reader = spark.readStream.format("snapshot_cdf").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_snapshot_cdf_streams_inserts_and_mor_deletes(spark, tmp_path):
    _snap, path = _cdf_setup(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_cdf(spark, path, out, ckpt)
    r = spark.read.parquet(out)
    got = {
        row._change_type: row.n
        for row in r.groupBy("_change_type").count().withColumnRenamed("count", "n").collect()
    }
    assert got == {"insert": 30, "delete": 3}
    # per-commit versions: create=1, append=2, mor delete=3
    versions = {
        (row._change_type, row._commit_version)
        for row in r.select("_change_type", "_commit_version").distinct().collect()
    }
    assert versions == {("insert", 1), ("insert", 2), ("delete", 3)}
    assert sorted(
        row.id for row in r.filter("_change_type = 'delete'").collect()
    ) == [0, 1, 2]


def test_snapshot_cdf_restart_resumes_exactly_once(spark, tmp_path):
    import pyspark.sql.functions as F

    snap, path = _cdf_setup(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_cdf(spark, path, out, ckpt)
    snap.append(
        spark.range(100, 105).select(
            F.col("id"), F.lit(9).cast("long").alias("bucket")
        ),
        path,
    )
    snap.delete_where_mor(spark, path, F.col("id") == 25)
    _drain_cdf(spark, path, out, ckpt)  # same checkpoint -> resume
    r = spark.read.parquet(out)
    assert r.count() == r.distinct().count()  # nothing replayed
    got = {
        row._change_type: row.n
        for row in r.groupBy("_change_type").count().withColumnRenamed("count", "n").collect()
    }
    assert got == {"insert": 35, "delete": 4}


def test_snapshot_cdf_rejects_or_skips_cow_commits(spark, tmp_path):
    import pyspark.sql.functions as F
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    snap, path = _cdf_setup(spark, tmp_path)
    snap.delete_where(spark, path, F.col("id") == 29)  # COW rewrite
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    with pytest.raises(StreamingQueryException, match="copy-on-write"):
        _drain_cdf(spark, path, out, ckpt)
    # Delta semantics: skipChangeCommits ignores the rewrite commit
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _drain_cdf(spark, path, out2, ckpt2, skipChangeCommits="true")
    r = spark.read.parquet(out2)
    assert r.filter("_change_type = 'delete'").count() == 3
    # inserts: v1 (20 rows) + v2 (10) — the rewrite's new file is skipped
    assert r.filter("_change_type = 'insert'").count() == 30


def test_snapshot_cdf_starting_version(spark, tmp_path):
    _snap, path = _cdf_setup(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_cdf(spark, path, out, ckpt, startingVersion="2")
    r = spark.read.parquet(out)
    # only the v3 MOR delete is after version 2
    assert {row._change_type for row in r.select("_change_type").collect()} == {
        "delete"
    }
    assert r.count() == 3
