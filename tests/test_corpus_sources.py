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
