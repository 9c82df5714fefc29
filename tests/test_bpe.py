"""Distributed BPE trainer vs a pure-python reference: identical merge
lists and tokenizations, deterministic tie-breaks, shuffle-free
application plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.operators.bpe import (
    EOW,
    tokenize_bpe,
    train_bpe,
    word_table,
)


def _ref_bpe(texts, n_merges, min_pair_count=2):
    """Reference BPE (Sennrich-style) on word frequencies."""
    words = {}
    for t in texts:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, toks in vocab.items():
            out = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "that hat is the cat hat",
    "mats and hats and cats",
]


@pytest.mark.slow
def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = train_bpe(docs, n_merges=8)
    want, _ = _ref_bpe(TEXTS, 8)
    assert got == want


def test_tokenize_matches_reference_and_roundtrips(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=6)
    ref_merges, ref_vocab = _ref_bpe(TEXTS, 6)
    assert merges == ref_merges
    out = {r.doc_id: r.bpe_tokens for r in tokenize_bpe(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        want = [tok for w in t.lower().split() for tok in ref_vocab[w]]
        assert out[i] == want, (i, out[i], want)
    # detokenization: concatenating tokens restores the text (modulo EOW)
    joined = "".join(out[0]).replace(EOW, " ").strip()
    assert joined == TEXTS[0]


def test_train_bpe_early_stop_and_validation(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    # pairs occur once -> below min_pair_count=2 -> no merges
    assert train_bpe(docs, n_merges=5) == []
    assert train_bpe(docs, n_merges=5, min_pair_count=1) != []
    with pytest.raises(ValueError):
        train_bpe(docs, n_merges=0)


def test_tokenize_is_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(i, "aa bb aa") for i in range(10)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=3, min_pair_count=1)
    out = tokenize_bpe(docs, merges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_word_table_collapses_corpus(spark):
    docs = spark.createDataFrame(
        [(i, "spark spark flink") for i in range(100)], "doc_id long, text string"
    )
    wt = {r.word: r.cnt for r in word_table(docs).collect()}
    assert wt == {"spark": 200, "flink": 100}
