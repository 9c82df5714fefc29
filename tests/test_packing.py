"""Sequence packing / chunking edge semantics (operators/packing.py)."""

from __future__ import annotations

import pytest

from lakehouse_platform_nyc_taxi_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_sequences_straddle_and_boundaries(spark):
    # shard A: 3 + 4 + 5 tokens, budget 6 ->
    #   doc 1 [0,3) seq0; doc 2 [3,7): seq0 gets [0,3), seq1 gets [3,4);
    #   doc 3 [7,12): seq1 gets [0,5)
    df = _docs(
        spark,
        [
            (1, "A", "a b c"),
            (2, "A", "d e f g"),
            (3, "A", "h i j k l"),
            (4, "B", "x y"),
            (5, "B", ""),  # empty: dropped
        ],
    )
    rows = {
        (r.shard, r.seq_id, r.doc_id): r
        for r in pack_sequences(df, budget=6, shard_col="source").collect()
    }
    assert set(rows) == {("A", 0, 1), ("A", 0, 2), ("A", 1, 2), ("A", 1, 3), ("B", 0, 4)}
    r = rows[("A", 0, 1)]
    assert (r.doc_tok_start, r.doc_tok_end, r.seq_offset) == (0, 3, 0)
    r = rows[("A", 0, 2)]
    assert (r.doc_tok_start, r.doc_tok_end, r.seq_offset) == (0, 3, 3)
    r = rows[("A", 1, 2)]
    assert (r.doc_tok_start, r.doc_tok_end, r.seq_offset) == (3, 4, 0)
    r = rows[("A", 1, 3)]
    assert (r.doc_tok_start, r.doc_tok_end, r.seq_offset) == (0, 5, 1)
    # every sequence except each shard's last is exactly full
    per_seq = {}
    for (shard, seq, _), r in rows.items():
        per_seq[(shard, seq)] = per_seq.get((shard, seq), 0) + (
            r.doc_tok_end - r.doc_tok_start
        )
    assert per_seq == {("A", 0): 6, ("A", 1): 6, ("B", 0): 2}


def test_pack_sequences_exact_budget_multiple(spark):
    # 6 tokens on budget 3: exactly two full sequences, no empty third
    df = _docs(spark, [(1, "A", "a b c d e f")])
    got = sorted(
        (r.seq_id, r.doc_tok_start, r.doc_tok_end)
        for r in pack_sequences(df, budget=3, shard_col="source").collect()
    )
    assert got == [(0, 0, 3), (1, 3, 6)]


def test_chunk_documents_overlap_and_tail(spark):
    # 10 tokens, max 4, overlap 1 -> stride 3: starts 0,3,6 cover through
    # token 9 (chunk at 6 spans [6,10)); no chunk starting at 9
    df = _docs(spark, [(1, "A", "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "A", "")])
    got = sorted(
        (r.chunk_idx, r.chunk_tok_start, r.chunk_n_tokens, r.chunk_text)
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    )
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "A", "a b")])
    got = chunk_documents(df, max_tokens=16, overlap=4).collect()
    assert len(got) == 1
    assert (got[0].chunk_idx, got[0].chunk_n_tokens, got[0].chunk_text) == (0, 2, "a b")


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "A", "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
