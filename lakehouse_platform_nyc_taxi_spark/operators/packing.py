"""Sequence packing and document chunking: the last mile between a
curated corpus and a trainable token stream.

Two standard shapes:

- ``pack_sequences`` — GPT-style concat-and-split packing: within each
  shard, documents are concatenated in deterministic order and the
  token stream is cut into fixed-budget training sequences. Documents
  MAY straddle a sequence boundary (that is how causal-LM packing
  actually works); the output maps every (sequence, document-segment)
  so a writer can materialize sequences by joining token slices.
- ``chunk_documents`` — overlapping chunk split: each over-long document
  becomes ceil-many chunks of at most ``max_tokens`` tokens with a
  fixed token overlap between consecutive chunks (the RAG/embedding
  shape, where a document must not straddle units but may repeat).

Scale design: chunking is a pure per-row projection (array slicing +
posexplode — zero shuffles, fused into the scan). Packing needs one
window cumsum *per shard*, so the shard column is the parallelism unit:
shards pack independently and concurrently, and no global order or
single-partition window ever exists (a 100 TB corpus packs as N
independent shard streams — the same layout writers shard output files
by). Both are pure Catalyst expressions, oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count, tokens


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map each document onto the fixed-``budget`` training sequences it
    occupies under concat-and-split packing.

    Within a shard, documents are laid end-to-end ordered by ``id_col``
    (deterministic, engine-independent); sequence ``k`` of a shard owns
    the half-open token range ``[k*budget, (k+1)*budget)`` of that
    shard's concatenated stream. A document emits one row per sequence
    it overlaps:

    - ``seq_id``        — sequence index within the shard
    - ``doc_tok_start`` / ``doc_tok_end`` — the document-local token
      slice (half-open) that lands in this sequence
    - ``seq_offset``    — where that slice begins inside the sequence

    Zero padding/fragmentation accounting is the caller's: the final
    sequence of each shard is the only one that can be short.

    One shuffle on ``shard_col`` (the window partition); everything
    after the cumsum is a per-row projection + bounded explode (a doc
    spans at most ``1 + n_tokens // budget`` sequences).
    """
    w = Window.partitionBy("shard").orderBy(id_col)
    n = token_count(text_col)
    base = (
        # trim-filter BEFORE counting: whitespace-split of an empty string
        # is [""] (one empty token), so empty/blank docs would otherwise
        # pack as one-token documents
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(shard_col).alias("shard"), F.col(id_col), n.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("off_end", F.sum("n_tokens").over(w))
        .withColumn("off_start", F.col("off_end") - F.col("n_tokens"))
    )
    first_seq = F.floor(F.col("off_start") / budget)
    last_seq = F.floor((F.col("off_end") - 1) / budget)
    seq = F.col("seq_id")
    return (
        base.select(
            "shard",
            id_col,
            "n_tokens",
            "off_start",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            "shard",
            F.col("seq_id").cast("long"),
            F.col(id_col),
            F.greatest(F.lit(0), seq * budget - F.col("off_start"))
            .cast("long")
            .alias("doc_tok_start"),
            F.least(F.col("n_tokens"), (seq + 1) * budget - F.col("off_start"))
            .cast("long")
            .alias("doc_tok_end"),
            (F.greatest(F.col("off_start"), seq * budget) - seq * budget)
            .cast("long")
            .alias("seq_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into chunks of at most ``max_tokens`` tokens,
    consecutive chunks sharing ``overlap`` tokens.

    Chunk ``i`` covers document tokens ``[i*stride, i*stride +
    max_tokens)`` with ``stride = max_tokens - overlap``; the last chunk
    is the first one whose window reaches the end of the document, so
    every token is covered exactly once outside overlaps and no empty
    trailing chunk is emitted. Documents shorter than ``max_tokens``
    yield one chunk; empty documents yield none.

    Pure per-row projection (token array slice + posexplode) — zero
    shuffles, runs fused into the document scan at any scale.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens ({max_tokens})"
        )
    stride = max_tokens - overlap
    n = F.size("_toks")
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_tokens)) / stride) + 1
    )
    chunk_arrays = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_toks"), i * stride + 1, max_tokens),
    )
    return (
        # trim-filter first: whitespace-split of "" is [""], not []
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(text_col).alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(F.col(id_col), F.posexplode(chunk_arrays).alias("chunk_idx", "_chunk"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long"),
            (F.col("chunk_idx") * stride).cast("long").alias("chunk_tok_start"),
            F.size("_chunk").cast("long").alias("chunk_n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )
