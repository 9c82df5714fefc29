"""End-to-end corpus curation: the composition every pretraining-data
pipeline runs — quality filter -> exact dedup -> per-source cap ->
leak-proof split — as ONE lazy DataFrame plan.

Each stage is an existing operator (text.text_stats, dedup.exact_dedup,
sampling.per_group_cap / train_val_test_split); this module fixes their
composition order and the columns that flow between them, so Catalyst
fuses the whole chain: one scan of the corpus, one digest-groupBy
shuffle (dedup), one group-key shuffle (cap), everything else is
mapper-side. At 100 TB that is 2 shuffles total, both carrying slim
rows (digests / ids), never full text.

Stage order is deliberate: quality-filter first (cheapest, biggest
reduction), dedup second (dedup of junk is wasted work), cap third (the
balance should reflect the deduped population), split last (membership
must be decided on the final population — splitting earlier would let
the cap silently unbalance val/test)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .sampling import per_group_cap, train_val_test_split
from .text import text_stats


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    cap_per_source: int = 200,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
) -> DataFrame:
    """Per-document curation decisions for the final corpus.

    Returns one row per *surviving* document: (id, source, n_tokens,
    split). Survivors are high-quality canonical documents (smallest id
    among exact duplicates), at most ``cap_per_source`` per source.
    """
    stats = text_stats(
        docs, text_col=text_col, id_col=id_col, keep=(source_col, text_col)
    ).select(id_col, source_col, text_col, "n_tokens", "is_high_quality")
    hq = stats.filter(F.col("is_high_quality"))

    canonical = exact_dedup(hq, text_col=text_col, id_col=id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    kept = hq.join(canonical, id_col, "left_semi").select(
        id_col, source_col, "n_tokens"
    )

    capped = per_group_cap(kept, source_col, cap_per_source, id_col)
    return train_val_test_split(
        capped, id_col, val_rate=val_rate, test_rate=test_rate
    )


def curation_summary(curated: DataFrame, source_col: str = "source") -> DataFrame:
    """Roll the per-doc decisions up to (source, split) totals — the
    shape a curation report shows: corpus balance after filtering."""
    return curated.groupBy(source_col, "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
