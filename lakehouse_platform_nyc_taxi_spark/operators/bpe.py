"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Training a tokenizer is the one step of an LLM data pipeline that must
see the WHOLE corpus; at 100 TB that means the pair-counting loop has
to be a distributed aggregation, not a driver-side dictionary. The
Spark shape used here:

- the corpus collapses to a ``(word, count)`` table once (word-level
  dedup — pair statistics only depend on word frequencies, so all
  later passes touch vocabulary-sized data, not corpus-sized);
- each merge step is ONE shuffle: explode adjacent token pairs
  weighted by word count, aggregate, take the arg-max pair
  (deterministic count-desc / pair-asc tiebreak — a 1-row collect,
  bounded driver metadata);
- the winning merge is applied to the token arrays with a row-local
  higher-order ``aggregate`` fold (left-to-right greedy, the classic
  BPE application order) — no Python in the loop, no shuffle;
- the word table is ``localCheckpoint``-ed per iteration so the plan
  stays O(1) deep instead of re-deriving the corpus per merge
  (the same lineage-truncation discipline as operators/graph.py).

Total cost: O(n_merges) shuffles over vocabulary-sized data after one
corpus-sized pass. The merge list itself is tiny (the model), so
returning it driver-side is the contract, not a leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel (kept printable; never appears in \\w tokens).
EOW = "</w>"


def _merge_pair_expr(tokens_col: str, a: str, b: str):
    """Row-local greedy merge of adjacent (a, b) -> a+b via a fold."""

    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    ea, eb = esc(a), esc(b)
    return F.expr(
        f"""
        aggregate(
          {tokens_col},
          CAST(array() AS ARRAY<STRING>),
          (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1) = '{ea}'
                 AND x = '{eb}'
            THEN concat(slice(acc, 1, size(acc) - 1), array('{ea}' || '{eb}'))
            ELSE concat(acc, array(x))
          END
        )
        """
    )


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count) with words split to character tokens
    plus the end-of-word sentinel. The one corpus-sized pass."""
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.length("word") > 0)
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    toks = F.expr(
        f"concat(transform(split(word, ''), c -> c), array('{EOW}'))"
    )
    # split('', pattern='') yields a trailing empty string in some Spark
    # versions — filter defensively
    toks = F.filter(toks, lambda c: F.length(c) > 0)
    return counts.select("word", "cnt", toks.alias("tokens"))


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in application order (the tokenizer model). Stops early when
    the best remaining pair occurs fewer than ``min_pair_count`` times
    (weighted by word frequency)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    wt = word_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = wt.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(slice(tokens, 1, size(tokens) - 1),"
                    " (t, i) -> struct(t AS a, element_at(tokens, i + 2) AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()  # 1 row: the arg-max pair (bounded metadata)
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        wt = wt.withColumn(
            "tokens", _merge_pair_expr("tokens", a, b)
        ).localCheckpoint(eager=True)
    return merges


def tokenize_bpe(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list: rows gain ``bpe_tokens``
    (array<string>) and ``n_bpe_tokens``. Pure row-local higher-order
    folds — fuses into the scan, no shuffle, no Python.

    The document is flattened to one token stream with the EOW
    sentinel terminating each word. Merges can never cross a word
    boundary in this representation: a crossing pair would need EOW
    (or an EOW-suffixed merged token) as its LEFT element, and
    training only ever sees such tokens in final position — so no
    learned merge has one."""
    toks = F.expr(
        f"""
        flatten(transform(
          split(lower(trim({text_col})), '\\\\s+'),
          w -> concat(filter(transform(split(w, ''), c -> c),
                             c -> length(c) > 0),
                      array('{EOW}'))
        ))
        """
    )
    out = docs.withColumn("bpe_tokens", toks)
    for a, b in merges:
        out = out.withColumn(
            "bpe_tokens", _merge_pair_expr("bpe_tokens", a, b)
        )
    return out.withColumn(
        "n_bpe_tokens", F.size("bpe_tokens").cast("long")
    )
