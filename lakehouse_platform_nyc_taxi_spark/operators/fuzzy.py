"""Blocked fuzzy (edit-distance) self-join without a cartesian product.

Matching "almost identical" strings is a standard entity-resolution /
training-data-cleanup step. The naive formulation is an all-pairs
``levenshtein(a, b) <= k`` cross join — O(n^2) comparisons, a
non-starter at 100 TB. This module implements pigeonhole blocking
(PassJoin-style, Li et al., "PASS-JOIN: A Partition-based Method for
Similarity Joins", VLDB 2012): split each string into ``k+1`` disjoint
segments; two equal-length strings within substitution distance ``k``
must agree on at least one segment *at the same position*. Candidate
generation is then a plain equi-join on ``(segment_ordinal,
segment_text, length)`` — shuffled, broadcastable, AQE-skew-splittable
like any other join — followed by an exact ``levenshtein`` verify on
the (tiny) candidate set.

Scope: equal-length pairs (substitution edits), the dominant case for
code-like identifiers. General insert/delete support requires shifted
segment probes (the full PassJoin matrix) — same join shape, more
candidate keys — and is out of scope here.

Scale design: no CartesianProduct in the plan (pinned by
tests/test_plans.py); candidates per block are bounded by block
cardinality, and hot blocks (low-entropy segments) are ordinary skewed
join keys — AQE skew splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    key: str,
    text: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (a, b) with equal-length ``text`` values within
    substitution distance ``max_dist``, emitted once (key_a < key_b).

    Returns (key_a, key_b, text_a, text_b, dist).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    n_seg = max_dist + 1
    base = df.select(
        F.col(key).alias("k"),
        F.col(text).alias("t"),
        F.length(text).alias("len"),
    )
    # Segment i of n over a string of length L: even split, first
    # (L mod n) segments get the extra character. Computed identically
    # on both sides of the join (and in the SQL oracle).
    seg_rows = []
    for i in range(n_seg):
        start = F.floor(F.col("len") * i / n_seg).cast("int") + 1
        end = F.floor(F.col("len") * (i + 1) / n_seg).cast("int")
        seg_rows.append(
            base.select(
                "k",
                "t",
                "len",
                F.lit(i).alias("seg_i"),
                F.col("t").substr(start, end - start + 1).alias("seg"),
            )
        )
    segs = seg_rows[0]
    for s in seg_rows[1:]:
        segs = segs.union(s)

    left = segs.select(
        F.col("k").alias("key_a"),
        F.col("t").alias("text_a"),
        "len",
        "seg_i",
        "seg",
    )
    right = segs.select(
        F.col("k").alias("key_b"),
        F.col("t").alias("text_b"),
        "len",
        "seg_i",
        "seg",
    )
    candidates = (
        left.join(right, ["len", "seg_i", "seg"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "text_a", "text_b")
        .distinct()
    )
    return (
        candidates.withColumn(
            "dist", F.levenshtein("text_a", "text_b")
        )
        .filter(F.col("dist") <= max_dist)
        .select("key_a", "key_b", "text_a", "text_b", "dist")
    )
