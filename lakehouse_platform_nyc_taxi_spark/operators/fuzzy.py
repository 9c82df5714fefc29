"""Blocked fuzzy (edit-distance) self-join without a cartesian product.

Matching "almost identical" strings is a standard entity-resolution /
training-data-cleanup step. The naive formulation is an all-pairs
``levenshtein(a, b) <= k`` cross join — O(n^2) comparisons, a
non-starter at 100 TB. This module implements PassJoin-style
partition blocking (Li et al., "PASS-JOIN: A Partition-based Method
for Similarity Joins", VLDB 2012): split each string into ``k+1``
disjoint segments; if two strings are within edit distance ``k``, at
least one segment of either string appears EXACTLY in the other,
shifted by at most ``k`` positions (the pigeonhole lemma — k edits
can't touch all k+1 segments, and untouched content shifts by at most
the net insertions/deletions before it). Candidate generation is then
a plain equi-join of segment keys against shift-windowed substring
probes — shuffled, broadcastable, AQE-skew-splittable like any other
join — followed by an exact ``levenshtein`` verify on the (small)
candidate set.

Scope: equal-length pairs (covers substitutions AND compensating
insert+delete shifts). Cross-length support needs length-grouped
partitioning of the probe windows — same join shape, more keys — and
is out of scope here.

Scale design: no CartesianProduct in the plan (pinned by
tests/test_plans.py); probes multiply rows by (k+1)(2k+1) — constant
in n; candidates per block are bounded by block cardinality, and hot
blocks (low-entropy segments) are ordinary skewed join keys — AQE
skew splitting applies. Completeness vs a brute-force reference is
property-tested under hypothesis (the aligned-segment shortcut this
replaced missed shift pairs at k >= 2).
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
    """All pairs (a, b) with equal-length ``text`` values within edit
    distance ``max_dist``, emitted once (key_a < key_b).

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
    # Segment i of n over a string of length L: even split, start/length
    # derived from (L, i) only — identical for any two equal-length
    # strings, so segment and probe windows line up.
    seg_parts = []
    probe_parts = []
    for i in range(n_seg):
        start = F.floor(F.col("len") * i / n_seg).cast("int") + 1
        end = F.floor(F.col("len") * (i + 1) / n_seg).cast("int")
        seg_len = end - start + 1
        seg_parts.append(
            base.select(
                "k",
                "t",
                "len",
                F.lit(i).alias("seg_i"),
                F.col("t").substr(start, seg_len).alias("seg"),
            ).filter(F.length("seg") > 0)
        )
        for d in range(-max_dist, max_dist + 1):
            probe_parts.append(
                base.select(
                    "k",
                    "t",
                    "len",
                    F.lit(i).alias("seg_i"),
                    F.col("t").substr(start + d, seg_len).alias("seg"),
                ).filter(
                    (F.lit(d) + start >= 1) & (F.length("seg") > 0)
                )
            )
    # strings shorter than k+1 can't be partitioned into k+1 non-empty
    # segments — but any equal-length pair with len <= k is within
    # distance k by definition (at most len substitutions), so they all
    # share one degenerate block per length and the verify confirms.
    shorts = base.filter(F.col("len") <= max_dist).select(
        "k",
        "t",
        "len",
        F.lit(-1).alias("seg_i"),
        F.lit("").alias("seg"),
    )
    seg_parts.append(shorts)
    probe_parts.append(shorts)
    segs = seg_parts[0]
    for p in seg_parts[1:]:
        segs = segs.union(p)
    probes = probe_parts[0]
    for p in probe_parts[1:]:
        probes = probes.union(p)

    left = segs.select(
        F.col("k").alias("key_a"),
        F.col("t").alias("text_a"),
        "len",
        "seg_i",
        "seg",
    )
    right = probes.select(
        F.col("k").alias("key_b"),
        F.col("t").alias("text_b"),
        "len",
        "seg_i",
        "seg",
    )
    # the pigeonhole lemma guarantees a (segment-of-one, shifted-probe-
    # of-the-other) hit in at least one orientation; generating segments
    # AND probes for every string covers both, and the unordered-pair
    # normalization dedups.
    candidates = (
        left.join(right, ["len", "seg_i", "seg"])
        .filter(F.col("key_a") != F.col("key_b"))
        .select(
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("text_a"))
            .otherwise(F.col("text_b"))
            .alias("text_a"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("text_b"))
            .otherwise(F.col("text_a"))
            .alias("text_b"),
        )
        .distinct()
    )
    return (
        candidates.withColumn(
            "dist", F.levenshtein("text_a", "text_b")
        )
        .filter(F.col("dist") <= max_dist)
        .select("key_a", "key_b", "text_a", "text_b", "dist")
    )
