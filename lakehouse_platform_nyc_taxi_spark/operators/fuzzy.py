"""Blocked fuzzy (edit-distance) self-join without a cartesian product.

Matching "almost identical" strings is a standard entity-resolution /
training-data-cleanup step. The naive formulation is an all-pairs
``levenshtein(a, b) <= k`` cross join — O(n^2) comparisons, a
non-starter at 100 TB. This module implements PassJoin-style
partition blocking (Li et al., "PASS-JOIN: A Partition-based Method
for Similarity Joins", VLDB 2012): split each string into ``k+1``
disjoint segments; if two strings are within edit distance ``k``, at
least one segment of either string appears EXACTLY in the other,
shifted by a bounded offset (the pigeonhole lemma — k edits can't
touch all k+1 segments, and untouched content shifts by the net
insert/delete balance of the edits before it). Candidate generation
is then a plain equi-join of segment keys against shift-windowed
substring probes — shuffled, broadcastable, AQE-skew-splittable like
any other join — followed by an exact ``levenshtein`` verify on the
(small) candidate set.

Cross-length pairs are covered: a probe string generates windows for
every candidate indexed length ``l`` with ``|l - len| <= k`` — the
window positions are computed from *l* (the indexed string's even
split), and the shift ``d`` of an untouched segment obeys the tight
bound ``|d| + |d - delta| <= k`` where ``delta = len - l`` (edits
before the segment contribute ``|d|`` net inserts/deletes, edits
after contribute the remaining ``|delta - d|``, and together they
can't exceed ``k``). The general edit-distance contract — any two
strings, any lengths — therefore holds; completeness vs brute force
is property-tested under hypothesis with variable-length strings.

Scale design: no CartesianProduct in the plan (pinned by
tests/test_plans.py); segments/probes are generated with ONE
explode-of-struct-array projection per side (no N-way union), so the
scan count stays at 2 and the row blowup is O(k^3) per string —
constant in n. Candidates per block are bounded by block cardinality,
and hot blocks (low-entropy segments, the short-string degenerate
block) are ordinary skewed join keys — AQE skew splitting applies.
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
    """All pairs (a, b) with ``text`` values within edit distance
    ``max_dist`` — any lengths — emitted once (key_a < key_b).

    Returns (key_a, key_b, text_a, text_b, dist).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    k = max_dist
    n_seg = k + 1
    base = df.select(
        F.col(key).alias("k"),
        F.col(text).alias("t"),
        F.length(text).cast("int").alias("len"),
    )

    def seg_bounds(l, i):
        """Even-split segment i of a length-l string: (start, seg_len),
        1-based — derived from (l, i) only, so the index side and any
        probe targeting length l agree on positions exactly."""
        start = F.floor(l * i / n_seg).cast("int") + 1
        end = F.floor(l * (i + 1) / n_seg).cast("int")
        return start, end - start + 1

    own_len = F.col("len")
    # INDEX side: each string's own k+1 segments (strings of length
    # <= k can't fill k+1 non-empty segments; they go to the
    # degenerate block below). One struct-array explode = one scan.
    seg_structs = []
    for i in range(n_seg):
        start, seg_len = seg_bounds(own_len, i)
        seg_structs.append(
            F.struct(
                own_len.alias("blk_len"),
                F.lit(i).alias("seg_i"),
                F.when(own_len >= n_seg, F.col("t").substr(start, seg_len)).alias(
                    "seg"
                ),
                seg_len.alias("want"),
            )
        )
    # degenerate block: an indexed string shorter than k+1 chars pairs
    # only with strings of length <= 2k (length gap <= k), so both
    # sides share one constant block key and the verify does the rest
    seg_structs.append(
        F.struct(
            F.lit(-1).alias("blk_len"),
            F.lit(-1).alias("seg_i"),
            F.when(own_len <= k, F.lit("")).alias("seg"),
            F.lit(0).alias("want"),
        )
    )

    # PROBE side: windows for every candidate indexed length
    # l = len + dl, |dl| <= k. delta = len - l = -dl; the shift d of an
    # untouched segment satisfies |d| + |d - delta| <= k (tight), which
    # also prunes the equal-length case to the pure-substitution d=0
    # window at k=1.
    probe_structs = []
    for dl in range(-k, k + 1):
        tgt_len = own_len + dl
        for i in range(n_seg):
            start, seg_len = seg_bounds(tgt_len, i)
            for d in range(-k, k + 1):
                if abs(d) + abs(d + dl) > k:
                    continue
                probe_structs.append(
                    F.struct(
                        tgt_len.alias("blk_len"),
                        F.lit(i).alias("seg_i"),
                        F.when(
                            (tgt_len >= n_seg) & (start + d >= 1),
                            F.col("t").substr(start + d, seg_len),
                        ).alias("seg"),
                        seg_len.alias("want"),
                    )
                )
    probe_structs.append(
        F.struct(
            F.lit(-1).alias("blk_len"),
            F.lit(-1).alias("seg_i"),
            F.when(own_len <= 2 * k, F.lit("")).alias("seg"),
            F.lit(0).alias("want"),
        )
    )

    def expand(structs):
        return (
            base.select(
                "k", "t", F.explode(F.array(*structs)).alias("p")
            )
            .filter(
                F.col("p.seg").isNotNull()
                # a window truncated by the string's end can't equal a
                # full-length segment — drop it instead of joining it
                & (F.length("p.seg") == F.col("p.want"))
            )
            .select("k", "t", "p.blk_len", "p.seg_i", "p.seg")
        )

    left = expand(seg_structs).select(
        F.col("k").alias("key_a"),
        F.col("t").alias("text_a"),
        "blk_len",
        "seg_i",
        "seg",
    )
    right = expand(probe_structs).select(
        F.col("k").alias("key_b"),
        F.col("t").alias("text_b"),
        "blk_len",
        "seg_i",
        "seg",
    )
    # the pigeonhole lemma guarantees a (segment-of-one, shifted-probe-
    # of-the-other) hit; both orientations are generated for every
    # string, and the unordered-pair normalization dedups.
    candidates = (
        left.join(right, ["blk_len", "seg_i", "seg"])
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
