"""Partitioning-determinism: the oracle-hash contract only holds if
results are bit-identical under ANY partitioning. Re-run representative
queries with a radically different shuffle layout and repartitioned
inputs, and require exact equality with the default session's results —
this pins the decimal-fence / rounded-ranking / unique-tiebreak claims."""

from __future__ import annotations

import pytest

from lakehouse_platform_nyc_taxi_spark import harness

SF = "/root/testdata/sf0.001"

QUERIES = [
    "agg_pricing_summary",     # decimal-fenced sums + trino_round
    "agg_no_keys",             # keyless agg, count-distinct
    "sessionize_events",       # window + decimal total
    "window_time_range_sum",   # RANGE frame decimal sum
    "text_tfidf_topk",         # rounded-score ranking
    "agg_collect_sorted",      # sorted DISTINCT arrays
    "agg_arg_extremes",        # max_by/min_by on unique sequence
    "scd2_event_history",      # gaps-and-islands versioning
    "text_bm25_topk",          # decimal-fenced fixed-order term sum
    "text_lm_surprisal",       # round8 surprisal decimal sums
    "embedding_random_projection",  # 2^40 fixed-point integer folds
    "hybrid_search_rrf",       # candidate-set ranks + fixed-order fusion
    "sql_recursive_chain",     # recursive decimal accumulation
    "dedup_exact_substring",   # r8: window-hash islands (pure integer)
    "dedup_strip_spans",       # r8: interval merge + token filter
    "multimodal_decode_image", # r8: mapInPandas decode (integer stats)
    "similarity_pq_adc_topk",  # r10: Lloyd fences + ADC lookup chain
    "embedding_source_drift",  # r10: fenced mean products, no collect
    "dedup_lsh_precision",     # r10: hashed-gram recheck + fenced mean
    "events_winsorize",        # r10: tie-stable rank bounds + fences
    "sampling_bernoulli_estimate",  # r10: hash membership + fences
    "sampling_dsir_weights",   # r11: round8 log-ratio decimal sums
    "agg_count_min_sketch",    # r11: pure-integer sketch cells
    "stats_chi_squared",       # r11: round8 contributions + IEEE sqrt
    "events_rfm_segmentation", # r11: ntile tiebreaks + fenced means
    "tpch_q15_top_supplier",   # r11: rounded-revenue max equality
    "events_markov_transitions",  # r11: lead() tie order + exact ratios
    "stats_mann_whitney",      # r13: doubled-midrank decimal sums
    "dedup_decontamination",   # r13: distinct-gram join, pure counts
    "sampling_fold_leakage",   # r13: md5 folds over CC labels
    "stats_bootstrap_ci",      # r13: hash-Poisson weights + round8 means
    "text_gram_novelty",       # r13: min-id gram ownership, pure counts
    "orders_cohort_ltv",       # r13: decimal cells + exact prefix sums
    "tpcds_q51_cumulative_join",  # r13: decimal cums + window fill
    "graph_link_prediction",   # r13: backbone top-k + exact ratios
    "similarity_mmr_rerank",   # r13: round6 rel/sims + id-tiebroken argmax
]


def _rows(df):
    def key(r):
        return tuple(
            (str(type(v)), str(v)) for v in r
        )
    return sorted([tuple(r) for r in df.collect()], key=key)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partitioning(spark, name):
    spec = harness.registry()[name]
    base = _rows(spec.fn(spark, SF))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = _rows(spec.fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again, f"{name}: result depends on shuffle partitioning"
