"""Deterministic sampling / splitting for training-data pipelines.

Everything here is hash-based, not RNG-based: ``rand()`` sampling gives a
different corpus every run and can't be reproduced by another engine,
which breaks dataset versioning and oracle checks. Hashing a stable key
gives the same sample on every run, on every engine, at any parallelism —
and membership is decided row-locally (a pure projection, no shuffle),
so it costs nothing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_long

#: Denominator for hash-rate bucketing (4 decimal digits of rate).
_RATE_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from the md5 of the key (+ salt).

    Different salts give independent samples from the same keys — e.g.
    one salt for the eval holdout, another for a 1% metrics sample.
    """
    return md5_long(F.concat(key.cast("string"), F.lit(f"|{salt}"))) % _RATE_BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic sample: keep rows whose key hashes below ``rate``.

    Same key -> same decision everywhere, so (a) reruns are identical,
    and (b) a document's duplicates (same key) get the same decision.
    NB: different salts give *independent* samples whose kept sets
    overlap (~rate1·rate2 of keys) — NOT disjoint sets. For disjoint
    (leak-proof) train/eval splits use ``train_val_test_split``, which
    carves non-overlapping bucket ranges out of a single hash.
    """
    bucket = int(rate * _RATE_BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt) < bucket)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Leak-proof three-way split: one hash decides membership, so a key
    can never appear in two splits (randomSplit cannot promise that
    across reruns or engines). Adds a ``split`` column."""
    b = hash_bucket(F.col(key_col), salt)
    val_hi = int(val_rate * _RATE_BUCKETS)
    test_hi = val_hi + int(test_rate * _RATE_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def stratified_resample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixture resampling: keep a different deterministic fraction
    of each group (e.g. downsample 'web' to 20%, keep 'books' whole) —
    the rate-based twin of ``per_group_cap`` for hitting a target corpus
    mixture when group sizes are known.

    One hash decides membership against a per-group threshold looked up
    from a literal map, so the whole operator is a row-local filter: no
    shuffle, no join, reproducible across engines and reruns. Rates are
    quantized to 1/10000.
    """
    b = hash_bucket(F.col(key_col), salt)
    threshold = F.lit(int(default_rate * _RATE_BUCKETS))
    for g, r in sorted(rates.items()):
        threshold = F.when(
            F.col(group_col) == g, F.lit(int(r * _RATE_BUCKETS))
        ).otherwise(threshold)
    return df.filter(b < threshold)


def per_group_cap(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by hash order (a
    deterministic reservoir): rank rows within the group by
    (hash(key), key) and keep rank <= n. Source-balancing for corpora
    where one domain would otherwise dominate. One shuffle on the group
    key; the hot-group state is a single counter per reducer."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
    max_groups: int = 100_000,
) -> DataFrame:
    """Temperature-based mixture resampling: flatten the group size
    distribution toward uniform with temperature ``alpha`` — the
    standard multilingual/domain-balancing scheme (sample groups with
    probability proportional to ``n^alpha``).

    Realized as per-group keep rates with NO upsampling, at the largest
    corpus size that respects the target mixture: ``r_g =
    (n_min / n_g) ** (1 - alpha)``. ``alpha=1`` keeps everything
    (natural mixture), ``alpha=0`` equalizes group counts, ``0.5`` is
    the common sqrt flattening. Rates derive from one column-pruned
    count aggregation (a bounded per-group collect — group cardinality
    is small by construction); membership is then the same row-local
    deterministic hash filter ``stratified_resample`` uses — no shuffle
    or join in the data path, reproducible across engines and reruns.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # the per-group collect is the operator's one driver-side step; it
    # is only valid for corpus-mixture cardinalities (languages,
    # domains, sources). Enforce that contract instead of assuming it —
    # a high-cardinality group column would silently turn this into an
    # O(groups) driver materialization at 100 TB — by fetching at most
    # max_groups+1 aggregated rows (the limit caps the collect itself).
    rows = df.groupBy(group_col).count().limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"temperature_resample saw more than max_groups={max_groups} "
            f"distinct {group_col!r} values — the per-group rate table "
            "is collected driver-side and is meant for corpus-mixture "
            "cardinalities; aggregate the group column first or raise "
            "max_groups explicitly"
        )
    counts = {r[0]: r[1] for r in rows}
    if not counts:
        return df
    n_min = float(min(counts.values()))
    rates = {
        g: (n_min / float(n)) ** (1.0 - alpha) for g, n in counts.items()
    }
    return stratified_resample(
        df, group_col, rates, key_col, default_rate=1.0, salt=salt
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, salt: str = "wsample"
) -> DataFrame:
    """Per-row weighted sampling: keep a row with probability equal to
    its own ``weight`` expression (clamped to [0, 1]) — quality-score-
    proportional corpus selection (keep high-quality docs always, noisy
    docs occasionally), the row-level generalization of the per-group
    rates in :func:`stratified_resample`.

    Membership stays hash-deterministic and row-local: keep iff
    ``hash_bucket(key) < floor(weight * 10000)``, so reruns, engines,
    and a key's duplicates all agree; no shuffle, no RNG, fuses into the
    scan. Weight resolution is 1/10000 (same bucket grid as every other
    sampler here).
    """
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight.cast("double")))
    return df.filter(
        hash_bucket(F.col(key_col), salt)
        < F.floor(w * F.lit(_RATE_BUCKETS)).cast("long")
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    n_tokens_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    salt: str = "budget",
) -> DataFrame:
    """Data-recipe mixing under per-source TOKEN budgets: for each
    source, keep the hash-ordered prefix of documents whose cumulative
    token count stays within that source's budget.

    This is the materialization step of a training-data recipe ("200 B
    tokens web, 50 B code, 10 B reference"): deterministic (md5 order,
    key tie-break — same corpus every run on any engine/parallelism),
    unbiased within source (hash order is arrival-order-independent),
    and exact on the budget boundary (a document that would cross the
    budget is dropped, never truncated mid-document).

    One hash exchange per the window partition (source); the running
    sum is integer-exact. Sources not in ``budgets`` get
    ``default_budget`` (0 = dropped entirely).
    """
    order = md5_long(
        F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}"))
    )
    budget = F.lit(default_budget).cast("long")
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(b).cast("long")).otherwise(
            budget
        )
    w = (
        Window.partitionBy(source_col)
        .orderBy(order, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(n_tokens_col).cast("long")).over(w)
    return (
        df.withColumn("cum_tokens", cum)
        .withColumn("_budget", budget)
        .filter(F.col("cum_tokens") <= F.col("_budget"))
        .drop("_budget")
    )


def sampled_estimate(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_col: str,
    rate: float = 0.1,
    salt: str = "est",
) -> DataFrame:
    """Horvitz-Thompson estimation from a deterministic hash-Bernoulli
    sample: aggregate the ``rate`` sample, scale by 1/rate, and report
    both the estimates and their relative error against the exact
    aggregates — the "answer from 1% of the bytes" pattern that turns a
    100 TB sweep into a 1 TB one, with the error measured in-engine.

    Because membership is a hash (not RNG), the estimate is a pure
    deterministic function of the data: reruns and other engines get
    the SAME estimate, so the error columns are exact-checkable, not
    just bounded. Sums are DECIMAL-fenced before the 1/rate scaling.

    Output per group: ``n_exact, n_est, sum_exact, sum_est,
    rel_err_n, rel_err_sum`` (estimates and errors rounded to 6).
    """
    inv = 1.0 / rate
    s = hash_sample(df, key_col, rate, salt)
    est = s.groupBy(group_col).agg(
        (F.count(F.lit(1)) * F.lit(inv)).alias("_ne"),
        (
            F.sum(F.col(value_col).cast("decimal(38,12)")).cast("double")
            * F.lit(inv)
        ).alias("_se"),
    )
    exact = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.sum(F.col(value_col).cast("decimal(38,12)"))
        .cast("double")
        .alias("_sx"),
    )
    from ..functions.trino import trino_round

    rel = lambda e, x: F.when(  # noqa: E731
        x != 0, F.abs(e - x) / F.abs(x)
    ).otherwise(F.lit(None).cast("double"))
    return exact.join(est, group_col, "left").select(
        group_col,
        "n_exact",
        trino_round(F.coalesce(F.col("_ne"), F.lit(0.0)), 6).alias("n_est"),
        trino_round(F.col("_sx"), 6).alias("sum_exact"),
        trino_round(F.coalesce(F.col("_se"), F.lit(0.0)), 6).alias("sum_est"),
        trino_round(
            rel(F.coalesce(F.col("_ne"), F.lit(0.0)), F.col("n_exact").cast("double")), 6
        ).alias("rel_err_n"),
        trino_round(
            rel(F.coalesce(F.col("_se"), F.lit(0.0)), F.col("_sx")), 6
        ).alias("rel_err_sum"),
    )


def dsir_importance(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): score every
    document by how much its hashed token features look like a TARGET
    subcorpus relative to the RAW corpus, so a selection pass can keep
    the raw documents most target-like.

    Distributed shape (the reason DSIR scales where a classifier
    doesn't): the feature space is HASH-BUCKETED to ``n_buckets``
    (md5(token) mod n_buckets), so the learned "model" is one bounded
    table of per-bucket log-ratios — never vocabulary-sized, never
    driver-bound:

    1. one explode + groupBy(bucket) computes raw and target counts in
       a single map-side-combined shuffle (target membership is a
       row-local predicate, counted conditionally — the corpus is
       scanned ONCE);
    2. bucket log-ratios ``ln(p_target(f) / p_raw(f))`` (add-alpha
       smoothed, round8 — the repo's cross-engine float fence for
       transcendentals) form a <= n_buckets-row table that BROADCASTS
       back onto the token stream;
    3. per-document weight = the decimal-fenced sum of its tokens'
       round8 log-ratios (exact, associative, partition-order-free),
       normalized per token for a length-independent score.

    Returns one row per document: ``doc_id, n_tokens, dsir_weight``
    (total nats, round6) and ``dsir_per_token`` (round6). Downstream
    selection is a plain top-k / threshold / ``weighted_sample`` over
    ``dsir_weight``.
    """
    from ..functions.trino import trino_round
    from .text import tokens

    toks = df.select(
        F.col(id_col),
        target.alias("_is_target"),
        F.explode(tokens(text_col)).alias("_tok"),
    ).select(
        id_col, "_is_target", (md5_long(F.col("_tok")) % n_buckets).alias("_b")
    )
    # fence the <= n_buckets-row count table: its two consumers (the
    # 1-row totals build and the ratio projection) and the per-doc join's
    # replanning otherwise re-run the tokenize+explode pass three times
    counts = toks.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("_ct"),
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("_cr").alias("_tr"), F.sum("_ct").alias("_tt")
    )
    denom_t = F.col("_tt").cast("double") + F.lit(alpha * n_buckets)
    denom_r = F.col("_tr").cast("double") + F.lit(alpha * n_buckets)
    ratios = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                F.log(
                    ((F.col("_ct").cast("double") + F.lit(alpha)) / denom_t)
                    / ((F.col("_cr").cast("double") + F.lit(alpha)) / denom_r)
                ),
                8,
            ).alias("_w"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(ratios), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("_w").cast("decimal(28,8)")).cast("double").alias("_sum"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        trino_round(F.col("_sum"), 6).alias("dsir_weight"),
        trino_round(F.col("_sum") / F.col("n_tokens").cast("double"), 6).alias(
            "dsir_per_token"
        ),
    )


def dsir_select_topk(
    weights: DataFrame,
    group_col: str,
    k: int,
    weight_col: str = "dsir_per_token",
    id_col: str = "doc_id",
) -> DataFrame:
    """Selection stage over :func:`dsir_importance`: keep the ``k`` most
    target-like documents per group (deterministic ties: lowest id
    wins). One window shuffle on the group key — the standard stratified
    top-k; at 100 TB pre-aggregate nothing, the window prunes to k rows
    per group before any collect-side materialization."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc(weight_col), F.col(id_col)
    )
    return (
        weights.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture planner: given target mixture ``weights`` per
    group and a total token ``budget``, compute per-group availability
    and the sampling rate / epoch count that realizes the mixture —
    the bookkeeping pass before a DoReMi-style weighted rebuild of a
    corpus.

    One grouped aggregate over the corpus (token counts are row-local
    ``size(split(...))`` — no explode, no token-level shuffle), then
    pure arithmetic against the broadcast literal weight table. Groups
    without a weight get weight 0. ``sample_rate`` caps at 1.0;
    ``epochs`` > 1 means the plan must repeat data to honor the
    mixture (the overflow a planner exists to surface).

    Output per group: ``available_tokens, n_docs, target_share,
    planned_tokens, sample_rate, epochs`` (round6).
    """
    from ..functions.trino import trino_round
    from .text import token_count

    total_w = sum(weights.values())
    share = F.coalesce(
        *[
            F.when(F.col(group_col) == g, F.lit(w / total_w))
            for g, w in sorted(weights.items())
        ],
        F.lit(0.0),
    )
    avail = df.groupBy(group_col).agg(
        F.sum(token_count(text_col)).cast("bigint").alias("available_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    planned = F.col("target_share") * F.lit(float(budget_tokens))
    # try_divide: a group whose documents are all empty has 0 available
    # tokens — its rate/epochs are NULL (unplannable), not an ANSI error
    ratio = F.try_divide(planned, F.col("available_tokens").cast("double"))
    return (
        avail.withColumn("target_share", trino_round(share, 6))
        .select(
            group_col,
            "available_tokens",
            "n_docs",
            "target_share",
            trino_round(planned, 6).alias("planned_tokens"),
            trino_round(F.least(ratio, F.lit(1.0)), 6).alias("sample_rate"),
            trino_round(ratio, 6).alias("epochs"),
        )
        .orderBy(group_col)
    )


def weighted_reservoir_per_key(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    weight_col: str,
    salt: str = "wres",
) -> DataFrame:
    """Per-key-budget weighted reservoir sampling: keep exactly ``k``
    rows per ``group_col`` value, with inclusion biased toward heavy
    ``weight_col`` rows — the "5 documents per language, preferring
    long ones" primitive of corpus curation.

    Deterministic PRIORITY-ORDER selection (the w/u priority key of
    Duffield-Lund-Thorup priority sampling, here per group): draw a
    pseudo-random u per row (the md5 hash of the key, replacing
    rand()), set priority = u / weight, keep the k SMALLEST per group
    — equivalently the k largest w/u. NOTE this is NOT the
    Efraimidis-Spirakis u^(1/w) order statistic — the inclusion
    probabilities differ (priority order over-favors heavy rows
    relative to A-ES's p_i ∝ exact weighted-without-replacement law);
    both are standard weighted-selection laws, and the priority form
    is chosen here because u/w is ONE IEEE double division of two
    exact integers, which every engine rounds identically (division
    is correctly-rounded by IEEE 754; the pow/ln that u^(1/w) needs
    are not), so the selected set is bit-reproducible across reruns,
    engines, and parallelism — same reason every sampler here hashes
    instead of calling rand(). For the A-ES law proper, exponentiate:
    keep the k largest hash^(weight_scale/w) — at the cost of
    engine-dependent pow rounding on ties.

    Weights must be > 0 (non-positive-weight rows are dropped — zero
    weight has no defined priority). One shuffle on the group key; the per-group sort is
    a rank-k windowed top-k, never a global sort.

    Output: input columns + ``priority`` (the selection key, so the
    sample is auditable).
    """
    h = md5_long(F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}")))
    pri = h.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(pri.asc(), F.col(key_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", pri)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def priority_sample_estimate(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "psamp",
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007): a k-row sample
    that estimates the TOTAL weight of the table with near-optimal
    variance — "how many tokens does this 100 TB corpus hold" answered
    from k rows plus one threshold.

    Per row: u = (hash+1)/2^60 in (0,1] (md5-derived, deterministic),
    priority q = w/u. The k highest-priority rows form the sample;
    tau = the (k+1)-th priority; each sampled row estimates its own
    weight as max(w, tau) and the sum of those is an unbiased estimate
    of total weight (conditioned on tau, P[row sampled] = min(1, w/tau),
    and max(w,tau) = w / P[sampled] — Horvitz-Thompson with a
    data-driven threshold). Top-(k+1) selection is TakeOrdered (no
    global sort); the arithmetic is hash-exact divisions, so the
    estimate itself is engine-reproducible and exact-checkable, not
    just bounded.

    Output (one row): ``k, tau, est_total, true_total, rel_err``
    (rounded to 6; DECIMAL-fenced sums).
    """
    from ..functions.trino import trino_round

    h = md5_long(F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    q = F.col(weight_col).cast("double") / u
    ranked = (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(key_col), F.col(weight_col).cast("double").alias("_w"), q.alias("_q"))
        .orderBy(F.desc("_q"), F.col(key_col))
        .limit(k + 1)
    )
    wk = Window.orderBy(F.desc("_q"), F.col(key_col))  # k+1 rows: one tiny task
    top = ranked.withColumn("_rk", F.row_number().over(wk))
    tau = top.filter(F.col("_rk") == k + 1).select(F.col("_q").alias("_tau"))
    est = (
        top.filter(F.col("_rk") <= k)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.max("_tau").alias("tau"),
            F.sum(
                F.greatest(F.col("_w"), F.col("_tau")).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("est_total"),
        )
    )
    true_tot = df.filter(F.col(weight_col) > 0).agg(
        F.sum(F.col(weight_col).cast("decimal(38,12)")).cast("double").alias("true_total")
    )
    return est.crossJoin(F.broadcast(true_tot)).select(
        F.lit(k).cast("bigint").alias("k"),
        trino_round(F.col("tau"), 6).alias("tau"),
        trino_round(F.col("est_total"), 6).alias("est_total"),
        trino_round(F.col("true_total"), 6).alias("true_total"),
        trino_round(
            F.abs(F.col("est_total") - F.col("true_total")) / F.col("true_total"), 6
        ).alias("rel_err"),
    )


def fold_leakage_audit(
    ids: DataFrame,
    clusters: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    salt: str = "fold",
) -> DataFrame:
    """Cross-validation fold audit for near-duplicate corpora: a naive
    per-document hash split puts members of one near-dup cluster into
    DIFFERENT folds, so "held-out" validation data is a paraphrase of
    training data — silent leakage that inflates every fold's score.
    Given the doc table and a ``(id, cluster)`` assignment (the output
    of :func:`~..operators.dedup.connected_components`; docs absent
    from it are singletons), this audits the k-fold md5 split and
    quantifies the repair.

    Folds are ``md5(id|salt) % k`` (deterministic, engine-exact — the
    repo's standard hash split); the CLUSTER-AWARE fold of a doc is
    the fold of its cluster id (= the component's min id, so the
    repair needs no second pass: hashing the label every member
    already carries). A multi-doc cluster is LEAKY when its members'
    naive folds differ; ``n_docs_reassigned`` counts docs whose naive
    fold differs from their cluster fold — the exact size of the
    repair diff.

    Shape: one left join docs->clusters on id, one groupBy cluster
    (bounded by doc count), two single-row aggregates crossJoined by
    broadcast — no windows, no collects, linear at any scale.

    Output (one row): ``n_folds, n_docs, n_clusters, n_multi,
    n_leaky, n_docs_in_leaky, leak_rate, n_docs_reassigned``
    (leak_rate = leaky / multi-doc clusters, round6; 0.0 when the
    corpus has no multi-doc clusters).
    """
    from ..functions.trino import trino_round

    def fold(col):
        return (
            md5_long(F.concat(col.cast("string"), F.lit(f"|{salt}"))) % k
        ).cast("int")

    m = (
        ids.select(F.col(id_col).alias("_id"))
        .join(clusters, F.col("_id") == clusters["id"], "left")
        .select(
            F.col("_id"),
            F.coalesce(clusters["cluster"], F.col("_id")).alias("_cl"),
        )
        .select(
            "_id",
            "_cl",
            fold(F.col("_id")).alias("_f"),
            fold(F.col("_cl")).alias("_cf"),
        )
    )
    cs = m.groupBy("_cl").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("_f").alias("nf"),
    )
    multi = F.col("sz") > 1
    leaky = multi & (F.col("nf") > 1)
    agg = cs.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("sz")).alias("n_docs"),
        F.sum(multi.cast("int")).alias("n_multi"),
        F.sum(leaky.cast("int")).alias("n_leaky"),
        F.sum(F.when(leaky, F.col("sz")).otherwise(0)).alias("n_docs_in_leaky"),
    )
    rea = m.agg(
        F.sum((F.col("_f") != F.col("_cf")).cast("int")).alias("n_docs_reassigned")
    )
    return agg.crossJoin(F.broadcast(rea)).select(
        F.lit(k).cast("int").alias("n_folds"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        F.col("n_multi").cast("bigint").alias("n_multi"),
        F.col("n_leaky").cast("bigint").alias("n_leaky"),
        F.col("n_docs_in_leaky").cast("bigint").alias("n_docs_in_leaky"),
        F.coalesce(
            trino_round(
                F.col("n_leaky").cast("double")
                / F.nullif(F.col("n_multi").cast("double"), F.lit(0.0)),
                6,
            ),
            F.lit(0.0),
        ).alias("leak_rate"),
        F.col("n_docs_reassigned").cast("bigint").alias("n_docs_reassigned"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
) -> DataFrame:
    """Neyman-optimal allocation of a sampling budget across strata
    (Neyman 1934, public): sample stratum h in proportion to
    ``N_h · σ_h`` — the variance-minimizing design for estimating the
    population mean of ``value_col``, and the planning step a
    corpus-curation pipeline runs before drawing a stratified sample
    (the execution step is ``stratified_resample``). Reported next to
    the naive proportional allocation so the variance win is visible.

    One grouped pass computes per-stratum counts and decimal-fenced
    population SDs (round8 at the SD, cast-fenced moments); weights, shares, and allocations are
    fixed-order IEEE arithmetic over the strata-sized table with
    half-away rounding, each clamped to the stratum size. Rounded
    allocations can differ from ``budget`` by a few units (no
    largest-remainder pass — documented, deterministic).

    Output per stratum: ``{stratum_col}, n_rows, sd, weight_share,
    neyman_alloc, proportional_alloc`` (round6), ordered by stratum.
    """
    from ..functions.trino import trino_round

    v = F.col(value_col).cast("double")

    def dsum(c):
        return F.sum(c.cast("decimal(38,8)")).cast("double")

    cnt = F.count(F.lit(1)).cast("double")
    m = dsum(v) / cnt
    per = df.filter(v.isNotNull()).groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        trino_round(
            F.sqrt(
                F.greatest(
                    # direct decimal cast, NOT round8: v*v can exceed
                    # trino_round's |x|*1e8 < 2^63 floor domain; the
                    # double->decimal(38,8) cast quantizes identically
                    # on both engines (embedding_standardize precedent)
                    dsum(v * v) / cnt - m * m,
                    F.lit(0.0),
                )
            ),
            8,
        ).alias("_sd"),
    )
    w = trino_round(F.col("n_rows").cast("double") * F.col("_sd"), 8)
    tot = per.agg(
        dsum(w).alias("_tw"),
        F.sum("n_rows").cast("double").alias("_tn"),
    )
    alloc = F.least(
        F.floor(
            F.lit(float(budget)) * w / F.col("_tw") + F.lit(0.5)
        ).cast("bigint"),
        F.col("n_rows"),
    )
    prop = F.least(
        F.floor(
            F.lit(float(budget))
            * F.col("n_rows").cast("double")
            / F.col("_tn")
            + F.lit(0.5)
        ).cast("bigint"),
        F.col("n_rows"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            stratum_col,
            "n_rows",
            trino_round(F.col("_sd"), 6).alias("sd"),
            trino_round(F.try_divide(w, F.col("_tw")), 6).alias(
                "weight_share"
            ),
            alloc.alias("neyman_alloc"),
            prop.alias("proportional_alloc"),
        )
        .orderBy(stratum_col)
    )
