"""Behavioral-analytics / statistical-test query wave (split from
harness/scale.py, r15): chi-squared and A/B lift tests, RFM
segmentation, Markov transitions, attribution, CUSUM changepoints,
cluster purge, normalization audits, corpus divergences, funnel
latency, t-closeness, inter-arrival stats, tokenizer fertility,
DAU/WAU stickiness, weighted median, and nth-value sessions.

Every query pairs a Spark-first implementation (operators/*) with a
DuckDB-runnable oracle twin; column names and rounding are aligned on
both sides per the driver's hash-compare contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.testdata import load_table, load_table_parallel
from . import register
from .llm import MD5L, TOKS, _NGRAM_GRAMS_CTE, _NGRAM_JACCARD, _cluster_pairs

# ---------------------------------------------------------------------------
# Round-11 wave: distributed statistical tests / segmentation.
# ---------------------------------------------------------------------------

_AB_HASH = MD5L.format(x="CAST(user_id AS VARCHAR) || '|ab'")


@register(
    "stats_chi_squared",
    """
    WITH cells AS (
        SELECT event_type, day(ts) AS m, CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
    c AS (SELECT m, sum(o) AS ct FROM cells GROUP BY 1),
    t AS (SELECT sum(o) AS n, count(DISTINCT event_type) AS nr,
                 count(DISTINCT m) AS nc
          FROM cells),
    grid AS (
        SELECT r.event_type, r.rt, c.m, c.ct, coalesce(cells.o, 0) AS o
        FROM r CROSS JOIN c
        LEFT JOIN cells USING (event_type, m)
    ),
    contrib AS (
        SELECT round((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 8) AS x,
               n, nr, nc
        FROM grid CROSS JOIN t
    )
    SELECT round(CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE), 6) AS chi2,
           CAST((max(nr) - 1) * (max(nc) - 1) AS BIGINT) AS dof,
           round(sqrt(CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE)
                      / (CAST(max(n) AS DOUBLE)
                         * CAST(least(max(nr) - 1, max(nc) - 1) AS DOUBLE))),
                 6) AS cramers_v,
           CAST(max(n) AS BIGINT) AS n
    FROM contrib
    """,
    doc="Chi-squared independence test (event_type x day-of-month) with "
    "Cramér's V: contingency cells from ONE groupBy, margins as "
    "aggregates of the cell table broadcast back, per-cell "
    "contributions round8 then decimal-summed (partition-order-free), "
    "sqrt correctly rounded by IEEE — the whole statistic is "
    "bit-stable cross-engine. Cell table is category-cardinality-"
    "bounded, so at 100 TB the only event-scale work is the first "
    "groupBy (operators/stats.py::chi_squared).",
)
def stats_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofmonth("ts").alias("m")
    )
    return stats.chi_squared(ev, "event_type", "m")


@register(
    "stats_ab_lift",
    f"""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    armed AS (
        SELECT CAST(({_AB_HASH}) % 2 AS INTEGER) AS arm, conv FROM per_user
    ),
    arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
        FROM armed GROUP BY 1
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
               max(CASE WHEN arm = 0 THEN c END) AS conv_a,
               max(CASE WHEN arm = 1 THEN n END) AS n_b,
               max(CASE WHEN arm = 1 THEN c END) AS conv_b
        FROM arms
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS lift,
           round((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                 / sqrt((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (1.0 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        / CAST(n_a AS DOUBLE)
                        + (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        * (1.0 - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        / CAST(n_b AS DOUBLE)), 6) AS z_score
    FROM wide
    """,
    doc="Two-proportion A/B z-test on deterministic hash-split arms "
    "(md5 parity of user_id — reproducible, no RNG): per-user "
    "purchase-conversion flags, arm aggregates, unpooled-SE z-score. "
    "One user-level aggregate + one 2-row aggregate; division and "
    "sqrt on identical doubles are bit-stable cross-engine "
    "(operators/stats.py::ab_lift).",
)
def stats_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.ab_lift(ev, "user_id", F.col("event_type") == "purchase")


@register(
    "events_rfm_segmentation",
    """
    WITH per_user AS (
        SELECT user_id AS u, max(ts) AS last_ts,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS mon
        FROM events GROUP BY 1
    ),
    g AS (SELECT max(ts) AS gmax FROM events),
    scored AS (
        SELECT u, date_diff('day', CAST(last_ts AS DATE), CAST(gmax AS DATE))
                   AS rec,
               freq, mon
        FROM per_user CROSS JOIN g
    ),
    tiled AS (
        SELECT u, mon,
               CAST(ntile(4) OVER (ORDER BY rec, u) AS VARCHAR) || '-' ||
               CAST(ntile(4) OVER (ORDER BY freq DESC, u) AS VARCHAR) || '-' ||
               CAST(ntile(4) OVER (ORDER BY mon DESC, u) AS VARCHAR) AS segment
        FROM scored
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(mon AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS avg_monetary
    FROM tiled GROUP BY 1 ORDER BY 1
    """,
    doc="RFM segmentation: quartile scores on recency/frequency/"
    "monetary per user, user counts + fenced mean spend per R-F-M "
    "segment. The ntile windows run over the USER-level aggregate "
    "(users << events — the same bounded-cardinality global-window "
    "precedent as text_zipf_fit's vocab ranking) with user-id "
    "tiebreaks, so bucket assignment is integer-exact on both "
    "engines (operators/stats.py::rfm_segments).",
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.rfm_segments(ev, "user_id", "ts", "value")


@register(
    "events_markov_transitions",
    """
    WITH pairs AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    counts AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n_transitions
        FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
    )
    SELECT cur, nxt, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / CAST(sum(n_transitions) OVER (PARTITION BY cur) AS DOUBLE),
                 6) AS p
    FROM counts ORDER BY cur, nxt
    """,
    doc="First-order Markov transition matrix over per-user event "
    "streams: P(next event type | current), with event_id breaking "
    "same-timestamp ties so the sequence is engine-identical. One "
    "window shuffle on user, a |types|^2-bounded pair table, row "
    "totals as a window over that table (no second scan); "
    "probabilities are exact integer ratios "
    "(operators/sessionize.py::markov_transitions).",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize.markov_transitions(
        ev, "user_id", "event_type", "ts", "event_id"
    )


@register(
    "events_attribution_last_touch",
    """
    WITH carried AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN struct_pack(t := ts, ch := event_type)
                          END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lt,
               ts
        FROM events
    ),
    conv AS (
        SELECT CASE WHEN lt IS NOT NULL
                     AND date_diff('microsecond', lt.t, ts)
                         <= CAST(604800000000 AS BIGINT)
                    THEN lt.ch ELSE 'direct' END AS channel,
               value
        FROM carried WHERE event_type = 'purchase'
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
           round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS total_value
    FROM conv GROUP BY 1 ORDER BY 1
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
    "recent preceding non-purchase event within 7 days ('direct' when "
    "none) — ONE user-keyed window with an ignoreNulls last_value "
    "carry, no self-join, no per-conversion scan; same-timestamp "
    "order pinned by event_id, window arithmetic microsecond-exact "
    "on both engines. Output is channel-bounded "
    "(operators/sessionize.py::attribution_last_touch).",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize.attribution_last_touch(
        ev, "user_id", "event_type", "ts", "event_id"
    )


@register(
    "timeseries_cusum_changepoint",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(sum(CAST(cnt AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS m,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM daily GROUP BY 1
    ),
    cus AS (
        SELECT d.event_type, d.b, s.n_buckets,
               CAST(sum(CAST(round(CAST(d.cnt AS DOUBLE) - s.m, 8)
                             AS DECIMAL(28,8)))
                    OVER (PARTITION BY d.event_type ORDER BY d.b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS cusum
        FROM daily d JOIN stats s USING (event_type)
    ),
    ranked AS (
        SELECT event_type, n_buckets, b, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(abs(cusum), 6) DESC, b)
                   AS rn,
               max(round(cusum, 6)) OVER (PARTITION BY event_type)
                   - min(round(cusum, 6)) OVER (PARTITION BY event_type)
                   AS rng
        FROM cus
    )
    SELECT event_type, n_buckets, CAST(b AS TIMESTAMP) AS peak_bucket,
           round(cusum, 6) AS peak_cusum, round(rng, 6) AS cusum_range
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
    doc="CUSUM change-point detection on daily event counts per type: "
    "cumulative deviation from the per-type mean, peak |CUSUM| bucket "
    "elected with earliest-bucket tiebreak. Everything after the "
    "first groupBy runs at bucket cardinality; deviations are round8 "
    "decimal-summed in bucket order so the running sum — and thus "
    "the peak — is bit-identical on any engine "
    "(operators/timeseries.py::cusum_changepoint).",
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = load_table(spark, sf_dir, "events")
    return timeseries.cusum_changepoint(ev, "event_type", "ts")


@register(
    "dedup_cluster_purge",
    f"""
    WITH RECURSIVE {_NGRAM_GRAMS_CTE},
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM g a
        JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE {_NGRAM_JACCARD} >= 0.2
    ),
    e AS (
        SELECT doc_a AS src, doc_b AS dst FROM p
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM p
    ),
    reach AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
    ),
    cc AS (
        SELECT src AS id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src
    ),
    assigned AS (
        SELECT d.doc_id, d.source, coalesce(cc.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
    ),
    purged AS (
        SELECT DISTINCT cluster FROM assigned WHERE doc_id % 97 = 0
    )
    SELECT a.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p.cluster IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purged
    FROM assigned a LEFT JOIN purged p ON a.cluster = p.cluster
    GROUP BY a.source ORDER BY a.source
    """,
    doc="GDPR-style cluster purge: a takedown of seed documents "
    "(doc_id % 97 = 0 stands in for the request list) must also remove "
    "their near-duplicate cluster members, or the content survives as "
    "a paraphrase. Cluster assignment reuses the session-cached "
    "n-gram-Jaccard pair artifact + min-label CC (docs outside the "
    "pair graph are their own singleton cluster via coalesce); the "
    "purged-cluster set is a DISTINCT projection joined back "
    "broadcast-side. Output: per-source doc and purge counts "
    "(operators/dedup.py::connected_components).",
    prepare=_cluster_pairs,
)
def dedup_cluster_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain load (r19 A/B: 0.64 vs 0.76 s — 2-column projection feeding
    # broadcast joins; nothing CPU-bound on the scan side)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    cc = dedup.connected_components(
        _cluster_pairs(spark, sf_dir), pointer_jumping=False
    )
    assigned = (
        docs.join(cc, docs["doc_id"] == cc["id"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("cluster"), F.col("doc_id")).alias("_cl"),
        )
    )
    purged = (
        assigned.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("_cl").alias("_pcl"))
        .distinct()
    )
    return (
        assigned.join(F.broadcast(purged), assigned["_cl"] == F.col("_pcl"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("_pcl").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_purged"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-11 wave: normalization audit + corpus-distribution divergences.
# ---------------------------------------------------------------------------

from ..functions.trino import trino_round  # noqa: E402


@register(
    "embedding_standardize",
    """
    WITH v AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    x AS (
        SELECT unnest(list_transform(generate_series(1, len(e)),
                                     i -> {'dim': i - 1, 'val': e[i]}),
                      recursive := true)
        FROM v
    ),
    stats AS (
        SELECT dim,
               CAST(sum(CAST(val AS DECIMAL(28,8))) AS DOUBLE)
                   / count(val) AS m,
               sqrt(CAST(sum(CAST(val * val AS DECIMAL(28,8))) AS DOUBLE)
                    / count(val)
                    - (CAST(sum(CAST(val AS DECIMAL(28,8))) AS DOUBLE)
                       / count(val))
                      * (CAST(sum(CAST(val AS DECIMAL(28,8))) AS DOUBLE)
                         / count(val))) AS s,
               CAST(count(val) AS BIGINT) AS n
        FROM x GROUP BY dim
    ),
    z AS (
        SELECT x.dim, round((val - m) / s, 8) AS zv, n
        FROM x JOIN stats USING (dim)
    )
    SELECT dim, n,
           round(CAST(sum(CAST(zv AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS mean_z,
           round(min(zv), 6) AS min_z,
           round(max(zv), 6) AS max_z
    FROM z GROUP BY dim, n ORDER BY dim
    """,
    doc="Embedding standardization audit: z-score every dimension "
    "against its corpus mean/std (population variance via fenced "
    "E[x^2]-mean^2, IEEE-exact sqrt) and verify the result per dim "
    "(mean_z ~ 0, extreme z values for outlier triage). The dim-stats "
    "table (d rows) broadcasts back onto the exploded stream; z "
    "values are round8 then decimal-summed. The normalization "
    "pre-pass every embedding pipeline runs before whitening/PCA.",
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table_parallel(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("dim", "val")
    )
    dsum = lambda c: F.sum(c.cast("decimal(28,8)")).cast("double")  # noqa: E731
    stats = x.groupBy("dim").agg(
        (dsum(F.col("val")) / F.count("val")).alias("_m"),
        F.sqrt(
            dsum(F.col("val") * F.col("val")) / F.count("val")
            - (dsum(F.col("val")) / F.count("val"))
            * (dsum(F.col("val")) / F.count("val"))
        ).alias("_s"),
        F.count("val").cast("bigint").alias("n"),
    )
    z = x.join(F.broadcast(stats), "dim").select(
        "dim",
        "n",
        F.round((F.col("val") - F.col("_m")) / F.col("_s"), 8).alias("_z"),
    )
    return (
        z.groupBy("dim", "n")
        .agg(
            trino_round(dsum(F.col("_z")) / F.col("n").cast("double"), 6).alias(
                "mean_z"
            ),
            trino_round(F.min("_z"), 6).alias("min_z"),
            trino_round(F.max("_z"), 6).alias("max_z"),
        )
        .orderBy("dim")
    )


@register(
    "corpus_kl_to_global",
    f"""
    WITH t AS (
        SELECT source, unnest({TOKS}) AS token FROM documents
    ),
    sc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    ),
    st AS (SELECT source, sum(c) AS ns FROM sc GROUP BY 1),
    gc AS (SELECT token, sum(c) AS g FROM sc GROUP BY 1),
    gt AS (SELECT sum(c) AS ng FROM sc),
    contrib AS (
        SELECT sc.source,
               round((CAST(sc.c AS DOUBLE) / CAST(st.ns AS DOUBLE))
                     * ln((CAST(sc.c AS DOUBLE) / CAST(st.ns AS DOUBLE))
                          / (CAST(gc.g AS DOUBLE) / CAST(gt.ng AS DOUBLE))),
                     8) AS x
        FROM sc JOIN st USING (source) JOIN gc USING (token) CROSS JOIN gt
    )
    SELECT source,
           round(CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE), 6)
               AS kl_nats
    FROM contrib GROUP BY source ORDER BY source
    """,
    doc="Per-source KL divergence to the global token distribution — "
    "the distribution-shift score that flags a source whose language "
    "no longer matches the corpus (mixture drift, scraping bugs). "
    "One token-level count shuffle; the global vocab counts join the "
    "per-source counts ON THE TOKEN KEY (vocab-sized, not corpus-"
    "sized) and totals broadcast; per-term contributions are round8 "
    "decimal-summed. Source terms are a subset of global terms, so "
    "q > 0 always and the sum is finite.",
)
def corpus_kl_to_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokens("text")).alias("token"))
    # fence the (source, token) counts: four consumers (source margin,
    # token margin, grand total, contribution join) otherwise each
    # replan the tokenize+explode+aggregate subtree
    from ..operators.fencing import fence_if_small

    sc = fence_if_small(
        t.groupBy("source", "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
    )
    st = sc.groupBy("source").agg(F.sum("_c").alias("_ns"))
    gc = sc.groupBy("token").agg(F.sum("_c").alias("_g"))
    gt = sc.agg(F.sum("_c").alias("_ng"))
    ps = F.col("_c").cast("double") / F.col("_ns").cast("double")
    q = F.col("_g").cast("double") / F.col("_ng").cast("double")
    contrib = (
        sc.join(F.broadcast(st), "source")
        .join(gc, "token")
        .crossJoin(F.broadcast(gt))
        .select("source", F.round(ps * F.log(ps / q), 8).alias("_x"))
    )
    return (
        contrib.groupBy("source")
        .agg(
            trino_round(
                F.sum(F.col("_x").cast("decimal(28,8)")).cast("double"), 6
            ).alias("kl_nats")
        )
        .orderBy("source")
    )


_LO_A = 0.01  # per-term Dirichlet prior


@register(
    "text_log_odds_terms",
    f"""
    WITH t AS (
        SELECT source, unnest({TOKS}) AS token FROM documents
    ),
    sc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS y
        FROM t GROUP BY 1, 2
    ),
    st AS (SELECT source, sum(y) AS ns FROM sc GROUP BY 1),
    gc AS (SELECT token, sum(y) AS g FROM sc GROUP BY 1),
    gt AS (SELECT sum(g) AS n, count(*) AS vocab FROM gc),
    z AS (
        SELECT sc.source, sc.token,
               round((ln((CAST(sc.y AS DOUBLE) + {_LO_A})
                         / (CAST(st.ns AS DOUBLE) + {_LO_A} * vocab
                            - CAST(sc.y AS DOUBLE) - {_LO_A}))
                      - ln((CAST(gc.g - sc.y AS DOUBLE) + {_LO_A})
                           / (CAST(gt.n - st.ns AS DOUBLE) + {_LO_A} * vocab
                              - CAST(gc.g - sc.y AS DOUBLE) - {_LO_A})))
                     / sqrt(1.0 / (CAST(sc.y AS DOUBLE) + {_LO_A})
                            + 1.0 / (CAST(gc.g - sc.y AS DOUBLE) + {_LO_A})),
                     6) AS zscore
        FROM sc JOIN st USING (source) JOIN gc USING (token) CROSS JOIN gt
    ),
    ranked AS (
        SELECT source, token, zscore,
               row_number() OVER (PARTITION BY source
                                  ORDER BY zscore DESC, token) AS rn
        FROM z
    )
    SELECT source, token, zscore FROM ranked WHERE rn <= 3
    ORDER BY source, zscore DESC, token
    """,
    doc="Informative terms per source by Dirichlet-prior log-odds z-score "
    "(Monroe et al. 2008, 'Fightin' Words' — the comparative-corpus "
    "alternative to tf-idf that accounts for variance on rare terms): "
    "source-vs-rest odds from the SAME vocab-keyed count tables the "
    "KL query builds (per-source counts join global counts on the "
    "token key; totals and vocab size broadcast), z-scores round6, "
    "top-3 per source via one window on the vocab-sized table. ln and "
    "sqrt on identical doubles are engine-stable (the repo's "
    "transcendental fence).",
)
def text_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokens("text")).alias("token"))
    # fenced for the same 4-consumer reason as corpus_kl_to_global
    from ..operators.fencing import fence_if_small

    sc = fence_if_small(
        t.groupBy("source", "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("_y")
        )
    )
    st = sc.groupBy("source").agg(F.sum("_y").alias("_ns"))
    gc = sc.groupBy("token").agg(F.sum("_y").alias("_g"))
    gt = gc.agg(F.sum("_g").alias("_n"), F.count(F.lit(1)).alias("_vocab"))
    a = F.lit(_LO_A)
    y = F.col("_y").cast("double")
    ns = F.col("_ns").cast("double")
    yr = (F.col("_g") - F.col("_y")).cast("double")
    nr = (F.col("_n") - F.col("_ns")).cast("double")
    a0 = a * F.col("_vocab")
    delta = F.log((y + a) / (ns + a0 - y - a)) - F.log(
        (yr + a) / (nr + a0 - yr - a)
    )
    zscore = F.round(
        delta / F.sqrt(F.lit(1.0) / (y + a) + F.lit(1.0) / (yr + a)), 6
    )
    z = (
        sc.join(F.broadcast(st), "source")
        .join(gc, "token")
        .crossJoin(F.broadcast(gt))
        .select("source", "token", zscore.alias("zscore"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("zscore"), "token")
    return (
        z.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("source", "token", "zscore")
        .orderBy("source", F.desc("zscore"), "token")
    )


@register(
    "sql_having_above_average",
    """
    WITH g AS (
        SELECT o_custkey,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,12)))
                     AS DOUBLE), 6) AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend
    FROM g
    WHERE spend > (SELECT CAST(sum(CAST(spend AS DECIMAL(38,12))) AS DOUBLE)
                          / count(*) FROM g)
    ORDER BY spend DESC, o_custkey
    LIMIT 25
    """,
    doc="HAVING-above-average (groups whose total beats the mean group "
    "total): the scalar subquery decorrelates into a 1-row aggregate "
    "OF the grouped table broadcast-joined back — the group table is "
    "computed once and reused for both roles (no second orders scan), "
    "the same reuse shape as TPC-H Q15's max. Spend is decimal-fenced "
    "+ round6 BEFORE the threshold compare, so membership at the "
    "boundary is bit-identical cross-engine; top-25 is TakeOrdered.",
)
def sql_having_above_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        trino_round(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).cast("double"),
            6,
        ).alias("spend")
    )
    thr = g.agg(
        (
            F.sum(F.col("spend").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_avg")
    )
    return (
        g.crossJoin(F.broadcast(thr))
        .filter(F.col("spend") > F.col("_avg"))
        .select("o_custkey", "spend")
        .orderBy(F.desc("spend"), "o_custkey")
        .limit(25)
    )


@register(
    "events_funnel_latency",
    """
    WITH r0 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    r1 AS (
      SELECT e.user_id, min(e.ts) AS t, min(r0.t) AS prev
      FROM events e JOIN r0 ON e.user_id = r0.user_id AND e.ts > r0.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    r2 AS (
      SELECT e.user_id, min(e.ts) AS t, min(r1.t) AS prev
      FROM events e JOIN r1 ON e.user_id = r1.user_id AND e.ts > r1.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    l1 AS (SELECT date_diff('microsecond', prev, t) AS us FROM r1),
    l2 AS (SELECT date_diff('microsecond', prev, t) AS us FROM r2)
    SELECT 'click' AS stage, CAST(0 + 1 AS INTEGER) AS stage_idx,
           CAST((SELECT count(*) FROM l1) AS BIGINT) AS n_users,
           round((SELECT CAST(sum(CAST(us AS DECIMAL(38,12))) AS DOUBLE)
                         / count(*) / 1000000.0 FROM l1), 6)
               AS mean_latency_s,
           round((SELECT CAST(max(us) AS DOUBLE) / 1000000.0 FROM l1), 6)
               AS max_latency_s
    UNION ALL
    SELECT 'purchase', 2,
           CAST((SELECT count(*) FROM l2) AS BIGINT),
           round((SELECT CAST(sum(CAST(us AS DECIMAL(38,12))) AS DOUBLE)
                         / count(*) / 1000000.0 FROM l2), 6),
           round((SELECT CAST(max(us) AS DOUBLE) / 1000000.0 FROM l2), 6)
    """,
    doc="Funnel stage-transition latency (view -> click -> purchase): "
    "among users who reached a stage, mean/max seconds since reaching "
    "the previous stage — computed from the SAME single-scan greedy "
    "fold as events_funnel (reach times identical by construction), "
    "one user-keyed shuffle + a 1-row aggregate. Latencies are exact "
    "microsecond integers decimal-summed; the oracle is the 3-pass "
    "join chain (operators/sessionize.py::funnel_latency).",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import funnel_latency

    ev = load_table(spark, sf_dir, "events")
    return funnel_latency(
        ev, user="user_id", event_type="event_type", ts="ts",
        stages=["view", "click", "purchase"],
    )


@register(
    "privacy_t_closeness",
    """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    grp AS (SELECT lang, CAST(sum(c) AS BIGINT) AS group_size
            FROM cells GROUP BY 1),
    gdist AS (SELECT source, sum(c) AS g FROM cells GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM cells),
    agg AS (
        SELECT cells.lang, grp.group_size,
               CAST(sum(CAST(round(abs(CAST(c AS DOUBLE)
                                       / CAST(group_size AS DOUBLE)
                                       - CAST(g AS DOUBLE)
                                         / CAST(n AS DOUBLE)), 8)
                             AS DECIMAL(28,8))) AS DOUBLE) AS present,
               CAST(sum(CAST(round(CAST(g AS DOUBLE) / CAST(n AS DOUBLE), 8)
                             AS DECIMAL(28,8))) AS DOUBLE) AS qpres
        FROM cells JOIN grp USING (lang) JOIN gdist USING (source)
        CROSS JOIN tot
        GROUP BY 1, 2
    )
    SELECT lang, group_size,
           round((present + 1.0 - qpres) / 2.0, 6) AS tvd,
           round((present + 1.0 - qpres) / 2.0, 6) <= 0.3 AS t_close
    FROM agg ORDER BY lang
    """,
    doc="t-closeness audit (Li et al. 2007): per language group, "
    "total-variation distance between the group's source distribution "
    "and the global one — the release gate that catches large-but-"
    "skewed groups k-anonymity/l-diversity pass. One groupBy to the "
    "(QI, sensitive) cube; margins are aggregates of that table "
    "broadcast back; absent-value mass folds in as 1 - present-q "
    "arithmetic (no grid join); round8 terms decimal-summed "
    "(operators/privacy.py::t_closeness).",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import t_closeness

    docs = load_table(spark, sf_dir, "documents")
    return t_closeness(docs, ["lang"], "source", t=0.3)


@register(
    "orders_interarrival_stats",
    """
    WITH gaps AS (
        SELECT date_diff('day',
                         CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS DATE),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(CAST(gap_days AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS mean_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM g
    """,
    doc="Repeat-purchase cadence: whole-day gaps between a customer's "
    "consecutive orders (lag over (orderdate, orderkey) — the key "
    "tiebreak makes same-day order sequence engine-identical), "
    "fenced mean + integer extremes in one pass. One customer-keyed "
    "window shuffle + a 1-row aggregate; DATE-cast day difference is "
    "whole-unit on both engines.",
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate")).over(w).cast("date"),
    )
    g = o.select(gap.alias("gap_days")).filter(F.col("gap_days").isNotNull())
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        trino_round(
            F.sum(F.col("gap_days").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_gap_days"),
        F.min("gap_days").cast("bigint").alias("min_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
    )


@register(
    "text_tokenizer_fertility",
    f"""
    WITH d AS (
        SELECT lang,
               CAST(len({TOKS}) AS BIGINT) AS words,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS toks
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           round(CAST(sum(toks) AS DOUBLE) / CAST(sum(words) AS DOUBLE), 6)
               AS fertility
    FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility per language: BPE-style segment count over "
    "whitespace-word count — the cost multiplier that decides how many "
    "training tokens a language's text actually produces (fertility "
    "near 1 = cheap; high fertility = the tokenizer fragments the "
    "language). Both counts are row-local regex/size projections "
    "fused into the scan (no explode); one grouped aggregate of exact "
    "integers, ratio computed once per group "
    "(operators/text.py::bpe_ish_token_count).",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_ish_token_count, token_count

    docs = load_table_parallel(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        token_count("text").cast("bigint").alias("_w"),
        bpe_ish_token_count("text").cast("bigint").alias("_t"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_w").cast("bigint").alias("n_words"),
            F.sum("_t").cast("bigint").alias("n_tokens"),
            trino_round(
                F.sum("_t").cast("double") / F.sum("_w").cast("double"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@register(
    "events_dau_wau_stickiness",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    contrib AS (
        SELECT user_id, unnest(generate_series(d, d + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS w
        FROM ud
    ),
    wau AS (
        SELECT CAST(w AS DATE) AS d, CAST(count(DISTINCT user_id) AS BIGINT)
                   AS wau
        FROM contrib GROUP BY 1
    ),
    span AS (SELECT min(d) AS lo, max(d) AS hi FROM ud)
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
               AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d CROSS JOIN span
    WHERE dau.d >= span.lo + INTERVAL 6 DAY
    ORDER BY day
    """,
    doc="DAU/WAU stickiness per day (trailing 7-day window): instead of "
    "a sliding count-distinct (quadratic re-scan or heavyweight "
    "window state), each active (user, day) EXPLODES to the <= 7 "
    "future days it keeps the user 'weekly active' for — the "
    "classic contribution-inversion that turns a sliding distinct "
    "into a plain grouped distinct at 7x the (already user-day-"
    "deduped) row count. Days before a full trailing window are "
    "dropped. At 100 TB the explode input is |active user-days|, "
    "not |events|.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("w"),
    )
    wau = contrib.groupBy(F.col("w").alias("d")).agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )
    span = ud.agg(F.min("d").alias("_lo"))
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(span))
        .filter(F.col("d") >= F.date_add(F.col("_lo"), 6))
        .select(
            F.col("d").cast("timestamp_ntz").alias("day"),
            "dau",
            "wau",
            trino_round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "agg_weighted_median",
    """
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
               sum(l_quantity) OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumw,
               sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
        FROM lineitem
    )
    SELECT l_returnflag,
           round(min(v), 6) AS weighted_median_price,
           CAST(max(tot) AS DOUBLE) AS total_weight
    FROM w
    WHERE cumw >= tot / 2.0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Weighted median (lower weighted-median convention): the first "
    "value, in (value, orderkey, linenumber) order, whose cumulative "
    "weight reaches half the group total — quantity-weighted median "
    "extended price per return flag. Exact arithmetic throughout: "
    "quantities are integer-valued doubles, so the running and total "
    "sums are exact and the boundary test is bit-identical on both "
    "engines; the unique sort tiebreak pins the running order. The "
    "running sum is the skew-safe two_phase_running_sum (above its "
    "4M-row guard: partition by (flag, price-range bucket) + broadcast "
    "bucket offsets — r11 VERDICT's few-groups caveat): with only 3 "
    "return flags a plain per-flag window would sort a third of "
    "lineitem in one task at any scale. Under the guard (eval scale) "
    "the single-window form runs — the skew protection is free when "
    "the whole input fits one task's sort (r12 VERDICT #5). "
    "Complements agg_percentiles (unweighted exact) and "
    "agg_percentiles_approx (sketch).",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import two_phase_running_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
    )
    w = two_phase_running_sum(
        li,
        value="l_quantity",
        order=("v", "l_orderkey", "l_linenumber"),
        keys=("l_returnflag",),
        bucket_on="v",
        out="cumw",
    )
    return (
        w.filter(F.col("cumw") >= F.col("cumw_total") / 2.0)
        .groupBy("l_returnflag")
        .agg(
            trino_round(F.min("v"), 6).alias("weighted_median_price"),
            F.max("cumw_total").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_nth_value_session",
    """
    WITH w AS (
        SELECT user_id, event_id, value,
               nth_value(value, 2) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
                   AS second_value,
               first_value(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS first_type,
               last_value(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS last_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, first_type, last_type,
           round(second_value, 6) AS second_event_value
    FROM w WHERE rn = 1
    ORDER BY user_id
    """,
    doc="first/last/nth_value window coverage: per user, the first and "
    "final event types over the whole ordered history plus the "
    "second event's value (nth_value over the full-partition frame — "
    "NULL for single-event users, the frame-semantics edge worth "
    "pinning). "
    "last_value uses the CURRENT ROW..UNBOUNDED FOLLOWING frame (the "
    "default frame's classic trap); (ts, event_id) ordering makes "
    "same-timestamp results engine-identical. One user-keyed window "
    "shuffle, one row kept per user.",
)
def window_nth_value_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    grow = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    shrink = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = ev.select(
        "user_id",
        F.nth_value("value", 2).over(full).alias("_sv"),
        F.first("event_type").over(grow).alias("first_type"),
        F.last("event_type").over(shrink).alias("last_type"),
        F.row_number().over(order).alias("_rn"),
    )
    return (
        w.filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "first_type",
            "last_type",
            trino_round(F.col("_sv"), 6).alias("second_event_value"),
        )
        .orderBy("user_id")
    )



# ---------------------------------------------------------------------------
# Round-15: Kaplan-Meier survival (time-to-conversion with censoring).
# ---------------------------------------------------------------------------


@register(
    "events_kaplan_meier",
    """
    WITH RECURSIVE per AS (
        SELECT user_id, min(ts) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
               max(ts) AS tend
        FROM events GROUP BY 1
    ),
    subj AS (
        SELECT strftime(t0, '%Y-%m') AS g,
               CAST(CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tend AS DATE))
               END AS INTEGER) AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per
    ),
    b AS (SELECT g, t, CAST(sum(ev) AS BIGINT) AS d,
                 CAST(sum(1 - ev) AS BIGINT) AS c
          FROM subj GROUP BY 1, 2),
    s AS (SELECT g, t, d, c,
                 row_number() OVER (PARTITION BY g ORDER BY t) AS rn
          FROM b),
    tot AS (SELECT g, sum(d + c) AS n0 FROM b GROUP BY 1),
    r AS (
        SELECT s.g, s.rn, s.t, s.d, s.c, tot.n0 AS n_risk,
               CASE WHEN s.d > 0 THEN
                   round(1.0 * round(1.0 - CAST(s.d AS DOUBLE)
                                     / CAST(tot.n0 AS DOUBLE), 8), 8)
               ELSE 1.0 END AS surv
        FROM s JOIN tot ON tot.g = s.g WHERE s.rn = 1
        UNION ALL
        SELECT r.g, s.rn, s.t, s.d, s.c, r.n_risk - r.d - r.c,
               CASE WHEN s.d > 0 THEN
                   round(r.surv * round(1.0 - CAST(s.d AS DOUBLE)
                         / CAST(r.n_risk - r.d - r.c AS DOUBLE), 8), 8)
               ELSE r.surv END
        FROM r JOIN s ON s.g = r.g AND s.rn = r.rn + 1
    )
    SELECT g AS cohort, t AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk, d AS n_event,
           c AS n_censored, round(surv, 6) AS survival
    FROM r ORDER BY cohort, duration_days
    """,
    doc="Kaplan-Meier product-limit survival curves per first-activity "
    "month cohort: time from a user's first event to first purchase, "
    "right-censored at their last observed day. Subjects collapse to "
    "(cohort, duration) event/censor counts in ONE grouped aggregate; "
    "the sequential product-limit fold runs per cohort on the bucketed "
    "applyInPandas seam with every step round8-fenced, so the curve is "
    "bit-identical and the oracle is a recursive CTE stepping the same "
    "product — the survival-analytics readout (churn, conversion, "
    "job-failure lifetimes) the events family lacked "
    "(operators/stats.py::kaplan_meier).",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import kaplan_meier

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("_t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("_tp"),
        F.max("ts").alias("_tend"),
    )
    subj = per.select(
        F.date_format(F.col("_t0"), "yyyy-MM").alias("cohort"),
        F.when(
            F.col("_tp").isNotNull(),
            F.datediff(F.col("_tp").cast("date"), F.col("_t0").cast("date")),
        )
        .otherwise(
            F.datediff(F.col("_tend").cast("date"), F.col("_t0").cast("date"))
        )
        .cast("int")
        .alias("duration_days"),
        F.col("_tp").isNotNull().cast("int").alias("converted"),
    )
    return kaplan_meier(subj, "cohort", "duration_days", "converted").orderBy(
        "cohort", "duration_days"
    )


@register(
    "events_sequence_mining",
    """
    WITH seq AS (
        SELECT user_id AS u, event_type AS e0,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e1,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e2
        FROM events
    ),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS t FROM events),
    p AS (
        SELECT e0 || '>' || e1 AS pattern, 2 AS length, u
        FROM seq WHERE e1 IS NOT NULL
        UNION ALL
        SELECT e0 || '>' || e1 || '>' || e2, 3, u
        FROM seq WHERE e2 IS NOT NULL
    ),
    agg AS (
        SELECT pattern, length, CAST(count(DISTINCT u) AS BIGINT) AS n_users
        FROM p GROUP BY 1, 2
    )
    SELECT pattern, length, n_users,
           round(CAST(n_users AS DOUBLE) / tot.t, 6) AS support
    FROM agg CROSS JOIN tot
    WHERE n_users >= 5
    ORDER BY length, n_users DESC, pattern
    """,
    doc="Frequent contiguous event-sequence mining (the n-gram special "
    "case of PrefixSpan/GSP): every 2- and 3-step event-type path "
    "walked by at least 5 distinct users, with its user-reach share — "
    "the multi-step companion to events_markov_transitions. Per-user "
    "lead windows (bounded per-user, no global sort) build forward "
    "n-grams; support counts DISTINCT users (map-side partial dedup), "
    "so loops can't fake popularity; the alphabet bounds the output "
    "(operators/sessionize.py::sequence_mining).",
)
def events_sequence_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sequence_mining

    ev = load_table(spark, sf_dir, "events")
    return sequence_mining(
        ev, "user_id", "ts", "event_type",
        tiebreak_col="event_id", max_len=3, min_support=5,
    )


@register(
    "events_nelson_aalen",
    """
    WITH per AS (
        SELECT user_id, min(ts) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
               max(ts) AS tend
        FROM events GROUP BY 1
    ),
    subj AS (
        SELECT strftime(t0, '%Y-%m') AS g,
               CAST(CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tend AS DATE))
               END AS INTEGER) AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per
    ),
    b AS (SELECT g, t, CAST(sum(ev) AS BIGINT) AS d,
                 CAST(sum(1 - ev) AS BIGINT) AS c
          FROM subj GROUP BY 1, 2),
    tot AS (SELECT g, sum(d + c) AS n0 FROM b GROUP BY 1),
    w AS (
        SELECT b.g, b.t, b.d,
               tot.n0 - COALESCE(sum(b.d + b.c) OVER (
                   PARTITION BY b.g ORDER BY b.t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM b JOIN tot ON tot.g = b.g
    ),
    h AS (
        SELECT g, t, d, n_risk,
               sum(CAST(CASE WHEN d > 0
                             THEN round(CAST(d AS DOUBLE) / n_risk, 8)
                             ELSE 0 END AS DECIMAL(28,8)))
                   OVER (PARTITION BY g ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS ch
        FROM w
    )
    SELECT g AS cohort, t AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk, d AS n_event,
           round(CAST(ch AS DOUBLE), 6) AS cum_hazard
    FROM h WHERE d > 0
    """,
    doc="Nelson-Aalen cumulative hazard per first-activity month cohort "
    "— the estimator twin of events_kaplan_meier (additive d/n hazard "
    "increments instead of the multiplicative product limit), preferred "
    "for small risk sets and for hazard-ratio eyeballing. Pure window "
    "algebra: the risk set is n0 minus the exclusive running (d+c), the "
    "hazard is a per-cohort cumulative window of round8 d/n terms "
    "decimal-fenced — NO recursion and no Python seam, each cohort's "
    "window bounded by its distinct durations.",
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("_t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("_tp"),
        F.max("ts").alias("_tend"),
    )
    subj = per.select(
        F.date_format(F.col("_t0"), "yyyy-MM").alias("cohort"),
        F.when(
            F.col("_tp").isNotNull(),
            F.datediff(F.col("_tp").cast("date"), F.col("_t0").cast("date")),
        )
        .otherwise(
            F.datediff(F.col("_tend").cast("date"), F.col("_t0").cast("date"))
        )
        .cast("int")
        .alias("t"),
        F.col("_tp").isNotNull().cast("int").alias("ev"),
    )
    b = subj.groupBy("cohort", "t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = b.groupBy("cohort").agg(F.sum(F.col("d") + F.col("c")).alias("n0"))
    w_prev = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = b.join(tot, "cohort").withColumn(
        "n_risk",
        F.col("n0")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    term = F.when(
        F.col("d") > 0,
        trino_round(F.col("d").cast("double") / F.col("n_risk"), 8),
    ).otherwise(F.lit(0.0))
    h = risk.withColumn(
        "ch", F.sum(term.cast("decimal(28,8)")).over(w_cum).cast("double")
    )
    return h.filter(F.col("d") > 0).select(
        "cohort",
        F.col("t").alias("duration_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_event"),
        trino_round(F.col("ch"), 6).alias("cum_hazard"),
    )
