"""Round-2 extension queries: repetition quality, decontamination,
tf-idf, heavy hitters, batch sessionization, domain-mixture resampling.

Each is a driver-contract query with a DuckDB oracle. Parity notes
follow harness.llm: integer-valued ratios are exact IEEE divisions (no
rounding needed); ln-derived scores round to 6 decimals on BOTH sides
and ranking runs over the rounded value; timestamps compare at
microsecond precision (``unix_micros`` / ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import packing, text
from ..operators.sampling import stratified_resample, temperature_resample
from ..operators.scd2 import scd2_history
from ..operators.sessionize import sessionize
from ..operators.timeseries import gapfill_forward, gapfill_runs
from ..sources.testdata import load_table, load_table_parallel
from . import register

TOKS = "string_split_regex(trim(text), '\\s+')"
MD5L = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    b AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
        FROM t
    ),
    u AS (SELECT doc_id, unnest(bigrams) AS bg FROM b),
    c AS (SELECT doc_id, bg, count(*) AS cnt FROM u GROUP BY 1, 2),
    m AS (SELECT doc_id, CAST(max(cnt) AS INTEGER) AS top_bigram_count FROM c GROUP BY 1)
    SELECT b.doc_id,
           b.n_tokens,
           b.n_distinct_tokens,
           CAST(b.n_distinct_tokens AS DOUBLE) / b.n_tokens AS distinct_token_ratio,
           CAST(COALESCE(m.top_bigram_count, 0) AS INTEGER) AS top_bigram_count,
           CASE WHEN len(b.bigrams) > 0
                THEN CAST(COALESCE(m.top_bigram_count, 0) AS DOUBLE) / len(b.bigrams)
                ELSE 0.0 END AS top_bigram_share
    FROM b LEFT JOIN m USING (doc_id)
    """,
    doc="Gopher-style repetition quality: distinct-token ratio + top-bigram "
    "share, computed per-row with a sorted-array run-length fold — zero "
    "shuffles (the oracle's explode+groupBy twin shuffles per token).",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_stats(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "text_decontamination",
    f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(toks) - 7),
                             i -> array_to_string(toks[i:i+7], ' '))) AS grams
        FROM t WHERE len(toks) >= 8
    ),
    tr AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id % 97 <> 0),
    ev AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id % 97 = 0),
    j AS (
        SELECT tr.doc_id, CASE WHEN ev.gr IS NULL THEN 0 ELSE 1 END AS hit
        FROM tr LEFT JOIN ev ON tr.gr = ev.gr
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(hit) AS BIGINT) AS n_contaminated,
           CAST(sum(hit) AS DOUBLE) / count(*) AS contamination_rate,
           CAST(sum(hit) AS DOUBLE) / count(*) >= 0.05 AS is_contaminated
    FROM j GROUP BY doc_id
    """,
    doc="Benchmark decontamination: per training doc, the fraction of its "
    "distinct 8-token shingles appearing anywhere in the eval set "
    "(doc_id % 97 = 0 plays the benchmark). Broadcast the eval shingle "
    "set; one shuffle on doc_id — nothing scales with corpus x eval.",
)
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return text.decontaminate(train, eval_df, n=8, threshold=0.05)


@register(
    "text_tfidf_topk",
    f"""
    WITH t AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    s AS (
        SELECT tf.doc_id, tf.token, tf.tf, df.df_docs,
               round((CAST(tf.tf AS DOUBLE) / dl.doc_len)
                     * ln(CAST(n.n_docs AS DOUBLE) / df.df_docs), 6) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN n
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk
        FROM s
    )
    SELECT doc_id, CAST(rk AS INTEGER) AS rk, token, tf, df_docs, tfidf
    FROM r WHERE rk <= 3
    """,
    doc="Top-3 characteristic terms per doc by tf-idf: token counts (one "
    "map-side-combined shuffle), vocabulary-sized df table broadcast back, "
    "corpus size as a 1-row broadcast cross join, ranking over the ROUNDED "
    "score for cross-engine determinism.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_topk(load_table(spark, sf_dir, "documents"), k=3)


@register(
    "text_heavy_hitters",
    f"""
    WITH t AS (SELECT unnest({TOKS}) AS token FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences FROM t GROUP BY 1)
    SELECT token, n_occurrences
    FROM c ORDER BY n_occurrences DESC, token ASC LIMIT 20
    """,
    doc="Corpus-wide exact heavy hitters: partial-aggregated token counts "
    "+ TakeOrderedAndProject top-20 with deterministic tiebreak.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain load (r19 A/B: 0.24 vs 0.46 s)
    return text.heavy_hitters(load_table(spark, sf_dir, "documents"), top=20)


@register(
    "text_rarity_stats",
    f"""
    WITH t AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
               AS rare_ratio,
           CAST(sum(cnt) AS DOUBLE) / count(*) AS mean_token_df
    FROM t JOIN c USING (token)
    GROUP BY doc_id
    """,
    doc="Corpus-relative token rarity per doc (gibberish/OCR-noise "
    "signal): map-side-combined vocabulary counts joined back to the "
    "token stream, per-doc rollup. Ratios of integer aggregates only — "
    "bit-exact across engines, no float-summation drift.",
)
def text_rarity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.rarity_stats(load_table(spark, sf_dir, "documents"))


@register(
    "sessionize_events",
    """
    WITH f AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT *, CAST(sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM f
    )
    SELECT user_id, session_idx,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
    FROM i GROUP BY user_id, session_idx
    """,
    doc="Batch sessionization (gaps-and-islands, 30-min strict gap): the "
    "batch twin of the streaming session windows; one Exchange on user_id "
    "shared by both window passes and the rollup. Decimal-fenced value sum.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "timeseries_gapfill",
    """
    WITH per_slot AS (
        SELECT user_id, date_trunc('hour', ts) AS slot,
               arg_max(value, event_id) AS obs
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot
        FROM bounds
    )
    SELECT s.user_id, s.slot,
           last_value(p.obs IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           p.obs IS NULL AS is_gap
    FROM spine s LEFT JOIN per_slot p USING (user_id, slot)
    """,
    doc="Time-series regularization: per-user hourly spine from each "
    "user's own activity bounds (sequence+explode), last-event-per-slot "
    "via arg-extreme (unique event_id order, no tie hazard), forward "
    "fill with last(ignorenulls) — resample+ffill entirely in Catalyst, "
    "slot reduction and fill sharing one entity-key Exchange.",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_forward(load_table(spark, sf_dir, "events"))


@register(
    "timeseries_gapfill_15min",
    """
    WITH per_slot AS (
        SELECT user_id,
               date_trunc('hour', ts)
                   + INTERVAL 15 MINUTE * (minute(ts) // 15) AS slot,
               arg_max(value, event_id) AS obs
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id,
               date_trunc('hour', min(ts))
                   + INTERVAL 15 MINUTE * (minute(min(ts)) // 15) AS lo,
               date_trunc('hour', max(ts))
                   + INTERVAL 15 MINUTE * (minute(max(ts)) // 15) AS hi
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS slot
        FROM bounds
    ),
    filled AS (
        SELECT s.user_id, s.slot,
               last_value(p.obs IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
               p.obs IS NULL AS is_gap
        FROM spine s LEFT JOIN per_slot p USING (user_id, slot)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_slots,
           CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS filled_total
    FROM filled GROUP BY user_id
    """,
    doc="Gap fill at a NON-hour grid ('15 minute' — the multi-unit "
    "slot_of path: date_trunc to the hour + cycle-aligned snap, "
    "timestampadd keeps the NTZ type). The dense resample runs in "
    "full (~4x hourly slot count); the query emits a per-user rollup "
    "(slot/gap counts + decimal-fenced sum of every filled value) so "
    "the comparison stays O(users) while still pinning every slot's "
    "forward-filled value through the sum.",
)
def timeseries_gapfill_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Run-length rollup (r19): the dense 15-min fill repeats each
    # observation across its own gap run, so the per-user rollup never
    # needs the dense rows — per run of length k the fill contributes
    # k slots, k-1 gaps, and an EXACT decimal k x value to the fenced
    # sum (decimal multiplication by an integer is exact; decimal(28,8)
    # x decimal(9,0) -> decimal(38,8), the same type the oracle's
    # per-slot decimal SUM accumulates in). Skipping the explode +
    # dense-row re-aggregate took the query 2.23 -> 0.69 s min at sf0.1
    # (interleaved A/B, values identical; plain load per the r13 note —
    # the up-front repartition A/B'd as a loss again in r19).
    runs = gapfill_runs(
        load_table(spark, sf_dir, "events"), step="15 minute"
    )
    k = (
        F.timestamp_diff("MINUTE", F.col("slot"), F.col("_end")) / 15 + 1
    ).cast("long")
    per_run = runs.select(
        "user_id",
        k.alias("_k"),
        (F.col("_obs").cast("decimal(28,8)") * k.cast("decimal(9,0)")).alias(
            "_ksum"
        ),
    )
    return per_run.groupBy("user_id").agg(
        F.sum("_k").alias("n_slots"),
        F.sum(F.col("_k") - 1).alias("n_gaps"),
        F.sum("_ksum").cast("double").alias("filled_total"),
    )


@register(
    "window_time_range_sum",
    """
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(28,8))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_value
    FROM events
    """,
    doc="Time-RANGE window frame (not ROWS): per event, the decimal-"
    "fenced value sum over the trailing hour BY EVENT TIME — frame "
    "membership follows the ordering value, so same-timestamp peers "
    "share a frame in both engines. The Spark side orders by "
    "unix_micros(ts) with an equivalent microsecond range.",
)
def window_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    order_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(order_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(28,8)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
    )


@register(
    "scd2_event_history",
    """
    WITH f AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT *, sum(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS island
        FROM f
    ),
    runs AS (
        SELECT user_id,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               min(event_id) AS first_tb,
               CAST(count(*) AS BIGINT) AS n_events
        FROM i GROUP BY user_id, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER s AS valid_to,
           lead(valid_from) OVER s IS NULL AS is_current,
           n_events
    FROM runs
    WINDOW s AS (PARTITION BY user_id ORDER BY valid_from, first_tb)
    """,
    doc="SCD type-2 backfill: collapse the event log into versioned "
    "attribute history (valid_from/valid_to/is_current) via gaps-and-"
    "islands — one Exchange on user_id shared by the change flag, the "
    "island sum, the run rollup, and the lead() sequencing.",
)
def scd2_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_history(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        order_tiebreak="event_id",
    )


#: Mixture spec for the resampling query: heavy downsample of two noisy
#: sources, mild trim of one, everything else kept whole.
_MIX_RATES = {"src0": 0.2, "src1": 0.5, "src2": 0.8}
_MIX_BUCKET = MD5L.format(x="CAST(doc_id AS STRING) || '|mix'") + " % 10000"


@register(
    "sampling_stratified_resample",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE ({_MIX_BUCKET}) < (CASE source
        WHEN 'src0' THEN 2000
        WHEN 'src1' THEN 5000
        WHEN 'src2' THEN 8000
        ELSE 10000 END)
    """,
    doc="Domain-mixture resampling: per-source deterministic keep rates "
    "from one md5 bucket against a per-group threshold — a row-local "
    "filter (no shuffle, no join), reproducible across engines/reruns.",
)
def sampling_stratified_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_resample(docs, "source", _MIX_RATES, "doc_id", default_rate=1.0)


@register(
    "sampling_temperature_mix",
    f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n
        FROM documents GROUP BY source
    ),
    m AS (SELECT min(n) AS n_min FROM counts),
    r AS (
        SELECT source,
               CAST(floor(power(n_min / n, 0.5) * 10000) AS INTEGER) AS thr
        FROM counts, m
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE ({_MIX_BUCKET}) < r.thr
    """,
    doc="Temperature-based mixture resampling (alpha=0.5): per-source "
    "keep rate (n_min/n)^0.5 flattens the source distribution toward "
    "uniform without upsampling — rates from one column-pruned count "
    "agg, membership a row-local hash filter (no data-path shuffle).",
)
def sampling_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_resample(docs, "source", "doc_id", alpha=0.5)


#: Deterministic PII seeding for the scrub query: the synthetic documents
#: table contains no PII, so both engines append the SAME doc_id-derived
#: email (always), phone (doc_id % 3 = 0), and IPv4 (doc_id % 5 = 0)
#: before scrubbing — the redaction logic is then genuinely exercised
#: and every count/replacement is oracle-checkable.
_PII_SEED_SQL = """concat_ws(' ', text,
        'user' || CAST(doc_id AS STRING) || '@example.com',
        CASE WHEN doc_id % 3 = 0 THEN '555-123-4567' END,
        CASE WHEN doc_id % 5 = 0
             THEN '10.' || CAST(doc_id % 256 AS STRING) || '.0.1' END)"""


@register(
    "text_pii_scrub",
    f"""
    WITH seeded AS (SELECT doc_id, {_PII_SEED_SQL} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
               '\\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\\b', '<PHONE>', 'g'),
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g')
               AS scrubbed_text,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT)
             + CAST(len(regexp_extract_all(text,
               '\\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\\b')) AS BIGINT)
             + CAST(len(regexp_extract_all(text,
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS BIGINT)
               AS n_redactions
    FROM seeded
    """,
    doc="PII scrub (emails/phones/IPv4 -> typed tokens + per-doc counts): "
    "pure regexp_count/regexp_replace Catalyst expressions, one fused "
    "mapper pass, zero shuffles. Patterns restricted to Java-regex/RE2 "
    "common syntax; DuckDB twin needs the 'g' replace flag (its default "
    "replaces only the first match; Spark replaces all).",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.select("doc_id", F.expr(_PII_SEED_SQL).alias("text"))
    return text.pii_scrub(seeded)


@register(
    "sequence_packing",
    f"""
    WITH t AS (
        SELECT source AS shard, doc_id, len({TOKS}) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ),
    f AS (SELECT * FROM t WHERE n_tokens > 0),
    c AS (
        SELECT shard, doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS off_end
        FROM f
    ),
    o AS (SELECT *, off_end - n_tokens AS off_start FROM c),
    e AS (
        SELECT shard, doc_id, n_tokens, off_start,
               unnest(generate_series(off_start // 512, (off_end - 1) // 512))
                   AS seq_id
        FROM o
    )
    SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(greatest(0, seq_id * 512 - off_start) AS BIGINT) AS doc_tok_start,
           CAST(least(n_tokens, (seq_id + 1) * 512 - off_start) AS BIGINT)
               AS doc_tok_end,
           CAST(greatest(off_start, seq_id * 512) - seq_id * 512 AS BIGINT)
               AS seq_offset
    FROM e
    """,
    doc="GPT-style concat-and-split sequence packing (budget 512, shard = "
    "source): one window cumsum per shard — shards pack independently, no "
    "global order — then a bounded explode maps each doc onto the "
    "sequences it straddles. The straddle IS the causal-LM packing "
    "semantic; fully SQL-expressible via running sums.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.pack_sequences(
        load_table(spark, sf_dir, "documents"), budget=512, shard_col="source"
    )


@register(
    "doc_chunking",
    f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents
               WHERE trim(text) <> ''),
    f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    c AS (
        SELECT doc_id, toks, n,
               CASE WHEN n <= 128 THEN 1
                    ELSE CAST(ceil((n - 128) / CAST(96 AS DOUBLE)) AS BIGINT) + 1
               END AS n_chunks
        FROM f
    ),
    e AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM c
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * 96 AS BIGINT) AS chunk_tok_start,
           CAST(len(toks[chunk_idx * 96 + 1 : chunk_idx * 96 + 128]) AS BIGINT)
               AS chunk_n_tokens,
           array_to_string(toks[chunk_idx * 96 + 1 : chunk_idx * 96 + 128], ' ')
               AS chunk_text
    FROM e
    """,
    doc="Overlapping chunk split (max 128 tokens, 32-token overlap): each "
    "over-long doc becomes ceil-many chunks on a 96-token stride — pure "
    "per-row array slice + posexplode, zero shuffles, the RAG/embedding "
    "unit shape.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.chunk_documents(
        load_table(spark, sf_dir, "documents"), max_tokens=128, overlap=32
    )


@register(
    "text_collocations",
    r"""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\s+') AS tk FROM documents
        WHERE len(string_split_regex(trim(text), '\s+')) >= 2
    ),
    big AS (
        SELECT unnest(list_transform(generate_series(1, len(tk) - 1), i ->
                   {'w1': tk[i], 'w2': tk[i + 1]}), recursive := true)
        FROM t
    ),
    uni AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
    ),
    bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_big
           FROM big GROUP BY 1, 2),
    uc AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
    nb AS (SELECT count(*) AS n_big FROM big),
    nu AS (SELECT count(*) AS n_uni FROM uni)
    SELECT w1, w2, c_big,
           round((CAST(c_big AS DOUBLE) / CAST(n_big AS DOUBLE)) /
                 ((CAST(c1.c_w AS DOUBLE) / CAST(n_uni AS DOUBLE)) *
                  (CAST(c2.c_w AS DOUBLE) / CAST(n_uni AS DOUBLE))), 6)
               AS lift
    FROM bc JOIN uc c1 ON bc.w1 = c1.w JOIN uc c2 ON bc.w2 = c2.w, nb, nu
    WHERE c_big >= 5
    ORDER BY lift DESC, w1, w2
    LIMIT 20
    """,
    doc="Top-20 collocations by association lift (PMI's exact-arithmetic "
    "monotone twin — no engine-specific log in the comparable output): "
    "bigrams from a row-local slice/zip of the token array, unigram and "
    "bigram counts map-side combined, corpus totals broadcast back as "
    "1-row cross joins, vocabulary-sized count joins — the corpus never "
    "shuffles twice. Phrase-mining / tokenizer-merge-candidate pass.",
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.collocations(
        load_table(spark, sf_dir, "documents"), min_count=5, k=20
    )


_BM25_TERMS = ("spark", "join", "vector")
_BM25_TF = "\n".join(
    f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i},"
    for i, t in enumerate(_BM25_TERMS)
).rstrip(",")
_BM25_DF = ",\n".join(
    f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
    for i in range(len(_BM25_TERMS))
)
_BM25_CONTRIB = " + ".join(
    "CAST(round(((ln((CAST(n_docs - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
    " * CAST(tf_{i} AS DOUBLE)) * (1.2 + 1.0))"
    " / (CAST(tf_{i} AS DOUBLE) + (1.2 * ((1.0 - 0.75) + ((0.75 * CAST(dl AS DOUBLE)) / "
    "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))), 8) AS DECIMAL(28,8))".format(i=i)
    for i in range(len(_BM25_TERMS))
)
_BM25_MATCH = " + ".join(
    f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_BM25_TERMS))
)


@register(
    "text_bm25_topk",
    f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    d AS (
        SELECT doc_id, len(toks) AS dl,
        {_BM25_TF}
        FROM t
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, sum(dl) AS total_len,
        {_BM25_DF}
        FROM d
    )
    SELECT doc_id, dl AS doc_len,
           CAST({_BM25_MATCH} AS BIGINT) AS n_match,
           round(CAST({_BM25_CONTRIB} AS DOUBLE), 6) AS bm25
    FROM d CROSS JOIN s
    WHERE {_BM25_MATCH} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
    doc="BM25 keyword retrieval (top-10 for a fixed 3-term query): per-doc "
    "term frequencies are ROW-LOCAL array filters (no explode, no corpus "
    "shuffle, no inverted index); corpus stats (N, avgdl, per-term df) are "
    "one 1-row broadcast; top-k is TakeOrdered. Per-term contributions are "
    "round8+decimal-fenced and summed in fixed order — bit-stable across "
    "engines and partitionings.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bm25_topk(
        load_table_parallel(spark, sf_dir, "documents"), list(_BM25_TERMS), k=10
    )


@register(
    "text_lm_surprisal",
    f"""
    WITH t AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
    n AS (SELECT sum(cnt) AS total_tokens FROM c),
    s AS (
        SELECT doc_id,
               round(-ln(CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE)), 8)
                   AS nll
        FROM t JOIN c USING (token) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(sum(CAST(nll AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS avg_nll,
           max(nll) AS max_nll
    FROM s GROUP BY doc_id
    """,
    doc="Unigram-LM surprisal quality scores per doc (mean + max nats "
    "under the corpus MLE distribution — the LM-filtering pass): one "
    "vocabulary-sized map-side-combined count shuffle, corpus total as a "
    "1-row broadcast, per-token round8 surprisal decimal-summed per doc "
    "(associative => partition-order-proof).",
)
def text_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain load (r19 A/B: 0.72 vs 0.98 s — the vocab fence already
    # collapses the corpus once; the up-front exchange only added cost)
    return text.lm_surprisal_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_zipf_fit",
    f"""
    WITH t AS (SELECT unnest({TOKS}) AS token FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
    r AS (
        SELECT cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT)
                   AS rank
        FROM c
    ),
    p AS (
        SELECT cnt,
               round(ln(CAST(rank AS DOUBLE)), 8) AS x,
               round(ln(CAST(cnt AS DOUBLE)), 8) AS y
        FROM r
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_vocab,
               CAST(sum(cnt) AS BIGINT) AS total_tokens,
               CAST(sum(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
               CAST(sum(CAST(round(x * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(round(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sx2
        FROM p
    )
    SELECT n_vocab, total_tokens,
           round((CAST(n_vocab AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n_vocab AS DOUBLE) * sx2 - sx * sx), 6) AS zipf_slope,
           round((sy - ((CAST(n_vocab AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n_vocab AS DOUBLE) * sx2 - sx * sx)) * sx)
                 / CAST(n_vocab AS DOUBLE), 6) AS zipf_intercept
    FROM m
    """,
    doc="Corpus Zipf-law fit (ln freq ~ a + s*ln rank over the "
    "vocabulary): corpus-health statistic — natural text ~ -1, OCR noise "
    "flattens, template spam steepens. One vocabulary count shuffle + a "
    "vocabulary-sized (not corpus-sized) rank sort; all five regression "
    "moments accumulate round8+decimal (bit-stable), closed form at the "
    "end.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.zipf_fit(load_table(spark, sf_dir, "documents"))


@register(
    "timeseries_anomaly",
    """
    WITH series AS (
        SELECT event_type AS entity,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slot,
               CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    roll AS (
        SELECT entity, slot, x,
               CAST(sum(CAST(x AS DECIMAL(28,8))) OVER w AS DOUBLE) AS sx,
               CAST(sum(CAST(round(x * x, 8) AS DECIMAL(28,8))) OVER w
                    AS DOUBLE) AS sx2,
               CAST(count(*) OVER w AS DOUBLE) AS n
        FROM series
        WINDOW w AS (PARTITION BY entity ORDER BY slot
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT entity, slot, x AS slot_value,
           CAST(n AS BIGINT) AS n_window,
           round((x - sx / n) / sqrt((sx2 - (sx * sx) / n) / (n - 1.0)), 6)
               AS zscore
    FROM roll
    WHERE n >= 12
      AND abs((x - sx / n) / sqrt((sx2 - (sx * sx) / n) / (n - 1.0))) > 3.0
    """,
    doc="Rolling z-score anomaly detection (hourly volume per event "
    "type vs its trailing 24-slot window): the ingest-monitoring / "
    "drift-alerting pass. Decimal-fenced frame sums feed the textbook "
    "two-pass-free variance formula in fixed-order double arithmetic, "
    "so the kept-anomaly set is engine- and partitioning-exact; one "
    "Exchange shared by rollup and frame.",
)
def timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import rolling_zscore

    return rolling_zscore(
        load_table(spark, sf_dir, "events"),
        entity_col="event_type",
        ts_col="ts",
        value_col="value",
    )


@register(
    "text_bigram_lm",
    f"""
    WITH t AS (
        SELECT doc_id, {TOKS} AS toks FROM documents
    ),
    pairs AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
        FROM t WHERE len(toks) >= 2
    ),
    p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM pairs),
    bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_big FROM p GROUP BY 1, 2),
    cc AS (SELECT w1, CAST(sum(c_big) AS BIGINT) AS c_ctx FROM bc GROUP BY 1),
    s AS (
        SELECT doc_id,
               round(-ln(CAST(c_big AS DOUBLE) / CAST(c_ctx AS DOUBLE)), 8)
                   AS nll
        FROM p JOIN bc USING (w1, w2) JOIN cc USING (w1)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(nll AS DECIMAL(28,8))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS avg_nll_bigram
    FROM s GROUP BY doc_id
    """,
    doc="Bigram-LM surprisal per doc, model trained on the corpus in the "
    "same job (MLE conditionals, no smoothing needed — scored bigrams "
    "exist by construction): mean conditional surprisal upgrades the "
    "unigram quality filter. One bigram stream feeds both the count "
    "model and scoring; joins shuffle bigram-vocabulary-sized tables, "
    "round8 + decimal-fenced per-doc sums.",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bigram_lm_scores(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "scd2_point_in_time_join",
    """
    WITH f AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events WHERE event_type <> 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT *, sum(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS island
        FROM f
    ),
    runs AS (
        SELECT user_id,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               min(event_id) AS first_tb
        FROM i GROUP BY user_id, island
    ),
    hist AS (
        SELECT user_id, event_type AS status, valid_from,
               lead(valid_from) OVER s AS valid_to
        FROM runs
        WINDOW s AS (PARTITION BY user_id ORDER BY valid_from, first_tb)
    ),
    p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value,
           h.status, h.valid_from AS status_since
    FROM p
    LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
    doc="Point-in-time enrichment (feature-store as-of correctness): "
    "each purchase joins the user's SCD2 status version whose "
    "[valid_from, valid_to) interval covers the purchase instant — "
    "never a later version (no time-travel leakage into training "
    "rows). Versions partition the timeline, so exactly one match per "
    "covered fact; purchases before any status event stay with NULL "
    "status via the left join. Equi-join on user_id with the interval "
    "as a residual filter.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import point_in_time_join

    ev = load_table(spark, sf_dir, "events")
    history = scd2_history(
        ev.filter(F.col("event_type") != "purchase"),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        order_tiebreak="event_id",
    ).select(
        "user_id",
        F.col("event_type").alias("status"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = point_in_time_join(facts, history, "user_id", "ts")
    return out.select(
        "event_id",
        "user_id",
        "value",
        "status",
        F.col("valid_from").alias("status_since"),
    )


# ---------------------------------------------------------------------------
# Round-10: Gopher rule-based quality gate + cross-source overlap audit.
# ---------------------------------------------------------------------------

_GOPHER_STOPS = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that']"


@register(
    "quality_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    f AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_words,
               CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
                   / len(toks) AS mean_len,
               CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                   AS DOUBLE) / len(toks) AS alpha_ratio,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
                   / len(toks) AS symbol_ratio,
               CAST(len(list_intersect(list_transform(toks, w -> lower(w)),
                                       {_GOPHER_STOPS})) AS INTEGER)
                   AS stopword_kinds
        FROM t
    )
    SELECT doc_id, n_words,
           round(mean_len, 4) AS mean_word_len,
           round(alpha_ratio, 4) AS alpha_word_ratio,
           round(symbol_ratio, 4) AS symbol_word_ratio,
           stopword_kinds,
           (n_words >= 30 AND n_words <= 100000) AS r_word_count,
           (mean_len >= 3.0 AND mean_len <= 10.0) AS r_mean_word_len,
           (alpha_ratio >= 0.80) AS r_alpha_ratio,
           (symbol_ratio <= 0.10) AS r_symbol_ratio,
           (stopword_kinds >= 2) AS r_stopwords,
           ((n_words >= 30 AND n_words <= 100000)
            AND (mean_len >= 3.0 AND mean_len <= 10.0)
            AND alpha_ratio >= 0.80
            AND symbol_ratio <= 0.10
            AND stopword_kinds >= 2) AS keep
    FROM f
    """,
    doc="Gopher-style hard quality gate (Rae et al. 2021): per-rule "
    "boolean verdicts (word-count window, mean word length, alphabetic "
    "ratio, symbol ratio, distinct-stopword floor) plus the conjunction "
    "as keep — each rule independently reportable so a curation run can "
    "explain every drop. Single codegen projection, zero shuffles.",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.gopher_rules(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "quality_c4_rules",
    f"""
    WITH f AS (
        SELECT doc_id,
               CAST(len(regexp_replace(text, '[^.!?]', '', 'g')) AS INTEGER)
                   AS n_sentences,
               CAST(len({TOKS}) AS INTEGER) AS n_words,
               right(rtrim(text), 1) IN ('.', '!', '?', '"') AS r_ends_terminal,
               NOT contains(lower(text), 'lorem ipsum') AS r_no_lorem,
               NOT contains(text, '{{') AS r_no_brace,
               NOT contains(lower(text), 'javascript') AS r_no_javascript
        FROM documents
    )
    SELECT doc_id, n_sentences, n_words,
           r_ends_terminal,
           (n_sentences >= 3) AS r_min_sentences,
           (n_words >= 5) AS r_min_words,
           r_no_lorem, r_no_brace, r_no_javascript,
           (r_ends_terminal AND n_sentences >= 3 AND n_words >= 5
            AND r_no_lorem AND r_no_brace AND r_no_javascript) AS keep
    FROM f
    """,
    doc="C4-style structural cleaning gate (Raffel et al. 2020): terminal "
    "punctuation, sentence/word floors, and the lorem-ipsum / curly-brace "
    "/ javascript blocklist rules, each independently reportable plus the "
    "conjunction as keep — the second standard public filter set next to "
    "quality_gopher_rules. Single codegen projection, zero shuffles.",
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.c4_rules(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "corpus_overlap_matrix",
    f"""
    WITH t AS (SELECT source AS g, {TOKS} AS toks FROM documents),
    gr AS (
        SELECT g,
               list_distinct(list_transform(generate_series(1, len(toks) - 7),
                             i -> array_to_string(toks[i:i+7], ' '))) AS grams
        FROM t WHERE len(toks) >= 8
    ),
    sh AS (
        SELECT DISTINCT g, {MD5L.format(x='gr2')} AS h
        FROM (SELECT g, unnest(grams) AS gr2 FROM gr)
    ),
    per AS (SELECT g, count(*) AS n FROM sh GROUP BY g),
    shared AS (
        SELECT x.g AS ga, y.g AS gb, count(*) AS shared
        FROM sh x JOIN sh y ON x.h = y.h AND x.g < y.g
        GROUP BY 1, 2
    )
    SELECT a.g AS source_a, b.g AS source_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           CAST(COALESCE(s.shared, 0) AS BIGINT) AS shared,
           round(CAST(COALESCE(s.shared, 0) AS DOUBLE)
                 / (a.n + b.n - COALESCE(s.shared, 0)), 6) AS jaccard
    FROM per a
    JOIN per b ON a.g < b.g
    LEFT JOIN shared s ON s.ga = a.g AND s.gb = b.g
    """,
    doc="Cross-source duplication audit: distinct 8-token-shingle overlap "
    "and Jaccard for every source pair — the 'how much of crawl B is "
    "already in crawl A' question asked before mixing corpora. Shingles "
    "are md5-hashed to longs before the shuffle (8-byte keys, not "
    "strings); a shingle in s sources costs C(s,2) join rows, bounded "
    "by the (small) source count, never doc-pair cartesian.",
)
def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.corpus_overlap(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "corpus_novelty",
    f"""
    WITH t AS (SELECT source AS g, {TOKS} AS toks FROM documents),
    gr AS (
        SELECT g,
               list_distinct(list_transform(generate_series(1, len(toks) - 7),
                             i -> array_to_string(toks[i:i+7], ' '))) AS grams
        FROM t WHERE len(toks) >= 8
    ),
    sh AS (
        SELECT DISTINCT g, {MD5L.format(x='gr2')} AS h
        FROM (SELECT g, unnest(grams) AS gr2 FROM gr)
    ),
    own AS (SELECT h, min(g) AS g FROM sh GROUP BY h),
    nv AS (SELECT g, CAST(count(*) AS BIGINT) AS n_novel FROM own GROUP BY g),
    per AS (SELECT g, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY g)
    SELECT per.g AS source, per.n_shingles,
           CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
           round(CAST(COALESCE(nv.n_novel, 0) AS DOUBLE) / per.n_shingles, 6)
               AS novelty_rate
    FROM per LEFT JOIN nv ON nv.g = per.g
    """,
    doc="Marginal-novelty audit: sources processed in lexicographic "
    "order, each distinct 8-token shingle charged to its FIRST source; "
    "novelty rate = the fraction of a source's shingles no earlier "
    "source already had — what adding this crawl actually buys. Same "
    "hashed-shingle dataflow as the overlap matrix plus one min-owner "
    "groupBy on the hash; shuffle is the distinct (source, shingle) "
    "table, never pairwise (operators/text.py::corpus_novelty).",
)
def corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.corpus_novelty(load_table_parallel(spark, sf_dir, "documents"))


_GOPHER_F_CTE = f"""
    t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    f AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_words,
               CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
                   / len(toks) AS mean_len,
               CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                   AS DOUBLE) / len(toks) AS alpha_ratio,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
                   / len(toks) AS symbol_ratio,
               CAST(len(list_intersect(list_transform(toks, w -> lower(w)),
                                       {_GOPHER_STOPS})) AS INTEGER)
                   AS stopword_kinds
        FROM t
    ),
    r AS (
        SELECT n_words,
               (n_words >= 30 AND n_words <= 100000) AS r_word_count,
               (mean_len >= 3.0 AND mean_len <= 10.0) AS r_mean_word_len,
               (alpha_ratio >= 0.80) AS r_alpha_ratio,
               (symbol_ratio <= 0.10) AS r_symbol_ratio,
               (stopword_kinds >= 2) AS r_stopwords
        FROM f
    ),
    tot AS (SELECT CAST(sum(n_words) AS BIGINT) AS all_tokens FROM r)
"""

_GOPHER_RULE_NAMES = [
    "r_word_count",
    "r_mean_word_len",
    "r_alpha_ratio",
    "r_symbol_ratio",
    "r_stopwords",
]

_ABLATION_ARMS = "\n    UNION ALL\n".join(
    f"""    SELECT '{name}' AS rule,
           CAST(sum(CASE WHEN NOT {name} THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_failing,
           CAST(sum(CASE WHEN NOT {name} THEN n_words ELSE 0 END) AS BIGINT)
               AS tokens_lost,
           round(CAST(sum(CASE WHEN NOT {name} THEN n_words ELSE 0 END)
                      AS DOUBLE) / CAST(max(all_tokens) AS DOUBLE), 6)
               AS pct_tokens_lost
    FROM r CROSS JOIN tot"""
    for name in _GOPHER_RULE_NAMES + ["keep"]
).replace(
    # the 'keep' arm: fails when the CONJUNCTION fails
    "WHEN NOT keep",
    "WHEN NOT (r_word_count AND r_mean_word_len AND r_alpha_ratio "
    "AND r_symbol_ratio AND r_stopwords)",
)


@register(
    "quality_rule_ablation",
    f"""
    WITH {_GOPHER_F_CTE}
    SELECT * FROM (
{_ABLATION_ARMS}
    ) ORDER BY rule
    """,
    doc="Gopher-rule ablation: for each quality rule, how many documents "
    "and what share of corpus tokens a curation run would drop by "
    "enforcing it — plus the conjunction ('keep') as the combined "
    "cost. The decision table tuned before committing a 100 TB "
    "filter pass: rule flags come from the SAME single-projection "
    "gopher gate, the ablation is ONE keyless aggregate per rule over "
    "the flag table (Catalyst shares the scan), token totals "
    "broadcast (operators/text.py::gopher_rules).",
)
def quality_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = text.gopher_rules(load_table_parallel(spark, sf_dir, "documents"))
    rules = [
        "r_word_count",
        "r_mean_word_len",
        "r_alpha_ratio",
        "r_symbol_ratio",
        "r_stopwords",
        "keep",
    ]
    tot = flags.agg(F.sum("n_words").cast("bigint").alias("_all"))
    arms = flags.crossJoin(F.broadcast(tot)).agg(
        F.max("_all").alias("_all"),
        *[
            F.sum(F.when(~F.col(r), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_d_{r}")
            for r in rules
        ],
        *[
            F.sum(F.when(~F.col(r), F.col("n_words")).otherwise(0))
            .cast("bigint")
            .alias(f"_t_{r}")
            for r in rules
        ],
    )
    from ..functions.trino import trino_round

    rows = [
        F.struct(
            F.lit(r if r != "keep" else "keep").alias("rule"),
            F.col(f"_d_{r}").alias("docs_failing"),
            F.col(f"_t_{r}").alias("tokens_lost"),
            trino_round(
                F.col(f"_t_{r}").cast("double") / F.col("_all").cast("double"), 6
            ).alias("pct_tokens_lost"),
        )
        for r in rules
    ]
    return (
        arms.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.rule", "r.docs_failing", "r.tokens_lost", "r.pct_tokens_lost")
        .orderBy("rule")
    )


@register(
    "timeseries_holt_forecast",
    """
    WITH RECURSIVE d AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    s AS (
        SELECT user_id, y,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    mx AS (SELECT user_id, max(rn) AS n FROM s GROUP BY 1),
    r AS (
        SELECT user_id, 1 AS rn, y AS l,
               CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS sse
        FROM s WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.rn + 1,
               round(0.5 * s.y + 0.5 * (r.l + r.b), 8),
               round(0.25 * (round(0.5 * s.y + 0.5 * (r.l + r.b), 8) - r.l)
                     + 0.75 * r.b, 8),
               round(r.sse
                     + round((s.y - round(r.l + r.b, 8))
                             * (s.y - round(r.l + r.b, 8)), 8), 8)
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT r.user_id, CAST(mx.n AS BIGINT) AS n_obs,
           round(r.l, 6) AS level, round(r.b, 6) AS trend,
           round(round(r.l + r.b, 8), 6) AS forecast_next,
           round(r.sse, 6) AS sse
    FROM r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n
    ORDER BY r.user_id
    """,
    doc="Holt linear-trend smoothing over each user's daily value "
    "series: level/trend recurrence + 1-step-ahead forecast + in-"
    "sample SSE. The fold is inherently sequential per series, so the "
    "Spark side is the canonical custom-operator seam — Arrow-batched "
    "applyInPandas per user (series-bounded work inside one task, "
    "users parallelize, nothing on the driver) — while the oracle is "
    "a recursive CTE stepping the SAME recurrence. Dyadic alpha/beta "
    "(0.5/0.25) and a Trino-round8 fence after EVERY step make the "
    "fold bit-identical across engines and partitionings — a rare "
    "exact-checkable iterative op, not a rows-only one "
    "(operators/timeseries.py::holt_smoothing).",
)
def timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import holt_smoothing

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("user_id"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("_day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("_y")
        )
    )
    return holt_smoothing(ev, "user_id", "_day", "_y").orderBy("user_id")


@register(
    "timeseries_holt_winters",
    """
    WITH RECURSIVE d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
        SELECT user_id, y,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    mx AS (SELECT user_id, max(rn) AS n FROM s GROUP BY 1),
    r AS (
        SELECT user_id, 1 AS rn, y AS acc, [y] AS ys,
               CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
               CAST(0.0 AS DOUBLE) AS sse
        FROM s WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.rn + 1,
               CASE WHEN r.rn + 1 <= 7 THEN round(r.acc + s.y, 8)
                    ELSE r.acc END,
               CASE
                 WHEN r.rn + 1 < 7 THEN list_append(r.ys, s.y)
                 WHEN r.rn + 1 = 7 THEN
                   list_transform(list_append(r.ys, s.y),
                       v -> round(v - round(round(r.acc + s.y, 8) / 7, 8), 8))
                 ELSE list_append(r.ys[2:],
                   round(0.5 * (s.y - round(0.5 * (s.y - r.ys[1])
                                            + 0.5 * (r.l + r.b), 8))
                         + 0.5 * r.ys[1], 8))
               END,
               CASE
                 WHEN r.rn + 1 < 7 THEN r.l
                 WHEN r.rn + 1 = 7 THEN round(round(r.acc + s.y, 8) / 7, 8)
                 ELSE round(0.5 * (s.y - r.ys[1]) + 0.5 * (r.l + r.b), 8)
               END,
               CASE
                 WHEN r.rn + 1 <= 7 THEN r.b
                 ELSE round(0.25 * (round(0.5 * (s.y - r.ys[1])
                                          + 0.5 * (r.l + r.b), 8) - r.l)
                            + 0.75 * r.b, 8)
               END,
               CASE
                 WHEN r.rn + 1 <= 7 THEN r.sse
                 ELSE round(r.sse + round((s.y - round(r.l + r.b + r.ys[1], 8))
                                   * (s.y - round(r.l + r.b + r.ys[1], 8)), 8), 8)
               END
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT r.user_id, CAST(mx.n AS BIGINT) AS n_obs,
           round(r.l, 6) AS level, round(r.b, 6) AS trend,
           round(r.ys[1], 6) AS season_next,
           round(round(r.l + r.b + r.ys[1], 8), 6) AS forecast_next,
           round(r.sse, 6) AS sse
    FROM r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n
    WHERE mx.n > 7
    ORDER BY r.user_id
    """,
    doc="Holt-Winters ADDITIVE-seasonality smoothing (period 7) over "
    "each user's daily value series: level/trend/seasonal recurrence, "
    "1-step-ahead forecast and in-sample SSE. Same bucketed "
    "applyInPandas fold seam as the Holt query, with the season "
    "vector as per-series state; the oracle is a recursive CTE "
    "carrying that vector as a LIST. Dyadic alpha/beta/gamma "
    "(0.5/0.25/0.5), a round8 fence after EVERY step, and a "
    "sequentially-fenced seed mean (fixing the engine-dependent "
    "summation order) make the fold bit-identical across engines "
    "(operators/timeseries.py::holt_winters_smoothing).",
)
def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import holt_winters_smoothing

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("user_id"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("_day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("_y")
        )
    )
    return holt_winters_smoothing(ev, "user_id", "_day", "_y", period=7).orderBy(
        "user_id"
    )


@register(
    "timeseries_backtest_accuracy",
    """
    WITH RECURSIVE d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
        SELECT user_id, y,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    mx AS (SELECT user_id, max(rn) AS n FROM s GROUP BY 1),
    r AS (
        SELECT user_id, 1 AS rn, y AS l, CAST(0.0 AS DOUBLE) AS b,
               y AS prev,
               CAST(0.0 AS DOUBLE) AS sum_ae, CAST(0.0 AS DOUBLE) AS sum_ape,
               0 AS n_ape, CAST(0.0 AS DOUBLE) AS sum_sm, 0 AS n_sm,
               CAST(0.0 AS DOUBLE) AS sum_nv
        FROM s WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.rn + 1,
               round(0.5 * s.y + 0.5 * (r.l + r.b), 8),
               round(0.25 * (round(0.5 * s.y + 0.5 * (r.l + r.b), 8) - r.l)
                     + 0.75 * r.b, 8),
               s.y,
               round(r.sum_ae
                     + round(abs(s.y - round(r.l + r.b, 8)), 8), 8),
               CASE WHEN s.y <> 0 THEN
                   round(r.sum_ape
                         + round(round(abs(s.y - round(r.l + r.b, 8)), 8)
                                 / abs(s.y), 8), 8)
               ELSE r.sum_ape END,
               r.n_ape + (CASE WHEN s.y <> 0 THEN 1 ELSE 0 END),
               CASE WHEN abs(s.y) + abs(round(r.l + r.b, 8)) <> 0 THEN
                   round(r.sum_sm
                         + round(2.0 * round(abs(s.y - round(r.l + r.b, 8)), 8)
                                 / (abs(s.y) + abs(round(r.l + r.b, 8))), 8),
                         8)
               ELSE r.sum_sm END,
               r.n_sm + (CASE WHEN abs(s.y) + abs(round(r.l + r.b, 8)) <> 0
                         THEN 1 ELSE 0 END),
               round(r.sum_nv + round(abs(s.y - r.prev), 8), 8)
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT r.user_id, CAST(mx.n AS BIGINT) AS n_obs,
           round(r.sum_ae / (mx.n - 1), 6) AS mae,
           CASE WHEN r.n_ape > 0 THEN round(r.sum_ape / r.n_ape, 6) END
               AS mape,
           CASE WHEN r.n_sm > 0 THEN round(r.sum_sm / r.n_sm, 6) END
               AS smape,
           CASE WHEN r.sum_nv > 0 THEN round(r.sum_ae / r.sum_nv, 6) END
               AS mase
    FROM r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n
    WHERE mx.n > 1
    ORDER BY r.user_id
    """,
    doc="One-step-ahead Holt forecast backtest per user: MAE, MAPE, "
    "sMAPE, and MASE (Hyndman-Koehler naive-1 scaling) of every "
    "post-seed observation against its 1-step-ahead forecast — the "
    "accuracy gate the forecasting family was missing (fits existed, "
    "scores didn't). Same bucketed applyInPandas fold seam and "
    "round8-fence-per-step contract as the Holt/Holt-Winters "
    "queries; the oracle is a recursive CTE carrying the four error "
    "accumulators, so the check is exact, not rows-only "
    "(operators/timeseries.py::holt_backtest).",
)
def timeseries_backtest_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import holt_backtest

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("user_id"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("_day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("_y")
        )
    )
    return holt_backtest(ev, "user_id", "_day", "_y").orderBy("user_id")


@register(
    "timeseries_ewma_chart",
    """
    WITH RECURSIVE d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
        SELECT user_id, y,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    mx AS (SELECT user_id, max(rn) AS n FROM s GROUP BY 1),
    st AS (
        SELECT user_id,
               round(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*), 8) AS mu,
               round(sqrt(greatest(
                   CAST(sum(CAST(round(y * y, 8) AS DECIMAL(38,12)))
                        AS DOUBLE) / count(*)
                   - round(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*), 8)
                     * round(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                             / count(*), 8),
                   0.0)), 8) AS sg
        FROM d GROUP BY 1
    ),
    r AS (
        SELECT s.user_id, 1 AS rn,
               round(0.5 * s.y + 0.5 * st.mu, 8) AS z,
               round(1.0 * 0.25, 8) AS q,
               CASE WHEN abs(round(0.5 * s.y + 0.5 * st.mu, 8) - st.mu)
                         > round(3.0 * st.sg
                                 * sqrt(round((0.5 / 1.5)
                                              * (1 - round(1.0 * 0.25, 8)),
                                        8)), 8)
                    THEN 1 ELSE 0 END AS alarms,
               CASE WHEN abs(round(0.5 * s.y + 0.5 * st.mu, 8) - st.mu)
                         > round(3.0 * st.sg
                                 * sqrt(round((0.5 / 1.5)
                                              * (1 - round(1.0 * 0.25, 8)),
                                        8)), 8)
                    THEN 1 ELSE 0 END AS first_alarm
        FROM s JOIN st USING (user_id) WHERE s.rn = 1
        UNION ALL
        SELECT r.user_id, r.rn + 1,
               round(0.5 * s.y + 0.5 * r.z, 8),
               round(r.q * 0.25, 8),
               r.alarms
               + CASE WHEN abs(round(0.5 * s.y + 0.5 * r.z, 8) - st.mu)
                           > round(3.0 * st.sg
                                   * sqrt(round((0.5 / 1.5)
                                                * (1 - round(r.q * 0.25, 8)),
                                          8)), 8)
                      THEN 1 ELSE 0 END,
               CASE WHEN r.first_alarm > 0 THEN r.first_alarm
                    WHEN abs(round(0.5 * s.y + 0.5 * r.z, 8) - st.mu)
                         > round(3.0 * st.sg
                                 * sqrt(round((0.5 / 1.5)
                                              * (1 - round(r.q * 0.25, 8)),
                                        8)), 8)
                    THEN r.rn + 1 ELSE 0 END
        FROM r
        JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
        JOIN st ON st.user_id = r.user_id
    )
    SELECT r.user_id, CAST(mx.n AS BIGINT) AS n_obs,
           round(st.mu, 6) AS mean, round(st.sg, 6) AS sigma,
           round(r.z, 6) AS ewma_final,
           CAST(r.alarms AS BIGINT) AS n_alarms,
           CAST(r.first_alarm AS BIGINT) AS first_alarm
    FROM r
    JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n
    JOIN st ON st.user_id = r.user_id
    ORDER BY r.user_id
    """,
    doc="EWMA control chart (Roberts 1959) over each user's daily "
    "value series: smoothed statistic seeded at the series mean, "
    "time-varying control limits L*sigma*sqrt(f*(1-(1-lam)^2t)) with "
    "the power carried as round8-fenced state (exact for dyadic "
    "lam=0.5), alarm count and first-exceedance index. Pass 1 is one "
    "decimal-fenced grouped aggregate; the fold rides the bucketed "
    "applyInPandas seam; the oracle is a recursive CTE stepping the "
    "SAME recurrence — a third exact-checkable iterative operator "
    "alongside Holt and Holt-Winters "
    "(operators/timeseries.py::ewma_control_chart).",
)
def timeseries_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma_control_chart

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("user_id"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("_day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("_y")
        )
    )
    return ewma_control_chart(ev, "user_id", "_day", "_y").orderBy("user_id")


@register(
    "timeseries_acf",
    """
    WITH d AS (
        SELECT event_type AS g, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    mu AS (
        SELECT g, round(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE), 8) AS m
        FROM d GROUP BY 1
    ),
    led AS (
        SELECT d.g, (d.y - mu.m) AS d0,
           lead(d.y, 1) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d1,
           lead(d.y, 2) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d2,
           lead(d.y, 3) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d3,
           lead(d.y, 4) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d4,
           lead(d.y, 5) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d5,
           lead(d.y, 6) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d6,
           lead(d.y, 7) OVER (PARTITION BY d.g ORDER BY d.day) - mu.m AS d7
        FROM d JOIN mu ON mu.g = d.g
    ),
    agg AS (
        SELECT g,
        CAST(sum(CAST(d0 * d0 AS DECIMAL(38,8))) AS DOUBLE) AS den,
        CAST(sum(CAST(d0 * d1 AS DECIMAL(38,8))) AS DOUBLE) AS n1,
        CAST(count(d1) AS BIGINT) AS c1,
        CAST(sum(CAST(d0 * d2 AS DECIMAL(38,8))) AS DOUBLE) AS n2,
        CAST(count(d2) AS BIGINT) AS c2,
        CAST(sum(CAST(d0 * d3 AS DECIMAL(38,8))) AS DOUBLE) AS n3,
        CAST(count(d3) AS BIGINT) AS c3,
        CAST(sum(CAST(d0 * d4 AS DECIMAL(38,8))) AS DOUBLE) AS n4,
        CAST(count(d4) AS BIGINT) AS c4,
        CAST(sum(CAST(d0 * d5 AS DECIMAL(38,8))) AS DOUBLE) AS n5,
        CAST(count(d5) AS BIGINT) AS c5,
        CAST(sum(CAST(d0 * d6 AS DECIMAL(38,8))) AS DOUBLE) AS n6,
        CAST(count(d6) AS BIGINT) AS c6,
        CAST(sum(CAST(d0 * d7 AS DECIMAL(38,8))) AS DOUBLE) AS n7,
        CAST(count(d7) AS BIGINT) AS c7
        FROM led GROUP BY 1
    )
    SELECT g AS event_type, lag, n_pairs, acf_value FROM (
    SELECT g, 1 AS lag, c1 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n1 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 2 AS lag, c2 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n2 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 3 AS lag, c3 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n3 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 4 AS lag, c4 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n4 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 5 AS lag, c5 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n5 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 6 AS lag, c6 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n6 / den END, 6) AS acf_value
    FROM agg
    UNION ALL
    SELECT g, 7 AS lag, c7 AS n_pairs,
           round(CASE WHEN den <> 0 THEN n7 / den END, 6) AS acf_value
    FROM agg
    ) ORDER BY event_type, lag
""",
    doc="Sample autocorrelation (lags 1-7) of each event type's daily "
    "value series — the Box-Jenkins memory/seasonality diagnostic read "
    "before choosing Holt vs Holt-Winters. Per-key lead windows "
    "(bounded per key, no global sort), shared full-series round8 "
    "mean, decimal-cast-fenced cross-product sums; one shuffle each "
    "for the mean, the windows, and the collapse "
    "(operators/timeseries.py::acf).",
)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import acf

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("_day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("_y")
        )
    )
    return acf(ev, "event_type", "_day", "_y", max_lag=7)


@register(
    "text_rake_keywords",
    """
    WITH tk AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
               unnest(toks) AS tok
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents)
    ),
    seg AS (
        SELECT doc_id, pos, lower(tok) AS tok,
               sum(CASE WHEN lower(tok) IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'that') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS pid,
               lower(tok) IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'that') AS stop
        FROM tk WHERE tok <> ''
    ),
    occ AS (
        SELECT string_agg(tok, ' ' ORDER BY pos) AS phrase,
               CAST(count(*) AS BIGINT) AS len
        FROM seg WHERE NOT stop GROUP BY doc_id, pid
    ),
    ws AS (
        SELECT w, round(CAST(sum(len) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE), 8) AS wscore
        FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM occ)
        GROUP BY 1
    ),
    ph AS (
        SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(max(len) AS BIGINT) AS n_words
        FROM occ GROUP BY 1
    ),
    px AS (
        SELECT phrase, n_words, n_occurrences,
               unnest(string_split(phrase, ' ')) AS w
        FROM ph
    )
    SELECT px.phrase, px.n_words, px.n_occurrences,
           round(CAST(sum(CAST(ws.wscore AS DECIMAL(28,8))) AS DOUBLE), 6)
               AS score
    FROM px JOIN ws ON ws.w = px.w
    GROUP BY 1, 2, 3
    ORDER BY score DESC, px.phrase LIMIT 20
""",
    doc="RAKE keyphrase extraction over the corpus: maximal "
    "stopword-free token runs are candidate phrases, words score "
    "degree/frequency across all phrase occurrences, phrases sum "
    "their member-word scores; top-20 by (score, phrase). Per-doc "
    "running-stopword-count segmentation (doc-bounded window), one "
    "grouped pass for word stats, vocabulary-bounded scoring join, "
    "TakeOrdered top-k — round8 word scores and decimal-fenced "
    "phrase sums keep both engines exact "
    "(operators/text.py::rake_keywords).",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import rake_keywords

    docs = load_table_parallel(spark, sf_dir, "documents")
    return rake_keywords(docs, "text", "doc_id", k=20)


# ---------------------------------------------------------------------------
# Round-16: vocabulary coverage curve
# ---------------------------------------------------------------------------


@register(
    "text_vocab_coverage",
    f"""
    WITH tok AS (
        SELECT unnest({TOKS}) AS token FROM documents
    ),
    vocab AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1
    ),
    w AS (
        SELECT token, c,
               sum(c) OVER (ORDER BY c DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER () AS total
        FROM vocab
    ),
    q AS (SELECT CAST(unnest([0.5, 0.75, 0.9]) AS DOUBLE) AS coverage_target)
    SELECT coverage_target,
           CAST(sum(CASE WHEN cum - c < coverage_target * total
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(max(total) AS BIGINT) AS total_tokens
    FROM w CROSS JOIN q
    GROUP BY 1
    """,
    doc="Vocabulary coverage curve: the smallest top-k token prefix (by "
    "frequency, unique token tiebreak) covering 50/75/90% of corpus "
    "token mass — the tokenizer-vocab-sizing readout next to the Zipf "
    "fit. Counts are integer-valued doubles so every cumulative "
    "comparison is exact on both engines. The global running sum is "
    "the skew-safe two_phase_running_sum (partition by frequency "
    "range-bucket + broadcast offsets above its 4M-row guard — a "
    "vocabulary never sorts in one task at 100 TB); thresholds join as "
    "a 3-row broadcast, never a driver loop.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens
    from ..operators.timeseries import two_phase_running_sum

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .withColumn("neg_c", -F.col("c"))
    )
    # two_phase_running_sum's bounds probe executes its input once at
    # construction time; checkpoint the (vocab-sized, tiny vs corpus)
    # count table so the corpus explode+groupBy runs once, not twice —
    # the same eager trade minhash_lsh_pairs documents.
    vocab = vocab.localCheckpoint()
    w = two_phase_running_sum(
        vocab,
        value="c",
        order=("neg_c", "token"),
        bucket_on="neg_c",
        out="cum",
    )
    thr = spark.createDataFrame(
        [(0.5,), (0.75,), (0.9,)], "coverage_target double"
    )
    reached = F.when(
        F.col("cum") - F.col("c") < F.col("coverage_target") * F.col("cum_total"), 1
    ).otherwise(0)
    return (
        w.crossJoin(F.broadcast(thr))
        .groupBy("coverage_target")
        .agg(
            F.sum(reached).cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.max("cum_total").cast("bigint").alias("total_tokens"),
        )
    )
