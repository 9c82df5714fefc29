"""Known-value tests for the round-6 operator wave: triangles, degree
stats, TWAP, privacy audit, co-occurrence, funnel, categorical profile."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.operators.basket import (
    co_occurrence_pairs,
)
from lakehouse_platform_nyc_taxi_spark.operators.graph import (
    degree_stats,
    triangle_count,
)
from lakehouse_platform_nyc_taxi_spark.operators.privacy import (
    k_anonymity,
    suppression_summary,
)
from lakehouse_platform_nyc_taxi_spark.operators.profile import (
    profile_categorical,
)
from lakehouse_platform_nyc_taxi_spark.operators.sessionize import (
    funnel_counts,
)
from lakehouse_platform_nyc_taxi_spark.operators.timeseries import twap


# ------------------------------------------------------------------ graph
def test_triangle_count_k4_and_path(spark):
    # K4: every vertex sits in C(3,2)=3 triangles; a pendant path node in 0
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges.append((3, 4))  # pendant
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}


def test_triangle_count_ignores_direction_dupes_and_loops(spark):
    # same triangle given twice in mixed directions + a self loop
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (2, 2)],
        "src int, dst int",
    )
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_degree_stats_directed_weights(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0), (3, 1, 2.5)],
        "src int, dst int, w double",
    )
    got = {
        r.node: (r.out_degree, r.in_degree, r.out_weight, r.in_weight)
        for r in degree_stats(df, weight="w").collect()
    }
    assert got[1] == (2, 1, 4.0, 2.5)
    assert got[2] == (0, 1, 0.0, 3.0)
    assert got[3] == (1, 1, 2.5, 1.0)


# ------------------------------------------------------------------- twap
def test_twap_weights_by_holding_time(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # value 10 held 6h, value 20 held 18h (to midnight):
        # twap = (10*6 + 20*18) / 24 = 17.5
        ("a", t0, 10.0, 1),
        ("a", t0 + dt.timedelta(hours=6), 20.0, 2),
        # single observation: twap == its value regardless of arrival time
        ("b", t0 + dt.timedelta(hours=23), 42.0, 3),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, eid long")
    got = {
        r.series: (r.twap, r.n_obs)
        for r in twap(df, keys=("series",), tiebreak="eid").collect()
    }
    assert got["a"] == (17.5, 2)
    assert got["b"] == (42.0, 1)


def test_twap_quarter_and_second_buckets(spark):
    t0 = dt.datetime(2024, 1, 15)
    rows = [
        # quarter bucket: 10 held Jan15..Feb15 (31d), 40 held Feb15..Apr1
        # (46d, leap Feb) -> twap = (10*31 + 40*46) / 77 = 27.922077922
        ("a", t0, 10.0, 1),
        ("a", dt.datetime(2024, 2, 15), 40.0, 2),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, eid long")
    [r] = twap(df, keys=("series",), bucket="quarter", tiebreak="eid").collect()
    assert r.bucket_start == dt.datetime(2024, 1, 1)
    assert abs(r.twap - (10 * 31 + 40 * 46) / 77) < 1e-9

    srows = [
        # second bucket: 1.0 held 250ms, 3.0 held to the second's end
        ("s", dt.datetime(2024, 1, 1, 0, 0, 5, 0), 1.0, 1),
        ("s", dt.datetime(2024, 1, 1, 0, 0, 5, 250_000), 3.0, 2),
    ]
    sdf = spark.createDataFrame(srows, "series string, ts timestamp, value double, eid long")
    [r] = twap(sdf, keys=("series",), bucket="second", tiebreak="eid").collect()
    assert abs(r.twap - (1.0 * 0.25 + 3.0 * 0.75)) < 1e-9

    with pytest.raises(ValueError, match="unsupported twap bucket"):
        twap(df, keys=("series",), bucket="millisecond")


def test_twap_tiebreak_orders_equal_timestamps(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0, 10.0, 2), ("a", t0, 20.0, 1)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, eid long")
    [r] = twap(df, keys=("series",), tiebreak="eid").collect()
    # eid 1 holds 0 seconds, eid 2 holds the whole day -> twap = 10
    assert r.twap == 10.0


# ---------------------------------------------------------------- privacy
def test_k_anonymity_flags_and_l_diversity(spark):
    rows = [
        ("US", "A", 1), ("US", "A", 1), ("US", "A", 2),
        ("US", "A", 3), ("US", "A", 3),           # size 5, l=3
        ("DE", "B", 7), ("DE", "B", 7),           # size 2, l=1
    ]
    df = spark.createDataFrame(rows, "nat string, seg string, sens int")
    got = {
        (r.nat, r.seg): (r.group_size, r.l_diversity, r.k_anonymous, r.l_diverse)
        for r in k_anonymity(df, ["nat", "seg"], sensitive="sens", k=5, min_l=3).collect()
    }
    assert got[("US", "A")] == (5, 3, True, True)
    assert got[("DE", "B")] == (2, 1, False, False)

    [s] = suppression_summary(df, ["nat", "seg"], k=5).collect()
    assert (s.n_rows, s.n_suppressed) == (7, 2)
    assert abs(s.suppression_rate - 2 / 7) < 1e-12


# ----------------------------------------------------------------- basket
def test_co_occurrence_counts_pairs_once_per_basket(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "y"),  # duplicate item: pair counted once
        (2, "x"), (2, "y"), (2, "z"),
    ]
    df = spark.createDataFrame(rows, "b int, i string")
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in co_occurrence_pairs(df, "b", "i").collect()
    }
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}


def test_co_occurrence_basket_cap_is_deterministic(spark):
    rows = [(1, c) for c in "abcd"]
    df = spark.createDataFrame(rows, "b int, i string")
    got = {
        (r.item_a, r.item_b)
        for r in co_occurrence_pairs(df, "b", "i", max_basket_size=2).collect()
    }
    # cap keeps the 2 smallest items of the sorted basket
    assert got == {("a", "b")}


# ----------------------------------------------------------------- funnel
def test_funnel_requires_time_order(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2 purchased BEFORE clicking -> purchase must not count
        (2, "view", t(0)), (2, "purchase", t(1)), (2, "click", t(2)),
        # u3 never viewed -> nothing counts
        (3, "click", t(0)), (3, "purchase", t(1)),
    ]
    df = spark.createDataFrame(rows, "u long, et string, ts timestamp")
    got = {
        r.stage: r.n_users
        for r in funnel_counts(
            df, "u", "et", "ts", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_funnel_greedy_uses_earliest_valid_event(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    # the user's SECOND view is followed by a click; greedy (first view)
    # still converts because a later click exists after the first view
    rows = [
        (1, "view", t(0)), (1, "view", t(10)),
        (1, "click", t(5)), (1, "purchase", t(6)),
    ]
    df = spark.createDataFrame(rows, "u long, et string, ts timestamp")
    got = {
        r.stage: r.n_users
        for r in funnel_counts(
            df, "u", "et", "ts", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_stage_cap_bounds_buffer_and_lower_bounds_counts(spark):
    from lakehouse_platform_nyc_taxi_spark.operators.sessionize import (
        _per_user_stage_times,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    # u1 is pathological: 50 views, and the only click lands AFTER every
    # view, so conversion doesn't depend on which views survive the cap.
    # u2's qualifying click is their 3rd (beyond cap=2): with the cap the
    # fold only sees clicks at t1, t2 — both BEFORE u2's first view at
    # t5 — so u2 converts view but not click (documented lower bound).
    rows = (
        [(1, "view", t(m)) for m in range(50)]
        + [(1, "click", t(55))]
        + [(2, "click", t(1)), (2, "click", t(2)), (2, "view", t(5)),
           (2, "click", t(9))]
    )
    df = spark.createDataFrame(rows, "u long, et string, ts timestamp")
    stages = ["view", "click"]

    per_user = _per_user_stage_times(df, "u", "et", "ts", stages, 2)
    widths = per_user.selectExpr(
        "greatest(size(_ts_0), size(_ts_1)) as w"
    ).collect()
    # the aggregation buffer (hence the arrays) never exceeds the cap
    assert max(r.w for r in widths) == 2

    got = {
        r.stage: r.n_users
        for r in funnel_counts(
            df, "u", "et", "ts", stages, max_events_per_stage=2
        ).collect()
    }
    assert got == {"view": 2, "click": 1}
    # uncapped: u2's 3rd click (after their view) converts
    uncapped = {
        r.stage: r.n_users
        for r in funnel_counts(df, "u", "et", "ts", stages).collect()
    }
    assert uncapped == {"view": 2, "click": 2}


def test_funnel_stage_cap_validates(spark):
    df = spark.createDataFrame([(1, "view", dt.datetime(2024, 1, 1))],
                               "u long, et string, ts timestamp")
    with pytest.raises(ValueError, match="max_events_per_stage"):
        funnel_counts(df, "u", "et", "ts", ["view"], max_events_per_stage=0)


# ---------------------------------------------------------------- profile
def test_profile_categorical_counts_and_deterministic_mode(spark):
    rows = [("en", None), ("en", "web"), ("fr", "web"), ("fr", "book")]
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        r.col_name: (r.n_rows, r.n_null, r.n_distinct, r.top_value, r.top_count)
        for r in profile_categorical(df, ["lang", "source"]).collect()
    }
    # lang: en/fr tie at 2 -> smallest value wins
    assert got["lang"] == (4, 0, 2, "en", 2)
    assert got["source"] == (4, 1, 2, "web", 2)


# ------------------------------------------------------------- r12 wave
def test_entropy_l_diversity_flags_skew_distinct_count_misses(spark):
    """A 2-value group that is 99%-one-value passes count-l but fails
    entropy-l (entropy << ln 2); a balanced 2-value group passes both."""
    from lakehouse_platform_nyc_taxi_spark.operators.privacy import (
        entropy_l_diversity,
    )

    rows = [("skew", "a")] * 99 + [("skew", "b")] + [("bal", "a")] * 5 + [
        ("bal", "b")
    ] * 5
    df = spark.createDataFrame(rows, "qi string, s string")
    got = {r.qi: r for r in entropy_l_diversity(df, ["qi"], "s", l=2).collect()}
    assert got["bal"].entropy_l_diverse
    assert not got["skew"].entropy_l_diverse
    assert got["skew"].entropy < 0.1 < got["bal"].entropy


def test_attribution_time_decay_shares_and_direct(spark):
    """Two equidistant touches split a conversion 50/50; a no-touch
    conversion credits 'direct' in full; decayed weights normalize to
    the conversion's value exactly."""
    from lakehouse_platform_nyc_taxi_spark.operators.sessionize import (
        attribution_time_decay,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: two touches exactly 1h before the purchase
        (1, 1, "ad", t0 - dt.timedelta(hours=1), 0.0),
        (2, 1, "email", t0 - dt.timedelta(hours=1), 0.0),
        (3, 1, "purchase", t0, 10.0),
        # user 2: no touches
        (4, 2, "purchase", t0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz, value double"
    )
    got = {
        r.channel: r
        for r in attribution_time_decay(
            df, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert got["direct"].attributed_value == 7.0
    assert abs(got["ad"].attributed_value - 5.0) < 1e-6
    assert abs(got["email"].attributed_value - 5.0) < 1e-6
    assert got["ad"].n_credits == 1 and got["direct"].n_credits == 1


def test_cuped_reduces_variance_when_pre_post_correlate(spark):
    """y strongly driven by the pre-period covariate -> the adjusted
    per-arm variance must drop; user counts and arm split preserved."""
    from lakehouse_platform_nyc_taxi_spark.operators.stats import (
        cuped_adjustment,
    )

    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    for u in range(40):
        x = float(u % 10)
        rows.append((u, pre, x))            # pre-period value
        rows.append((u, post, 2.0 * x + 1)) # post strongly correlated
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    got = cuped_adjustment(df, "user_id", "ts", "value", "2024-01-16").collect()
    assert len(got) == 2
    assert sum(r.n_users for r in got) == 40
    for r in got:
        assert r.var_post_adjusted < r.var_post
        assert abs(r.theta - 2.0) < 0.2


def test_pareto_share_minimal_prefix_counts(spark, monkeypatch, tmp_path):
    """orders_pareto_share on a toy orders table: revenues 10/5/3/2 ->
    1 customer covers 50%, 3 cover 80%, top share 0.5."""
    from lakehouse_platform_nyc_taxi_spark.harness import registry

    rows = [(1, 10.0), (2, 5.0), (3, 3.0), (4, 2.0)]
    df = spark.createDataFrame(rows, "o_custkey long, o_totalprice double")
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = registry()["orders_pareto_share"].fn(spark, str(tmp_path)).collect()[0]
    assert got.n_customers == 4
    assert got.top50_customers == 1
    assert got.top80_customers == 3
    assert got.top1_share == 0.5


def test_mann_whitney_matches_bruteforce_midranks(spark):
    """mann_whitney_u vs a direct Python computation: same md5 arm
    split (replicated via hashlib), midranks with ties, tie-corrected
    variance. Values must match to double precision."""
    import hashlib
    import math

    from lakehouse_platform_nyc_taxi_spark.operators.stats import (
        mann_whitney_u,
    )

    # one event per user -> per-user sum == value; duplicate values
    # across users force real midrank ties
    vals = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 7.0, 8.0, 8.0, 9.0, 11.0]
    rows = [(u, v) for u, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = mann_whitney_u(df, "user_id", "value").collect()[0]

    def arm(u):
        return int(hashlib.md5(f"{u}|ab".encode()).hexdigest()[:15], 16) % 2

    ranks = {}
    s = sorted(vals)
    for v in set(vals):
        idx = [i + 1 for i, x in enumerate(s) if x == v]
        ranks[v] = sum(idx) / len(idx)
    treat = [v for u, v in rows if arm(u) == 1]
    ctrl = [v for u, v in rows if arm(u) == 0]
    n1, n0 = len(treat), len(ctrl)
    r1 = sum(ranks[v] for v in treat)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n0 + n1
    tie = sum(
        (c := s.count(v)) ** 3 - c for v in set(vals)
    )
    var = n0 * n1 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n0 * n1 / 2) / math.sqrt(var)
    assert got.n_ctrl == n0 and got.n_treat == n1
    assert abs(got.rank_sum_treat - r1) < 1e-9
    assert abs(got.u_treat - u1) < 1e-9
    assert got.tie_term == tie
    assert abs(got.z_score - round(z, 6)) < 1e-6


def test_bootstrap_ci_brackets_mean_and_matches_weights(spark):
    """Poisson bootstrap on a constant metric: every replicate mean is
    exactly that constant, so se_boot == 0 and ci_lo == ci_hi ==
    mean_full. A second, varied metric must produce a CI that brackets
    the full-sample mean with positive spread."""
    from lakehouse_platform_nyc_taxi_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    const = spark.createDataFrame(
        [(u, 5.0) for u in range(30)], "user_id long, value double"
    )
    got = bootstrap_mean_ci(const, "user_id", "value", b_replicates=16).collect()[0]
    assert got.n_users == 30 and got.b_replicates == 16
    assert got.mean_full == 5.0
    assert got.se_boot == 0.0
    assert got.ci_lo == 5.0 and got.ci_hi == 5.0

    varied = spark.createDataFrame(
        [(u, float(u)) for u in range(60)], "user_id long, value double"
    )
    got = bootstrap_mean_ci(varied, "user_id", "value", b_replicates=32).collect()[0]
    assert got.ci_lo <= got.mean_full <= got.ci_hi
    assert got.se_boot > 0
    assert got.ci_lo < got.ci_hi


def test_gram_novelty_first_doc_owns_everything(spark):
    """Doc 0 sees all-novel grams; an identical later doc sees zero
    novelty; a fresh later doc is fully novel; short docs drop out."""
    from lakehouse_platform_nyc_taxi_spark.operators.dedup import (
        gram_novelty,
    )

    rows = [
        (0, "a", "w x y z"),
        (1, "a", "w x y z"),        # exact repeat -> 0 novel
        (2, "b", "p q r s"),        # new content -> all novel
        (3, "b", "p q"),            # too short for 3-grams -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in gram_novelty(df, group_col="source").collect()}
    assert got["a"].n_docs == 2 and got["a"].n_grams == 4
    assert got["a"].n_novel == 2 and got["a"].novelty_rate == 0.5
    assert got["b"].n_docs == 1 and got["b"].n_novel == 2
    assert got["b"].novelty_rate == 1.0


def test_link_prediction_path_graph(spark):
    """Path a-b-c-d: the two-hop non-edges are (a,c), (b,d) with one
    common neighbor each, and (a,d) shares none (3 hops) so it never
    appears; jaccard = 1/(deg sum - cn)."""
    from lakehouse_platform_nyc_taxi_spark.operators.graph import (
        link_prediction,
    )

    edges = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 4.0), (3, 4, 3.0)], "src long, dst long, w double"
    )
    got = {
        (r.node_a, r.node_b): r
        for r in link_prediction(edges, weight="w", backbone_k=100).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    r13 = got[(1, 3)]
    assert r13.common_neighbors == 1
    assert r13.deg_a == 1 and r13.deg_b == 2
    assert abs(r13.jaccard - 0.5) < 1e-9


def test_link_prediction_backbone_cuts_weakest(spark):
    """backbone_k=2 on a triangle keeps the two strongest edges, so the
    dropped edge's endpoints become the predicted missing link."""
    from lakehouse_platform_nyc_taxi_spark.operators.graph import (
        link_prediction,
    )

    edges = spark.createDataFrame(
        [(1, 2, 9.0), (2, 3, 8.0), (1, 3, 1.0)], "src long, dst long, w double"
    )
    got = link_prediction(edges, weight="w", backbone_k=2).collect()
    assert len(got) == 1
    assert (got[0].node_a, got[0].node_b) == (1, 3)
    assert got[0].common_neighbors == 1


def test_sequence_mining_contiguous_support(spark):
    """User 1 walks a>b>c, user 2 loops a>b ten times, user 3 walks
    b>a: min_support=2 keeps 'a>b' (users 1,2) and 'b>a' (user 2's
    loop + user 3); a user repeating a pattern still counts once."""
    from pyspark.sql import functions as F

    from lakehouse_platform_nyc_taxi_spark.operators.sessionize import (
        sequence_mining,
    )

    rows = (
        [(1, t, e) for t, e in enumerate(["a", "b", "c"])]
        + [(2, t, e) for t, e in enumerate(["a", "b"] * 10)]
        + [(3, t, e) for t, e in enumerate(["b", "a"])]
    )
    df = spark.createDataFrame(rows, "u long, t long, e string")
    out = sequence_mining(
        df, "u", "t", "e", max_len=3, min_support=2
    ).collect()
    assert [(r.pattern, r.n_users) for r in out] == [("a>b", 2), ("b>a", 2)]
    assert out[0].support == round(2 / 3, 6)
    # min_support=1 surfaces the 3-gram for user 1 and the loops of 2
    all_p = {
        (r.pattern, r.length): r.n_users
        for r in sequence_mining(
            df, "u", "t", "e", max_len=3, min_support=1
        ).collect()
    }
    assert all_p[("a>b>c", 3)] == 1
    assert all_p[("b>a>b", 3)] == 1  # user 2's loop, counted once
    assert all_p[("b>a", 2)] == 2  # users 2 (loop) and 3
