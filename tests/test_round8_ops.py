"""Unit tests for the round-8 second-wave operators: transition matrix,
KS distance, Benford profile, time-weighted mean, largest-remainder
allocation, Adamic-Adar, BM25. Each is checked against a hand-computed
ground truth small enough to verify by eye (the oracle gate covers the
testdata-scale behavior; these pin the edge semantics)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.drift import ks_statistic
from bankcreditunion_datapipeline_spark.operators.expectations import (
    benford_profile,
)
from bankcreditunion_datapipeline_spark.operators.graph import (
    adamic_adar_pairs,
)
from bankcreditunion_datapipeline_spark.operators.sampling import (
    proportional_allocation,
)
from bankcreditunion_datapipeline_spark.operators.temporal import (
    time_weighted_mean,
    transition_matrix,
)
from bankcreditunion_datapipeline_spark.operators.text import bm25_scores


def _ts(minutes):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


# -- transition_matrix ------------------------------------------------------


def test_transition_matrix_counts_and_permille(spark):
    rows = [
        (1, _ts(0), 10, "a"),
        (1, _ts(1), 11, "b"),
        (1, _ts(2), 12, "a"),
        (2, _ts(0), 20, "a"),
        (2, _ts(1), 21, "b"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, eid long, s string"
    )
    out = {
        (r.prev_state, r.next_state): (r.n_trans, r.permille)
        for r in transition_matrix(df, "k", ["ts", "eid"], "s").collect()
    }
    # transitions: a->b (x2), b->a (x1); from 'a' total 2, from 'b' total 1
    assert out == {("a", "b"): (2, 1000), ("b", "a"): (1, 1000)}


def test_transition_matrix_tiebreak_on_equal_ts(spark):
    # same timestamp: eid orders the sequence deterministically
    rows = [(1, _ts(0), 2, "y"), (1, _ts(0), 1, "x")]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, eid long, s string"
    )
    out = transition_matrix(df, "k", ["ts", "eid"], "s").collect()
    assert [(r.prev_state, r.next_state) for r in out] == [("x", "y")]


# -- ks_statistic -----------------------------------------------------------


def test_ks_identical_distributions_zero(spark):
    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v long")
    out = ks_statistic(a, a, "v").collect()[0]
    assert out.ks_e6 == 0 and out.n_left == 4 and out.n_right == 4


def test_ks_disjoint_distributions_full(spark):
    a = spark.createDataFrame([(1,), (2,)], "v long")
    b = spark.createDataFrame([(10,), (11,)], "v long")
    out = ks_statistic(a, b, "v").collect()[0]
    # CDFs separate completely: D = 1 -> 1_000_000, at the left support max
    assert out.ks_e6 == 1_000_000 and out.ks_at == 2


def test_ks_hand_value_and_smallest_arg(spark):
    # left {1,1,3}, right {1,3,3}: at v=1 |2*3-1*3|=3; at v=3 |3*3-3*3|=0
    # D = 3/9 -> 333333, achieved first (and only) at v=1
    a = spark.createDataFrame([(1,), (1,), (3,)], "v long")
    b = spark.createDataFrame([(1,), (3,), (3,)], "v long")
    out = ks_statistic(a, b, "v").collect()[0]
    assert out.ks_e6 == 333_333 and out.ks_at == 1


def test_ks_grouped(spark):
    a = spark.createDataFrame([("g", 1), ("h", 1)], "g string, v long")
    b = spark.createDataFrame([("g", 1), ("h", 9)], "g string, v long")
    out = {
        r.g: r.ks_e6
        for r in ks_statistic(a, b, "v", group_cols=["g"]).collect()
    }
    assert out == {"g": 0, "h": 1_000_000}


def test_ks_empty_side_raises(spark):
    a = spark.createDataFrame([(1,)], "v long")
    b = spark.createDataFrame([], "v long")
    with pytest.raises(Exception, match="ks_statistic"):
        ks_statistic(a, b, "v").collect()


# -- benford_profile --------------------------------------------------------


def test_benford_scaffold_and_permille(spark):
    # 10 values, first digits: 1 x5, 2 x3, 9 x2; digits 3..8 scaffolded 0
    vals = [1, 10, 19, 100, 150, 2, 25, 299, 9, 95]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r.digit: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n == 5 and out[1].obs_permille == 500
    assert out[2].n == 3 and out[2].obs_permille == 300
    assert out[9].n == 2 and out[9].obs_permille == 200
    assert out[3].n == 0 and out[3].obs_permille == 0
    # dev vs the baked constants
    assert out[1].dev_permille == abs(500 - 301)
    assert out[3].dev_permille == 125


def test_benford_nonpositive_raises(spark):
    df = spark.createDataFrame([(0,)], "v long")
    with pytest.raises(Exception, match="benford_profile"):
        benford_profile(df, "v").collect()


# -- time_weighted_mean -----------------------------------------------------


def test_twm_step_function(spark):
    # value 100 held 60s, then 200 held 180s: twm = (100*60+200*180)/240
    rows = [(1, _ts(0), 100), (1, _ts(1), 200), (1, _ts(4), 999)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v long")
    out = time_weighted_mean(df, "k", "ts", "v").collect()[0]
    assert out.span_s == 240
    assert out.twm == (100 * 60 + 200 * 180) // 240


def test_twm_single_observation_omitted(spark):
    df = spark.createDataFrame([(1, _ts(0), 5)], "k long, ts timestamp, v long")
    assert time_weighted_mean(df, "k", "ts", "v").count() == 0


def test_twm_zero_span_omitted(spark):
    # two observations in the same second: span 0 -> no row (not a div0)
    df = spark.createDataFrame(
        [(1, _ts(0), 5, 1), (1, _ts(0), 7, 2)],
        "k long, ts timestamp, v long, eid long",
    )
    assert (
        time_weighted_mean(df, "k", "ts", "v", order_tiebreak=["eid"]).count()
        == 0
    )


# -- proportional_allocation ------------------------------------------------


def test_allocation_sums_exactly_and_ranks_remainders(spark):
    # counts 5, 3, 1 over total 10: floors 5,3,1=9... grand=9:
    # floor = n*10 div 9 -> 5,3,1; sum=9, leftover 1 -> largest rem
    # rems: 5*10%9=5, 3*10%9=3, 1*10%9=1 -> extra goes to 'a'
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1)], "g string, n long"
    )
    out = {
        r.g: r.alloc
        for r in proportional_allocation(df, ["g"], "n", 10).collect()
    }
    assert out == {"a": 6, "b": 3, "c": 1}
    assert sum(out.values()) == 10


def test_allocation_tie_broken_by_group_asc(spark):
    # equal counts, total not divisible: leftover goes to the LOWEST group
    df = spark.createDataFrame(
        [("b", 1), ("a", 1), ("c", 1)], "g string, n long"
    )
    out = {
        r.g: r.alloc
        for r in proportional_allocation(df, ["g"], "n", 4).collect()
    }
    assert out == {"a": 2, "b": 1, "c": 1}


def test_allocation_zero_count_group(spark):
    df = spark.createDataFrame([("a", 2), ("z", 0)], "g string, n long")
    out = {
        r.g: r.alloc
        for r in proportional_allocation(df, ["g"], "n", 7).collect()
    }
    assert out == {"a": 7, "z": 0}


# -- adamic_adar_pairs ------------------------------------------------------


def test_adamic_adar_hand_graph(spark):
    import math

    # dst 10 shared by {1,2,3} (deg 3), dst 20 by {1,2} (deg 2),
    # dst 30 only by {3} (deg 1 -> excluded)
    edges = [(1, 10), (2, 10), (3, 10), (1, 20), (2, 20), (3, 30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        (r.src_a, r.src_b): (r.shared, r.aa_e6)
        for r in adamic_adar_pairs(df).collect()
    }
    w3 = math.floor(1_000_000 / math.log(3))
    w2 = math.floor(1_000_000 / math.log(2))
    assert out[(1, 2)] == (2, w3 + w2)
    assert out[(1, 3)] == (1, w3)
    assert out[(2, 3)] == (1, w3)
    assert len(out) == 3


def test_adamic_adar_budget_raises(spark):
    edges = [(i, 99) for i in range(10)]  # one hub: 45 pairs
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(Exception, match="adamic_adar_pairs"):
        adamic_adar_pairs(df, max_pair_rows=10).collect()


# -- bm25_scores ------------------------------------------------------------


def test_bm25_hand_score(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "x x y"),
            (2, "x z z z"),
            (3, "w w w w w"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_terms, r.bm25_u)
        for r in bm25_scores(docs, ["x"]).collect()
    }
    n, total = 3, 12
    avgdl = total // n  # 4
    df_x = 2
    idf = math.floor(1e6 * math.log((2 * n + 2) / (2 * df_x + 1)))

    def contrib(tf, dl):
        return (idf * tf * 2200 * avgdl) // (
            1000 * tf * avgdl + 12 * (25 * avgdl + 75 * dl)
        )

    assert out[1] == (1, contrib(2, 3))
    assert out[2] == (1, contrib(1, 4))
    assert 3 not in out  # no matching term -> no row


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 9)]
        + [(9, "common rare"), (10, "common other")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.bm25_u
        for r in bm25_scores(docs, ["common", "rare"]).collect()
    }
    # doc 9 matches both terms; rare's idf dominates every common-only doc
    assert out[9] > max(v for k, v in out.items() if k != 9)


# -- robust_outliers --------------------------------------------------------


def test_robust_outliers_flags_tail(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        robust_outliers,
    )

    vals = [10, 11, 12, 13, 14, 1000]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r.v: (r.z_e3, r.outlier) for r in robust_outliers(df, "v").collect()}
    # median 12.5 -> med2=25; d2 of 1000 = 1975; mads: d2s {5,3,1,1,3,1975}
    # sorted {1,1,3,3,5,1975} -> mad4 = 2*(3+3)/2 = ... quantile_cont(0.5)=3
    # mad4=6; z(1000) = 1975*2000//6 = 658333
    assert out[1000] == (658333, True)
    assert out[12] == (1 * 2000 // 6, False)


def test_robust_outliers_degenerate_mad(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        robust_outliers,
    )

    df = spark.createDataFrame([(5,)] * 4 + [(9,)], "v long")
    out = {r.v: (r.z_e3, r.outlier) for r in robust_outliers(df, "v").collect()}
    assert out[5] == (None, False)
    assert out[9] == (None, True)


# -- gini_e6 ----------------------------------------------------------------


def test_gini_perfect_equality_zero(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import gini_e6

    df = spark.createDataFrame([(i, 100) for i in range(1, 6)], "id long, v long")
    out = gini_e6(df, "v", "id").collect()[0]
    assert out.gini_e6 == 0 and out.n == 5 and out.total == 500


def test_gini_total_concentration(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import gini_e6

    # one holder of everything among n=4: gini = (n-1)/n = 0.75
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 80)], "id long, v long"
    )
    out = gini_e6(df, "v", "id").collect()[0]
    assert out.gini_e6 == 750_000


def test_gini_coarsens_past_the_lane(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import gini_e6

    # n*total = 3.6e18 > 9.2e17: the operator must coarsen (digits 1+19
    # - 17 = 3 -> c=1000), not overflow and not raise; equality still 0
    df = spark.createDataFrame(
        [(1, 900_000_000_000_000_000), (2, 900_000_000_000_000_000)],
        "id long, v long",
    )
    out = gini_e6(df, "v", "id").collect()[0]
    assert out.coarse_pow == 3 and out.gini_e6 == 0
    assert out.total == 1_800_000_000_000_000_000


def test_gini_coarse_pow_zero_on_small_corpus(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import gini_e6

    df = spark.createDataFrame([(i, 100 * i) for i in range(1, 5)], "id long, v long")
    out = gini_e6(df, "v", "id").collect()[0]
    assert out.coarse_pow == 0


# -- quota_sample -----------------------------------------------------------


def test_quota_sample_exact_counts_and_determinism(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        quota_sample,
    )

    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(100, 103)]
    df = spark.createDataFrame(rows, "g string, id long")
    alloc = spark.createDataFrame(
        [("a", 4), ("b", 5)], "g string, alloc long"
    )
    out1 = quota_sample(df, ["g"], alloc, "alloc", "id")
    got1 = sorted((r.g, r.id) for r in out1.collect())
    # exact count for 'a'; 'b' under-fills with all 3 rows, no borrowing
    assert sum(1 for g, _ in got1 if g == "a") == 4
    assert sum(1 for g, _ in got1 if g == "b") == 3
    # deterministic: same selection on re-run and under repartition
    out2 = quota_sample(df.repartition(7), ["g"], alloc, "alloc", "id")
    assert got1 == sorted((r.g, r.id) for r in out2.collect())


def test_benford_null_group_is_a_stratum(spark):
    # NULL group key must keep its own counts (null-safe scaffold join);
    # regression for the adversarial-fuzz DIVIDE_BY_ZERO find
    df = spark.createDataFrame(
        [(None, 12), (None, 15), ("g", 9)], "g string, v long"
    )
    out = {
        (r.g, r.digit): (r.n, r.obs_permille)
        for r in benford_profile(df, "v", group_cols=["g"]).collect()
    }
    assert out[(None, 1)] == (2, 1000)
    assert out[("g", 9)] == (1, 1000)
    assert out[(None, 9)] == (0, 0)


# -- sessionize (batch, operators/temporal.py) ------------------------------


def test_sessionize_gap_and_tiebreak(spark):
    from bankcreditunion_datapipeline_spark.operators.temporal import (
        sessionize,
    )

    # u1: events at 0, 10, 45 min (gap 35 >= 30 starts session 2);
    # u1 also has two events at the SAME ts — event_id tiebreak keeps
    # the order (and the sid assignment) deterministic.
    rows = [
        ("u1", _ts(0), "e1"),
        ("u1", _ts(10), "e2"),
        ("u1", _ts(10), "e3"),
        ("u1", _ts(45), "e4"),
        ("u2", _ts(0), "e5"),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid string")
    out = {
        r.eid: r.sid
        for r in sessionize(
            df, "user", "ts", 30, order_tiebreak=["eid"]
        ).collect()
    }
    assert out == {"e1": 1, "e2": 1, "e3": 1, "e4": 2, "e5": 1}


def test_sessionize_exact_gap_boundary_starts_new_session(spark):
    from bankcreditunion_datapipeline_spark.operators.temporal import (
        sessionize,
    )

    # gap == threshold (>= semantics): exactly 30 min apart -> new session
    rows = [("u", _ts(0), "a"), ("u", _ts(30), "b"), ("u", _ts(59), "c")]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid string")
    out = {
        r.eid: r.sid
        for r in sessionize(
            df, "user", "ts", 30, order_tiebreak=["eid"]
        ).collect()
    }
    assert out == {"a": 1, "b": 2, "c": 2}


# -- bpe_pair_counts (operators/text.py) ------------------------------------


def test_bpe_pairs_multiplicity_and_frequency_weighting(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        bpe_pair_counts,
    )

    # 'aaa' contributes 'aa' twice per occurrence; the word appears in
    # two docs (freq 2) -> total 4 but n_words 1. Single-char words are
    # guarded out before the sequence explode.
    df = spark.createDataFrame(
        [("aaa b xy",), ("aaa",)], "text string"
    )
    out = {r.pair: (r.n_words, r.total) for r in bpe_pair_counts(df).collect()}
    assert out["aa"] == (1, 4)
    assert out["xy"] == (1, 1)
    assert "b" not in out and " b" not in out


def test_bpe_pairs_shared_pair_counts_distinct_words(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        bpe_pair_counts,
    )

    # 'ab' appears in two distinct vocab words -> n_words 2, totals add
    df = spark.createDataFrame([("abc abd abc",)], "text string")
    out = {r.pair: (r.n_words, r.total) for r in bpe_pair_counts(df).collect()}
    assert out["ab"] == (2, 3)
    assert out["bc"] == (1, 2)
    assert out["bd"] == (1, 1)


# -- theil_sen_slope_e6 (operators/analytics.py) -----------------------------


def test_theil_sen_outlier_immune(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        theil_sen_slope_e6,
    )

    # slope 10/step everywhere except one wild outlier point: the
    # median of pairwise slopes stays 10e6 (an OLS fit would not)
    pts = spark.createDataFrame(
        [(0, 0), (1, 10), (2, 20), (3, 1000)], "x long, y long"
    )
    row = theil_sen_slope_e6(pts, "x", "y").collect()[0]
    assert (row.n_points, row.n_pairs, row.ts_slope_e6) == (4, 6, 10_000_000)


def test_theil_sen_negative_slope_exact(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        theil_sen_slope_e6,
    )

    pts = spark.createDataFrame(
        [(0, 100), (1, 50), (2, 0)], "x long, y long"
    )
    row = theil_sen_slope_e6(pts, "x", "y").collect()[0]
    # negative dividend: div truncates toward zero in BOTH engines
    assert row.ts_slope_e6 == -50_000_000


def test_theil_sen_budget_fires(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        theil_sen_slope_e6,
    )

    pts = spark.createDataFrame(
        [(i, i) for i in range(200)], "x long, y long"
    )
    with pytest.raises(Exception, match="theil_sen_slope_e6"):
        theil_sen_slope_e6(pts, "x", "y", max_pair_rows=100).collect()


# -- dow_residuals (operators/analytics.py) ----------------------------------


def test_dow_residuals_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        dow_residuals,
    )

    # 2024-01-01 and 2024-01-08 are Mondays (dow 0), 2024-01-02 Tuesday
    daily = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), 10),
            (datetime.date(2024, 1, 8), 30),
            (datetime.date(2024, 1, 2), 5),
        ],
        "day date, v long",
    )
    got = {
        r.day: (r.dow, r.dow_avg, r.resid_permille)
        for r in dow_residuals(daily, "day", "v").collect()
    }
    assert got[datetime.date(2024, 1, 1)] == (0, 20, -500)
    assert got[datetime.date(2024, 1, 8)] == (0, 20, 500)
    assert got[datetime.date(2024, 1, 2)] == (1, 5, 0)


# -- change_point_mean_shift (operators/drift.py) -----------------------------


def test_change_point_locates_the_shift(spark):
    from bankcreditunion_datapipeline_spark.operators.drift import (
        change_point_mean_shift,
    )

    # level 10 for idx 0..4, level 100 for idx 5..9: split at idx 4
    rows = [(i, 10) for i in range(5)] + [(i, 100) for i in range(5, 10)]
    df = spark.createDataFrame(rows, "idx long, v long")
    r = change_point_mean_shift(df, "idx", "v").collect()[0]
    assert r.split_at == 4
    assert r.left_mean_e6 == 10_000_000
    assert r.right_mean_e6 == 100_000_000
    assert r.abs_shift_e6 == 90_000_000


def test_change_point_tiebreak_earliest(spark):
    from bankcreditunion_datapipeline_spark.operators.drift import (
        change_point_mean_shift,
    )

    # constant series: every split has diff 0 -> earliest split wins
    df = spark.createDataFrame([(i, 5) for i in range(4)], "idx long, v long")
    assert change_point_mean_shift(df, "idx", "v").collect()[0].split_at == 0
