"""Unit tests for analytics kernel: pivot, year/quarter, top-k, rollup."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.analytics import (
    cube_agg,
    derive_year_quarter,
    distinct_values,
    pivot_by_period,
    rollup_agg,
    top_k,
    top_k_per_group,
)


def _quarters(spark):
    rows = [
        (1, "bank", "2020-03-31", 100),
        (1, "bank", "2020-06-30", 110),
        (2, "credit union", "2020-03-31", 50),
    ]
    return spark.createDataFrame(rows, "charter int, type string, qdate string, assets long")


def test_pivot_by_period_explicit_values(spark):
    out = pivot_by_period(
        _quarters(spark),
        keys=["charter", "type"],
        period_col="qdate",
        measure=F.first("assets"),
        values=["2020-03-31", "2020-06-30"],
    ).orderBy("charter")
    assert out.columns == ["charter", "type", "2020-03-31", "2020-06-30"]
    rows = out.collect()
    assert (rows[0]["2020-03-31"], rows[0]["2020-06-30"]) == (100, 110)
    assert (rows[1]["2020-03-31"], rows[1]["2020-06-30"]) == (50, None)


def test_pivot_inferred_values_matches_explicit(spark):
    df = _quarters(spark)
    a = pivot_by_period(df, ["charter"], "qdate", F.first("assets"))
    b = pivot_by_period(df, ["charter"], "qdate", F.first("assets"), values=["2020-03-31", "2020-06-30"])
    assert sorted(a.columns) == sorted(b.columns)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_derive_year_quarter(spark):
    df = spark.createDataFrame([(datetime.date(2020, 5, 17),)], "d date")
    row = derive_year_quarter(df, "d").collect()[0]
    assert (row.year, row.quarter) == (2020, 2)


def test_top_k_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9), ("b", 8)], "g string, v int"
    )
    top = top_k(df, 2, [F.desc("v")]).collect()
    assert [r.v for r in top] == [9, 8]
    per = top_k_per_group(df, ["g"], [F.desc("v")], k=1)
    assert sorted((r.g, r.v) for r in per.collect()) == [("a", 3), ("b", 9)]


def test_distinct_values_desc(spark):
    df = _quarters(spark)
    vals = [r.qdate for r in distinct_values(df, "qdate").collect()]
    assert vals == ["2020-06-30", "2020-03-31"]


def test_rollup_and_cube(spark):
    df = spark.createDataFrame(
        [("bank", "CA", 1), ("bank", "NY", 2), ("cu", "CA", 4)], "t string, s string, v int"
    )
    r = rollup_agg(df, ["t", "s"], F.sum("v").alias("v")).collect()
    total = [x for x in r if x.t is None and x.s is None]
    assert len(total) == 1 and total[0].v == 7
    c = cube_agg(df, ["t", "s"], F.sum("v").alias("v")).collect()
    ca = [x for x in c if x.t is None and x.s == "CA"]
    assert len(ca) == 1 and ca[0].v == 5


def test_hll_sketch_estimate_close_to_exact(spark, sf_dir):
    from bankcreditunion_datapipeline_spark import queries as _q

    est = {
        r["n_regionkey"]: r["approx_customers"]
        for r in _q.registry()["q66_hll_sketch_rollup"].spark_fn(spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    cust = spark.read.parquet(sf_dir + "/customer.parquet")
    nation = spark.read.parquet(sf_dir + "/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    exact = {
        r["n_regionkey"]: r["n"]
        for r in cust.join(nation, "c_nationkey")
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(2, 0.05 * v), (k, est[k], v)


def test_grouped_topk_agg_matches_window_form_with_giant_group(spark):
    """The two-stage salted top-k (r5 VERDICT #3): one deliberately giant
    group (20k distinct values) plus small groups; the result must equal
    the window form exactly, the plan must contain no WindowExec, and
    stage 1 must aggregate on (keys, salt) -- the bounded-buffer
    structure -- before the final (keys) aggregate."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        grouped_topk_agg,
    )

    rows = [(0, v, (v * 2654435761) % 1_000_003) for v in range(20_000)]
    rows += [(g, v, v * 7) for g in (1, 2) for v in range(5)]
    df = spark.createDataFrame(rows, "g int, item long, score long")
    sort_struct = F.struct(
        (-F.col("score")).alias("neg"), F.col("item").alias("it")
    )
    got = (
        grouped_topk_agg(df, ["g"], sort_struct, k=3, salt_buckets=8)
        .select("g", F.posexplode("top").alias("pos", "t"))
        .select("g", (F.col("pos") + 1).alias("rk"), "t.it", "t.neg")
    )
    want = top_k_per_group(
        df, ["g"], [F.desc("score"), F.asc("item")], 3, rank_out="rk"
    ).select("g", "rk", F.col("item").alias("it"), (-F.col("score")).alias("neg"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "__salt" in plan  # stage-1 aggregate really keyed by salt


def test_grouped_topk_agg_salt_extra_splits_duplicate_values(spark):
    """ADVICE r6: duplicates of ONE struct value all hash to the same
    salt bucket, keeping an O(copies) stage-1 buffer. Passing a
    row-distinguishing `salt_extra` restores the bound (top-k is
    salt-decomposable under ANY assignment) without changing the
    result."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        grouped_topk_agg,
    )

    # group 0: 5000 copies of the SAME (score,item) pair + a few others
    rows = [(0, 7, 100, r) for r in range(5_000)]
    rows += [(0, i, 90 - i, 10_000 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "g int, item long, score long, rid long")
    sort_struct = F.struct(
        (-F.col("score")).alias("neg"), F.col("item").alias("it")
    )
    plain = grouped_topk_agg(df, ["g"], sort_struct, k=3, salt_buckets=8)
    split = grouped_topk_agg(
        df, ["g"], sort_struct, k=3, salt_buckets=8, salt_extra=F.col("rid")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, split.collect())
    )
    # and the salted assignment really spreads the copies: stage-1 of
    # the split form produces more than one bucket for the hot value
    stage1 = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(sort_struct, F.col("rid")), F.lit(8)),
        )
        .filter("item = 7")
        .select("__salt")
        .distinct()
        .count()
    )
    assert stage1 > 1


def test_skyline_2d_survives_huge_span(spark):
    """VERDICT r6 #5: the bucket expression must not overflow BIGINT at
    epoch-micro-scale domains. Points spanning >= 2^58 (where the old
    (x-lo)*buckets form silently wrapped) must still produce the exact
    frontier."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        skyline_2d,
    )

    base = 1 << 58
    pts = [
        (-base, 50),
        (-base + 3, 40),          # dominated on neither axis -> frontier
        (0, 30),
        (base // 2, 35),          # y above previous -> dominated
        (base, 1),
        (base + 7, 0),
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    uniq = set(pts)
    ref = sorted(
        p
        for p in uniq
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in uniq
        )
    )
    assert got == ref


def test_skyline_2d_span_guard_fails_loud(spark):
    """A span past BIGINT arithmetic range raises with the rescale hint
    instead of wrapping."""
    import pytest

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        skyline_2d,
    )

    df = spark.createDataFrame(
        [(-(1 << 62) - (1 << 62), 0), ((1 << 62), 1)], "x long, y long"
    )
    with pytest.raises(ValueError, match="rescale"):
        skyline_2d(df, "x", "y")


# -- rfm_segments ------------------------------------------------------------


def test_rfm_quintiles_hand_case(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        rfm_segments,
    )
    import datetime

    d = datetime.date
    # 5 customers, one order each except c1 (two orders). Recency ref =
    # 2024-01-10 (corpus max). ntile(5) over 5 rows = one per bucket.
    rows = [
        (1, d(2024, 1, 10), 100),
        (1, d(2024, 1, 1), 100),
        (2, d(2024, 1, 8), 500),
        (3, d(2024, 1, 6), 400),
        (4, d(2024, 1, 4), 300),
        (5, d(2024, 1, 2), 200),
    ]
    df = spark.createDataFrame(rows, "k long, dt date, cents long")
    got = {
        r["k"]: (r.recency_days, r.frequency, r.monetary_cents, r.r_q)
        for r in rfm_segments(df, "k", "dt", "cents").collect()
    }
    assert got[1] == (0, 2, 200, 1)   # most recent -> r_q 1
    assert got[5] == (8, 1, 200, 5)   # least recent -> r_q 5
    # frequency quintile: c1 (f=2) is f_q 1
    out = {r["k"]: r.f_q for r in rfm_segments(df, "k", "dt", "cents").collect()}
    assert out[1] == 1


def test_rfm_null_key_and_date_excluded(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        rfm_segments,
    )
    import datetime

    d = datetime.date
    rows = [(1, d(2024, 1, 1), 10), (None, d(2024, 1, 2), 10), (2, None, 10)]
    df = spark.createDataFrame(rows, "k long, dt date, cents long")
    got = rfm_segments(df, "k", "dt", "cents").collect()
    assert sorted(r["k"] for r in got) == [1]


# -- key_skew_report ---------------------------------------------------------


def test_key_skew_report_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        key_skew_report,
    )

    # keys: a x6, b x2, c x2, NULL x3 (excluded)
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2 + [(None,)] * 3
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_mult, r.avg_mult) == (10, 3, 6, 3)
    # skew = 6 * 3 * 1000 / 10 = 1800
    assert r.skew_permille == 1800
    assert r.top_key == "a"


def test_key_skew_top_key_tiebreak(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        key_skew_report,
    )

    df = spark.createDataFrame([("z",), ("a",)], "k string")
    assert key_skew_report(df, "k").collect()[0].top_key == "a"


# -- spearman_e6 -------------------------------------------------------------


def test_spearman_perfect_monotone(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        spearman_e6,
    )

    df = spark.createDataFrame(
        [(i, i, i * 10) for i in range(10)], "i long, x long, y long"
    )
    r = spearman_e6(df, "x", "y", "i").collect()[0]
    assert (r.n, r.sum_d2, r.rho_e6) == (10, 0, 1_000_000)


def test_spearman_perfect_inverse(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        spearman_e6,
    )

    df = spark.createDataFrame(
        [(i, i, -i) for i in range(5)], "i long, x long, y long"
    )
    r = spearman_e6(df, "x", "y", "i").collect()[0]
    assert r.rho_e6 == -1_000_000


def test_spearman_budget_and_degenerate(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        spearman_e6,
    )
    import pytest

    one = spark.createDataFrame([(1, 1, 1)], "i long, x long, y long")
    assert spearman_e6(one, "x", "y", "i").count() == 0  # n < 2: no row
    big = spark.createDataFrame(
        [(i, i, i) for i in range(30)], "i long, x long, y long"
    )
    with pytest.raises(Exception, match="spearman_e6"):
        spearman_e6(big, "x", "y", "i", max_rows=10).collect()


# -- lagged_autocorrelation --------------------------------------------------


def test_lagged_autocorrelation_hand_series(spark):
    """Linear ramp -> lag-1 acf exactly 1.0; calendar gaps DROP pairs
    (day 5 missing: the 4->5 and 5->6 pairs never form)."""
    import datetime as dt

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        lagged_autocorrelation,
    )

    rows = [
        (dt.date(2024, 1, 1), 1),
        (dt.date(2024, 1, 2), 2),
        (dt.date(2024, 1, 3), 3),
        (dt.date(2024, 1, 4), 4),
        (dt.date(2024, 1, 6), 10),
    ]
    df = spark.createDataFrame(rows, "d date, v long")
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in lagged_autocorrelation(df, "d", "v", lags=(1, 2)).collect()
    }
    assert got[1] == (3, 1.0)
    # lag 2: pairs (1,3),(2,4),(4,6) -> values (1,3),(2,4),(4,10)
    n, acf = got[2]
    assert n == 3 and acf is not None


def test_lagged_autocorrelation_anticorrelated(spark):
    import datetime as dt

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        lagged_autocorrelation,
    )

    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), 1 if i % 2 == 0 else -1)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "d date, v long")
    got = {
        r["lag"]: r["acf"]
        for r in lagged_autocorrelation(df, "d", "v", lags=(1, 2)).collect()
    }
    assert got[1] == -1.0 and got[2] == 1.0


# -- activity_streaks --------------------------------------------------------


def test_activity_streaks_hand_values(spark):
    """u1: days 1,2,3, 5,6, 9 -> streaks 3/2/1 (longest 3, n 3, active
    6); duplicate same-day events collapse; NULL key/date excluded."""
    import datetime as dt

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        activity_streaks,
    )

    d = lambda i: dt.datetime(2024, 1, i, 12, 0)  # noqa: E731
    rows = (
        [("u1", d(1)), ("u1", d(2)), ("u1", d(2)), ("u1", d(3))]
        + [("u1", d(5)), ("u1", d(6)), ("u1", d(9))]
        + [("u2", d(4))]
        + [(None, d(1)), ("u3", None)]
    )
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        r["user_id"]: (
            r["longest_streak"],
            r["n_streaks"],
            r["n_active_days"],
        )
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert got == {"u1": (3, 3, 6), "u2": (1, 1, 1)}


# -- km_survival_e6 ----------------------------------------------------------


def test_km_survival_hand_values(spark):
    """Textbook KM: subjects (1,death),(2,censor),(3,death),(3,death),
    (4,censor) -> S = 0.8, 0.8, 0.2666, 0.2666; the censored subject
    leaves the risk set without a survival drop."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        km_survival_e6,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)], "t long, e long"
    )
    rows = {
        r["duration"]: r
        for r in km_survival_e6(df, "t", "e").collect()
    }
    assert rows[1]["n_risk"] == 5 and rows[1]["survival_e6"] == 800000
    assert rows[2]["n_risk"] == 4 and rows[2]["survival_e6"] == 800000
    assert rows[2]["n_events"] == 0 and rows[2]["n_censored"] == 1
    assert rows[3]["n_risk"] == 3 and rows[3]["survival_e6"] == 266666
    assert rows[4]["n_risk"] == 1 and rows[4]["survival_e6"] == 266666


def test_km_survival_all_censored_flat(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        km_survival_e6,
    )

    df = spark.createDataFrame([(1, 0), (5, 0), (9, 0)], "t long, e long")
    vals = {
        r["duration"]: r["survival_e6"]
        for r in km_survival_e6(df, "t", "e").collect()
    }
    assert vals == {1: 1000000, 5: 1000000, 9: 1000000}


def test_km_survival_grouped_independent_curves(spark):
    """group_cols: each stratum folds its own recursion -- group A's
    censoring cannot touch group B's risk set; NULL group is a
    stratum."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        km_survival_e6,
    )

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 2, 1), (None, 3, 1)],
        "g string, t long, e long",
    )
    rows = {
        (r["g"], r["duration"]): r
        for r in km_survival_e6(df, "t", "e", group_cols=("g",)).collect()
    }
    # a: t=1 d=1 n=2 -> 500000; t=2 d=1 n=1 -> 0
    assert rows[("a", 1)]["survival_e6"] == 500000
    assert rows[("a", 2)]["survival_e6"] == 0
    # b: t=1 censored n=2 -> 1000000; t=2 d=1 n=1 -> 0
    assert rows[("b", 1)]["survival_e6"] == 1000000
    assert rows[("b", 2)]["survival_e6"] == 0
    # NULL stratum present and independent
    assert rows[(None, 3)]["survival_e6"] == 0 and rows[(None, 3)]["n_risk"] == 1


# -- auc_exact_e6 ------------------------------------------------------------


def test_auc_perfect_separation(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        auc_exact_e6,
    )

    # negatives score 1-3, positives score 4-6: AUC = 1
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)], "s long, y long"
    )
    r = auc_exact_e6(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_e6) == (3, 3, 1_000_000)


def test_auc_perfect_inversion_and_all_tied(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        auc_exact_e6,
    )

    inv = spark.createDataFrame(
        [(9, 0), (8, 0), (1, 1), (2, 1)], "s long, y long"
    )
    assert auc_exact_e6(inv, "s", "y").collect()[0].auc_e6 == 0
    tied = spark.createDataFrame(
        [(5, 0), (5, 0), (5, 1), (5, 1)], "s long, y long"
    )
    assert auc_exact_e6(tied, "s", "y").collect()[0].auc_e6 == 500_000


def test_auc_hand_value_with_ties(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        auc_exact_e6,
    )

    # scores: neg {1, 2, 2}, pos {2, 3}. Pairs P*N = 6:
    # (pos 2 vs 1) win, (pos 2 vs 2) tie, (pos 2 vs 2) tie,
    # (pos 3 vs 1/2/2) 3 wins -> (4 + 2*0.5) / 6 = 5/6 -> 833333
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (2, 0), (2, 1), (3, 1)], "s long, y long"
    )
    r = auc_exact_e6(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_e6) == (2, 3, 833_333)


def test_auc_groups_and_null_exclusion(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        auc_exact_e6,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, 0),
            ("a", 2, 1),
            ("b", 2, 0),
            ("b", 1, 1),
            ("b", None, 1),  # NULL score excluded
            ("b", 3, None),  # NULL label excluded
        ],
        "g string, s long, y long",
    )
    rows = {
        r.g: r for r in auc_exact_e6(df, "s", "y", group_cols=("g",)).collect()
    }
    assert rows["a"].auc_e6 == 1_000_000
    assert rows["b"].auc_e6 == 0
    assert (rows["b"].n_pos, rows["b"].n_neg) == (1, 1)


def test_auc_degenerate_group_fails_loud(spark):
    import pytest

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        auc_exact_e6,
    )

    allpos = spark.createDataFrame([(1, 1), (2, 1)], "s long, y long")
    with pytest.raises(Exception, match="auc_exact_e6"):
        auc_exact_e6(allpos, "s", "y").collect()


# -- score_decile_calibration -------------------------------------------------


def test_calibration_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        score_decile_calibration,
    )

    # 4 subjects, 2 bins: scores 40,30 (both pos) in bin 1; 20,10 (one
    # pos) in bin 2. P=3, NT=4.
    df = spark.createDataFrame(
        [(1, 40, 1), (2, 30, 1), (3, 20, 1), (4, 10, 0)],
        "i long, s long, y long",
    )
    rows = {
        r.bin: r
        for r in score_decile_calibration(df, "s", "y", "i", n_bins=2)
        .collect()
    }
    b1, b2 = rows[1], rows[2]
    assert (b1.n_subjects, b1.n_pos) == (2, 2)
    assert b1.pos_rate_permille == 1000
    assert b1.cum_gain_permille == 666  # 2/3 of positives in bin 1
    # lift = (2*4)/(2*3) = 4/3 -> 1333
    assert b1.lift_permille == 1333
    assert (b2.n_pos, b2.cum_gain_permille) == (1, 1000)
    assert b2.lift_permille == 666


def test_calibration_null_exclusion_and_no_pos_fails(spark):
    import pytest

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        score_decile_calibration,
    )

    df = spark.createDataFrame(
        [(1, 5, 1), (2, 4, 0), (3, None, 1), (4, 3, None)],
        "i long, s long, y long",
    )
    rows = score_decile_calibration(df, "s", "y", "i", n_bins=2).collect()
    assert sum(r.n_subjects for r in rows) == 2  # NULLs excluded
    nopos = spark.createDataFrame([(1, 5, 0), (2, 4, 0)], "i long, s long, y long")
    with pytest.raises(Exception, match="score_decile_calibration"):
        score_decile_calibration(nopos, "s", "y", "i", n_bins=2).collect()


# -- burstiness_vmr_e6 ---------------------------------------------------------


def test_burstiness_vmr_exact_values(spark):
    """Constant daily counts -> VMR 0; a planted burst matches the
    hand-computed integer floor; keys with < 2 periods or zero total
    are excluded."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        burstiness_vmr_e6,
    )

    rows = (
        [("flat", d, 5) for d in range(4)]
        + [("burst", 0, 1), ("burst", 1, 1), ("burst", 2, 10)]
        + [("single", 0, 7)]
        + [("zero", 0, 0), ("zero", 1, 0)]
    )
    df = spark.createDataFrame(rows, "k string, day long, x long")
    got = {
        r["k"]: r for r in burstiness_vmr_e6(df, ["k"], "x").collect()
    }
    assert set(got) == {"flat", "burst"}
    assert got["flat"]["vmr_e6"] == 0
    # burst: n=3, Sx=12, Sxx=102 -> (306-144)*1e6 div (2*12) = 6750000
    assert got["burst"]["vmr_e6"] == 6_750_000
    assert got["burst"]["n_periods"] == 3
    assert got["burst"]["n_events"] == 12


def test_burstiness_vmr_null_key_stratum(spark):
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        burstiness_vmr_e6,
    )

    df = spark.createDataFrame(
        [(None, 0, 2), (None, 1, 2)], "k string, day long, x long"
    )
    rows = burstiness_vmr_e6(df, ["k"], "x").collect()
    assert len(rows) == 1 and rows[0]["vmr_e6"] == 0


# -- cross_correlation_e6 ------------------------------------------------------


def test_cross_correlation_finds_the_true_lag(spark):
    """y is x shifted 2 calendar days with a gap in the middle: the
    corr at lag +2 is ~1e6 (exact up to one sqrt ulp) and strictly
    dominates every other lag."""
    import datetime

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        cross_correlation_e6,
    )

    base = datetime.date(2024, 1, 1)
    days = [0, 1, 2, 3, 4, 7, 8, 9, 10, 11]  # gap at 5-6
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    x = spark.createDataFrame(
        [(base + datetime.timedelta(days=d), v) for d, v in zip(days, vals)],
        "day date, x long",
    )
    y = spark.createDataFrame(
        [
            (base + datetime.timedelta(days=d + 2), v)
            for d, v in zip(days, vals)
        ],
        "day date, y long",
    )
    got = {
        r["lag"]: r["corr_e6"]
        for r in cross_correlation_e6(x, y, range(-3, 4)).collect()
    }
    assert got[2] in (999_999, 1_000_000)  # one sqrt ulp of exactly 1
    assert all(got[lv] < got[2] for lv in got if lv != 2)
    # lag +2 pairs every day EXCEPT across the gap edges; a row-lag
    # implementation would misalign after the gap and dilute the peak


def test_cross_correlation_excludes_degenerate_lags(spark):
    import datetime

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        cross_correlation_e6,
    )

    base = datetime.date(2024, 1, 1)
    x = spark.createDataFrame(
        [(base + datetime.timedelta(days=d), d + 1) for d in range(5)],
        "day date, x long",
    )
    y = spark.createDataFrame(
        [(base + datetime.timedelta(days=d), 7) for d in range(5)],
        "day date, y long",
    )
    # constant y: zero variance at every lag -> nothing qualifies
    assert cross_correlation_e6(x, y, (-1, 0, 1)).count() == 0
