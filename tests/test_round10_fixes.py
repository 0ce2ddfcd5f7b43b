"""Round-10 ADVICE regressions: data shapes no natural corpus exhibits.

- q285: an ABSORBING 'purchase' (pure sink, no outgoing transitions)
  must still be credited -- the state universe is sources UNION
  targets, so p0 carries the purchase=1e6 seed even when purchase
  never appears as a source.
- q288: the seasonal-naive baseline is the CALENDAR day-7 value; a
  gap day must not shift the baseline off the weekly phase the way a
  row-lag-7 would.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_q285_pure_sink_purchase_credited(spark, tmp_path):
    """One user walks a -> b -> purchase; purchase has NO outgoing
    transitions. Every state must reach purchase with probability 1e6
    within 4 steps (a source-only state universe would report 0 for
    everything and drop purchase from the output)."""
    from bankcreditunion_datapipeline_spark.queries import (
        q285_purchase_absorption,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    _write_events(
        spark,
        tmp_path,
        [
            (1, t0, 7, "a", 1.0, "{}"),
            (2, t0 + datetime.timedelta(hours=1), 7, "b", 1.0, "{}"),
            (3, t0 + datetime.timedelta(hours=2), 7, "purchase", 1.0, "{}"),
        ],
    )
    rows = {
        r["state"]: r
        for r in q285_purchase_absorption(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"a", "b", "purchase"}
    # purchase is target-only: present, pinned at 1e6, zero outgoing
    assert rows["purchase"]["reach_purchase_e6"] == 1_000_000
    assert rows["purchase"]["n_transitions"] == 0
    # b -> purchase directly, a -> b -> purchase within 4 steps
    assert rows["b"]["reach_purchase_e6"] == 1_000_000
    assert rows["a"]["reach_purchase_e6"] == 1_000_000


def test_q285_non_purchase_sink_reaches_zero(spark, tmp_path):
    """A pure sink that is NOT the absorbing state (cs = 0, never a
    source) must report reach 0 without tripping a divide-by-zero."""
    from bankcreditunion_datapipeline_spark.queries import (
        q285_purchase_absorption,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    _write_events(
        spark,
        tmp_path,
        [
            (1, t0, 7, "a", 1.0, "{}"),
            (2, t0 + datetime.timedelta(hours=1), 7, "deadend", 1.0, "{}"),
        ],
    )
    rows = {
        r["state"]: r
        for r in q285_purchase_absorption(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"a", "deadend"}
    assert rows["deadend"]["n_transitions"] == 0
    assert rows["deadend"]["reach_purchase_e6"] == 0
    assert rows["a"]["reach_purchase_e6"] == 0


def test_q288_calendar_naive_stays_on_phase_across_gap(spark, tmp_path):
    """Days 1-5 and 8-14 observed (6-7 missing). The naive baseline for
    day 14 must be day 7's value -- UNOBSERVED, so day 14 is NOT
    scored; day 12 scores against day 5. A row-lag-7 would pair day 14
    with day 5 (9 calendar days apart) and score it anyway."""
    from bankcreditunion_datapipeline_spark.queries import (
        q288_forecast_skill_benchmark,
    )

    base = datetime.datetime(2024, 3, 1, 9, 0, 0)
    days = [1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 14]
    _write_events(
        spark,
        tmp_path,
        [
            (i, base + datetime.timedelta(days=d - 1), 7, "view",
             float(d) / 4.0, "{}")
            for i, d in enumerate(days, 1)
        ],
    )
    out = q288_forecast_skill_benchmark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    # calendar pairs with BOTH day-7 observed and a prior Holt state:
    # 8->1, 9->2, 10->3, 11->4, 12->5 (14->7 unobserved, dropped)
    assert row["n_days"] == 5
    # values are d/4 (exact quarters): naive abs error is always
    # 7/4 = 1.75 -> 175 cents exactly
    assert row["naive_mae_cents"] == 175


def test_q297_proration_reconciles_exactly(spark, tmp_path):
    """The largest-remainder spread must reconcile: the sum of all
    recognized cents equals the sum of all order cents EXACTLY --
    including awkward spans (7 cents over 3 days, 1 cent over 121
    days, 0-cent orders)."""
    import datetime

    from pyspark.sql import functions as F

    from bankcreditunion_datapipeline_spark.queries import (
        q297_prorated_daily_recognition,
    )

    d0 = datetime.date(1995, 1, 1)

    def order(k, price, span_days):
        return {
            "o_orderkey": k,
            "o_custkey": 1,
            "o_orderstatus": "F",
            "o_totalprice": price,
            "o_orderdate": d0,
            "o_orderpriority": "1-URGENT",
        }, {
            "l_orderkey": k,
            "l_partkey": 1,
            "l_suppkey": 1,
            "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": price,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "F",
            "l_shipdate": d0 + datetime.timedelta(days=span_days - 1),
        }

    specs = [(1, 0.07, 3), (2, 0.01, 121), (3, 0.0, 5), (4, 123.45, 1)]
    orows, lrows = zip(*[order(k, p, s) for k, p, s in specs])
    spark.createDataFrame(list(orows)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(list(lrows)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    out = q297_prorated_daily_recognition(spark, str(tmp_path))
    total = out.agg(F.sum("recognized_cents")).collect()[0][0]
    assert total == 7 + 1 + 0 + 12345
    # 7 cents over 3 days: 3+2+2 front-loaded
    day_one = out.filter(F.col("day") == d0).collect()[0]
    assert day_one["n_orders_active"] == 4
    assert day_one["recognized_cents"] == 3 + 1 + 0 + 12345


def test_q306_every_policy_credits_exactly_1000_per_conversion(
    spark, tmp_path
):
    """Reconciliation: summed over channels, each policy's credit
    equals 1000 * (number of purchases with >= 1 preceding touch) --
    including awkward k (3 touches: 334+333+333)."""
    from pyspark.sql import functions as F

    from bankcreditunion_datapipeline_spark.queries import (
        q306_attribution_policy_matrix,
    )

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    h = datetime.timedelta(hours=1)
    rows = [
        # user 1: view, click, view -> purchase (k=3)
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + h, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * h, 1, "view", 1.0, "{}"),
        (4, t0 + 3 * h, 1, "purchase", 9.0, "{}"),
        # user 2: one touch 8 days before -> OUTSIDE the window
        (5, t0 - datetime.timedelta(days=8), 2, "view", 1.0, "{}"),
        (6, t0, 2, "purchase", 9.0, "{}"),
        # user 3: single click -> purchase (k=1)
        (7, t0, 3, "click", 1.0, "{}"),
        (8, t0 + h, 3, "purchase", 9.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in q306_attribution_policy_matrix(
            spark, str(tmp_path)
        ).collect()
    }
    # 2 credited conversions (user 2's touch is out of window)
    for col in (
        "first_touch_permille",
        "last_touch_permille",
        "linear_permille",
    ):
        assert sum(r[col] for r in out.values()) == 2000, col
    # user 1: first = view(t0), last = view(t0+2h); linear 334/333/333
    assert out["view"]["first_touch_permille"] == 1000
    assert out["view"]["last_touch_permille"] == 1000
    assert out["view"]["linear_permille"] == 334 + 333
    assert out["click"]["linear_permille"] == 333 + 1000
    assert out["click"]["first_touch_permille"] == 1000  # user 3's k=1
