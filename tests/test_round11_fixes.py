"""Round-11 ADVICE regressions: data shapes no natural corpus exhibits.

- q304: a PRE-ANCHOR (1969) Saturday must label as weekend.  Plain %
  follows the dividend sign on BOTH engines, so the old lane labeled
  every pre-anchor day weekday -- an engine AGREEMENT the differential
  fuzz gate cannot catch; the sign-safe pmod lane classifies it.
- q307: the influence e6 ladder carries fail-loud factor guards; a
  cents scale that would silently wrap n*si must raise, and the tiny
  exact case must still reproduce the hand-computed jackknife.
"""

from __future__ import annotations

import datetime

import pytest


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_q304_pre_anchor_saturday_is_weekend(spark, tmp_path):
    """1969-12-27 is a Saturday (datediff from the 1970-01-05 anchor
    Monday = -9; pmod(-9, 7) = 5).  The old dividend-sign %% gave -2
    and silently labeled it weekday.  Corpus: two Saturdays (one 1969,
    one 1970) and one Monday -> n_weekend_days MUST be 2."""
    from bankcreditunion_datapipeline_spark.queries import (
        q304_weekend_effect_auc,
    )

    ts = lambda d: datetime.datetime(d.year, d.month, d.day, 12)  # noqa
    rows = [
        (1, ts(datetime.date(1969, 12, 27)), 7, "view", 10.0, "{}"),
        (2, ts(datetime.date(1969, 12, 29)), 7, "view", 1.0, "{}"),
        (3, ts(datetime.date(1970, 1, 10)), 7, "view", 20.0, "{}"),
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = q304_weekend_effect_auc(spark, str(tmp_path)).collect()[0]
    assert out["n_weekend_days"] == 2
    assert out["n_weekday_days"] == 1
    # both weekend cents (1000, 2000) beat the weekday 100 -> AUC = 1
    assert out["auc_e6"] == 1_000_000


def _orders_customers(spark, tmp_path, orders, custs):
    _write(
        spark,
        tmp_path,
        "orders",
        [
            (i + 1, ck, "F", p, datetime.datetime(1996, 1, 1), "1-URGENT")
            for i, (ck, p) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    _write(
        spark,
        tmp_path,
        "customer",
        [(ck, f"c{ck}", nk, 0.0, "BUILDING") for ck, nk in custs],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )


def test_q307_exact_jackknife_tiny(spark, tmp_path):
    """Nation 1 = {100c, 200c}, nation 2 = {600c}: global mean 300c.
    Leave out nation 1 -> mean 600, influence +300e6; leave out
    nation 2 -> mean 150, influence -150e6 (negative-dividend ladder)."""
    from bankcreditunion_datapipeline_spark.queries import (
        q307_stratum_influence,
    )

    _orders_customers(
        spark,
        tmp_path,
        orders=[(10, 1.00), (10, 2.00), (20, 6.00)],
        custs=[(10, 1), (20, 2)],
    )
    rows = {
        r["nation"]: r
        for r in q307_stratum_influence(spark, str(tmp_path)).collect()
    }
    assert rows[1]["influence_e6_cents"] == 300_000_000
    assert rows[2]["influence_e6_cents"] == -150_000_000
    assert rows[1]["n_orders"] == 2 and rows[2]["n_orders"] == 1


def test_q307_overflow_fails_loud(spark, tmp_path):
    """Orders of ~e13 dollars (cents still exactly double-representable
    and small enough that the PERMILLE share limb stays in BIGINT):
    the influence quotient |s*ni - n*si| div D reaches ~2e15, far past
    the 9.2e12 quotient-limb budget -- the guard must raise, never
    emit an overflowed e6 value."""
    from bankcreditunion_datapipeline_spark.queries import (
        q307_stratum_influence,
    )

    _orders_customers(
        spark,
        tmp_path,
        orders=[(10, 4.0e13), (10, 2.0e13), (20, 6.0e13)],
        custs=[(10, 1), (20, 2)],
    )
    with pytest.raises(Exception, match="ladder budget"):
        q307_stratum_influence(spark, str(tmp_path)).collect()


def test_q316_planted_disorder(spark, tmp_path):
    """Arrival order (event_id) deliberately disagrees with event time:
    id 3 carries a timestamp 2h OLDER than the id-2 maximum, so its
    lateness is 120 minutes; everything else is in order.  The natural
    corpus is perfectly ordered (audit reads zero), so this planted
    shape is the discriminating test (q285 contract)."""
    from bankcreditunion_datapipeline_spark.queries import (
        q316_out_of_orderness,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    h = datetime.timedelta(hours=1)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + 3 * h, 7, "view", 1.0, "{}"),
        (3, t0 + 1 * h, 7, "view", 1.0, "{}"),  # 2h late vs id-2 max
        (4, t0 + 4 * h, 7, "view", 1.0, "{}"),
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["p_permille"]: r
        for r in q316_out_of_orderness(spark, str(tmp_path)).collect()
    }
    assert out[500]["late_minutes"] == 0  # 3 of 4 events on time
    assert out[990]["late_minutes"] == 120
    assert out[500]["n_events"] == 4
    assert out[500]["late_over_60min_permille"] == 250
