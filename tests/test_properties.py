"""Property-based checks (SURVEY §5): pivot/unpivot round-trip, dedup
idempotence, union-by-name commutativity, asof self-join identity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.analytics import pivot_by_period
from bankcreditunion_datapipeline_spark.operators.conform import (
    dedup_keyed,
    union_conform,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # key
        st.sampled_from(["2020-03-31", "2020-06-30", "2020-09-30"]),  # period
        st.integers(min_value=0, max_value=1000),  # measure
    ),
    min_size=1,
    max_size=25,
)

COMMON = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**COMMON)
@given(rows=ROWS)
def test_pivot_unpivot_roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "k int, period string, v int").groupBy(
        "k", "period"
    ).agg(F.sum("v").alias("v"))
    periods = ["2020-03-31", "2020-06-30", "2020-09-30"]
    wide = pivot_by_period(df, ["k"], "period", F.first("v"), values=periods)
    melted = (
        wide.unpivot(["k"], periods, "period", "v")
        .filter(F.col("v").isNotNull())
    )
    assert sorted(map(tuple, melted.collect())) == sorted(map(tuple, df.collect()))


@settings(**COMMON)
@given(rows=ROWS)
def test_dedup_keyed_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, period string, v int")
    once = dedup_keyed(df, ["k", "period"], order_by=[F.desc("v")])
    twice = dedup_keyed(once, ["k", "period"], order_by=[F.desc("v")])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # exactly one row per key survives
    assert once.groupBy("k", "period").count().filter("count > 1").count() == 0


@settings(**COMMON)
@given(rows=ROWS)
def test_union_by_name_commutative(spark, rows):
    half = len(rows) // 2
    a = spark.createDataFrame(rows[: half + 1], "k int, period string, v int")
    # column order permuted: unionByName must align by name
    b = spark.createDataFrame(
        [(p, v, k) for k, p, v in rows[half + 1 :]] or [("2020-03-31", 0, 99)],
        "period string, v int, k int",
    )
    ab = union_conform([a, b]).select("k", "period", "v")
    ba = union_conform([b, a]).select("k", "period", "v")
    assert sorted(map(tuple, ab.collect())) == sorted(map(tuple, ba.collect()))


@given(st.text(max_size=300))
@settings(**COMMON)
def test_clean_text_idempotent(spark, s):
    from bankcreditunion_datapipeline_spark.operators.text import clean_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,)], "text string")
    once, twice = df.select(
        clean_text(F.col("text")).alias("a"),
    ).select("a", clean_text(F.col("a")).alias("b")).first()
    assert once == twice
