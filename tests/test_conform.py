"""Unit tests for join/union/dedup kernel (SURVEY §2.4-2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.conform import (
    assert_unique_key,
    broadcast_lookup,
    dedup_keyed,
    left_join,
    literal_map_lookup,
    salted_join,
    union_conform,
)


def test_left_join_composite_key(spark):
    left = spark.createDataFrame([(1, "2020-03-31", "a"), (2, "2020-03-31", "b")], "k int, q string, x string")
    right = spark.createDataFrame([(1, "2020-03-31", 100)], "k int, q string, v int")
    out = left_join(left, right, ["k", "q"]).orderBy("k").collect()
    assert out[0].v == 100 and out[1].v is None


def test_broadcast_lookup_matches_dict_get(spark):
    df = spark.createDataFrame([("CA",), ("??",)], "STATE string")
    dim = spark.createDataFrame([("CA", "California")], "abbrev string, full string")
    out = broadcast_lookup(df, dim, key="STATE", dim_key="abbrev", value="full", out="state")
    vals = [r.state for r in out.collect()]
    assert vals == ["California", None]


def test_literal_map_lookup(spark):
    df = spark.createDataFrame([("03-31",), ("06-30",)], "md string")
    out = literal_map_lookup(df, "md", {"03-31": "1", "06-30": "2"}, "quarter")
    assert [r.quarter for r in out.orderBy("md").collect()] == ["1", "2"]


def test_union_conform_by_name_and_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([("y", 2)], "name string, id int")  # different order
    c = spark.createDataFrame([(3,)], "id int")  # missing column
    out = union_conform([a, b, c]).orderBy("id").collect()
    assert [(r.id, r.name) for r in out] == [(1, "x"), (2, "y"), (3, None)]


def test_dedup_keyed_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2020-03-31", 5), (1, "2020-03-31", 9), (2, "2020-03-31", 7)],
        "k int, q string, v int",
    )
    out = dedup_keyed(df, ["k", "q"], order_by=[F.desc("v")]).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, 9), (2, 7)]


def test_assert_unique_key(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "k int, v int")
    assert_unique_key(df, ["k", "v"])  # unique on both
    with pytest.raises(ValueError):
        assert_unique_key(df, ["k"])


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame([(i % 3, i) for i in range(100)], "k int, v int")
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, tag string")
    plain = left.join(right, ["k"]).groupBy("tag").count()
    salted = salted_join(left, right, ["k"], salt_buckets=4).groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_top_key_shares(spark):
    from bankcreditunion_datapipeline_spark.operators.conform import top_key_shares

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    rep = top_key_shares(df, ["k"], top_k=2).collect()
    assert rep[0].k == "hot" and rep[0].n_rows == 80 and abs(rep[0].share - 0.8) < 1e-6
    assert rep[1].k == "warm" and rep[1].n_rows == 15
