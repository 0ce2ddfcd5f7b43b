"""Unit tests for the record-linkage primitives (operators/linkage.py):
blocked fuzzy matching, sorted-neighborhood candidates, fingerprint
normalization -- hand-sized ground truths; the oracle gate (q204)
covers testdata-scale behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from bankcreditunion_datapipeline_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    fingerprint_key,
    name_vocabulary,
    sorted_neighborhood_pairs,
)


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_blocked_pairs_match_within_block_only(spark):
    # 'cold bolt' ~ 'old bolt' (lev 1, same block 'bolt');
    # 'cold bolt' vs 'cold colt' would be lev 2 but different blocks.
    df = _names(
        spark, ["cold bolt", "old bolt", "cold colt", "old bolt", "hot gear"]
    )
    out = blocked_levenshtein_pairs(
        df, "name", F.element_at(F.split(F.col("name"), " "), -1), max_dist=2
    ).collect()
    got = {(r.name_a, r.name_b): (r.lev, r.n_a, r.n_b) for r in out}
    assert got == {("cold bolt", "old bolt"): (1, 1, 2)}


def test_blocked_pairs_budget_fires_on_collapsed_block(spark):
    # one giant block (constant key): 40 names -> 780 pairs > budget 100
    df = _names(spark, [f"name {i:02d}" for i in range(40)])
    gated = blocked_levenshtein_pairs(
        df, "name", F.lit("all"), max_dist=2, max_pair_rows=100
    )
    with pytest.raises(Exception, match="blocked_levenshtein_pairs"):
        gated.collect()


def test_sorted_neighborhood_linear_pairs(spark):
    df = _names(spark, ["a", "b", "c", "d"])
    out = sorted_neighborhood_pairs(df, "name", window=2).collect()
    got = sorted((r.name_a, r.name_b) for r in out)
    assert got == [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("b", "d"),
        ("c", "d"),
    ]


def test_name_vocabulary_counts_and_null_drop(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], "name string"
    )
    got = {
        r.name: r.n_rows for r in name_vocabulary(df, "name").collect()
    }
    assert got == {"x": 2, "y": 1}


def test_fingerprint_key_order_case_and_dup_insensitive(spark):
    df = spark.createDataFrame(
        [("Widget  Red",), ("red widget",), ("red red widget",)],
        "name string",
    )
    out = df.select(fingerprint_key(F.col("name")).alias("fp")).collect()
    assert {r.fp for r in out} == {"red widget"}
