"""Bucketed co-located joins (plans/bucketed.py): the claim is about
the PHYSICAL PLAN -- matching bucket specs must remove the join
exchanges -- so the tests read the plan, not just the rows.

Broadcast is disabled inside the plan assertions: at test scale the
planner would (correctly) broadcast these tiny tables, but the surface
under test is the fact-to-fact regime where neither side fits in
memory and the bucket-reusing SortMergeJoin is the plan that matters.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from bankcreditunion_datapipeline_spark.plans.bucketed import (
        publish_bucketed,
    )

    o = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    li = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") * 3).alias("b")
    )
    publish_bucketed(o, "t_orders_b", "k", 4, sort_cols=["k"])
    publish_bucketed(li, "t_items_b", "k", 4, sort_cols=["k"])
    # a MISMATCHED bucket count for the negative control
    publish_bucketed(li, "t_items_b8", "k", 8, sort_cols=["k"])
    return o, li


def test_coloc_join_has_no_exchange(spark, bucketed_tables):
    from bankcreditunion_datapipeline_spark.plans.bucketed import coloc_join

    with _no_broadcast(spark):
        joined = coloc_join(spark, "t_orders_b", "t_items_b", "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # NOTE (pinned behavior): Spark 3+/4 does NOT elide the SMJ
        # sort from sortBy metadata -- the per-side Sort remains, but
        # it is partition-local (no exchange), which is the part that
        # costs at scale. The sortBy still buys parquet data skipping.
        assert "Sort " in plan, plan
        # and it is still a correct join
        assert joined.count() == 5000


def test_rows_match_plain_join(spark, bucketed_tables):
    from bankcreditunion_datapipeline_spark.plans.bucketed import coloc_join

    o, li = bucketed_tables
    got = sorted(
        (r.k, r.a, r.b)
        for r in coloc_join(spark, "t_orders_b", "t_items_b", "k").collect()
    )
    want = sorted((r.k, r.a, r.b) for r in o.join(li, "k").collect())
    assert got == want


def test_mismatched_buckets_fall_back_visibly(spark, bucketed_tables):
    from bankcreditunion_datapipeline_spark.plans.bucketed import coloc_join

    # negative control: 4-bucket x 8-bucket CAN'T fully co-locate; the
    # join must still be correct, and the plan must do EXTRA work on at
    # least one side (an Exchange, or bucket coalescing/repartitioning)
    # -- this pins the "both sides must agree" docstring claim as an
    # observed behavior, not folklore
    with _no_broadcast(spark):
        joined = coloc_join(spark, "t_orders_b", "t_items_b8", "k")
        plan = _plan(joined)
        assert ("Exchange" in plan) or ("coalesced" in plan.lower()), plan
        assert joined.count() == 5000


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    # an equality filter on the bucket key scans a subset of buckets.
    # Pinned knob: autoBucketedScan disables bucketed reads when no
    # operator benefits, which also hides bucket PRUNING -- a
    # filter-heavy workload on a bucketed table should turn it off.
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table("t_items_b").filter(F.col("k") == 7)
        plan = _plan(df)
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
        assert df.count() == 5
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
