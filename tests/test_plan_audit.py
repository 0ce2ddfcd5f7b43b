"""plan_audit's unpartitioned-window detector (VERDICT r10 finding #1
regression-proofing): the detector must flag a no-partition-spec
WindowExec and stay quiet on a partitioned one, and the five queries
rewired onto operators/ranking.py (q64/q212/q223/q246/q308) must carry
ZERO unpartitioned windows in their executed plans -- the class cannot
silently reappear there.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import (  # noqa: E402
    audit_plan,
    count_unpartitioned_windows,
    false_rank_claims,
    unpartitioned_window_lines,
)

from bankcreditunion_datapipeline_spark import queries as _q  # noqa: E402
from bankcreditunion_datapipeline_spark.operators import ranking as _rk  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_detector_flags_unpartitioned_window(spark):
    df = spark.range(10).withColumn("g", F.col("id") % 2)
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert count_unpartitioned_windows(_plan(bad)) == 1
    assert count_unpartitioned_windows(_plan(good)) == 0
    a = audit_plan(_plan(bad))
    assert a["unpart_windows"] == 1


def test_detector_ignores_window_group_limit_and_pandas_names(spark):
    # a top-k rank filter introduces WindowGroupLimit alongside Window;
    # the name-boundary regex must not double-count it.
    df = spark.range(20).withColumn("g", F.col("id") % 2)
    topk = (
        df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
        )
        .filter(F.col("rn") <= 3)
    )
    assert count_unpartitioned_windows(_plan(topk)) == 0


def test_detector_ignores_partition_only_window(spark):
    # a full-frame per-key aggregate window (no ORDER BY) is buckets-way
    # parallel -- it must not be flagged even though its node also has a
    # single "], [" separator.
    df = spark.range(10).withColumn("g", F.col("id") % 2)
    part_only = df.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    assert count_unpartitioned_windows(_plan(part_only)) == 0


def test_false_rank_claim_fails_and_true_claim_passes():
    # r13 ratchet (VERDICT r12 #3): a deliberately FALSE note -- one
    # claiming a distributed_* rewire that never fired -- must fail the
    # audit; the q228 class cannot pass on a stated-but-untrue bound.
    note = "rides distributed_ntile over the customer summary"
    assert false_rank_claims(note, set()) == ["distributed_ntile"]
    assert false_rank_claims(note, {"distributed_ntile"}) == []
    # a misnamed sibling is tolerated (both are real two-level rewires)
    assert false_rank_claims(note, {"distributed_row_number"}) == []
    # docs with no distributed_* claim never fail regardless of calls
    assert false_rank_claims("the window runs over O(days)", set()) == []
    assert false_rank_claims("", set()) == []


def test_rank_operators_record_calls_at_build_time(spark):
    from bankcreditunion_datapipeline_spark.operators.ranking import (
        distributed_ntile,
    )

    df = spark.range(10).withColumn("v", F.col("id") % 3)
    _rk.CALLS.clear()
    distributed_ntile(df, 2, [("v", "asc"), ("id", "asc")], out_col="t")
    assert "distributed_ntile" in _rk.CALLS  # logged at BUILD, no action ran


def test_q228_claim_is_now_true(spark, sf_dir):
    # the r12 finding itself: q228's ledger note claims distributed_ntile;
    # building the query must actually fire it.
    q = _q.registry()["q228_segment_conversion"]
    assert "distributed_ntile" in (q.doc or "")
    _rk.CALLS.clear()
    q.spark_fn(spark, sf_dir)
    assert false_rank_claims(q.doc, set(_rk.CALLS)) == []


def test_cached_lane_replays_rank_ops_on_hit(spark):
    # a shared lane's rewires must attribute to EVERY consumer: the
    # second consumer sees the lane's ops in CALLS even on a cache hit.
    from bankcreditunion_datapipeline_spark.queries import _cached_lane

    built = []

    def build():
        built.append(1)
        _rk.CALLS.add("distributed_row_number")
        return spark.range(3)

    _rk.CALLS.clear()
    _cached_lane(spark, "/tmp", "test_lane_replay", build)
    assert built == [1] and "distributed_row_number" in _rk.CALLS
    _rk.CALLS.clear()
    _cached_lane(spark, "/tmp", "test_lane_replay", build)
    assert built == [1], "lane rebuilt on what should be a cache hit"
    assert "distributed_row_number" in _rk.CALLS


def test_cached_lane_records_ops_already_fired_by_builder(spark):
    # r13 ADVICE: the first consumer may fire the same distributed_* op
    # BEFORE building the lane; a before/after set difference would then
    # exclude it from lane_ops and a later cache-hit consumer claiming it
    # would spuriously hard-fail the false-claim ratchet. The build runs
    # against a fresh swapped-in call set, so the op is captured anyway.
    from bankcreditunion_datapipeline_spark.queries import _cached_lane

    def build():
        _rk.CALLS.add("distributed_cumsum")
        return spark.range(3)

    _rk.CALLS.clear()
    _rk.CALLS.add("distributed_cumsum")  # consumer fired it pre-build
    _cached_lane(spark, "/tmp", "test_lane_prefired", build)
    _rk.CALLS.clear()
    _cached_lane(spark, "/tmp", "test_lane_prefired", build)  # cache hit
    assert "distributed_cumsum" in _rk.CALLS


# order columns an unpartitioned window may legitimately ride in the
# rewired queries: __pid is ranking.py's O(buckets x keys) offsets
# summary; decile/bin are the O(10)/O(bins) readout cum-sums.
_BOUNDED_ORDER_COLS = ("__pid#", "decile#", "bin#")


def test_rewired_rank_queries_unpart_windows_are_bounded_only(spark, sf_dir):
    reg = _q.registry()
    rewired = [
        n
        for n in reg
        if n.startswith(("q64_", "q212_", "q223_", "q246_", "q308_"))
    ]
    assert len(rewired) == 5, rewired
    for name in rewired:
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        for line in unpartitioned_window_lines(plan):
            order = line.rsplit("], [", 1)[1]
            assert any(c in order for c in _BOUNDED_ORDER_COLS), (
                f"{name}: unpartitioned WindowExec over a non-summary "
                f"order ({order[:80]!r}) -- the entity-grain class "
                "reappeared; rewire onto operators/ranking.py "
                "(VERDICT r10 finding #1)"
            )
