"""distributed_row_number / distributed_ntile vs the single-partition
window form: two-strategies-must-agree (the settled rewrite gate).

The frames deliberately exercise: heavy order-value ties broken only
by the unique id tiebreak (the boundary-sensitive case), N < n_tiles,
N % n_tiles != 0 remainders, a NULL partition-key stratum, multiple
partition keys of very different sizes, desc+asc mixed order, and a
buckets count both above and below the row count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bankcreditunion_datapipeline_spark.operators.ranking import (
    distributed_cummax_exclusive,
    distributed_cumsum,
    distributed_ntile,
    distributed_row_number,
)


def _frame(spark, n=257, parts=("x", "y", None)):
    # deterministic pseudo-random-ish values with HEAVY ties: v has
    # only 7 distinct values, so almost every order decision falls to
    # the id tiebreak -- exactly where a boundary-dependent split
    # would diverge from the window form.
    rows = [
        (i, parts[i % len(parts)], (i * i + 3 * i) % 7, f"s{i % 11}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, p string, v long, s string")


@pytest.mark.parametrize("buckets", [None, 3, 1000])
def test_global_row_number_matches_window(spark, buckets):
    df = _frame(spark)
    got = {
        r["id"]: (r["rn"], r["nd"])
        for r in distributed_row_number(
            df,
            [("v", "desc"), ("id", "asc")],
            out_col="rn",
            total_col="nd",
            buckets=buckets,
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {
        r["id"]: (r["rn"], r["nd"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("long")
            .alias("nd"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_tiles", [1, 5, 10, 300])
def test_global_ntile_matches_window(spark, n_tiles):
    df = _frame(spark)
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(
            df, n_tiles, [("v", "asc"), ("id", "asc")], buckets=7
        ).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["t"]
        for r in df.select(
            "id", F.ntile(n_tiles).over(w).cast("long").alias("t")
        ).collect()
    }
    assert got == want


def test_partitioned_ntile_matches_window_null_stratum(spark):
    """PARTITION BY with a NULL stratum and very unequal key sizes."""
    df = _frame(spark, n=301)
    got = {
        (r["p"], r["id"]): r["dec"]
        for r in distributed_ntile(
            df,
            10,
            [("v", "desc"), ("id", "asc")],
            partition_cols=["p"],
            out_col="dec",
            buckets=5,
        ).collect()
    }
    w = Window.partitionBy("p").orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r["p"], r["id"]): r["d"]
        for r in df.select(
            "p", "id", F.ntile(10).over(w).cast("long").alias("d")
        ).collect()
    }
    assert got == want


def test_partitioned_row_number_matches_window(spark):
    df = _frame(spark, n=97)
    got = {
        (r["p"], r["id"]): (r["rn"], r["n"])
        for r in distributed_row_number(
            df,
            [("s", "asc"), ("v", "asc"), ("id", "desc")],
            partition_cols=["p"],
            out_col="rn",
            total_col="n",
        ).collect()
    }
    w = Window.partitionBy("p").orderBy(
        F.asc("s"), F.asc("v"), F.desc("id")
    )
    want = {
        (r["p"], r["id"]): (r["rn"], r["n"])
        for r in df.select(
            "p",
            "id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("p"))
            .cast("long")
            .alias("n"),
        ).collect()
    }
    assert got == want


def test_ntile_small_frames_and_validation(spark):
    # N < n_tiles: every row its own tile, ids in order
    df = spark.createDataFrame(
        [(1, 30), (2, 10), (3, 20)], "id long, v long"
    )
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(df, 10, [("v", "asc"), ("id", "asc")])
        .collect()
    }
    assert got == {2: 1, 3: 2, 1: 3}
    # empty frame
    empty = df.filter(F.col("v") > 100)
    assert distributed_ntile(empty, 4, [("v", "asc")]).count() == 0
    assert (
        distributed_row_number(empty, [("v", "asc")], out_col="r").count()
        == 0
    )
    with pytest.raises(ValueError, match="asc|desc"):
        distributed_row_number(df, [("v", "sideways")]).collect()
    with pytest.raises(ValueError, match="n_tiles"):
        distributed_ntile(df, 0, [("v", "asc")])
    with pytest.raises(ValueError, match="empty order"):
        distributed_row_number(df, [])


def test_distributed_cumsum_matches_window(spark):
    df = _frame(spark, n=143)
    got = {
        r["id"]: (r["cum"], r["rn"], r["tot"], r["n"])
        for r in distributed_cumsum(
            df,
            [("v", "desc"), ("id", "asc")],
            "v",
            partition_cols=["p"],
            out_col="cum",
            rank_col="rn",
            total_col="tot",
            count_col="n",
            buckets=4,
        ).collect()
    }
    w = Window.partitionBy("p").orderBy(F.desc("v"), F.asc("id"))
    wall = Window.partitionBy("p")
    want = {
        r["id"]: (r["cum"], r["rn"], r["tot"], r["n"])
        for r in df.select(
            "id",
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("v").over(wall).cast("long").alias("tot"),
            F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        ).collect()
    }
    assert got == want


def test_distributed_cumsum_null_value_fails_loud(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "id long, v long"
    )
    with pytest.raises(Exception, match="non-NULL integer value"):
        distributed_cumsum(df, [("id", "asc")], "v").collect()


def test_distributed_cummax_exclusive_matches_window(spark):
    df = _frame(spark, n=211)
    got = {
        r["id"]: r["pm"]
        for r in distributed_cummax_exclusive(
            df, [("id", "asc")], "v", out_col="pm", buckets=6
        ).collect()
    }
    w = (
        Window.orderBy(F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["id"]: r["pm"]
        for r in df.select("id", F.max("v").over(w).alias("pm")).collect()
    }
    assert got == want
    assert got[0] is None  # first row has no prior maximum


def test_distributed_rank_stable_under_persist_and_wide_rows(spark):
    """r12 regression: _with_global_rank joins staged rows to their
    offsets by spark_partition_id, which is only meaningful if the
    offsets job and later consumers see the IDENTICAL range-exchange
    layout. Before the staged localCheckpoint pin, persisting the
    ranked output of a wide-row frame could re-execute the exchange
    under a DIFFERENT AQE coalescing, silently dropping every row
    whose __pid moved (measured at sf0.1: 1125 of 2000 rows gone).
    Pin: count preserved, rank is a clean permutation, on a persisted
    wide frame."""
    import pyspark.sql.functions as F

    from bankcreditunion_datapipeline_spark.operators.ranking import (
        distributed_row_number,
    )

    n = 500
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("k"),
            # wide payload columns, mirroring the q317 trigger shape
            F.array_repeat(F.col("id").cast("double"), 64).alias("v1"),
            F.array_repeat((F.col("id") * 2).cast("double"), 64).alias("v2"),
        )
        .repartition(16)
    )
    r = distributed_row_number(df, [("k", "asc"), ("id", "asc")]).persist()
    assert r.count() == n
    rns = sorted(x["rn"] for x in r.select("rn").collect())
    assert rns == list(range(1, n + 1))
    r.unpersist()
