"""Bucketed-table publishing: the co-located-join surface.

At 100 TB the expensive part of a recurring fact-to-fact join is the
shuffle, and the shuffle is the SAME every night if the join key is
stable. Hive-style bucketing amortizes it: write both tables
`bucketBy(n, key)` once, and every subsequent equi-join on that key
plans WITHOUT an Exchange on either side (SortMergeJoin reads the
bucket files pre-partitioned). This module is the publish half; the
proof that the exchange actually disappears is the plan assertion in
tests/test_bucketed.py -- a claim about physical plans belongs in a
test that reads the physical plan.

The reference publishes plain partitioned parquet (gold layer,
`pipelineApplication/goldLayer/BuildGoldLayer.py`); partitioning prunes
SCANS but cannot co-locate JOINS -- bucketing is the missing half at
fact-to-fact scale, so it's first-class here.

Bucketing knobs that matter at scale:
- n_buckets fixes the join parallelism of the bucket-local plan; size
  it so a bucket of the LARGER table fits an executor's memory
  comfortably (buckets ~= table_bytes / 256 MB is a sane start).
- both sides must agree on (key, n_buckets) -- a mismatch silently
  falls back to shuffling the smaller-bucketed side.
- bucket pruning: an equality filter on the bucket key scans 1/n of
  the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def publish_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog. Idempotent under overwrite.

    The repartition on the bucket key before the write prevents the
    classic bucketed-write explosion: without it every WRITE TASK
    emits a file per bucket (tasks x buckets small files).

    MEASURED caveat (pinned in tests/test_bucketed.py): Spark 3+/4
    does NOT elide the SortMergeJoin's per-side Sort from `sortBy`
    metadata even at one file per bucket -- the win bucketing actually
    delivers is the removed EXCHANGE (the network cost); the residual
    sort is partition-local. `sortBy` still pays for itself via
    parquet min/max data skipping within buckets."""
    w = (
        df.repartition(n_buckets, bucket_col)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def coloc_join(
    spark: SparkSession,
    table_a: str,
    table_b: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables published with the SAME (key, n_buckets)
    bucketing. When the bucket specs agree, the physical plan contains
    no Exchange on either side -- asserted by the test, not assumed."""
    return spark.table(table_a).join(spark.table(table_b), key, how)
