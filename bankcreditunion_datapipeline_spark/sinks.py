"""Sinks (SURVEY §2.2 K1-K4): partitioned parquet/delta writers.

Delta Lake is the reference's gold format (goldLayer/BuildGoldLayer.py:219);
`format="delta"` is used when delta-spark is importable and falls back to
parquet otherwise (this container has no delta), keeping the partitioning
and schema-evolution API identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def write_append(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """K1: append accumulation (bronze raw landing,
    bronzeLayer/BuildBronzeLayer.py:87,97,123,133,143)."""
    df.write.format(fmt).mode("append").save(path)


def write_overwrite(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """K2: snapshot replace (silver, silverLayer/BuildSilverLayer.py:336-337)."""
    df.write.format(fmt).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: co-locates rows by hash(bucket_cols) so joins
    and aggregations between tables bucketed the same way need NO shuffle
    (the Exchange disappears from the plan -- verified in tests). The scale
    tool for repeated fact-fact joins on a stable key.

    The repartition on the bucket columns before the write prevents the
    classic bucketed-write explosion: without it every WRITE TASK emits
    a file per bucket (tasks x buckets small files).

    MEASURED caveats (pinned in tests/test_sinks_scale.py): Spark 3+/4
    does NOT elide the SortMergeJoin's per-side Sort from `sortBy`
    metadata even at one file per bucket -- the win bucketing delivers
    is the removed EXCHANGE (the network cost); the residual sort is
    partition-local, and sortBy still pays for itself via parquet
    min/max skipping. Both sides must agree on (key, num_buckets) or
    the plan falls back to exchanging; filter-only scans need
    spark.sql.sources.bucketing.autoBucketedScan.enabled=false for
    bucket PRUNING to engage."""
    writer = (
        df.repartition(num_buckets, *bucket_cols)
        .write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_with_schema_merge(spark, path: str) -> DataFrame:
    """Schema-evolution read for tables whose column set grows over time
    (the quarter-pivot gold tables gain a column per quarter, K4): parquet
    mergeSchema unions the schemas of all files; delta handles this via
    overwriteSchema at write time."""
    return spark.read.option("mergeSchema", True).parquet(path)


def compact_to(
    spark,
    src_path: str,
    dest_path: str,
    target_files: int,
    fmt: str = "parquet",
    size_balanced: bool = False,
) -> int:
    """Small-files compaction: rewrite a directory into `target_files`
    larger files at `dest_path` (write-then-swap at the catalog/path level;
    never rewrites in place, which is unsafe on object stores).

    The small-files problem is the dominant operational failure at scale:
    a 100 TB table accreted from streaming micro-batches ends up with
    millions of KB-sized files, and scan planning/open overhead dwarfs IO.
    coalesce() merges narrow (no shuffle); size_balanced=True repartitions
    (one shuffle) when input files are skewed enough that merged outputs
    would be lopsided. Returns the number of rows rewritten.
    """
    df = spark.read.format(fmt).load(src_path)
    out = df.repartition(target_files) if size_balanced else df.coalesce(target_files)
    out.write.format(fmt).mode("overwrite").save(dest_path)
    return df.count()


def write_gold(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    overwrite_schema: bool = False,
    fmt: str | None = None,
) -> None:
    """K3/K4: analysis-ready publish, disk-partitioned for downstream
    partition pruning (goldLayer/BuildGoldLayer.py:217-236).

    overwrite_schema=True is the schema-evolution path for the quarter-pivot
    tables whose column set grows each quarter (K4, `overwriteSchema`
    goldLayer/BuildGoldLayer.py:230).
    """
    fmt = fmt or ("delta" if delta_available() else "parquet")
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if overwrite_schema and fmt == "delta":
        writer = writer.option("overwriteSchema", "true")
    writer.save(path)
