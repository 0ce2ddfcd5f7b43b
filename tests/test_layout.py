from __future__ import annotations

from pyspark.sql import functions as F


def _pyz(x: int, y: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_bit_interleave(spark):
    from bankcreditunion_datapipeline_spark.operators.layout import zorder_key

    rows = [(x, y) for x in (0, 1, 3, 200, 255, 300) for y in (0, 2, 5, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == _pyz(r.x % 256, r.y % 256), (r.x, r.y)


def test_cluster_by_zorder_bounds_both_dims(spark):
    from bankcreditunion_datapipeline_spark.operators.layout import (
        cluster_by_zorder,
    )

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
    )
    clustered = cluster_by_zorder(df, "x", "y", bits=6)
    # within each 64-key z block, both dimensions stay within an 8-wide
    # envelope (the file-skipping property); a single-column sort would
    # leave the other dimension's span at full width
    spans = (
        clustered.groupBy((F.col("z") / 64).cast("long").alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert spans and all(r.xs <= 8 and r.ys <= 8 for r in spans)


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """AQE runtime bloom-filter join pruning: a selective filter on the dim
    side injects bloom_filter_might_contain onto the fact scan, so fact
    rows that cannot join are dropped BEFORE the shuffle. At 100 TB this
    is the difference between shuffling the whole fact table and shuffling
    only the matching slice; locally we lower the application-side size
    threshold (default 10GB) to make the small fixture eligible."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 50000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
    )
    dim = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 50 == 0, "hot").otherwise("cold").alias("tag"),
    )
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        # force a shuffle join: broadcast joins get DPP/broadcast pruning
        # instead and never need the bloom path
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim")).filter("tag = 'hot'")
        j = f.join(d, "k").select("k", "v")
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys.lower()
        assert j.count() == 100  # pruning never changes the result
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALE.md claims AQE skew-join handles moderate hot keys without
    manual salting: with test-scale thresholds, a join whose left side is
    dominated by one key must finalize as SortMergeJoin(skew=true) -- the
    hot partition split across tasks -- with results unchanged."""
    from pyspark.sql import functions as F

    conf = spark.conf
    knobs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in knobs.items():
        try:
            saved[k] = conf.get(k)
        except Exception:  # noqa: BLE001
            saved[k] = None
        conf.set(k, v)
    try:
        left = spark.range(0, 200000, 1, 8).select(
            F.when(F.col("id") < 150000, 0)
            .otherwise(F.col("id") % 500)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 500, 1, 8).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right.hint("shuffle_merge"), "k")
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert n == 200000  # every left row matches exactly one right row
        assert "skew=true" in plan, plan[:800]
        assert "isFinalPlan=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
