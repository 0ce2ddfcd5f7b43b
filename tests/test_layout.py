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
