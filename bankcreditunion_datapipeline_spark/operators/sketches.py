"""Mergeable-summary operators for domains too large to count exactly.

The exact sketch rollups (HLL via approx_count_distinct, theta overlap,
day-level bitmap masks) live directly in the query corpus (q66 / q63 /
q114) because Spark ships those as built-ins. This module adds the one
classic summary Spark lacks: SpaceSaving heavy hitters (Metwally et al.,
"Efficient Computation of Frequent and Top-k Elements in Data Streams",
ICDT 2005) for top-k over domains where exact per-item counting (q29's
groupBy) would shuffle more distinct keys than the cluster can hold.

Scale shape: each partition maintains at most `capacity` counters in one
sequential Arrow-batched pass (no shuffle, no sort); only the per-partition
summaries -- O(partitions x capacity) rows -- shuffle for the merge. The
result carries sound deterministic [lower, upper] bounds per item, and any
item with global true count > total_rows / capacity is guaranteed present
in the merged summary (the SpaceSaving guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SUMMARY_SCHEMA = StructType(
    [
        # NULL item = per-partition sentinel carrying that partition's
        # min-counter (pmin), needed for the sound merged upper bound
        StructField("item", StringType()),
        StructField("est", LongType()),   # SpaceSaving counter
        StructField("err", LongType()),   # overestimation bound
        StructField("pmin", LongType()),  # partition's min counter (0 if
                                          # the partition never filled up)
    ]
)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 1000,
) -> DataFrame:
    """Approximate top-k items of `col` with sound per-item count bounds:
    (item, count_lower, count_upper), ordered by count_upper desc with an
    item tiebreak.

    `capacity` trades memory for accuracy: per partition the summary keeps
    at most `capacity` counters, and any item whose GLOBAL true count
    exceeds total_rows / capacity is guaranteed to appear. Bounds are
    sound in both directions:

    - lower = sum over tracking partitions of (est - err); a partition's
      (est - err) never exceeds the item's true count there, and
      non-tracking partitions contribute >= 0.
    - upper = sum over tracking partitions of est, PLUS each non-tracking
      partition's min counter (an untracked item's count in a partition is
      bounded by that partition's minimum counter; 0 if the partition
      never filled its capacity). That cross-partition term is why the
      summaries carry a per-partition sentinel row.

    Exact counting (q29) beats this whenever the distinct domain fits a
    shuffle -- use heavy_hitters when it does not (URL hosts, raw n-grams,
    user agents at web scale).
    """

    def summarize(batches):
        import pandas as pd

        counters: dict[str, list[int]] = {}

        def feed(values):
            for v in values:
                if v is None:
                    continue
                c = counters.get(v)
                if c is not None:
                    c[0] += 1
                elif len(counters) < capacity:
                    counters[v] = [1, 0]
                else:
                    min_item = min(counters, key=lambda kk: counters[kk][0])
                    min_count = counters[min_item][0]
                    del counters[min_item]
                    counters[v] = [min_count + 1, min_count]

        for pdf in batches:
            feed(pdf[col].astype(object))
        pmin = (
            min(c[0] for c in counters.values())
            if len(counters) >= capacity
            else 0
        )
        rows = [
            {"item": it, "est": int(c[0]), "err": int(c[1]), "pmin": pmin}
            for it, c in counters.items()
        ]
        rows.append({"item": None, "est": 0, "err": 0, "pmin": pmin})
        yield pd.DataFrame(rows, columns=["item", "est", "err", "pmin"])

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, _SUMMARY_SCHEMA
    ).persist()
    # one sentinel per partition: total of all partitions' min counters
    totals = summaries.filter(F.col("item").isNull()).agg(
        F.sum("pmin").alias("__total_pmin")
    )
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(
            F.sum("est").alias("__sum_est"),
            F.sum("err").alias("__sum_err"),
            F.sum("pmin").alias("__tracking_pmin"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(totals))
        .select(
            "item",
            (F.col("__sum_est") - F.col("__sum_err"))
            .cast("long")
            .alias("count_lower"),
            (
                F.col("__sum_est")
                + F.col("__total_pmin")
                - F.col("__tracking_pmin")
            )
            .cast("long")
            .alias("count_upper"),
        )
        .orderBy(F.desc("count_upper"), F.asc("item"))
        .limit(k)
    )
