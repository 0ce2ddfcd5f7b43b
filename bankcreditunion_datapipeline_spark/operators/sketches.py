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

        # Stream-Summary structure (Metwally et al. 2005, fig. 1): items
        # grouped into per-count buckets, buckets threaded into a
        # count-sorted doubly-linked list. Every operation -- hit, insert,
        # evict-min -- is O(1) dict/set work; the min counter is always the
        # head bucket. (A min() scan here would be O(capacity) per eviction
        # and O(n*capacity) per partition on all-distinct adversarial
        # streams, exactly the workload heavy hitters exist for.)
        count: dict[str, int] = {}     # item -> its counter value
        err: dict[str, int] = {}       # item -> overestimation bound
        # buckets hold items as insertion-ordered dicts (not sets): the
        # evicted victim is the OLDEST item in the min bucket, so eviction
        # order never depends on process-varying string hashing
        bucket: dict[int, dict] = {}   # counter value -> {item: None, ...}
        nxt: dict[int, int] = {}       # count -> next larger count
        prv: dict[int, int] = {}       # count -> next smaller count
        head = [0]                     # min count in the summary (0 = empty)

        def link_after(c, new):
            # splice bucket `new` right after bucket `c` in the list
            n = nxt.get(c)
            nxt[c] = new
            prv[new] = c
            if n is not None:
                nxt[new] = n
                prv[n] = new

        def unlink(c):
            p, n = prv.pop(c, None), nxt.pop(c, None)
            if p is not None:
                if n is not None:
                    nxt[p] = n
                else:
                    nxt.pop(p, None)
            if n is not None:
                if p is not None:
                    prv[n] = p
                else:
                    prv.pop(n, None)
            if head[0] == c:
                head[0] = n if n is not None else 0
            del bucket[c]

        def promote(v, c):
            # move item v from bucket c to bucket c+1 (creating it if absent)
            b = bucket[c]
            b.pop(v, None)
            tgt = c + 1
            if tgt in bucket:
                bucket[tgt][v] = None
            else:
                bucket[tgt] = {v: None}
                link_after(c, tgt)
            if not b:
                unlink(c)
            count[v] = tgt

        def feed(values):
            for v in values:
                if v is None:
                    continue
                c = count.get(v)
                if c is not None:
                    promote(v, c)
                elif len(count) < capacity:
                    count[v] = 1
                    err[v] = 0
                    if 1 in bucket:
                        bucket[1][v] = None
                    else:
                        bucket[1] = {v: None}
                        if head[0]:
                            # 1 is <= every existing count: new head
                            nxt[1] = head[0]
                            prv[head[0]] = 1
                        head[0] = 1
                else:
                    mn = head[0]
                    b = bucket[mn]
                    victim = next(iter(b))
                    b.pop(victim)
                    del count[victim]
                    del err[victim]
                    tgt = mn + 1
                    if tgt in bucket:
                        bucket[tgt][v] = None
                    else:
                        bucket[tgt] = {v: None}
                        link_after(mn, tgt)
                    if not b:
                        unlink(mn)
                    count[v] = tgt
                    err[v] = mn

        for pdf in batches:
            feed(pdf[col].astype(object))
        pmin = head[0] if len(count) >= capacity else 0
        rows = [
            {"item": it, "est": int(c), "err": int(err[it]), "pmin": pmin}
            for it, c in count.items()
        ]
        rows.append({"item": None, "est": 0, "err": 0, "pmin": pmin})
        yield pd.DataFrame(rows, columns=["item", "est", "err", "pmin"])

    from pyspark.sql.window import Window

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, _SUMMARY_SCHEMA
    )
    # ONE aggregation consumes the summaries exactly once (no persist, no
    # second scan): the per-partition sentinel rows (NULL item) group into
    # a single NULL-key row whose summed pmin IS the all-partitions total,
    # spread to the item rows by a window over the already-merged table --
    # O(tracked items) rows through the final single-partition window,
    # the same volume the merge itself emits.
    merged = summaries.groupBy("item").agg(
        F.sum("est").alias("__sum_est"),
        F.sum("err").alias("__sum_err"),
        F.sum("pmin").alias("__tracking_pmin"),
    )
    total_pmin = F.sum(
        F.when(F.col("item").isNull(), F.col("__tracking_pmin"))
    ).over(Window.partitionBy())
    return (
        merged.withColumn("__total_pmin", total_pmin)
        .filter(F.col("item").isNotNull())
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
