"""Interval (range) joins via bucket blocking.

Spark has no native band/range join optimization: a raw
``a JOIN b ON a.start <= b.end AND b.start <= a.end`` plans as
BroadcastNestedLoopJoin (small side) or a cartesian product -- O(n*m)
comparisons regardless of how sparse the actual overlaps are. The
standard distributed fix (used by Databricks' range-join hint and
GeoSpark-style spatial joins alike) is to discretize the range dimension
into buckets, equi-join on (keys..., bucket) so Spark's hash machinery
does the heavy lifting, then apply the EXACT predicate to the candidate
pairs and dedup pairs that co-occurred in several buckets.

Cost shape: each interval replicates into O(span / bucket) rows, and
only genuinely co-bucketed pairs are ever compared -- with bucket width
chosen near the typical interval span, candidate generation is within a
small constant of the true overlap count, and every step is a hash
shuffle on (keys, bucket), never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlapping_interval_pairs(
    df: DataFrame,
    keys: list[str],
    id_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """All pairs of rows sharing ``keys`` whose [start, end] DATE
    intervals overlap (inclusive), each pair emitted once with the
    lexicographically-smaller ``id_cols`` tuple on the left.

    Month buckets: an interval [s, e] lands in every month it touches
    (``sequence(trunc(s,'MM'), trunc(e,'MM'), 1 month)``), two intervals
    overlap only if they share a month, so the month equi-join is a
    complete candidate generator; the exact inequality filter then
    discards same-month near-misses, and `distinct()` collapses pairs
    spanning several shared months.

    Rows with NULL or inverted (end < start) intervals can't overlap
    anything and are dropped up front -- mirror that contract in any
    oracle.
    """
    valid = df.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    cols = keys + id_cols + [start_col, end_col]
    bucketed = valid.select(*cols).withColumn(
        "__m",
        F.explode(
            F.sequence(
                F.trunc(F.col(start_col), "MM"),
                F.trunc(F.col(end_col), "MM"),
                F.expr("interval 1 month"),
            )
        ),
    )
    side = id_cols + [start_col, end_col]
    a = bucketed.select(
        *keys, *[F.col(c).alias(f"a_{c}") for c in side], "__m"
    )
    b = bucketed.select(
        *keys, *[F.col(c).alias(f"b_{c}") for c in side], "__m"
    )

    # strict lexicographic (id_cols of a) < (id_cols of b): pair dedup
    lt = F.lit(False)
    for c in reversed(id_cols):
        lt = (F.col(f"a_{c}") < F.col(f"b_{c}")) | (
            (F.col(f"a_{c}") == F.col(f"b_{c}")) & lt
        )

    exact = lt & (F.col(f"a_{start_col}") <= F.col(f"b_{end_col}")) & (
        F.col(f"b_{start_col}") <= F.col(f"a_{end_col}")
    )
    # keys + month in the USING list -> a plain hash equi-join; the exact
    # band predicate only ever sees co-bucketed candidates
    return a.join(b, keys + ["__m"]).filter(exact).drop("__m").distinct()


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Union (coalesce) overlapping-or-touching intervals per key -- the
    islands-and-gaps primitive: coverage windows from raw events, machine
    uptime from heartbeats, contiguous availability from bookings.
    `overlapping_interval_pairs` asks which intervals MEET; this asks
    what their union IS.

    Returns one row per merged island: (key_cols..., start_col = island
    min start, end_col = island max end). Touching intervals
    (next.start == prev.end) merge; a strictly greater start opens a new
    island. Caller guarantees start <= end and non-NULL bounds/keys.

    Plan shape: ONE partitioning by key_cols carries both windows (the
    running max(end) over preceding rows and the running island-id sum)
    and the island aggregate -- no self-join, no corpus-wide state, so
    the operator scales with the widest single key, not the table. The
    classic sweep-line made relational: new_island = [start > max(end)
    of all earlier intervals], island_id = running sum of the flag.
    `tiebreak_col` pins a total order for equal starts (required for a
    deterministic twin; island RESULTS are tie-order-independent since
    equal starts always co-merge)."""
    from pyspark.sql.window import Window

    order = [F.col(start_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new",
        F.when(
            prev_end.isNull() | (F.col(start_col) > prev_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__isl", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy(*key_cols, "__isl")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
        )
        .drop("__isl")
    )


def interval_integrity(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-key integrity profile of a set of CLOSED integer intervals
    [start, end] (epoch days, versions, sequence numbers): the audit a
    warehouse runs over validity windows and fulfillment spans before
    trusting them downstream.

    Returns one row per key:
      n_intervals, n_islands (merge_intervals semantics: touching
      endpoints merge, a strictly greater start opens a new island),
      n_gaps = n_islands - 1, span_units = max(end) - min(start) + 1,
      covered_units = sum of island lengths, gap_units = span -
      covered, coverage_permille = covered * 1000 div span, and
      max_concurrency = the maximum number of intervals simultaneously
      open at any unit (the +1/-1 sweep over half-open [start, end+1)
      event points; per-point deltas are SUMMED before the running
      total reads them, so tie order cannot matter).

    Overlap pathology reads as max_concurrency > 1; gap pathology as
    n_gaps > 0 / coverage_permille < 1000.  Rows with NULL bounds are
    excluded (no interval to audit); end < start fails loud -- a
    negative-length interval is a data bug, not a stratum.

    Scale: one partitioning by key carries the island windows (the
    merge_intervals sweep); the concurrency pass rides the O(2n) point
    table grouped per (key, point) -- both scale with the widest
    single key, never the table.  All arithmetic is BIGINT; division
    is the floor `div` lane.
    """
    from pyspark.sql.window import Window

    # the fail-loud guard is a PROJECTION (when/otherwise raise_error,
    # the gini_e6 shape), not a filter conjunct: a where(assert_true)
    # can be merged with the caller's own domain filter and evaluated
    # on rows that filter would have dropped (Catalyst filter
    # combination -- observed on q291's ship >= orderdate domain)
    base = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).select(
        *key_cols,
        F.col(start_col).cast("long").alias("__s"),
        F.when(
            F.col(end_col).cast("long") >= F.col(start_col).cast("long"),
            F.col(end_col).cast("long"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "interval_integrity: end < start -- negative-length "
                    "interval is a data bug, not a stratum"
                )
            )
        )
        .alias("__e"),
    )
    w = Window.partitionBy(*key_cols).orderBy("__s", "__e")
    prev_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new",
        F.when(
            prev_end.isNull() | (F.col("__s") > prev_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__isl",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(*key_cols, "__isl").agg(
        F.min("__s").alias("__is"),
        F.max("__e").alias("__ie"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    per_key = islands.groupBy(*key_cols).agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.min("__is").cast("long").alias("__mn"),
        F.max("__ie").cast("long").alias("__mx"),
        F.sum(F.col("__ie") - F.col("__is") + 1).cast("long").alias(
            "covered_units"
        ),
    )
    pts = base.select(
        *key_cols, F.col("__s").alias("__p"), F.lit(1).alias("__d")
    ).unionByName(
        base.select(
            *key_cols,
            (F.col("__e") + 1).alias("__p"),
            F.lit(-1).alias("__d"),
        )
    )
    net = pts.groupBy(*key_cols, "__p").agg(F.sum("__d").alias("__nd"))
    wp = Window.partitionBy(*key_cols).orderBy("__p")
    conc = (
        net.withColumn(
            "__open",
            F.sum("__nd").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(*key_cols)
        .agg(F.max("__open").cast("long").alias("max_concurrency"))
    )
    join_cond = None
    conc2 = conc
    for k in key_cols:
        conc2 = conc2.withColumnRenamed(k, f"__c_{k}")
        c = F.col(k).eqNullSafe(F.col(f"__c_{k}"))
        join_cond = c if join_cond is None else (join_cond & c)
    return (
        per_key.join(conc2, join_cond)
        .select(
            *key_cols,
            "n_intervals",
            "n_islands",
            (F.col("n_islands") - 1).cast("long").alias("n_gaps"),
            (F.col("__mx") - F.col("__mn") + 1).cast("long").alias(
                "span_units"
            ),
            "covered_units",
            (F.col("__mx") - F.col("__mn") + 1 - F.col("covered_units"))
            .cast("long")
            .alias("gap_units"),
            F.expr(
                "CAST(covered_units * 1000 div (__mx - __mn + 1) "
                "AS BIGINT)"
            ).alias("coverage_permille"),
            "max_concurrency",
        )
    )


def interval_deltas(
    iv: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    day_typed: bool = True,
) -> DataFrame:
    """Per-day open/close deltas from CLOSED intervals [start, end]:
    +1 opened at start, +1 closed at end + 1 (half-open sweep points),
    grouped to one row per day.  This is the SUM-MONOID half of the
    backlog series -- per-batch/per-shard delta partials merge exactly
    by addition, which is what makes the streaming twin trivial.

    ``day_typed`` True treats the bounds as DATEs (end + 1 via
    date_add); False treats them as integer units.  Returns
    (day, opened, closed).
    """
    nxt = (
        F.date_add(F.col(end_col), 1)
        if day_typed
        else (F.col(end_col) + 1)
    )
    pts = iv.select(
        F.col(start_col).alias("day"),
        F.lit(1).alias("__o"),
        F.lit(0).alias("__c"),
    ).unionByName(
        iv.select(
            nxt.alias("day"), F.lit(0).alias("__o"), F.lit(1).alias("__c")
        )
    )
    return pts.groupBy("day").agg(
        F.sum("__o").cast("long").alias("opened"),
        F.sum("__c").cast("long").alias("closed"),
    )


def backlog_from_deltas(daily: DataFrame) -> DataFrame:
    """Finisher for the backlog series: one global running sum of
    (opened - closed) over the per-day delta summary -- open_count(d)
    = intervals open during d.  Per-day deltas were already SUMMED
    (interval_deltas), so the running total is tie-order independent.
    Runs over O(distinct days), never the interval table; only DELTA
    days appear (piecewise constant between them -- densify with
    forward_fill_daily when a consumer needs every day)."""
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed"))
        .over(w)
        .cast("long")
        .alias("open_count"),
    )
