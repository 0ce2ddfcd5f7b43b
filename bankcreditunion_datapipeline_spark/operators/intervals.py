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
