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
