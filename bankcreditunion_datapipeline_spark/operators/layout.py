"""Physical-layout operators: space-filling-curve keys for multi-column
data clustering.

Z-ordering maps N columns onto one integer key whose sort order keeps
rows close in EVERY dimension -- the property behind Delta's OPTIMIZE
ZORDER BY and file-level min/max skipping: after sorting by the z-key,
each file's min/max range per column is narrow, so a predicate on ANY of
the z-ordered columns prunes most files. The key is plain integer bit
math (JVM codegen, engine-portable) -- no UDF, no shuffle beyond the
sort that uses it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low `bits` bits of two non-negative int columns into
    a single z-curve key (x gets even bit positions, y odd).

    Exact integer arithmetic -- reproducible in any engine with shifts.
    For more columns, interleave round-robin; for floats/dates, quantile-
    bucket to ints first (the standard z-order recipe).
    """
    xs = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(xs.bitwiseAND(F.lit(1 << i)), i)
        out = out + F.shiftleft(ys.bitwiseAND(F.lit(1 << i)), i + 1)
    return out


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, bits: int = 8, key_col: str = "z"
) -> DataFrame:
    """Attach the z-key and range-repartition + sort by it -- the write-side
    clustering pass (OPTIMIZE ZORDER equivalent). Files written from the
    result have narrow min/max envelopes on BOTH x and y."""
    keyed = df.withColumn(key_col, zorder_key(F.col(x), F.col(y), bits))
    return keyed.repartitionByRange(key_col).sortWithinPartitions(key_col)
