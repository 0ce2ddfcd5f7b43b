"""Stream-stream joins with watermark-bounded state.

The reference pipeline is batch-only; SURVEY §2.9 maps its incremental
ingest onto Structured Streaming.  This module adds the join surface of
that mapping: correlating two live streams (e.g. ad views with purchases)
without unbounded state.

Scale shape: a stream-stream equi-join keyed on `key_cols` with a time-
range predicate lets Spark bound both state stores -- left rows older
than (watermark + gap) and right rows older than the watermark are
evicted, so state is O(arrival_rate x horizon), independent of stream
length.  Without the range condition the state grows forever; that is the
canonical mistake this operator exists to prevent.

The same function works on batch DataFrames (watermarks are a no-op in
batch), which is how the equivalence tests and the q100 oracle twin pin
the semantics.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    gap_seconds: int = 1800,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Pair left rows with right rows of equal keys whose timestamp falls in
    ``[left_ts, left_ts + gap_seconds]``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename before
    calling) so the range predicate is unambiguous after the join.

    Both inputs are watermarked on their own event-time column; with the
    range condition this makes the join state finite.  ``how='inner'``
    emits matches as soon as both rows arrive.  Outer variants only emit
    the unmatched side once the watermark has passed the join horizon --
    on a finite replay (availableNow) the watermark never advances past the
    final batch, so unmatched rows are withheld; use outer joins only on
    genuinely continuous streams.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    keys = functools.reduce(
        operator.and_, [lw[k] == rw[k] for k in key_cols]
    )
    in_range = (rw[right_ts] >= lw[left_ts]) & (
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    )
    joined = lw.join(rw, keys & in_range, how)
    for k in key_cols:
        joined = joined.drop(rw[k])
    return joined
