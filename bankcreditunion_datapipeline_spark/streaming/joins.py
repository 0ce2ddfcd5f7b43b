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


def streaming_asof_enrich(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    dim_dir: str,
    out_dir: str,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_ts_as: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Stream-side as-of enrichment (r6 VERDICT #7): each micro-batch of
    fact rows is as-of joined -- by the SAME batch `asof_join` operator
    q27/q100/q170 grade, so forward/backward/tolerance semantics are
    identical by construction -- against the dim snapshot CURRENT at
    processing time, and written to its own ``batch=<id>`` output
    partition.

    Contracts, in the house streaming discipline:
    - idempotent redelivery: a re-run batch OVERWRITES its own
      partition, so retries replace rather than duplicate (the
      streaming_bloom/count_min pattern);
    - state is bounded by construction: foreachBatch holds only the
      micro-batch and the dim snapshot -- there is no stream-stream
      state store to water-mark, which is why a slowly-changing
      dimension should come through a VERSIONED snapshot dir
      (streaming_upsert's ``current``) rather than a second stream;
    - dim versioning is processing-time: a batch is enriched against
      the snapshot installed when it runs (the standard ETL dimension-
      lookup semantics). For event-time-versioned dims, materialize
      the version rows INTO the dim with their effective ts and let
      the as-of ts predicate pick the right version -- that is what
      the as-of join is for.

    Equivalence: with a static dim, union(batch outputs) == one-shot
    batch asof_join of all the data (each left row's match depends only
    on the dim) -- pinned by
    tests/test_streaming.py::test_streaming_asof_enrich_matches_batch_and_is_idempotent
    (backward+tolerance+right_ts_as, forward, and checkpoint-wipe
    redelivery).
    """
    import os

    from ..operators.temporal import asof_join
    from .incremental import incremental_files

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        dim = spark.read.parquet(dim_dir)
        out = asof_join(
            df,
            dim,
            key_cols,
            ts_col,
            value_cols,
            direction=direction,
            tolerance=tolerance,
            right_ts_as=right_ts_as,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    incremental_files(spark, source_dir, checkpoint_dir, schema, batch_fn, fmt=fmt)
