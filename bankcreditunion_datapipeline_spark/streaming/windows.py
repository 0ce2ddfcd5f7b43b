"""Streaming windowed aggregations with late-data handling (SURVEY §2.9's
"if made continuous" mapping) + a stateful sessionization extension point.

The batch twins of these queries live in queries.py (q15_events_hourly);
these run the same logic continuously with watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "15 minutes",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Windowed count/sum per event_type with a watermark so state for
    closed windows is dropped (bounded memory on an unbounded stream).
    Tumbling by default; pass `slide` (< duration) for overlapping sliding
    windows -- each event then lands in duration/slide windows, which is a
    row fan-out of that factor inside the aggregation, not a self-join.

    Works on both batch and streaming DataFrames -- F.window is the same
    logical operator; only state management differs.

    Declared domain: event time at-or-after the epoch. Spark's own
    window alignment for PRE-EPOCH timestamps sits one slide below the
    floor grid (remainder-sign quirk, observed on 1969-12-30 23:59:59
    -> sliding starts {23:00, 23:15, 23:30}, missing 23:45) -- an
    engine-version-dependent artifact no oracle should replay, and
    windowing pre-epoch event time is corrupt-data territory anyway.
    Pre-epoch rows are excluded here, mirroring the operator's NULL-ts
    contract (F.window drops rows with no window to assign); caught by
    the r10 fuzz corpus's 1969 event.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.filter(F.col(ts_col) >= F.lit("1970-01-01").cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
        .groupBy(win, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "15 minutes",
) -> DataFrame:
    """Session windows per user: events within `gap` of each other merge into
    one session (F.session_window -- native stateful operator, no
    applyInPandasWithState needed for this shape)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drive a streaming DataFrame to an in-memory sink until all available
    data is processed (test/debug harness; production uses a real sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "15 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose `id_cols` were already seen
    within the watermark horizon (state for ids older than the watermark is
    evicted, so memory is bounded by arrival rate x delay, not stream
    length). The streaming twin of exact_dedup for at-least-once sources
    that re-deliver (Kafka replays, file-source restarts)."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        id_cols
    )
