"""Temporal joins Spark lacks as built-ins: as-of join and interval range
join, expressed as compositions of existing DataFrame ops (SURVEY's custom-
operator rule (a): composition before pandas UDFs before mapPartitions).

Scale shapes:
- asof_join: ONE shuffle (window partition by key over the unioned stream).
  No per-row lookups, no broadcast requirement, no quadratic anything; skew
  is governed by the join key like any keyed window.
- range_join_buckets: equi-join on coarse time buckets + exact predicate
  re-filter, turning an unbounded theta-join into a bounded equi-join
  (each left row joins at most ceil(window/bucket)+1 buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import transient_persist
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    how: str = "left",
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_ts_as: str | None = None,
) -> DataFrame:
    """As-of join (pandas merge_asof semantics, distributed): for each
    left row, attach `value_cols` from the LATEST right row with
    right.ts <= left.ts (direction='backward', the default) or the
    EARLIEST right row with right.ts >= left.ts (direction='forward'),
    at equal keys; both directions are inclusive at equal ts.

    Implementation: tag sides, union on (keys, ts), and carry the
    nearest right ROW across with a window `last(..., ignorenulls)` --
    the streaming-friendly formulation (ONE sort-shuffle on the key, no
    range predicate, no per-row probe). 'forward' is the same scan over
    the reversed ts order. Right rows sort before left rows at equal
    ts, giving the inclusive semantics.

    `tolerance` (same units as ts_col, which must be NUMERIC when used
    -- pass epoch micros) rejects matches farther than that from the
    left row: the match becomes NULL exactly as if no right row
    existed. `right_ts_as` additionally exposes the matched right row's
    ts under that name (NULL when unmatched) -- latency metrics fall
    out as a subtraction.

    The right row's value columns travel packed in ONE struct (non-null
    as a whole even when every field is NULL), so (a) a left row
    matched to a right row whose values are legitimately NULL is
    distinguishable from a left row with no match at all, and (b) the
    match carries the nearest right row's values verbatim rather than
    skipping a NULL field back to some other row's non-null value.

    how='inner' drops unmatched left rows; 'left' keeps them with NULLs
    (DuckDB `ASOF [LEFT] JOIN` equivalents). With several right rows at
    the same (keys, ts) the carried one is scan-order-dependent --
    pre-dedup the right side to one row per (keys, ts) for a
    deterministic result.
    """
    assert direction in ("backward", "forward"), direction
    tagged_r = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts_col).alias("__rts"), *[F.col(c) for c in value_cols]
        ).alias("__r"),
    )
    r_struct_type = tagged_r.schema["__r"].dataType
    tagged_l = left.select(
        "*", F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__r", F.last(F.col("__r"), ignorenulls=True).over(w))
    if tolerance is not None:
        delta = (
            F.col(ts_col) - F.col("__r").getField("__rts")
            if direction == "backward"
            else F.col("__r").getField("__rts") - F.col(ts_col)
        )
        carried = carried.withColumn(
            "__r", F.when(delta <= F.lit(tolerance), F.col("__r"))
        )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    extra = (
        [F.col("__r").getField("__rts").alias(right_ts_as)]
        if right_ts_as
        else []
    )
    return out.select(
        *[c for c in left.columns],
        *[F.col("__r").getField(c).alias(c) for c in value_cols],
        *extra,
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval join: pairs where |left_ts - right_ts| <= window_seconds
    (optionally also equal on key_cols), via time-bucket blocking.

    Each side gets a coarse bucket id; the right side is replicated into the
    adjacent buckets its window can reach, so the join is a pure equi-join
    on (keys..., bucket) followed by the exact range re-filter. Replication
    factor = 2*ceil(window/bucket) + 1, chosen by `bucket_seconds`
    (defaults to the window size => right rows appear 3x).

    Range semantics are SECOND-truncated on both sides (unix_timestamp
    floors to whole seconds), so a pair straddling the window boundary by
    sub-second amounts matches iff the floored difference is in range.
    """
    bucket_seconds = bucket_seconds or window_seconds
    # ceil(window/bucket): a right row at floored-second f matches left
    # rows in [f - w, f + w], which spans at most ceil(w/b) buckets on
    # each side of f's own bucket.
    reach = (window_seconds - 1) // bucket_seconds + 1
    keys = key_cols or []
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("long")
    )
    rb = right.withColumn(
        "__rbucket", (F.unix_timestamp(F.col(right_ts)) / bucket_seconds).cast("long")
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.col("__rbucket") - reach, F.col("__rbucket") + reach)
        ),
    ).drop("__rbucket")
    joined = lb.join(rb, [*keys, "__bucket"]).drop("__bucket")
    exact = F.abs(
        F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))
    ) <= window_seconds
    return joined.filter(exact)


def fill_period_gaps(
    df: DataFrame,
    key_cols: list[str],
    period_col: str,
    fill_values: dict,
    interval: str = "3 months",
) -> DataFrame:
    """Densify a keyed time series: every key gets one row per period in
    the table's [min, max] span; missing periods take `fill_values`
    defaults (the continuous-rollup / gap-fill primitive downstream
    charting and windowed models expect -- lag/lead over a gappy series
    silently skips periods).

    Scale shape: the period axis is ONE tiny exploded sequence (O(span),
    driver-free) broadcast-cross-joined against distinct keys; the actual
    data then left-joins the scaffold on (key, period). One shuffle for
    the keys distinct, one for the final join; nothing quadratic.
    """
    span = df.agg(
        F.min(period_col).alias("__min"), F.max(period_col).alias("__max")
    )
    periods = span.select(
        F.explode(F.expr(f"sequence(__min, __max, interval {interval})")).alias(
            period_col
        )
    )
    keys = df.select(*key_cols).distinct()
    scaffold = keys.crossJoin(F.broadcast(periods))
    return scaffold.join(df, [*key_cols, period_col], "left").fillna(fill_values)


def scd2_from_snapshots(
    df: DataFrame,
    key_cols: list[str],
    snapshot_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Collapse a snapshot series into SCD2 validity intervals: one row per
    (key, unbroken run of identical tracked values), with `valid_from` =
    first snapshot of the run and `valid_to` = next run's start (NULL =
    current). The reference's silver table is exactly such a quarterly
    snapshot series keyed by (charter_number, institution_type,
    quarter_date) (reference silverLayer/BuildSilverLayer.py:312-327);
    SCD2 is its history-compressed form.

    Plan shape: two window passes over ONE shuffle on key_cols (change
    flag via lag, then run-id via running sum -- the gaps-and-islands
    idiom), a groupBy on (key, run) that reuses the same partitioning,
    and a lead() for valid_to. No self-joins.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(snapshot_col)
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    flagged = df.withColumn(
        "__chg", F.when(F.lag(F.col(snapshot_col)).over(w).isNull(), F.lit(True)).otherwise(changed)
    ).withColumn("__run", F.sum(F.col("__chg").cast("long")).over(w))
    runs = flagged.groupBy(*key_cols, "__run").agg(
        F.min(snapshot_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in tracked_cols],
    )
    w_runs = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Keyed MERGE/upsert without a table format: latest version per key
    wins across base ∪ delta (ties break toward the delta side). The
    parquet-era equivalent of Delta's MERGE INTO latest-wins; at scale,
    write the result partitioned/bucketed by key so the next merge's
    shuffle is avoidable.

    One unionByName + one window (single shuffle on key_cols). Delta rows
    with keys absent from base are inserts; matching keys with newer
    versions are updates; base rows otherwise survive unchanged.
    """
    from pyspark.sql import Window

    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        delta.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("__src")
    )
    return (
        tagged.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__src")
    )


def latest_changes(
    changes: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Reduce a change stream to the LATEST change per key (one window
    pass / one shuffle on key_cols, ordered by order_cols descending).
    Keeps every column -- including delete markers -- so the result can
    serve as a tombstone-preserving compacted log."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def apply_cdc(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change stream (inserts/updates/deletes) to produce the
    current snapshot: the LATEST change per key wins, and keys whose
    latest change is a delete are absent from the result.

    The CDC-apply primitive (Debezium-style op column) as one window pass:
    `latest_changes` + the delete filter. At scale this is the
    foreachBatch body of a streaming CDC pipeline (see
    streaming/incremental.py:streaming_cdc_apply, which persists the
    tombstones too), with the output written partitioned by key for the
    next apply; Delta's MERGE WHEN MATCHED THEN DELETE is the
    table-format spelling of the same statement.
    """
    return latest_changes(changes, key_cols, order_cols).filter(
        F.col(op_col) != delete_op
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    type_col: str = "change_type",
) -> DataFrame:
    """Row-level diff of two table snapshots: one row per key present in
    either side, tagged added / removed / changed / unchanged.

    The publishing primitive between full snapshots: diff a new extract
    against the published table, write only added+changed (and retract
    removed) instead of rewriting 100 TB. Both sides must be unique at
    `key_cols` grain (dedupe to the grain first -- a duplicated key fans
    the full-outer join out). One full-outer shuffle on the
    key; comparisons are column-wise null-safe (`IS DISTINCT FROM`), so
    NULL -> value and value -> NULL both count as changed -- no digest
    concatenation ambiguity. The JOIN is null-safe too, and presence is
    carried by explicit per-side flags rather than key-column NULL-ness,
    so a row whose key contains NULL still matches its counterpart
    instead of surfacing as a spurious added+removed pair. Emitted
    columns are the NEW side's values (the old side's for 'removed'
    rows).
    """
    compare_cols = compare_cols or [
        c for c in new.columns if c not in key_cols
    ]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    nw = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(nw, cond, "full_outer")
    # full-outer leaves the absent side's flag NULL
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
    tag = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out_cols = [
        # side-select (not coalesce) so a genuinely-NULL key value on the
        # present side is emitted as NULL rather than falling through
        F.when(in_new, F.col(f"__n_{c}")).otherwise(F.col(f"__o_{c}")).alias(c)
        for c in key_cols
    ] + [
        # side-select, not value-coalesce: a changed row whose NEW value is
        # NULL must emit NULL, not resurrect the old value
        F.when(in_new, F.col(f"__nv_{c}")).otherwise(F.col(f"__ov_{c}")).alias(c)
        for c in compare_cols
    ]
    return joined.select(*out_cols, tag.alias(type_col))


def merge_rollup(
    state: DataFrame,
    delta_agg: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge a delta's partial aggregates into persisted rollup state:
    union + re-sum per key. Because sums/counts are commutative monoids,
    (state ⊎ delta) re-aggregated == full recompute over all raw rows --
    so a 100 TB daily rollup is maintained by aggregating ONLY the new
    partition and merging O(affected keys) rows, never rescanning
    history. (avg = merged sum/count; min/max merge the same way;
    distinct-counts need the sketch rollups -- q66/q114.)

    The merge shuffles the two aggregate tables (tiny vs raw data), and
    only keys present in the delta change -- write back partitioned by
    day and the rewrite touches only affected partitions.
    """
    merged = state.select(*key_cols, *sum_cols).unionByName(
        delta_agg.select(*key_cols, *sum_cols)
    )
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    out: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``s_1 = v_1; s_t = alpha * v_t + (1 - alpha) * s_{t-1}``.

    EWMA is a true recursion -- no window frame expresses it (the
    pow-weight rewrite ``sum(a^(t-i) v_i)`` overflows its 2^i rebasing
    past ~1000 points) -- so this is the sanctioned per-key
    applyInPandas shape: one Arrow batch per key, the recursion runs in
    float64 inside the batch, state is O(1). Partitioning is by key (the
    natural shuffle); each key's series must fit a task, which is the
    same contract as any per-key state machine (sessionization,
    applyInPandasWithState).

    With ``alpha`` an exact binary fraction (0.5, 0.25) every step is
    pure IEEE arithmetic in recursion order, so any engine replaying the
    same recursion (e.g. a SQL recursive CTE) reproduces the values
    bit-for-bit -- the oracle technique behind q143.

    NULL contract: a NULL observation is NO observation -- it gets a
    NULL smoothed value and the recursion state carries unchanged to the
    next non-null point (never ``astype(float)`` first: that turns NULL
    into NaN and one NaN poisons every subsequent smoothed value for the
    key, which is neither SQL's NULL propagation nor a defensible
    estimate). Mirrored in the q143 oracle by running the recursive CTE
    over the non-null rows and left-joining the NULL rows back.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
        f"{order_col} {df.schema[order_col].dataType.simpleString()}, "
        f"{value_col} double, {out} double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        s = None
        acc = []
        for v in pdf[value_col]:
            if pd.isna(v):
                acc.append(None)
            else:
                v = float(v)
                s = v if s is None else alpha * v + (1.0 - alpha) * s
                acc.append(s)
        pdf[out] = acc
        return pdf[[key_col, order_col, value_col, out]]

    return df.groupBy(key_col).applyInPandas(smooth, out_schema)


def bucket_checksums(
    df: DataFrame,
    key_col: str,
    digest: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Anti-entropy bucket checksums: (bucket, n, xs) where bucket =
    pmod(key, n_buckets), n = row count and xs = bit_xor of `digest`
    (a 60-bit md5-lane row hash supplied by the caller, so the fold --
    and therefore the whole comparison -- replays exactly in SQL).

    This is the Merkle-leaf primitive for reconciling two copies of a
    table at scale: comparing replicas row-by-row shuffles both tables
    in full, while comparing their checksum frames touches n_buckets
    rows -- only buckets whose (n, xs) differ need the row-level
    `snapshot_diff` pass, and XOR is order- and partition-independent,
    so no sort is ever needed. NULL keys are excluded (a keyless row
    cannot be reconciled; count them separately if they matter).
    """
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.pmod(F.col(key_col), F.lit(n_buckets)).alias("bucket"),
            digest.alias("__d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_xor(__d)").alias("xs"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition table over per-key ordered event
    sequences: one row per observed (prev_state, next_state) with its
    count and integer-permille transition probability.

    `order_cols` must be a deterministic total order within each key
    (ts alone ties under second-resolution data -- append the event id,
    the q190 tiebreak discipline); rows with a NULL key or NULL order
    column are the caller's job to filter, visibly, in the query.

    permille = n * 1000 div n_from (floor, repo division discipline), so
    a state's out-permilles sum to <= 1000 with the deficit carried by
    truncation -- documented, not redistributed (callers needing exact
    re-allocation compose `proportional_allocation`).

    Scale: one shuffle for the per-key sequence window (partitioned by
    key -- sequences never cross partitions), one map-side-combining
    groupBy over (prev, next) pairs whose cardinality is |states|^2, a
    dim. The permille join is a broadcast of per-prev totals.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("next_state"),
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = pairs.groupBy("prev_state").agg(
        F.sum("n_trans").alias("__n_from")
    )
    return pairs.join(F.broadcast(totals), "prev_state").select(
        "prev_state",
        "next_state",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.expr("n_trans * 1000 div __n_from").alias("permille"),
    )


def time_weighted_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Time-weighted mean of a step function: each row's INTEGER value
    holds from its timestamp until the key's next observation; the mean
    weights each value by its holding duration in whole seconds --
    the interval-correct average an unweighted avg() gets wrong whenever
    observations are irregular (the account-balance / exposure shape).

    Window spans [first_ts, last_ts] per key: the final observation has
    zero holding time and contributes nothing (it opens the NEXT
    window); keys with a single observation have an empty span and are
    omitted. Timestamps truncate to seconds on both sides of the
    difference (the q190 second-resolution contract). `order_tiebreak`
    columns break equal-timestamp ties deterministically.

    Output: (key, span_s, twm) with twm = sum(value * dur) div sum(dur)
    -- floor division, integer end-to-end (value * dur <= 9e18 is the
    caller's lane budget: cents x seconds spans ~3e14 at century scale).

    Scale: one shuffle -- the per-key lead() window -- then a map-side
    combining groupBy on the same key (AQE reuses the partitioning).
    """
    order_cols = [ts_col, *(order_tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    dur = (
        F.unix_timestamp(F.lead(ts_col).over(w))
        - F.unix_timestamp(F.col(ts_col))
    ).cast("long")
    stepped = df.select(
        F.col(key_col),
        F.col(value_col).alias("__v"),
        dur.alias("__dur"),
    ).filter(F.col("__dur").isNotNull())
    return (
        stepped.groupBy(key_col)
        .agg(
            F.sum("__dur").cast("long").alias("span_s"),
            F.sum(F.col("__v") * F.col("__dur")).cast("long").alias("__num"),
        )
        .filter(F.col("span_s") > 0)
        .select(
            key_col,
            "span_s",
            F.expr("__num div span_s").alias("twm"),
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    order_tiebreak: list[str] | None = None,
    out: str = "sid",
) -> DataFrame:
    """Gap-based sessionization: assign a per-key session id that
    increments whenever the gap since the previous event reaches
    `gap_minutes` -- the q151 funnel's inline construction promoted to
    a reusable operator (q151 keeps its verbatim-oracled inline twin).

    sid is a running sum of session-start flags over the (ts,
    tiebreak) order, so it is 1-based, dense, and deterministic; the
    session KEY is (key_col, sid).

    Scale: one shuffle -- both windows (lag and running sum) share the
    same (key, order) partitioning, so Catalyst plans a single sort +
    exchange; downstream per-session aggregates reuse the key
    partitioning.
    """
    order_cols = [ts_col, *(order_tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            >= gap_minutes * 60
        ),
        1,
    ).otherwise(0)
    return df.withColumn(
        out,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def scd2_compact(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 compaction: collapse a per-key
    event stream into state validity intervals -- one row per state
    RUN, with [effective_from, effective_to) half-open validity and an
    is_current flag (effective_to NULL on the open interval).

    The classic warehouse build (Kimball SCD2) from an event log:
    keep only CHANGE rows (state IS DISTINCT FROM its lag -- null-safe,
    so NULL states form runs too), then effective_to = lead(ts) over
    the surviving change rows. Consecutive duplicate states collapse
    into the earlier interval.

    Scale: both windows share one (key, ts, tiebreak) sort -- a single
    exchange; output is bounded by the number of state CHANGES, not
    events. Determinism under equal timestamps requires
    `order_tiebreak` (same contract as sessionize).
    """
    order_cols = [ts_col, *(order_tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = df.withColumn(
        "__chg",
        first_row
        | ~F.col(state_col).eqNullSafe(F.lag(state_col).over(w)),
    ).filter(F.col("__chg"))
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    return changed.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.lead(ts_col).over(w2).isNull().cast("long").alias("is_current"),
    )


def apply_sum_delta(
    state: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for a sum/count rollup: merge a
    DELTA aggregate into the standing state without recomputing
    history -- new_state = state FULL OUTER delta on the grain, sums
    coalesce-added. Sum/count are monoids, so incremental == full
    recompute EXACTLY (the q226 two-strategy oracle grades that
    equality); avg/quantiles must be maintained as (sum, count) /
    sketch state instead (q176), never as finished ratios.

    The nightly-rollup shape at 100 TB: the delta aggregate touches
    only the new partition; the merge shuffles STATE-GRAIN rows (days,
    keys), not events. NULL keys merge with eqNullSafe (a NULL group
    is a legitimate stratum -- the benford scaffold discipline).
    """
    st = state.alias("s")
    dl = delta.alias("d")
    cond = [
        F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in key_cols
    ]
    out_keys = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k)
        for k in key_cols
    ]
    out_sums = [
        (
            F.coalesce(F.col(f"s.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        )
        .cast("long")
        .alias(c)
        for c in sum_cols
    ]
    return st.join(dl, cond, "full_outer").select(*out_keys, *out_sums)


def holt_linear_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    out_level: str = "level",
    out_trend: str = "trend",
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per key:
    ``l_1 = v_1, b_1 = 0``;
    ``l_t = alpha*v_t + (1-alpha)*(l_{t-1} + b_{t-1})``;
    ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``.
    EWMA (ewma_by_key) lags a trending series by construction -- the
    trend state is what lets a forecast extrapolate (h-step-ahead =
    l_T + h*b_T), which is the capacity-planning artifact.

    Same contracts as ewma_by_key: a TRUE recursion (no window frame),
    run as one Arrow batch per key with O(1) state; with alpha/beta
    exact binary fractions and engine-identical inputs every step is
    pure IEEE arithmetic in recursion order, so a recursive-CTE replay
    reproduces the doubles bit-for-bit (the q143 oracle technique --
    the replay must spell the update expressions with the SAME
    association: ``a*v + (1-a)*(l + b)`` and
    ``b*(l_new - l) + (1-b)*b_old``). NULL observations carry state
    unchanged and emit NULL outputs.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
        f"{order_col} {df.schema[order_col].dataType.simpleString()}, "
        f"{value_col} double, {out_level} double, {out_trend} double"
    )
    a, b_ = float(alpha), float(beta)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        lv = None
        tr = 0.0
        levels, trends = [], []
        for v in pdf[value_col]:
            if pd.isna(v):
                levels.append(None)
                trends.append(None)
                continue
            v = float(v)
            if lv is None:
                lv = v
                tr = 0.0
            else:
                new_l = a * v + (1.0 - a) * (lv + tr)
                tr = b_ * (new_l - lv) + (1.0 - b_) * tr
                lv = new_l
            levels.append(lv)
            trends.append(tr)
        pdf[out_level] = levels
        pdf[out_trend] = trends
        return pdf[[key_col, order_col, value_col, out_level, out_trend]]

    return df.groupBy(key_col).applyInPandas(smooth, out_schema)


def forward_fill_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    out_filled: str = "v_filled",
    out_observed: str = "observed",
    out_staleness: str = "staleness_days",
) -> DataFrame:
    """Gap-free daily spine per key with last-observation-carried-forward
    and a staleness age: the series-repair step every forecasting /
    monitoring consumer needs BEFORE a calendar-lag join or a
    day-indexed window can be trusted (fill_period_gaps scaffolds
    missing periods with NULL measures; this operator says what the
    value WAS and how stale it is).

    Per key: a dense date spine from that key's min observed day to its
    max (sequence + explode: no cross join against a global calendar,
    so a key active for a week costs 7 rows no matter how old the
    corpus); left-join the observations back (null-safe on the key --
    a NULL key is a real stratum); then one ordered window carries the
    last non-NULL value forward.  Emits one row per (key, spine day):
      value_col     -- the observation (NULL on filled days),
      out_filled    -- last non-NULL value at-or-before the day,
      out_observed  -- 1 when the day has a non-NULL observation,
      out_staleness -- days since the last observation (0 on observed
                       days; NULL before the first observation, which
                       can only happen when the key's earliest spine
                       days hold NULL observations).

    A present-but-NULL measurement counts as UNOBSERVED (the fill
    carries across it) -- the same contract as the Holt/EWMA recursion
    inputs.  Doubles are COPIED, never recomputed, so the filled lane
    is exactly as engine-stable as its source.

    INPUT CONTRACT (fail-loud, not silent): at most ONE row per
    (key, day), and ``day_col`` is never NULL.  A NULL day cannot be
    placed on a date spine (the span min/max would ignore it and the
    equi-join would never match it -- a silent drop), and a duplicate
    (key, day) would duplicate spine rows downstream of the join.
    Both violations raise (a when/otherwise(raise_error) PROJECTION,
    never where(assert_true) -- the q291/SCALE.md Catalyst-merge
    discipline); pre-aggregate to the (key, day) grain first, as
    q289/q299 do.  A NULL KEY remains a real stratum (null-safe join).

    Scale: the spine is O(sum over keys of span days) -- the series
    summary, never the event corpus; one shuffle on the key carries
    the window (the contract groupBy rides the same key partitioning).
    """
    from pyspark.sql.window import Window

    checked = df.select(
        F.col(key_col).alias("__ok"),
        F.when(F.col(day_col).isNotNull(), F.col(day_col))
        .otherwise(
            F.raise_error(
                F.lit(
                    "forward_fill_daily: NULL day violates the input "
                    "contract (a NULL day cannot be placed on the date "
                    "spine and would be silently dropped) -- filter or "
                    "pre-aggregate upstream"
                )
            )
        )
        .alias("__oday"),
        F.col(value_col).alias("__v"),
    )
    uniq = checked.groupBy("__ok", "__oday").agg(
        F.count(F.lit(1)).alias("__c"), F.first("__v").alias("__v")
    )
    obs = uniq.select(
        "__ok",
        "__oday",
        F.when(F.col("__c") == 1, F.col("__v"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "forward_fill_daily: duplicate (key, day) rows "
                    "violate the one-row-per-(key, day) input contract "
                    "(spine rows would duplicate) -- pre-aggregate to "
                    "the daily grain first"
                )
            )
        )
        .alias("__v"),
    )
    span = obs.groupBy(F.col("__ok").alias(key_col)).agg(
        F.min("__oday").alias("__d0"), F.max("__oday").alias("__d1")
    )
    spine = span.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence("__d0", "__d1")).alias("__day"),
    )
    j = spine.join(
        obs,
        F.col("__k").eqNullSafe(F.col("__ok"))
        & (F.col("__day") == F.col("__oday")),
        "left",
    )
    w = Window.partitionBy("__k").orderBy("__day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return j.select(
        F.col("__k").alias(key_col),
        F.col("__day").alias(day_col),
        F.col("__v").alias(value_col),
        F.last("__v", ignorenulls=True).over(w).alias(out_filled),
        F.col("__v").isNotNull().cast("long").alias(out_observed),
        F.datediff(
            F.col("__day"),
            F.last(
                F.when(F.col("__v").isNotNull(), F.col("__day")),
                ignorenulls=True,
            ).over(w),
        )
        .cast("long")
        .alias(out_staleness),
    )


def lateness_summary(
    hist: DataFrame,
    probs_permille: Sequence[int] = (500, 990),
    threshold_min: int = 60,
) -> DataFrame:
    """Out-of-orderness readout over a (late_min, w) lateness
    HISTOGRAM: exact weighted quantiles (weighted_quantiles_exact, the
    q176 integer ceil-rank rule) + the > threshold exceedance
    permille, one row per requested probability.  Factored out so the
    q316 batch audit and the streaming lateness monitor extract with
    the SAME arithmetic over the same histogram shape (the
    extractor-is-the-batch-operator discipline): per-batch histogram
    partials are a sum monoid, so the merged state reproduces the
    batch readout exactly at any batch split.

    Output columns: p_permille, late_minutes, n_events,
    late_over_{threshold_min}min_permille.
    """
    from .sketches import weighted_quantiles_exact

    h = hist.select(
        F.col("late_min").cast("long").alias("late_min"),
        F.col("w").cast("long").alias("w"),
    ).transform(transient_persist)
    q = weighted_quantiles_exact(h, "late_min", "w", list(probs_permille))
    n = h.agg(
        F.sum("w").cast("long").alias("n_events"),
        F.expr(
            f"CAST(sum(CASE WHEN late_min > {int(threshold_min)} THEN w "
            "ELSE 0 END) * 1000 div sum(w) AS BIGINT)"
        ).alias(f"late_over_{int(threshold_min)}min_permille"),
    )
    return q.crossJoin(F.broadcast(n)).select(
        F.col("p_permille").cast("long").alias("p_permille"),
        F.col("quantile").cast("long").alias("late_minutes"),
        "n_events",
        f"late_over_{int(threshold_min)}min_permille",
    )
