"""Distribution-drift monitoring: PSI contributions of an observed
categorical distribution against a reference.

The batch query twin (q135) compares two event cohorts inline; this
operator generalizes the same math -- add-one-smoothed
``(p - q) * ln(p / q)`` per category, probabilities derived from integer
counts (the q73 log discipline) -- so it composes with the streaming
surface: a watermarked windowed count stream writes per-window category
counts to a sink, and `psi_terms` runs as the batch finisher over that
sink against a broadcast reference distribution. (Two chained stateful
aggregations inside one streaming query is exactly what Structured
Streaming restricts; pre-aggregate in the stream, finish in batch --
the standard monitoring split.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def psi_terms(
    obs: DataFrame,
    ref: DataFrame,
    group_cols: list[str],
    cat_col: str = "event_type",
    n_col: str = "n_events",
    ref_n_col: str = "n_ref",
) -> DataFrame:
    """Per-(group, category) PSI contribution of observed counts vs a
    reference distribution.

    - `obs`: (group_cols..., cat_col, n_col) -- e.g. one row per
      (window_start, event_type) from a streamed windowed count sink.
    - `ref`: (cat_col, ref_n_col) -- the reference (training-time /
      historical) distribution. O(categories): broadcast.

    The reference DEFINES the category space: every group is scaffolded
    to all reference categories (a window that never saw a category
    still drifts on it, n=0), and observed categories absent from the
    reference are ignored -- retrain the reference to widen the space.

    psi_term = (p - q) * ln(p/q) with add-one smoothing:
    p = (n+1)/(tot_group+K), q = (n_ref+1)/(tot_ref+K), K = |categories|.
    All inputs to the float math are integer counts, so both engines (and
    any re-implementation) compute on identical doubles; terms are >= 0
    and truncated at 1e-6 (engine-portable, tie-free). Total PSI per
    group is the sum of its terms (standard alert threshold: 0.1 minor /
    0.25 major shift).

    Scale: one grouped count is assumed already done upstream (obs IS the
    aggregate); everything here joins O(groups x categories) rows against
    a broadcast reference -- dim-sized at any stream rate.
    """
    ref_k = ref.agg(
        F.sum(ref_n_col).cast("long").alias("__tot_ref"),
        F.count(F.lit(1)).alias("__k"),
    )
    scaffold = (
        obs.select(*group_cols)
        .distinct()
        .crossJoin(F.broadcast(ref.select(cat_col, ref_n_col)))
    )
    # scaffold and obs share lineage (scaffold's groups come FROM obs);
    # re-alias the obs side to fresh names so the self-join's attributes
    # can't collide
    keys = [*group_cols, cat_col]
    o = obs.select(
        *[F.col(c).alias(f"__o_{c}") for c in keys],
        F.col(n_col).alias("__o_n"),
    )
    cond = [F.col(c).eqNullSafe(F.col(f"__o_{c}")) for c in keys]
    joined = scaffold.join(o, cond, "left").select(
        *group_cols,
        cat_col,
        ref_n_col,
        F.coalesce(F.col("__o_n"), F.lit(0)).cast("long").alias("__n"),
    )
    tot_g = F.sum("__n").over(Window.partitionBy(*group_cols))
    with_tot = joined.withColumn("__tot_g", tot_g).crossJoin(
        F.broadcast(ref_k)
    )
    p = (F.col("__n") + 1) / (F.col("__tot_g") + F.col("__k")).cast("double")
    q = (F.col(ref_n_col) + 1) / (
        F.col("__tot_ref") + F.col("__k")
    ).cast("double")
    ratio = (
        (F.col("__n") + 1) * (F.col("__tot_ref") + F.col("__k"))
    ) / (
        (F.col(ref_n_col) + 1) * (F.col("__tot_g") + F.col("__k"))
    ).cast("double")
    term = (p - q) * F.log(ratio) + F.lit(0.0)
    return with_tot.select(
        *group_cols,
        cat_col,
        F.col("__n").alias("n_obs"),
        F.col(ref_n_col).cast("long").alias("n_ref"),
        (F.floor(term * 1000000) / 1000000).alias("psi_term_t"),
    )


def drift_alerts(
    terms: DataFrame, group_cols: list[str], threshold: float = 0.1
) -> DataFrame:
    """Fold PSI terms to one row per group: (group..., psi_t, drifted).
    Sums the per-category terms (non-negative; summation order affects
    only sub-1e-6 residue already truncated away) and flags groups whose
    PSI crosses `threshold`."""
    return (
        terms.groupBy(*group_cols)
        .agg(F.round(F.sum("psi_term_t"), 6).alias("psi_t"))
        .withColumn("drifted", F.col("psi_t") >= F.lit(threshold))
    )


def ks_statistic(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the empirical
    distributions of an INTEGER value column (callers pre-scale floats
    to cents/micros -- the repo-wide integer-lane discipline), the
    rank-based complement to `psi_terms`' binned divergence: KS needs no
    binning choice and catches shape shifts PSI's categories smooth over.

    D = max over the union support of |F_left(v) - F_right(v)|, computed
    exactly in integers: with per-value counts c_l, c_r and totals
    n_l, n_r, the sup runs over cross-multiplied cumulative counts
    |cum_l * n_r - cum_r * n_l| so no division happens until the single
    final `ks_e6 = max_diff * 1e6 div (n_l * n_r)` (divide-last keeps
    the lane exact up to ~9e18 / (n_l*n_r) -- fail-loud guarded).

    Output: one row per group -- (group..., n_left, n_right, ks_e6,
    ks_at) where ks_at is the SMALLEST value achieving the sup (ties
    broken low, engine-portable).

    Scale: both inputs first collapse to per-(group, value) counts
    (map-side partial aggregation), so the cumulative sweep runs over
    the DISTINCT-value table, not the raw rows. The sweep window
    partitions by group; for the global (group_cols=None) case it is a
    single-partition sort over |support| rows -- bound the support
    first for unbounded domains (pre-bucket through log_histogram /
    equi-depth boundaries, the sketch-then-compare monitoring split).
    """
    group_cols = list(group_cols or [])
    gv = [*group_cols, value_col]

    def counts(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy(*gv).agg(F.count(F.lit(1)).alias(out))

    both = (
        counts(left, "__cl")
        .join(counts(right, "__cr"), gv, "full")
        .select(
            *group_cols,
            value_col,
            F.coalesce("__cl", F.lit(0)).cast("long").alias("__cl"),
            F.coalesce("__cr", F.lit(0)).cast("long").alias("__cr"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    cum = both.select(
        *group_cols,
        value_col,
        F.sum("__cl").over(w).alias("__al"),
        F.sum("__cr").over(w).alias("__ar"),
    )
    wg = Window.partitionBy(*group_cols)
    tot = cum.select(
        *group_cols,
        value_col,
        "__al",
        "__ar",
        F.max("__al").over(wg).alias("__nl"),
        F.max("__ar").over(wg).alias("__nr"),
    )
    # |cum_l * n_r - cum_r * n_l| stays < n_l * n_r <= 9.2e18 only while
    # n_l * n_r fits BIGINT: fail loud past the lane instead of wrapping.
    guard = F.when(
        (F.col("__nl") > 0)
        & (F.col("__nr") > 0)
        & (F.col("__nr") <= F.expr("9223372036854775807 div __nl")),
        F.abs(F.col("__al") * F.col("__nr") - F.col("__ar") * F.col("__nl")),
    ).otherwise(
        F.raise_error(
            F.lit(
                "ks_statistic: empty side or n_left*n_right exceeds the "
                "BIGINT cross-multiplication lane; pre-bucket the values "
                "(log_histogram / equi-depth) to shrink the support"
            )
        )
    )
    diffed = tot.select(
        *group_cols,
        F.col(value_col).cast("long").alias("__v"),
        guard.alias("__d"),
        "__nl",
        "__nr",
    )
    # argmax with ties broken to the SMALLEST value: max(struct(d, -v)).
    agg = diffed.groupBy(*group_cols).agg(
        F.max("__nl").alias("n_left"),
        F.max("__nr").alias("n_right"),
        F.max(F.struct(F.col("__d"), (-F.col("__v")).alias("__nv"))).alias(
            "__best"
        ),
    )
    return agg.select(
        *group_cols,
        "n_left",
        "n_right",
        F.expr("__best.__d * 1000000 div (n_left * n_right)").alias("ks_e6"),
        (-F.col("__best.__nv")).alias("ks_at"),
    )


def change_point_mean_shift(
    daily: DataFrame, order_col: str, value_col: str
) -> DataFrame:
    """Single change-point locator by binary segmentation: the split of
    an ordered series maximizing the FLOOR-MEAN difference between the
    two sides -- the "when did the level shift" answer CUSUM (q186)
    alarms on but does not localize.

    Integer lane end-to-end: prefix sums/counts via one cumulative
    window over the (bounded, pre-aggregated) series; per-split
    diff_e6 = (Lsum*1e6 div Lcnt) - (Rsum*1e6 div Rcnt) (floor-div
    means -- documented contract; exact-rational argmax would need
    cross-multiplied comparisons that overflow at series scale);
    argmax |diff_e6| with earliest-point tiebreak. Input must be an
    AGGREGATED series (days, hours): the window is a global sort over
    series rows, never events. Requires sum*1e6 within BIGINT
    (series totals below 9.2e12 -- coarsen the unit otherwise).

    Output (one row): split point (last point of the LEFT side),
    left/right floor means (e6), abs diff.
    """
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = daily.agg(
        F.sum(value_col).cast("long").alias("__ts"),
        F.count(F.lit(1)).cast("long").alias("__tn"),
    )
    cum = daily.select(
        F.col(order_col).alias("split_at"),
        F.sum(value_col).over(w).cast("long").alias("__ls"),
        F.count(F.lit(1)).over(w).cast("long").alias("__ln"),
    ).crossJoin(F.broadcast(tot))
    scored = cum.filter(F.col("__ln") < F.col("__tn")).select(
        "split_at",
        F.expr("(__ls * 1000000) div __ln").alias("left_mean_e6"),
        F.expr("((__ts - __ls) * 1000000) div (__tn - __ln)").alias(
            "right_mean_e6"
        ),
    ).withColumn(
        "abs_shift_e6",
        F.abs(F.col("left_mean_e6") - F.col("right_mean_e6")),
    )
    pick = Window.orderBy(F.desc("abs_shift_e6"), F.asc("split_at"))
    return (
        scored.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
