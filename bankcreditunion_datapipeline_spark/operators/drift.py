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
