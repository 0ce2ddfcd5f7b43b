"""Analytics kernel (SURVEY §2.5, §2.7): pivot-by-period, aggregations,
top-k, rollup/cube.

The headline rewrite: the reference builds its quarter-pivoted gold matrices
with an O(Q) loop of collect + filter + full-outer-join rounds
(goldLayer/BuildGoldLayer.py:92-139, SURVEY §4.3#1). Here it is a single
groupBy().pivot().agg() -- one shuffle regardless of quarter count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localresult import local_result_frame
from pyspark.sql.window import Window

# Spark caps pivot width (spark.sql.pivotMaxValues = 10000); a quarterly
# pivot hits that after 2500 years, so the bound is documentation, not risk.
PIVOT_MAX_VALUES = 10000


def pivot_by_period(
    df: DataFrame,
    keys: Sequence[str],
    period_col: str,
    measure: Column,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """A4/J3 replacement: wide matrix with one column per period value.

    `values`: pass the explicit period list when known (skips the implicit
    distinct-collect pre-pass -- on 100 TB always pass it; quarter-end dates
    are enumerable). Column names are the period values rendered as strings,
    matching the reference's data-named columns ('2020-03-31',
    goldLayer/BuildGoldLayer.py:106).
    """
    grouped = df.groupBy(*keys)
    pivoted = grouped.pivot(period_col, list(values)) if values else grouped.pivot(period_col)
    return pivoted.agg(measure)


def derive_year_quarter(
    df: DataFrame, date_col: str, year_out: str = "year", quarter_out: str = "quarter"
) -> DataFrame:
    """Gold fact derivations (reference goldLayer/BuildGoldLayer.py:173-176,
    which routes through date_format + a dict replace; F.year/F.quarter are
    the intended semantics -- and fix the reference's bitwise-OR quarter-map
    bug, SURVEY §4.3#5)."""
    d = F.col(date_col)
    return df.withColumns({year_out: F.year(d), quarter_out: F.quarter(d)})


def top_k(df: DataFrame, k: int, order_by: Sequence[Column | str]) -> DataFrame:
    """O2-style global top-k: orderBy + limit compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows -- no global sort shuffle)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int, rank_out: str = "rank"
) -> DataFrame:
    """Per-group top-k via window row_number (one shuffle on the group keys)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_out, F.row_number().over(w))
        .filter(F.col(rank_out) <= k)
    )


def grouped_topk_agg(
    df: DataFrame,
    keys: Sequence[str],
    sort_struct: Column,
    k: int,
    salt_buckets: int = 32,
    out: str = "top",
    salt_extra: Column | None = None,
) -> DataFrame:
    """Per-group top-k WITHOUT a window and WITHOUT an O(group) buffer
    (assuming distinct sort_struct values -- see below): two-stage
    salted hash aggregation. `sort_struct` is a struct column whose
    ASCENDING sort order is the wanted ranking (encode descending keys
    negated, ties by the next field -- the integer-cents discipline);
    returns one row per group with `out` = the k smallest structs,
    sorted.

    Why not row_number(): WindowExec sorts whole partitions of
    (group, row) data and numbers every row. Why not a single
    slice(array_sort(collect_list())): its aggregation buffer holds
    EVERY row of a group before sorting -- one degenerate group (a
    customer with 10^7 distinct parts) is the scale-killer. Here stage
    1 groups by (keys, salt = pmod(xxhash64(sort_struct), B)) and keeps
    a local top-k, so a giant group's rows split across B independent
    buffers (expected size group/B); stage 2 re-aggregates at most B*k
    survivors per group -- a bounded buffer by construction. Top-k is
    salt-decomposable (the global top-k is contained in the union of
    per-bucket top-ks), so ANY salt assignment yields the same result;
    hashing the struct keeps it deterministic. Both stages are hash
    aggregates with map-side partial combine; total cost is two
    shuffles of (keys[, salt]) rows, still cheaper than WindowExec's
    full-partition sort at scale.

    BUFFER-BOUND CAVEAT (copy this form WITH the caveat): salting by
    hash(sort_struct) spreads DISTINCT values evenly, but every copy of
    one repeated value lands in the same bucket -- a group dominated by
    duplicates of a single struct keeps an O(copies) stage-1 buffer.
    Callers here pre-aggregate to distinct structs (q161/q164), which
    restores the bound; when duplicates are possible, pass
    ``salt_extra`` -- any deterministic row-distinguishing column (a
    row id, a source offset) mixed into the salt hash -- and the bound
    holds again because salt-decomposability is true for ANY
    assignment, including ones that split equal values."""
    salt_inputs = [sort_struct] if salt_extra is None else [sort_struct, salt_extra]
    salt = F.pmod(F.xxhash64(*salt_inputs), F.lit(salt_buckets))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(sort_struct)), 1, k).alias(
                "__local"
            )
        )
    )
    return (
        stage1.select(*keys, F.explode("__local").alias("__t"))
        .groupBy(*keys)
        .agg(F.slice(F.array_sort(F.collect_list("__t")), 1, k).alias(out))
    )


def distinct_values(df: DataFrame, col: str, desc: bool = True) -> DataFrame:
    """A2: distinct projection (reference quarter_dates_df,
    goldLayer/BuildGoldLayer.py:77-88)."""
    return df.select(col).distinct().orderBy(F.desc(col) if desc else F.asc(col))


def rollup_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Grouping-sets surface promised by SURVEY §2.5 -- the gold tables'
    downstream Athena analytics (assets/deposits by state/quarter) as
    first-class queries."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def per_group_percent_rank(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_col: str,
    out: str = "pct_rank",
) -> DataFrame:
    """Per-group quantile normalization of a score: percent_rank within
    `group_col` ordered by (score, tiebreak). The cross-corpus calibration
    step for quality gates -- an absolute score cut keeps different
    fractions of every source (length/style bias); ranking within the
    source makes "top X% of EACH source" expressible as one predicate.

    The unique tiebreak makes rank == row_number, so results are exact and
    engine-portable (no tie-group averaging ambiguity). One shuffle on
    `group_col`; each group ranks independently -- no global sort.
    """
    from pyspark.sql.window import Window

    # NULL scores pinned FIRST explicitly: Spark defaults NULLS FIRST on
    # ASC but SQL twins (DuckDB/Postgres) default NULLS LAST -- a NULL
    # score would shift every rank in the group by one between engines
    # (caught by the r4 NULL-field differential sweep).
    w = Window.partitionBy(group_col).orderBy(
        F.asc_nulls_first(score_col), F.asc_nulls_first(tiebreak_col)
    )
    # TRUNCATE at 1e-6 (floor): percent_rank is k/(n-1), an int/int
    # rational that lands on exact decimal .5 ties for 2^a*5^b group
    # sizes -- the tie-free cross-engine discipline (SCALE.md)
    return df.withColumn(
        out, F.floor(F.percent_rank().over(w) * 1000000) / 1000000
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    buckets: int = 64,
) -> DataFrame:
    """2-D skyline (Pareto frontier), both dimensions MINIMIZED: the
    points no other point beats on both axes (<= on both, < on at
    least one). Maximize a dimension by negating it first. Inputs must
    be non-NULL integers (the caller filters/scales -- cents, yyyymmdd,
    negated ranks); duplicates collapse.

    Distributed shape -- the naive NOT-EXISTS self-join is O(n^2) and a
    partition-less window sort moves everything to one task; instead:
    1. range-bucket x into `buckets` integer cells (min/max from one
       O(1)-row aggregate);
    2. per-bucket min(y) -> a `buckets`-row frame, joined back
       broadcast with its EXCLUSIVE running prefix min: any point
       dominated by an earlier bucket (strictly smaller x there) dies
       without ever being compared row-to-row;
    3. survivors reduce to one row per x (min y -- equal x, higher y
       is dominated) and run the classic sweep WITHIN each bucket:
       keep iff y < min(y of all strictly-smaller x), where the
       running min seeds from the bucket-prefix min.
    Every step is a hash aggregate, a broadcast join of a buckets-row
    frame, or a window partitioned BY BUCKET -- no global sort, no
    pairwise join; the frontier comes out exact.
    """
    from pyspark.sql.window import Window

    from pyspark.storagelevel import StorageLevel

    pts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x")
        .agg(F.min("y").alias("y"))
    )
    # pts feeds the eager range aggregate AND the bucketed frame; without
    # a persist the scan+groupBy runs twice (ReuseExchange never fires on
    # an already-collected .first() subtree).
    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    rng = pts.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    ).first()
    if rng["lo"] is None:
        return df.sparkSession.createDataFrame([], "x long, y long")
    lo, hi = int(rng["lo"]), int(rng["hi"])
    span = hi - lo + 1
    # Divide BEFORE multiplying: bucket = (x-lo) div width with width
    # computed driver-side in exact Python ints, so no BIGINT expression
    # ever exceeds span-1 -- ((x-lo)*buckets) would silently wrap once
    # the span passes ~2^57 (epoch-micro-scale domains).  ceil division
    # keeps the bucket count <= `buckets`.  (x-lo) itself fits iff the
    # span does, hence the fail-loud guard instead of a wrap.
    if span - 1 >= (1 << 63):
        raise ValueError(
            f"skyline_2d: x span {span} overflows BIGINT arithmetic; "
            "rescale x (e.g. epoch-micros -> seconds) before calling"
        )
    width = -(-span // buckets)
    b = pts.withColumn("bucket", F.expr(f"(x - {lo}) div {width}"))
    mins = b.groupBy("bucket").agg(F.min("y").alias("bmin"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = mins.select(
        "bucket", F.min("bmin").over(wb).alias("pmin")
    )
    wx = Window.partitionBy("bucket").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # least() skips NULLs (returns NULL only when BOTH sides are), so
    # the first point of the first bucket gets a NULL runmin = "nothing
    # can dominate me yet"
    swept = b.join(F.broadcast(prefix), "bucket").withColumn(
        "runmin", F.least(F.min("y").over(wx), F.col("pmin"))
    )
    return swept.filter(
        F.col("runmin").isNull() | (F.col("y") < F.col("runmin"))
    ).select("x", "y")


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    z_threshold_e3: int = 3500,
) -> DataFrame:
    """Median/MAD robust outlier flags per group: the anomaly screen
    that survives the outliers it hunts (mean/stddev z-scores are
    dragged by the very tail they measure; median and MAD have 50%
    breakdown).

    Integer x2/x4 lanes keep interpolated medians exact: with INTEGER
    values v, med2 = 2 * percentile(v, 0.5) is an exact integer (the
    midpoint interpolation lands on halves; doubling clears it -- no
    float boundary), d2 = |2v - med2|, mad4 = 2 * percentile(d2, 0.5).
    robust z in permille: z_e3 = d2 * 2000 div mad4 (= |v-med|/MAD *
    1000, floor). No 1.4826 consistency constant -- thresholds are in
    MAD units, documented, so the lane stays integer.

    Degenerate mad4 = 0 (a majority-identical group): z_e3 is NULL and
    any d2 > 0 flags as outlier (infinitely many MADs away).

    Output: one row per input row -- (group..., value_col, z_e3,
    outlier) with outlier = z_e3 >= z_threshold_e3 (default 3.5 MADs).

    Scale: two grouped percentile aggregates over the data (map-side
    partial), each joined back on the group key; with no groups the
    medians are a 1-row broadcast. The data never sorts globally --
    percentile is an aggregate, not a window.
    """
    group_cols = list(group_cols or [])

    def back_join(data: DataFrame, aggd: DataFrame) -> DataFrame:
        if group_cols:
            return data.join(F.broadcast(aggd), group_cols)
        return data.crossJoin(F.broadcast(aggd))

    med = (
        df.groupBy(*group_cols)
        if group_cols
        else df.groupBy()
    ).agg(
        (F.lit(2) * F.percentile(value_col, F.lit(0.5)))
        .cast("long")
        .alias("__med2")
    )
    d = back_join(df, med).withColumn(
        "__d2", F.abs(2 * F.col(value_col) - F.col("__med2"))
    )
    mad = (
        d.groupBy(*group_cols) if group_cols else d.groupBy()
    ).agg(
        (F.lit(2) * F.percentile("__d2", F.lit(0.5)))
        .cast("long")
        .alias("__mad4")
    )
    z = F.when(
        F.col("__mad4") > 0, F.expr("__d2 * 2000 div __mad4")
    )
    flagged = back_join(d, mad).select(
        *group_cols,
        value_col,
        z.alias("z_e3"),
        F.when(F.col("__mad4") > 0, z >= F.lit(int(z_threshold_e3)))
        .otherwise(F.col("__d2") > 0)
        .alias("outlier"),
    )
    return flagged


def gini_e6(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini concentration coefficient of NON-NEGATIVE integer values in
    micro-units -- the inequality companion to q144's HHI (HHI squares
    shares; Gini ranks the whole Lorenz curve).

    Closed form over ranked values (rank i = 1..n ascending by value,
    `id_col` as the deterministic tiebreak; equal values contribute the
    same sum over any ordering of their consecutive ranks):

        gini = (2 * sum(i * v_i) - (n + 1) * sum(v)) / (n * sum(v))

    computed integer end-to-end with six ×10 long-division steps
    (g_k = g_{k-1}*10 + (r_{k-1}*10) div den; r_k = (r_{k-1}*10) % den
    -- schoolbook long division one decimal digit at a time, never
    forming num*1e6: the SCALE.md divide-first discipline taken to its
    digit-serial limit). Each step multiplies a remainder < den by 10,
    so the lane needs n * sum(v) <= 9.2e17.

    Gini is SCALE-INVARIANT, so the operator keeps that lane at any
    data size by deterministic unit coarsening: drop the smallest
    power-of-ten `coarse_pow` from the values such that digits(n) +
    digits(total) - coarse_pow <= 17 (digit counts via string length
    -- integer-derived, engine-portable, never forms the overflowing
    product). Ranks are assigned on the ORIGINAL (value, id) order, so
    coarsening perturbs only the summand magnitudes: the relative error
    is < n*c/total <= 1e-16 at the boundary -- below gini_e6's own
    micro resolution. `coarse_pow` is emitted so the precision trade is
    visible, and a residual fail-loud guard pins the invariant.

    Output: one row per group -- (group..., n, total, coarse_pow,
    gini_e6). `total` is the UNcoarsened sum.

    Scale: `df` is expected to be an AGGREGATE already (per-entity
    revenue); entity grain nevertheless GROWS with the corpus, so the
    rank rides distributed_row_number (operators/ranking.py two-level
    range-partition prefix sum, partitioned by group) -- as of r12 no
    step here single-partitions the entity frame (previously the
    global case was the engine's last entity-grain global window).
    Two aggregates (totals, then coarsened rank sums) + a broadcast
    back-join.
    """
    from .ranking import distributed_row_number

    group_cols = list(group_cols or [])
    ranked = distributed_row_number(
        df.select(
            *group_cols,
            F.col(value_col).cast("long").alias("__v"),
            F.col(id_col).alias("__gk"),
        ),
        [("__v", "asc"), ("__gk", "asc")],
        partition_cols=group_cols,
        out_col="__i",
    ).select(
        *group_cols, "__v", F.col("__i").cast("long").alias("__i")
    )
    totals = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").cast("long").alias("total"),
    )
    totals = totals.withColumn(
        "coarse_pow",
        F.greatest(
            F.lit(0),
            F.length(F.col("n").cast("string"))
            + F.length(F.col("total").cast("string"))
            - F.lit(17),
        ).cast("int"),
    ).withColumn(
        # 10^coarse_pow built on the string lane ('1' || k zeros) -- pure
        # integer digits, no float pow, engine-portable
        "__c",
        F.expr("CAST(concat('1', repeat('0', coarse_pow)) AS BIGINT)"),
    )

    def back_join(data: DataFrame, aggd: DataFrame) -> DataFrame:
        if group_cols:
            return data.join(F.broadcast(aggd), group_cols)
        return data.crossJoin(F.broadcast(aggd))

    agg = (
        back_join(ranked, totals)
        .withColumn("__vc", F.expr("__v div __c"))
        .groupBy(*group_cols)
        .agg(
            F.first("n").alias("n"),
            F.first("total").alias("total"),
            F.first("coarse_pow").alias("coarse_pow"),
            F.sum("__vc").cast("long").alias("__tc"),
            F.sum(F.col("__i") * F.col("__vc")).cast("long").alias("__s1"),
        )
    )
    num = F.expr("2 * __s1 - (n + 1) * __tc")
    den = F.expr("n * __tc")
    guarded = agg.withColumn(
        "__num",
        F.when(
            (F.col("__tc") > 0)
            & (F.col("__tc") <= F.expr("9223372036854775807 div n") )
            & ((F.col("n") * F.col("__tc")) <= F.lit(920_000_000_000_000_000)),
            num,
        ).otherwise(
            F.raise_error(
                F.lit(
                    "gini_e6: zero coarsened total or n*sum(v) exceeds "
                    "the long-division lane (9.2e17) despite coarsening; "
                    "value domain violates the non-negative contract or "
                    "n itself overflows the lane"
                )
            )
        ),
    ).withColumn("__den", den)
    # six long-division steps: one decimal digit of gini_e6 per step;
    # materialized as columns (an inline expression would double the
    # remainder subtree per digit)
    stepped = guarded.withColumn("__g", F.lit(0).cast("long")).withColumn(
        "__r", F.col("__num")
    )
    for _ in range(6):
        stepped = stepped.withColumn(
            "__g2", F.expr("__g * 10 + (__r * 10) div __den")
        ).withColumn("__r", F.expr("(__r * 10) % __den"))
        stepped = stepped.drop("__g").withColumnRenamed("__g2", "__g")
    return stepped.select(
        *group_cols,
        "n",
        "total",
        "coarse_pow",
        F.col("__g").alias("gini_e6"),
    )


def theil_sen_slope_e6(
    pts: DataFrame,
    x_col: str,
    y_col: str,
    max_pair_rows: int = 10_000_000,
) -> DataFrame:
    """Theil-Sen robust trend estimator over integer points: the median
    of all pairwise slopes, immune to outlier points that wreck an OLS
    fit. Slopes live in the integer lane -- slope_e6 = (dy * 1e6) div dx
    (Spark `div` and DuckDB `//` both truncate toward zero, verified on
    negative dividends) -- and the median is the LOWER median (rank
    (n+1) div 2), so the whole estimate is exact and engine-portable.

    Intended for AGGREGATED series (x = period index, y = period total):
    pair count is n*(n-1)/2 over POINTS, budget-guarded via
    attach_pair_budget, and the median rank runs as one global sort over
    pair rows -- fine for thousands of points, not for raw event rows
    (aggregate first; a year of days is 365 points at any corpus size).

    Output: one row (n_points, n_pairs, ts_slope_e6). Requires distinct
    x per row and |dy| * 1e6 < 2^63 (document the unit accordingly).
    """
    from .dedup import attach_pair_budget

    n_pts = pts.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    gated = attach_pair_budget(
        pts,
        n_pts,
        "__m",
        max_pair_rows,
        "theil_sen_slope_e6: too many points -- aggregate the series "
        "to a coarser period or raise max_pair_rows",
    )
    a = gated.select(F.col(x_col).alias("__xa"), F.col(y_col).alias("__ya"))
    b = gated.select(F.col(x_col).alias("__xb"), F.col(y_col).alias("__yb"))
    # the right side is O(points) by contract (budget-gated above);
    # broadcast it EXPLICITLY -- without the hint the planner's choice
    # between BroadcastNestedLoopJoin and CartesianProduct swings on
    # size estimates (observed flipping on q287 when stats were stale)
    pairs = (
        a.join(F.broadcast(b), F.col("__xa") < F.col("__xb"))
        .select(
            F.expr("((__yb - __ya) * 1000000) div (__xb - __xa)").alias(
                "slope_e6"
            )
        )
    )
    w = Window.orderBy("slope_e6")
    ranked = pairs.select(
        "slope_e6",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("__n"),
    )
    n_points = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        ranked.filter(F.expr("__rn = (__n + 1) div 2"))
        .select(
            F.col("__n").cast("long").alias("n_pairs"),
            F.col("slope_e6").alias("ts_slope_e6"),
        )
        .crossJoin(F.broadcast(n_points))
        .select("n_points", "n_pairs", "ts_slope_e6")
    )


def dow_residuals(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    anchor: str = "1970-01-05",
) -> DataFrame:
    """Day-of-week seasonal baseline + integer-permille residuals: for
    each day, how far its value sits from the mean of its weekday --
    the deseasonalized anomaly screen for daily operational series.

    dow = datediff(day, anchor Monday) % 7 (0=Mon..6=Sun) -- a pure
    integer lane portable across engines, no locale-dependent dayofweek.
    resid_permille = (v * dow_cnt * 1000) div dow_total - 1000, one
    division at the end (never mean-then-divide twice). Window over the
    dow partition: no join, one exchange over DAILY rows (bounded by
    calendar days regardless of corpus size).

    Requires non-negative dow_total > 0 per weekday and days on/after
    the anchor (callers declare the domain in their filters).
    """
    withdow = daily.select(
        F.col(day_col).alias("day"),
        F.col(value_col).cast("long").alias("v"),
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit(anchor).cast("date")) % 7).cast(
            "long"
        ),
    )
    return withdow.select(
        "day",
        "dow",
        "v",
        F.expr(
            "sum(v) OVER (PARTITION BY dow) div "
            "count(1) OVER (PARTITION BY dow)"
        ).alias("dow_avg"),
        F.expr(
            "(v * count(1) OVER (PARTITION BY dow) * 1000) div "
            "sum(v) OVER (PARTITION BY dow) - 1000"
        ).alias("resid_permille"),
    )


def rfm_segments(
    df: DataFrame,
    key_col: str,
    date_col: str,
    amount_cents_col: str,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation -- the
    classic customer-base cut. Per key: days since last activity
    (relative to the CORPUS max date, so the segmentation is
    reproducible from the data alone), activity count, total cents;
    each scored 1..5 by ntile(5) over a fully deterministic order
    (metric, key) -- quintile 1 = best (most recent / most frequent /
    highest spend).

    ntile bucket sizing (larger buckets first) is identical in Spark
    and DuckDB (verified). The three quintile assignments ride
    distributed_ntile (operators/ranking.py) -- the key grain grows
    linearly with the corpus, so a plain global ntile window would put
    every customer through ONE WindowExec task; the range-bucketed
    two-level form is value-identical (two-strategies-must-agree,
    tests/test_ranking.py) and never single-partitions the frame.

    Output: (key, recency_days, frequency, monetary_cents, r_q, f_q,
    m_q), one row per key.
    """
    from .ranking import distributed_ntile
    per = (
        df.filter(
            F.col(key_col).isNotNull() & F.col(date_col).isNotNull()
        )
        .groupBy(F.col(key_col).alias("k"))
        .agg(
            F.max(date_col).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(amount_cents_col).cast("long").alias("monetary_cents"),
        )
    )
    ref = per.agg(F.max("__last").alias("__ref"))
    scored = per.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.datediff(F.col("__ref"), F.col("__last")).cast("long"),
    )
    scored = distributed_ntile(
        scored, 5, [("recency_days", "asc"), ("k", "asc")], out_col="r_q"
    )
    scored = distributed_ntile(
        scored, 5, [("frequency", "desc"), ("k", "asc")], out_col="f_q"
    )
    scored = distributed_ntile(
        scored, 5, [("monetary_cents", "desc"), ("k", "asc")], out_col="m_q"
    )
    return scored.select(
        F.col("k").alias(key_col),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.col("r_q").cast("long").alias("r_q"),
        F.col("f_q").cast("long").alias("f_q"),
        F.col("m_q").cast("long").alias("m_q"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew profile: the pre-flight check before shuffling on
    a key at scale -- one row with row/key counts, the max and mean
    multiplicity, skew_permille = max/mean in permille (1000 = no
    skew), and the heaviest key itself (min key among ties).

    The mechanics the 100 TB planner acts on: skew_permille >> 1000
    means salt the join (q163) or isolate the hot key; the report is
    one hash aggregate over the data + one global aggregate over KEY
    rows + a TakeOrdered(1) for the hitter -- no sort of the data.

    skew rides the divide-first split a*(span div n) + (a*(span mod n))
    div n with a = max_mult, span = n_keys*1000, n = n_rows: both
    terms stay under 2^63 for any corpus below 9.2e15 keys because
    span div n <= 1000. NULL keys are excluded (they don't shuffle to
    a single partition in a join -- nulls never match).
    """
    mult = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("__k"))
        .agg(F.count(F.lit(1)).cast("long").alias("__m"))
    )
    return skew_report_from_counts(mult)


def skew_report_from_counts(mult: DataFrame) -> DataFrame:
    """The key_skew_report math over a premade (__k, __m) multiplicity
    table -- split out so MERGED count state (the streaming monitor's
    batch=<id> sum-monoid partitions) extracts with the SAME arithmetic
    as the batch operator (the streaming extractor-is-the-batch-
    extractor discipline)."""
    stats = mult.agg(
        F.sum("__m").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__m").cast("long").alias("max_mult"),
    )
    top = (
        mult.orderBy(F.desc("__m"), F.asc("__k"))
        .limit(1)
        .select(F.col("__k").alias("top_key"))
    )
    return (
        stats.crossJoin(F.broadcast(top))
        .select(
            "n_rows",
            "n_keys",
            "max_mult",
            F.expr("n_rows div n_keys").alias("avg_mult"),
            F.expr(
                "max_mult * ((n_keys * 1000) div n_rows) "
                "+ (max_mult * ((n_keys * 1000) % n_rows)) div n_rows"
            ).alias("skew_permille"),
            "top_key",
        )
    )


def spearman_e6(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    max_rows: int = 16_000,
) -> DataFrame:
    """Spearman rank correlation in the EXACT integer lane:
    rho_e6 = 1e6 - (6 * sum(d^2) * 1e6) div (n * (n^2 - 1)), with
    ranks = row_number over (value, id) -- the unique tiebreak makes
    ranks exact and engine-portable. NOTE the contract: tied values
    take tie-broken DISTINCT ranks (not averaged ranks), so this is
    the deterministic-tiebreak Spearman variant; on continuous-ish
    columns the two coincide.

    The monotone-association screen Pearson can't be (no float
    moments, no outlier drag): does doc length track quality, does
    spend track frequency -- answered with zero float exposure.

    Bounds: 6 * sum(d^2) * 1e6 <= 9.2e18 exactly at n = 16000
    (sum(d^2) <= (n^3 - n)/3), so the operator fail-louds above
    `max_rows` -- at larger n, SAMPLE deterministically first (the
    md5-rank lane, q44/q200) and say so; rank windows are global
    sorts, another reason the input is a bounded analytic frame, not
    a raw corpus. n < 2 yields no row (correlation undefined).
    """
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.col(id_col).alias("__i"),
    )
    guard = base.agg(F.count(F.lit(1)).alias("__m"))
    gated = base.crossJoin(F.broadcast(guard)).where(
        F.assert_true(
            F.col("__m") <= F.lit(max_rows),
            F.concat(
                F.lit("spearman_e6: input exceeds max_rows ["),
                F.col("__m").cast("string"),
                F.lit(
                    f" rows, budget {max_rows}] -- the e6 lane "
                    "overflows past 16000 ranks; sample "
                    "deterministically first (md5-rank lane)"
                ),
            ),
        ).isNull()
    ).drop("__m")
    wx = Window.orderBy(F.asc("__x"), F.asc("__i"))
    wy = Window.orderBy(F.asc("__y"), F.asc("__i"))
    ranked = gated.select(
        (F.row_number().over(wx) - F.row_number().over(wy))
        .cast("long")
        .alias("__d")
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("__d") * F.col("__d")).cast("long").alias("sum_d2"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "n",
            "sum_d2",
            F.expr(
                "CAST(1000000 - (6 * sum_d2 * 1000000) "
                "div (n * (n * n - 1)) AS BIGINT)"
            ).alias("rho_e6"),
        )
    )


def lagged_autocorrelation(
    df: DataFrame,
    day_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Calendar-lag autocorrelation of a daily series: for each lag k,
    Pearson corr between (v_t, v_{t+k}) over all days where BOTH
    endpoints exist -- the seasonality probe (lag-7 near 1 = strong
    weekly cycle) that complements q208's dow residuals and q229's
    change point. Long format: (lag, n_pairs, acf) so adding lags
    never changes the schema.

    CALENDAR lag, not row lag: the pair join matches day+k exactly, so
    gap days drop out instead of silently shifting the series (a row
    `lag()` window would pair across gaps). Each lag is one self-join
    + co-moment aggregate over the O(days) DAILY frame -- bounded at
    any corpus size, never a scan of the raw events. corr rides the
    q108 co-moment lane, rounded at 1e-4 (orders of magnitude above
    merge noise).
    """
    base = df.select(
        F.col(day_col).alias("__d"), F.col(value_col).alias("__v")
    ).filter(F.col("__d").isNotNull() & F.col("__v").isNotNull())
    outs = []
    for k in lags:
        a = base.select(F.col("__d").alias("__da"), F.col("__v").alias("__va"))
        b = base.select(F.col("__d").alias("__db"), F.col("__v").alias("__vb"))
        paired = a.join(b, F.date_add(F.col("__da"), k) == F.col("__db"))
        outs.append(
            paired.agg(
                F.lit(k).cast("long").alias("lag"),
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.round(F.corr("__va", "__vb"), 4).alias("acf"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def activity_streaks(
    df: DataFrame,
    key_col: str,
    date_col: str,
) -> DataFrame:
    """Gaps-and-islands: per-key consecutive-day activity streaks from
    an event stream -- (key, longest_streak, n_streaks, n_active_days).
    The classic islands trick, fully deterministic: per key, the
    DISTINCT active days minus their per-key row_number (in days) is
    CONSTANT within a consecutive run and unique across runs, so one
    date_sub + two hash aggregates label every streak without a
    self-join or iteration.

    Scale shape: distinct (key, day) first (map-side combine -- the
    active-day table is bounded by keys x days regardless of event
    volume), one per-key window over DAYS (not events), two
    aggregates. The window partitions by key: no global sort, no
    100 TB bottleneck. NULL keys/dates excluded (no calendar position).
    """
    from pyspark.sql.window import Window

    days = (
        df.filter(F.col(key_col).isNotNull() & F.col(date_col).isNotNull())
        .select(
            F.col(key_col).alias("__k"),
            F.col(date_col).cast("date").alias("__d"),
        )
        .distinct()
    )
    w = Window.partitionBy("__k").orderBy("__d")
    runs = days.withColumn(
        "__island", F.date_sub(F.col("__d"), F.row_number().over(w))
    )
    streaks = runs.groupBy("__k", "__island").agg(
        F.count(F.lit(1)).cast("long").alias("__len")
    )
    return streaks.groupBy("__k").agg(
        F.max("__len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("__len").cast("long").alias("n_active_days"),
    ).select(
        F.col("__k").alias(key_col),
        "longest_streak",
        "n_streaks",
        "n_active_days",
    )


def km_survival_e6(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Kaplan-Meier survival estimator in the EXACT integer-e6 lane:
    input is one row per SUBJECT with ``duration_col`` (integer time
    units) and ``event_col`` (1 = event observed / 0 = right-censored);
    output is one row per distinct duration t with
    (duration, n_risk, n_events, n_censored, survival_e6) where
    S_e6 steps by the floor recursion
    ``S_t = (S_{t-1} * (n_t - d_t)) div n_t`` from S = 1e6 -- every
    operand BIGINT, so any engine replaying the recursion (the q143
    recursive-CTE discipline) reproduces it exactly; no float product
    chain to diverge.

    The churn/retention curve with correct censoring -- subjects still
    alive at observation end leave the risk set without counting as
    deaths, which a naive "fraction churned by day t" silently gets
    wrong.  (Kaplan & Meier 1958; public knowledge.)

    Scale shape: the subject table aggregates to O(distinct durations)
    summary rows (one hash aggregate + one cumulative window over the
    SUMMARY); the inherently sequential product recursion then runs as
    a single-group Arrow batch over those bounded rows -- the q143
    state-machine shape, with the group being the whole (bounded)
    summary rather than a key's series.  NULL durations/events are
    excluded (no calendar position / unknown outcome).

    ``group_cols`` stratifies: one independent curve per group (the
    per-segment churn comparison), each group's recursion folding its
    own summary rows; NULL group values are legitimate strata (the
    benford scaffold discipline -- groupBy keeps them).
    """
    import pandas as pd

    from pyspark.sql.window import Window

    gs = list(group_cols)
    subj = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        *gs,
        F.col(duration_col).cast("long").alias("__t"),
        F.col(event_col).cast("long").alias("__e"),
    )
    agg = subj.groupBy(*gs, "__t").agg(
        F.sum("__e").cast("long").alias("__d"),
        F.sum(1 - F.col("__e")).cast("long").alias("__c"),
    )
    w = (
        Window.partitionBy(*gs) if gs else Window.partitionBy()
    ).orderBy("__t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if gs:
        total = subj.groupBy(*gs).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        # eqNullSafe: a NULL group value is a legitimate stratum and
        # must find its own total (the q226 merge discipline) -- a
        # plain equi-join would orphan it into a NaN risk set
        tot_renamed = total.select(
            *[F.col(c).alias(f"__tg_{c}") for c in gs], "__n"
        )
        cond = [
            F.col(c).eqNullSafe(F.col(f"__tg_{c}")) for c in gs
        ]
        agg = agg.join(tot_renamed, cond, "left").drop(
            *[f"__tg_{c}" for c in gs]
        )
    else:
        total = subj.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        agg = agg.crossJoin(F.broadcast(total))
    risk = (
        agg.withColumn("__cum", F.sum(F.col("__d") + F.col("__c")).over(w))
        .withColumn(
            "__n_risk", F.col("__n") - F.col("__cum") + F.col("__d") + F.col("__c")
        )
        .select(*gs, "__t", "__d", "__c", "__n_risk")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__t").reset_index(drop=True)
        s = 1_000_000
        out = []
        for _, r in pdf.iterrows():
            n, d = int(r["__n_risk"]), int(r["__d"])
            s = (s * (n - d)) // n
            out.append(s)
        pdf["survival_e6"] = out
        return pdf

    gs_schema = "".join(
        f"{c} {subj.schema[c].dataType.simpleString()}, " for c in gs
    )
    if gs:
        folded = risk.groupBy(*gs).applyInPandas(
            fold,
            gs_schema + "__t long, __d long, __c long, __n_risk long, "
            "survival_e6 long",
        )
    else:
        folded = (
            risk.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(
                fold,
                "__g int, __t long, __d long, __c long, __n_risk long, "
                "survival_e6 long",
            )
        )
    return folded.select(
        *gs,
        F.col("__t").alias("duration"),
        F.col("__n_risk").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.col("__c").alias("n_censored"),
        "survival_e6",
    )


def auc_exact_e6(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U with midrank tie handling) in the
    integer-e6 lane, optionally per group: the probability that a
    random positive outranks a random negative, ties counted half.

    Input grain: one row per subject with an integer (or otherwise
    totally ordered, exactly comparable) ``score_col`` and a 0/1
    ``label_col``. NULL score or label rows are excluded (undefined
    rank / undefined class).

    Math, all BIGINT: collapse to per-(group, score) counts
    (n, n_pos); ``below`` = running count of strictly-smaller scores
    (a window over the O(distinct scores) summary, not the subjects);
    the doubled midrank of a tie group is ``2*below + n + 1``, so
    R2 = sum(n_pos * (2*below + n + 1)) is twice the positive rank
    sum and AUC = (R2 - P*(P+1)) / (2*P*N). The e6 scaling rides a
    x1000 two-limb ladder (the divide-first SCALE.md discipline):
    floor(num*1e6/D) = a*1000 + (r*1000) div D with
    a = (num*1000) div D, r = (num*1000) mod D -- exact, and every
    intermediate fits BIGINT while P*N <= 4.6e15 (~68M balanced
    subjects); past that the operator fail-louds (sample
    deterministically first, the md5-rank lane). Degenerate groups
    (P == 0 or N == 0) also fail loud: AUC is undefined there and a
    silent NULL would read as data.

    Scale: one shuffle to the score summary, one window + aggregate
    per group over summary rows. Subjects never sort globally.
    """
    groups = [F.col(c) for c in group_cols]
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *group_cols,
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    g = base.groupBy(*group_cols, "__s").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__np"),
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.asc("__s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = g.select(
        *group_cols,
        "__n",
        "__np",
        (
            F.col("__np")
            * (2 * F.coalesce(F.sum("__n").over(w), F.lit(0)) + F.col("__n") + 1)
        ).alias("__r2"),
    )
    agg = contrib.groupBy(*group_cols).agg(
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
        F.sum("__r2").cast("long").alias("__R2"),
    )
    guarded = agg.where(
        F.assert_true(
            (F.col("n_pos") >= 1)
            & (F.col("n_neg") >= 1)
            & (F.col("n_pos") * F.col("n_neg") <= F.lit(4_600_000_000_000_000))
            # P+N <= 2e9 keeps R2 (<= P*(2*(P+N)+1)) and P*(P+1) in
            # BIGINT even for wildly unbalanced groups
            & (F.col("n_pos") + F.col("n_neg") <= F.lit(2_000_000_000)),
            F.concat(
                F.lit("auc_exact_e6: undefined or over-budget group [P="),
                F.col("n_pos").cast("string"),
                F.lit(", N="),
                F.col("n_neg").cast("string"),
                F.lit(
                    "] -- AUC needs both classes present and "
                    "P*N <= 4.6e15 for the exact e6 ladder; sample "
                    "deterministically first (md5-rank lane)"
                ),
            ),
        ).isNull()
    )
    return guarded.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(((__R2 - n_pos * (n_pos + 1)) * 1000) "
            "div (2 * n_pos * n_neg) * 1000 "
            "+ (((__R2 - n_pos * (n_pos + 1)) * 1000) "
            "% (2 * n_pos * n_neg) * 1000) "
            "div (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_e6"),
    )


def score_decile_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration / cumulative-gains table for a ranking score against
    a 0/1 label: ntile bins over (score DESC, id ASC) -- best scores in
    bin 1 -- with per-bin positive rate, cumulative gain (share of ALL
    positives captured by bins 1..b) and lift vs the base rate, every
    ratio exact integer permille.

    The model-evaluation companion to auc_exact_e6: AUC summarizes the
    whole ranking in one number; this shows WHERE the ranking earns it
    (is the top decile 3x base rate? do gains saturate by bin 4?).

    lift_permille = (np * total) * 1000 div (n * P) rides the x1000
    two-limb ladder; its precondition (every intermediate in BIGINT)
    holds while total <= 4e8 subjects, and the operator fail-louds past
    that (the eval frame is subject-grain -- md5-sample first, q44
    lane). P == 0 also fails loud (gains undefined). NULL score or
    label rows are excluded before binning. The binning rides
    distributed_ntile (operators/ranking.py) -- subject grain grows
    linearly with the corpus, so a plain global ntile window would put
    every subject through ONE WindowExec task; the range-bucketed
    two-level form is value-identical (two-strategies-must-agree,
    tests/test_ranking.py), and Spark and DuckDB ntile split remainders
    identically (pinned by the q212 parity tests).
    """
    from .ranking import distributed_ntile

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
        F.col(id_col).alias("__i"),
    )
    binned = distributed_ntile(
        base, n_bins, [("__s", "desc"), ("__i", "asc")], out_col="bin"
    ).select(F.col("bin").cast("long").alias("bin"), "__y")
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("__y").cast("long").alias("n_pos"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_bin.select(
        "bin",
        "n_subjects",
        "n_pos",
        F.sum("n_subjects").over(wall).alias("__nt"),
        F.sum("n_pos").over(wall).alias("__p"),
        F.sum("n_pos").over(wcum).alias("cum_pos"),
    )
    guarded = tot.where(
        F.assert_true(
            (F.col("__p") >= 1) & (F.col("__nt") <= F.lit(400_000_000)),
            F.concat(
                F.lit("score_decile_calibration: undefined or over-budget "
                      "[P="),
                F.col("__p").cast("string"),
                F.lit(", total="),
                F.col("__nt").cast("string"),
                F.lit(
                    "] -- needs >= 1 positive and total <= 4e8 for the "
                    "exact permille ladder; sample deterministically "
                    "first (md5-rank lane)"
                ),
            ),
        ).isNull()
    )
    return guarded.select(
        "bin",
        "n_subjects",
        "n_pos",
        F.expr("CAST(n_pos * 1000 div n_subjects AS BIGINT)").alias(
            "pos_rate_permille"
        ),
        F.expr("CAST(cum_pos * 1000 div __p AS BIGINT)").alias(
            "cum_gain_permille"
        ),
        F.expr(
            "CAST((n_pos * __nt) div (n_subjects * __p) * 1000 "
            "+ ((n_pos * __nt) % (n_subjects * __p) * 1000) "
            "div (n_subjects * __p) AS BIGINT)"
        ).alias("lift_permille"),
    )


def burstiness_vmr_e6(
    daily: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of integer counts
    per key, exact e6: VMR = (n*Sxx - Sx^2) * 1e6 div ((n-1) * Sx)
    over the per-period count column ``x_col``.  A Poisson-ish steady
    arrival sits near 1e6; VMR >> 1e6 is burst arrival (campaigns,
    incidents, retry storms) -- the dispersion context a level-shift
    detector (CUSUM) does not measure.

    All moments are integer sum-monoids (n, Sx, Sxx), so partials from
    any shard/batch split merge exactly -- this is the extractor for
    the streaming monitor as well as the q286 batch query.  The e6
    division rides the x1000 two-limb ladder (DuckDB HUGEINT-promotes,
    same exact floor).  Fail-loud budget at the FACTOR level, checked
    BEFORE any product is trusted (a silently wrapped BIGINT must
    never vouch for itself): Sx <= 3e9 (Sx^2 fits), Sxx <= maxlong
    div n (n*Sxx fits), (n-1)*Sx <= 9.2e15 (remainder-limb room),
    then the numerator <= 9.2e15.  Keys with < 2 periods or zero
    total are excluded (VMR undefined).

    Ref behavior parity: the reference's monitoring rollups are plain
    grouped count aggregates (goldLayer/BuildGoldLayer.py:92-139's
    per-status counting loop); the dispersion index is the scale-path
    addition on top of that rollup shape.
    """
    keys = list(key_cols)
    agg = (
        daily.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(x_col).cast("long").alias("sx"),
            F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx"),
        )
        .filter((F.col("n") >= 2) & (F.col("sx") > 0))
    )
    guarded = agg.where(
        F.assert_true(
            (F.col("sx") <= F.lit(3_000_000_000))
            & (F.col("sxx") <= F.expr("9223372036854775807 div n"))
            & (
                F.col("sx")
                <= F.expr("9200000000000000 div greatest(n - 1, 1)")
            )
            & (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                <= F.lit(9_200_000_000_000_000)
            ),
            F.lit(
                "burstiness_vmr_e6: dispersion moments exceed the exact "
                "e6 ladder budget [sx <= 3e9, sxx <= maxlong div n, "
                "(n-1)*sx <= 9.2e15, numerator <= 9.2e15] -- shard the "
                "window and combine the (n, Sx, Sxx) sum-monoids"
            ),
        ).isNull()
    )
    return guarded.select(
        *keys,
        F.col("n").alias("n_periods"),
        F.col("sx").alias("n_events"),
        F.expr(
            "CAST((n * sxx - sx * sx) * 1000 div ((n - 1) * sx) * 1000 "
            "+ ((n * sxx - sx * sx) * 1000 % ((n - 1) * sx) * 1000) "
            "div ((n - 1) * sx) AS BIGINT)"
        ).alias("vmr_e6"),
    )


def cross_correlation_e6(
    x: DataFrame,
    y: DataFrame,
    lags: Sequence[int],
    day_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Pearson cross-correlation of two integer daily series at a set
    of CALENDAR lags, e6-floored: for each lag L, pair x(day) with
    y(day + L) by exact date arithmetic (a row-lag slips off phase at
    any gap day -- the lagged_autocorrelation discipline), then
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    over the paired days.  argmax over lags answers "which series
    LEADS" (positive best lag = x leads y by L days) -- the
    cause-hunting measurement an autocorrelation cannot make.

    Exactness lane: all sums are BIGINT sum-monoids with factor-level
    overflow guards (|values| <= 3e9 per series so the squared sums
    fit; n*S products guarded via maxlong div n BEFORE being read).
    The final division is the sanctioned integer-derived-double lane:
    num, d1, d2 are exact integers < 2^63 cast to double, and
    sqrt(d1)*sqrt(d2) is the SAME two exactly-rounded IEEE ops on both
    engines (d1*d2 could overflow BIGINT; the double product cannot),
    so floor(num*1e6 / .) is engine-identical.  Lags with a degenerate
    side (zero variance or < 2 paired days) are excluded.

    Scale: the lag spine is an O(|lags|) broadcast; everything rides
    the O(days) series summaries, never the event corpus.
    """
    spark = x.sparkSession
    lag_df = local_result_frame(
        spark, [(int(lv),) for lv in lags], "lag long"
    )
    xs = x.select(
        F.col(day_col).alias("__dx"), F.col(x_col).cast("long").alias("__x")
    ).crossJoin(F.broadcast(lag_df))
    ys = y.select(
        F.col(day_col).alias("__dy"), F.col(y_col).cast("long").alias("__y")
    )
    paired = xs.join(
        ys, F.col("__dy") == F.date_add(F.col("__dx"), F.col("lag").cast("int"))
    )
    agg = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("sx"),
        F.sum("__y").cast("long").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("syy"),
    ).filter(F.col("n") >= 2)
    guarded = agg.where(
        F.assert_true(
            (F.abs(F.col("sx")) <= F.lit(3_000_000_000))
            & (F.abs(F.col("sy")) <= F.lit(3_000_000_000))
            & (F.col("sxx") <= F.expr("9223372036854775807 div n"))
            & (F.col("syy") <= F.expr("9223372036854775807 div n"))
            & (F.abs(F.col("sxy")) <= F.expr("9223372036854775807 div n")),
            F.lit(
                "cross_correlation_e6: series moments exceed the exact "
                "lane [|Sx|,|Sy| <= 3e9; Sxx,Syy,|Sxy| <= maxlong div n] "
                "-- coarsen the series units first (the gini_e6 "
                "coarsening discipline)"
            ),
        ).isNull()
    )
    return (
        guarded.withColumn("__num", F.expr("n * sxy - sx * sy"))
        .withColumn("__d1", F.expr("n * sxx - sx * sx"))
        .withColumn("__d2", F.expr("n * syy - sy * sy"))
        .filter((F.col("__d1") > 0) & (F.col("__d2") > 0))
        .select(
            "lag",
            F.col("n").alias("n_days"),
            F.expr(
                "CAST(floor(CAST(__num AS DOUBLE) * 1000000.0 / "
                "(sqrt(CAST(__d1 AS DOUBLE)) * sqrt(CAST(__d2 AS DOUBLE)))"
                ") AS BIGINT)"
            ).alias("corr_e6"),
        )
    )
