"""Mergeable-summary operators for domains too large to count exactly.

The exact sketch rollups (HLL via approx_count_distinct, theta overlap,
day-level bitmap masks) live directly in the query corpus (q66 / q63 /
q114) because Spark ships those as built-ins. This module adds the two
classic summaries Spark lacks as re-aggregatable state: SpaceSaving
heavy hitters (Metwally et al., "Efficient Computation of Frequent and
Top-k Elements in Data Streams", ICDT 2005) for top-k over domains where
exact per-item counting (q29's groupBy) would shuffle more distinct keys
than the cluster can hold, and fixed-width histogram quantiles (q130)
-- percentile_approx cannot re-aggregate from stored state, (bin, count)
rows can.

Scale shape: each partition maintains at most `capacity` counters in one
sequential Arrow-batched pass (no shuffle, no sort); only the per-partition
summaries -- O(partitions x capacity) rows -- shuffle for the merge. The
result carries sound deterministic [lower, upper] bounds per item, and any
item with global true count > total_rows / capacity is guaranteed present
in the merged summary (the SpaceSaving guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localresult import local_result_frame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SUMMARY_SCHEMA = StructType(
    [
        # NULL item = per-partition sentinel carrying that partition's
        # min-counter (pmin), needed for the sound merged upper bound
        StructField("item", StringType()),
        StructField("est", LongType()),   # SpaceSaving counter
        StructField("err", LongType()),   # overestimation bound
        StructField("pmin", LongType()),  # partition's min counter (0 if
                                          # the partition never filled up)
    ]
)


class StreamSummary:
    """Per-partition SpaceSaving state as the Stream-Summary structure
    (Metwally et al. 2005, fig. 1): items grouped into per-count buckets,
    buckets threaded into a count-sorted doubly-linked list. Every
    operation -- hit, insert, evict-min -- is O(1) dict work; the min
    counter is always the head bucket. (A min() scan would be O(capacity)
    per eviction, O(n*capacity) per partition on all-distinct adversarial
    streams -- exactly the workload heavy hitters exist for.)

    Invariants (property-tested in tests/test_properties.py against exact
    recounting): for every tracked item, est - err <= true count <= est;
    min_count over tracked items never exceeds n_offered/len(tracked);
    any item with true count > n/capacity is tracked.

    Module-level (not nested in the UDF) so the eviction machinery is
    drivable without a SparkSession; heavy_hitters' mapInPandas is a thin
    wrapper.
    """

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.count: dict[str, int] = {}   # item -> counter value
        self.err: dict[str, int] = {}     # item -> overestimation bound
        # buckets hold items as insertion-ordered dicts (not sets): the
        # evicted victim is the OLDEST item in the min bucket, so eviction
        # never depends on process-varying string hashing
        self._bucket: dict[int, dict] = {}  # counter -> {item: None, ...}
        self._nxt: dict[int, int] = {}      # count -> next larger count
        self._prv: dict[int, int] = {}      # count -> next smaller count
        self.min_count = 0                  # head of the list (0 = empty)

    def _link_after(self, c: int, new: int) -> None:
        # splice bucket `new` right after bucket `c` in the list
        n = self._nxt.get(c)
        self._nxt[c] = new
        self._prv[new] = c
        if n is not None:
            self._nxt[new] = n
            self._prv[n] = new

    def _unlink(self, c: int) -> None:
        p, n = self._prv.pop(c, None), self._nxt.pop(c, None)
        if p is not None:
            if n is not None:
                self._nxt[p] = n
            else:
                self._nxt.pop(p, None)
        if n is not None:
            if p is not None:
                self._prv[n] = p
            else:
                self._prv.pop(n, None)
        if self.min_count == c:
            self.min_count = n if n is not None else 0
        del self._bucket[c]

    def _move_into(self, v, tgt: int, after: int) -> None:
        if tgt in self._bucket:
            self._bucket[tgt][v] = None
        else:
            self._bucket[tgt] = {v: None}
            self._link_after(after, tgt)
        self.count[v] = tgt

    def offer(self, v) -> None:
        c = self.count.get(v)
        if c is not None:
            b = self._bucket[c]
            b.pop(v, None)
            self._move_into(v, c + 1, c)
            if not b:
                self._unlink(c)
        elif len(self.count) < self.capacity:
            self.count[v] = 1
            self.err[v] = 0
            if 1 in self._bucket:
                self._bucket[1][v] = None
            else:
                self._bucket[1] = {v: None}
                if self.min_count:
                    # 1 is <= every existing count: new head
                    self._nxt[1] = self.min_count
                    self._prv[self.min_count] = 1
                self.min_count = 1
        else:
            mn = self.min_count
            b = self._bucket[mn]
            victim = next(iter(b))
            b.pop(victim)
            del self.count[victim]
            del self.err[victim]
            self._move_into(v, mn + 1, mn)
            if not b:
                self._unlink(mn)
            self.err[v] = mn

    def feed(self, values) -> None:
        for v in values:
            if v is not None:
                self.offer(v)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 1000,
) -> DataFrame:
    """Approximate top-k items of `col` with sound per-item count bounds:
    (item, count_lower, count_upper), ordered by count_upper desc with an
    item tiebreak.

    `capacity` trades memory for accuracy: per partition the summary keeps
    at most `capacity` counters, and any item whose GLOBAL true count
    exceeds total_rows / capacity is guaranteed to appear. Bounds are
    sound in both directions:

    - lower = sum over tracking partitions of (est - err); a partition's
      (est - err) never exceeds the item's true count there, and
      non-tracking partitions contribute >= 0.
    - upper = sum over tracking partitions of est, PLUS each non-tracking
      partition's min counter (an untracked item's count in a partition is
      bounded by that partition's minimum counter; 0 if the partition
      never filled its capacity). That cross-partition term is why the
      summaries carry a per-partition sentinel row.

    Exact counting (q29) beats this whenever the distinct domain fits a
    shuffle -- use heavy_hitters when it does not (URL hosts, raw n-grams,
    user agents at web scale).
    """

    def summarize(batches):
        import pandas as pd

        ss = StreamSummary(capacity)
        for pdf in batches:
            ss.feed(pdf[col].astype(object))
        pmin = ss.min_count if len(ss.count) >= capacity else 0
        rows = [
            {"item": it, "est": int(c), "err": int(ss.err[it]), "pmin": pmin}
            for it, c in ss.count.items()
        ]
        rows.append({"item": None, "est": 0, "err": 0, "pmin": pmin})
        yield pd.DataFrame(rows, columns=["item", "est", "err", "pmin"])

    from pyspark.sql.window import Window

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, _SUMMARY_SCHEMA
    )
    # ONE aggregation consumes the summaries exactly once (no persist, no
    # second scan): the per-partition sentinel rows (NULL item) group into
    # a single NULL-key row whose summed pmin IS the all-partitions total,
    # spread to the item rows by a window over the already-merged table --
    # O(tracked items) rows through the final single-partition window,
    # the same volume the merge itself emits.
    merged = summaries.groupBy("item").agg(
        F.sum("est").alias("__sum_est"),
        F.sum("err").alias("__sum_err"),
        F.sum("pmin").alias("__tracking_pmin"),
    )
    total_pmin = F.sum(
        F.when(F.col("item").isNull(), F.col("__tracking_pmin"))
    ).over(Window.partitionBy())
    return (
        merged.withColumn("__total_pmin", total_pmin)
        .filter(F.col("item").isNotNull())
        .select(
            "item",
            (F.col("__sum_est") - F.col("__sum_err"))
            .cast("long")
            .alias("count_lower"),
            (
                F.col("__sum_est")
                + F.col("__total_pmin")
                - F.col("__tracking_pmin")
            )
            .cast("long")
            .alias("count_upper"),
        )
        .orderBy(F.desc("count_upper"), F.asc("item"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Mergeable quantiles via fixed-width histogram bins -- completes the
# sketch-rollup family (distinct counts: HLL/theta/bitmap q66/q63/q114;
# frequencies: SpaceSaving above; quantiles: this). percentile_approx
# cannot re-aggregate from stored state; (bin, count) rows CAN: counts are
# a monoid, so per-partition/per-day bin tables merge losslessly (the q67
# rollup argument) and a 100 TB quantile is answered from the ~O(range/
# width) merged bins, never the raw rows. Estimation error is bounded by
# the bin width; the estimator is deterministic arithmetic over integer
# counts, so a SQL oracle can check it exactly.
# ---------------------------------------------------------------------------


def bin_counts(df: DataFrame, col: str, width: float, *group_cols: str) -> DataFrame:
    """Level-0 histogram: (group..., bin, n) with bin = floor(col/width).
    One hash aggregate; NULLs drop (no bin). Output is the mergeable
    summary -- coarser grains re-aggregate these rows, not raw data."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*group_cols, F.floor(F.col(col) / F.lit(width)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def binned_quantiles(
    bins: DataFrame, width: float, probs: list[float]
) -> DataFrame:
    """Quantile estimates from a merged (bin, n) histogram: for each prob
    p, find the first bin whose cumulative count reaches p * total and
    interpolate linearly inside it:

        est = (bin + (p*total - cum_before) / n_bin) * width

    True quantile lies within one bin width of the estimate. All
    arithmetic is deterministic over exact integer counts (the only
    floats are the final interpolation), so the same expression in SQL
    reproduces the result bit-for-bit -- the correctness gate for q130.
    The cumulative window runs over O(distinct bins) rows -- the merged
    summary, not the data."""
    from pyspark.sql.window import Window

    spark = bins.sparkSession
    cum = (
        bins.groupBy("bin")
        .agg(F.sum("n").alias("n"))
        .withColumn("cum", F.sum("n").over(Window.orderBy("bin")))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    p = F.broadcast(
        local_result_frame(
            spark, [(float(x),) for x in probs], "prob double"
        )
    )
    hit = p.join(cum, cum["cum"] >= p["prob"] * cum["total"])
    first = (
        hit.groupBy("prob")
        .agg(F.min(F.struct("bin", "n", "cum", "total")).alias("s"))
        .select(
            "prob",
            (
                (
                    F.col("s.bin")
                    + (F.col("prob") * F.col("s.total") - (F.col("s.cum") - F.col("s.n")))
                    / F.col("s.n")
                )
                * F.lit(width)
            ).alias("__est"),
        )
    )
    return first.select(
        "prob", (F.floor(F.col("__est") * 10000) / 10000).alias("quantile_est")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) on the portable md5
# lane: frequency estimation over unbounded key domains in O(depth *
# width) state. Counters are plain sums, so sketches merge element-wise
# (the monoid property every rollup here shares), and with the hash
# rows on functions/hashing.md5lane the ENTIRE sketch -- bucket
# assignment, counters, min-probe -- replays exactly in SQL (q150's
# oracle); xxhash64 has no such twin.
# ---------------------------------------------------------------------------


def count_min_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Sparse Count-Min counter table (row, bucket, cnt) over key
    occurrences. bucket_i(k) = md5lane("i:" || k) % width. One explode
    to depth rows per occurrence + one hash aggregate; absent buckets
    are implicit zeros (the probe side coalesces). State is O(depth *
    width) no matter the key cardinality -- the point of the sketch."""
    from ..functions.hashing import md5lane

    rows = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k")
    )
    return (
        rows.select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"), "__k"
        )
        .select(
            "row",
            (
                md5lane(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("__k")))
                % width
            ).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    table: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    out: str = "est_n",
) -> DataFrame:
    """Point estimates for `keys`: min over the depth counters each key
    hashes to. Never underestimates (every counter the key touches
    contains at least its true count); overestimates only on bucket
    collisions, P <= (e/width)^depth per the CM bound. The probe is a
    broadcast-sized join against the O(depth*width) table."""
    from ..functions.hashing import md5lane

    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn(
        "bucket",
        md5lane(
            F.concat(F.col("row").cast("string"), F.lit(":"), F.col(key_col).cast("string"))
        )
        % width,
    )
    return (
        probes.join(F.broadcast(table), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) on the portable md5 lane: set membership
# over unbounded key domains in O(m_bits) state. The bitmap is stored
# as (word, bits) rows -- 60 bits per BIGINT word, never touching bit
# 63 (DuckDB range-errors on 1<<63 where Java wraps; 60 keeps every
# shift portable) -- and merges by per-word bit_or, the same rollup
# monoid as every sketch in this module. False negatives are
# impossible (every member set all k of its bits); false positives at
# rate ~(1 - e^(-k*n/m))^k. The whole filter -- bit positions, bitmap
# words, probe conjunction -- replays exactly in SQL (q165's oracle).
#
# 100 TB posture: the build is one explode(k) + hash aggregate over
# <= m_bits/60 word rows; the probe broadcasts the O(m_bits) bitmap to
# the probe side (a semi-join prefilter that costs no shuffle of the
# big table). Reference parity: Spark's own BloomFilterAggregate is
# JVM-private and not oracle-replayable; this one is.
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 60


def _bloom_positions(key, m_bits: int, k: int):
    """k md5-lane bit positions for a (string-cast) key -- the i-th
    family member hashes "i:<key>" exactly like count_min_table."""
    from ..functions.hashing import md5lane

    return [
        md5lane(F.concat(F.lit(f"{i}:"), key.cast("string"))) % m_bits
        for i in range(k)
    ]


def bloom_bitmap(
    df: DataFrame, key_col: str, m_bits: int = 16384, k: int = 4
) -> DataFrame:
    """Build the (word, bits) bitmap over df's non-NULL keys. NULL keys
    set no bits (NULL is not a member; probing NULL is the caller's
    contract to avoid). Words absent from the output are all-zero."""
    keys = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k")
    )
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col("__k"), m_bits, k))).alias(
            "pos"
        )
    )
    return (
        pos.select(
            F.expr(f"pos div {_BLOOM_WORD_BITS}").alias("word"),
            (F.col("pos") % _BLOOM_WORD_BITS).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias("bits"))
    )


def bloom_might_contain(
    keys: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = 16384,
    k: int = 4,
    out: str = "bloom_hit",
) -> DataFrame:
    """Membership probe: distinct non-NULL keys -> (key, out) with out=1
    iff all k bits are set (maybe-member) and 0 otherwise (definitely
    absent). The bitmap (<= m_bits/60 rows) is broadcast; a missing
    word row means those bits are zero."""
    probe = (
        keys.filter(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
        .select(
            F.col(key_col),
            F.explode(
                F.array(*_bloom_positions(F.col(key_col), m_bits, k))
            ).alias("pos"),
        )
        .select(
            key_col,
            F.expr(f"pos div {_BLOOM_WORD_BITS}").alias("word"),
            (F.col("pos") % _BLOOM_WORD_BITS).alias("bit"),
        )
    )
    j = probe.join(F.broadcast(bitmap), ["word"], "left")
    is_set = (
        F.coalesce(F.col("bits"), F.lit(0))
        .bitwiseAND(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        != 0
    ).cast("int")
    return (
        j.groupBy(key_col)
        .agg(F.min(is_set).cast("int").alias(out))
    )


# ---------------------------------------------------------------------------
# Adaptive-range mergeable quantiles (r6 VERDICT #6): binned_quantiles
# needs a-priori fixed-width bins, which at unknown/streaming ranges
# means a two-pass or a guess. This is a DDSketch-style relative-error
# quantile sketch (Masson, Rim & Lee, VLDB 2019) rebuilt on PURE
# INTEGER arithmetic: bucket = log2 octave x `sub` linear sub-buckets.
# The bucket family is UNIVERSAL (no range pass, no data-dependent
# edges), so histograms from any partition/batch/day merge by summing
# counts -- the same monoid as HLL/theta/CM/Bloom -- and every step
# (octave via binary-string length, sub-bucket via floor div, rank via
# integer permille ceil-div, interpolation via floor div) replays
# exactly in SQL with no ln() anywhere: the boundary-flip risk class of
# float log bucketing never arises.
#
# Guarantee: bucket (e, s) covers [2^e + s*w, 2^e + (s+1)*w) with
# w = ceil(2^e/sub), so width <= x/sub + 1 for any x in the bucket:
# the estimate is within relative error 1/sub (+1 absolute) of the
# true rank statistic. 100 TB posture: state is O(60 * sub) rows max
# regardless of cardinality; build is one hash aggregate; quantile
# extraction runs over the summary, never the data.
# ---------------------------------------------------------------------------

_LOG_HIST_MAX_E = 59  # the portable-shift contract (SCALE.md): never shift past 59


def _log_bucket_expr(v: str, sub: int) -> str:
    """SQL for the integer bucket id of non-negative integer column `v`:
    -1 for 0, else e*sub + (v - 2^e) div ceil(2^e/sub) with
    e = floor(log2 v) from the binary-string length (conv -- pure
    integer lane, no ln). An expression string because shiftleft's
    PySpark wrapper only takes a literal shift amount."""
    e = f"(length(conv(CAST({v} AS STRING), 10, 2)) - 1)"
    p2 = f"shiftleft(CAST(1 AS BIGINT), CAST({e} AS INT))"
    w = f"(({p2} + {sub} - 1) div {sub})"
    return (
        f"CASE WHEN {v} = 0 THEN CAST(-1 AS BIGINT) "
        f"ELSE CAST({e} AS BIGINT) * {sub} + ({v} - {p2}) div {w} END"
    )


def log_histogram(
    df: DataFrame, col: str, group_cols: tuple = (), sub: int = 16
) -> DataFrame:
    """Mergeable log-bucket histogram (group..., lbin, n) over a
    NON-NEGATIVE integer column; NULLs drop. Bucket edges are universal
    (data-independent), so any two histograms with the same `sub` merge
    by summing n -- across partitions, batches, or time grains. Values
    must stay below 2^60 (the portable-shift contract); the build
    asserts it fail-loud per row."""
    x = F.col(col)
    # fail-loud on BOTH ends (ADVICE r7): negatives have no log bucket
    # -- Spark conv() reads them as unsigned 64-bit (e=63) and silently
    # diverges from DuckDB bin() -- and >= 2^60 breaks the portable
    # shift contract.
    guarded = F.when(
        (x >= 0) & (x < F.lit(1 << (_LOG_HIST_MAX_E + 1))),
        x,
    ).otherwise(
        F.raise_error(
            F.lit(
                "log_histogram: value outside the non-negative "
                f"sub-2^{_LOG_HIST_MAX_E + 1} bucket lane (negatives have no "
                "log bucket; larger overflows the portable shift); filter or "
                "rescale the column (e.g. micros -> seconds) before sketching"
            )
        )
    )
    return (
        df.filter(x.isNotNull())
        .select(*group_cols, guarded.alias("__v"))
        .select(
            *group_cols, F.expr(_log_bucket_expr("__v", sub)).alias("lbin")
        )
        .groupBy(*group_cols, "lbin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def log_histogram_quantiles(
    hist: DataFrame,
    probs_permille: list[int],
    sub: int = 16,
    group_cols: tuple = (),
) -> DataFrame:
    """Quantile estimates from a merged (group..., lbin, n) log
    histogram: (group..., p_permille, quantile_est). rank =
    ceil(p * total / 1000) computed as (p*total + 999) div 1000 --
    INTEGER, so the target row is engine-exact; the estimate
    interpolates inside the hit bucket with floor div in the exact
    divide-first decomposition a*(span div n) + (a*(span mod n)) div n
    (identical to (a*span) div n but never forms the a*span product,
    which overflows BIGINT for a heavy top-octave bucket). All
    arithmetic is integer end-to-end -- `div`, never `/` + floor, so
    the lane cannot pick up double rounding past 2^53 (ADVICE r7);
    exact until p*total overflows BIGINT at ~9.2e15 rows per group.

    `group_cols` names the histogram's group columns (as built by
    `log_histogram(..., group_cols=...)`); extraction then partitions
    the cum/total windows per group and emits one quantile set per
    group. A histogram carrying columns NOT named here raises --
    silently collapsing groups into one global quantile set is the
    footgun this guard exists for. Runs over O(buckets x groups)
    summary rows (windows on the summary, the documented safe
    pattern)."""
    from pyspark.sql.window import Window

    gc = list(group_cols)
    extra = set(hist.columns) - set(gc) - {"lbin", "n"}
    if extra:
        raise ValueError(
            "log_histogram_quantiles: histogram carries group columns "
            f"{sorted(extra)} not named in group_cols; extraction would "
            "silently collapse them into one global quantile set -- pass "
            "group_cols=(...) matching the log_histogram build"
        )
    spark = hist.sparkSession
    cum = (
        hist.groupBy(*gc, "lbin")
        .agg(F.sum("n").alias("n"))
        .withColumn(
            "cum", F.sum("n").over(Window.partitionBy(*gc).orderBy("lbin"))
        )
        .withColumn("total", F.sum("n").over(Window.partitionBy(*gc)))
    )
    # decode bucket -> [lb, ub) span in integers (expression strings:
    # shiftleft's PySpark wrapper only takes a literal shift amount)
    p2 = f"shiftleft(CAST(1 AS BIGINT), CAST(lbin div {sub} AS INT))"
    w = f"(({p2} + {sub} - 1) div {sub})"
    lb = (
        f"CASE WHEN lbin < 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {p2} + (lbin % {sub}) * {w} END"
    )
    ub = (
        f"CASE WHEN lbin < 0 THEN CAST(1 AS BIGINT) "
        f"ELSE least({p2} + (lbin % {sub} + 1) * {w}, 2 * {p2}) END"
    )
    dec = cum.select(
        *gc,
        "lbin",
        "n",
        "cum",
        "total",
        F.expr(lb).alias("lb"),
        (F.expr(ub) - F.expr(lb)).alias("span"),
    )
    p = F.broadcast(
        local_result_frame(
            spark, [(int(x),) for x in probs_permille], "p_permille long"
        )
    )
    # integer ceil-div rank; the probe stays a broadcast theta join over
    # the O(60 * sub * groups) summary rows (safe by construction)
    hit = p.join(dec, F.expr("cum >= (p_permille * total + 999) div 1000"))
    # interpolation offset a = rank - rows-before-bucket, then the exact
    # divide-first split of (a * span) div n
    a = "((p_permille * s.total + 999) div 1000 - (s.cum - s.n))"
    return (
        hit.groupBy(*gc, "p_permille")
        .agg(
            F.min(F.struct("lbin", "n", "cum", "lb", "span", "total")).alias(
                "s"
            )
        )
        .select(
            *gc,
            "p_permille",
            (
                F.col("s.lb")
                + F.expr(f"{a} * (s.span div s.n)")
                + F.expr(f"({a} * (s.span % s.n)) div s.n")
            ).cast("long").alias("quantile_est"),
        )
    )


def histogram_intersection_permille(
    hist: DataFrame,
    group_col: str,
    bin_col: str = "lbin",
    n_col: str = "n",
) -> DataFrame:
    """Pairwise similarity between groups' NORMALIZED histograms:
    sim(a, b) = sum over bins of min(share_a, share_b), with shares in
    integer permille (floor div) -- the histogram-intersection kernel,
    the cheap mergeable-sketch answer to "which sources look alike"
    that PSI (q135) and KS (q192) don't give (those are two-sample
    DISTANCES against a reference; this is an all-pairs similarity
    matrix).

    Shares are n*1000 div group_total (floor), so sims are exact
    integers, engine-portable, and bounded by 1000; a bin missing on
    one side contributes min(x, 0) = 0, so the pair join is INNER.
    Because the input is a mergeable histogram (q176 contract:
    data-independent edges, sum-monoid), the all-pairs join runs over
    O(bins * groups) SUMMARY rows -- never the data.

    Output: (group_a, group_b, sim_permille), group_a < group_b.
    """
    pm = hist.select(
        F.col(group_col).alias("__g"),
        F.col(bin_col).alias("__b"),
        F.expr(
            f"{n_col} * 1000 div sum({n_col}) "
            f"OVER (PARTITION BY {group_col})"
        ).alias("__pm"),
    )
    a = pm.select(
        F.col("__g").alias("group_a"),
        F.col("__b").alias("__ba"),
        F.col("__pm").alias("__pa"),
    )
    b = pm.select(
        F.col("__g").alias("group_b"),
        F.col("__b").alias("__bb"),
        F.col("__pm").alias("__pb"),
    )
    return (
        a.join(
            b,
            (F.col("__ba") == F.col("__bb"))
            & (F.col("group_a") < F.col("group_b")),
        )
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(F.least("__pa", "__pb")).cast("long").alias(
                "sim_permille"
            )
        )
    )


def weighted_quantiles_exact(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs_permille: list[int],
    group_cols: tuple = (),
) -> DataFrame:
    """EXACT weighted quantiles per group, all-integer: the p-quantile
    is the smallest value whose cumulative WEIGHT reaches
    ceil(p * W / 1000) (the q176 integer ceil-rank rule, in weight
    units).  The unweighted median treats a 1-unit and a 10k-unit row
    alike; weighted corpora (sampling weights, quantities, token
    masses) need the weight-mass quantile -- and the log-histogram
    sketch (q176) answers it only approximately.

    Contract: ``value_col`` and ``weight_col`` must already be INTEGER
    lanes (cents, counts -- cast upstream, the house discipline);
    non-positive or NULL weights and NULL values are excluded.  Exact
    until p * W overflows BIGINT (~9.2e15 weight units per group).

    Scale: one (group, value) hash aggregate collapses duplicates
    (map-side combine), then cum/total windows run over the O(distinct
    values x groups) summary -- the q176 extraction shape, not a
    global row sort.
    """
    from pyspark.sql.window import Window

    gc = list(group_cols)
    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    ).select(
        *gc,
        F.col(value_col).cast("long").alias("__v"),
        F.col(weight_col).cast("long").alias("__w"),
    )
    dv = base.groupBy(*gc, "__v").agg(F.sum("__w").alias("__w"))
    cum = dv.select(
        *gc,
        "__v",
        F.sum("__w")
        .over(Window.partitionBy(*[F.col(c) for c in gc]).orderBy("__v"))
        .alias("__cum"),
        F.sum("__w")
        .over(Window.partitionBy(*[F.col(c) for c in gc]))
        .alias("__total"),
    )
    p = F.broadcast(
        local_result_frame(
            df.sparkSession,
            [(int(x),) for x in probs_permille],
            "p_permille long",
        )
    )
    hit = p.join(
        cum, F.expr("__cum >= (p_permille * __total + 999) div 1000")
    )
    return (
        hit.groupBy(*gc, "p_permille")
        .agg(F.min("__v").cast("long").alias("quantile"))
    )
