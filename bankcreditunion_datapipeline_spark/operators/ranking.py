"""Distributed global rank / ntile -- the scale-safe replacement for
single-partition ``Window.orderBy(...)`` rank windows.

A ``row_number().over(Window.orderBy(...))`` with no partitionBy moves
EVERY row through ONE WindowExec task (Spark warns exactly this).  Over
a bounded summary that is survivable; over an entity-grain frame
(customers, users, distinct doc ids) it is the one systematic
scale-killer, because entity grain grows linearly with the corpus.

This module factors the repo's settled two-level decomposition
(q133's md5-bucket prefix sum, operators/sampling.py:pack_sequences)
into a general ORDER BY form:

1. ``repartitionByRange`` on (partition cols ASC, then the order spec):
   Spark's RangePartitioner assigns ascending key ranges to ascending
   physical partition ids, so partition-id-major order IS the global
   order (the same prefix property q133 gets from the md5 hex prefix).
2. per-(partition-id, partition-key) row counts -- an O(buckets x
   partition keys) aggregate -- get exclusive prefix offsets via a
   window over that tiny summary, broadcast back.
3. the per-row rank is a window partitioned by (partition id,
   partition key) -- buckets-way parallel -- plus the broadcast offset.

No row ever passes through a single-partition window; both shuffles
move only the input frame (which for every caller here is already a
summary, never the raw corpus).  AQE may coalesce adjacent range
partitions; adjacent merges preserve id-major order, and offsets are
computed from the OBSERVED post-coalesce ids, so the rank is exact
either way.  Range boundaries themselves never affect the result --
only the id-major-order property does -- so the output is independent
of partition layout (graded by the shuffle=3 layout sweep).

CONTRACTS (the window form shares all three):
- the order spec must be a TOTAL order (append a unique id tiebreak,
  the q212 ``(cents DESC, k ASC)`` determinism lane) -- with ties the
  split across equal rows is boundary-dependent, exactly as a plain
  ntile's tie split is partition-arrival-dependent;
- order columns should be non-NULL (or the caller pins NULL placement
  upstream): Spark's window and range partitioner agree on NULL
  ordering, but the DuckDB oracle's NULLS LAST default does not;
- partition keys may be NULL (a real stratum -- the offset join is
  null-safe).

ntile semantics replay Spark/DuckDB ``ntile(n)`` EXACTLY (the first
``N mod n`` buckets take ``N div n + 1`` rows, the rest ``N div n`` --
the q212-pinned cross-engine parity), via the closed form over the
global rank, so callers can swap strategies without a value change:
two-strategies-must-agree tests pin this in tests/test_ranking.py and
the oracle checker grades the rewired q212/q223/q246/q308 against
their unchanged window-form SQL.

Reference parity note: the reference has no rank surface at all (its
rollups are plain grouped counts, goldLayer/BuildGoldLayer.py:92-139);
this operator exists for the engine's own entity-grain analytics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OrderSpec = Sequence[Tuple[str, str]]

# Runtime call log (r13 ratchet, VERDICT r12 #3): every public
# distributed-rank operator records its name here at DataFrame-BUILD
# time.  tools/plan_audit.py clears the set before constructing each
# registered query and cross-checks it against the query's doc: a doc
# (or bounded-window ledger note) that claims a distributed_* rewire
# which never actually fired is a HARD audit failure -- q228 (r12)
# proved a stated bound can be false while a presence-only ratchet
# passes.  queries.py's _cached_lane replays a lane's recorded ops on
# cache hits so shared-lane consumers attribute correctly.
CALLS: set = set()


def _sort_exprs(order: OrderSpec) -> list:
    out = []
    for col, direction in order:
        d = direction.lower()
        if d not in ("asc", "desc"):
            raise ValueError(
                f"distributed rank: direction must be asc|desc, got "
                f"{direction!r} for column {col!r}"
            )
        out.append(F.col(col).asc() if d == "asc" else F.col(col).desc())
    return out


def _with_global_rank(
    df: DataFrame,
    order: OrderSpec,
    partition_cols: Sequence[str],
    buckets: Optional[int],
    value_col: Optional[str] = None,
    stabilize_input: bool = True,
) -> DataFrame:
    """df + ``__rn`` (1-based global rank per partition key, ordered by
    the order spec) + ``__n`` (total rows per partition key); with
    ``value_col`` also ``__cum`` (inclusive prefix sum of the value in
    rank order) + ``__tot`` (per-partition-key value total).  Values
    ride as BIGINT sum-monoids (exact bucket-offset merge; a double
    prefix would drift with the bucketing) and must be non-NULL
    (fail-loud -- a window sum would yield NULL for an all-NULL prefix
    where +0 would not, so the operator refuses to pick silently).
    Internal: callers are distributed_row_number / distributed_ntile /
    distributed_cumsum."""
    if not order:
        raise ValueError("distributed rank: empty order spec")
    reserved = {
        "__pid", "__opid", "__off", "__rn", "__n", "__cum", "__tot",
        "__voff", "__val", "__vsum", "__cnt",
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"distributed rank: input columns {sorted(clash)} collide "
            "with the operator's internal names -- rename them upstream "
            "(a silent drop would corrupt caller data)"
        )
    parts = list(partition_cols)
    # repartitionByRange runs a SEPARATE range-boundary sampling job
    # over its input before the shuffle -- the input DAG is computed
    # twice, and CHAINED rank calls (rfm's three quintiles) compound
    # that into 2^depth recomputes.  The frame-referenced-twice
    # discipline applies: a lazy localCheckpoint materializes the
    # input once and truncates lineage.  Callers whose input is a
    # plain column-pruned scan (q64's raw orders) pass
    # stabilize_input=False -- re-scanning parquet twice is cheaper
    # than storing the fact projection in block storage.
    base = df.localCheckpoint(eager=False) if stabilize_input else df
    exprs = [F.col(c).asc() for c in parts] + _sort_exprs(order)
    rp = (
        base.repartitionByRange(int(buckets), *exprs)
        if buckets
        else base.repartitionByRange(*exprs)
    )
    # __pid is only meaningful if the offsets job and every later
    # consumer see the IDENTICAL partition layout.  Without pinning,
    # the range exchange re-executes per job and AQE may pick a
    # DIFFERENT coalesced layout for the offsets aggregate than for a
    # downstream cache/join evaluation -- measured at sf0.1 (r12): a
    # persisted q317 variant silently dropped 1125 of 2000 rows
    # because __pid values moved between the two evaluations and the
    # offsets equi-join discarded the mismatches.  localCheckpoint
    # materializes the shuffled partitions once; both the offsets job
    # and the final join then read the same pinned RDD.
    staged = rp.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("__cnt")]
    if value_col is not None:
        staged = staged.withColumn(
            "__val",
            F.when(
                F.col(value_col).isNotNull(),
                F.col(value_col).cast("long"),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "distributed_cumsum: NULL value violates the "
                        "non-NULL integer value contract (an exact "
                        "prefix sum cannot pick between +0 and NULL "
                        "propagation silently) -- coalesce or filter "
                        "upstream"
                    )
                )
            ),
        )
        aggs.append(F.sum("__val").cast("long").alias("__vsum"))
    counts = staged.groupBy("__pid", *parts).agg(*aggs)
    woff = (
        Window.partitionBy(*parts).orderBy("__pid")
        if parts
        else Window.orderBy("__pid")
    ).rowsBetween(Window.unboundedPreceding, -1)
    wtot = (
        Window.partitionBy(*parts)
        if parts
        else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    off_cols = [
        F.col("__pid").alias("__opid"),
        *[F.col(c).alias(f"__op_{c}") for c in parts],
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(wtot).cast("long").alias("__n"),
    ]
    if value_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__vsum").over(woff), F.lit(0))
            .cast("long")
            .alias("__voff")
        )
        off_cols.append(
            F.sum("__vsum").over(wtot).cast("long").alias("__tot")
        )
    offsets = counts.select(*off_cols)
    # the offsets window is O(buckets x partition keys) rows -- the
    # only single-partition-ish step, over the tiny aggregate (q133's
    # step 2); the join back is a broadcast of that same tiny frame.
    cond = F.col("__pid") == F.col("__opid")
    for c in parts:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__op_{c}"))
    wloc = Window.partitionBy("__pid", *parts).orderBy(*_sort_exprs(order))
    # LEFT join + fail-loud: after the checkpoint a missing offsets row
    # should be impossible, but a silent inner-join row drop is the one
    # failure mode this operator must never have -- raise instead.
    out = (
        staged.join(F.broadcast(offsets), cond, "left")
        .withColumn(
            "__off",
            F.when(F.col("__opid").isNotNull(), F.col("__off")).otherwise(
                F.raise_error(
                    F.lit(
                        "distributed rank: offsets row missing for a "
                        "staged partition -- the range-exchange layout "
                        "moved between the offsets job and this "
                        "evaluation (checkpoint pin violated)"
                    )
                )
            ),
        )
        .withColumn(
            "__rn",
            (F.col("__off") + F.row_number().over(wloc)).cast("long"),
        )
    )
    drop = ["__pid", "__opid", "__off"] + [f"__op_{c}" for c in parts]
    if value_col is not None:
        wrun = wloc.rowsBetween(Window.unboundedPreceding, 0)
        out = out.withColumn(
            "__cum",
            (F.col("__voff") + F.sum("__val").over(wrun)).cast("long"),
        )
        drop += ["__voff", "__val"]
    return out.drop(*drop)


def distributed_row_number(
    df: DataFrame,
    order: OrderSpec,
    partition_cols: Sequence[str] = (),
    out_col: str = "rn",
    total_col: Optional[str] = None,
    buckets: Optional[int] = None,
    stabilize_input: bool = True,
) -> DataFrame:
    """``row_number() OVER ([PARTITION BY partition_cols] ORDER BY
    order)`` without a single-partition window -- see the module doc
    for the two-level decomposition and the total-order contract.

    order: [(column, "asc"|"desc"), ...].  ``total_col``, when set,
    also emits the per-partition-key row count (the ``count(*) OVER
    ()`` companion a decile bucketing needs, q223's ``nd``) for free
    from the offsets aggregate.  ``buckets`` defaults to the session's
    shuffle parallelism.
    """
    CALLS.add("distributed_row_number")
    if {out_col, total_col} & {"__rn", "__n"}:
        raise ValueError(
            "distributed_row_number: output names may not be the "
            "internal __rn/__n -- pick other names"
        )
    ranked = _with_global_rank(
        df, order, partition_cols, buckets,
        stabilize_input=stabilize_input,
    )
    renames = ranked.withColumn(out_col, F.col("__rn"))
    if total_col is not None:
        renames = renames.withColumn(total_col, F.col("__n"))
    return renames.drop("__rn", "__n")


def distributed_cumsum(
    df: DataFrame,
    order: OrderSpec,
    value_col: str,
    partition_cols: Sequence[str] = (),
    out_col: str = "cum",
    rank_col: Optional[str] = None,
    total_col: Optional[str] = None,
    count_col: Optional[str] = None,
    buckets: Optional[int] = None,
    stabilize_input: bool = True,
) -> DataFrame:
    """``sum(value) OVER ([PARTITION BY partition_cols] ORDER BY order
    ROWS UNBOUNDED PRECEDING)`` without a single-partition window --
    the q133/pack_sequences two-level prefix sum generalized from the
    md5 ingest order to ANY total order.  Values are BIGINT sum-monoids
    (exact merge across buckets) and must be non-NULL (fail-loud).

    Optional companions from the same pass (no second range shuffle):
    ``rank_col`` = the 1-based global rank, ``total_col`` = the
    per-partition-key value total (the Lorenz-share denominator),
    ``count_col`` = the per-partition-key row count.
    """
    CALLS.add("distributed_cumsum")
    reserved = {"__rn", "__n", "__cum", "__tot"}
    requested = {out_col, rank_col, total_col, count_col} - {None}
    if requested & reserved:
        raise ValueError(
            f"distributed_cumsum: output names {sorted(requested & reserved)} "
            "collide with internal columns -- pick names outside "
            "__rn/__n/__cum/__tot"
        )
    ranked = _with_global_rank(
        df, order, partition_cols, buckets, value_col=value_col,
        stabilize_input=stabilize_input,
    )
    out = ranked.withColumn(out_col, F.col("__cum"))
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("__rn"))
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot"))
    if count_col is not None:
        out = out.withColumn(count_col, F.col("__n"))
    return out.drop("__rn", "__n", "__cum", "__tot")


def distributed_cummax_exclusive(
    df: DataFrame,
    order: OrderSpec,
    value_col: str,
    out_col: str = "prev_max",
    buckets: Optional[int] = None,
    stabilize_input: bool = True,
) -> DataFrame:
    """``max(value) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` -- the EXCLUSIVE running max (NULL on
    the first row) -- without a single-partition window.  The same
    two-level decomposition as the prefix sum, with the max monoid:
    per-bucket maxima get exclusive prefix maxima over the O(buckets)
    summary, the per-row exclusive running max runs per bucket, and
    ``greatest`` (NULL-ignoring on both engines) merges the two.

    The out-of-orderness / watermark-sizing primitive (q316): lateness
    of an event = how far the already-seen maximum timestamp is ahead
    of it, in ARRIVAL order.  NULL values are excluded from the max by
    both window max and this form (max ignores NULL) -- but a NULL in
    ``value_col`` still occupies a row (its own prev_max is real, it
    just contributes nothing).  Same total-order contract as the rank
    operators.
    """
    CALLS.add("distributed_cummax_exclusive")
    if not order:
        raise ValueError("distributed_cummax_exclusive: empty order spec")
    clash = {"__pid", "__opid", "__bm", "__boff"} & set(df.columns)
    if clash:
        raise ValueError(
            f"distributed_cummax_exclusive: input columns {sorted(clash)} "
            "collide with internal names -- rename them upstream"
        )
    base = df.localCheckpoint(eager=False) if stabilize_input else df
    rp = (
        base.repartitionByRange(int(buckets), *_sort_exprs(order))
        if buckets
        else base.repartitionByRange(*_sort_exprs(order))
    )
    staged = rp.withColumn("__pid", F.spark_partition_id())
    bmax = staged.groupBy("__pid").agg(F.max(value_col).alias("__bm"))
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bmax.select(
        F.col("__pid").alias("__opid"),
        F.max("__bm").over(woff).alias("__boff"),
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(*_sort_exprs(order))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        staged.join(
            F.broadcast(offsets), F.col("__pid") == F.col("__opid")
        )
        .withColumn(
            out_col,
            F.greatest(
                F.max(value_col).over(wloc), F.col("__boff")
            ),
        )
        .drop("__pid", "__opid", "__boff")
    )


def ntile_from_rank(n_tiles: int, rank_col: str, total_col: str):
    """Closed-form SQL-standard ``ntile(n)`` from a 1-based rank column
    and the per-partition-key row count: the first ``N mod n`` buckets
    take ``N div n + 1`` rows, the rest ``N div n`` (exactly Spark's
    and DuckDB's sizing, q212-pinned).  Pure BIGINT arithmetic -- a
    double division would misplace ranks past 2^53 (the pack_sequences
    discipline).  For callers that already paid distributed_row_number
    and want the tile from the same pass (q64's rank + ntile + cume
    family) without a second range shuffle.  q == 0 (N < n) stays in
    the first branch because rn <= N = m*(q+1) -- the div-by-zero limb
    is never reached."""
    n = int(n_tiles)
    if n < 1:
        raise ValueError(f"ntile_from_rank: n_tiles must be >= 1, got {n_tiles}")
    return F.expr(
        f"CASE WHEN {rank_col} <= ({total_col} % {n}) "
        f"* ({total_col} div {n} + 1) "
        f"THEN ({rank_col} - 1) div ({total_col} div {n} + 1) + 1 "
        f"ELSE ({total_col} % {n}) + ({rank_col} - ({total_col} % {n}) "
        f"* ({total_col} div {n} + 1) - 1) "
        f"div ({total_col} div {n}) + 1 END"
    ).cast("long")


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order: OrderSpec,
    partition_cols: Sequence[str] = (),
    out_col: str = "tile",
    buckets: Optional[int] = None,
    stabilize_input: bool = True,
) -> DataFrame:
    """``ntile(n) OVER ([PARTITION BY partition_cols] ORDER BY order)``
    without a single-partition window, value-identical to the window
    form (two-strategies-must-agree: tests/test_ranking.py pins random
    frames; the checker grades the rewired callers against unchanged
    ntile oracles).  See the module doc for contracts."""
    CALLS.add("distributed_ntile")
    if n_tiles < 1:
        raise ValueError(
            f"distributed_ntile: n_tiles must be >= 1, got {n_tiles}"
        )
    if out_col in ("__rn", "__n"):
        raise ValueError(
            "distributed_ntile: out_col may not be the internal "
            "__rn/__n -- pick another name"
        )
    ranked = _with_global_rank(
        df, order, partition_cols, buckets,
        stabilize_input=stabilize_input,
    )
    tile = ntile_from_rank(n_tiles, "__rn", "__n")
    return ranked.withColumn(out_col, tile).drop("__rn", "__n")
