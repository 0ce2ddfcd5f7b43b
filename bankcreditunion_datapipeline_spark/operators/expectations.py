"""Declarative data-quality expectations: a rule set evaluated in ONE
pass, with observable (never silent) rejection.

The reference validates ad hoc (drop / fillna / regex gates inline in
its layer scripts); this generalizes the engine's quarantine discipline
(operators/clean.py, plans/medallion.py) into the
Great-Expectations-shaped primitive a lakehouse actually runs nightly:
a list of named SQL predicates -> per-rule pass/fail counts and a
quarantine frame tagged with WHICH rules failed.

Scale design: the summary is one conditional aggregation over the input
(no per-rule jobs, no shuffle beyond the single global agg), and the
quarantine tagging is a narrow projection -- rule count affects
expression width only. NULL predicate results count as FAILURES (a rule
that cannot evaluate did not pass -- three-valued logic must not leak
rows through a gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import transient_persist
from pyspark.sql.window import Window


def check_expectations(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Per-rule summary: (rule, n_rows, n_pass, n_fail, pass_t).

    `rules` is [(name, sql_predicate)] and must be non-empty. One wide
    conditional aggregate, then an unpivot via stack() -- a narrow
    O(rules) reshape of a one-row frame. Rule names are quote-escaped
    before interpolation into the stack() expression. pass_t
    floor-truncates at 1e-6 (the division discipline).
    """
    if not rules:
        raise ValueError(
            "check_expectations: rules must be a non-empty list of "
            "(name, sql_predicate) -- an empty rule set has no summary."
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(F.coalesce(F.expr(pred).cast("int"), F.lit(0))).alias(f"__p{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __p{}".format(name.replace("'", "''"), i)
        for i, (name, _) in enumerate(rules)
    )
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack_args}) AS (rule, n_pass)"), "__n"
    ).select(
        "rule",
        F.col("__n").cast("long").alias("n_rows"),
        F.coalesce(F.col("n_pass"), F.lit(0)).cast("long").alias("n_pass"),
        (F.col("__n") - F.coalesce(F.col("n_pass"), F.lit(0)))
        .cast("long")
        .alias("n_fail"),
        F.when(
            F.col("__n") > 0,
            F.floor(
                F.coalesce(F.col("n_pass"), F.lit(0)) * 1000000 / F.col("__n")
            )
            / 1000000,
        ).alias("pass_t"),
    )


def quarantine_violations(
    df: DataFrame, rules: list[tuple[str, str]], out: str = "failed_rules"
) -> DataFrame:
    """Rows failing AT LEAST ONE rule, tagged with the comma-joined
    (rule-order) names of every failed rule -- observable rejection, and
    string-typed so the frame stays oracle-hashable. A narrow filter +
    projection; pairs with check_expectations the way the medallion
    quarantine pairs with its silver gates."""
    fails = [
        F.when(~F.coalesce(F.expr(pred), F.lit(False)), F.lit(name))
        for name, pred in rules
    ]
    tagged = df.withColumn(
        out,
        F.concat_ws(
            ",", F.filter(F.array(*fails), lambda x: x.isNotNull())
        ),
    )
    return tagged.filter(F.col(out) != "")


# Benford first-digit reference, permille, digits 1..9: round(log10(1+1/d)
# * 1000). Baked as integer literals so NEITHER engine evaluates a float
# log -- the constants ARE the contract (they sum to 1000).
BENFORD_PERMILLE = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58,
                    8: 51, 9: 46}


def benford_profile(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """First-significant-digit profile of a POSITIVE integer column
    against Benford's law -- the classic anomaly screen for financial
    amounts (fabricated figures over-sample mid digits).

    Callers declare the positive domain visibly in the query filter
    (repo domain discipline); this operator still fail-louds on v <= 0
    rather than folding sign bits into digits. First digit comes from
    the decimal string head -- engine-portable, no float log10.

    Output: one row per (group..., digit 1..9), scaffolded so missing
    digits surface with n = 0 -- (group..., digit, n, obs_permille,
    exp_permille, dev_permille). obs_permille = n * 1000 div n_group
    (floor); dev = |obs - exp|.

    Scale: one map-side-combining groupBy to (group, digit) counts --
    9 x |groups| rows -- then a broadcast scaffold join. Nothing after
    the first aggregate sees data-sized input.
    """
    group_cols = list(group_cols or [])
    digit = F.when(
        F.col(value_col) > 0,
        F.substring(F.col(value_col).cast("string"), 1, 1).cast("int"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "benford_profile: non-positive value; filter the domain "
                "visibly in the query (v > 0) before profiling"
            )
        )
    )
    counts = df.select(*group_cols, digit.alias("digit")).groupBy(
        *group_cols, "digit"
    ).agg(F.count(F.lit(1)).alias("__n"))
    exp = F.create_map(
        *[F.lit(x) for kv in BENFORD_PERMILLE.items() for x in kv]
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    if group_cols:
        scaffold = counts.select(*group_cols).distinct().crossJoin(
            F.broadcast(digits)
        )
    else:
        scaffold = digits
    keys = [*group_cols, "digit"]
    # Null-safe scaffold join (the psi_terms pattern): a NULL group key is
    # a legitimate stratum -- a plain equi-join would orphan it from its
    # own counts, zeroing the group total (caught by the adversarial fuzz
    # corpus). Re-alias the counts side: scaffold's groups come FROM
    # counts, so the self-join's attributes must not collide.
    c = counts.select(
        *[F.col(k).alias(f"__c_{k}") for k in keys],
        F.col("__n"),
    )
    cond = [F.col(k).eqNullSafe(F.col(f"__c_{k}")) for k in keys]
    full = scaffold.join(c, cond, "left").select(
        *keys, F.coalesce("__n", F.lit(0)).cast("long").alias("n")
    )
    wg = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    out = full.withColumn("__tot", F.sum("n").over(wg)).select(
        *keys,
        "n",
        F.expr("n * 1000 div __tot").alias("obs_permille"),
        exp[F.col("digit")].cast("long").alias("exp_permille"),
    )
    return out.withColumn(
        "dev_permille", F.abs(F.col("obs_permille") - F.col("exp_permille"))
    )


def column_diff_summary(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation: FULL OUTER join two versions of a table
    on its grain and summarize the drift in one pass -- rows only in
    `b` (added), rows only in `a` (removed), rows in both (matched),
    and per-column change counts among matched rows (IS DISTINCT FROM,
    so NULL<->value transitions count as changes).

    The column-level companion to bucket_checksums (temporal.py): the
    checksum tree says WHICH buckets diverge cheaply; this says WHAT
    changed, with exact counts. Output is long-format (metric, n) so a
    widening schema never changes the output schema.

    Scale: one shuffle on the key (the join), one global conditional
    aggregate, one stack() unpivot of a single row -- per-column logic
    is expression width, not extra passes. Keys must be unique per side
    (a fan-out join would double-count; enforce upstream with the A1
    dedup operators).
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    # presence markers, not key-null probes: with an eqNullSafe join a
    # NULL key legitimately matches, so key IS NOT NULL cannot stand in
    # for "this side has a row"
    aa = a.withColumn("__pa", F.lit(1)).alias("a")
    bb = b.withColumn("__pb", F.lit(1)).alias("b")
    cond = [aa[k].eqNullSafe(bb[k]) for k in key_cols]
    j = aa.join(bb, cond, "full_outer")
    in_a = F.col("a.__pa").isNotNull()
    in_b = F.col("b.__pb").isNotNull()
    aggs = [
        F.sum((~in_a & in_b).cast("long")).alias("rows_added"),
        F.sum((in_a & ~in_b).cast("long")).alias("rows_removed"),
        F.sum((in_a & in_b).cast("long")).alias("rows_matched"),
    ]
    for c in compare_cols:
        aggs.append(
            F.sum(
                (
                    in_a
                    & in_b
                    & ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
                ).cast("long")
            ).alias(f"changed_{c}")
        )
    wide = j.agg(*aggs)
    metrics = ["rows_added", "rows_removed", "rows_matched"] + [
        f"changed_{c}" for c in compare_cols
    ]
    stack_expr = ", ".join(f"'{m}', {m}" for m in metrics)
    return wide.selectExpr(
        f"stack({len(metrics)}, {stack_expr}) AS (metric, n)"
    )


def fd_violation_report(
    df: DataFrame, fds: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency profiling: for each candidate FD
    (lhs -> rhs), how badly the data violates it -- the schema-
    discovery / data-quality probe run before trusting a column as a
    lookup key or a denormalized copy.

    Per FD: n_groups (distinct lhs), n_violating (lhs values mapping
    to >1 distinct rhs), violation_permille (floor div), and
    max_distinct_rhs (the worst offender's fan-out). NULL lhs rows are
    excluded (a NULL key determines nothing); NULL rhs counts as a
    value (a group mapping to {x, NULL} IS a violation -- count
    distinct + null-presence flag).

    One hash aggregate per FD over (lhs) -- map-side combining; FD
    count affects job count, not data passes per FD. Output is
    long-format (fd, ...) so adding FDs never changes the schema.
    """
    if not fds:
        raise ValueError("fds must be non-empty")
    out = None
    for lhs, rhs in fds:
        per = (
            df.filter(F.col(lhs).isNotNull())
            .groupBy(lhs)
            .agg(
                (
                    F.countDistinct(rhs)
                    + F.max(F.col(rhs).isNull().cast("int"))
                ).alias("__d")
            )
        )
        rep = per.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum((F.col("__d") > 1).cast("long"))
            .cast("long")
            .alias("n_violating"),
            F.expr(
                "CAST(sum(CASE WHEN __d > 1 THEN 1 ELSE 0 END) * 1000 "
                "div count(1) AS BIGINT)"
            ).alias("violation_permille"),
            F.max("__d").cast("long").alias("max_distinct_rhs"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def measure_reconciliation(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    parent_val: str,
    child_val: str,
) -> DataFrame:
    """Cross-table MEASURE consistency: does the parent's stored total
    equal the rollup of its children? The value-level complement to FK
    integrity (q155 checks the keys exist; this checks the MONEY adds
    up) -- the nightly check behind every denormalized total.

    One map-side-combining rollup of the child on its key, one LEFT
    join from the parent (childless parents surface, never vanish),
    one global conditional aggregate. Values should already be in an
    exact integer lane (cents) -- float measures must be converted
    upstream, visibly.

    Output (single row): n_parents, n_childless, n_exact,
    mismatch_permille (floor div, over ALL parents), and
    max_abs_delta among parents WITH children.
    """
    rolled = child.groupBy(F.col(child_key).alias("__k")).agg(
        F.sum(child_val).cast("long").alias("__cv")
    )
    p = parent.select(
        F.col(parent_key).alias("__k"),
        F.col(parent_val).cast("long").alias("__pv"),
    )
    j = p.join(rolled, "__k", "left")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_parents"),
        F.sum(F.col("__cv").isNull().cast("long"))
        .cast("long")
        .alias("n_childless"),
        F.sum((F.col("__cv") == F.col("__pv")).cast("long"))
        .cast("long")
        .alias("n_exact"),
        F.expr(
            "CAST(sum(CASE WHEN __cv IS NOT NULL AND __cv <> __pv "
            "THEN 1 ELSE 0 END) * 1000 div count(1) AS BIGINT)"
        ).alias("mismatch_permille"),
        F.max(
            F.when(F.col("__cv").isNotNull(), F.abs(F.col("__pv") - F.col("__cv")))
        )
        .cast("long")
        .alias("max_abs_delta"),
    )


def column_value_overlap(
    cols: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Instance-based joinability discovery: pairwise overlap of the
    DISTINCT value sets of named columns -- the data-discovery probe
    that finds UNDECLARED join keys (q155 audits declared FKs; this
    surfaces candidates).  For each column pair with any overlap:
    (col_a, col_b, n_a, n_b, n_shared, jaccard_permille,
    containment_a_permille, containment_b_permille) -- containment_a
    near 1000 reads "a's values are (almost) all present in b", the
    FK-candidate signature; floor-div permille (the settled lane).

    Values compare as strings (engine-portable canonical form for the
    key types this probes; NULLs excluded -- they never join).

    Scale shape: one DISTINCT per column first (map-side combining --
    the value SETS are dimension-sized even when the tables are not),
    then the pair join runs value-keyed over the union of those sets;
    a value's posting list is bounded by the number of PROFILED
    COLUMNS, so pair fan-out is |values| * C(n_cols, 2) worst case --
    no budget needed at any table size. Zero-overlap pairs are absent
    from the output by construction (inner value join).
    """
    assert len(cols) >= 2
    assert len({n for n, _, _ in cols}) == len(cols), "names must be unique"
    parts = [
        df.select(
            F.lit(name).alias("__col"),
            F.col(c).cast("string").alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .distinct()
        for name, df, c in cols
    ]
    longf = parts[0]
    for p in parts[1:]:
        longf = longf.unionByName(p)
    longf = longf.transform(transient_persist)
    sizes = longf.groupBy("__col").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = longf.select(F.col("__col").alias("col_a"), "__v")
    b = longf.select(F.col("__col").alias("col_b"), "__v")
    inter = (
        a.join(b, "__v")
        .filter(F.col("col_a") < F.col("col_b"))
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("__col").alias("col_a"), F.col("__n").alias("n_a"))
    sb = sizes.select(F.col("__col").alias("col_b"), F.col("__n").alias("n_b"))
    return (
        inter.join(sa, "col_a")
        .join(sb, "col_b")
        .select(
            "col_a",
            "col_b",
            "n_a",
            "n_b",
            "n_shared",
            F.expr(
                "(n_shared * 1000) div (n_a + n_b - n_shared)"
            ).alias("jaccard_permille"),
            F.expr("(n_shared * 1000) div n_a").alias(
                "containment_a_permille"
            ),
            F.expr("(n_shared * 1000) div n_b").alias(
                "containment_b_permille"
            ),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns:
    the privacy gate a pipeline runs BEFORE publishing a "de-identified"
    extract.  Every row whose quasi-identifier combination is shared by
    fewer than ``k`` rows is re-identifiable by that combination; a
    cell where every row carries the same sensitive value leaks it even
    at k (hence l-diversity).

    Returns ONE summary row:
      n_rows, n_cells (distinct QI combinations; NULL QI values form
      their own cell -- groupBy is null-safe on both engines),
      k_min (smallest cell), cells_below_k, rows_below_k,
      rows_below_k_permille (floor), l_min (the minimum per-cell count
      of DISTINCT non-NULL sensitive values -- 0 when a cell's
      sensitive column is all NULL), k_threshold (echo of ``k``).

    Publish gate: rows_below_k_permille == 0 AND l_min >= 2 is the
    conventional bar; anything else routes to suppression/coarsening.

    Scale: one hash aggregate over the QI grain, one single-row
    finisher -- no row survives to the output, so the audit itself
    leaks nothing.  All counts BIGINT; division is the floor `div`
    lane.
    """
    assert k >= 1
    cells = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct(sensitive_col).cast("long").alias("__l"),
    )
    return cells.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("__n").cast("long").alias("k_min"),
        F.sum((F.col("__n") < k).cast("long")).cast("long").alias(
            "cells_below_k"
        ),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
        F.min("__l").cast("long").alias("l_min"),
    ).select(
        "n_rows",
        "n_cells",
        "k_min",
        "cells_below_k",
        "rows_below_k",
        F.expr("CAST(rows_below_k * 1000 div n_rows AS BIGINT)").alias(
            "rows_below_k_permille"
        ),
        "l_min",
        F.lit(int(k)).cast("long").alias("k_threshold"),
    )
