"""Join / union / dedup kernel (SURVEY §2.4-2.6).

Scale posture: every join here is declared, not scheduled -- Catalyst + AQE
pick sort-merge vs broadcast vs shuffled-hash at runtime. We add explicit
`broadcast()` hints only where a side is a known small dimension (the
reference's state-abbreviation dict, 54 rows), and expose salting for skewed
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_join(left: DataFrame, right: DataFrame, on: list[str] | str, how: str = "left") -> DataFrame:
    """J1/J2: equi-join on (composite) key with USING-style key coalescing
    (reference silverLayer/BuildSilverLayer.py:287-304)."""
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right, keys, how)


def broadcast_lookup(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    value: str,
    out: str,
    keep_key: bool = False,
) -> DataFrame:
    """J4: map-side dimension lookup as a broadcast hash join.

    Replaces the reference's broadcast-dict Python UDF
    (silverLayer/BuildSilverLayer.py:61,211 + Helpers_FunctionsDicts.py:66-80)
    with a JVM-side broadcast join: no Python-worker hop, stays inside
    whole-stage codegen. Unmatched keys -> NULL `out` (same as dict .get()).
    """
    dim_sel = dim.select(F.col(dim_key).alias("__bl_key"), F.col(value).alias(out))
    joined = df.join(F.broadcast(dim_sel), df[key] == F.col("__bl_key"), "left").drop("__bl_key")
    return joined if keep_key else joined.drop(key)


def literal_map_lookup(df: DataFrame, key: str, mapping: dict[str, str], out: str) -> DataFrame:
    """J4 alternative for tiny static dicts: a create_map literal evaluated
    inline by codegen -- zero join, zero broadcast traffic."""
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return df.withColumn(out, m[F.col(key)])


def union_conform(dfs: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1: union by NAME, not position (reference silver_data,
    silverLayer/BuildSilverLayer.py:323-324, where bank/CU column order
    differs)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def dedup_keyed(df: DataFrame, key: list[str], order_by: list[str] | None = None) -> DataFrame:
    """A1 done right: dedup on the DECLARED grain, not all columns
    (SURVEY §4.3#3 -- all-column dropDuplicates hides join-grain bugs).

    With `order_by`, keeps the first row per key under that ordering
    (deterministic); without, an arbitrary-but-single row via dropDuplicates.
    """
    if order_by is None:
        return df.dropDuplicates(key)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assert_unique_key(df: DataFrame, key: list[str]) -> None:
    """Uniqueness check for a declared grain (SURVEY §7.4). Runs one
    aggregate job; raises if any key occurs more than once."""
    dupes = df.groupBy(*key).count().filter(F.col("count") > 1).limit(1).collect()
    if dupes:
        raise ValueError(f"key {key} not unique; sample violation: {dupes[0]}")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (skewed) left side, explode the
    right side across buckets. Use when AQE skew-split is unavailable or the
    skew is extreme (one key >> executor memory). Keys stay JVM-side.
    """
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(salted_right, [*on, "__salt"], how).drop("__salt")


def top_key_shares(
    df: DataFrame, key_cols: list[str], top_k: int = 20
) -> DataFrame:
    """Per-key row counts for the top_k heaviest keys plus each key's
    share of the total -- the table companion to the one-row
    `analytics.key_skew_report` profile (which is the canonical skew
    PROBE; this is the drill-down naming the heavy keys). A top key
    holding >~5% of rows predicts straggler tasks and motivates
    salted_join / AQE skew split.

    One aggregation pass over the data; the total derives from the
    grouped counts (sum over O(keys) rows broadcast back) rather than
    a second full `df.count()` scan -- at 100 TB that second pass is
    a whole extra read of the table. Output is O(top_k)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("long").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            # floor, not round: n/total int ratios hit exact .5 ties
            "share",
            F.floor(F.col("n_rows") / F.col("__total") * 1000000) / 1000000,
        )
        .drop("__total")
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top_k)
    )
