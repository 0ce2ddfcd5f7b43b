"""Entity-resolution / record-linkage primitives: blocked fuzzy
matching over a collapsed name vocabulary.

The reference pipeline conforms entity names by EXACT dictionary lookup
(SURVEY §2 J4 — the state map at
`pipelineApplication/silverLayer/StateAbbreviationDict.py:1-61`, applied
at `pipelineApplication/silverLayer/BuildSilverLayer.py:211`); this
module adds the fuzzy half a real ingest
needs, the classic blocking/matching split (Fellegi–Sunter shape)
expressed as pure DataFrame ops:

1. collapse the corpus to the DISTINCT name vocabulary with row counts
   (one map-side-combining groupBy — Zipf makes the vocabulary orders
   of magnitude smaller than the row stream);
2. generate candidate pairs only WITHIN a blocking key (never the full
   cross product), with the `attach_pair_budget` fail-loud guard on the
   exact within-block pair total;
3. match with a bounded edit distance (JVM `levenshtein`, whole-stage
   codegen — no Python in the loop).

Scale: the vocabulary groupBy is the only pass over the corpus; the
pair join runs on vocab rows and its cost is sum over blocks of
m*(m-1)/2, declared and guarded, not discovered at runtime.
`sorted_neighborhood_pairs` is the complementary strategy when no
natural blocking key exists: one global sort, a fixed window of
neighbors, linear pair count by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import attach_pair_budget


def name_vocabulary(
    df: DataFrame, name_col: str, out_count: str = "n_rows"
) -> DataFrame:
    """Distinct-name vocabulary with row multiplicities — the collapse
    every linkage strategy here starts from."""
    return (
        df.filter(F.col(name_col).isNotNull())
        .groupBy(name_col)
        .agg(F.count(F.lit(1)).cast("long").alias(out_count))
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    name_col: str,
    block_expr,
    max_dist: int = 2,
    max_pair_rows: int = 10_000_000,
) -> DataFrame:
    """Candidate name pairs within a blocking key, matched at
    levenshtein(a, b) <= max_dist.

    `block_expr` is a Column over the name (e.g. last token, soundex,
    first-k chars). Pairs are oriented name_a < name_b. Output:
    (name_a, name_b, lev, n_a, n_b) where n_* are corpus row counts —
    the review queue of a dedup/merge step, cheapest-first.

    The exact within-block pair total (sum m*(m-1)/2 over block sizes)
    is budget-guarded BEFORE the join materializes: a corpus whose
    blocking key collapses (one giant block) aborts with the count and
    the knobs, instead of an O(m^2) shuffle.
    """
    vocab = name_vocabulary(df, name_col).withColumn("__blk", block_expr)
    sizes = vocab.groupBy("__blk").agg(F.count(F.lit(1)).alias("__m"))
    gated = attach_pair_budget(
        vocab,
        sizes,
        "__m",
        max_pair_rows,
        "blocked_levenshtein_pairs: blocking key collapses — use a more "
        "selective block_expr or raise max_pair_rows",
    )
    a = gated.select(
        F.col("__blk"),
        F.col(name_col).alias("name_a"),
        F.col("n_rows").alias("n_a"),
    )
    b = gated.select(
        F.col("__blk"),
        F.col(name_col).alias("name_b"),
        F.col("n_rows").alias("n_b"),
    )
    return (
        a.join(b, ["__blk"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "lev", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("lev") <= max_dist)
        .select("name_a", "name_b", "lev", "n_a", "n_b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    name_col: str,
    window: int = 3,
    sort_key=None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation: sort the vocabulary by
    `sort_key` (default: the name itself) and pair each name with its
    next `window` neighbors — linear O(vocab * window) pairs with no
    blocking key needed, the standard fallback when keys collapse.

    One global sort over VOCAB rows (already collapsed, small); the
    lead() windows share a single sort. Pairs oriented by sort order.
    """
    vocab = name_vocabulary(df, name_col)
    key = sort_key if sort_key is not None else F.col(name_col)
    w = Window.orderBy(key, F.col(name_col))
    leads = [
        F.lead(name_col, i).over(w).alias(f"__nb{i}")
        for i in range(1, window + 1)
    ]
    paired = vocab.select(F.col(name_col).alias("name_a"), *leads)
    out = None
    for i in range(1, window + 1):
        part = paired.select(
            "name_a", F.col(f"__nb{i}").alias("name_b")
        ).filter(F.col("name_b").isNotNull())
        out = part if out is None else out.unionByName(part)
    return out


def fingerprint_key(name_col) -> "F.Column":
    """OpenRefine-style clustering key: lowercase, split on whitespace,
    sorted DISTINCT tokens rejoined — token order and duplication
    insensitive, the first-pass normalizer for messy entity names."""
    toks = F.filter(
        F.split(F.lower(F.trim(name_col)), r"\s+"), lambda x: x != ""
    )
    return F.array_join(F.array_sort(F.array_distinct(toks)), " ")
