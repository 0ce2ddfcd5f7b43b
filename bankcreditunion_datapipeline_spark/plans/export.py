"""End-to-end pretraining-data export: the composition downstream of
curation that turns a curated corpus into loader-ready shards.

    curated documents
      -> per-source token budgets from temperature mixture weights
      -> budget cut (keep docs while the pre-doc cumulative is under budget)
      -> shard assignment (md5-bucket % n_shards)
      -> reproducible epoch order within each shard
      -> partitioned write (one directory per shard) + manifest

Scale shape: every step is a narrow projection or a per-source/per-shard
pass -- no global sort, no driver-side loop over rows. The budget cut
rides the shared _budget_cut (plans/release.py): distributed_cumsum
bucketed WITHIN each source, because source is the corpus skew key and
a per-source window would single-task the dominant crawl. The manifest
is an O(n_shards) aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import assign_shards, epoch_permutation, mixture_weights


@dataclass
class ExportResult:
    selected: DataFrame   # rows chosen for export, with shard + pos
    manifest: DataFrame   # per-shard: n_docs, n_tokens
    weights: DataFrame    # per-source mixture weight and token budget


def export_training_data(
    docs: DataFrame,
    total_token_budget: int,
    out_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_shards: int = 8,
    seed: str = "epoch0",
    alpha: float = 0.5,
) -> ExportResult:
    """Select ~`total_token_budget` whitespace tokens, allocated across
    sources by temperature-flattened mixture weights, and lay the result
    out as `n_shards` reproducibly-ordered shards.

    Budget semantics per source: keep documents (in deterministic id
    order) while the PRE-document cumulative is under the source budget,
    so each source's budget closes exactly once (the first overshooting
    doc is kept -- same rule as the q104 curriculum cut). Selection is a
    pure function of (corpus, budget, seed): append-only corpus growth
    never reorders existing shards' prefixes.
    """
    toks = docs.withColumn(
        "__n_tokens",
        F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        ),
    )
    weights = mixture_weights(docs, source_col, alpha).withColumn(
        "token_budget",
        F.ceil(F.col("sample_weight") * F.lit(float(total_token_budget))).cast(
            "long"
        ),
    )
    from .release import _budget_cut

    # NULL-source docs get no budget row and are EXCLUDED here (equi-join
    # semantics, mirrored by the oracle's USING join): a doc without
    # provenance has no mixture group to draw budget from. Assign a
    # sentinel source upstream to opt such docs in. The cut rides the
    # shared _budget_cut (distributed_cumsum bucketed WITHIN each source
    # -- the r13 skew posture; a per-source window would single-task the
    # dominant crawl); null_values="drop" replays the windowed oracle's
    # NULL-before exclusion. stabilize_input=False: the input is a plain
    # column-pruned scan projection, cheaper to re-scan than to pin.
    selected = _budget_cut(
        toks,
        weights,
        source_col,
        id_col,
        "__n_tokens",
        budget_col="token_budget",
        null_values="drop",
        stabilize_input=False,
    )
    laid_out = epoch_permutation(selected, id_col, n_shards, seed)
    if out_dir is not None:
        laid_out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    manifest = laid_out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_tokens").cast("long").alias("n_tokens"),
    )
    return ExportResult(
        selected=laid_out.drop("__n_tokens"), manifest=manifest, weights=weights
    )
