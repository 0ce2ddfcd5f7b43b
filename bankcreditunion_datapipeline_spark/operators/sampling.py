"""Sampling operators for training-data pipelines.

Three tools, by reproducibility requirement:

- deterministic_hash_sample: keep a row iff a hash of its key falls under
  the rate threshold. Fully deterministic, engine-portable (md5 is
  standard everywhere), stable under re-runs, appends, and repartitioning
  -- the property that matters for dataset versioning: a row's membership
  depends only on its key, never on partition layout or seed streams.
  Narrow (no shuffle); the predicate pushes into the scan stage.
- seeded_sample / stratified_sample: Spark-native Bernoulli sampling
  (df.sample / df.sampleBy). Seeded but partition-layout-dependent;
  fine for quick subsampling, wrong for reproducible dataset cuts.
- split_train_holdout: hash-disjoint train/holdout partition of a corpus
  (the standard "hash mod N" eval split, leak-free by construction).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localresult import local_result_frame
from pyspark.sql.window import Window

# 16^4 four-hex-digit buckets
_BUCKETS = 65536


def hash_bucket(key: Column, buckets: int = _BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(key) -- engine-portable
    (same value in any system with md5 + hex parse, so samples can be
    reproduced outside Spark)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % buckets


def deterministic_hash_sample(
    df: DataFrame, key: str, rate: float, buckets: int = _BUCKETS
) -> DataFrame:
    """Keep rows whose hash bucket < rate * buckets. Membership is a pure
    function of the key: stable across runs, engines, partitionings."""
    threshold = int(rate * buckets)
    return df.filter(hash_bucket(F.col(key), buckets) < threshold)


def weighted_hash_sample(
    df: DataFrame, key: str, weight: Column, buckets: int = _BUCKETS
) -> DataFrame:
    """Per-row keep probability given by `weight` (a [0, 1] Column computed
    from the row itself, e.g. a quality score): keep iff
    hash_bucket(key) < floor(weight * buckets).

    The quality-proportional retention pattern (keep high-quality docs at a
    higher rate than low-quality ones) WITHOUT an RNG: membership is a pure
    function of (key, weight), so it is stable across runs, engines,
    partitionings, and appends, and a later re-run with the same weights
    reproduces the identical corpus cut. weight >= 1 always keeps,
    weight <= 0 never keeps. Narrow predicate -- no shuffle.
    """
    return df.filter(
        hash_bucket(F.col(key), buckets) < F.floor(weight * F.lit(float(buckets)))
    )


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Bernoulli row sample. Seeded but NOT layout-stable -- use
    deterministic_hash_sample for reproducible dataset cuts."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (df.sampleBy): e.g. downsample the
    dominant language while keeping all of a rare one."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def split_train_holdout(
    df: DataFrame, key: str, holdout_rate: float = 0.05, buckets: int = _BUCKETS
) -> tuple[DataFrame, DataFrame]:
    """Hash-disjoint (train, holdout) split: a key is in exactly one side,
    forever -- append-safe and leak-free. Returns (train, holdout)."""
    threshold = int(holdout_rate * buckets)
    b = hash_bucket(F.col(key), buckets)
    return df.filter(b >= threshold), df.filter(b < threshold)


def assign_shards(df: DataFrame, key: str, n_shards: int, out: str = "shard") -> DataFrame:
    """Deterministic training-shard assignment: ``shard = md5-bucket(key) %
    n_shards`` -- the export step that turns a curated corpus into N
    balanced shards for a data loader.

    Properties that matter for training exports:

    - membership is a pure function of the key: re-runs, appends, and
      repartitioning never move a document between shards (resumable,
      diffable exports);
    - the hash is engine-portable md5 (same bucket in DuckDB/Python), so a
      loader can verify shard membership without Spark;
    - assignment is a narrow projection -- NO shuffle happens until the
      partitioned write, and ``df.write.partitionBy(out)`` is then the
      only data movement. With ``n_shards`` a power of two the 16-bit
      md5 bucket divides evenly (no modulo bias).

    This hash-mod assignment is the 100 TB path: a global ``row_number``
    round-robin would funnel every row through one window partition.
    """
    return df.withColumn(out, hash_bucket(F.col(key), n_shards))


def mixture_weights(
    df: DataFrame, group_col: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Temperature-flattened sampling weights per corpus group:
    ``weight(g) = n_g^alpha / sum_g n_g^alpha`` (the multilingual sampling
    exponent of mBERT/XLM-R; alpha<1 up-weights small sources so the
    mixture isn't dominated by the largest corpus).

    One grouped count over the corpus, then the normalization runs on the
    O(groups) aggregate -- the window is dim-sized at any corpus scale.
    Default alpha=0.5 uses sqrt (exactly rounded IEEE, engine-portable);
    arbitrary alpha goes through pow.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    raw = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(alpha))
    )
    from pyspark.sql.window import Window

    total = F.sum(raw).over(Window.partitionBy())
    return counts.select(
        group_col,
        F.col("n_docs"),
        F.round(raw / total, 6).alias("sample_weight"),
    )


def epoch_permutation(
    df: DataFrame,
    key: str,
    n_shards: int = 8,
    seed: str = "epoch0",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-order permutation: shard = md5-bucket(key) %
    n_shards, position = rank of md5(key || ':' || seed) within the shard.

    The reproducible epoch shuffle for a data loader: membership and order
    are pure functions of (key, seed) -- re-runs, appends to OTHER shards,
    and repartitioning never change a row's (shard, pos); a new seed is a
    fresh permutation. `key` must be unique at the row grain (duplicate
    keys would tie on the order key and make their relative order
    partition-dependent). The window partitions by shard, so no 100 TB global
    row_number bottleneck -- each shard orders independently (and the
    loader reads shards in parallel anyway).
    """
    order_key = F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + seed)))
    from pyspark.sql.window import Window

    w = Window.partitionBy(shard_col).orderBy("__ok", key)
    return (
        assign_shards(df, key, n_shards, shard_col)
        .withColumn("__ok", order_key)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__ok")
    )


def key_multiplicity_profile(df: DataFrame, key: str) -> DataFrame:
    """Percentile profile of a key's multiplicity distribution: one row
    of (n_keys, max_count, p50_count, p99_count, skew_ratio = max/p50).
    The percentile companion to the canonical integer-lane
    `analytics.key_skew_report` (max/mean permille + heavy key) -- use
    THAT as the pre-shuffle probe; use this when the p50/p99 shape of
    the multiplicity distribution is the question (q128).

    skew_ratio near 1 means plain hash partitioning is fine; a hot-key
    ratio in the hundreds says salt the key (conform.salted_join) or
    rely on AQE skew-split. Cost: one grouped count (the same shuffle
    the real query would pay) plus an O(distinct keys) aggregate.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__c"))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__c").cast("long").alias("max_count"),
        F.round(F.percentile("__c", F.lit(0.5)), 2).alias("p50_count"),
        F.round(F.percentile("__c", F.lit(0.99)), 2).alias("p99_count"),
        (
            F.floor((F.max("__c") / F.percentile("__c", F.lit(0.5))) * 10000)
            / 10000
        ).alias("skew_ratio"),
    )


def pack_sequences(
    df: DataFrame,
    key: str,
    n_tokens_col: str,
    seq_len: int = 512,
    seq_col: str = "seq_id",
    prefix_buckets: int = 256,
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences by contiguous
    greedy fill: lay the corpus out in a deterministic order and cut it
    every `seq_len` tokens, assigning each document to the sequence where
    it STARTS (``seq_id = floor(start_offset / seq_len)``). This is the
    "concatenate then chop" packing that GPT-style pretraining loaders use
    -- simple, deterministic, and within one document of optimal fill
    (no bin-packing search, which is neither stable nor distributable).

    The order is ``md5(key)`` -- an engine-portable deterministic shuffle,
    so packing is reproducible across runs/engines and independent of
    partition layout (same property as deterministic_hash_sample).

    Scale shape: a naive ``sum() OVER (ORDER BY md5)`` is a single-
    partition global window -- the classic 100 TB bottleneck. This
    implements the two-level distributed prefix sum instead:

    1. bucket = first 2 hex digits of md5(key) (256 buckets); bucket-major
       order (bucket, md5) is IDENTICAL to global md5 order because the
       bucket is a numeric prefix of the hex string.
    2. per-bucket token totals -- O(buckets) rows -- get exclusive prefix
       offsets via a window over that tiny aggregate.
    3. the per-row running sum is a window PARTITIONED by bucket (256-way
       parallel), plus the broadcast bucket offset.

    Each document's global start offset is exact, no row ever passes
    through a single-partition window, and the broadcast side is O(256).

    Returns df + (seq_col, __start kept off). Rows with NULL token counts
    count as 0 tokens (they land in a sequence but consume nothing).
    `key` must be unique AND non-null: md5(NULL) is NULL, which would
    both make the order ambiguous and drop the row at the bucket-offset
    join.
    """
    from pyspark.sql.window import Window

    okey = F.md5(F.col(key).cast("string"))
    bkt = F.conv(F.substring(okey, 1, 2), 16, 10).cast("int")
    n_tok = F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0))
    base = df.withColumn("__ok", okey).withColumn("__bkt", bkt).withColumn(
        "__nt", n_tok
    )

    totals = base.groupBy("__bkt").agg(F.sum("__nt").alias("__bt"))
    off_w = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off")
    )

    cum_w = (
        Window.partitionBy("__bkt")
        .orderBy("__ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.col("__off") + F.sum("__nt").over(cum_w))
        .withColumn(
            # Pure long arithmetic: a double division here silently loses
            # integer precision once cumulative token offsets pass 2^53
            # (real at 100 TB corpus scale) and can misassign sequence
            # ids. Offsets are non-negative, so `div` == floor division.
            seq_col,
            F.expr(f"(__cum - __nt) div {int(seq_len)}").cast("long"),
        )
        .drop("__ok", "__bkt", "__off", "__cum", "__nt")
    )


def weighted_sample_keys(
    df: DataFrame,
    weight_col: str,
    salt: str = "es1",
    id_col: str | None = None,
) -> DataFrame:
    """Efraimidis-Spirakis priority keys for weighted sampling WITHOUT
    replacement (Inf. Proc. Letters 2006): key = ln(u) / w with u a
    deterministic per-row uniform; the k rows with the LARGEST keys are
    an exact weighted sample -- so distributed weighted sampling is
    just TakeOrdered over one narrow pass, no rejection loops, no
    global state, trivially mergeable across partitions/batches
    (max-heap union).

    Determinism/portability: u = (lane48 + 1) / 2^48 where lane48 is a
    48-bit md5 slice of (salt, id) -- 48 bits so the integer is EXACT
    in a double on both engines (53-bit mantissa), making u, ln(u) and
    the ranking replayable in SQL. ln() is the one non-integer op; a
    selection flip would need two keys within ~1 ulp, measure-zero for
    continuous keys (and the oracle gate would catch it).

    Adds `__es_key` (double). Rows with NULL or non-positive weight are
    dropped (they cannot be sampled). `id_col` is the hashed identity
    and MUST be row-unique: duplicate ids would get IDENTICAL uniforms
    u, so their priority keys are perfectly correlated and the
    Efraimidis-Spirakis independence assumption (hence the sampling
    distribution) breaks -- the default (first column) is only a
    convenience for frames whose first column is a key; callers should
    pass it explicitly (q173 does).
    """
    idc = id_col or df.columns[0]
    lane48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(idc).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (lane48 + 1) / F.lit(float(2**48))
    return df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es_key", F.log(u) / F.col(weight_col))


def proportional_allocation(
    counts: DataFrame,
    group_cols: list[str],
    n_col: str,
    total: int,
    out: str = "alloc",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    quota `total` across groups proportionally to `counts[n_col]` so the
    allocations are integers that sum EXACTLY to `total` -- the quota
    planner `mixture_weights` ratios feed when a run needs hard slot
    counts (shard budgets, sampling quotas) instead of permille weights.

    floor_share = n * total div grand; the `total - sum(floor_share)`
    leftover slots (< |groups|) go one each to the largest remainders
    `n * total mod grand`, ties broken by the group columns ascending --
    fully deterministic, integer end-to-end. Groups with n = 0 get 0.

    Lane: n * total must fit BIGINT -- fail-loud guarded (the repo's
    divide-first split does not apply: the remainder ORDER matters, so
    the product must be formed).

    Scale: `counts` is already an aggregate (dim-sized |groups| rows);
    grand total broadcast-joins back and the remainder ranking is a
    single-partition window over |groups| -- allocation is a planner,
    never data-sized.
    """
    grand = counts.agg(F.sum(n_col).cast("long").alias("__grand"))
    guarded = counts.crossJoin(F.broadcast(grand)).select(
        *group_cols,
        F.col(n_col).cast("long").alias("__n"),
        "__grand",
        F.when(
            (F.col("__grand") > 0)
            & (
                F.col(n_col).cast("long")
                <= F.expr(f"9223372036854775807 div {int(total)}")
            ),
            F.expr(f"CAST({n_col} AS BIGINT) * {int(total)} div __grand"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "proportional_allocation: empty counts or n * total "
                    "exceeds the BIGINT lane; shrink total or pre-scale "
                    "the counts"
                )
            )
        )
        .alias("__floor"),
        F.expr(f"CAST({n_col} AS BIGINT) * {int(total)} % __grand").alias(
            "__rem"
        ),
    )
    wr = Window.orderBy(
        F.desc("__rem"), *[F.asc(c) for c in group_cols]
    )
    wall = Window.partitionBy()
    ranked = guarded.withColumn("__rn", F.row_number().over(wr)).withColumn(
        "__leftover", F.lit(int(total)) - F.sum("__floor").over(wall)
    )
    return ranked.select(
        *group_cols,
        F.col("__n").alias(n_col),
        (
            F.col("__floor")
            + F.when(F.col("__rn") <= F.col("__leftover"), 1).otherwise(0)
        ).alias(out),
    )


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    alloc: DataFrame,
    alloc_col: str,
    id_col: str,
) -> DataFrame:
    """EXACT-count deterministic stratified sample: take precisely
    `alloc[alloc_col]` rows from each stratum -- the executor of
    `proportional_allocation`'s plan, closing the gap fraction-based
    sampling can't (`deterministic_hash_sample` hits a RATE; training
    mixtures need exact slot counts per stratum).

    Selection ranks rows within each stratum by (md5(id), id) -- the
    repo's portable hash lane -- and keeps rank <= alloc: stable under
    partitioning, re-runs, and engine choice; adding rows to a stratum
    only swaps membership where hash order dictates, never reshuffles
    unrelated strata. A stratum with fewer rows than its quota yields
    all of them (under-fill surfaces in the count, visibly -- no silent
    borrowing across strata; re-plan the allocation if that matters).

    Output: the sampled rows of `df`, plus `smp_rank` (1..alloc within
    the stratum).

    Scale: one rank window partitioned by the stratum columns (the
    shuffle a stratified operation needs anyway) against a broadcast
    dim-sized allocation table. Skewed strata sort within their own
    partitions; no global order.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("smp_rank", F.row_number().over(w))
    return ranked.join(
        F.broadcast(alloc.select(*group_cols, alloc_col)), group_cols
    ).filter(F.col("smp_rank") <= F.col(alloc_col)).drop(alloc_col)


def greedy_coverage_picks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    ngram: int = 1,
) -> DataFrame:
    """Greedy maximum-coverage document selection: pick k documents
    one at a time, each maximizing the count of vocabulary words not
    covered by earlier picks (ties -> smallest id) -- the classic
    (1 - 1/e)-approximate submodular selection, here as the
    coverage-maximizing curation primitive (seed a tokenizer corpus /
    eval set with the fewest docs that span the vocabulary).

    Execution shape: the distinct (id, word) table persists once;
    each round is one anti-join against the covered-word set + one
    map-side-combining count + a TakeOrdered(1). The driver holds
    ONLY the k picked ids (the O(k) materialization precedent of the
    k-means seeding sites); the covered set stays a DataFrame. Rounds
    stop early when no remaining document adds a new word.

    `ngram` sets the covered element space (1 = words, 2 = adjacent
    bigrams -- the q223 lesson: saturated unigram vocabularies make
    every pick after the first a no-op; bigrams keep the gain curve
    alive on templated corpora).

    Output: (pick 1..k, doc_id, marginal_gain).
    """
    spark = df.sparkSession
    # r15 (guide §4.2): the distinct per-doc n-gram build was a chain of
    # interpreted array-HOF lambdas (filter + size + transform +
    # concat_ws/slice per element, then array_distinct) -- measured
    # 3.7s of q227's 5.4s at sf0.1 for 256k output rows. One Arrow
    # kernel emits the identical (id, elem) rows: split on the literal
    # single space (Python str.split(" ") == the old F.split(text, " ")
    # + non-empty filter), n-grams joined by " ", per-doc first-seen
    # dedup (row ORDER is irrelevant downstream -- the consumers are a
    # groupBy count and set membership).
    sel = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    id_dtype = dict(sel.dtypes)["__id"]

    def _kern(batches):
        import pandas as pd

        for pdf in batches:
            ids: list = []
            ws: list = []
            for did, txt in zip(pdf["__id"], pdf["__t"]):
                if txt is None:
                    continue
                w = [t for t in str(txt).split(" ") if t]
                if len(w) < ngram:
                    continue
                seen = set()
                for i in range(len(w) - ngram + 1):
                    g = " ".join(w[i : i + ngram])
                    if g not in seen:
                        seen.add(g)
                        ids.append(did)
                        ws.append(g)
            yield pd.DataFrame(
                {
                    "__id": pd.Series(ids, dtype=object),
                    "__w": pd.Series(ws, dtype=object),
                }
            )

    # (id, elem) rows are distinct BY CONSTRUCTION (per-doc dedup runs
    # in the kernel), so no .distinct() shuffle.  The one shuffle that
    # remains is a repartition on __id (count unset ->
    # spark.sql.shuffle.partitions, scale-adaptive + AQE-coalesced):
    # every round's groupBy("__id") then REUSES the cached partitioning
    # (guide §2.4) -- the broadcast anti-join is narrow, so round jobs
    # run exchange-free.
    toks = (
        sel.mapInPandas(_kern, f"__id {id_dtype}, __w string")
        .repartition(F.col("__id"))
        .persist()
    )
    # covered is the union of <= k picked docs' vocabularies -- bounded
    # by k * document vocabulary at any corpus scale (it grows with k
    # and document length, never with corpus row count).  That bound is
    # exactly the broadcast-join bound, so the set lives on the DRIVER
    # (r14 optimization): the previous DataFrame union+distinct+persist
    # chain paid a shuffle stage + a persist + an unpersist per round
    # inside the argmax job; the driver set costs one doc-vocab-sized
    # collect per round and the anti-join probe side becomes a local
    # relation broadcast (same anti-join semantics, no per-round
    # distinct, O(1) storage in k by construction).
    covered: set = set()
    picks = []
    for i in range(k):
        if covered:
            cov_df = local_result_frame(
                spark, [(w,) for w in sorted(covered)], "__w string"
            )
            remaining = toks.join(F.broadcast(cov_df), "__w", "left_anti")
        else:
            remaining = toks
        top = (
            remaining.groupBy("__id")
            .agg(F.count(F.lit(1)).cast("long").alias("__g"))
            .orderBy(F.desc("__g"), F.asc("__id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        picks.append((i + 1, top[0]["__id"], top[0]["__g"]))
        covered.update(
            r["__w"]
            for r in toks.filter(F.col("__id") == top[0]["__id"])
            .select("__w")
            .collect()
        )
    toks.unpersist()
    return local_result_frame(
        spark, picks, "pick long, doc_id long, marginal_gain long"
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    splits: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.9)),
    rest: str = "test",
    seed: str = "split0",
    buckets: int = _BUCKETS,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: an entire near-duplicate
    CLUSTER (connected component of ``pairs``) lands in exactly one
    split.  This prevents at split time the contamination q77 detects
    after the fact -- a doc's near-twin in the eval set is exactly the
    leak that inflates benchmark scores.

    Mechanics: label components over the pair graph (min-reachable-id,
    `dedup.connected_components`), default unpaired docs to their own
    singleton cluster, then split on md5(cluster_key || ':' || seed)
    (the q44 deterministic-hash lane applied to the CLUSTER key, not
    the doc key -- that one substitution is the whole fix). ``splits``
    are (name, cumulative_rate) cut points on floor(rate * buckets)
    with ``rate`` read as its DECIMAL value (Fraction(str(rate)),
    exact -- float multiplication truncates binary noise downward and
    silently shifts boundaries like 0.57*10000 by one bucket); floor
    on BOTH engines so the boundary can't off-by-one, the q103
    discipline; ``rest`` takes the remainder.  A new ``seed`` is a
    fresh assignment that still never splits a cluster.

    Returns (id, grp, in_cluster, split) -- one row per non-NULL id.
    Scale shape: CC is the iterative localCheckpoint loop (graph of
    NEAR-DUP PAIRS, far smaller than the corpus); the split itself is
    one broadcast-sized left join + a row-local hash, no extra
    shuffle of the corpus.
    """
    from .dedup import connected_components

    assert all(0.0 < r < 1.0 for _, r in splits)
    assert tuple(r for _, r in splits) == tuple(
        sorted(r for _, r in splits)
    ), "split rates must be cumulative ascending"
    # ``labels`` may inject a precomputed (id, component) labeling of
    # the SAME pair graph (the release-corpus lane-injection contract:
    # the caller owns the identity claim; session lanes make the CC of
    # a shared pair lane a one-per-session build instead of one per
    # consumer).  Semantics are identical by contract.
    if labels is None:
        labels = connected_components(
            pairs.select(
                F.col(a_col).alias("id_a"), F.col(b_col).alias("id_b")
            )
        )
    lab = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("grp"),
            F.col("component").isNotNull().cast("long").alias("in_cluster"),
        )
    )
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.col("grp").cast("string"), F.lit(":" + seed))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int") % buckets
    expr = None
    for name, rate in splits:
        # floor of the DECIMAL value of `rate`, computed exactly:
        # float(rate)*buckets truncates binary-float noise downward
        # (0.57*10000 = 5699.999... -> 5699, one bucket short of the
        # documented floor(rate*buckets) = 5700), so the boundary is
        # Fraction(str(rate)) -- the user's decimal literal, exact
        cut = int(Fraction(str(rate)) * buckets)
        cond = v < cut
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = expr.otherwise(rest) if expr is not None else F.lit(rest)
    return lab.withColumn("split", expr)


def water_filling_caps(
    df: DataFrame,
    key_col: str,
    mass_col: str,
    budget_num: int = 2,
    budget_den: int = 5,
) -> DataFrame:
    """Water-filling budget allocation over per-key masses: find the
    largest integer cap C such that sum(min(mass, C)) <= budget, then
    allocate min(mass, C) to every key -- the standard fair-cap answer
    to "we can afford B tokens: keep small sources whole, cap the
    giants at one common level". The mixture-planning counterpart to
    proportional_allocation (shares) and mixture_weights (ratios):
    those scale everyone; water-filling protects the tail.

    budget = (total * budget_num) div budget_den -- a fraction of the
    observed total, integer cross-multiplied (no float budget).

    Math, all BIGINT over the O(keys) mass summary: sort masses
    ascending (m_1..m_n, rank window), prefix sums P_i; for each
    boundary i in 0..n-1 the candidate cap is
    C_i = (B - P_i) div (n - i), feasible when C_i >= m_i (m_0 = 0);
    the answer is max over feasible candidates. used(C) is piecewise
    linear and nondecreasing, a candidate overshooting its own segment
    is dominated by the true segment's candidate (pinned by the
    brute-force equivalence tests), so the max IS the water-fill cap.
    Keys with mass <= C keep everything (kept_permille = 1000).

    Scale: the window runs over the KEY summary (one row per key),
    never the corpus; the corpus pass is whatever aggregate produced
    `mass_col`. A zero/negative-mass key is excluded (no tokens to
    allocate); an empty summary yields no rows.
    """
    base = df.filter(F.col(mass_col) > 0).select(
        F.col(key_col).alias("__k"), F.col(mass_col).cast("long").alias("__m")
    )
    w = Window.orderBy(F.asc("__m"), F.asc("__k"))
    ranked = base.select(
        "__k",
        "__m",
        F.row_number().over(w).cast("long").alias("__i"),
        (F.sum("__m").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )).cast("long").alias("__p"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__n"),
        F.sum("__m").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__t"),
    )
    # candidate at boundary i-1 (before row i): C = (B - P_{i-1}) div
    # (n - i + 1), feasible when C >= m_{i-1} (0 for the first row).
    cand = ranked.select(
        "__n",
        "__t",
        F.expr(
            f"(__t * {budget_num} div {budget_den} - (__p - __m)) "
            "div (__n - __i + 1)"
        ).alias("__c"),
        (F.lag("__m", 1, 0).over(w)).alias("__prev_m"),
    ).filter(F.col("__c") >= F.col("__prev_m"))
    cap = cand.agg(F.max("__c").cast("long").alias("cap"))
    return base.crossJoin(F.broadcast(cap)).select(
        F.col("__k").alias(key_col),
        F.col("__m").alias("mass"),
        "cap",
        F.least(F.col("__m"), F.col("cap")).alias("alloc"),
        F.expr("CAST(least(__m, cap) * 1000 div __m AS BIGINT)").alias(
            "kept_permille"
        ),
    )


def annealed_mixture_schedule(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    gammas: tuple[int, ...] = (0, 1, 2, 3),
    per_epoch_total: int = 10_000,
    out: str = "alloc",
) -> DataFrame:
    """Epoch-annealed mixture schedule: for each epoch e allocate
    `per_epoch_total` integer slots across groups proportionally to
    sum(weight^gamma_e) -- gamma 0 is a uniform (row-count) mixture,
    growing gammas tilt the mixture toward high-weight groups.  The
    training-schedule planner behind quality annealing (train broadly
    early, concentrate on high-quality sources late -- the data-mixing
    counterpart of learning-rate annealing).

    `weight_col` must be an INTEGER per-row weight (e.g. quality
    permille): powers are chained BIGINT multiplications, allocations
    ride `proportional_allocation`'s largest-remainder apportionment,
    so the whole schedule is integer end-to-end -- engine-exact, no
    float pow.  NULL weights contribute to the gamma-0 row count but
    drop out of weighted epochs (absence of a score is not evidence of
    quality).  BIGINT lane: sum(w^max_gamma) * per_epoch_total must fit
    -- permille weights cube to <= 1e9/row, and the allocation guard
    fails loud past the lane (pre-aggregate coarser weights at corpus
    scales that exceed it).

    Scale shape: ONE groupBy computes every epoch's weight sum in a
    single pass -- the multi-gamma aggregate is PERSISTED (dim-sized,
    |groups| rows; without the persist each epoch's allocation branch
    would column-prune its own copy of the aggregate and re-scan the
    corpus once per gamma); each epoch's allocation is a planner over
    the cached aggregate (the q195 remainder-rank window class,
    O(groups) rows).  Returns (epoch, group, weight_sum, alloc) with
    sum(alloc) == per_epoch_total per epoch exactly; `epoch` is the
    POSITION in `gammas` (== the gamma value for the default ladder),
    so duplicate or sparse gamma tuples stay well-labeled.
    """
    from ..caching import transient_persist

    w = F.col(weight_col).cast("long")
    aggs = []
    for i, g in enumerate(gammas):
        expr = F.lit(1).cast("long")
        for _ in range(g):
            expr = expr * w
        aggs.append(F.sum(expr).cast("long").alias(f"__w{i}"))
    per_group = transient_persist(df.groupBy(group_col).agg(*aggs))
    parts = []
    for i, _g in enumerate(gammas):
        counts = per_group.select(
            group_col, F.coalesce(F.col(f"__w{i}"), F.lit(0)).alias("__w")
        )
        parts.append(
            proportional_allocation(
                counts, [group_col], "__w", per_epoch_total, out=out
            )
            .withColumn("epoch", F.lit(i).cast("long"))
            .select(
                "epoch",
                group_col,
                F.col("__w").alias("weight_sum"),
                out,
            )
        )
    sched = parts[0]
    for p in parts[1:]:
        sched = sched.unionByName(p)
    return sched
