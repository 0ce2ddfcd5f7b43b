"""plans/release.py: the end-to-end corpus-release composition.

The graded q332 checks the WHOLE manifest against the DuckDB oracle at
sf0.01; these tests pin the semantics the manifest alone can't see --
keep-policy survivor identity, cluster-level split leakage, optional
stages, manifest internal consistency, write layout, determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bankcreditunion_datapipeline_spark.plans.release import release_corpus

SCHEMA = "doc_id long, source string, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _corpus(spark):
    """Synthetic corpus with a known near-dup cluster: docs 1/2/3 share
    almost all shingles (3 is longest -> keep-policy survivor), doc 4
    is unrelated, doc 5 is an exact duplicate of doc 4 (higher id ->
    dropped at exact dedup), docs 6..25 are distinct filler so gates
    and budgets have mass."""
    t = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single morning"
    )
    rows = [
        (1, "a", t),
        (2, "a", t + " indeed"),
        (3, "a", t + " indeed truly and verily again"),
        (4, "b", "completely different content about spark engines and "
                  "distributed shuffle exchanges running at large scale"),
        (5, "b", "completely different content about spark engines and "
                  "distributed shuffle exchanges running at large scale"),
    ]
    for i in range(6, 26):
        rows.append(
            (
                i,
                "a" if i % 2 else "b",
                f"unique document number {i} holds words w{i}a w{i}b "
                f"w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h w{i}i w{i}j "
                f"w{i}k w{i}l w{i}m w{i}n w{i}o w{i}p",
            )
        )
    return _docs(spark, rows)


def test_release_funnel_monotone_and_manifest_consistent(spark):
    res = release_corpus(
        _corpus(spark),
        min_quality=0.0,
        length_quantile=1.0,
        near_dup_hash="md5",
        near_dup_threshold=0.5,
        total_token_budget=100000,
        n_shards=2,
    )
    f = res.funnel
    chain = ["input", "lang_gate", "quality_gate", "length_gate",
             "exact_dedup", "near_dedup", "budget_cut"]
    for a, b in zip(chain, chain[1:]):
        assert f[a][0] >= f[b][0], (a, b, f)
        assert f[a][1] >= f[b][1], (a, b, f)
    # split partitions the last pre-split stage exactly
    assert f["holdout"][0] + f["train"][0] == f["budget_cut"][0]
    assert f["holdout"][1] + f["train"][1] == f["budget_cut"][1]
    # shard rows partition train exactly
    rows = {r["stage"]: (r["n_docs"], r["n_tokens"])
            for r in res.manifest.collect()}
    shard_n = sum(v[0] for k, v in rows.items() if k.startswith("shard_"))
    shard_t = sum(v[1] for k, v in rows.items() if k.startswith("shard_"))
    assert (shard_n, shard_t) == f["train"]
    # manifest rows mirror the funnel dict
    for k, v in f.items():
        assert rows[k] == v
    # optional stages absent when not configured
    assert "semantic_dedup" not in rows and "contamination_gate" not in rows
    # train/holdout DataFrames agree with the manifest
    assert res.holdout.count() == f["holdout"][0]
    assert res.train.count() == f["train"][0]


def test_release_keep_policy_survivor_and_exact_dedup(spark):
    res = release_corpus(
        _corpus(spark),
        min_quality=0.0,
        length_quantile=1.0,
        near_dup_hash="md5",
        near_dup_threshold=0.5,
    )
    kept = {
        r["doc_id"]
        for r in res.train.select("doc_id")
        .unionByName(res.holdout.select("doc_id"))
        .collect()
    }
    # near-dup cluster {1,2,3}: keep policy = longest text -> 3 survives
    assert 3 in kept and 1 not in kept and 2 not in kept
    # exact-dup pair {4,5}: min id survives
    assert 4 in kept and 5 not in kept
    assert res.funnel["exact_dedup"][0] == res.funnel["length_gate"][0] - 1


def test_release_split_is_cluster_hashed_and_deterministic(spark):
    docs = _corpus(spark)
    r1 = release_corpus(docs, min_quality=0.0, length_quantile=1.0,
                        near_dup_hash="md5", near_dup_threshold=0.5)
    r2 = release_corpus(docs, min_quality=0.0, length_quantile=1.0,
                        near_dup_hash="md5", near_dup_threshold=0.5)
    ids1 = sorted(r["doc_id"] for r in r1.holdout.collect())
    ids2 = sorted(r["doc_id"] for r in r2.holdout.collect())
    assert ids1 == ids2  # split is a pure function of the corpus
    # the cluster {1,2,3} survivor (doc 3) is hashed by its CLUSTER
    # label (min member id = 1), not its own id: recompute both buckets
    # and confirm the side matches the label hash
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        hash_bucket,
    )

    b = spark.range(1).select(
        hash_bucket(F.lit(1)).alias("grp_b"),
        hash_bucket(F.lit(3)).alias("own_b"),
    ).first()
    side_is_holdout = 3 in {r["doc_id"] for r in r1.holdout.collect()}
    thr = int(0.05 * 65536)
    assert side_is_holdout == (b["grp_b"] < thr)


def test_release_contamination_gate_rejects_benchmark_overlap(spark):
    docs = _corpus(spark)
    # benchmark = doc 4's text: doc 4 shares 100% of its 5-grams and
    # must be rejected; short/no-gram docs are kept (no evidence)
    bench = _docs(
        spark,
        [(999, "x", "completely different content about spark engines and "
                     "distributed shuffle exchanges running at large scale")],
    )
    res = release_corpus(
        docs, benchmark=bench, min_quality=0.0, length_quantile=1.0,
        near_dup_hash="md5", near_dup_threshold=0.5
    )
    kept = {
        r["doc_id"]
        for r in res.train.select("doc_id")
        .unionByName(res.holdout.select("doc_id"))
        .collect()
    }
    assert 4 not in kept
    assert res.funnel["contamination_gate"][0] == res.funnel["near_dedup"][0] - 1


def test_release_semantic_stage_and_skip_behaviour(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "a", "one two three four five six seven eight nine ten "
                      "eleven twelve"),
            (3, "b", "red orange yellow green blue indigo violet colors"),
        ],
    )
    # vectors: 1 and 2 identical direction (cosine 1.0) in one block;
    # 3 orthogonal. Survivor of {1,2} = longer text (doc 2).
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [2.0, 0.0], 0),
            (3, [0.0, 1.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    res = release_corpus(
        docs, embeddings=emb, min_quality=0.0, length_quantile=1.0,
        near_dup_hash="md5", semantic_threshold=0.95
    )
    kept = {
        r["doc_id"]
        for r in res.train.select("doc_id")
        .unionByName(res.holdout.select("doc_id"))
        .collect()
    }
    assert 2 in kept and 1 not in kept and 3 in kept
    assert res.funnel["semantic_dedup"][0] == res.funnel["near_dedup"][0] - 1
    # doc WITHOUT an embedding row survives the stage (no evidence)
    res2 = release_corpus(
        docs,
        embeddings=emb.filter(F.col("vec_id") != 3),
        min_quality=0.0,
        length_quantile=1.0,
        near_dup_hash="md5",
        semantic_threshold=0.95,
    )
    kept2 = {
        r["doc_id"]
        for r in res2.train.select("doc_id")
        .unionByName(res2.holdout.select("doc_id"))
        .collect()
    }
    assert 3 in kept2


def test_release_write_layout(spark, tmp_path):
    out = str(tmp_path / "shards")
    res = release_corpus(
        _corpus(spark),
        min_quality=0.0,
        length_quantile=1.0,
        near_dup_hash="md5",
        n_shards=2,
        out_dir=out,
    )
    back = spark.read.parquet(out)
    assert "pos" in back.columns
    assert back.count() == res.funnel["train"][0]
    assert sorted(
        r["shard"] for r in back.select("shard").distinct().collect()
    ) == sorted(
        int(k.split("_")[1])
        for k in {
            r["stage"]
            for r in res.manifest.collect()
            if r["stage"].startswith("shard_")
        }
    )
    # reproducible epoch order: pos is dense 1..n per shard
    per = back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("m"),
        F.min("pos").alias("lo"),
    )
    for r in per.collect():
        assert r["lo"] == 1 and r["m"] == r["n"]


def test_streaming_release_twin_equals_batch(spark, tmp_path):
    """The full release twin: fold document file batches keeping only
    narrow state (meta + signature index + pair log), then extract the
    manifest -- must equal release_corpus over the union corpus, row
    for row, with every optional stage ON (semantic via embeddings,
    contamination vs a fixed benchmark, mixture budget); a redelivered
    batch (checkpoint wiped) must not change the state."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_release_ingest,
        streaming_release_manifest,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    all_rows = [tuple(r) for r in _corpus(spark).collect()]
    bench = _docs(
        spark,
        [(999, "x", "completely different content about spark engines and "
                     "distributed shuffle exchanges running at large scale")],
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0) + 1.0, float(i % 2)], i % 2)
         for i in range(1, 26)],
        "vec_id long, embedding array<float>, label int",
    )
    kw = dict(min_quality=0.0, near_dup_threshold=0.5)

    def write_wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_release_ingest(
            spark, src, ckpt, schema, state, benchmark=bench, **kw
        )

    def extract():
        return sorted(
            map(
                tuple,
                streaming_release_manifest(
                    spark,
                    state,
                    embeddings=emb,
                    contamination=True,
                    total_token_budget=200,
                    n_shards=2,
                ).collect(),
            )
        )

    write_wave(all_rows[:9])
    run()
    first = extract()
    shutil.rmtree(ckpt)
    run()  # redelivery of batch 0: state must be unchanged
    assert extract() == first

    write_wave(all_rows[9:17])
    run()
    write_wave(all_rows[17:])
    run()

    got = extract()
    from bankcreditunion_datapipeline_spark.plans.release import (
        release_corpus,
    )

    res = release_corpus(
        _docs(spark, all_rows),
        benchmark=bench,
        embeddings=emb,
        total_token_budget=200,
        n_shards=2,
        **kw,
    )
    want = sorted(map(tuple, res.manifest.collect()))
    assert got == want


def test_cached_pair_lane_identity_and_keying(spark, sf_dir):
    """_cached_lane returns the SAME persisted frame for the same
    (application, dir, name) key -- the audit family shares one
    materialization -- and a different dir is a different key (the fuzz
    harness builds variants into fresh dirs, so mutated corpora can
    never hit a stale lane)."""
    import bankcreditunion_datapipeline_spark.queries as Q

    a = Q._q21_pair_lane(spark, sf_dir)
    b = Q._q21_pair_lane(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory  # persisted once, shared
    # same dir through a symlink-free rename of the path string still
    # hits (realpath-keyed)
    c = Q._q21_pair_lane(spark, sf_dir + "/")
    assert c is a
    # and the lane IS the graded q21 result
    from bankcreditunion_datapipeline_spark.queries import registry

    q21 = registry()["q21_minhash_near_dups"].spark_fn(spark, sf_dir)
    assert q21 is a


def test_prefix_lane_shared_and_equals_direct_build(spark, sf_dir):
    """The r12 extension of the lane cache: q179's exact-Jaccard prefix
    lane is one materialization shared by q179/q231/q236/q243/q283/q320,
    and its rows equal a fresh direct prefix_filtered_jaccard_pairs
    build at the same (shingle, threshold) -- including under q283's
    historical looser 50M pair budget (the budget is fail-loud, never a
    truncation, so a 20M-passing lane is row-identical at 50M)."""
    import bankcreditunion_datapipeline_spark.queries as Q
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )
    from bankcreditunion_datapipeline_spark.queries import registry, t

    lane = Q._q179_prefix_lane(spark, sf_dir)
    assert lane is Q._q179_prefix_lane(spark, sf_dir)
    assert lane.storageLevel.useMemory
    assert registry()["q179_prefix_jaccard_pairs"].spark_fn(
        spark, sf_dir
    ) is lane
    direct = prefix_filtered_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        threshold_permille=Q._Q179_T,
        shingle=Q._Q179_SHINGLE,
        max_pair_rows=50_000_000,
    )
    got = sorted(map(tuple, lane.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want and len(got) > 0


def test_budget_cut_equals_window_form_under_source_skew(spark):
    # r13 (VERDICT r12 #2): the budget cut rides distributed_cumsum
    # bucketed WITHIN each source. Two-strategies-must-agree against the
    # naive per-source window form on a skewed corpus (one source holds
    # ~90% of docs -- the shape that single-tasks the window at scale).
    from pyspark.sql.window import Window

    from bankcreditunion_datapipeline_spark.plans.release import _budget_cut

    rows = [(i, "crawl" if i % 10 else "books", (i % 7) + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, source string, nt long")
    weights = spark.createDataFrame(
        [("crawl", 60), ("books", 25)], "source string, __budget long"
    )
    got = sorted(
        r["doc_id"]
        for r in _budget_cut(df, weights, "source", "doc_id", "nt").collect()
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        r["doc_id"]
        for r in df.withColumn("__before", F.sum("nt").over(w) - F.col("nt"))
        .join(F.broadcast(weights), "source")
        .filter(F.col("__before") < F.col("__budget"))
        .collect()
    )
    assert got == want and len(got) > 0


def test_release_unbudgeted_keepall_configuration(spark):
    # the q333 configuration's branch semantics at unit scale: no
    # benchmark -> no contamination_gate row; no budget -> no budget_cut
    # row; a 1.01-impossible near threshold -> empty pair lane -> the
    # near stage keeps ALL exact survivors (the fast path).
    res = release_corpus(
        _corpus(spark),
        benchmark=None,
        embeddings=None,
        near_dup_threshold=0.99,
        total_token_budget=None,
    )
    stages = {r["stage"] for r in res.manifest.collect()}
    assert "contamination_gate" not in stages
    assert "budget_cut" not in stages
    f = res.funnel
    assert f["near_dedup"][0] <= f["exact_dedup"][0]
    assert f["holdout"][0] + f["train"][0] == f["near_dedup"][0]


def test_streaming_release_twin_equals_batch_unbudgeted(spark, tmp_path):
    """The q333 configuration's twin: no benchmark at ingest (no gram
    state), extraction with contamination=False and no token budget --
    the folded-state manifest must still equal release_corpus row for
    row through the skipped-stage branches."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_release_ingest,
        streaming_release_manifest,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0) + 1.0, float(i % 2)], i % 2)
         for i in range(1, 26)],
        "vec_id long, embedding array<float>, label int",
    )
    kw = dict(min_quality=0.0, near_dup_threshold=0.5)
    _corpus(spark).coalesce(1).write.mode("append").parquet(src)
    streaming_release_ingest(
        spark, src, str(tmp_path / "ckpt"), schema,
        str(tmp_path / "state"), benchmark=None, **kw
    )
    got = sorted(
        map(
            tuple,
            streaming_release_manifest(
                spark,
                str(tmp_path / "state"),
                embeddings=emb,
                contamination=False,
                total_token_budget=None,
                n_shards=2,
            ).collect(),
        )
    )
    res = release_corpus(
        _corpus(spark),
        benchmark=None,
        embeddings=emb,
        total_token_budget=None,
        n_shards=2,
        **kw,
    )
    want = sorted(map(tuple, res.manifest.collect()))
    assert got == want
    stages = {r[0] for r in got}
    assert "contamination_gate" not in stages and "budget_cut" not in stages


def test_injected_lane_threshold_contract_fails_loud(spark):
    """r14 review: an injected pair lane must carry its build cut, and a
    configuration whose threshold is LOOSER than the lane's cut must
    raise -- a 0.7-cut lane simply does not contain the [0.6, 0.7)
    pairs a 0.6 configuration needs, and silently missing them would
    corrupt the graded manifest (the r13 ADVICE #3 desync class)."""
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
        semantic_dedup_pairs,
    )

    docs = _corpus(spark)
    lane = minhash_near_dup_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.7
    )
    # missing build cut -> raise
    with pytest.raises(ValueError, match="near_pairs_lane_threshold"):
        release_corpus(docs, near_pairs=lane)
    # missing family -> raise (the band/hash identity, not just the cut)
    with pytest.raises(ValueError, match="near_pairs_lane_family"):
        release_corpus(
            docs, near_pairs=lane, near_pairs_lane_threshold=0.7
        )
    # family mismatch -> raise (an md5 16x8 lane is not the xxhash64
    # candidate set the configuration would build inline)
    with pytest.raises(ValueError, match="family"):
        release_corpus(
            docs,
            near_pairs=lane,
            near_pairs_lane_threshold=0.7,
            near_pairs_lane_family=("md5", 16, 8),
            near_dup_threshold=0.7,
        )
    # configuration looser than the lane's cut -> raise
    with pytest.raises(ValueError, match="below the"):
        release_corpus(
            docs,
            near_pairs=lane,
            near_pairs_lane_threshold=0.7,
            near_pairs_lane_family=("xxhash64", 16, 8),
            near_dup_threshold=0.6,
        )
    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 2)], 0) for i in range(1, 26)],
        "vec_id long, embedding array<float>, label int",
    )
    sem = semantic_dedup_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        cluster_col="label", threshold=0.35,
    )
    with pytest.raises(ValueError, match="sem_pairs_lane_threshold"):
        release_corpus(docs, embeddings=emb, sem_pairs=sem)
    with pytest.raises(ValueError, match="below the"):
        release_corpus(
            docs,
            embeddings=emb,
            sem_pairs=sem,
            sem_pairs_lane_threshold=0.35,
            semantic_threshold=0.2,
        )


def test_loose_sem_lane_refiltered_equals_direct_tight_build(spark):
    """A sem lane built at a LOOSE cut and refiltered by release_corpus
    at a tighter configuration threshold must yield the same manifest
    as the direct inline build at that threshold: cosine_sim is stored
    1e-6-rounded, so `cosine_sim >= t` on the lane is the identical
    predicate semantic_dedup_pairs applies internally."""
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    docs = _corpus(spark)
    # embeddings engineered for a cosine spread: some pairs above 0.9,
    # some between 0.5 and 0.9, all within one block
    emb = spark.createDataFrame(
        [(i, [1.0, 0.5 * (i % 5)], 0) for i in range(1, 26)],
        "vec_id long, embedding array<float>, label int",
    )
    lane = semantic_dedup_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        cluster_col="label", threshold=0.5,
    )
    kw = dict(min_quality=0.0, near_dup_threshold=0.99)
    via_lane = release_corpus(
        docs,
        embeddings=emb,
        sem_pairs=lane,
        sem_pairs_lane_threshold=0.5,
        semantic_threshold=0.9,
        **kw,
    ).manifest
    direct = release_corpus(
        docs, embeddings=emb, semantic_threshold=0.9, **kw
    ).manifest
    got = sorted(map(tuple, via_lane.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want
    # the spread is real: the loose lane carries pairs the tight
    # configuration must drop
    n_loose = lane.count()
    n_tight = lane.filter(F.col("cosine_sim") >= 0.9).count()
    assert n_loose > n_tight > 0
