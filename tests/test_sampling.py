"""Sampling operator tests: determinism, split disjointness, rate bounds,
stratified fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.sampling import (
    deterministic_hash_sample,
    seeded_sample,
    split_train_holdout,
    stratified_sample,
)
from bankcreditunion_datapipeline_spark.sources.files import read_testdata


def test_hash_sample_deterministic_and_layout_stable(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in deterministic_hash_sample(docs, "doc_id", 0.2).select("doc_id").collect())
    # different partition layout -> identical membership
    b = sorted(
        r.doc_id
        for r in deterministic_hash_sample(docs.repartition(7), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    )
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.25 * n  # rate is approximately honored


def test_hash_sample_nested_rates(spark, sf_dir):
    # a 5% hash sample is a subset of the 20% sample (thresholds nest) --
    # lets you grow a dataset cut without resampling from scratch
    docs = read_testdata(spark, sf_dir, "documents")
    small = {r.doc_id for r in deterministic_hash_sample(docs, "doc_id", 0.05).select("doc_id").collect()}
    big = {r.doc_id for r in deterministic_hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    assert small <= big


def test_split_train_holdout_disjoint_and_complete(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id", holdout_rate=0.1)
    n_train, n_hold, n = train.count(), holdout.count(), docs.count()
    assert n_train + n_hold == n
    assert train.join(holdout, "doc_id").count() == 0
    assert 0.05 * n < n_hold < 0.15 * n


def test_seeded_and_stratified_sample(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    s1 = seeded_sample(docs, 0.3).count()
    n = docs.count()
    assert 0.2 * n < s1 < 0.4 * n
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fracs = {lang: (1.0 if i == 0 else 0.1) for i, lang in enumerate(langs)}
    strat = stratified_sample(docs, "lang", fracs)
    counts = {r.lang: r.n for r in strat.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts[langs[0]] == full[langs[0]]  # fraction 1.0 keeps every row
    for lang in langs[1:]:
        assert counts.get(lang, 0) < 0.3 * full[lang]


def test_weighted_hash_sample(spark, sf_dir):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        weighted_hash_sample,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    n = docs.count()
    # weight 1 keeps everything, weight 0 keeps nothing
    assert weighted_hash_sample(docs, "doc_id", F.lit(1.0)).count() == n
    assert weighted_hash_sample(docs, "doc_id", F.lit(0.0)).count() == 0
    # constant weight w reproduces deterministic_hash_sample(rate=w)
    flat = {r.doc_id for r in weighted_hash_sample(docs, "doc_id", F.lit(0.2)).select("doc_id").collect()}
    plain = {r.doc_id for r in deterministic_hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    assert flat == plain
    # higher weight keeps a superset of a lower weight (thresholds nest)
    w_half = {r.doc_id for r in weighted_hash_sample(docs, "doc_id", F.lit(0.5)).select("doc_id").collect()}
    assert flat <= w_half
    # row-dependent weight: kept set is exactly the per-row predicate
    weight = F.least(F.col("n_chars"), F.lit(1000)) / F.lit(1000.0)
    kept = {r.doc_id for r in weighted_hash_sample(docs, "doc_id", weight).select("doc_id").collect()}
    import hashlib
    import math

    expect = set()
    for row in docs.select("doc_id", "n_chars").collect():
        bucket = int(hashlib.md5(str(row.doc_id).encode()).hexdigest()[:4], 16) % 65536
        if bucket < math.floor(min(row.n_chars, 1000) / 1000.0 * 65536.0):
            expect.add(row.doc_id)
    assert kept == expect


def test_assign_shards_deterministic_and_writable(spark, sf_dir, tmp_path):
    import hashlib

    from bankcreditunion_datapipeline_spark.operators.sampling import assign_shards

    docs = read_testdata(spark, sf_dir, "documents")
    sharded = assign_shards(docs, "doc_id", n_shards=8)
    got = {r.doc_id: r.shard for r in sharded.select("doc_id", "shard").collect()}
    # pure function of the key: md5-bucket % 8, layout-independent
    for doc_id, shard in got.items():
        expect = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 65536 % 8
        assert shard == expect
    assert set(got.values()) <= set(range(8))
    relaid = {
        r.doc_id: r.shard
        for r in assign_shards(docs.repartition(13), "doc_id", 8)
        .select("doc_id", "shard")
        .collect()
    }
    assert relaid == got
    # the export path: partitionBy(shard) write, round-trip preserves rows
    out = str(tmp_path / "shards")
    sharded.write.partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(r.shard for r in back.select("shard").distinct().collect()) == set(
        got.values()
    )


def test_epoch_permutation_properties(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        epoch_permutation,
        mixture_weights,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = epoch_permutation(df, "doc_id", n_shards=4, seed="e1")
    rows = out.collect()
    # bijection per shard: positions are exactly 1..n_shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # layout-independent: same (shard, pos) after a repartition
    again = {
        (r.doc_id): (r.shard, r.pos)
        for r in epoch_permutation(df.repartition(7), "doc_id", 4, "e1").collect()
    }
    assert {r.doc_id: (r.shard, r.pos) for r in rows} == again
    # a new seed reshuffles order but never shard membership
    other = {r.doc_id: (r.shard, r.pos) for r in
             epoch_permutation(df, "doc_id", 4, "e2").collect()}
    assert all(other[d][0] == s for d, (s, _) in again.items())
    assert any(other[d][1] != p for d, (_, p) in again.items())

    # mixture weights: sum to ~1, small groups up-weighted vs proportional
    mix = spark.createDataFrame(
        [("big", i) for i in range(90)] + [("small", i) for i in range(10)],
        "source string, doc_id long",
    )
    w = {r.source: r.sample_weight for r in mixture_weights(mix, "source").collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-5
    assert w["small"] > 0.1  # proportional would give 0.1; sqrt flattens up


def test_pack_sequences_matches_naive_prefix_sum(spark):
    import hashlib

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        pack_sequences,
    )

    rows = [(i, (i * 37) % 200 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "doc_id", "n_tok", seq_len=256).collect()
    }

    # naive single-threaded reference: global md5 order, running sum
    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    cum = 0
    expected = {}
    for doc_id, n in order:
        expected[doc_id] = cum // 256
        cum += n
    assert got == expected

    # layout independence: different partitioning, identical assignment
    got2 = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(
            df.repartition(13), "doc_id", "n_tok", seq_len=256
        ).collect()
    }
    assert got2 == expected

    # packing is contiguous: seq ids are 0..max with no holes
    seqs = sorted(set(got.values()))
    assert seqs == list(range(len(seqs)))


def test_pack_sequences_null_tokens_count_zero(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, 5)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "doc_id", "n_tok", seq_len=8).collect()
    assert len(out) == 3  # NULL-count row still lands in a sequence


def test_weighted_sample_keys_prefers_heavy_weights(spark):
    """Efraimidis-Spirakis top-k: with 100 heavy (w=1000) and 900 light
    (w=1) rows, a 50-row sample is dominated by heavy rows
    (deterministic given the fixed hash lane); non-positive and NULL
    weights are excluded; the sample is duplicate-free."""
    from pyspark.sql import functions as F

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        weighted_sample_keys,
    )

    rows = [(i, 1000 if i < 100 else 1) for i in range(1000)]
    rows += [(2000, None), (2001, 0), (2002, -5)]
    df = spark.createDataFrame(rows, "id long, w long")
    keyed = weighted_sample_keys(df, "w", id_col="id")
    top = keyed.orderBy(F.desc("__es_key"), F.asc("id")).limit(50).collect()
    ids = [r["id"] for r in top]
    assert len(set(ids)) == 50
    assert all(i < 1000 for i in ids)
    heavy = sum(1 for i in ids if i < 100)
    assert heavy >= 45, f"only {heavy}/50 heavy rows sampled"


def test_weighted_sample_keys_requires_unique_ids(spark):
    """ADVICE r6: duplicate ids get IDENTICAL uniforms, so their
    priority keys are perfectly correlated -- the documented uniqueness
    precondition. This test pins the hazard (same id + same weight =>
    same key) and that unique ids give distinct keys."""
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        weighted_sample_keys,
    )

    dup = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (2, 10.0)], "k long, w double"
    )
    keys = [
        r["__es_key"]
        for r in weighted_sample_keys(dup, "w", id_col="k")
        .orderBy("k")
        .collect()
    ]
    assert keys[0] == keys[1], "duplicate ids must expose the correlation"
    assert keys[0] != keys[2]
    uniq = spark.createDataFrame(
        [(i, 10.0) for i in range(50)], "k long, w double"
    )
    got = [
        r["__es_key"]
        for r in weighted_sample_keys(uniq, "w", id_col="k").collect()
    ]
    assert len(set(got)) == 50


# -- greedy_coverage_picks ---------------------------------------------------


def test_greedy_coverage_hand_case(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        greedy_coverage_picks,
    )

    # doc 1 covers {a,b,c}; doc 2 covers {a,b}; doc 3 covers {d}
    # greedy: pick 1 (gain 3), then 3 (gain 1), then stop (2 adds 0)
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "d")], "doc_id long, text string"
    )
    got = [
        (r.pick, r.doc_id, r.marginal_gain)
        for r in greedy_coverage_picks(df, "doc_id", "text", k=5).collect()
    ]
    assert got == [(1, 1, 3), (2, 3, 1)]


def test_greedy_coverage_tiebreak_smallest_id(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        greedy_coverage_picks,
    )

    df = spark.createDataFrame(
        [(5, "x y"), (2, "p q")], "doc_id long, text string"
    )
    got = [
        (r.pick, r.doc_id)
        for r in greedy_coverage_picks(df, "doc_id", "text", k=1).collect()
    ]
    assert got == [(1, 2)]


def test_greedy_coverage_bigram_space(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        greedy_coverage_picks,
    )

    # same unigram vocab, different bigrams: ngram=2 distinguishes
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a b a")], "doc_id long, text string"
    )
    got = [
        (r.pick, r.doc_id, r.marginal_gain)
        for r in greedy_coverage_picks(
            df, "doc_id", "text", k=2, ngram=2
        ).collect()
    ]
    # doc 1 bigrams {a b, b a}; doc 2 {b a, a b} -- identical sets:
    # pick 1 = doc 1 (gain 2), doc 2 adds nothing
    assert got == [(1, 1, 2)]


def test_greedy_coverage_releases_caches(spark):
    """The driver-side greedy loop must not accumulate one persisted
    covered-frame per round (r8 VERDICT): after the call returns, the
    session's persistent-RDD map is back to its pre-call size."""
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        greedy_coverage_picks,
    )

    jsc = spark.sparkContext._jsc.sc()
    n0 = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "c d e f"),
            (3, "e f g h"),
            (4, "a b g h"),
        ],
        "doc_id long, text string",
    )
    out = greedy_coverage_picks(df, "doc_id", "text", k=4)
    assert out.count() >= 2
    assert jsc.getPersistentRDDs().size() == n0


def test_cluster_safe_split_planted_near_dups(spark):
    """A planted near-dup pair must land in ONE split under every seed
    (the assignment hashes the CLUSTER key), singletons keep their own
    cluster, and NULL ids drop."""
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x dup"), (3, "solo"), (4, "other"), (None, "n")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    for seed in ("split0", "split1", "epoch7"):
        rows = {
            r["id"]: r
            for r in cluster_safe_split(
                docs, pairs, "doc_id", seed=seed
            ).collect()
        }
        assert set(rows) == {1, 2, 3, 4}
        # the planted pair: same cluster (min id), same split, flagged
        assert rows[1]["grp"] == 1 and rows[2]["grp"] == 1
        assert rows[1]["split"] == rows[2]["split"]
        assert rows[1]["in_cluster"] == 1 and rows[2]["in_cluster"] == 1
        # singletons: own cluster, not flagged
        assert rows[3]["grp"] == 3 and rows[3]["in_cluster"] == 0
        assert rows[4]["grp"] == 4


def test_cluster_safe_split_transitive_chain_one_split(spark):
    """Transitivity: a chain a-b, b-c is ONE cluster even though (a, c)
    never paired directly -- all three share a split."""
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    rows = {
        r["id"]: r for r in cluster_safe_split(docs, pairs, "doc_id").collect()
    }
    assert rows[1]["grp"] == rows[2]["grp"] == rows[3]["grp"] == 1
    assert len({rows[i]["split"] for i in (1, 2, 3)}) == 1
    assert rows[4]["grp"] == rows[5]["grp"] == 4
    assert rows[4]["split"] == rows[5]["split"]


def test_cluster_safe_split_rate_validation(spark):
    import pytest

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(AssertionError, match="cumulative"):
        cluster_safe_split(
            docs, pairs, "doc_id", splits=(("a", 0.9), ("b", 0.5))
        )


def test_cluster_safe_split_exact_decimal_boundary(spark):
    """The cut point is floor of the DECIMAL rate times buckets: at
    rate 0.57 / buckets 10000 the float product is 5699.999... and a
    float floor shifts the boundary down one bucket. Every assignment
    must match a brute-force Python recompute that floors the exact
    decimal (Fraction('0.57') * 10000 = 5700)."""
    import hashlib
    from fractions import Fraction

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        cluster_safe_split,
    )

    buckets = 10000
    # 6526 and 9316 hash to bucket 5699 under seed split0 -- the exact
    # bucket a float cut (5699) excludes and the decimal cut (5700)
    # keeps in train
    ids = list(range(2000)) + [6526, 9316]
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["id"]: r["split"]
        for r in cluster_safe_split(
            docs, pairs, "doc_id",
            splits=(("train", 0.57),), rest="test", buckets=buckets,
        ).collect()
    }
    cut = int(Fraction("0.57") * buckets)
    assert cut == 5700  # int(0.57 * 10000) would be 5699
    hit_boundary = 0
    for i in ids:
        b = int(
            hashlib.md5(f"{i}:split0".encode()).hexdigest()[:4], 16
        ) % buckets
        assert got[i] == ("train" if b < cut else "test"), (i, b)
        if b == cut - 1:
            hit_boundary += 1  # a doc in the float-vs-exact gap bucket
    assert hit_boundary >= 2


# -- water_filling_caps --------------------------------------------------------


def _brute_waterfill(masses, budget):
    cap = 0
    while sum(min(m, cap + 1) for m in masses) <= budget:
        cap += 1
    return cap


def test_water_filling_hand_and_brute_equivalence(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        water_filling_caps,
    )

    cases = [
        [10, 20, 70],        # budget 40: cap 15
        [5, 5, 5],           # budget 6: cap 2
        [1, 100],            # budget 40: cap 39
        [7, 13, 13, 40, 90], # floor edges
        [3],                 # single key
        [10, 10, 10, 10, 10],
    ]
    for masses in cases:
        df = spark.createDataFrame(
            [(f"s{i}", m) for i, m in enumerate(masses)],
            "k string, m long",
        )
        out = water_filling_caps(df, "k", "m", budget_num=2, budget_den=5)
        rows = out.collect()
        budget = sum(masses) * 2 // 5
        want_cap = _brute_waterfill(masses, budget)
        assert all(r.cap == want_cap for r in rows), (masses, rows)
        assert sum(r.alloc for r in rows) <= budget
        for r in rows:
            assert r.alloc == min(r.mass, want_cap)


def test_water_filling_small_sources_kept_whole(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        water_filling_caps,
    )

    df = spark.createDataFrame(
        [("tiny", 2), ("small", 8), ("giant", 990)], "k string, m long"
    )
    rows = {r.k: r for r in water_filling_caps(df, "k", "m").collect()}
    # budget = 400: tiny+small whole, giant capped at 390
    assert rows["tiny"].kept_permille == 1000
    assert rows["small"].kept_permille == 1000
    assert rows["giant"].alloc == 390
    assert rows["giant"].cap == 390


def test_water_filling_zero_mass_excluded(spark):
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        water_filling_caps,
    )

    df = spark.createDataFrame(
        [("a", 0), ("b", 10), ("c", 10)], "k string, m long"
    )
    rows = water_filling_caps(df, "k", "m").collect()
    assert {r.k for r in rows} == {"b", "c"}


def test_annealed_mixture_schedule_hand_values(spark):
    """r14: epoch 0 allocates by row count, higher gammas tilt toward
    the high-weight group, every epoch's allocations sum exactly to the
    budget, NULL weights count rows at gamma 0 but drop from weighted
    epochs."""
    from bankcreditunion_datapipeline_spark.operators.sampling import (
        annealed_mixture_schedule,
    )

    rows = [
        ("a", 10), ("a", 10),            # high-quality source
        ("b", 1), ("b", 1), ("b", 1),    # low-quality, more rows
        ("c", None),                     # unscored row
    ]
    df = spark.createDataFrame(rows, "src string, w int")
    out = annealed_mixture_schedule(
        df, "src", "w", gammas=(0, 1, 2), per_epoch_total=100
    )
    got = {
        (r["epoch"], r["src"]): (r["weight_sum"], r["alloc"])
        for r in out.collect()
    }
    # gamma 0: row counts 2/3/1 -> Hamilton over 100
    assert got[(0, "a")][0] == 2
    assert got[(0, "b")][0] == 3
    assert got[(0, "c")][0] == 1
    # gamma 1: sums 20/3/0 (NULL drops out)
    assert got[(1, "a")] == (20, 87)   # 20*100//23 = 86, top remainder
    assert got[(1, "b")][0] == 3
    assert got[(1, "c")][0] == 0
    # gamma 2: 200/3/0 -- concentration grows with gamma
    assert got[(2, "a")][0] == 200
    for e in (0, 1, 2):
        assert sum(v[1] for (ep, _), v in got.items() if ep == e) == 100
    share_a = [got[(e, "a")][1] for e in (0, 1, 2)]
    assert share_a[0] < share_a[1] < share_a[2] or (
        share_a[0] < share_a[1] and share_a[1] <= share_a[2]
    )
