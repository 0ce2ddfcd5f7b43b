"""SpaceSaving heavy hitters: guarantee + bound checks vs exact counts."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.sketches import heavy_hitters


def _zipfish_items() -> list[str]:
    # deterministic skewed stream: item i appears ~6000/i times
    items: list[str] = []
    for i in range(1, 400):
        items.extend([f"item{i:03d}"] * (6000 // i))
    # interleave deterministically so heavy items spread across partitions
    items.sort(key=lambda s: hash((s, len(items))) % 997)
    return items


def test_heavy_hitters_bounds_and_guarantee(spark):
    items = _zipfish_items()
    truth = Counter(items)
    n = len(items)
    df = spark.createDataFrame([(x,) for x in items], "token string").repartition(8)

    # k must be >= the guaranteed set (items with count > n/capacity) --
    # the SpaceSaving guarantee is about summary membership; a smaller k
    # simply truncates the ranked output below the guarantee threshold
    guaranteed = {item for item, cnt in truth.items() if cnt > n / 200}
    out = heavy_hitters(df, "token", k=60, capacity=200).collect()
    assert len(out) == 60 and len(guaranteed) <= 60
    got = {r.item for r in out}
    missing = guaranteed - got
    assert not missing, missing
    # bounds: lower <= truth <= upper for every reported item
    for r in out:
        assert r.count_lower <= truth[r.item] <= r.count_upper, r
    # the dominant item heads the ranking and its lower bound is tight
    # (count_upper may overestimate when a partition evicted+readmitted it)
    assert out[0].item == "item001"
    assert out[0].count_lower == truth["item001"]


def test_heavy_hitters_exact_when_domain_fits(spark):
    # capacity >= distinct domain -> SpaceSaving degenerates to exact counts
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 5
    df = spark.createDataFrame(rows, "token string").repartition(3)
    out = {r.item: (r.count_lower, r.count_upper)
           for r in heavy_hitters(df, "token", k=3, capacity=10).collect()}
    assert out == {"a": (7, 7), "c": (5, 5), "b": (3, 3)}


def test_heavy_hitters_adversarial_eviction_throughput(spark):
    """Every value distinct at full capacity -> EVERY row after the first
    `capacity` is an eviction, the worst case for the summary. With the
    Stream-Summary bucket list each eviction is O(1); the old min()-scan
    was O(capacity) per row, ~2e8 comparisons for this stream, minutes of
    wall time. The bound here is generous (the run takes a few seconds) so
    only a complexity regression can trip it, not machine noise."""
    import time

    n = 200_000
    df = (
        spark.range(n)
        .select(F.concat(F.lit("u"), F.col("id")).alias("token"))
        .coalesce(1)  # one partition -> one summary does ALL n evictions
    )
    t0 = time.monotonic()
    out = heavy_hitters(df, "token", k=10, capacity=1000).collect()
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"eviction path is superlinear: {elapsed:.1f}s"
    # soundness on the all-distinct stream: every true count is 1, every
    # counter overestimates by exactly its inherited error -> lower <= 1
    assert len(out) == 10
    for r in out:
        assert r.count_lower <= 1 <= r.count_upper, r


def test_heavy_hitters_eviction_linear_scaling(spark):
    """Per-row cost must not grow with rows processed: 4x the adversarial
    stream should cost ~4x, never ~16x (quadratic). Slack absorbs JVM and
    scheduling noise."""
    import time

    def run(n: int) -> float:
        df = (
            spark.range(n)
            .select(F.concat(F.lit("v"), F.col("id")).alias("token"))
            .coalesce(1)
        )
        t0 = time.monotonic()
        heavy_hitters(df, "token", k=5, capacity=1000).collect()
        return time.monotonic() - t0

    run(50_000)  # warm the codepath (JIT, Arrow init)
    t1 = min(run(50_000) for _ in range(2))
    t4 = min(run(200_000) for _ in range(2))
    assert t4 < 8 * t1 + 2.0, f"superlinear eviction: {t1:.2f}s -> {t4:.2f}s"


def test_heavy_hitters_upper_bound_sound_across_partitions(spark, tmp_path):
    """An item EVICTED from one partition's summary but heavy in another
    must still satisfy truth <= count_upper -- this needs the non-tracking
    partition's min-counter folded into the merged upper bound (a naive
    sum-of-est merge undercounts here)."""
    # parquet-backed partitions: a union of two in-memory local relations
    # collapses into ONE LocalTableScan partition, but two file scans stay
    # two splits, which is what this test needs
    spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",)], "token string"
    ).coalesce(1).write.parquet(str(tmp_path / "p0"))
    spark.createDataFrame(
        [("b",), ("b",), ("b",), ("b",)], "token string"
    ).coalesce(1).write.parquet(str(tmp_path / "p1"))
    df = spark.read.parquet(str(tmp_path / "p0")).unionAll(
        spark.read.parquet(str(tmp_path / "p1"))
    )
    assert df.rdd.getNumPartitions() == 2
    truth = {"a": 3, "b": 5, "c": 1}
    out = {r.item: r for r in heavy_hitters(df, "token", k=3, capacity=2).collect()}
    assert set(out) == {"a", "b", "c"}
    for item, cnt in truth.items():
        assert out[item].count_lower <= cnt <= out[item].count_upper, (
            item,
            cnt,
            out[item],
        )
    # 'b' was evicted from partition 1 (its summary holds a, c): the sound
    # upper bound is est_in_p2 + pmin_of_p1 = 4 + 2
    assert out["b"].count_upper == 6 and out["b"].count_lower == 4


def test_binned_quantiles_within_one_bin_width_of_exact(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        bin_counts,
        binned_quantiles,
    )

    from bankcreditunion_datapipeline_spark.sources.files import read_testdata

    orders = read_testdata(spark, "/root/testdata/sf0.001", "orders")
    width = 2000.0
    probs = [0.5, 0.9, 0.99]
    bins = bin_counts(orders, "o_totalprice", width)
    est = {r.prob: r.quantile_est
           for r in binned_quantiles(bins, width, probs).collect()}
    exact = orders.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("q")
    ).collect()[0].q
    for p, x in zip(probs, exact):
        assert abs(est[p] - x) <= width, (p, est[p], x)


def test_bin_counts_merge_losslessly_across_groups(spark):
    """The mergeability claim itself: per-year level-0 bins re-aggregated
    equal bins computed straight from raw rows."""
    from bankcreditunion_datapipeline_spark.operators.sketches import bin_counts

    from bankcreditunion_datapipeline_spark.sources.files import read_testdata

    orders = read_testdata(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "__yr", F.year(F.to_date("o_orderdate"))
    )
    lvl0 = bin_counts(orders, "o_totalprice", 500.0, "__yr")
    merged = {(r.bin): r.n for r in
              lvl0.groupBy("bin").agg(F.sum("n").alias("n")).collect()}
    direct = {(r.bin): r.n for r in
              bin_counts(orders, "o_totalprice", 500.0).collect()}
    assert merged == direct


def test_count_min_never_underestimates_and_merges(spark):
    """CM invariants: est >= true for EVERY key, exact when no bucket
    collisions, and sketches merge by element-wise counter sum
    (sketch(A) + sketch(B) == sketch(A ++ B))."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )
    from pyspark.sql import functions as F

    rows = [(f"k{i % 7}",) for i in range(70)] + [("hot",)] * 30
    df = spark.createDataFrame(rows, "k string")
    table = count_min_table(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est_n"]
        for r in count_min_estimate(table, keys, "k", depth=4, width=64).collect()
    }
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert all(est[k] >= true[k] for k in true)
    assert est["hot"] == 30  # 8 keys in 64 buckets x 4 rows: no collisions

    # merge: element-wise sum of two halves == sketch of the union
    a = spark.createDataFrame(rows[:50], "k string")
    b = spark.createDataFrame(rows[50:], "k string")
    merged = (
        count_min_table(a, "k", depth=4, width=64)
        .unionByName(count_min_table(b, "k", depth=4, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = count_min_table(df, "k", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom contract: every inserted key probes 1; the bitmap is a
    bit_or monoid (bitmap(A) | bitmap(B) == bitmap(A ++ B)); absent
    keys mostly probe 0 at this load factor."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        bloom_bitmap,
        bloom_might_contain,
    )
    from pyspark.sql import functions as F

    members = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bitmap = bloom_bitmap(members, "k", m_bits=4096, k=4)
    probes = spark.createDataFrame([(i,) for i in range(400)], "k long")
    hits = {
        r["k"]: r["bloom_hit"]
        for r in bloom_might_contain(
            probes, bitmap, "k", m_bits=4096, k=4
        ).collect()
    }
    assert all(hits[i] == 1 for i in range(200)), "false negative"
    fp = sum(hits[i] for i in range(200, 400))
    # n=200, m=4096, k=4 -> fp ~ (1-e^-0.195)^4 ~ 0.1%; 200 draws
    assert fp <= 10, f"implausible false-positive count {fp}"

    a = bloom_bitmap(members.filter(F.col("k") < 100), "k", m_bits=4096, k=4)
    b = bloom_bitmap(members.filter(F.col("k") >= 100), "k", m_bits=4096, k=4)
    merged = (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, bitmap.collect())
    )


def test_bloom_null_keys_set_no_bits(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        bloom_bitmap,
    )

    empty = spark.createDataFrame([(None,)], "k long")
    assert bloom_bitmap(empty, "k", m_bits=4096, k=4).count() == 0


# ---------------------------------------------------------------------------
# log_histogram: adaptive-range mergeable quantiles (r6 VERDICT #6)
# ---------------------------------------------------------------------------


def test_log_histogram_quantile_error_bound(spark):
    """For every probe p, the estimate must land inside the bucket
    containing the true rank statistic: |est - true| <= bucket span
    <= true/sub + 1 -- the DDSketch-style relative-error guarantee."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )

    sub = 16
    # deterministic skewed values across 5 octaves, plus zeros and ones
    vals = [0, 0, 1, 1, 2, 3] + [
        (i * 2654435761) % 1_000_000 for i in range(2_000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = log_histogram(df, "v", sub=sub)
    probs = [1, 100, 250, 500, 750, 900, 950, 990, 999, 1000]
    got = {
        r["p_permille"]: r["quantile_est"]
        for r in log_histogram_quantiles(hist, probs, sub=sub).collect()
    }
    s = sorted(vals)
    n = len(s)
    for p in probs:
        rank = max(1, -(-p * n // 1000))  # ceil(p*n/1000), the engine rule
        true = s[rank - 1]
        assert abs(got[p] - true) <= true / sub + 1, (p, got[p], true)


def test_log_histogram_merge_is_the_sum_monoid(spark):
    """Universal bucket edges: histograms of any split of the data merge
    by summing counts into exactly the full-data histogram (so
    per-partition/batch/day partials roll up associatively), and the
    quantiles extracted from the merged histogram equal the one-shot
    ones."""
    from pyspark.sql import functions as F

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )

    vals = [(i, (i * 48271) % 500_000) for i in range(3_000)]
    df = spark.createDataFrame(vals, "k long, v long")
    full = log_histogram(df, "v")
    parts = [
        log_histogram(df.filter(F.col("k") % 3 == r), "v") for r in range(3)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("lbin")
        .agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # associativity: ((a+b)+c) == (a+(b+c)) == full -- trivially true for
    # a sum, pinned here against accidental edge-dependence creeping in
    ab = (
        parts[0].unionByName(parts[1]).groupBy("lbin").agg(F.sum("n").alias("n"))
    )
    abc = ab.unionByName(parts[2]).groupBy("lbin").agg(F.sum("n").alias("n"))
    assert sorted(map(tuple, abc.collect())) == sorted(
        map(tuple, full.collect())
    )
    probs = [500, 950]
    q_full = sorted(
        map(tuple, log_histogram_quantiles(full, probs).collect())
    )
    q_merged = sorted(
        map(tuple, log_histogram_quantiles(merged, probs).collect())
    )
    assert q_full == q_merged


def test_log_histogram_overflow_guard_fails_loud(spark):
    """Values past 2^60 must raise the rescale error, not wrap."""
    import pytest

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
    )

    df = spark.createDataFrame([(1 << 61,)], "v long")
    with pytest.raises(Exception, match="rescale"):
        log_histogram(df, "v").collect()


def test_log_histogram_grouped_quantiles_match_per_group_runs(spark):
    """r7 VERDICT #3: grouped extraction must equal running the global
    extractor on each group's own histogram -- and per-group merge (sum
    of split histograms) must reproduce the full-build quantiles."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )

    rows = [
        (("a" if i % 3 else "b"), i % 7, (i * i * 131) % 100_000 + 1)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, half int, v long")
    probs = [250, 500, 950, 990]

    hist = log_histogram(df, "v", group_cols=("g",))
    grouped = {
        (r["g"], r["p_permille"]): r["quantile_est"]
        for r in log_histogram_quantiles(
            hist, probs, group_cols=("g",)
        ).collect()
    }
    for g in ("a", "b"):
        solo = log_histogram(df.filter(F.col("g") == g), "v")
        for r in log_histogram_quantiles(solo, probs).collect():
            assert grouped[(g, r["p_permille"])] == r["quantile_est"]

    # mergeability survives grouping: sum the per-half histograms, then
    # extract per group -- must equal the one-shot build
    parts = [
        log_histogram(df.filter(F.col("half") == h), "v", group_cols=("g",))
        for h in range(7)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .unionByName(parts[3])
        .unionByName(parts[4])
        .unionByName(parts[5])
        .unionByName(parts[6])
        .groupBy("g", "lbin")
        .agg(F.sum("n").alias("n"))
    )
    via_merge = {
        (r["g"], r["p_permille"]): r["quantile_est"]
        for r in log_histogram_quantiles(
            merged, probs, group_cols=("g",)
        ).collect()
    }
    assert via_merge == grouped


def test_log_histogram_quantiles_fails_loud_on_unnamed_groups(spark):
    """ADVICE r7 (low): a grouped histogram fed to the extractor without
    group_cols must raise, not silently collapse groups into one global
    quantile set."""
    import pytest

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 9), ("b", 700)], "g string, v long"
    )
    hist = log_histogram(df, "v", group_cols=("g",))
    with pytest.raises(ValueError, match="group columns \\['g'\\]"):
        log_histogram_quantiles(hist, [500])


def test_log_histogram_negative_fails_loud(spark):
    """ADVICE r7 (low): negatives have no log bucket (Spark conv() reads
    them as unsigned 64-bit, silently diverging from the oracle's bin())
    -- the build must raise, matching the upper-bound guard."""
    import pytest

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
    )

    df = spark.createDataFrame([(3,), (-1,)], "v long")
    with pytest.raises(Exception, match="non-negative"):
        log_histogram(df, "v").collect()


def test_log_histogram_quantiles_interpolation_is_overflow_safe(spark):
    """A heavy top-octave bucket: (rank - cum_prev) * span overflows
    BIGINT in the naive interpolation (wrapping silently on Spark,
    erroring on DuckDB); the divide-first split a*(span div n) +
    (a*(span mod n)) div n is exact and bounded.  300 identical values
    just above 2^59 put span ~ 2^55 and a up to ~297: naive a*span ~
    1.07e19 > BIGINT max."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )

    v = (1 << 59) + 5
    df = spark.createDataFrame([(v,)] * 300, "v long")
    hist = log_histogram(df, "v")
    [row] = log_histogram_quantiles(hist, [990]).collect()
    # replay the integer arithmetic in unbounded-python: one bucket,
    # n=300, total=300, rank=ceil(.99*300)=297, a=297
    sub = 16
    e = 59
    w = ((1 << e) + sub - 1) // sub
    s = (v - (1 << e)) // w
    lb = (1 << e) + s * w
    ub = min((1 << e) + (s + 1) * w, 1 << (e + 1))
    span = ub - lb
    expect = lb + 297 * (span // 300) + (297 * (span % 300)) // 300
    assert row["quantile_est"] == expect
    assert lb <= row["quantile_est"] < ub


# -- histogram_intersection_permille ------------------------------------------


def test_histogram_intersection_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        histogram_intersection_permille,
    )

    # group a: bins {1: 3, 2: 1}; group b: bins {1: 1, 2: 1, 3: 2}
    # shares a: {1: 750, 2: 250}; b: {1: 250, 2: 250, 3: 500}
    # sim = min(750,250) + min(250,250) = 500; bin 3 missing in a -> 0
    hist = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 1), ("b", 1, 1), ("b", 2, 1), ("b", 3, 2)],
        "g string, lbin long, n long",
    )
    got = histogram_intersection_permille(hist, "g").collect()
    assert [(r.group_a, r.group_b, r.sim_permille) for r in got] == [
        ("a", "b", 500)
    ]


def test_histogram_intersection_identical_groups_near_1000(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        histogram_intersection_permille,
    )

    hist = spark.createDataFrame(
        [("a", 1, 2), ("a", 2, 2), ("b", 1, 2), ("b", 2, 2)],
        "g string, lbin long, n long",
    )
    got = histogram_intersection_permille(hist, "g").collect()
    assert got[0].sim_permille == 1000


# -- weighted_quantiles_exact ---------------------------------------------------


def test_weighted_quantiles_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        weighted_quantiles_exact,
    )

    # values 1 (w=1), 2 (w=1), 100 (w=8): W=10.
    # p500 -> rank ceil(5)=5 -> cum: 1:1, 2:2, 100:10 -> 100
    # p200 -> rank 2 -> value 2; p100 -> rank 1 -> value 1
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (100, 8)], "v long, w long"
    )
    rows = {
        r.p_permille: r.quantile
        for r in weighted_quantiles_exact(
            df, "v", "w", [100, 200, 500, 1000]
        ).collect()
    }
    assert rows == {100: 1, 200: 2, 500: 100, 1000: 100}


def test_weighted_quantiles_grouped_and_filters(spark):
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        weighted_quantiles_exact,
    )

    df = spark.createDataFrame(
        [
            ("a", 10, 1), ("a", 20, 3),
            ("b", 5, 2), ("b", 7, 0), ("b", None, 5), ("b", 9, None),
        ],
        "g string, v long, w long",
    )
    rows = {
        (r.g, r.p_permille): r.quantile
        for r in weighted_quantiles_exact(
            df, "v", "w", [500], group_cols=("g",)
        ).collect()
    }
    # a: W=4, rank 2 -> 20; b: only (5, w=2) survives -> 5
    assert rows == {("a", 500): 20, ("b", 500): 5}
