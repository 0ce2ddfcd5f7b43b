"""Property-based checks (SURVEY §5): pivot/unpivot round-trip, dedup
idempotence, union-by-name commutativity, asof self-join identity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.analytics import pivot_by_period
from bankcreditunion_datapipeline_spark.operators.conform import (
    dedup_keyed,
    union_conform,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # key
        st.sampled_from(["2020-03-31", "2020-06-30", "2020-09-30"]),  # period
        st.integers(min_value=0, max_value=1000),  # measure
    ),
    min_size=1,
    max_size=25,
)

COMMON = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**COMMON)
@given(rows=ROWS)
def test_pivot_unpivot_roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "k int, period string, v int").groupBy(
        "k", "period"
    ).agg(F.sum("v").alias("v"))
    periods = ["2020-03-31", "2020-06-30", "2020-09-30"]
    wide = pivot_by_period(df, ["k"], "period", F.first("v"), values=periods)
    melted = (
        wide.unpivot(["k"], periods, "period", "v")
        .filter(F.col("v").isNotNull())
    )
    assert sorted(map(tuple, melted.collect())) == sorted(map(tuple, df.collect()))


@settings(**COMMON)
@given(rows=ROWS)
def test_dedup_keyed_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, period string, v int")
    once = dedup_keyed(df, ["k", "period"], order_by=[F.desc("v")])
    twice = dedup_keyed(once, ["k", "period"], order_by=[F.desc("v")])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # exactly one row per key survives
    assert once.groupBy("k", "period").count().filter("count > 1").count() == 0


@settings(**COMMON)
@given(rows=ROWS)
def test_union_by_name_commutative(spark, rows):
    half = len(rows) // 2
    a = spark.createDataFrame(rows[: half + 1], "k int, period string, v int")
    # column order permuted: unionByName must align by name
    b = spark.createDataFrame(
        [(p, v, k) for k, p, v in rows[half + 1 :]] or [("2020-03-31", 0, 99)],
        "period string, v int, k int",
    )
    ab = union_conform([a, b]).select("k", "period", "v")
    ba = union_conform([b, a]).select("k", "period", "v")
    assert sorted(map(tuple, ab.collect())) == sorted(map(tuple, ba.collect()))


@given(st.text(max_size=300))
@settings(**COMMON)
def test_clean_text_idempotent(spark, s):
    from bankcreditunion_datapipeline_spark.operators.text import clean_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,)], "text string")
    once, twice = df.select(
        clean_text(F.col("text")).alias("a"),
    ).select("a", clean_text(F.col("a")).alias("b")).first()
    assert once == twice


DOC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # doc_id (dupes possible)
        st.sampled_from(["aa", "bb", "cc", "dd", None]),  # text
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@settings(**COMMON)
@given(rows=DOC_ROWS)
def test_incremental_dedup_consistent_with_one_shot(spark, rows):
    """Splitting a corpus into (index half, delta half) and deduping the
    delta against the index's digests keeps exactly the delta rows that a
    one-shot keep-min dedup over the WHOLE corpus would keep -- i.e. delta
    rows whose content never appears in the index and who are the minimal
    id for their content within the delta.  NULL-content rows are always
    kept (unknown content never merges)."""
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        content_digests,
        incremental_exact_dedup,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    index_side = df.filter(F.col("doc_id") % 2 == 0)
    delta = df.filter(F.col("doc_id") % 2 == 1)
    out = incremental_exact_dedup(
        delta, content_digests(index_side), "doc_id", "text"
    )
    got = sorted(r.doc_id for r in out.collect())

    index_texts = {r.text for r in index_side.collect() if r.text is not None}
    delta_rows = sorted(
        ((r.doc_id, r.text) for r in delta.collect()), key=lambda x: x[0]
    )
    keep, seen = [], set()
    for doc_id, text in delta_rows:
        if text is None:
            keep.append(doc_id)
        elif text not in index_texts and text not in seen:
            keep.append(doc_id)
            seen.add(text)
    assert got == sorted(keep)


@settings(**COMMON)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=20),
    budget=st.integers(min_value=1, max_value=200),
)
def test_token_budget_closed_exactly_once(spark, toks, budget):
    """The q104 selection rule (keep while the PRE-doc cumulative is under
    budget) always keeps a non-empty prefix whose total reaches or
    overshoots the budget by at most one document."""
    from pyspark.sql.window import Window

    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = df.withColumn("before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    kept = c.filter(F.col("before") < budget).collect()
    assert kept, "first doc always kept"
    total = sum(r.n_tokens for r in kept)
    last = max(kept, key=lambda r: r.doc_id)
    assert total >= min(budget, sum(toks))
    assert total - last.n_tokens < budget  # dropping the closer re-opens it


SNAPSHOT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),                   # key
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # value
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: r[0],
)


@settings(**COMMON)
@given(old_rows=SNAPSHOT_ROWS, new_rows=SNAPSHOT_ROWS)
def test_snapshot_diff_reconstructs_new(spark, old_rows, new_rows):
    """The publish guarantee: old + (added ∪ changed) - removed == new,
    for ANY pair of snapshots including NULL-valued and empty ones."""
    from bankcreditunion_datapipeline_spark.operators.temporal import snapshot_diff

    schema = "k long, v long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    diff = snapshot_diff(old, new, ["k"]).collect()
    upserts = {r.k: r.v for r in diff if r.change_type in ("added", "changed")}
    removed = {r.k for r in diff if r.change_type == "removed"}
    rebuilt = {k: v for k, v in old_rows if k not in removed}
    rebuilt.update(upserts)
    assert rebuilt == dict(new_rows)
    # and the diff is minimal: unchanged rows carry identical values
    for r in diff:
        if r.change_type == "unchanged":
            assert dict(old_rows)[r.k] == dict(new_rows)[r.k] == r.v


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(edges=EDGES)
def test_star_cc_matches_union_find(spark, edges):
    """connected_components_star agrees with a driver-side union-find on
    arbitrary random graphs (self-loops and duplicate edges included)."""
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        connected_components_star,
    )

    real = [(a, b) for a, b in edges if a != b]
    if not real:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(real, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components_star(df).collect()}
    assert got == expected


@settings(max_examples=400, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    capacity=st.integers(min_value=1, max_value=8),
)
def test_stream_summary_spacesaving_invariants(stream, capacity):
    """Drive the O(1) Stream-Summary bucket list (no Spark needed) against
    exact recounting. The linked-list eviction machinery is the kind of
    code whose bugs live on specific operation sequences -- random streams
    with tiny capacities maximize evictions, bucket splits, and unlinks."""
    from collections import Counter

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        StreamSummary,
    )

    ss = StreamSummary(capacity)
    ss.feed(stream)
    truth = Counter(stream)
    n = len(stream)

    assert len(ss.count) <= capacity
    # every offer increments exactly one counter by one (hit +1, insert
    # 0->1, evict replaces mn with mn+1) => counters always sum to n
    assert sum(ss.count.values()) == n
    # per-item soundness: est - err <= true count <= est
    for it, est in ss.count.items():
        assert est - ss.err[it] <= truth[it] <= est, (it, est, ss.err[it])
    # SpaceSaving guarantee: true count > n/capacity => tracked
    for it, c in truth.items():
        if c * capacity > n:
            assert it in ss.count, (it, c)
    # head of the bucket list is the true minimum counter
    if ss.count:
        assert ss.min_count == min(ss.count.values())
    else:
        assert ss.min_count == 0
    # structural: buckets exactly partition the tracked items and the
    # linked list walks counts in strictly increasing order
    walked = 0
    c, prev = ss.min_count, 0
    while c:
        assert c > prev
        for it in ss._bucket[c]:
            assert ss.count[it] == c
            walked += 1
        prev, c = c, ss._nxt.get(c)
    assert walked == len(ss.count)


@settings(max_examples=200, deadline=None)
@given(
    chunks=st.lists(
        st.lists(st.integers(min_value=0, max_value=12), max_size=60),
        min_size=1,
        max_size=5,
    ),
)
def test_stream_summary_batch_feed_equals_single_feed(chunks):
    """Feeding in Arrow-batch-sized chunks must equal one continuous feed
    -- the summary is a pure fold over the stream."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        StreamSummary,
    )

    a = StreamSummary(4)
    for ch in chunks:
        a.feed(ch)
    b = StreamSummary(4)
    b.feed([x for ch in chunks for x in ch])
    assert a.count == b.count and a.err == b.err
    assert a.min_count == b.min_count


# --- r4 operators: interval overlap join & global sequence packing --------

INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # key
        st.integers(min_value=0, max_value=400),  # start day offset
        st.integers(min_value=0, max_value=90),   # duration days
    ),
    min_size=1,
    max_size=20,
)


@settings(**COMMON)
@given(ivals=INTERVALS)
def test_interval_pairs_match_brute_force(spark, ivals):
    import datetime as dt
    import itertools

    from bankcreditunion_datapipeline_spark.operators.intervals import (
        overlapping_interval_pairs,
    )

    base = dt.date(2020, 1, 1)
    rows = [
        (k, i, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
        for i, (k, s, d) in enumerate(ivals)
    ]
    df = spark.createDataFrame(rows, "k long, id long, s date, e date")
    got = {
        (r["k"], r["a_id"], r["b_id"])
        for r in overlapping_interval_pairs(
            df, keys=["k"], id_cols=["id"], start_col="s", end_col="e"
        ).collect()
    }
    want = {
        (a[0], a[1], b[1])
        for a, b in itertools.combinations(rows, 2)
        if a[0] == b[0] and a[2] <= b[3] and b[2] <= a[3]
    }
    assert got == want


@settings(**COMMON)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    seq_len=st.sampled_from([64, 256, 1000]),
)
def test_pack_sequences_equals_naive_scan(spark, toks, seq_len):
    import hashlib

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        pack_sequences,
    )

    rows = list(enumerate(toks))
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "doc_id", "n_tok", seq_len=seq_len).collect()
    }
    cum = 0
    want = {}
    for doc_id, n in sorted(
        rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    ):
        want[doc_id] = cum // seq_len
        cum += n
    assert got == want


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # key
        st.integers(min_value=0, max_value=60),   # start
        st.integers(min_value=0, max_value=30),   # length
    ),
    min_size=1,
    max_size=20,
)


@settings(**COMMON)
@given(rows=INTERVALS)
def test_merge_intervals_matches_reference_sweep(spark, rows):
    """merge_intervals == the single-threaded sweep-line reference on
    arbitrary (possibly duplicated/nested/touching) intervals."""
    from bankcreditunion_datapipeline_spark.operators.intervals import (
        merge_intervals,
    )

    data = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, i long, s long, e long")
    got = sorted(
        (r["k"], r["s"], r["e"])
        for r in merge_intervals(df, ["k"], "s", "e", "i").collect()
    )

    ref = []
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, _, s, e in data:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        cur_s = cur_e = None
        for s, e in sorted(ivs):
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s > cur_e:
                ref.append((k, cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        ref.append((k, cur_s, cur_e))
    assert got == sorted(ref)


POINTS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=30,
)


@settings(**COMMON)
@given(pts=POINTS)
def test_skyline_2d_matches_brute_force(spark, pts):
    """Grid-pruned distributed skyline == O(n^2) dominance definition
    on arbitrary integer points (duplicates, ties, negatives)."""
    from bankcreditunion_datapipeline_spark.operators.analytics import (
        skyline_2d,
    )

    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())

    uniq = set(pts)
    ref = sorted(
        p
        for p in uniq
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in uniq
        )
    )
    assert got == ref


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=14),
        st.integers(min_value=1, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


@settings(**COMMON)
@given(edges=EDGES, cut=st.integers(min_value=2, max_value=13))
def test_incremental_survivors_match_monolithic(spark, edges, cut):
    """q320's dominance property on RANDOM graphs and cut points: for
    any edge set split into standing (both ends < cut) and delta (the
    rest), re-picking per-policy survivors from {standing survivors
    UNION delta endpoints} equals the monolithic pick -- including
    merges, old singletons joining through delta edges, and clusters
    untouched by the delta."""
    from bankcreditunion_datapipeline_spark.operators.dedup import (
        connected_components,
        extend_components,
        incremental_survivor_candidates,
        pick_survivors,
    )

    # deterministic attrs: quality = (7 * id) % 13 (plenty of ties ->
    # the id tiebreak decides), so argmax rarely equals min-id
    attrs = spark.createDataFrame(
        [(i, (7 * i) % 13) for i in range(1, 15)], "id long, q long"
    )
    policies = {
        "s_min": [("id", "asc")],
        "s_q": [("q", "desc"), ("id", "asc")],
    }
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    old = pairs.filter((F.col("id_a") < cut) & (F.col("id_b") < cut))
    delta = pairs.filter((F.col("id_a") >= cut) | (F.col("id_b") >= cut))

    standing = connected_components(old)
    s_old = pick_survivors(standing.join(attrs, "id"), policies)
    old_ids = s_old.select(F.col("s_min").alias("id")).unionByName(
        s_old.select(F.col("s_q").alias("id"))
    )
    labels = extend_components(standing, delta)
    cands = incremental_survivor_candidates(labels, old_ids, delta)
    got = sorted(
        map(tuple, pick_survivors(cands.join(attrs, "id"), policies).collect())
    )
    mono = pick_survivors(
        connected_components(pairs).join(attrs, "id"), policies
    )
    assert got == sorted(map(tuple, mono.collect()))


RANK_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # value (HEAVY ties)
        st.sampled_from(["x", "y", None]),        # partition key
    ),
    min_size=1,
    max_size=40,
)


@settings(**COMMON)
@given(rows=RANK_ROWS, n_tiles=st.integers(min_value=1, max_value=7))
def test_distributed_ntile_matches_window_random(spark, rows, n_tiles):
    """ranking.py two-strategies-must-agree on RANDOM frames: heavy
    ties (values 0..3, id tiebreak), NULL partition strata, N above
    and below n_tiles, remainder splits -- the distributed ntile must
    replay the window-form ntile value for value."""
    from pyspark.sql.window import Window

    from bankcreditunion_datapipeline_spark.operators.ranking import (
        distributed_ntile,
    )

    data = [(i, v, g) for i, (v, g) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long, g string")
    got = {
        (r["id"]): r["t"]
        for r in distributed_ntile(
            df,
            n_tiles,
            [("v", "desc"), ("id", "asc")],
            partition_cols=["g"],
            out_col="t",
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r["id"]): r["t"]
        for r in df.withColumn("t", F.ntile(n_tiles).over(w)).collect()
    }
    assert got == want
