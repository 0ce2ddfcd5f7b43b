"""Integer PageRank (operators/graph.py): hand-replayed recurrence,
layout independence, and symmetry sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.graph import (
    SCALE,
    pagerank_integer,
)


def _hand_pagerank(edges, iterations, num=85, den=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    base = SCALE // n
    tele = ((den - num) * base) // den
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: base for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for u, v in edges:
            inflow[v] += r[u] // out[u]
        r = {v: tele + (num * inflow[v]) // den for v in nodes}
    return r


def test_pagerank_matches_hand_recurrence(spark):
    raw = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_integer(df, iterations=4).collect()}
    want = _hand_pagerank(raw, 4)
    assert got == want
    # integer teleport floor: total mass stays under SCALE, above 90% of it
    assert 0.9 * SCALE < sum(got.values()) <= SCALE


def test_pagerank_layout_independent_and_hub_ranks_highest(spark):
    # star: hub 0 <-> spokes 1..6; hub must outrank every spoke
    raw = []
    for s in range(1, 7):
        raw += [(0, s), (s, 0)]
    df = spark.createDataFrame(raw, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank_integer(df, iterations=5).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            df.repartition(13).orderBy(F.desc("dst")), iterations=5
        ).collect()
    }
    assert a == b  # pure integer arithmetic: no layout to diverge on
    assert all(a[0] > a[s] for s in range(1, 7))
    # spokes are symmetric -> identical ranks
    assert len({a[s] for s in range(1, 7)}) == 1


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge: 4 nodes, 5 edges, 2 triangles; wedges from
    degrees (3,3,2,2): 3+3+1+1 = 8; transitivity = 6/8 = 0.75."""
    from bankcreditunion_datapipeline_spark.operators.graph import (
        triangle_count,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "id_a long, id_b long"
    )
    r = triangle_count(pairs).first()
    assert (
        r["n_nodes"],
        r["n_edges"],
        r["n_wedges"],
        r["n_triangles"],
        r["transitivity_t"],
    ) == (4, 5, 8, 2, 0.75)

    # duplicate/reversed pairs collapse; hub star has zero triangles
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(3, 0), (4, 0)], "id_a long, id_b long"
    )
    s = triangle_count(star).first()
    assert s["n_edges"] == 5 and s["n_triangles"] == 0 and s["transitivity_t"] == 0.0


def _hand_pagerank_weighted(edges, iterations, num=85, den=100):
    # edges: [(u, v, w)]; contrib = (r(u) * w) // W(u), W = total out-weight
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    base = SCALE // n
    tele = ((den - num) * base) // den
    W = {}
    for u, _, w in edges:
        W[u] = W.get(u, 0) + w
    r = {v: base for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for u, v, w in edges:
            inflow[v] += (r[u] * w) // W[u]
        r = {v: tele + (num * inflow[v]) // den for v in nodes}
    return r


def test_pagerank_weighted_matches_hand_and_flips_top_rank(spark):
    """Weighted recurrence is exactly the hand-replayed integer math, and
    on a graph where one edge carries 20x the volume the top-ranked node
    FLIPS versus the unweighted run -- weighting is load-bearing, not
    cosmetic. Duplicate (src, dst) edges merge by summing weights."""
    raw = [(1, 2, 1), (2, 1, 1), (3, 1, 1), (4, 1, 1), (1, 3, 20), (3, 4, 1), (4, 3, 1)]
    df = spark.createDataFrame(raw, "src long, dst long, w long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(df, iterations=5, weight_col="w").collect()
    }
    assert got == _hand_pagerank_weighted(raw, 5)
    unw = {
        r["node"]: r["rank"] for r in pagerank_integer(df, iterations=5).collect()
    }
    assert max(unw, key=unw.get) == 1 and max(got, key=got.get) == 3

    # duplicate-edge weight merge: splitting the w=20 edge into 8+12
    # must produce identical ranks
    split = [e for e in raw if e != (1, 3, 20)] + [(1, 3, 8), (1, 3, 12)]
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            spark.createDataFrame(split, "src long, dst long, w long"),
            iterations=5,
            weight_col="w",
        ).collect()
    }
    assert got2 == got


def test_pagerank_empty_graph_returns_empty_frame(spark):
    """A filter matching no edges must yield an empty (node, rank) frame,
    not a ZeroDivisionError (ADVICE r5)."""
    df = spark.createDataFrame([(1, 2)], "src long, dst long").filter(
        F.col("src") > 100
    )
    out = pagerank_integer(df, iterations=3)
    assert out.columns == ["node", "rank"] and out.count() == 0


def test_pagerank_weight_overflow_guard(spark):
    """Weights that could overflow rank * w in BIGINT raise loudly."""
    import pytest

    df = spark.createDataFrame(
        [(1, 2, 10_000_000), (2, 1, 1)], "src long, dst long, w long"
    )
    with pytest.raises(ValueError, match="overflow"):
        pagerank_integer(df, iterations=1, weight_col="w")


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge resolve to two
    communities labeled by each clique's min node id; empty graph
    yields an empty frame; results survive repartitioning."""
    from bankcreditunion_datapipeline_spark.operators.graph import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10), (10, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(df, 3).collect()}
    assert {out[n] for n in (1, 2, 3)} == {1}
    assert {out[n] for n in (11, 12, 13)} == {10}
    # the two communities stay distinct (the bridge does not merge them)
    assert out[1] != out[11]

    relaid = {
        r["node"]: r["label"]
        for r in label_propagation(df.repartition(7, "dst"), 3).collect()
    }
    assert relaid == out

    empty = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(empty, 2).count() == 0


def test_k_core_peels_cascade(spark):
    """Hand graph: a 4-clique {1,2,3,4} with a pendant chain 4-5-6.
    k=3 keeps exactly the clique (degrees 3); the chain peels over
    CASCADING rounds (6 falls first, then 5) -- the fixpoint loop, not
    a single degree filter. k=2 keeps clique+5? no: 5's only survivor
    link is 4, so 5 peels at k=2 too once 6 is gone."""
    from bankcreditunion_datapipeline_spark.operators.graph import k_core

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(sym, "src long, dst long")

    core3 = {r["node"]: r["degree"] for r in k_core(e, 3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}

    core2 = {r["node"]: r["degree"] for r in k_core(e, 2).collect()}
    assert core2 == {1: 3, 2: 3, 3: 3, 4: 3}

    # single degree filter would KEEP 5 at k=2 (deg 2 initially);
    # the cascade must remove it -- asserted above by absence
    core1 = {r["node"]: r["degree"] for r in k_core(e, 1).collect()}
    assert core1 == {1: 3, 2: 3, 3: 3, 4: 4, 5: 2, 6: 1}


def test_k_core_empty_and_overdeep(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import k_core

    empty = spark.createDataFrame([], "src long, dst long")
    assert k_core(empty, 2).count() == 0
    tri = [(1, 2), (2, 3), (3, 1)]
    e = spark.createDataFrame(
        tri + [(b, a) for a, b in tri], "src long, dst long"
    )
    # k above the max degree peels everything
    assert k_core(e, 3).count() == 0
    # self-loops must not let a vertex count itself toward k
    loop = spark.createDataFrame(
        [(9, 9), (1, 2), (2, 1)], "src long, dst long"
    )
    assert {r["node"] for r in k_core(loop, 1).collect()} == {1, 2}


# -- hits_scores -------------------------------------------------------------


def test_hits_hand_graph(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import hits_scores

    # bipartite: c1 -> {p1, p2}, c2 -> {p1}, c3 -> {p1}
    # a1: p1=3, p2=1. h1: c1=4, c2=3, c3=3. a2: p1=10, p2=4.
    edges = spark.createDataFrame(
        [("c1", "p1"), ("c1", "p2"), ("c2", "p1"), ("c3", "p1")],
        "src string, dst string",
    )
    auth, hubs = hits_scores(edges, rounds=2)
    a = {r.node: r.score for r in auth.collect()}
    h = {r.node: r.score for r in hubs.collect()}
    assert a == {"p1": 10, "p2": 4}
    # h2: c1 = a2(p1)+a2(p2) = 14, c2 = c3 = 10
    assert h == {"c1": 14, "c2": 10, "c3": 10}


def test_hits_duplicate_edges_collapse(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("c1", "p1"), ("c1", "p1"), ("c2", "p1")], "src string, dst string"
    )
    auth, _ = hits_scores(edges, rounds=1)
    assert {r.node: r.score for r in auth.collect()} == {"p1": 2}


def test_hits_overflow_guard_fires(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import hits_scores
    import pytest

    edges = spark.createDataFrame(
        [(f"c{i}", "p1") for i in range(10)], "src string, dst string"
    )
    auth, _ = hits_scores(edges, rounds=2, max_score=5)
    with pytest.raises(Exception, match="hits_scores"):
        auth.collect()


def test_hits_hub_overflow_guard_fires(spark):
    """The hub frame is guarded independently of the authorities (r8
    ADVICE): a star hub summing 5 under-budget authorities must raise
    when the SUM crosses max_score even though every authority is
    within it (auth max 1 <= 4; hub = 5 > 4)."""
    from bankcreditunion_datapipeline_spark.operators.graph import hits_scores
    import pytest

    edges = spark.createDataFrame(
        [("h", f"p{i}") for i in range(5)], "src string, dst string"
    )
    auth, hubs = hits_scores(edges, rounds=1, max_score=4)
    assert {r.node: r.score for r in auth.collect()} == {
        f"p{i}": 1 for i in range(5)
    }
    with pytest.raises(Exception, match="hub overflow"):
        hubs.collect()


# -- personalized_pagerank_integer -------------------------------------------


def test_personalized_pagerank_hand_values(spark):
    """2-cycle with seed {1}: r0 = (1e12, 0); teleport 1.5e11 lands on
    the seed only. r1 = (1.5e11, 8.5e11); r2 = (8.725e11, 1.275e11)."""
    from bankcreditunion_datapipeline_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank_integer(
            edges, seeds, iterations=2
        ).collect()
    }
    assert got == {1: 872_500_000_000, 2: 127_500_000_000}


def test_personalized_pagerank_empty_seeds(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([], "node long")
    assert personalized_pagerank_integer(edges, seeds).count() == 0


def test_personalized_pagerank_unreached_zero(spark):
    """A component disjoint from the seeds holds rank 0 (mass only
    enters through the teleport vector)."""
    from bankcreditunion_datapipeline_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank_integer(
            edges, seeds, iterations=3
        ).collect()
    }
    assert got[3] == 0 and got[4] == 0 and got[1] > 0 and got[2] > 0


# -- local_clustering ----------------------------------------------------------


def test_local_clustering_triangle_plus_tail(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import (
        local_clustering,
    )

    # triangle 1-2-3 plus a tail 3-4: node 3 has d=3, 1 triangle ->
    # coeff 2*1*1000 div 6 = 333; nodes 1,2 have d=2, coeff 1000;
    # node 4 d=1 -> NULL coeff.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    rows = {r.node: r for r in local_clustering(pairs).collect()}
    assert (rows[1].degree, rows[1].n_triangles, rows[1].coeff_permille) == (
        2, 1, 1000,
    )
    assert (rows[3].degree, rows[3].n_triangles, rows[3].coeff_permille) == (
        3, 1, 333,
    )
    assert rows[4].n_triangles == 0 and rows[4].coeff_permille is None


def test_local_clustering_k4_all_one(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import (
        local_clustering,
    )

    # K4: every node in 3 triangles, d=3 -> coeff = 2*3*1000 div 6 = 1000
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = local_clustering(pairs).collect()
    assert all(
        (r.degree, r.n_triangles, r.coeff_permille) == (3, 3, 1000)
        for r in rows
    )


# -- bfs_depth_from_reps --------------------------------------------------------


def test_bfs_depth_chain_and_cap(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import (
        bfs_depth_from_reps,
    )

    # chain 1-2-3-4-5 (rep 1): depths 0..4; triangle 10-11-12 (rep 10):
    # depths 0,1,1.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    rows = {r.id: (r.component, r.depth) for r in
            bfs_depth_from_reps(pairs, max_rounds=8).collect()}
    assert rows[1] == (1, 0) and rows[5] == (1, 4)
    assert rows[3] == (1, 2)
    assert rows[10] == (10, 0) and rows[11] == (10, 1) and rows[12] == (10, 1)
    # cap: with max_rounds=2, node 5 (true depth 4) reports the cap
    capped = {r.id: r.depth for r in
              bfs_depth_from_reps(pairs, max_rounds=2).collect()}
    assert capped[5] == 2 and capped[4] == 2 and capped[3] == 2


def test_pagerank_convergence_curve_monotone(spark):
    from bankcreditunion_datapipeline_spark.operators.graph import (
        pagerank_convergence_curve,
    )

    # star graph: 0 <-> 1..4 (bi-directed)
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = sorted(
        pagerank_convergence_curve(df, iterations=4).collect(),
        key=lambda r: r.round,
    )
    # center node dominates every round; l1 delta shrinks
    assert all(r.top_node == 0 for r in rows)
    assert rows[-1].l1_delta < rows[0].l1_delta
    assert all(r.n_changed >= 0 for r in rows)
