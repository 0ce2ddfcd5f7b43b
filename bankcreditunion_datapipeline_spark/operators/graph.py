"""Graph centrality over relational data: deterministic integer
PageRank.

Connected components live in operators/dedup.py (they serve the dedup
family); this module holds the rank/centrality side. The reference has
no graph operators -- this is extension surface for the entity-graph
questions a lakehouse gets asked (which suppliers anchor the purchase
network; which documents anchor the near-dup graph).

Why INTEGER PageRank: float PageRank sums per-node contributions whose
order differs across engines and partitionings (~1e-16 per round,
amplified by iteration), so no float implementation can be value-hash
verified against a SQL twin. With ranks in integer micro-units, integer
floor division for the out-degree split and for the damping factor,
every operation is exact and commutative -- ANY engine replaying the
recurrence produces bit-identical BIGINT ranks in any summation order.
The systematic floor leakage (total mass shrinks by < n_nodes + n_edges
units per round out of 1e12) is deterministic and harmless for ranking.

Recurrence (SCALE = 1e12, damping d = num/den, N nodes):
    base   = SCALE div N
    r0(v)  = base
    contrib(u -> v) = r(u) div outdeg(u)            (unweighted)
                    = (r(u) * w(u,v)) div W(u)      (weighted; W = sum out-w)
    r'(v)  = ((den - num) * base) div den
             + (num * sum_in(contrib)) div den
Dangling nodes are the caller's concern: build the edge set symmetric
(both directions) and every node has outdeg >= 1, which is also the
natural shape for undirected co-purchase / near-dup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import transient_persist
from ..localresult import local_result_frame

SCALE = 1_000_000_000_000


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(node, rank) after `iterations` rounds of the integer recurrence.

    `edges` must be the directed edge list as the caller wants mass to
    flow (pass both directions for an undirected graph -- no dangling
    nodes, see module docstring). Without `weight_col`, duplicate edges
    are deduped and each out-edge receives rank div outdeg. With
    `weight_col` (a positive INTEGER column -- order counts, volume in
    whole units), duplicate (src, dst) edges merge by SUMMING weights
    and u sends (rank * w) div W(u) along each edge, W(u) = total
    outgoing weight -- still pure BIGINT floor arithmetic, so the
    weighted recurrence is exactly as engine-replayable as the
    unweighted one. Weights must satisfy max(w) <= 9e6 so rank * w
    (rank <= SCALE = 1e12) cannot overflow BIGINT; violating weights
    raise rather than silently wrap.

    Plan shape per round: one join of ranks to the persisted edge set on
    src (co-shuffled after round 1), one hash aggregate on dst -- the
    standard iterative-join PageRank; ranks are localCheckpoint'ed per
    round (the connected_components lineage discipline). Everything is
    BIGINT arithmetic: no float enters the plan, so results are
    layout-independent AND engine-replayable (the q147/q162 oracles
    unroll the same recurrences in SQL).
    """
    base_cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is None:
        e = (
            edges.select(*base_cols)
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .persist()
        )
    else:
        e = (
            edges.select(*base_cols, F.col(weight_col).cast("long").alias("w"))
            .filter(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & (F.col("w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .persist()
        )
    # Size the iteration working set to the graph, not to
    # spark.sql.shuffle.partitions: the per-round joins/aggregates over a
    # graph far smaller than the session's partitioning pay pure task-
    # scheduling latency (measured 8.5s -> 2.3s for 3 rounds over a 183k-
    # edge graph at 32 partitions vs sized). coalesce is narrow and
    # clamps to the current count; big graphs keep full parallelism.
    n_edges = e.count()
    if n_edges == 0:
        # empty graph (e.g. a filter matched no rows): empty frame, not
        # a ZeroDivisionError from SCALE // 0
        return edges.sparkSession.createDataFrame([], "node long, rank long")
    parts = max(1, -(-n_edges // rows_per_partition))
    e = e.coalesce(parts)
    if weight_col is None:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    else:
        mx = e.agg(F.max("w").alias("m")).first()["m"]
        if mx > 9_000_000:
            raise ValueError(
                f"pagerank_integer: max edge weight {mx} > 9e6 -- rank * w "
                "would overflow BIGINT (rank <= 1e12). Rescale weights "
                "(e.g. integer-divide by a unit) before calling."
            )
        outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(parts)
        .persist()
    )
    n_nodes = nodes.count()
    base = SCALE // n_nodes
    teleport = ((damping_den - damping_num) * base) // damping_den

    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank")).localCheckpoint()
    # src-keyed edge+degree table, built once; every round's join hits it
    ed = e.join(outdeg, "src").persist()
    contrib_expr = (
        F.expr("rank div outdeg")
        if weight_col is None
        else F.expr("(rank * w) div outdeg")
    )
    for _ in range(iterations):
        contribs = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node"),
                contrib_expr.alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(inflow, 0)) div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .coalesce(parts)
            .localCheckpoint()
        )
    # ranks is localCheckpoint'ed (eager), so every upstream cache can
    # release before return -- same discipline as the greedy loop
    ed.unpersist()
    e.unpersist()
    nodes.unpersist()
    return ranks


def triangle_count(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """One-row (n_nodes, n_edges, n_wedges, n_triangles, transitivity_t)
    for an undirected pair graph.

    Algorithm: degree-ordered orientation (Suri & Vassilvitskii, WWW
    2011 -- the MapReduce triangle counter): orient every edge from its
    lower-(degree, id) endpoint to the higher one; each triangle then
    has EXACTLY ONE vertex with two outgoing edges, so wedges formed by
    out-pairs + one closure semi-join against the canonical edge set
    count each triangle once. The orientation bounds out-degrees by
    O(sqrt(m)), which bounds wedge generation at m^1.5 total -- the
    property that keeps power-law graphs (every real co-occurrence /
    near-dup graph) from exploding at the hub vertices; a naive wedge
    join on raw adjacency is quadratic in the max degree.

    transitivity = 3 * triangles / wedges (wedges over the undirected
    degrees), floor-truncated at 1e-6 from integer operands -- for a
    near-dup graph this measures how close "is a near-duplicate of" is
    to an equivalence relation.
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    # working-set sizing (the pagerank/CC discipline): the wedge and
    # closure stages over a small pair graph must not inherit the
    # session's shuffle partitioning
    n_edges = e.count()
    e = e.coalesce(max(1, -(-n_edges // 500_000)))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    lower_first = ru < rv
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, rv).otherwise(ru).alias("dr"),
    )
    o1 = oriented.select("src", F.col("dst").alias("x"), F.col("dr").alias("rx"))
    o2 = oriented.select("src", F.col("dst").alias("y"), F.col("dr").alias("ry"))
    wedges = (
        o1.join(o2, "src")
        .filter(F.col("rx") < F.col("ry"))
        .select(
            F.least(F.col("x"), F.col("y")).alias("u"),
            F.greatest(F.col("x"), F.col("y")).alias("v"),
        )
    )
    n_tri = wedges.join(e, ["u", "v"], "left_semi").count()
    row = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.coalesce(
                F.sum(F.expr("CAST(d AS BIGINT) * (d - 1) div 2")), F.lit(0)
            ).alias("n_wedges"),
        ).first()
    )
    n_wedges = int(row["n_wedges"])
    trans = (3 * n_tri * 1000000 // n_wedges) / 1000000.0 if n_wedges else None
    out = local_result_frame(
        pairs.sparkSession,
        [(int(row["n_nodes"]), n_edges, n_wedges, n_tri, trans)],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, "
        "transitivity_t double",
    )
    e.unpersist()
    deg.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(node, label) after `iterations` SYNCHRONOUS label-propagation
    rounds (Raghavan et al. 2007) -- community detection where a node
    adopts the most frequent label among its neighbors each round.

    Classic LPA tie-breaks randomly and updates asynchronously, which
    no two runs -- let alone two engines -- reproduce. This variant is
    fully deterministic and therefore SQL-replayable (the q171
    discipline): synchronous rounds (all nodes update from the SAME
    previous labeling), votes counted over the DEDUPED symmetric edge
    set, argmax resolved (count DESC, label ASC) via a single
    max(struct(c, -label)) hash aggregate -- no WindowExec, no RNG,
    layout-independent like every iterative operator here.

    `edges` must be symmetric (pass both directions), which also
    guarantees every node has >= 1 neighbor vote. Plan shape per round:
    one join of labels to the persisted edge set on src (co-shuffled
    after round 1), two hash aggregates; working sets coalesce to graph
    size per the iterative-family contract.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    n_edges = e.count()
    if n_edges == 0:
        return edges.sparkSession.createDataFrame([], "node long, label long")
    parts = max(1, -(-n_edges // rows_per_partition))
    e = e.coalesce(parts)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .coalesce(parts)
        .localCheckpoint()
    )
    for _ in range(iterations):
        votes = (
            labels.join(e, labels["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"), F.col("lab"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lab")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m").getField("nl")).alias("lab"))
            .coalesce(parts)
            .localCheckpoint()
        )
    e.unpersist()
    return labels.select("node", F.col("lab").alias("label"))


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(node, degree) of the k-core: the maximal subgraph in which every
    vertex keeps degree >= ``k``, by SYNCHRONOUS peeling (Matula & Beck
    1983) -- each round simultaneously removes every vertex whose
    degree within the current surviving subgraph is < k, to fixpoint.
    Synchronous rounds make the result order- and layout-independent
    (the q171 LPA discipline), hence SQL-replayable by unrolling the
    identical rounds; classic asynchronous peeling is
    visit-order-dependent and no two engines reproduce it.

    ``edges`` must be symmetric (pass both directions); self-loops are
    dropped (a self-loop would let an isolated vertex count itself
    toward k). ``degree`` in the output is the vertex's degree within
    the FINAL core.

    Plan shape per round: the surviving edge set joins the surviving
    node set on src and on dst (both shrink monotonically), one hash
    aggregate for degrees, one filter; the working set localCheckpoints
    and coalesces to graph size per the iterative-family contract, so
    round r+1 reads round r's materialization, not a growing lineage.
    Convergence is detected by count equality (the alive set only
    shrinks, so equal counts == identical sets -- one cheap job per
    round over the checkpointed frame); a graph that has not converged
    after ``max_rounds`` raises rather than silently returning a
    non-core (peeling needs at most |V| rounds; 30 covers any real
    graph -- a path graph is the adversarial worst case).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges = e.count()
    spark = edges.sparkSession
    if n_edges == 0:
        e.unpersist()
        return spark.createDataFrame([], "node long, degree long")
    parts = max(1, -(-n_edges // rows_per_partition))
    e = e.coalesce(parts).localCheckpoint()
    n_alive = None
    for _ in range(max_rounds):
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        alive = deg.filter(F.col("degree") >= k).select("node")
        e_next = (
            e.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .coalesce(parts)
            # lazy: the convergence count below is the materializing
            # full-scan action -- one job per round (the r14
            # connected_components change)
            .localCheckpoint(eager=False)
        )
        n_next = e_next.count()
        e = e_next
        if n_next == n_alive:
            break
        n_alive = n_next
        if n_next == 0:
            break
    else:
        raise RuntimeError(
            f"k_core: no fixpoint after {max_rounds} rounds -- "
            "pathological chain graph; raise max_rounds deliberately"
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def adamic_adar_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pair_rows: int = 5_000_000,
) -> DataFrame:
    """Adamic-Adar link prediction over a bipartite edge set: score every
    src pair that shares at least one dst neighbor by
    sum over shared dst of floor(1e6 / ln(deg(dst))) -- rare shared
    neighbors count more (the 1/log-degree damping), in the repo's
    integer-micro lane so the per-pair sum is order-independent and
    value-hash verifiable. ln runs over an integer-derived double
    (SCALE.md log discipline); dst nodes of degree 1 join no pair and
    degree >= 2 keeps ln positive.

    Pair generation is a per-dst self-join -- quadratic in hub degree --
    so `attach_pair_budget` (operators/dedup.py) rides the DISTINCT
    edge table with the exact sum(d*(d-1)/2) total and aborts at
    execution time past `max_pair_rows` instead of materializing a hub
    explosion; prune hot dsts (or cap degree) upstream and the budget
    documents that decision.

    Output: (src_a, src_b, shared, aa_e6) with src_a < src_b.

    Scale: distinct + degree are map-side-combining aggregates on dst;
    the self-join shuffles both sides on dst (co-partitioned, no
    broadcast of data-sized input); the final (src_a, src_b) aggregate
    is the pair table itself -- which is exactly what the budget bounds.
    """
    from .dedup import attach_pair_budget

    e = edges.select(src, dst).distinct()
    deg = e.groupBy(dst).agg(F.count(F.lit(1)).alias("__deg"))
    ed = e.join(deg, dst).filter(F.col("__deg") >= 2)
    ed = attach_pair_budget(
        ed,
        deg.filter(F.col("__deg") >= 2),
        "__deg",
        max_pair_rows,
        "adamic_adar_pairs: shared-neighbor pair total exceeds budget; "
        "cap hub dst degree upstream or raise max_pair_rows",
    )
    w_dst = deg.filter(F.col("__deg") >= 2).select(
        dst,
        F.floor(F.lit(1_000_000) / F.log(F.col("__deg").cast("double")))
        .cast("long")
        .alias("__w"),
    )
    a = ed.select(F.col(dst).alias("__d"), F.col(src).alias("src_a"))
    b = e.select(F.col(dst).alias("__d"), F.col(src).alias("src_b"))
    pairs = a.join(b, "__d").filter(F.col("src_a") < F.col("src_b"))
    return (
        pairs.join(
            w_dst.withColumnRenamed(dst, "__d"), "__d"
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared"),
            F.sum("__w").cast("long").alias("aa_e6"),
        )
    )


def hits_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
    max_score: int = 1 << 61,
) -> tuple[DataFrame, DataFrame]:
    """HITS (Kleinberg) hub/authority scores on a directed (typically
    bipartite) graph, in the EXACT integer lane: hubs start at 1,
    authority(d) = sum of hub scores over in-edges, hub(s) = sum of
    authority scores over out-edges, repeated `rounds` times with NO
    per-round normalization -- the RANKING after r rounds equals
    normalized HITS (normalization is a positive scalar per round), and
    unnormalized sums stay engine-portable where float normalization
    would not (the q147 integer-PageRank discipline).

    Growth is geometric (score_r <= E * max(score_{r-1})), so the
    operator is fail-loud above `max_score` instead of silently
    wrapping BIGINT -- the q176 overflow posture. rounds=2 on a graph
    with 1e12 edges stays under 2^61; raise rounds only with a
    coarser unit upstream.

    Each half-round is one broadcast-or-shuffle hash join + one
    map-side-combining aggregate over EDGES -- the same shape as
    pagerank_integer, so the r7 hub-mode skew proof (map-side partial
    sums absorb a hot vertex) carries over.

    Returns (authorities, hubs): (node, score) each. Input edges are
    de-duplicated defensively (multiplicity would double-count).
    """
    # the deduped edge set feeds every half-round join plus the hub
    # init (2*rounds + 1 consumers) -- persist per the house mid-plan
    # discipline, or the upstream join recomputes each time. Left to
    # the ContextCleaner after the result is consumed (the lazily-
    # returned-frame pattern, dedup.py:938).
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct().persist()
    h = e.select("__s").distinct().withColumn(
        "__h", F.lit(1).cast("long")
    )
    a = None
    for _ in range(rounds):
        a = (
            e.join(h, "__s")
            .groupBy("__d")
            .agg(F.sum("__h").cast("long").alias("__a"))
        )
        h = (
            e.join(a, "__d")
            .groupBy("__s")
            .agg(F.sum("__a").cast("long").alias("__h"))
        )
    guard_a = a.agg(F.max("__a").alias("__mx"))
    guarded_a = (
        a.crossJoin(F.broadcast(guard_a))
        .where(
            F.assert_true(
                F.col("__mx") <= F.lit(max_score),
                F.concat(
                    F.lit("hits_scores: authority overflow risk [max "),
                    F.col("__mx").cast("string"),
                    F.lit(f", budget {max_score}] -- reduce rounds"),
                ),
            ).isNull()
        )
        .drop("__mx")
    )
    auth = guarded_a.select(
        F.col("__d").alias("node"), F.col("__a").alias("score")
    )
    # the hub frame is the sum of authorities over out-edges, so it can
    # exceed max_score even when every authority is under it (a hub
    # with > E/max out-edges at the cap) -- guard it independently
    guard_h = h.agg(
        F.max("__h").alias("__mxh"), F.min("__h").alias("__mnh")
    )
    hubs = (
        h.crossJoin(F.broadcast(guard_h))
        .where(
            F.assert_true(
                (F.col("__mxh") <= F.lit(max_score))
                # scores are sums of nonneg terms: a negative means the
                # BIGINT sum already wrapped before this guard could see
                # it -- catch the wrap signature, not just the budget
                & (F.col("__mnh") >= 0),
                F.concat(
                    F.lit("hits_scores: hub overflow risk [max "),
                    F.col("__mxh").cast("string"),
                    F.lit(f", min "),
                    F.col("__mnh").cast("string"),
                    F.lit(f", budget {max_score}] -- reduce rounds"),
                ),
            ).isNull()
        )
        .drop("__mxh", "__mnh")
        .select(F.col("__s").alias("node"), F.col("__h").alias("score"))
    )
    return auth, hubs


def personalized_pagerank_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    damping_num: int = 85,
    damping_den: int = 100,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """Personalized PageRank in the exact integer lane (the q147
    pagerank_integer recurrence with the teleport vector restricted to
    ``seeds``): rank flows back to the SEED SET instead of uniformly,
    so scores measure proximity to the seeds -- the related-entity /
    recommendation primitive (Jeh & Widom 2003, "Scaling Personalized
    Web Search"; public knowledge).

    Recurrence (SCALE = 1e12, floor div end-to-end, engine-replayable):
    base = SCALE div |S|; r0(v) = base for v in S else 0;
    r'(v) = [v in S] * ((den-num)*base div den)
            + (num * sum over in-edges of r(u) div outdeg(u)) div den.
    No float enters the plan, so ranks are layout-independent and the
    oracle can unroll the identical rounds in SQL (the q147/q162
    discipline).  Nodes unreachable from the seed set score 0 and are
    kept (the caller filters) -- their rows cost nothing material.

    Plan shape per round: identical to pagerank_integer -- one join of
    ranks to the persisted src-keyed edge+degree table, one hash
    aggregate on dst, localCheckpoint'ed ranks, working sets coalesced
    to graph size; caches released before return.

    ``seeds`` must be distinct node ids (column ``seed_col``); seeds
    absent from the graph still receive teleport mass (they are part
    of the node set by construction of the union below).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    s = seeds.select(F.col(seed_col).alias("node")).distinct().persist()
    n_edges = e.count()
    n_seeds = s.count()
    if n_seeds == 0 or n_edges == 0:
        e.unpersist()
        s.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node long, rank long"
        )
    parts = max(1, -(-n_edges // rows_per_partition))
    e = e.coalesce(parts)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
        .coalesce(parts)
        .persist()
    )
    base = SCALE // n_seeds
    teleport = ((damping_den - damping_num) * base) // damping_den
    seed_flag = s.withColumn("__seed", F.lit(1))
    nodes_flagged = (
        nodes.join(seed_flag, "node", "left")
        .select("node", F.coalesce("__seed", F.lit(0)).alias("__seed"))
        .coalesce(parts)
        .persist()
    )
    ranks = nodes_flagged.select(
        "node", (F.col("__seed") * F.lit(base)).cast("long").alias("rank")
    ).localCheckpoint()
    ed = e.join(outdeg, "src").persist()
    for _ in range(iterations):
        contribs = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes_flagged.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.col("__seed") * F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(inflow, 0)) div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .coalesce(parts)
            .localCheckpoint()
        )
    ed.unpersist()
    e.unpersist()
    s.unpersist()
    nodes.unpersist()
    nodes_flagged.unpersist()
    return ranks


def local_clustering(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient for an
    undirected pair graph: (node, degree, n_triangles, coeff_permille)
    with coeff = 2*tri*1000 div (d*(d-1)), NULL below degree 2
    (undefined, not zero).

    Same degree-ordered orientation as triangle_count (Suri &
    Vassilvitskii 2011): each triangle closes exactly one oriented
    wedge, and crediting the wedge CENTER plus both endpoints hands
    every triangle to each of its three vertices exactly once. Wedge
    generation stays bounded at m^1.5 by the orientation -- the hub
    property that keeps power-law graphs tractable.

    The canonical edge set is persisted (read by the wedge join and the
    closure semi-join -- the lazily-returned-frame house pattern; the
    ContextCleaner reclaims it).
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    n_edges = e.count()
    e = e.coalesce(max(1, -(-n_edges // 500_000)))
    # deg is referenced three times (both orientation sides + the final
    # join) and `oriented` twice (both wedge sides); without persists the
    # logical subtree fans out multiplicatively through the credit
    # union below (the r14-open q264 plan carried 1951 Exchange nodes /
    # 498 cache scans, pure planning+scheduling overhead on a tiny
    # graph).  Both frames are graph-bounded (nodes / edges).
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .transform(transient_persist)
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    lower_first = ru < rv
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, rv).otherwise(ru).alias("dr"),
    )
    o1 = oriented.select(
        "src", F.col("dst").alias("x"), F.col("dr").alias("rx")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("dr").alias("ry")
    )
    closed = (
        o1.join(o2, "src")
        .filter(F.col("rx") < F.col("ry"))
        .select(
            "src",
            F.least(F.col("x"), F.col("y")).alias("u"),
            F.greatest(F.col("x"), F.col("y")).alias("v"),
        )
        .join(e, ["u", "v"], "left_semi")
    )
    # one pass over `closed` instead of a 3-way union of the same
    # subtree: exploding the (center, endpoint, endpoint) triple yields
    # the identical credit multiset with a single wedge+closure subplan
    credits = closed.select(
        F.explode(F.array(F.col("src"), F.col("u"), F.col("v"))).alias(
            "node"
        )
    )
    pernode = credits.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return deg.join(pernode, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long")
        .alias("n_triangles"),
        F.expr(
            "CASE WHEN degree >= 2 THEN CAST(2 * coalesce(n_triangles, 0) "
            "* 1000 div (degree * (degree - 1)) AS BIGINT) END"
        ).alias("coeff_permille"),
    )


def pagerank_convergence_curve(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    rows_per_partition: int = 500_000,
    max_nodes: int = 9_000_000,
) -> DataFrame:
    """Per-round convergence diagnostics for the integer PageRank
    recurrence: (round, l1_delta, n_changed, top_node, top_rank).
    The q248 training-curve discipline applied to the graph lane: the
    iteration count every pagerank_integer caller hard-codes is a
    GUESS until this curve shows where l1_delta flattens and whether
    the top node has stabilized -- measured once at audit scale before
    committing N rounds x 100 TB.

    Same recurrence, plan shape and lineage discipline as
    pagerank_integer (uniform base = SCALE div N, teleport, floor-div
    inflow; per-round join + hash aggregate, localCheckpoint'ed ranks,
    graph-sized working sets). All-integer, so l1_delta and n_changed
    are engine-exact and the oracle unrolls identical rounds.
    top_node ties break to the smallest node (min over
    (-rank, node)). l1_delta sums |diff| <= N * SCALE, so the operator
    fail-louds above `max_nodes` (9e6 keeps the sum in BIGINT); the
    curve is a diagnostic artifact -- sample the graph first past that.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        return edges.sparkSession.createDataFrame(
            [],
            "round long, l1_delta long, n_changed long, "
            "top_node long, top_rank long",
        )
    parts = max(1, -(-n_edges // rows_per_partition))
    e = e.coalesce(parts)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(parts)
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes > max_nodes:
        e.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"pagerank_convergence_curve: {n_nodes} nodes > budget "
            f"{max_nodes} -- l1_delta (<= N * 1e12) would overflow "
            "BIGINT; run the curve on a sampled subgraph"
        )
    base = SCALE // n_nodes
    teleport = ((damping_den - damping_num) * base) // damping_den
    ranks = nodes.select(
        "node", F.lit(base).cast("long").alias("rank")
    ).localCheckpoint()
    ed = e.join(outdeg, "src").persist()
    out_rows = []
    for k in range(1, iterations + 1):
        contribs = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(inflow, 0)) "
                        f"div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .coalesce(parts)
            .localCheckpoint()
        )
        diff = new_ranks.alias("a").join(
            ranks.alias("b"), F.col("a.node") == F.col("b.node")
        )
        out_rows.append(
            diff.agg(
                F.lit(k).cast("long").alias("round"),
                F.sum(F.abs(F.col("a.rank") - F.col("b.rank")))
                .cast("long")
                .alias("l1_delta"),
                F.sum(
                    (F.col("a.rank") != F.col("b.rank")).cast("long")
                ).cast("long").alias("n_changed"),
                F.min(
                    F.struct(
                        (-F.col("a.rank")).alias("nr"),
                        F.col("a.node").alias("n"),
                    )
                ).alias("__top"),
            ).select(
                "round",
                "l1_delta",
                "n_changed",
                F.col("__top.n").cast("long").alias("top_node"),
                (-F.col("__top.nr")).cast("long").alias("top_rank"),
            )
        )
        ranks = new_ranks
    ed.unpersist()
    e.unpersist()
    nodes.unpersist()
    out = out_rows[0]
    for o in out_rows[1:]:
        out = out.unionByName(o)
    return out


def bfs_depth_from_reps(
    pairs: DataFrame,
    max_rounds: int = 8,
    a_col: str = "id_a",
    b_col: str = "id_b",
    rows_per_partition: int = 500_000,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Distributed BFS over an undirected pair graph from each
    connected component's REPRESENTATIVE (its minimum id -- the
    connected_components label): returns (id, component, depth) with
    depth = shortest-path hops from the rep, capped at `max_rounds`
    (nodes still unreached after the cap keep depth = max_rounds; the
    cap is part of the contract so a fixed unrolled SQL replay can
    grade it).

    The shortest-path layer the graph kernel lacked: per-cluster MAX
    depth is the chain-length audit for near-dup clusters -- a
    high-diameter, low-clustering cluster is the LSH chaining artifact
    (A~B~C~...~Z with A and Z unrelated), exactly what a cluster-keyed
    split (q231) silently glues together.

    Plan per round: one join of the frontier to the bi-directed edge
    set + one min-aggregate against the standing depth frame,
    localCheckpoint'ed (the CC lineage discipline); working sets
    coalesced to graph size. Rounds are FIXED (max_rounds), not
    convergence-probed -- the oracle unrolls the identical relaxation.
    """
    e = (
        pairs.select(
            F.col(a_col).alias("u"), F.col(b_col).alias("v")
        )
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
        .persist()
    )
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        return pairs.sparkSession.createDataFrame(
            [], "id long, component long, depth long"
        )
    parts = max(1, -(-n_edges // rows_per_partition))
    bi = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .union(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .coalesce(parts)
        .persist()
    )
    from .dedup import connected_components

    # ``labels`` may inject a precomputed (id, component) labeling of
    # the same pair graph (the lane-injection contract, r14): q275
    # passes the session-shared q21 CC lane instead of re-running the
    # propagation loop here.
    comp = (
        labels
        if labels is not None
        else connected_components(
            e.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        )
    ).select(F.col("id"), F.col("component"))
    depth = comp.select(
        "id",
        "component",
        F.when(F.col("id") == F.col("component"), F.lit(0))
        .otherwise(F.lit(max_rounds))
        .cast("long")
        .alias("depth"),
    ).coalesce(parts).localCheckpoint()
    for k in range(1, max_rounds + 1):
        frontier = depth.filter(F.col("depth") == k - 1)
        reach = (
            frontier
            .join(bi, depth["id"] == bi["s"])
            .select(F.col("d").alias("id"), F.lit(k).cast("long").alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        depth = (
            depth.join(reach, "id", "left")
            .select(
                "id",
                "component",
                F.least(
                    F.col("depth"), F.coalesce(F.col("nd"), F.lit(max_rounds))
                ).cast("long").alias("depth"),
            )
            .coalesce(parts)
            # LAZY checkpoint materialized by the early-exit count below
            # (full-scan aggregate -> every partition cached): one job
            # per round instead of an eager-checkpoint job plus a
            # frontier-probe job (the connected_components r14 change).
            .localCheckpoint(eager=False)
        )
        # early exit preserves the fixed-round contract EXACTLY: zero
        # nodes first reached at round k means the round-(k+1) frontier
        # is empty and every later round is provably a no-op.
        if depth.filter(F.col("depth") == k).count() == 0:
            break
    bi.unpersist()
    e.unpersist()
    return depth
