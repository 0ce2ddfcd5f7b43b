"""Scale-proof harness (r5 VERDICT #2): synthesize an N-times corpus
from a sf dir by salted replication + hot-key/hot-gram injection, then
measure the pair/graph query family at 1x and Nx in one session.

The point: the engine's 100 TB claims rest on plan-shape reasoning
(blocked pair generation, budgets, working-set sizing). One measured
scaling run either validates them or finds the super-linear melt while
it's cheap. Near-linear wall-time scaling (ratio ~ N on fixed cores,
modulo n log n sort terms) = the plan survives growth; a ratio >> N
flags a quadratic term the small corpus hid.

Corpus construction (linear-by-design, so the MEASUREMENT isolates the
engine, not the synthesizer):
- documents: N replicas; replica 0 is verbatim, replica i>0 suffixes
  every word with _ri -- within-replica near-dup/gram structure is
  IDENTICAL to the original (workload scales exactly Nx), while
  cross-replica shingle collisions are zero (a naive copy would near-dup
  every doc against its 9 clones and explode the pair graph 100x, a
  property of the synthesizer, not the engine). doc_id offset 1e6/replica; injected ids start at 5e8 (clear of any replica range up to factor 500).
- hot-gram injection: +200 docs sharing a 12-token boilerplate run
  (hot posting lists, df=200 -- the skew case the df-prune and pair
  budgets exist for; stays under default budgets by design).
- orders/lineitem: N disjoint replicas (order/cust/supp keys offset per
  replica) -- the purchase graph becomes N disjoint copies, so the
  iterative PageRank/CC workload scales Nx without densifying.

Usage: python tools/scale_proof.py [src_sf_dir] [out_dir] [factor]
Prints one JSON line per query: {"q": ..., "t1": ..., "tN": ..., "ratio": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark import queries as _q
from bankcreditunion_datapipeline_spark.session import build_session
from bankcreditunion_datapipeline_spark.sources.files import read_testdata

FAMILY = [
    "q21_minhash_near_dups",
    "q49_curation_funnel",
    # r12 flagship: the full release composition (gates -> exact/near/
    # semantic dedup -> contamination -> budgets -> split -> shards)
    "q332_corpus_release_manifest",
    "q82_exact_jaccard_pairs",
    "q126_dup_components_star",
    "q147_supplier_pagerank",
    "q149_containment_pairs",
    "q153_near_dup_transitivity",
    "q158_keep_best_per_cluster",
    "q162_weighted_supplier_pagerank",
    # vector family (embeddings replicated by dimension ROTATION:
    # orthogonal, so within-replica cosines are bit-preserved while
    # cross-replica vectors decorrelate -- near-dup pair workload scales
    # Nx, not N^2x; + 200 identical hot vectors stressing the sign-LSH
    # bucket join)
    "q20_embedding_topk",
    "q23_embedding_near_dups",
    "q111_kmeans_assignment",
    "q120_semantic_dedup",
    "q138_ivf_pq_search",
    # session/funnel family (events replicas: disjoint user strides,
    # per-user history shape unchanged) + r6 second-session additions
    "q151_session_funnel",
    "q169_activity_coverage",
    "q168_duplicate_ngram_mass",
    "q171_purchase_communities",
]


def build_corpus(spark, src: str, out: str, factor: int, hub: bool = False) -> None:
    """hub=True (r6 VERDICT #4): disjoint graph replicas prove
    linear-in-N but never stress a hot vertex -- additionally wire ONE
    global supplier (suppkey 1) into every replica by remapping the
    lineitem rows with l_orderkey % 53 == 0, so its degree grows ~
    factor * rows/53 (hundreds of times the average supplier degree at
    factor 10) while total edge count is unchanged. Melt symptom this
    hunts: a per-dst aggregate or join that doesn't combine map-side
    turns the hub's in-edges into one reducer's problem."""
    docs = read_testdata(spark, src, "documents")
    parts = []
    for i in range(factor):
        rep = docs.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"_r{i}")),
                    ),
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(rep)
    boiler = "shared boilerplate preamble common to every injected document here now"
    hot = spark.range(200).select(
        (F.col("id") + 500_000_000).alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique"),
            F.col("id").cast("string"),
            F.lit(" tail"),
            F.col("id").cast("string"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("hotgram").alias("source"),
        F.lit(100).cast("long").alias("n_chars"),
    )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.unionByName(hot).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    orders = read_testdata(spark, src, "orders")
    li = read_testdata(spark, src, "lineitem")
    o_parts, l_parts = [], []
    for i in range(factor):
        o_parts.append(
            orders.withColumns(
                {
                    "o_orderkey": F.col("o_orderkey") + i * 10_000_000,
                    "o_custkey": F.col("o_custkey") + i * 1_000_000,
                }
            )
        )
        supp_i = F.col("l_suppkey") + i * 100_000
        if hub:
            supp_i = F.when(F.col("l_orderkey") % 53 == 0, F.lit(1)).otherwise(
                supp_i
            )
        l_parts.append(
            li.withColumns(
                {
                    "l_orderkey": F.col("l_orderkey") + i * 10_000_000,
                    "l_suppkey": supp_i,
                    "l_partkey": F.col("l_partkey") + i * 1_000_000,
                }
            )
        )
    ob, lb = o_parts[0], l_parts[0]
    for p in o_parts[1:]:
        ob = ob.unionByName(p)
    for p in l_parts[1:]:
        lb = lb.unionByName(p)
    ob.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    lb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    # events: N disjoint replicas (event/user keys offset per replica) --
    # the funnel/session/cohort/coverage family scales Nx in users with
    # per-user history shape unchanged (timestamps untouched, so window
    # density per user is IDENTICAL to the original)
    ev = read_testdata(spark, src, "events")
    v_parts = [
        ev.withColumns(
            {
                "event_id": F.col("event_id") + i * 1_000_000_000,
                "user_id": F.col("user_id") + i * 1_000_000,
            }
        )
        for i in range(factor)
    ]
    vb = v_parts[0]
    for p_ in v_parts[1:]:
        vb = vb.unionByName(p_)
    vb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    emb = read_testdata(spark, src, "embeddings")
    dim = len(
        emb.filter(F.col("embedding").isNotNull()).select("embedding").first()[0]
    )
    e_parts = []
    for i in range(factor):
        if i == 0:
            rep = emb
        else:
            # per-replica Rademacher diagonal: multiply dimension d by a
            # deterministic sign s_i[d] in {-1, +1}. Multiplication by
            # +-1.0 is float-EXACT, so within-replica dot products (and
            # therefore cosines, LSH signs, k-means cells) are
            # bit-identical to the original -- the workload per replica
            # is the workload. Cross-replica cosines become Rademacher-
            # weighted sums concentrating at 0 (+-1/sqrt(dim)), so even
            # smooth/periodic/structured vectors decorrelate; dimension
            # ROTATION (the previous scheme) also measured zero spurious
            # cross-replica pairs on this Gaussian corpus (factor 80,
            # verified by exact pair arithmetic), but is blind to
            # rotation-invariant structure and caps at 2*dim distinct
            # transforms where sign patterns give 2^dim.
            import hashlib

            signs = [
                1.0
                if hashlib.md5(f"{i}:{d}".encode()).digest()[0] % 2 == 0
                else -1.0
                for d in range(dim)
            ]
            rep = emb.select(
                # 1e7 spacing: q23 synthesizes its own near-copies at
                # vec_id + 1e6 INSIDE the query, so a 1e6 replica stride
                # would collide replica ids with the query's synthetic
                # ids (measured: the factor-80 totals still matched the
                # exact arithmetic, but only because the collided rows
                # happened to reproduce the same pair structure -- make
                # the id spaces disjoint instead of lucky)
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.array(*[F.lit(s) for s in signs]),
                    lambda x, s: (x * s).cast("float"),
                ).alias("embedding"),
                "label",
            )
        e_parts.append(rep)
    eb = e_parts[0]
    for p_ in e_parts[1:]:
        eb = eb.unionByName(p_)
    # 200 identical hot vectors (distinct ids): the sign-LSH bucket join
    # and any exact-dup vector path must absorb a C(200,2) hot bucket
    first = emb.orderBy("vec_id").limit(1).select("embedding")
    # 9e11 base: clear of every replica stride (1e7 x factor <= 9e4) AND
    # of q23's in-query +1e6 synthetic-copy offset
    hot_v = spark.range(200).select(
        (F.col("id") + 900_000_000_000).alias("vec_id"), F.lit(0).alias("hv")
    ).crossJoin(F.broadcast(first)).select(
        "vec_id", "embedding", F.lit(0).cast("int").alias("label")
    )
    eb.unionByName(hot_v).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    # small dims some query plans touch transitively
    for tbl in ("region", "nation", "customer", "supplier", "part"):
        p = os.path.join(src, f"{tbl}.parquet")
        if os.path.exists(p):
            read_testdata(spark, src, tbl).write.mode("overwrite").parquet(
                os.path.join(out, f"{tbl}.parquet")
            )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hub"]
    hub = "--hub" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/scale10x"
    factor = int(args[2]) if len(args) > 2 else 10
    family = args[3].split(",") if len(args) > 3 else FAMILY

    spark = build_session(app_name="scale_proof")
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        t0 = time.time()
        build_corpus(spark, src, out, factor, hub=hub)
        print(
            json.dumps(
                {
                    "built": out,
                    "factor": factor,
                    "hub": hub,
                    "sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )

    registry = _q.registry()
    spark.read.parquet(os.path.join(src, "region.parquet")).count()
    results = []
    for name in family:
        q = registry[name].spark_fn
        times = {}
        err = None
        for label, d in (("t1", src), ("tN", out)):
            best = None
            for _ in range(2):
                t0 = time.time()
                try:
                    q(spark, d).collect()
                except Exception as e:  # noqa: BLE001 - record, don't abort
                    # a tripped fail-loud budget at Nx IS a result: the
                    # guard firing at the melt point is the designed
                    # behavior, and the remaining queries still measure
                    err = f"{label}: {str(e).splitlines()[0][:300]}"
                    break
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            if err:
                break
            times[label] = round(best, 2)
        if err:
            rec = {"q": name, **times, "error": err}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            continue
        ratio = round(times["tN"] / times["t1"], 2) if times["t1"] else None
        rec = {"q": name, **times, "ratio": ratio}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    hot = [r for r in results if r.get("ratio") and r["ratio"] > factor * 2]
    print(
        json.dumps(
            {
                "factor": factor,
                "n_queries": len(results),
                "super_linear": [r["q"] for r in hot],
                "errors": [r["q"] for r in results if r.get("error")],
            }
        ),
        flush=True,
    )
    return 1 if hot else 0


if __name__ == "__main__":
    raise SystemExit(main())
