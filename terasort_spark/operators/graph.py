"""Graph operators over the document-similarity graph (rows-only:
iterative algorithms aren't single-statement SQL; invariants are
asserted in tests/test_llm.py).

The edge list comes from the MinHash-LSH candidate machinery
(llm_dedup.minhash_pairs), so the graph is built by the same
equi-join-only plan that survives 100 TB; each PageRank iteration is
one join + one groupBy on the node key — the standard Pregel-style
round expressed as DataFrames, with AQE handling the per-round
partition sizing. Rounds are a fixed constant (not convergence-tested)
so the job's stage count is known in advance."""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.operators._util import rnd
from terasort_spark.registry import register

N_ITER = 5
DAMPING = 0.85


@register("graph_pagerank")  # iterative algorithm → rows-only
def graph_pagerank(spark, sf_dir):
    """PageRank over the near-duplicate similarity graph: nodes are
    documents, edges are verified LSH candidate pairs (Jaccard >= 0.5)
    from `_candidate_edges`, which passes per_doc_cap=8 — so high-degree
    nodes' edge lists are truncated to a bounded, smallest-id-biased
    subset of the full verified pair set (a deliberate cap that keeps
    hot buckets linear; the topology is that capped graph, not the
    complete one). Edges are treated as undirected (each contributes
    both ways). 5 fixed iterations, damping 0.85, uniform init 1/N.
    High-rank docs are cluster hubs — the docs whose removal dedups
    the most.

    Scale notes: ranks and degrees live on the node key; every
    iteration shuffles contributions on dst — same key, so the
    exchange reuses partitioning. Lineage stays 5 joins deep (constant);
    for unbounded-iteration variants checkpoint every ~10 rounds."""
    pairs = _candidate_edges(spark, sf_dir)
    raw = pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    # Materialize the edge list ONCE, with the out-degree already folded
    # in as a per-edge weight w = 1/deg(src): without the checkpoint
    # every iteration re-derives the whole LSH candidate pipeline, and
    # without the pre-fold every iteration pays a second join against a
    # degrees table. localCheckpoint keeps it per-invocation (no
    # cross-run cache) — the GraphX-style iterative pattern.
    degrees = raw.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges = (
        raw.join(degrees, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    # nodes is re-joined every iteration — materialize the (tiny)
    # distinct once instead of re-shuffling edges per round.
    nodes = edges.select("src").distinct().localCheckpoint(eager=True)
    n_nodes = nodes.count()  # scalar cardinality, not a data collect
    if n_nodes == 0:  # empty corpus → empty graph, not a crash
        return spark.createDataFrame([], "doc_id bigint, rank_x1000 double")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(N_ITER):
        contribs = (
            edges.join(ranks, "src")
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.src == contribs.dst, "left")
            .select(
                "src",
                (
                    F.lit((1.0 - DAMPING) / n_nodes)
                    + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("src").alias("doc_id"), rnd(F.col("rank") * 1000, "rank_x1000")
    )


@register("graph_triangles")  # graph-join algorithm → rows-only
def graph_triangles(spark, sf_dir):
    """Global triangle count over the similarity graph via the classic
    two-join plan: orient every edge low→high id (kills both duplicate
    orientations and 6x triangle overcounting), build wedges x<y<z by
    joining on the middle vertex, close them against the edge list.

    Scale notes: the expensive step is the wedge join, which shuffles
    on a single vertex key; low→high orientation bounds each vertex's
    out-degree by its rank among neighbors — the standard mitigation
    that keeps hub vertices from exploding the wedge count. Output is
    one row of graph-level invariants."""
    pairs = (
        _candidate_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    wedges = pairs.select(F.col("a").alias("x"), F.col("b").alias("y")).join(
        pairs.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
    )
    tri = wedges.join(
        pairs.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.count_distinct(F.col("a")).alias("n_low_endpoints"),
    )
    return n_tri.crossJoin(stats)


def _candidate_edges(spark, sf_dir):
    from terasort_spark.operators.llm_dedup import minhash_pairs

    return minhash_pairs(spark, sf_dir, tau=0.5, per_doc_cap=8).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
