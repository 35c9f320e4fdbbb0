"""Graph operators over the document-similarity graph.

The edge list comes from the MinHash-LSH candidate machinery
(llm_dedup.minhash_pairs), so the graph is built by the same
equi-join-only plan that survives 100 TB; each PageRank iteration is
one join + one groupBy on the node key — the standard Pregel-style
round expressed as DataFrames, with AQE handling the per-round
partition sizing. Rounds are a fixed constant (not convergence-tested)
so the job's stage count is known in advance.

EXACT-oracle since r6: the LSH edge pipeline became engine-portable
(md5 token hashes + universal-hash permutations, see
llm_dedup.lsh_pairs_sql), so triangle counting replays directly in
SQL, and PageRank was rewritten from float ranks to int64 micro-units
(1e12 total mass, truncating division — the emb_kmeans/ml_logreg
quantization pattern): every iteration is exact order-independent
integer arithmetic, replayed by a 5-way unrolled CTE chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.operators.llm_dedup import lsh_pairs_sql
from terasort_spark.registry import register

N_ITER = 5
DAMPING_PCT = 85  # damping 0.85 expressed in integer percent
RANK_UNIT = 10**12  # total rank mass in micro-units


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration replay of the quantized PageRank loop.

    Each CTE pair (c_i, r_i) is one Pregel round: contributions are
    ``ru // deg`` summed per dst (exact int64, order-independent), the
    new rank is ``(15*base + 85*contrib) // 100``. ``//`` (DuckDB) and
    ``div`` (Spark) agree on non-negative operands, and every
    intermediate stays < 8.6e13 << 2^63."""
    parts = [
        lsh_pairs_sql(tau=0.5, cap=8),
        """raw AS (
    SELECT a_id AS src, b_id AS dst FROM lsh_pairs
    UNION ALL
    SELECT b_id AS src, a_id AS dst FROM lsh_pairs
),
degs AS (SELECT src, count(*) AS deg FROM raw GROUP BY src),
e AS MATERIALIZED (
    SELECT raw.src, raw.dst, degs.deg FROM raw JOIN degs USING (src)
),
nodes AS MATERIALIZED (SELECT DISTINCT src FROM e),
params AS (SELECT """
        + str(RANK_UNIT)
        + """ // count(*) AS base FROM nodes),
r0 AS (SELECT src, (SELECT base FROM params) AS ru FROM nodes)""",
    ]
    for i in range(1, N_ITER + 1):
        parts.append(
            f"""c{i} AS (
    SELECT e.dst, CAST(sum(r.ru // e.deg) AS BIGINT) AS contrib
    FROM e JOIN r{i - 1} r ON e.src = r.src GROUP BY e.dst
),
r{i} AS (
    SELECT n.src,
           CAST((15 * (SELECT base FROM params)
                 + {DAMPING_PCT} * coalesce(c.contrib, 0)) // 100 AS BIGINT) AS ru
    FROM nodes n LEFT JOIN c{i} c ON n.src = c.dst
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT src AS doc_id, ru AS rank_u FROM r{N_ITER}
"""


@register("graph_pagerank", oracle=_pagerank_oracle())
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

    Ranks are int64 micro-units of a 1e12 total mass (r6 exact-oracle
    rewrite): per-edge contribution is ``rank div deg`` (truncating),
    the damping update is ``(15*base + 85*contrib) div 100`` — all
    order-independent integer arithmetic, so the result is identical
    on any partitioning and replays bit-for-bit in the unrolled-CTE
    oracle. Truncation loses < N_ITER ulps of mass per node vs the
    float version — irrelevant for hub ranking, decisive for
    verifiability.

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
    # Materialize the edge list ONCE, with the out-degree folded in:
    # without the checkpoint every iteration re-derives the whole LSH
    # candidate pipeline. localCheckpoint keeps it per-invocation (no
    # cross-run cache) — the GraphX-style iterative pattern.
    degrees = raw.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges = (
        raw.join(degrees, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    # nodes is re-joined every iteration — materialize the (tiny)
    # distinct once instead of re-shuffling edges per round.
    nodes = edges.select("src").distinct().localCheckpoint(eager=True)
    n_nodes = nodes.count()  # scalar cardinality, not a data collect
    if n_nodes == 0:  # empty corpus → empty graph, not a crash
        return spark.createDataFrame([], "doc_id bigint, rank_u bigint")
    base = RANK_UNIT // n_nodes
    ranks = nodes.withColumn("ru", F.lit(base).cast("long"))
    for _ in range(N_ITER):
        contribs = (
            edges.join(ranks, "src")
            .select("dst", F.expr("ru div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.src == contribs.dst, "left")
            .select(
                "src",
                F.expr(
                    f"(cast({15 * base} as bigint)"
                    f" + {DAMPING_PCT} * coalesce(contrib, cast(0 as bigint)))"
                    " div 100"
                ).alias("ru"),
            )
        )
    return ranks.select(
        F.col("src").alias("doc_id"), F.col("ru").alias("rank_u")
    )


def _triangles_oracle() -> str:
    """Two-join triangle replay over the shared LSH edge list: orient
    low→high (lsh_pairs already is), wedge join on the middle vertex,
    close against the edge list — pure integer counting."""
    return f"""
WITH {lsh_pairs_sql(tau=0.5, cap=8)},
p AS MATERIALIZED (
    SELECT DISTINCT a_id AS a, b_id AS b FROM lsh_pairs WHERE a_id <> b_id
),
wedges AS (
    SELECT p1.a AS x, p1.b AS y, p2.b AS z
    FROM p p1 JOIN p p2 ON p1.b = p2.a
),
tri AS (
    SELECT count(*) AS n_triangles
    FROM wedges w JOIN p ON w.x = p.a AND w.z = p.b
),
stats AS (
    SELECT count(*) AS n_edges, count(DISTINCT a) AS n_low_endpoints FROM p
)
SELECT tri.n_triangles, stats.n_edges, stats.n_low_endpoints FROM tri, stats
"""


@register("graph_triangles", oracle=_triangles_oracle())
def graph_triangles(spark, sf_dir):
    """Global triangle count over the similarity graph via the classic
    two-join plan: orient every edge low→high id (kills both duplicate
    orientations and 6x triangle overcounting), build wedges x<y<z by
    joining on the middle vertex, close them against the edge list.

    EXACT-oracle since r6: the LSH edges are engine-portable, and
    wedge-building/closing is pure integer counting (_triangles_oracle).

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
