"""Distributed PageRank over the near-duplicate graph — centrality
for canonical-document selection.

When near-dup detection (MinHash-LSH, dedup.py) links documents into
a graph, dedup keeps ONE representative per component. Min-label
(dedup_clusters) is arbitrary; a better canonical is the most
CENTRAL version — the hub a crawl's mirror pages all resemble.
PageRank over the dup graph gives exactly that signal, and is the
engine's join-aggregate ITERATIVE pattern at its purest: each
iteration is one (edges ⋈ ranks) shuffle + one aggregation, with
localCheckpoint truncating lineage per round (same discipline as
Lloyd k-means / label propagation / GD).

Determinism (cross-engine and cross-partitioning): all rank mass is
INTEGER micro-units (Q = 1e12 per unit mass). Per-edge contributions
use true integer floor division (SQL ``div``, r // deg), the damping
update is integer (15% teleport + 85% of summed contributions via
``div``) — sums of integers are order-independent, so the distributed
result is bit-identical to the pure-Python // replica pinned in tests
and to the literal-artifact DuckDB oracle (oracles.py). Floor
division leaks ≤ deg ulps of mass per node per round — a relative
error ~1e-9, irrelevant to ranking and identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.operators.dedup import minhash_lsh_pairs_capped

PR_ITERS = 10
PR_Q = 1_000_000_000_000  # integer mass units per unit rank


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized (src, dst) edges from the verified LSH pairs —
    the CAPPED relation since r8 (VERDICT r07 item 4): a k-member
    duplicate clique contributes k-1 star edges instead of C(k, 2),
    so edge volume (the iteration cost driver) is O(n * BANDS); the
    clique's mass concentrates on its representative, which is
    exactly the canonical-selection signal PageRank is here for."""
    pairs = minhash_lsh_pairs_capped(spark, sf_dir).select("doc_a", "doc_b")
    fwd = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    rev = pairs.select(
        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
    )
    return fwd.unionByName(rev)


def pagerank_frame(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(node, rank_q): integer-unit PageRank over a symmetrized edge
    list. Every node in ``edges`` has out-degree >= 1 (undirected
    graph), so there is no dangling-mass term."""
    nodes = (
        edges.select(F.col("src").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # clean corpus: no verified pairs -> empty rank table, not a
        # ZeroDivisionError on the driver
        return nodes.withColumn("rank_q", F.lit(0).cast("long"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank_q", F.lit(PR_Q // n_nodes))
    teleport = (15 * PR_Q // 100) // n_nodes
    for _ in range(iters):
        contribs = ed.join(
            ranks, ed.src == ranks.node
        ).select(
            F.col("dst").alias("node"),
            # true integer floor division (``div``), not a truncated
            # double quotient: for deg above ~2^52/rank the correctly
            # rounded double r/deg can land on floor(t)+1
            F.expr("rank_q div deg").alias("c"),
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({teleport}"
                    " + (85 * coalesce(CAST(s AS LONG), 0L)) div 100"
                    " AS LONG)"
                ).alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank): PageRank centrality of every document that
    participates in at least one verified near-dup pair — the
    canonical-selection score. Iterative, so not single-statement
    SQL — the driver oracle (oracles.pagerank_near_dup_sql) replays
    the all-integer rank loop in a sequential replica over the
    hash-green LSH-pair SQL and embeds the exact micro-unit ranks;
    tests pin the same replica and the rank-mass invariant."""
    ranks = pagerank_frame(_dup_edges(spark, sf_dir))
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round(F.col("rank_q").cast("double") / PR_Q, 9).alias("rank"),
    )
