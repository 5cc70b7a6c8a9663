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


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nodes, n_edges, n_triangles, n_wedges, closure_bp): global
    triangle census of the near-dup graph — the graph-shape
    diagnostic that separates mirror-CLIQUES (high closure) from
    chain/template drift (low closure). closure_bp is the global
    clustering coefficient 3*T / wedges in integer basis points.

    All-integer: triangles enumerate via the ORIENTED join (each
    undirected triangle a<b<c counted exactly once — the standard
    distributed triangle algorithm); wedges come from the degree
    FORMULA sum C(deg, 2), never enumeration, so a mega-clique's
    star representation costs its degree, not degree^2. Edge input
    is the capped relation (star emission above CLIQUE_CAP), the
    same O(n) bound PageRank rides; the star orientation (the
    representative is the bucket minimum, so star edges all point
    OUT of it) keeps the path join's per-node in x out product small.

    Reference scope note: no reference analogue; SURVEY.md §2.9
    near-dup graph analytics (pagerank_near_dup's diagnostic
    sibling).
    """
    e = minhash_lsh_pairs_capped(spark, sf_dir).select("doc_a", "doc_b")
    e = e.localCheckpoint(eager=True)  # three self-references below
    paths = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a"))
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    tri = paths.join(
        e.alias("e3"),
        (F.col("a") == F.col("e3.doc_a")) & (F.col("c") == F.col("e3.doc_b")),
    )
    deg = (
        e.select(F.col("doc_a").alias("node"))
        .unionAll(e.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("CAST(sum(deg) DIV 2 AS BIGINT)").alias("n_edges"),
        F.expr("CAST(sum(deg * (deg - 1L) DIV 2) AS BIGINT)").alias(
            "n_wedges"
        ),
    )
    tcount = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return stats.crossJoin(F.broadcast(tcount)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.expr(
            "CASE WHEN n_wedges > 0 THEN"
            " CAST((3L * n_triangles * 10000L) DIV n_wedges AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("closure_bp"),
    )


TRIANGLE_COUNT_SQL = f"""
WITH pairs AS ({{capped_pairs}}),
e AS (SELECT doc_a, doc_b FROM pairs),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.doc_b = e2.doc_a
  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT doc_a AS node FROM e UNION ALL SELECT doc_b AS node FROM e
  ) GROUP BY node
),
stats AS (
  SELECT count(*) AS n_nodes,
         CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       CASE WHEN n_wedges > 0
            THEN CAST((3 * n_triangles * 10000) // n_wedges AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS closure_bp
FROM stats CROSS JOIN tri
"""


def _triangle_count_sql() -> str:
    from spark_app_twitter_spark.operators.dedup import (
        MINHASH_LSH_PAIRS_CAPPED_SQL,
    )

    return TRIANGLE_COUNT_SQL.format(capped_pairs=MINHASH_LSH_PAIRS_CAPPED_SQL)


# ---------------------------------------------------------------------------
# Degree histogram: the graph-shape profile of near-duplication.
# One node-keyed reduce over the capped O(n) edge relation, then a
# |distinct-degrees|-sized rollup — dashboard output.


def degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(deg, n_nodes, share_bp): how many documents participate in
    the near-dup graph at each degree, with the share of graph nodes
    in integer basis points.

    The degree spectrum separates corpus pathologies at a glance:
    mirror cliques surface as a CLIQUE_CAP-degree spike on the star
    representative and degree-1 mass on its satellites; template
    drift spreads as a low-degree tail.

    Scale shape: degrees ride the same capped relation as PageRank /
    triangles (star emission keeps it O(n)); the histogram reduce
    lands on |distinct degrees| keys — bounded by CLIQUE_CAP x BANDS,
    corpus-independent. All-integer output.
    """
    e = minhash_lsh_pairs_capped(spark, sf_dir).select("doc_a", "doc_b")
    # deg is node-bounded and feeds the histogram AND the total —
    # checkpoint so the 2x|edges| union + reduce runs once
    # (PLANSTATS r13: 11 shuffles before truncation)
    deg = (
        e.select(F.col("doc_a").alias("node"))
        .unionAll(e.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
    tot = deg.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "deg",
            "n_nodes",
            F.expr("CAST((n_nodes * 10000L) DIV n_tot AS BIGINT)").alias(
                "share_bp"
            ),
        )
    )


DEGREE_STATS_SQL = """
WITH pairs AS ({capped_pairs}),
e AS (SELECT doc_a, doc_b FROM pairs),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT doc_a AS node FROM e UNION ALL SELECT doc_b AS node FROM e
  ) GROUP BY node
),
tot AS (SELECT count(*) AS n_tot FROM deg)
SELECT deg, count(*) AS n_nodes,
       CAST((count(*) * 10000) // max(n_tot) AS BIGINT) AS share_bp
FROM deg CROSS JOIN tot GROUP BY deg
"""


def _degree_stats_sql() -> str:
    from spark_app_twitter_spark.operators.dedup import (
        MINHASH_LSH_PAIRS_CAPPED_SQL,
    )

    return DEGREE_STATS_SQL.format(capped_pairs=MINHASH_LSH_PAIRS_CAPPED_SQL)


# ---------------------------------------------------------------------------
# Synchronous label propagation: near-dup COMMUNITIES beyond
# connected components. CC (dedup_clusters) merges everything a
# transitive chain touches; LPA keeps densely-linked cores together
# while letting thin bridges separate — the community signal a
# template-vs-mirror triage wants. Deterministic: synchronous
# rounds, votes tie-break (count DESC, label ASC), so the result is
# partitioning-independent and replayable as a fixed SQL CTE chain.

LPA_ITERS = 4


def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, community): synchronous label-propagation communities
    over the capped near-dup graph, ``LPA_ITERS`` rounds.

    Every node starts as its own label; each round every node adopts
    the most frequent label among its NEIGHBORS (count DESC, label
    ASC tie-break — deterministic, unlike textbook random-order LPA).
    A star clique converges to its representative's label in one
    round; a chain of near-dups fragments instead of collapsing, the
    behavioral difference from connected components.

    Scale shape: each round is one edges-to-labels shuffle (the
    capped O(n) relation) + one (node, label) combine + a node-keyed
    ``min_by`` reduce over the vote table. No driver-side collect.
    """
    # r16: the capped pairs underneath are the session-shared
    # checkpointed relation, so symmetrizing is a narrow map over
    # persisted blocks — re-derived per round for free, no private
    # eager checkpoint (−1 serial barrier job).
    return label_propagation_frame(_dup_edges(spark, sf_dir))


def label_propagation_frame(e: DataFrame) -> DataFrame:
    """LPA rounds over a caller-materialized symmetrized edge list —
    factored out (optimization r15) so composite consumers
    (:func:`modularity`) share ONE materialization of the capped
    pairs chain instead of re-running it per consumer.

    Optimization r15 (guide §2.3/§2.4), results bit-identical:

    - round 1 is algebraic: the initial label of every node is the
      node itself, so the first vote table is just the edge list
      read as (src, dst-as-label) — the ``distinct`` node seed and
      the first join are gone;
    - the per-round winner is one ``min_by(label, (-c, label))``
      aggregation instead of a row_number window: same unique
      winner (count DESC, label ASC — (c, label) pairs are unique
      per node after the vote combine, so the order key is strict),
      but the final exchange carries partially-aggregated rows and
      skips the window sort;
    - the per-round localCheckpoints stay (they truncate each
      round's plan so AQE replans small trees — a fully-pipelined
      4-round plan measured ~1.7x slower) but become LAZY: the
      round's label table still materializes exactly once, inside
      the consumer's job instead of as its own serial barrier job.
    """
    winner = F.min_by(
        "label",
        F.struct((-F.col("c")).alias("nc"), F.col("label").alias("lb")),
    ).alias("label")
    votes = (
        e.select(F.col("src").alias("node"), F.col("dst").alias("label"))
        .groupBy("node", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    labels = votes.groupBy("node").agg(winner).localCheckpoint(eager=False)
    for _ in range(LPA_ITERS - 1):
        votes = (
            e.join(labels, e.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = votes.groupBy("node").agg(winner).localCheckpoint(eager=False)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    )


def _lpa_sql_parts(materialize_pairs: bool = False) -> tuple[str, str]:
    """(prelude+rounds CTE chain, final label CTE name) — the LPA
    replay from the capped pairs, shared by the community query and
    the modularity audit. The chain starts at a ``pairs`` CTE and
    ends with the last ``l{i}`` round. ``materialize_pairs`` for
    consumers that reference pairs more than once (modularity's
    intra-edge count) — the LPA chain itself is linear and needs no
    hint."""
    from spark_app_twitter_spark.operators.dedup import (
        MINHASH_LSH_PAIRS_CAPPED_SQL,
    )

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(
            f"""v{i} AS (
  SELECT e.src AS node, {prev}.label, count(*) AS c
  FROM e JOIN {prev} ON e.dst = {prev}.node
  GROUP BY e.src, {prev}.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label)
             AS rnn
    FROM v{i}
  ) WHERE rnn = 1
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(rounds)
    mat = " MATERIALIZED" if materialize_pairs else ""
    return (
        f"""pairs AS{mat} ({MINHASH_LSH_PAIRS_CAPPED_SQL}),
e0 AS (SELECT doc_a, doc_b FROM pairs),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM e0
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM e0
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
{chain}""",
        prev,
    )


def _label_propagation_sql() -> str:
    """Replay the fixed synchronous rounds as a DuckDB CTE chain over
    the hash-green capped-pairs SQL — same vote, same tie-break."""
    chain, prev = _lpa_sql_parts()
    return f"""
WITH {chain}
SELECT node AS doc_id, label AS community FROM {prev}
"""


# ---------------------------------------------------------------------------
# k-core peeling: the densest-region filter. A node is in the k-core
# if it survives iterated removal of nodes with degree < k — the
# standard "which duplicate neighborhoods are DENSE (template farms,
# mirror rings) vs incidental" cut, and the preprocessing step most
# graph pipelines run before community detection.

KCORE_K = 2  # minimum surviving degree (cycle-preserving core)
KCORE_ITERS = 4  # synchronous peel rounds (monotone from above)


def kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, degree): nodes of the capped near-dup graph still
    alive after ``KCORE_ITERS`` synchronous peels at ``KCORE_K``,
    with their degree in the surviving subgraph.

    Fixed-round discipline (LPA/PageRank): each round computes
    degrees with one src-keyed reduce over the alive edge relation,
    then drops every edge touching a below-threshold endpoint (two
    semi-joins against the |keep|-sized node list). Round count is
    fixed so the DuckDB twin replays the identical chain; peeling is
    monotone, so R rounds give the exact k-core on any graph whose
    peel depth is <= R and a sound over-approximation otherwise.

    Scale shape: edge volume is the capped O(n) relation; every
    round's cost is one reduce + two hash joins on it. No driver
    state.
    """
    alive = _dup_edges(spark, sf_dir).localCheckpoint(eager=True)
    for _ in range(KCORE_ITERS):
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select("src")
        )
        alive = (
            alive.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return (
        alive.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("src").alias("doc_id"), "degree")
    )


def _kcore_sql() -> str:
    from spark_app_twitter_spark.operators.dedup import (
        MINHASH_LSH_PAIRS_CAPPED_SQL,
    )

    rounds = []
    prev = "e"
    for i in range(1, KCORE_ITERS + 1):
        # e{i}/k{i} MATERIALIZED: each round references the previous
        # edge relation twice (degree + both endpoint semi-joins);
        # DuckDB re-inlines plain CTEs, making R rounds exponential
        # over the capped-pairs chain without the hint.
        rounds.append(
            f"""k{i} AS MATERIALIZED (
  SELECT src FROM {prev} GROUP BY src HAVING count(*) >= {KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT a.src, a.dst FROM {prev} a
  JOIN k{i} s ON s.src = a.src
  JOIN k{i} d ON d.src = a.dst
)"""
        )
        prev = f"e{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS ({MINHASH_LSH_PAIRS_CAPPED_SQL}),
e0 AS (SELECT doc_a, doc_b FROM pairs),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM e0
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM e0
),
{chain}
SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS degree
FROM {prev} GROUP BY src
"""


KCORE_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# Newman modularity of the LPA communities — the quality score that
# tells a dedup pipeline whether its near-dup communities are real
# structure or noise (Q near 0), the same audit role kmeans_quality
# plays for the IVF index. Q = sum_c [ e_c/m - (d_c/(2m))^2 ] over
# communities c, with m undirected edges, e_c intra-community edges,
# d_c the community's degree sum.


def modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(community, n_nodes, intra_edges, degree_sum, q_num, q_den):
    per-community Newman modularity over the capped near-dup graph
    under the LPA labels — as the EXACT integer rational
    q_num / q_den = (4*m*e_c - d_c^2) / (4*m^2), no engine-variant
    floor-division or float rounding anywhere (Spark ``div`` and
    DuckDB ``//`` disagree on negative operands, and per-community
    contributions CAN be negative — so the rational is the contract
    and the consumer divides). Total modularity = sum(q_num) / q_den.

    Scale shape: communities come from the shared LPA chain (capped
    O(n) edges, fixed rounds); the intra-edge count is one pair join
    against the |nodes|-sized label table; degree sums are one
    node-keyed reduce. m (edge count) is a bounded driver scalar,
    the corpus_size class.
    """
    # optimization r16: the capped pair relation is the session-shared
    # checkpointed artifact (dedup.minhash_lsh_pairs_capped caches it
    # per (session, corpus)), so the private eager re-checkpoint is
    # gone — count() below materializes the shared blocks once and
    # every reference (LPA rounds, intra join, degrees) reads them.
    pairs = minhash_lsh_pairs_capped(spark, sf_dir).select("doc_a", "doc_b")
    m = pairs.count()
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    comm = label_propagation_frame(edges).localCheckpoint(eager=True)
    if m == 0:
        return comm.select(
            F.col("community"),
            F.lit(0).cast("long").alias("n_nodes"),
            F.lit(0).cast("long").alias("intra_edges"),
            F.lit(0).cast("long").alias("degree_sum"),
            F.lit(0).cast("long").alias("q_num"),
            F.lit(0).cast("long").alias("q_den"),
        ).where(F.lit(False))
    ca = comm.select(
        F.col("doc_id").alias("doc_a"), F.col("community").alias("comm_a")
    )
    cb = comm.select(
        F.col("doc_id").alias("doc_b"), F.col("community").alias("comm_b")
    )
    intra = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .where(F.col("comm_a") == F.col("comm_b"))
        .groupBy(F.col("comm_a").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    # degrees from the same symmetrized view of the checkpointed
    # pairs that fed the LPA rounds above (ADVICE r9)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    per_comm = (
        comm.join(deg, comm.doc_id == deg.node)
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    return (
        per_comm.join(intra, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("intra_edges"), F.lit(0))
            .cast("long")
            .alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            (
                F.lit(4 * m).cast("long")
                * F.coalesce(F.col("intra_edges"), F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("long")
            .alias("q_num"),
            F.lit(4 * m * m).cast("long").alias("q_den"),
        )
    )


def _modularity_sql() -> str:
    chain, prev = _lpa_sql_parts(materialize_pairs=True)
    return f"""
WITH {chain},
comm AS (SELECT node AS doc_id, label AS community FROM {prev}),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
intra AS (
  SELECT ca.community, CAST(count(*) AS BIGINT) AS intra_edges
  FROM pairs p
  JOIN comm ca ON p.doc_a = ca.doc_id
  JOIN comm cb ON p.doc_b = cb.doc_id AND ca.community = cb.community
  GROUP BY ca.community
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
per_comm AS (
  SELECT c.community,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d.deg) AS BIGINT) AS degree_sum
  FROM comm c JOIN deg d ON c.doc_id = d.node
  GROUP BY c.community
)
SELECT pc.community, pc.n_nodes,
       CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
       pc.degree_sum,
       CAST(4 * mm.m * coalesce(i.intra_edges, 0)
            - pc.degree_sum * pc.degree_sum AS BIGINT) AS q_num,
       CAST(4 * mm.m * mm.m AS BIGINT) AS q_den
FROM per_comm pc
LEFT JOIN intra i ON pc.community = i.community
CROSS JOIN mm
"""


MODULARITY_SQL = _modularity_sql()
