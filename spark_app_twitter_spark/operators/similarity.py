"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exactness baseline: broadcast
  the (small) query set against all candidates; per-pair math stays
  in codegen via higher-order functions (functions/vectors.py).
- **Random-hyperplane LSH** — the scale path: 16-bit sign buckets
  from fixed pseudo-random hyperplanes (md5-derived ±1 weights, so
  Spark / the oracle / offline Python all agree); candidates are
  pairs sharing a bucket, searched per-bucket instead of globally.
- **Label centroids** — grouped vector mean via posexplode, the
  building block for IVF-style partitioned search.

At 100 TB: brute force is O(N*Q) — viable only broadcast-side;
LSH reduces to per-bucket work at a recall cost; IVF = centroids +
search-nearest-cells.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.vectors import cosine, cosine_sql
from spark_app_twitter_spark.functions.caches import register_cache
from spark_app_twitter_spark.sources.parquet import load_table

N_QUERIES = 5  # vec_id < N_QUERIES form the query set
TOP_K = 10
N_PLANES = 8
DIM = 64


def _queries_and_cands(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return q, c


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries x all candidates.

    The cross join is BroadcastNestedLoopJoin with the tiny query
    side broadcast — each executor scans its candidate partition
    once; the window keeps k rows per query (rank on rounded cosine
    with id tie-break for determinism).
    """
    q, c = _queries_and_cands(spark, sf_dir)
    pairs = c.crossJoin(F.broadcast(q))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


KNN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos_sim
  FROM c CROSS JOIN q
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def _plane_weights(n_planes: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights from md5(plane|dim) parity.

    Computed offline in Python and inlined as literals on BOTH the
    Spark and oracle sides — no engine hash dependence at all. Row p
    depends only on p, so any prefix of the MAX_PLANES table is the
    same planes every consumer has always used.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 1 else -1)
        planes.append(row)
    return planes


# Hard ceiling for the ADAPTIVE plane count (knn_graph_multiprobe):
# 24 planes cover ceil(n / KNN_GRAPH_CAP) buckets up to n = 2^24 *
# CAP ≈ 1e9 vectors — beyond that the formula clamps and bucket
# occupancy grows linearly again (documented, guarded in tests).
MAX_PLANES = 24
_ALL_PLANES = _plane_weights(MAX_PLANES)
PLANES = _ALL_PLANES[:N_PLANES]


def _bucket_expr_for(planes: list[list[int]], vec: str, spark_side: bool) -> str:
    terms = []
    for p, row in enumerate(planes):
        if spark_side:
            warr = "array(" + ", ".join(str(w) for w in row) + ")"
            dot = (
                f"aggregate(zip_with({vec}, {warr}, (x, w) -> CAST(x AS DOUBLE) * w), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        else:
            warr = "[" + ", ".join(str(w) for w in row) + "]"
            dot = f"list_dot_product(CAST({vec} AS DOUBLE[]), CAST({warr} AS DOUBLE[]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _bucket_expr_spark(vec: str) -> str:
    """Spark SQL expr: 8-bit LSH bucket of an array<float> column."""
    return _bucket_expr_for(PLANES, vec, spark_side=True)


def _bucket_expr_duckdb(vec: str) -> str:
    return _bucket_expr_for(PLANES, vec, spark_side=False)


def planes_for(n: int) -> int:
    """Adaptive hyperplane count for the multiprobe bucket key
    (VERDICT r08 item 4): enough planes that EXPECTED bucket
    occupancy stays near the anchor cap — the smallest p with
    2^p >= ceil(n / KNN_GRAPH_CAP) — floored at the static N_PLANES
    (so small corpora keep their historical buckets) and clamped at
    MAX_PLANES. All-integer, so the SQL twin (:func:`_planes_for_sql`)
    is engine-exact."""
    m = max(1, -(-n // KNN_GRAPH_CAP))
    p = next(
        (i for i in range(MAX_PLANES + 1) if (1 << i) >= m), MAX_PLANES
    )
    return min(MAX_PLANES, max(N_PLANES, p))


def _planes_for_sql(
    count_sql: str = "(SELECT count(*) FROM embeddings)",
) -> str:
    """DuckDB scalar twin of :func:`planes_for` over count(embeddings)
    (``count_sql`` overridable so the property test can sweep n)."""
    return (
        f"(SELECT LEAST({MAX_PLANES}, GREATEST({N_PLANES},"
        f" COALESCE(MIN(p), {MAX_PLANES})))"
        f" FROM range(0, {MAX_PLANES + 1}) t(p)"
        f" WHERE (CAST(1 AS BIGINT) << p) >="
        f" ({count_sql} + {KNN_GRAPH_CAP - 1})"
        f" // {KNN_GRAPH_CAP})"
    )


def _bucket_expr_spark_np(vec: str, n_planes: int) -> str:
    """Spark bucket expr over the first ``n_planes`` shared planes."""
    return _bucket_expr_for(_ALL_PLANES[:n_planes], vec, spark_side=True)


def _bucket_expr_duckdb_np(vec: str, np_col: str) -> str:
    """DuckDB bucket over the first ``np_col`` (a column reference)
    planes of the shared MAX_PLANES table — the adaptive twin: each
    plane's bit is gated on p < np, so the same SQL text serves any
    corpus size."""
    terms = []
    for p, row in enumerate(_ALL_PLANES):
        warr = "[" + ", ".join(str(w) for w in row) + "]"
        dot = (
            f"list_dot_product(CAST({vec} AS DOUBLE[]),"
            f" CAST({warr} AS DOUBLE[]))"
        )
        terms.append(
            f"(CASE WHEN {p} < {np_col} AND {dot} > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane-sign
    bucket; exact cosine + top-k *within* the bucket.

    The equi-join on bucket replaces the cross join — at scale this
    shuffles both sides on an 8-bit key (use more planes + multiple
    tables for real recall; the structure is identical).
    """
    q, c = _queries_and_cands(spark, sf_dir)
    qb = q.withColumn("bucket", F.expr(_bucket_expr_spark("qv")))
    cb = c.withColumn("bucket", F.expr(_bucket_expr_spark("cv")))
    pairs = cb.join(F.broadcast(qb), "bucket")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


KNN_LSH_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {_bucket_expr_duckdb('embedding')} AS bucket
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv,
         {_bucket_expr_duckdb('embedding')} AS bucket
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos_sim
  FROM c JOIN q USING (bucket)
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, long format (label, dim, centroid value).

    posexplode -> groupBy (label, dim) -> exact decimal mean cast to
    double. Long format keeps the aggregation a plain shuffle
    (mergeable partials) instead of driver-side vector assembly; IVF
    search re-assembles with collect_list(dim-ordered) when needed.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    # Quantize each component to 1e-6 *before* summing: integer sums
    # are exact and order-independent, so distributed partial
    # aggregation cannot perturb the mean. (Both engines round the
    # identical IEEE double v*1e6, so quantization is reproducible;
    # a raw double sum would depend on accumulation order.)
    q = F.round(F.col("v").cast("double") * 1e6).cast("long")
    return exploded.groupBy("label", "dim").agg(
        (F.sum(q).cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias(
            "centroid_v"
        )
    )


LABEL_CENTROIDS_SQL = """
SELECT label, dim,
       CAST(sum(q) AS DOUBLE) / (count(*) * 1e6) AS centroid_v
FROM (
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS q
  FROM embeddings
)
GROUP BY label, dim
"""


N_PROBE = 2  # floor; effective probes track the adaptive cell count
PROBE_FRACTION = 4  # probe ~1/4 of the cells
COSINE_DUP_THRESHOLD = 0.35  # synthetic embeddings are near-orthogonal; real corpora use ~0.9


def n_probes_for(k: int) -> int:
    """Probe count for a k-cell index: max(N_PROBE, ⌈k/4⌉).

    With the adaptive cell count (k ∝ √n) a FIXED probe count would
    shrink the probed fraction — and hence recall — as the corpus
    grows; pinning probes to a fixed ~25% of cells keeps recall stable
    while still cutting candidate work 4× vs exhaustive search."""
    import math

    return max(N_PROBE, math.ceil(k / PROBE_FRACTION))


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN over the TWO-LEVEL trained index (VERDICT r06
    item 3): coarse-quantize into K1 Lloyd cells, fine-quantize each
    into K2 sub-cells (clustering.kmeans_cells_2level_assigned — the
    same trained artifact semdedup and the registry query share),
    probe the nearest fine cells per query, exact top-k inside them.

    Why two-level: the flat index's train AND candidate-assignment
    cost is n·k scores with k = √n — the n^1.5 wall BASELINE.md
    flagged (49.2× at 100×). Here every vector scores K1 + K2 ≈ 2√k
    centroids (coarse inline argmax, then a coarse-DISPATCHED inline
    fine argmax — both pure map expressions, no shuffle on the
    data-sized side), and training is shared through the session
    centroid caches.

    Probing is hierarchical too: top-P1 coarse cells per query
    (P1 = ⌈K1/4⌉, the flat probe fraction at the coarse level), then
    the top n_probe = max(2, ⌈K1·K2/4⌉) FINE cells among them — the
    probed fraction of the index stays ~25% like the flat variant,
    so recall holds while per-query scoring drops from k to
    K1 + P1·K2 centroids. Assignment geometry is the trainer's
    (Euclidean argmin); the final candidate scoring stays exact
    cosine.
    """
    return knn_ivf_search(
        spark, sf_dir, _query_frame(spark, sf_dir), cohort="registered"
    )


def _query_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, qv array<double>): the registered query cohort —
    ONE definition of the cohort rule (vec_id < N_QUERIES, double
    cast) for every IVF consumer."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )


# (applicationId, sf_dir, cohort) -> the UNFILTERED probe ranking
# core (query_id, cell, prk) of a FIXED query cohort (optimization
# r16, guide §2.4). The ranking depends only on the cohort's
# (query_id, qv) rows and the session centroid artifacts — it is
# independent of n_probe (the prk filter is downstream), of carry
# columns (dropped before ranking), and of the candidate side — yet
# every IVF consumer recomputed it per call. Tagged cohort:
# "registered" (vec_id < N_QUERIES — knn_ivf/rag_ivf/quantized/
# ivf_pq/mmr_rerank_ivf/probe_sensitivity). The corpus-sized English
# bitext cohort was measured and REJECTED: checkpointing its
# |q| x P1 x k2 core put an RDD boundary inside the non-broadcast
# probe join and cost +2/+3 jobs per consumer (cold probe r16) —
# corpus-sized cohorts keep cohort=None. Built inside the first
# consumer's TIMED call (the bench model region is frozen); lazily
# checkpointed; standing immutable-path eviction contract. Callers
# passing a cohort tag assert their q carries exactly that cohort's
# (query_id, qv) rows.
_PROBE_RANK_CACHE: dict[tuple, DataFrame] = register_cache({})


def ivf_probe_pairs(
    spark: SparkSession,
    sf_dir: str,
    q: DataFrame,
    cand_prep=None,
    carry_query_cols: tuple[str, ...] = (),
    n_probe: int | None = None,
    broadcast_probes: bool = True,
    cohort: str | None = None,
) -> DataFrame:
    """(query_id, qv, neighbor_id, cv, ...): each query joined to
    every candidate in its probed fine cells — the CANDIDATE-
    GENERATION stage every IVF search variant shares (exact-cosine
    knn_ivf, the int8-scored knn_ivf_quantized, streaming serve).
    ``q`` must carry (query_id, qv array<double>). All index state
    comes from the session artifact caches — searching never
    retrains.

    ``cand_prep`` (DataFrame -> DataFrame) derives per-CANDIDATE
    columns BEFORE the pair join — the hook that keeps index-side
    state (e.g. int8 codes) computed once per vector instead of once
    per (query, candidate) pair, exactly like a real index stores
    codes alongside ids. ``carry_query_cols`` names extra ``q``
    columns to thread through the probe machinery the same way.
    ``n_probe`` overrides the probe count: the default
    (n_probes_for, ~25% of cells) keeps recall stable for FIXED
    query cohorts, but corpus-sized query sets (bitext mining) must
    pin a constant — fraction-scaled probes make their pair volume
    O(n^1.5). ``broadcast_probes=False`` switches the probe->cand
    join from broadcast to a cell-keyed hash join — mandatory for
    corpus-sized cohorts, whose |q| x n_probe probe table is not
    broadcastable on a real cluster."""
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        levels_for,
    )

    k1, k2 = levels_for(corpus_size(spark, sf_dir))
    # index side: the shared two-level assignment (cached trained
    # artifact; inline shuffle-free scoring on the data-sized side)
    assigned = kmeans_cells_2level_assigned(spark, sf_dir)
    cand_cells = assigned.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    )
    if cand_prep is not None:
        cand_cells = cand_prep(cand_cells)
    probe_cells = (
        probe_rank(
            spark, sf_dir, q, carry_query_cols=carry_query_cols,
            cohort=cohort,
        )
        .where(
            F.col("prk")
            <= (n_probes_for(k1 * k2) if n_probe is None else n_probe)
        )
        .select("query_id", "qv", *carry_query_cols, "cell")
    )
    if broadcast_probes:
        probe_cells = F.broadcast(probe_cells)
    return cand_cells.join(probe_cells, "cell").drop("cell")


def probe_rank(
    spark: SparkSession,
    sf_dir: str,
    q: DataFrame,
    carry_query_cols: tuple[str, ...] = (),
    cohort: str | None = None,
) -> DataFrame:
    """(query_id, qv, ..., cell, prk): every query's fine cells
    ranked by the probe discipline, UNFILTERED — the ONE definition
    of probe ordering (coarse top-P1 inline sorted-slice, then the
    Euclidean fine score with the (score DESC, cell ASC) tie-break),
    shared by the search path (which keeps prk <= n_probe) and the
    sensitivity audit (which reads the whole ranking). Both centroid
    levels are driver-held artifacts; the only exchange is the
    per-query-bounded prk window — and that exchange is NARROW
    (query_id, cell, score): qv and the carry columns are joined
    back AFTER the ranking, so a corpus-sized query cohort (bitext
    mining) shuffles |q| x P1 x k2 slim rows instead of dragging the
    64-double vector through every ranked row (the join-back reuses
    the window's query_id partitioning; for small cohorts AQE
    broadcasts the q side).

    ``cohort`` (r16): names a FIXED query cohort whose ranking core
    is session-cached (_PROBE_RANK_CACHE) — the caller asserts its
    ``q`` carries exactly that cohort's (query_id, qv) rows. None
    (ad-hoc / streaming batches) always recomputes."""

    def rank_core() -> DataFrame:
        import math

        from spark_app_twitter_spark.functions.vectors import dot
        from spark_app_twitter_spark.operators.clustering import (
            corpus_size,
            inline_top_cells_euclid,
            kmeans_centroid_rows,
            kmeans_fine_centroid_rows,
            levels_for,
        )

        k1, k2 = levels_for(corpus_size(spark, sf_dir))
        coarse_rows = kmeans_centroid_rows(spark, sf_dir, k=k1)
        fine_rows = kmeans_fine_centroid_rows(spark, sf_dir)
        p1 = max(1, math.ceil(k1 / PROBE_FRACTION))
        probe_coarse = inline_top_cells_euclid(
            q, "query_id", "qv", coarse_rows, p1
        ).withColumnRenamed("cell", "coarse")
        fdf = spark.createDataFrame(
            fine_rows, "coarse int, fine int, fv array<double>"
        )
        fscore = F.round(
            dot(F.col("qv"), F.col("fv"))
            - dot(F.col("fv"), F.col("fv")) / F.lit(2.0),
            6,
        )
        pw = Window.partitionBy("query_id").orderBy(
            F.desc("_fs"), F.asc("cell")
        )
        return (
            probe_coarse.join(F.broadcast(fdf), "coarse")
            .withColumn(
                "cell",
                (F.col("coarse") * k2 + F.col("fine")).cast("int"),
            )
            .withColumn("_fs", fscore)
            .select("query_id", "cell", "_fs")
            .withColumn("prk", F.row_number().over(pw))
            .select("query_id", "cell", "prk")
        )

    if cohort is None:
        ranked = rank_core()
    else:
        # fixed-cohort routing table, built once per session — see
        # _PROBE_RANK_CACHE. Narrow (query_id, cell, prk) rows.
        from spark_app_twitter_spark.functions.caches import get_or_build

        key = (spark.sparkContext.applicationId, sf_dir, cohort)
        ranked = get_or_build(
            _PROBE_RANK_CACHE,
            key,
            lambda: rank_core().localCheckpoint(eager=False),
        )
    return ranked.join(
        q.select("query_id", "qv", *carry_query_cols), "query_id"
    ).select("query_id", "qv", *carry_query_cols, "cell", "prk")


def guarded_cosine(a: F.Column, b: F.Column) -> F.Column:
    """round(cosine, 6) with the zero-norm guard every SERVE path
    must share: a zero vector has no cosine direction and under
    Spark's ANSI mode the bare division THROWS (divideByZeroError) —
    degenerate pairs score -2.0 (below the cosine range) so serving
    fails SOFT and deterministically instead of killing the query."""
    from spark_app_twitter_spark.functions.vectors import dot, norm

    den = norm(a) * norm(b)
    return F.when(den == 0.0, F.lit(-2.0)).otherwise(
        F.round(dot(a, b) / den, 6)
    )


def knn_ivf_search(
    spark: SparkSession,
    sf_dir: str,
    q: DataFrame,
    cohort: str | None = None,
) -> DataFrame:
    """The SERVE half of :func:`knn_ivf`, factored so any query frame
    (the registry's fixed cohort, an ad-hoc batch, or a streaming
    micro-batch via foreachBatch) searches the same published
    two-level index: probed candidates -> exact cosine -> top-k.

    Degenerate inputs fail SOFT via :func:`guarded_cosine` (a zero
    vector in a streaming micro-batch must not kill the query); the
    registered cohort has no zero vectors, so the oracle twin is
    unaffected."""
    pairs = ivf_probe_pairs(spark, sf_dir, q, cohort=cohort)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        guarded_cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= TOP_K
    )


def _ivf_pairs_sql(
    q_body: str | None = None,
    cand_tail: str = "",
    cand_name: str = "cand_cells",
    n_probe: int | None = None,
) -> str:
    """The shared WITH-chain of every IVF search twin, ending at a
    ``pairs`` CTE (query_id, qv, neighbor_id, cv) — mirrors
    :func:`ivf_probe_pairs` exactly; variants append their scoring
    tail. ``q_body`` overrides the query-cohort CTE body (default:
    the registered vec_id < N_QUERIES cohort) — the seam the
    bitext-IVF twin uses to make ENGLISH DOCS the query side while
    the probe/candidate machinery stays the shared definition.
    ``cand_tail``/``cand_name`` mirror ivf_probe_pairs' ``cand_prep``
    hook: extra CTEs inserted after cand_cells (each ",\\n"-prefixed)
    and the relation the pairs join reads as its candidate side —
    the seam the CAPPED bitext twin uses to bound per-cell
    candidates."""
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        _centroid_score_sql,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
        levels_sql,
    )

    parts, _final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    k1_sql, k2_sql = levels_sql()
    p1_sql = (
        f"greatest(1, CAST(ceil({k1_sql} / {PROBE_FRACTION}.0) AS INT))"
    )
    n_probe_sql = (
        str(n_probe)
        if n_probe is not None
        else (
            f"greatest({N_PROBE}, "
            f"CAST(ceil({k1_sql} * {k2_sql} / {PROBE_FRACTION}.0) AS INT))"
        )
    )
    cand_cells = kmeans_2level_assigned_cte(
        "vec_id AS neighbor_id, v AS cv, cell",
        where=f"m.vec_id >= {N_QUERIES}",
    )
    if q_body is None:
        q_body = (
            f"SELECT vec_id AS query_id, v AS qv FROM emb"
            f" WHERE vec_id < {N_QUERIES}"
        )
    return f"""
WITH {chain},
cand_cells AS ({cand_cells}),{cand_tail}
q AS (
  {q_body}
),
probe_coarse AS (
  SELECT query_id, qv, coarse FROM (
    SELECT q.query_id, q.qv, c.cell AS coarse,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_centroid_score_sql('q.qv', 'c.cv')} DESC,
                                       c.cell ASC) AS crk
    FROM q CROSS JOIN c{ITERS} c
  ) WHERE crk <= {p1_sql}
),
probe_cells AS (
  SELECT query_id, qv, cell FROM (
    SELECT pc.query_id, pc.qv,
           CAST(pc.coarse * {k2_sql} + f.fine AS INT) AS cell,
           row_number() OVER (PARTITION BY pc.query_id
                              ORDER BY {_centroid_score_sql('pc.qv', 'f.fv')} DESC,
                                       CAST(pc.coarse * {k2_sql} + f.fine AS INT) ASC) AS prk
    FROM probe_coarse pc JOIN f{ITERS} f ON pc.coarse = f.coarse
  ) WHERE prk <= {n_probe_sql}
),
pairs AS (
  SELECT p.query_id, p.qv, cc.neighbor_id, cc.cv
  FROM {cand_name} cc JOIN probe_cells p USING (cell)
)"""


def _knn_ivf_sql() -> str:
    return f"""
{_ivf_pairs_sql()},
scored AS (
  SELECT query_id, neighbor_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos_sim
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


KNN_IVF_SQL = _knn_ivf_sql()


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket blocked.

    The dedup-by-meaning operator: candidate pairs must share a
    hyperplane-sign bucket (so pairwise work is per-bucket, never
    global), then the exact cosine gate keeps pairs above threshold.
    Same recall/cost dial as every LSH family member: more planes =
    smaller buckets = cheaper + lower recall.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    b = emb.withColumn("bucket", F.expr(_bucket_expr_spark("v")))
    pairs = (
        b.alias("l")
        .join(
            b.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
    )
    return pairs.where(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)


EMBEDDING_NEAR_DUP_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding AS v,
         {_bucket_expr_duckdb('embedding')} AS bucket
  FROM embeddings
)
SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
       round({cosine_sql('l.v', 'r.v')}, 6) AS cos_sim
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round({cosine_sql('l.v', 'r.v')}, 6) >= {COSINE_DUP_THRESHOLD}
"""


QUANT_BITS_SCALE = 127  # int8 symmetric quantization


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    serving-export step of a vector index (4x smaller than f32, dot
    products stay rank-faithful after per-vector rescale).

    Map-only: per-vector max|x| -> scale -> round(x*127/max). The
    scale is kept alongside so consumers can dequantize. Zero
    shuffles; at 100 TB this is scan -> codegen -> write.
    Zero-vectors take scale 0 and quantize to all-zeros (guarded
    division).

    The codes are emitted as a comma-joined string (`q8_csv`) rather
    than array<int>: the export row is a serialization boundary
    anyway, and a scalar column keeps every downstream comparator
    (including the driver's pandas canonicalizer) happy.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # round half-up matches DuckDB's round(); quantized values are
    # exact small integers so parity is bit-free
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(v, lambda x: F.round(x * QUANT_BITS_SCALE / amax).cast("int"))
    )
    return emb.select(
        "vec_id",
        F.round(amax, 6).alias("scale_max"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q8_csv"),
    )


def _q8_of(col: F.Column) -> F.Column:
    """int8 code array for any float/double array column (the one
    quantization rule, shared with :func:`quantize_embeddings`)."""
    v = F.transform(col, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(
        amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(v, lambda x: F.round(x * QUANT_BITS_SCALE / amax).cast("int"))
    )


def _q8_col() -> F.Column:
    """int8 code array for the ``embedding`` column."""
    return _q8_of(F.col("embedding"))


def _q8_list_sql_for(col: str) -> str:
    """DuckDB int8-code list for any float/double array column —
    the one quantization rule (shared with :func:`_q8_col`), so the
    brute-force and IVF quantized twins can never drift."""
    dv = f"list_transform({col}, x -> CAST(x AS DOUBLE))"
    amax = f"list_max(list_transform({dv}, x -> abs(x)))"
    return f"""
CASE WHEN {amax} = 0.0
     THEN list_transform({col}, x -> 0)
     ELSE list_transform({dv},
                         x -> CAST(round(x * {QUANT_BITS_SCALE} /
                              {amax}) AS INT))
END
"""


_Q8_LIST_SQL = _q8_list_sql_for("embedding")


def knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search over the int8-quantized index — the
    memory-bandwidth scale path a vector-serving tier actually runs
    (4x smaller scans than f32; SIMD-friendly integer dot products).

    Ranking must approximate COSINE, not raw dot — per-vector amax
    scaling gives codes different norms, so an unnormalized integer
    dot boosts large-norm candidates (measured recall 0.74 vs 0.96
    normalized). The comparator is sign(d)·d²/(|a|²·|b|²) =
    sign(cos)·cos², monotone in cosine: every term is an integer sum
    (d² ≤ ~10¹², exact in doubles), the single division is one IEEE
    op both engines execute identically — no rounding step at all.
    Plan shape matches knn_bruteforce: tiny query side broadcast,
    one window shuffle on query_id.
    """

    def idot(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _q8_col().alias("q8")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q8").alias("qq"),
        idot("q8", "q8").alias("qn2"),
    )
    c = emb.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q8").alias("cq"),
        idot("q8", "q8").alias("cn2"),
    )
    d = idot("qq", "cq")
    # Zero-norm guard: an all-zero embedding quantizes to all-zero codes
    # (qn2 or cn2 = 0) and 0/0 = NaN, which sorts greatest in both
    # engines — a zero vector would rank as every query's top neighbor.
    # Pin those scores to -2.0, below the sign·cos² range [-1, 1].
    denom = (F.col("qn2") * F.col("cn2")).cast("double")
    score = F.when(denom == 0.0, F.lit(-2.0)).otherwise(
        F.signum(d.cast("double")) * (d * d).cast("double") / denom
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", score.alias("qcos2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcos2"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= TOP_K
    )


KNN_QUANTIZED_SQL = f"""
WITH quant AS (
  SELECT vec_id, {_Q8_LIST_SQL} AS q8 FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, q8 AS qq,
         CAST(list_dot_product(CAST(q8 AS DOUBLE[]), CAST(q8 AS DOUBLE[])) AS BIGINT) AS qn2
  FROM quant WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, q8 AS cq,
         CAST(list_dot_product(CAST(q8 AS DOUBLE[]), CAST(q8 AS DOUBLE[])) AS BIGINT) AS cn2
  FROM quant WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qn2 * cn2 = 0
              THEN -2.0
              ELSE sign(d) * CAST(d * d AS DOUBLE) / CAST(qn2 * cn2 AS DOUBLE)
         END AS qcos2
  FROM (
    SELECT query_id, neighbor_id, qn2, cn2,
           CAST(list_dot_product(CAST(qq AS DOUBLE[]), CAST(cq AS DOUBLE[])) AS BIGINT) AS d
    FROM c CROSS JOIN q
  )
)
SELECT query_id, neighbor_id, qcos2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qcos2 DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# int8 pre-rank survivor count: the float rerank touches only this
# many candidates per query. 3k keeps the exact top-k safe against
# quantization rank noise (measured: int8-vs-float rank inversions
# sit well inside a 3x margin at the test SFs).
RERANK_M = 3 * TOP_K


def knn_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production vector-serving shape (IVF-PQ structure):
    two-level IVF probing bounds the candidate set, an int8 integer
    dot pre-ranks it (4x smaller scans, SIMD-friendly — the
    memory-bandwidth stage), and exact float cosine reranks only the
    RERANK_M survivors per query. Composes the engine's published
    artifacts end-to-end: trained two-level cells + the symmetric
    int8 quantization rule.

    Per-query cost at scale: (K1 + P1·K2 centroid scores) +
    (candidates-in-probed-cells int8 dots) + (RERANK_M float dots) —
    the float math never touches more than RERANK_M rows, which is
    the property that lets a serving tier keep the f32 vectors in
    cold storage. Output contract matches knn_ivf; hits differ only
    where int8 pre-rank noise differs from exact inside the probe
    set (the rerank margin absorbs it at the test SFs).
    """
    def idot(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # codes + norms are derived ONCE PER VECTOR on each side of the
    # pair join (the index stores its candidates' codes; serving
    # quantizes each query once) — never per (query, candidate) pair
    q = (
        _query_frame(spark, sf_dir)
        .withColumn("qq", _q8_of(F.col("qv")))
        .withColumn("qn2", idot("qq", "qq"))
    )
    pairs = ivf_probe_pairs(
        spark,
        sf_dir,
        q,
        cand_prep=lambda c: c.withColumn(
            "cq", _q8_of(F.col("cv"))
        ).withColumn("cn2", idot("cq", "cq")),
        carry_query_cols=("qq", "qn2"),
        cohort="registered",
    )
    quant = pairs.select(
        "query_id",
        "qv",
        "neighbor_id",
        "cv",
        idot("qq", "cq").alias("d"),
        "qn2",
        "cn2",
    )
    # same sign·cos² comparator (and zero-norm guard) as knn_quantized
    denom = (F.col("qn2") * F.col("cn2")).cast("double")
    qcos2 = F.when(denom == 0.0, F.lit(-2.0)).otherwise(
        F.signum(F.col("d").cast("double"))
        * (F.col("d") * F.col("d")).cast("double")
        / denom
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("qcos2"), F.asc("neighbor_id")
    )
    survivors = (
        quant.withColumn("qcos2", qcos2)
        .withColumn("prerank", F.row_number().over(pw))
        .where(F.col("prerank") <= RERANK_M)
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        survivors.select(
            "query_id",
            "neighbor_id",
            # guarded: the int8 pre-rank deliberately lets zero-norm
            # pairs SURVIVE at -2.0 (fail soft), so the rerank must
            # carry the same guard or ANSI mode kills the query on
            # the exact rows the pre-rank spared
            guarded_cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= TOP_K)
    )


def _knn_ivf_quantized_sql() -> str:
    qq = _q8_list_sql_for("qv").strip()
    cq = _q8_list_sql_for("cv").strip()
    i = (
        lambda a, b: f"CAST(list_dot_product(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])) AS BIGINT)"
    )
    # codes + norms per VECTOR side (distinct queries / candidates),
    # never per pair — the same cost contract the Spark path keeps
    # via cand_prep/carry_query_cols
    return f"""
{_ivf_pairs_sql()},
qcodes AS (
  SELECT query_id, qq, {i('qq', 'qq')} AS qn2
  FROM (SELECT query_id, {qq} AS qq
        FROM (SELECT DISTINCT query_id, qv FROM pairs))
),
ccodes AS (
  SELECT neighbor_id, cq, {i('cq', 'cq')} AS cn2
  FROM (SELECT neighbor_id, {cq} AS cq
        FROM (SELECT DISTINCT neighbor_id, cv FROM pairs))
),
quant AS (
  SELECT p.query_id, p.qv, p.neighbor_id, p.cv,
         {i('qc.qq', 'cc.cq')} AS d, qc.qn2, cc.cn2
  FROM pairs p
  JOIN qcodes qc USING (query_id)
  JOIN ccodes cc USING (neighbor_id)
),
survivors AS (
  SELECT query_id, qv, neighbor_id, cv FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY qcos2 DESC, neighbor_id ASC) AS prerank
    FROM (SELECT *, CASE WHEN qn2 * cn2 = 0 THEN -2.0
                         ELSE sign(d) * CAST(d * d AS DOUBLE)
                              / CAST(qn2 * cn2 AS DOUBLE)
                    END AS qcos2
          FROM quant)
  ) WHERE prerank <= {RERANK_M}
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round({cosine_sql('qv', 'cv')}, 6) DESC,
                                     neighbor_id ASC) AS rank
  FROM survivors
) WHERE rank <= {TOP_K}
"""


KNN_IVF_QUANTIZED_SQL = _knn_ivf_quantized_sql()


QUANTIZE_EMBEDDINGS_SQL = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings
),
s AS (
  SELECT vec_id, dv,
         list_max(list_transform(dv, x -> abs(x))) AS amax
  FROM v
)
SELECT vec_id,
       round(amax, 6) AS scale_max,
       array_to_string(
         CASE WHEN amax = 0.0 THEN list_transform(dv, x -> 0)
              ELSE list_transform(dv, x -> CAST(round(x * {QUANT_BITS_SCALE} / amax) AS INT))
         END, ',') AS q8_csv
FROM s
"""


# Multi-table LSH: L independent hyperplane tables; a candidate pair
# needs to collide in ANY table. Recall ~ 1-(1-p^k)^L for per-plane
# agreement p — tunable without touching the plan shape.
N_TABLES = 6
PLANES_PER_TABLE = 4


def _table_planes() -> list[list[list[int]]]:
    """[table][plane][dim] ±1 weights, md5(table|plane|dim) parity —
    same offline-literal trick as the single-table variant."""
    tables = []
    for t in range(N_TABLES):
        planes = []
        for p in range(PLANES_PER_TABLE):
            row = []
            for d in range(DIM):
                h = hashlib.md5(f"{t}|{p}|{d}".encode()).hexdigest()
                row.append(1 if int(h[0], 16) % 2 == 1 else -1)
            planes.append(row)
        tables.append(planes)
    return tables


TABLE_PLANES = _table_planes()


def _tables_expr(vec: str, spark_side: bool) -> str:
    """Array of per-table buckets (index = table id)."""
    buckets = ", ".join(
        f"({_bucket_expr_for(planes, vec, spark_side)})" for planes in TABLE_PLANES
    )
    return f"array({buckets})" if spark_side else f"[{buckets}]"


def knn_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH ANN: candidates collide in ANY of N_TABLES
    hash tables — the standard recall fix for sign-bucket LSH (the
    single-table variant keeps the minimal structure; this is the
    production shape).

    Plan: each side computes its bucket ARRAY once (map-side),
    posexplodes to (table, bucket) rows, equi-joins on the pair,
    dedups candidate pairs, then exact-scores only the survivors.
    Shuffle rows are (id, table, bucket) — narrow; vectors re-join
    for scoring only on surviving candidates, exactly like the
    MinHash-LSH banding discipline in dedup.py.
    """
    q, c = _queries_and_cands(spark, sf_dir)
    qb = q.select(
        "query_id",
        F.posexplode(F.expr(_tables_expr("qv", True))).alias("t", "bucket"),
    )
    cb = c.select(
        "neighbor_id",
        F.posexplode(F.expr(_tables_expr("cv", True))).alias("t", "bucket"),
    )
    cand = qb.join(cb, ["t", "bucket"]).select("query_id", "neighbor_id").distinct()
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def _knn_lsh_multi_sql() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {_tables_expr('embedding', False)} AS buckets
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv,
         {_tables_expr('embedding', False)} AS buckets
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
qb AS (
  SELECT query_id, u.t, u.b FROM (
    SELECT query_id, unnest(list_transform(range(1, {N_TABLES} + 1),
                                           i -> {{'t': i, 'b': buckets[i]}})) AS u
    FROM q)
),
cb AS (
  SELECT neighbor_id, u.t, u.b FROM (
    SELECT neighbor_id, unnest(list_transform(range(1, {N_TABLES} + 1),
                                              i -> {{'t': i, 'b': buckets[i]}})) AS u
    FROM c)
),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.b = cb.b
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round({cosine_sql('q.qv', 'c.cv')}, 6) AS cos_sim
  FROM cand JOIN q ON cand.query_id = q.query_id
            JOIN c ON cand.neighbor_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


KNN_LSH_MULTI_SQL = _knn_lsh_multi_sql()


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column:
    (dim, n_vecs, mean_v, min_v, max_v) — the model-diagnostics pass
    that catches dead dimensions (constant value), scale drift
    between embedding-model versions, and normalization bugs before
    an index is built over the corpus.

    posexplode -> groupBy(dim): one narrow shuffle of (dim, value)
    rows, mergeable partials, |dims| output rows. Mean uses the
    engine-wide exact trick — quantize to 1e-6 integers before the
    sum (order-independent), divide once at the end.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("dim", "v"))
    xd = F.col("v").cast("double")
    q = F.round(xd * 1e6).cast("long")
    return exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum(q).cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias(
            "mean_v"
        ),
        F.round(F.min(xd), 6).alias("min_v"),
        F.round(F.max(xd), 6).alias("max_v"),
    )


EMBEDDING_DIM_STATS_SQL = """
SELECT dim,
       count(*) AS n_vecs,
       CAST(sum(q) AS DOUBLE) / (count(*) * 1e6) AS mean_v,
       round(min(x), 6) AS min_v,
       round(max(x), 6) AS max_v
FROM (
  SELECT unnest(range(len(embedding))) AS dim,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
         unnest(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS q
  FROM embeddings
)
GROUP BY dim
"""


_QUANT_EMBED_EXPR = (
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS LONG))"
)


def _quantized_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One column ``q``: the 1e-6-quantized integer embedding — THE
    shared front end of covariance and PCA training (one definition,
    so the two can never drift and break exact-centering parity)."""
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    return emb.select(F.expr(_QUANT_EMBED_EXPR).alias("q"))


def _dim_sums(qv: DataFrame) -> DataFrame:
    """(dim, sd, n): exact per-dimension integer sums + count."""
    return (
        qv.select(F.posexplode("q").alias("dim", "qx"))
        .groupBy("dim")
        .agg(
            F.sum(F.col("qx").cast("decimal(38,0)")).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding columns:
    (i, j, n_vecs, cov) for 0 <= i <= j < dim — the diagnostics pass
    behind whitening, PCA pre-checks, and detecting correlated /
    redundant dimensions before building an index.

    Scale shape: each row emits its d(d+1)/2 quantized products via
    one JVM-side nested transform + explode; map-side partial
    aggregation collapses EVERY partition to <= d(d+1)/2 rows before
    the shuffle, so shuffle bytes are O(partitions * dim^2) and
    independent of corpus size. Per-dim mean sums ride the same
    pattern (|dim| rows), joined broadcast. At dim >~ 2048 switch to
    a blocked Gram-matrix aggregation instead of explode.

    Determinism: elements quantized to 1e-6 integers, all sums exact
    (decimal); ONE identical IEEE chain at the end — no float round,
    so no cross-engine tie to break.
    """
    # d(d+1)/2 products per row dominate the scan: spread the
    # single-row-group file across cores before the explode.
    # Pair emission is TWO chained position explodes + a scalar
    # element_at product — all codegen'd. The r4..r12 shape (one
    # explode of a nested transform building an array of 2080
    # structs) ran the lambdas INTERPRETED (higher-order functions
    # sit outside whole-stage codegen) and measured 13.2 s vs 1.4 s
    # at the 100x fixture (r13 A/B, worklog/r13_notes.md — the
    # lang-ID lesson applied here).
    qv = _quantized_vectors(spark, sf_dir)
    pairs = (
        qv.select(
            "q", F.explode(F.sequence(F.lit(0), F.size("q") - 1)).alias("i")
        )
        .select(
            "q",
            "i",
            F.explode(F.sequence(F.col("i"), F.size("q") - 1)).alias("j"),
        )
        .select(
            "i",
            "j",
            (
                F.expr("element_at(q, i + 1)") * F.expr("element_at(q, j + 1)")
            ).alias("p"),
        )
    )
    agg = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("sp"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    dims = _dim_sums(qv)
    mi = dims.select(F.col("dim").alias("i"), F.col("sd").alias("si"))
    mj = dims.select(F.col("dim").alias("j"), F.col("sd").alias("sj"))
    n = F.col("n_vecs").cast("double")
    cov = (
        F.col("sp").cast("double") / n
        - (F.col("si").cast("double") / n) * (F.col("sj").cast("double") / n)
    ) / F.lit(1e12)
    return (
        agg.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select("i", "j", "n_vecs", cov.alias("cov"))
    )


EMBEDDING_COVARIANCE_SQL = """
WITH qv AS (
  SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
  FROM embeddings
),
pl AS (
  SELECT unnest(flatten(list_transform(range(1, len(q) + 1), i ->
           list_transform(range(i, len(q) + 1), j ->
             {'i': i - 1, 'j': j - 1, 'p': q[i] * q[j]})))) AS s
  FROM qv
),
agg AS (
  SELECT s.i AS i, s.j AS j, sum(s.p) AS sp, count(*) AS n_vecs
  FROM pl GROUP BY s.i, s.j
),
m AS (
  SELECT dim, sum(qx) AS sd
  FROM (SELECT unnest(range(len(q))) AS dim, unnest(q) AS qx FROM qv)
  GROUP BY dim
)
SELECT a.i, a.j, a.n_vecs,
       (CAST(a.sp AS DOUBLE) / CAST(a.n_vecs AS DOUBLE)
        - (CAST(mi.sd AS DOUBLE) / CAST(a.n_vecs AS DOUBLE))
          * (CAST(mj.sd AS DOUBLE) / CAST(a.n_vecs AS DOUBLE))) / 1e12 AS cov
FROM agg a
JOIN m mi ON a.i = mi.dim
JOIN m mj ON a.j = mj.dim
"""


# ---------------------------------------------------------------------------
# PCA projection: covariance -> driver-side eigendecomposition of the
# DIM x DIM matrix -> broadcast components -> JVM-side projection.
PCA_COMPONENTS = 2


# Trained PCA axes, keyed by (spark app, data dir, k) — the same
# publish-once artifact discipline as the centroid and BPE-merge
# caches (and the same immutable-path contract).
_PCA_CACHE: dict[tuple[str, str, int], tuple[list, list]] = register_cache({})


def clear_pca_cache() -> None:
    """Drop trained PCA axes (e.g. after rewriting a dataset path
    in-session) — the parallel of clustering.clear_centroid_cache
    and textstats.clear_merges_cache."""
    _PCA_CACHE.clear()


def _pca_axes(spark: SparkSession, sf_dir: str, k: int):
    """Top-k principal axes (and the per-dim means) of the embedding
    corpus. The eigendecomposition runs on the DRIVER over the
    DIM x DIM covariance matrix — deliberately: covariance is the
    distributed reduction (shuffle bytes O(partitions * dim^2),
    independent of corpus size, see embedding_covariance); the eig of
    a 64x64 symmetric matrix is microseconds of numpy and is model
    state, exactly like the k-means centroids the IVF index trains.

    Determinism: covariance is exact (quantized integer sums), and
    each eigenvector's sign is canonicalized so its largest-magnitude
    coordinate is positive (first index on ties) — numpy's sign
    choice is implementation-defined, the canonical form is not.

    Optimization r15: the distributed work (covariance reduction +
    dim sums) is k-INDEPENDENT — the full DIM-axis decomposition is
    trained once per (session, corpus) and every k-request slices its
    prefix (identical values: the per-axis canonicalization does not
    look at k, and argsort over the same vals picks the same order),
    so pca_project (k=2) and whiten (k=8) share ONE training pass.
    """
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir, k)
    cached = _PCA_CACHE.get(key)
    if cached is not None:
        return cached
    full_key = (spark.sparkContext.applicationId, sf_dir, None)
    full = _PCA_CACHE.get(full_key)
    if full is None:
        cov_rows = embedding_covariance(spark, sf_dir).collect()
        d = max(r.j for r in cov_rows) + 1
        cov = np.zeros((d, d))
        for r in cov_rows:
            cov[r.i, r.j] = r.cov
            cov[r.j, r.i] = r.cov
        vals, vecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(vals)[::-1]
        comps_all = []
        for idx in order:
            v = vecs[:, idx]
            pivot = int(np.argmax(np.abs(np.round(v, 9))))
            if v[pivot] < 0:
                v = -v
            comps_all.append([float(x) for x in v])
        eigvals_all = [float(vals[idx]) for idx in order]
        # per-dim means (for centering): the SAME _dim_sums reduction
        # the covariance uses — shared definition, no copy-paste
        # drift. (A second bounded job, but d rows vs the d(d+1)/2-row
        # covariance reduction that dominates.)
        sums = _dim_sums(_quantized_vectors(spark, sf_dir)).collect()
        means = [0.0] * d
        for r in sums:
            means[r.dim] = float(r.sd) / (float(r.n) * 1e6)
        full = (comps_all, means, eigvals_all)
        _PCA_CACHE[full_key] = full
    out = (full[0][:k], full[1], full[2][:k])
    _PCA_CACHE[key] = out
    return out


def _pca_components(spark: SparkSession, sf_dir: str, k: int):
    comps, means, _ = _pca_axes(spark, sf_dir, k)
    return comps, means


def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the corpus's top principal axes:
    (vec_id, pc1, pc2) — the dimensionality-reduction / whitening
    front half of embedding visualization, outlier pruning, and
    cheap pre-filters before exact cosine.

    The projection itself is one broadcast-literal dot product per
    component, zip_with/aggregate JVM-side over the scan — no shuffle
    at all after the (bounded) covariance reduction that trains the
    axes. The eig training step is not single-statement SQL — the
    driver oracle (oracles.embedding_pca_sql) trains its own axes
    from DuckDB's exact integer sums + the same numpy eigh and emits
    the projection as real SQL with literal axes; unit tests pin
    parity against numpy PCA on the collected corpus and the
    variance ordering property.
    """
    comps, means = _pca_components(spark, sf_dir, PCA_COMPONENTS)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    centered = F.expr(
        "transform(embedding, (x, i) ->"
        " CAST(x AS DOUBLE) - element_at(_pca_means, i + 1))"
    )
    out = emb.withColumn(
        "_pca_means", F.array(*[F.lit(m) for m in means])
    ).withColumn("_c", centered)
    cols = [F.col("vec_id")]
    for ci, comp in enumerate(comps):
        axis = F.array(*[F.lit(x) for x in comp])
        proj = F.aggregate(
            F.zip_with(F.col("_c"), axis, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(proj, 6).alias(f"pc{ci + 1}"))
    return out.select(*cols)


# Whitening keeps more axes than the 2-component visualization
# projection; 1/sqrt(eig) factors below this floor zero out instead
# of exploding a numerically-dead direction.
WHITEN_COMPONENTS = 8
WHITEN_EIG_FLOOR = 1e-12


def whiten_factors(eigvals: list[float]) -> list[float]:
    """1/sqrt(eig) per kept axis, 0.0 for non-positive/dead axes —
    ONE definition shared by the operator and the oracle replica so
    the literal factors can never fork."""
    import math as _math

    return [
        (1.0 / _math.sqrt(v)) if v > WHITEN_EIG_FLOOR else 0.0
        for v in eigvals
    ]


def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, z1..z{W}): PCA-whitened coordinates — the isotropy
    FIX that pairs with the embedding_isotropy audit: each kept axis
    is the centered projection scaled by 1/sqrt(eigenvalue), so the
    whitened population has unit variance per axis (standard
    preprocessing before cosine retrieval / SemDeDup when the
    spectrum is anisotropic; e.g. Su et al. 2021, arXiv:2103.15316
    "Whitening Sentence Representations").

    Scale shape: identical to embedding_pca_project — the only
    distributed work is the bounded covariance reduction at train
    time; serving is a pure map of broadcast-literal dot products
    (zip_with/aggregate JVM-side), zero shuffles. The 1/sqrt(eig)
    factors are driver floats embedded as literals, so the oracle's
    replica lands on bit-identical doubles (same exact-integer
    covariance, same numpy eigh).
    """
    comps, means, eigvals = _pca_axes(spark, sf_dir, WHITEN_COMPONENTS)
    factors = whiten_factors(eigvals)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    centered = F.expr(
        "transform(embedding, (x, i) ->"
        " CAST(x AS DOUBLE) - element_at(_pca_means, i + 1))"
    )
    out = emb.withColumn(
        "_pca_means", F.array(*[F.lit(m) for m in means])
    ).withColumn("_c", centered)
    cols = [F.col("vec_id")]
    for ci, (comp, inv) in enumerate(zip(comps, factors)):
        axis = F.array(*[F.lit(x) for x in comp])
        proj = F.aggregate(
            F.zip_with(F.col("_c"), axis, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(proj * F.lit(inv), 6).alias(f"z{ci + 1}"))
    return out.select(*cols)


# Incremental index maintenance: new arrivals (the corpus_delta
# "added" cohort — the SAME modulus versioning.ADDED_MOD uses, so
# the CDC delta and these reports slice identical arrivals) are
# assigned with the PUBLISHED centroids — production retrains
# offline on a cadence and appends online, because retraining per
# arrival would re-shuffle the corpus.
from spark_app_twitter_spark.operators.versioning import ADDED_MOD as IVF_APPEND_MOD  # noqa: E501


def ivf_probe_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_probe_budget, n_exact, n_reachable, recall): the
    recall-vs-cost CURVE of the two-level index — for every probe
    budget p up to the default, the fraction of exact top-k hits
    whose cell a query would reach probing only its p best fine
    cells. ann_recall_audit answers "is recall OK at the default?";
    this is the TUNING artifact that says what the next probe buys —
    what an index operator reads before trading latency for recall.

    Scale shape: the exact side is the sampled-cohort audit (same
    contract as ann_recall_audit); everything else is k-rows-per-
    query joins plus a |budgets| x |hits| explode — all bounded by
    the audit cohort, never the corpus.
    """
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        levels_for,
    )

    k1, k2 = levels_for(corpus_size(spark, sf_dir))
    n_probe = n_probes_for(k1 * k2)
    exact = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    cand = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .where(F.col("vec_id") >= N_QUERIES)
        .select(F.col("vec_id").alias("neighbor_id"), "cell")
    )
    # the shared probe RANKING (probe_rank — the one definition the
    # search path also consumes), prk kept unfiltered
    probes = probe_rank(
        spark, sf_dir, _query_frame(spark, sf_dir), cohort="registered"
    ).select("query_id", "cell", "prk")
    hits = exact.join(cand, "neighbor_id").join(
        probes, ["query_id", "cell"], "left_outer"
    )
    budgets = spark.range(1, n_probe + 1).select(
        F.col("id").cast("int").alias("n_probe_budget")
    )
    return (
        hits.crossJoin(F.broadcast(budgets))
        .groupBy("n_probe_budget")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(
                F.when(F.col("prk") <= F.col("n_probe_budget"), 1).otherwise(0)
            ).cast("long").alias("n_reachable"),
        )
        .select(
            "n_probe_budget",
            "n_exact",
            "n_reachable",
            F.round(
                F.col("n_reachable").cast("double")
                / F.col("n_exact").cast("double"),
                6,
            ).alias("recall"),
        )
    )


def _ivf_probe_sensitivity_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        _centroid_score_sql,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
        levels_sql,
    )

    parts, _final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    k1_sql, k2_sql = levels_sql()
    p1_sql = (
        f"greatest(1, CAST(ceil({k1_sql} / {PROBE_FRACTION}.0) AS INT))"
    )
    n_probe_sql = (
        f"greatest({N_PROBE}, "
        f"CAST(ceil({k1_sql} * {k2_sql} / {PROBE_FRACTION}.0) AS INT))"
    )
    cand = kmeans_2level_assigned_cte(
        "vec_id AS neighbor_id, cell", where=f"m.vec_id >= {N_QUERIES}"
    )
    return f"""
WITH {chain},
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT e.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cosine_sql('e.v', 'c.v')}, 6) DESC,
                                       c.vec_id ASC) AS rank
    FROM emb e JOIN emb c ON e.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
  ) WHERE rank <= {TOP_K}
),
cand AS ({cand}),
q AS (
  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}
),
probe_coarse AS (
  SELECT query_id, qv, coarse FROM (
    SELECT q.query_id, q.qv, c.cell AS coarse,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_centroid_score_sql('q.qv', 'c.cv')} DESC,
                                       c.cell ASC) AS crk
    FROM q CROSS JOIN c{ITERS} c
  ) WHERE crk <= {p1_sql}
),
probes AS (
  SELECT query_id, cell, prk FROM (
    SELECT pc.query_id,
           CAST(pc.coarse * {k2_sql} + f.fine AS INT) AS cell,
           row_number() OVER (PARTITION BY pc.query_id
                              ORDER BY {_centroid_score_sql('pc.qv', 'f.fv')} DESC,
                                       CAST(pc.coarse * {k2_sql} + f.fine AS INT) ASC) AS prk
    FROM probe_coarse pc JOIN f{ITERS} f ON pc.coarse = f.coarse
  )
),
hits AS (
  SELECT e.query_id, p.prk
  FROM exact e
  JOIN cand c ON e.neighbor_id = c.neighbor_id
  LEFT OUTER JOIN probes p
    ON e.query_id = p.query_id AND c.cell = p.cell
),
budgets AS (
  SELECT CAST(unnest(range(1, {n_probe_sql} + 1)) AS INT) AS n_probe_budget
)
SELECT b.n_probe_budget,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN h.prk <= b.n_probe_budget THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reachable,
       round(CAST(sum(CASE WHEN h.prk <= b.n_probe_budget THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM hits h CROSS JOIN budgets b
GROUP BY b.n_probe_budget
"""


IVF_PROBE_SENSITIVITY_SQL = _ivf_probe_sensitivity_sql()


def ivf_index_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, coarse, fine, n_members, centroid_q6_csv): the published
    two-level index AS A TABLE — what an offline index-build job
    writes and every serving tier (batch knn_ivf, streaming annserve,
    the append monitor) reads. One row per surviving fine cell: the
    flattened cell id, its tree coordinates, its member count from
    the candidate assignment, and the centroid quantized to 1e-6
    integer components (csv of exact integers — floats don't
    round-trip identically through two engines' string formatters,
    round(x*1e6) BIGINTs do).

    Scale shape: the centroid side is the k-row driver artifact; the
    member count is one cell-keyed rollup of the shared assignment.
    """
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        kmeans_fine_centroid_rows,
        levels_for,
    )

    _, k2 = levels_for(corpus_size(spark, sf_dir))
    counts = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .where(F.col("vec_id") >= N_QUERIES)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    from decimal import ROUND_HALF_UP, Decimal

    def q6(x: float) -> int:
        # half-AWAY-from-zero on the EXACT value of the double,
        # matching both the SQL twin's round() and Spark's
        # F.round (BigDecimal HALF_UP). Neither Python round()
        # (half-to-even) nor floor(abs(v)+0.5) (the +0.5 can round
        # UP in floating point for v one ulp below .5) agrees on
        # boundary values; Decimal(double) is exact so this does.
        return int(
            Decimal(x * 1e6).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    fine_rows = kmeans_fine_centroid_rows(spark, sf_dir)
    cents = spark.createDataFrame(
        [
            (
                int(co * k2 + fi),
                int(co),
                int(fi),
                ",".join(str(q6(x)) for x in fv),
            )
            for co, fi, fv in fine_rows
        ],
        "cell int, coarse int, fine int, centroid_q6_csv string",
    )
    # left join: a fine cell can survive training yet hold only query
    # vectors — export it with 0 members rather than dropping it
    return cents.join(F.broadcast(counts), "cell", "left_outer").select(
        "cell",
        "coarse",
        "fine",
        F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias(
            "n_members"
        ),
        "centroid_q6_csv",
    )


def _ivf_index_export_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
        levels_sql,
    )

    parts, _final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    _, k2_sql = levels_sql()
    member_cells = kmeans_2level_assigned_cte(
        "cell", where=f"m.vec_id >= {N_QUERIES}"
    )
    return f"""
WITH {chain},
counts AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_members
  FROM ({member_cells}) GROUP BY cell
)
SELECT CAST(f.coarse * {k2_sql} + f.fine AS INT) AS cell,
       f.coarse, f.fine,
       COALESCE(c.n_members, 0) AS n_members,
       array_to_string(list_transform(f.fv,
           x -> CAST(round(x * 1e6) AS BIGINT)), ',') AS centroid_q6_csv
FROM f{ITERS} f
LEFT OUTER JOIN counts c
  ON CAST(f.coarse * {k2_sql} + f.fine AS INT) = c.cell
"""


IVF_INDEX_EXPORT_SQL = _ivf_index_export_sql()


def ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, n_old, n_new, growth_pct): the IVF index freshness
    report after appending the delta — existing members vs arrivals
    per cell, with the growth ratio that tells the maintainer when a
    cell is hot enough to warrant the offline retrain.

    The audited index IS knn_ivf's: the same CANDIDATE set (query
    vectors excluded) assigned by the same shared TWO-LEVEL trained
    artifact (clustering.kmeans_cells_2level_assigned — coarse-then-
    fine inline Euclidean maps; VERDICT r06 item 3 made that the
    index every IVF consumer reads). Scale shape: shuffle-free
    scoring, |cells|-row rollup. The delta never triggers retraining
    — that is the operator's contract, not an omission.
    """
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )

    assigned = kmeans_cells_2level_assigned(spark, sf_dir).where(
        F.col("vec_id") >= N_QUERIES
    )
    is_new = F.pmod(F.col("vec_id"), F.lit(IVF_APPEND_MOD)) == 0
    out = assigned.groupBy("cell").agg(
        F.sum(F.when(~is_new, 1).otherwise(0)).cast("long").alias("n_old"),
        F.sum(F.when(is_new, 1).otherwise(0)).cast("long").alias("n_new"),
    )
    return out.select(
        "cell",
        "n_old",
        "n_new",
        F.when(
            F.col("n_old") > 0,
            F.round(
                F.col("n_new").cast("double")
                / F.col("n_old").cast("double")
                * 100.0,
                4,
            ),
        ).alias("growth_pct"),
    )


def _ivf_index_append_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
    )

    parts, _final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    assigned = kmeans_2level_assigned_cte(
        "vec_id, cell", where=f"m.vec_id >= {N_QUERIES}"
    )
    return f"""
WITH {chain},
assigned AS ({assigned}),
rolled AS (
  SELECT cell,
         CAST(sum(CASE WHEN vec_id % {IVF_APPEND_MOD} != 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_old,
         CAST(sum(CASE WHEN vec_id % {IVF_APPEND_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM assigned GROUP BY cell
)
SELECT cell, n_old, n_new,
       CASE WHEN n_old > 0
            THEN round(CAST(n_new AS DOUBLE) / CAST(n_old AS DOUBLE) * 100.0,
                       4)
       END AS growth_pct
FROM rolled
"""


IVF_INDEX_APPEND_SQL = _ivf_index_append_sql()


def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, mean_old, mean_new, shift): per-dimension mean shift
    between the published corpus and the arriving delta (the
    IVF_APPEND_MOD cohorts) — the drift monitor that catches an
    embedding-model version change before stale centroids silently
    degrade recall. A nonzero corpus-wide shift profile is the
    retrain trigger :func:`ivf_index_append`'s growth report cannot
    see (growth counts vectors; drift sees the space move).

    Same exact-mean discipline as embedding_dim_stats: quantized
    integer sums per (dim, cohort) — one narrow shuffle, 2*|dims|
    aggregate rows, map-side combined.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    is_new = F.pmod(F.col("vec_id"), F.lit(IVF_APPEND_MOD)) == 0
    exploded = emb.select(
        is_new.alias("is_new"), F.posexplode("embedding").alias("dim", "v")
    )
    q = F.round(F.col("v").cast("double") * 1e6).cast("long")
    per = exploded.groupBy("dim", "is_new").agg(
        (F.sum(q).cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias(
            "mean_v"
        )
    )
    old = per.where(~F.col("is_new")).select(
        "dim", F.col("mean_v").alias("mean_old")
    )
    new = per.where(F.col("is_new")).select(
        "dim", F.col("mean_v").alias("mean_new")
    )
    # raw IEEE values, NOT rounded: both engines produce bit-identical
    # quantized-sum divisions, while round() at a half-ulp boundary
    # can disagree across engines (observed at dim 16, 6th decimal)
    return old.join(new, "dim").select(
        "dim",
        "mean_old",
        "mean_new",
        (F.col("mean_new") - F.col("mean_old")).alias("shift"),
    )


EMBEDDING_DRIFT_SQL = f"""
WITH per AS (
  SELECT dim, is_new,
         CAST(sum(q) AS DOUBLE) / (count(*) * 1e6) AS mean_v
  FROM (
    SELECT vec_id % {IVF_APPEND_MOD} = 0 AS is_new,
           unnest(range(len(embedding))) AS dim,
           unnest(list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS q
    FROM embeddings
  )
  GROUP BY dim, is_new
)
SELECT o.dim,
       o.mean_v AS mean_old,
       n.mean_v AS mean_new,
       n.mean_v - o.mean_v AS shift
FROM per o JOIN per n ON o.dim = n.dim
WHERE NOT o.is_new AND n.is_new
"""


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_exact, n_hit, recall): per-query recall@k of the
    IVF index against exact brute-force — the ANN quality audit as a
    first-class QUERY (not just a test assertion), so a pipeline can
    alert on recall regressions after every index rebuild. Both
    sides are deterministic, so the audit itself is oracle-checkable.

    Scale note: this is an AUDIT — production runs it over a sampled
    query set (here the fixed query cohort), because the exact side
    scores the corpus per query by construction. The IVF side stays
    candidate-bounded; the join is k-rows-per-query tiny.
    """
    exact = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = knn_ivf(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.hit_id),
        "left_outer",
    ).select(exact.query_id, "neighbor_id", "hit_id")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("hit_id").alias("n_hit"),
        F.round(
            F.count("hit_id").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("recall"),
    )


def _ann_recall_audit_sql() -> str:
    return f"""
WITH exact AS (
{KNN_BRUTEFORCE_SQL.strip()}
),
approx AS (
{KNN_IVF_SQL.strip()}
)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
       round(CAST(count(a.neighbor_id) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS recall
FROM exact e
LEFT OUTER JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


ANN_RECALL_AUDIT_SQL = _ann_recall_audit_sql()


# Far-from-centroid gate: vectors whose own-cell centroid cosine
# falls below this are curation outliers (mislabeled / OOD / noise
# candidates — the CLIP-filtering shape). Chosen below the corpus's
# p25 (~0.29 at the test SFs) so the flag discriminates.
OUTLIER_SIM = 0.25


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, centroid_sim, is_outlier): every vector scored
    against ITS OWN cell centroid — the distance-to-prototype signal
    data curation prunes on (far-from-every-cluster points are noise
    or out-of-distribution, the complement of SemDeDup's
    too-close-to-something points).

    The cells are the TWO-LEVEL trained index (VERDICT r06 item 3 —
    the same shared artifact knn_ivf and semdedup consume), so the
    cold path trains 2√k-per-vector, not the flat n·k. Scale shape:
    assignment is the cached coarse-then-fine inline map; the
    centroid re-join broadcasts the |cells|-row fine table; the
    scoring is map-side vector math. No pairwise work at all.
    """
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        kmeans_fine_centroid_rows,
        levels_for,
    )

    _, k2 = levels_for(corpus_size(spark, sf_dir))
    assigned = kmeans_cells_2level_assigned(spark, sf_dir)
    fine_rows = kmeans_fine_centroid_rows(spark, sf_dir)
    cents = spark.createDataFrame(
        [(int(co * k2 + fi), fv) for co, fi, fv in fine_rows],
        "cell int, ccv array<double>",
    )
    sim = F.round(cosine(F.col("v"), F.col("ccv")), 6)
    return (
        assigned.join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            "cell",
            sim.alias("centroid_sim"),
            (sim < F.lit(OUTLIER_SIM)).alias("is_outlier"),
        )
    )


def _embedding_outliers_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    assigned = kmeans_2level_assigned_cte("vec_id, v, coarse, fine, cell")
    return f"""
WITH {chain},
assigned AS ({assigned})
SELECT a.vec_id, a.cell,
       round({cosine_sql('a.v', 'f.fv')}, 6) AS centroid_sim,
       round({cosine_sql('a.v', 'f.fv')}, 6) < {OUTLIER_SIM} AS is_outlier
FROM assigned a JOIN f{ITERS} f
  ON a.coarse = f.coarse AND a.fine = f.fine
"""


EMBEDDING_OUTLIERS_SQL = _embedding_outliers_sql()


# Hard-negative band floor: a rank>1 neighbor this close to the query
# is a HARD negative (confusable, high training signal); anything
# farther is an easy negative the miner drops. Set just below the
# corpus's rank>1 median (~0.29 at the test SFs) so the gate
# discriminates. Real corpora tune this against their sim histogram.
HARD_NEG_FLOOR = 0.28


def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, pos_id, pos_sim, neg_id, neg_sim, neg_rank, margin):
    contrastive-training pair mining over the ANN result — for each
    query, the top-1 neighbor is the POSITIVE and every other
    retrieved neighbor inside the hard band (cos >= HARD_NEG_FLOOR)
    is a HARD NEGATIVE, with the pos-neg margin the loss would see.
    This is the data-engine half of training an embedding model
    (contrastive/InfoNCE mining from an index).

    Scale shape: the mining itself is one first-value window + a map
    over the k-rows-per-query retrieval table — bounded by whatever
    produces that table. The REGISTERED variant mines the EXACT
    brute-force top-k over the sampled query cohort (the same
    corpus-scoring audit contract as ann_recall_audit — exactness
    matters when the pairs train a model); a production pipeline
    mining at full query volume swaps :func:`knn_ivf_search` in as
    stage 1 and this stage is unchanged.

    Reference scope note: the reference app has no training surface;
    this extends SURVEY.md's LLM-pipeline mandate (similarity-search
    family) to the pair-mining consumer.
    """
    knn = knn_bruteforce(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    with_pos = knn.select(
        "query_id",
        F.first("neighbor_id").over(w).alias("pos_id"),
        F.first("cos_sim").over(w).alias("pos_sim"),
        F.col("neighbor_id").alias("neg_id"),
        F.col("cos_sim").alias("neg_sim"),
        F.col("rank").alias("neg_rank"),
    )
    return with_pos.where(
        (F.col("neg_rank") > 1) & (F.col("neg_sim") >= HARD_NEG_FLOOR)
    ).select(
        "query_id",
        "pos_id",
        "pos_sim",
        "neg_id",
        "neg_sim",
        "neg_rank",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
    )


CONTRASTIVE_PAIRS_SQL = f"""
WITH knn AS (
{KNN_BRUTEFORCE_SQL.strip()}
),
with_pos AS (
  SELECT query_id,
         first_value(neighbor_id) OVER (PARTITION BY query_id
                                        ORDER BY rank ASC) AS pos_id,
         first_value(cos_sim) OVER (PARTITION BY query_id
                                    ORDER BY rank ASC) AS pos_sim,
         neighbor_id AS neg_id,
         cos_sim AS neg_sim,
         rank AS neg_rank
  FROM knn
)
SELECT query_id, pos_id, pos_sim, neg_id, neg_sim, neg_rank,
       round(pos_sim - neg_sim, 6) AS margin
FROM with_pos
WHERE neg_rank > 1 AND neg_sim >= {HARD_NEG_FLOOR}
"""


def embedding_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_vecs, n_zero_norm, n_nonfinite, n_wrong_dim,
    n_clean): the input-validation gate for the whole vector family —
    counts, per label cohort, the degenerate rows that break
    downstream math: zero-norm vectors (no cosine direction; under
    ANSI mode a bare division THROWS — the failure mode the serve
    path guards), non-finite components (NaN/Inf poison every fold),
    and wrong-dimension arrays (zip_with silently truncates). A
    pipeline runs this BEFORE training cells or serving an index;
    nonzero counts route rows to quarantine instead of killing a
    1000-executor job mid-shuffle.

    Scale shape: one pure-map pass over the embeddings scan, one
    |labels|-row rollup. No vector math beyond per-row folds.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    zero = F.array_max(F.transform(dv, lambda x: F.abs(x))) == 0.0
    nonfinite = F.exists(
        dv, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    wrong_dim = F.size("embedding") != DIM
    flagged = emb.select(
        "label",
        zero.alias("z"),
        nonfinite.alias("nf"),
        wrong_dim.alias("wd"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")  # noqa: E731
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        cnt("z").alias("n_zero_norm"),
        cnt("nf").alias("n_nonfinite"),
        cnt("wd").alias("n_wrong_dim"),
        F.sum(
            F.when(~F.col("z") & ~F.col("nf") & ~F.col("wd"), 1).otherwise(0)
        ).cast("long").alias("n_clean"),
    )


EMBEDDING_SANITY_SQL = f"""
WITH flagged AS (
  SELECT label,
         list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))) = 0.0 AS z,
         len(list_filter(embedding,
             x -> isnan(CAST(x AS DOUBLE))
                  OR isinf(CAST(x AS DOUBLE)))) > 0 AS nf,
         len(embedding) != {DIM} AS wd
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       CAST(sum(CASE WHEN nf THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
       CAST(sum(CASE WHEN wd THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
       CAST(sum(CASE WHEN NOT z AND NOT nf AND NOT wd THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clean
FROM flagged
GROUP BY label
"""


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
# Parallel Corpus Mining with Multilingual Sentence Embeddings" — the
# LASER/CCMatrix selection rule): candidate translation pairs are
# mutual nearest neighbors across two language groups, scored by the
# ratio of their cosine to the mean cosine of each side's k nearest
# neighbors. The margin denominator punishes "hub" vectors that are
# close to everything.
BITEXT_MARGIN_K = 4  # neighborhood size for the margin denominator
BITEXT_MIN_MARGIN = 1.0  # keep pairs closer than their neighborhoods
_BITEXT_SCALE = 1_000_000  # micro-units for the exact-integer margin


def bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, tgt_id, cos_sim, margin): mutual-top-1 cross-lingual
    pairs between English docs (src) and non-English docs (tgt), with
    the ratio-margin score, margin >= BITEXT_MIN_MARGIN.

    Group membership joins embeddings to documents.lang on the
    vec_id == doc_id contract (retrieval.py's convention). This is
    the EXPLICIT EXACT variant (registered ``sim_bitext_mining_exact``
    since r8, the sem_dedup_flat demotion pattern): it scores all
    src x tgt pairs, which broadcasts an entire language half — fine
    for small-n audits, fatal at corpus scale. The registered default
    ``sim_bitext_mining`` is :func:`bitext_mining_ivf`, which draws
    candidates from the probed IVF cells (CCMatrix's practical
    variant) and shares this function's stage-2 margin definition.

    Plan shape: the smaller group broadcasts into the larger
    (BroadcastNestedLoopJoin — each executor scans its resident
    partition once); both directions' ranks and margin means come
    from TWO window passes over the SAME scored relation (no second
    cross join); the mutual filter is a self-semi-join on the
    (src, tgt) key. Ranking ties break on vec_id (knn convention).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    tagged = emb.join(docs, "vec_id")
    src = tagged.where(F.col("lang") == "en").select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv")
    )
    tgt = tagged.where(F.col("lang") != "en").select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv")
    )
    scored = tgt.crossJoin(F.broadcast(src)).select(
        "src_id",
        "tgt_id",
        F.round(cosine(F.col("sv"), F.col("tv")), 6).alias("cos_sim"),
    )
    return _bitext_margins(scored)


def _bitext_margins(scored: DataFrame) -> DataFrame:
    """Stage 2 of both bitext variants — mutual-top-1 + ratio margin
    over an arbitrary (src_id, tgt_id, cos_sim) pair relation. ONE
    definition so the exact (all-pairs) and IVF-bucketed variants
    can never diverge on ranking, tie-break, or margin arithmetic.

    Plan shape (r16, VERDICT r15 item 6): the r13-r15 formulation
    stacked TWO serial row_number windows (src- then tgt-partitioned
    exchange + full sort each) onto the pair relation, checkpointed
    the ranked table, and fed THREE branches (forward mean, backward
    mean, mutual filter) plus two re-joins — ~5 serial AQE stages of
    fixed latency after the candidate join. Everything each side
    needs is a per-key TOP-K statistic, so each direction is now ONE
    partial-aggregated hash aggregate over the checkpointed pair
    relation: collect the per-key candidate list, array_sort by the
    EXACT total order the windows used ((-cos_micro, other_id)
    ascending == (cos_sim DESC, other_id ASC) — cos_sim -> micro is
    injective on 6dp-rounded values, and (src_id, tgt_id) pairs are
    unique so the sort never reaches a third field), then read
    top-1 / top-K-sum / top-K-count off the sorted array. The two
    aggregates are independent subtrees (no serial window chain) and
    the mutual-top-1 + margin tail is ONE join of two
    one-row-per-key sides instead of filter + two joins. Per-key
    array volume equals exactly what each window sort already
    materialized per partition key (|pairs per key|, bounded at
    PROBES x CAP per src on the capped default; per tgt it is the
    probe fan-in its cell receives — the same rows the tgt window
    sorted). The pair relation still lazily localCheckpoints once
    (slimmer now: no fr/br columns), truncating the wide candidate
    pipeline out of both aggregate subtrees (PLANSTATS r12: without
    truncation, 18 shuffles / 30 scans)."""
    pairs = scored.localCheckpoint(eager=False)
    micro = F.round(F.col("cos_sim") * F.lit(1e6), 0).cast("long")
    k = F.lit(BITEXT_MARGIN_K)

    def _topk(key: str, other: str, carry_cos: bool):
        fields = [
            (-micro).alias("nm"),
            F.col(other).alias("oid"),
        ]
        if carry_cos:
            # third struct field: never compared (nm, oid) is unique
            fields.append(F.col("cos_sim").alias("cs"))
        sorted_c = F.array_sort(F.collect_list(F.struct(*fields)))
        return pairs.groupBy(key).agg(
            F.element_at(sorted_c, 1).alias("top"),
            F.aggregate(
                F.slice(sorted_c, F.lit(1), k),
                F.lit(0).cast("long"),
                lambda acc, x: acc - x["nm"],
            ).alias("_sum"),
            F.least(F.size(sorted_c), k).cast("long").alias("_k"),
        )

    fwd = _topk("src_id", "tgt_id", carry_cos=True).select(
        "src_id",
        F.col("top.oid").alias("tgt_id"),
        F.col("top.cs").alias("cos_sim"),
        F.col("_sum").alias("fm_sum"),
        F.col("_k").alias("kf"),
    )
    bwd = _topk("tgt_id", "src_id", carry_cos=False).select(
        F.col("tgt_id").alias("b_tgt"),
        F.col("top.oid").alias("b_src"),
        F.col("_sum").alias("bm_sum"),
        F.col("_k").alias("kb"),
    )
    # margin in exact integer micro-units (bigram_lm_score's idiom):
    # cos_sim is already 6dp-rounded, so cos_micro is an exact bigint;
    # margin = cos / ((fm_sum/kf + bm_sum/kb) / 2)
    #        = 2*cos*kf*kb / (fm_sum*kb + bm_sum*kf)  — an integer
    # rational, rounded half-up by one integer division, so the
    # variable-order float average can never flip the 6th decimal.
    num = 2 * micro * F.col("kf") * F.col("kb")
    den = F.col("fm_sum") * F.col("kb") + F.col("bm_sum") * F.col("kf")
    margin = (
        F.expr(
            f"(2 * (2 * cast(round(cos_sim * 1e6, 0) as bigint) * kf * kb)"
            f" * {_BITEXT_SCALE} + (fm_sum * kb + bm_sum * kf))"
            f" div (2 * (fm_sum * kb + bm_sum * kf))"
        ).cast("double")
        / F.lit(float(_BITEXT_SCALE))
    )
    # a pair (s, t) had fr == 1 iff t is s's top-1 target and br == 1
    # iff s is t's top-1 source — the join below IS the mutual filter,
    # with both means already on the joined row
    return (
        fwd.join(
            bwd,
            (F.col("tgt_id") == F.col("b_tgt"))
            & (F.col("src_id") == F.col("b_src")),
        )
        .where((den > 0) & (num > 0))
        .select(
            "src_id",
            "tgt_id",
            "cos_sim",
            margin.alias("margin"),
        )
        .where(F.col("margin") >= BITEXT_MIN_MARGIN)
    )


def _bitext_tail_sql(scored_body: str) -> str:
    """Margin/mutual-top-1 SQL tail over an arbitrary scored-pair
    body — the twin of :func:`_bitext_margins`, shared by the exact
    and IVF-bucketed oracles."""
    return f"""
ranked AS (
  SELECT src_id, tgt_id, cos_sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY cos_sim DESC, tgt_id ASC) AS fr,
         row_number() OVER (PARTITION BY tgt_id
                            ORDER BY cos_sim DESC, src_id ASC) AS br
  FROM ({scored_body})
),
fwd_mean AS (
  SELECT src_id,
         sum(CAST(round(cos_sim * 1e6, 0) AS BIGINT)) AS fm_sum,
         count(*) AS kf
  FROM ranked WHERE fr <= {BITEXT_MARGIN_K} GROUP BY src_id
),
bwd_mean AS (
  SELECT tgt_id,
         sum(CAST(round(cos_sim * 1e6, 0) AS BIGINT)) AS bm_sum,
         count(*) AS kb
  FROM ranked WHERE br <= {BITEXT_MARGIN_K} GROUP BY tgt_id
),
margins AS (
  SELECT r.src_id, r.tgt_id, r.cos_sim,
         CAST(
           (2 * (2 * CAST(round(r.cos_sim * 1e6, 0) AS BIGINT) * kf * kb)
              * {_BITEXT_SCALE} + (fm_sum * kb + bm_sum * kf))
           // (2 * (fm_sum * kb + bm_sum * kf))
         AS DOUBLE) / {_BITEXT_SCALE}.0 AS margin
  FROM ranked r
  JOIN fwd_mean USING (src_id)
  JOIN bwd_mean USING (tgt_id)
  WHERE fr = 1 AND br = 1
    AND (fm_sum * kb + bm_sum * kf) > 0
    AND (2 * CAST(round(r.cos_sim * 1e6, 0) AS BIGINT) * kf * kb) > 0
)
SELECT src_id, tgt_id, cos_sim, margin
FROM margins WHERE margin >= {BITEXT_MIN_MARGIN}
"""


BITEXT_MINING_SQL = f"""
WITH tagged AS (
  SELECT e.vec_id, e.embedding, d.lang
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
src AS (
  SELECT vec_id AS src_id, embedding AS sv FROM tagged WHERE lang = 'en'
),
tgt AS (
  SELECT vec_id AS tgt_id, embedding AS tv FROM tagged WHERE lang != 'en'
),
{_bitext_tail_sql(
    "SELECT src_id, tgt_id, round(" + cosine_sql("sv", "tv")
    + ", 6) AS cos_sim FROM tgt CROSS JOIN src"
).strip()}
"""


# ---------------------------------------------------------------------------
# Matryoshka truncation audit (Kusupati et al. 2022, "Matryoshka
# Representation Learning"): serving stacks cut embedding storage and
# ANN cost by keeping only a PREFIX of each vector's dimensions. This
# operator measures exactly what that costs: recall@k of the
# truncated-prefix brute-force ranking against the full-dimension
# ranking, per query and per k.
MATRYOSHKA_DIM = 32  # prefix length audited (full DIM = 64)
MATRYOSHKA_KS = (1, 5, 10)


def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, k, n_overlap, recall): per-query overlap between the
    MATRYOSHKA_DIM-prefix cosine top-k and the full-dimension cosine
    top-k, for each audit depth k in MATRYOSHKA_KS — the go/no-go
    table for serving truncated embeddings.

    Scale shape: both rankings are the broadcast-query brute-force
    shape (knn_bruteforce), each bounded to TOP_K rows per query
    before the audit join, so the join + the k-explode touch at most
    TOP_K rows per query regardless of corpus size; the grid
    right-join makes zero-overlap rows explicit rather than absent.
    At corpus scale both rankings swap for their IVF variants and
    this audit stage is unchanged (ann_recall_audit's contract).
    Ranking ties break on neighbor_id (knn convention); recall is an
    exact small-integer ratio.
    """
    q, c = _queries_and_cands(spark, sf_dir)
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    trunc = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(
                    F.slice(F.col("qv"), 1, MATRYOSHKA_DIM),
                    F.slice(F.col("cv"), 1, MATRYOSHKA_DIM),
                ),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("trank", F.row_number().over(wt))
        .where(F.col("trank") <= TOP_K)
        .select("query_id", "neighbor_id", "trank")
    )
    full = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("frank")
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in MATRYOSHKA_KS])
    ).alias("k")
    overlap = (
        full.join(trunc, ["query_id", "neighbor_id"])
        .select("query_id", "frank", "trank", ks)
        .where((F.col("frank") <= F.col("k")) & (F.col("trank") <= F.col("k")))
        .groupBy("query_id", "k")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    grid = (
        q.select("query_id")
        .select("query_id", ks)
    )
    return grid.join(overlap, ["query_id", "k"], "left").select(
        "query_id",
        "k",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias(
            "n_overlap"
        ),
        F.round(
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
            / F.col("k").cast("double"),
            6,
        ).alias("recall"),
    )


MATRYOSHKA_RECALL_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
  WHERE vec_id >= {N_QUERIES}
),
trunc AS (
  SELECT query_id, neighbor_id, trank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id ASC
                             ) AS trank
    FROM (
      SELECT query_id, neighbor_id,
             round({cosine_sql(f'qv[1:{MATRYOSHKA_DIM}]', f'cv[1:{MATRYOSHKA_DIM}]')}, 6) AS cos_sim
      FROM c CROSS JOIN q
    )
  ) WHERE trank <= {TOP_K}
),
full_ AS (
  SELECT query_id, neighbor_id, rank AS frank FROM ({KNN_BRUTEFORCE_SQL})
),
ks AS (SELECT unnest([{", ".join(str(k) for k in MATRYOSHKA_KS)}]) AS k),
overlap AS (
  SELECT query_id, k, count(*) AS n_overlap
  FROM full_ JOIN trunc USING (query_id, neighbor_id)
  CROSS JOIN ks
  WHERE frank <= k AND trank <= k
  GROUP BY query_id, k
),
grid AS (SELECT query_id, k FROM q CROSS JOIN ks)
SELECT query_id, k,
       CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / CAST(k AS DOUBLE),
             6) AS recall
FROM grid LEFT JOIN overlap USING (query_id, k)
"""


# ---------------------------------------------------------------------------
# Index maintenance planning: which published cells have outgrown
# their neighborhood and should split at the next index build. The
# third leg of the maintenance story (ivf_index_append watches
# growth, retrieval.index_delta maintains the sparse index, this
# plans the dense one). All math is exact integer rationals —
# mean-population comparisons never touch floats.
REBAL_NUM, REBAL_DEN = 3, 2  # split cells above 1.5x mean population


def ivf_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, coarse, fine, n_members, target_subcells): every
    published index cell whose population exceeds REBAL_NUM/REBAL_DEN
    times the mean, with the sub-cell count (ceil(n/mean)) the next
    build should split it into.

    Scale shape: reads the published index TABLE (ivf_index_export's
    |cells|-row artifact), so planning cost is index-sized, not
    corpus-sized; the mean is a 1-row broadcast. Condition and
    target use integer cross-multiplication (n*count*DEN >
    NUM*total; ceil via (n*count + total - 1) div total) — exact in
    both engines.
    """
    idx = ivf_index_export(spark, sf_dir).select(
        "cell", "coarse", "fine", "n_members"
    )
    tot = idx.agg(
        F.sum("n_members").alias("total"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    j = idx.crossJoin(F.broadcast(tot))
    overfull = (
        F.col("n_members") * F.col("n_cells") * F.lit(REBAL_DEN)
        > F.lit(REBAL_NUM) * F.col("total")
    )
    target = F.expr(
        "(n_members * n_cells + total - 1) div total"
    ).cast("int")
    return j.where(overfull).select(
        "cell",
        "coarse",
        "fine",
        "n_members",
        target.alias("target_subcells"),
    )


def _ivf_rebalance_sql() -> str:
    return f"""
WITH idx AS (
  SELECT cell, coarse, fine, n_members
  FROM ({IVF_INDEX_EXPORT_SQL})
),
tot AS (
  SELECT CAST(sum(n_members) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM idx
)
SELECT cell, coarse, fine, n_members,
       CAST((n_members * n_cells + total - 1) // total AS INTEGER)
         AS target_subcells
FROM idx CROSS JOIN tot
WHERE n_members * n_cells * {REBAL_DEN} > {REBAL_NUM} * total
"""


IVF_REBALANCE_SQL = _ivf_rebalance_sql()


# ---------------------------------------------------------------------------
# Isotropy diagnostic (Mu & Viswanath 2018, "All-but-the-Top"):
# anisotropic embedding spaces — variance concentrated in a few
# directions — degrade cosine-based retrieval. This reports how the
# corpus's variance spreads over the eigenspectrum of the EXACT
# covariance (embedding_covariance's quantized-integer reduction).
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_dims, trace_micro, top_eig_micro, top_share,
    effective_rank): one-row spectrum summary — total variance and
    the top eigenvalue in 1e-6 units, the top direction's variance
    share, and the effective rank exp(H(p)) of the normalized
    eigenvalue distribution (n_dims = perfectly isotropic, 1 = all
    variance on one axis).

    Scale shape: the ONLY distributed work is the covariance
    reduction (shuffle bytes O(partitions * dim^2), corpus-size
    independent); the d x d eigendecomposition is driver model
    state, exactly the PCA trainer's contract. Oracle: a sequential
    replica recomputes the identical exact-integer covariance and
    the same numpy eigh — literal-artifact twin (oracles.py).
    """
    import math as _math

    import numpy as np

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    d = max(r.j for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    vals = np.linalg.eigvalsh(cov)
    pos = [float(v) for v in vals if v > 0]
    trace = sum(pos)
    top = max(pos)
    ps = [v / trace for v in pos]
    ent = -sum(p * _math.log(p) for p in ps if p > 0)
    row = (
        d,
        int(_math.floor(trace * 1e6 + 0.5)),
        int(_math.floor(top * 1e6 + 0.5)),
        round(top / trace, 6),
        round(_math.exp(ent), 6),
    )
    return spark.createDataFrame(
        [row],
        "n_dims int, trace_micro bigint, top_eig_micro bigint,"
        " top_share double, effective_rank double",
    )


def bitext_mining_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, tgt_id, cos_sim, margin): the CORPUS-SCALE path of
    bitext mining and the registered default ``sim_bitext_mining``
    since r8 (VERDICT r07 item 2) — candidate pairs come from the published
    two-level IVF index (each English query scores only the
    non-English vectors inside its probed cells) instead of the
    exact all-pairs cross join; margins and the mutual-top-1 rule
    run over the candidate neighborhoods (the CCMatrix practical
    variant) through the SAME stage-2 definition as the exact
    variant.

    Cohort note (both engines identical): the index's candidate side
    excludes vec_id < N_QUERIES by the shared ivf_probe_pairs
    contract, so those few ids never appear as targets; sources are
    ALL English docs. The oracle replays the full index train +
    probe + candidate generation (the knn_ivf discipline) and then
    the shared margin tail.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    q = (
        emb.join(langs, "vec_id")
        .where(F.col("lang") == "en")
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )
    pairs = ivf_probe_pairs(spark, sf_dir, q)
    nonen = langs.where(F.col("lang") != "en").select(
        F.col("vec_id").alias("neighbor_id")
    )
    scored = pairs.join(F.broadcast(nonen), "neighbor_id", "left_semi").select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    return _bitext_margins(scored)


def _bitext_mining_ivf_sql() -> str:
    q_body = (
        "SELECT e.vec_id AS query_id, e.v AS qv FROM emb e"
        " JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en'"
    )
    scored = (
        "SELECT p.query_id AS src_id, p.neighbor_id AS tgt_id,"
        f" round({cosine_sql('p.qv', 'p.cv')}, 6) AS cos_sim"
        " FROM pairs p JOIN documents d ON p.neighbor_id = d.doc_id"
        " WHERE d.lang != 'en'"
    )
    return (
        _ivf_pairs_sql(q_body)
        + ",\nscored0 AS (\n  "
        + scored
        + "\n),\n"
        + _bitext_tail_sql("SELECT * FROM scored0").strip()
    )


BITEXT_MINING_IVF_SQL = _bitext_mining_ivf_sql()


# Per-cell candidate cap + FIXED probe count for the registered
# bitext default: bounds the scored pair volume at
# |src| * BITEXT_PROBES * CAP — LINEAR in the corpus even when BOTH
# language halves grow (VERDICT r08 item 2, the
# minhash_lsh_pairs_capped discipline applied to mining). Both knobs
# are needed: with the adaptive cell count (k ∝ √n) the DEFAULT
# fraction-scaled probe rule makes a corpus-sized query set score
# O(n^1.5) pairs (measured 41.7x at 30x with the cap alone), so the
# mining path pins the probe count the way faiss/CCMatrix serving
# does. The uncapped cell-probed variant stays registered as
# sim_bitext_mining_exact_cells; the all-pairs one as _exact.
BITEXT_CELL_CAP = 8  # non-English candidates kept per fine cell
BITEXT_PROBES = 8  # fixed probed fine cells per English source doc

# (applicationId, sf_dir) -> the capped non-English candidate
# shortlist (neighbor_id, cv, cell): query-INDEPENDENT index-side
# state of the registered bitext default — the per-cell top-CAP
# most-representative targets, exactly the target-side index a
# CCMatrix-style deployment builds offline before mining any source
# language against it. Published once per session on the
# _ASSIGNED_CACHE contract (optimization r15: the per-query plan
# re-ran the semi-join + centroid-cosine + cap window — two extra
# serial AQE stages per mining call).
_BITEXT_CAND_CACHE: dict[tuple, DataFrame] = register_cache({})


def bitext_capped_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped target-side shortlist read by
    :func:`bitext_mining_capped` — (neighbor_id, cv, cell) with at
    most BITEXT_CELL_CAP non-English members per fine cell, ranked
    by centroid cosine (round 6dp, neighbor_id tie-break). Derived
    only from the published inverted lists + fine centroids +
    documents.lang: corpus state, no query dependence, so it is
    publishable index contents (bench materializes it in the model
    region alongside the other index artifacts)."""
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        kmeans_fine_centroid_rows,
        levels_for,
    )

    from spark_app_twitter_spark.functions.caches import get_or_build

    def build() -> DataFrame:
        _, k2 = levels_for(corpus_size(spark, sf_dir))
        cents = spark.createDataFrame(
            [
                (int(co * k2 + fi), fv)
                for co, fi, fv in kmeans_fine_centroid_rows(spark, sf_dir)
            ],
            "cell int, fv array<double>",
        )
        langs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("vec_id"), "lang"
        )
        nonen = langs.where(F.col("lang") != "en").select(
            F.col("vec_id").alias("neighbor_id")
        )
        assigned = kmeans_cells_2level_assigned(spark, sf_dir)
        cand_cells = assigned.where(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("cv"),
            "cell",
        )
        w = Window.partitionBy("cell").orderBy(
            F.desc("csim"), F.asc("neighbor_id")
        )
        return (
            cand_cells.join(F.broadcast(nonen), "neighbor_id", "left_semi")
            .join(F.broadcast(cents), "cell")
            .withColumn("csim", F.round(cosine(F.col("cv"), F.col("fv")), 6))
            .withColumn("crn", F.row_number().over(w))
            .where(F.col("crn") <= BITEXT_CELL_CAP)
            .select("neighbor_id", "cv", "cell")
            .localCheckpoint(eager=False)
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return get_or_build(_BITEXT_CAND_CACHE, key, build)


def bitext_mining_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, tgt_id, cos_sim, margin): the CAPPED corpus-scale
    bitext path and the registered default ``sim_bitext_mining``
    since r9 — identical to :func:`bitext_mining_ivf` except each
    fine cell contributes at most BITEXT_CELL_CAP non-English
    candidates: the cell's members ranked by centroid cosine
    (round 6dp, neighbor_id tie-break — the most REPRESENTATIVE
    targets survive; hub-ish outliers drop first) AND each source
    probes a FIXED BITEXT_PROBES fine cells (the faiss/CCMatrix
    nprobe convention) instead of the fraction-scaled default. With
    both knobs the scored pair volume is |src| x PROBES x CAP —
    output-linear — where the uncapped variant is quadratic when
    both language halves grow (29 s at 3x, r8) and the cap alone
    still leaves O(n^1.5) from √n-scaled probing (41.7x at 30x, r9).
    Recall trade: the probed fraction shrinks as the corpus grows —
    the standard IVF-serving dial, audited against _exact_cells.

    Plan shape: the cap is ONE window over the cell key on the
    candidate side (index-sized, before any query join) — exactly
    where minhash_lsh_pairs_capped places its bucket cap — and since
    optimization r15 that capped shortlist is the PUBLISHED
    :func:`bitext_capped_candidates` session artifact, so the
    per-query plan starts from the stored target-side index instead
    of re-running the semi-join + centroid-cosine + cap window;
    stage 2 (mutual-top-1 + ratio margin) is the shared
    _bitext_margins definition. Recall trade: a true mutual-top-1
    pair is lost only if the target ranks below CAP within its own
    cell — the audit twin for that loss is comparing against
    _exact_cells, the same relationship sim_ann_recall_audit pins
    for knn_ivf.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    q = (
        emb.join(langs, "vec_id")
        .where(F.col("lang") == "en")
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )
    capped = bitext_capped_candidates(spark, sf_dir)
    pairs = ivf_probe_pairs(
        spark,
        sf_dir,
        q,
        cand_prep=lambda _cc: capped,
        n_probe=BITEXT_PROBES,
        broadcast_probes=False,
    )
    scored = pairs.select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    return _bitext_margins(scored)


def _bitext_mining_capped_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        levels_sql,
    )

    _, k2_sql = levels_sql()
    q_body = (
        "SELECT e.vec_id AS query_id, e.v AS qv FROM emb e"
        " JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en'"
    )
    cand_tail = f"""
fcent AS (
  SELECT CAST(coarse * {k2_sql} + fine AS INT) AS cell, fv FROM f{ITERS}
),
cand_capped AS (
  SELECT neighbor_id, cv, cell FROM (
    SELECT cc.neighbor_id, cc.cv, cc.cell,
           row_number() OVER (PARTITION BY cc.cell
                              ORDER BY round({cosine_sql('cc.cv', 'fc.fv')}, 6) DESC,
                                       cc.neighbor_id ASC) AS crn
    FROM cand_cells cc
    JOIN documents d ON cc.neighbor_id = d.doc_id AND d.lang != 'en'
    JOIN fcent fc ON cc.cell = fc.cell
  ) WHERE crn <= {BITEXT_CELL_CAP}
),"""
    scored = (
        "SELECT p.query_id AS src_id, p.neighbor_id AS tgt_id,"
        f" round({cosine_sql('p.qv', 'p.cv')}, 6) AS cos_sim"
        " FROM pairs p"
    )
    return (
        _ivf_pairs_sql(
            q_body,
            cand_tail=cand_tail,
            cand_name="cand_capped",
            n_probe=BITEXT_PROBES,
        )
        + ",\nscored0 AS (\n  "
        + scored
        + "\n),\n"
        + _bitext_tail_sql("SELECT * FROM scored0").strip()
    )


BITEXT_MINING_CAPPED_SQL = _bitext_mining_capped_sql()


def kmeans_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, coarse, fine, n_members, mean_sim_micro, min_sim_micro,
    n_outliers): the per-cell QUALITY audit of the published two-level
    index — how tight each cell is around its centroid (mean and
    worst member cosine, integer micro-units; floor-div mean so the
    statistic is engine-exact) and how many members fall below the
    OUTLIER_SIM pruning line. The table an index-maintenance job
    reads next to ivf_rebalance_plan: rebalance splits the OVERFULL
    cells, this flags the INCOHERENT ones (retrain or probe wider).

    Scale shape: identical to embedding_outliers (cached inline
    assignment + broadcast |cells|-row centroid join + map-side
    scoring) with one cell-keyed rollup on top; output is
    index-sized.
    """
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
        kmeans_fine_centroid_rows,
        levels_for,
    )

    _, k2 = levels_for(corpus_size(spark, sf_dir))
    assigned = kmeans_cells_2level_assigned(spark, sf_dir)
    fine_rows = kmeans_fine_centroid_rows(spark, sf_dir)
    cents = spark.createDataFrame(
        [
            (int(co * k2 + fi), int(co), int(fi), fv)
            for co, fi, fv in fine_rows
        ],
        "cell int, coarse int, fine int, ccv array<double>",
    )
    sim_micro = F.round(
        F.round(cosine(F.col("v"), F.col("ccv")), 6) * F.lit(1e6)
    ).cast("long")
    return (
        assigned.select("cell", "v")
        .join(F.broadcast(cents), "cell")
        .select(
            "cell",
            "coarse",
            "fine",
            sim_micro.alias("sm"),
        )
        .groupBy("cell", "coarse", "fine")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr("sum(sm) div count(*)").alias("mean_sim_micro"),
            F.min("sm").alias("min_sim_micro"),
            F.sum(
                (F.col("sm") < F.lit(int(OUTLIER_SIM * 1e6))).cast("long")
            ).alias("n_outliers"),
        )
    )


def _kmeans_quality_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    assigned = kmeans_2level_assigned_cte("vec_id, v, coarse, fine, cell")
    sm = f"CAST(round(round({cosine_sql('a.v', 'f.fv')}, 6) * 1e6) AS BIGINT)"
    return f"""
WITH {chain},
assigned AS ({assigned}),
scored AS (
  SELECT a.cell, a.coarse, a.fine, {sm} AS sm
  FROM assigned a JOIN f{ITERS} f
    ON a.coarse = f.coarse AND a.fine = f.fine
)
SELECT cell, coarse, fine,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(sm) // count(*) AS BIGINT) AS mean_sim_micro,
       CAST(min(sm) AS BIGINT) AS min_sim_micro,
       CAST(sum(CASE WHEN sm < {int(OUTLIER_SIM * 1e6)} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM scored
GROUP BY cell, coarse, fine
"""


KMEANS_QUALITY_SQL = _kmeans_quality_sql()


def binary_codes_col() -> F.Column:
    """64-bit sign code of the 64-dim embedding: bit i set iff
    component i > 0 — the most compressed serving tier (8 bytes per
    vector; below int8's 64 and PQ's 8-subspace codes). One
    definition shared by the search and its SQL twin generator."""
    return F.expr(
        "aggregate(zip_with(embedding, sequence(0, 63),"
        " (x, i) -> IF(x > CAST(0 AS FLOAT),"
        " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
        " CAST(0 AS BIGINT), (acc, x) -> acc | x)"
    )


def knn_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, hamming, rank): top-k by Hamming
    distance between 64-bit sign codes — the cheapest ANN tier
    (bit_count(xor) per candidate, 8 bytes/vector). Sign-random-
    projection theory: Hamming distance is monotone in angular
    distance in expectation, so this is the coarse pre-filter a
    binary-then-rerank stack runs before int8/PQ/f32 tiers.

    Plan shape matches knn_bruteforce: map-side code build, tiny
    query side broadcast, one window shuffle on query_id; ties break
    on neighbor_id.
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", binary_codes_col().alias("code")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qc")
    )
    c = emb.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("code").alias("cc")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.expr("bit_count(qc ^ cc)").cast("int").alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


def _binary_code_sql(src: str) -> str:
    """DuckDB twin of binary_codes_col over `src`.embedding. DuckDB
    raises on BIGINT 1<<63, so the sum runs in HUGEINT and wraps to
    the signed-64 value Spark's shiftleft produces."""
    s = (
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN "
        f"{src}.embedding[i] > 0 THEN (CAST(1 AS HUGEINT) << (i - 1)) "
        "ELSE CAST(0 AS HUGEINT) END))"
    )
    return (
        f"CASE WHEN {s} >= CAST(9223372036854775808 AS HUGEINT) "
        f"THEN {s} - CAST(18446744073709551616 AS HUGEINT) ELSE {s} END"
    )


KNN_BINARY_HAMMING_SQL = f"""
WITH codes AS (
  SELECT e.vec_id, CAST({_binary_code_sql('e')} AS BIGINT) AS code
  FROM embeddings e
),
q AS (SELECT vec_id AS query_id, code AS qc FROM codes
      WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, code AS cc FROM codes
      WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(bit_count(xor(qc, cc)) AS INTEGER) AS hamming
  FROM c CROSS JOIN q
)
SELECT query_id, neighbor_id, hamming, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY hamming ASC, neighbor_id ASC)
            AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance rerank (Carbonell & Goldstein): the
# diversified top-k a retrieval serving layer returns when the raw
# neighbor list is redundant (near-dup corpus => near-dup results).
# Greedy selection replayed as FIXED relational steps — both engines
# run the identical integer recurrence, no UDF, no driver loop state.

MMR_M = 20  # shortlist per query entering the rerank
MMR_K = 5  # diversified picks per query
MMR_LAMBDA10 = 7  # lambda = 0.7, kept as exact tenths


def _mmr_rel_micro() -> F.Column:
    return F.floor(
        cosine(F.col("qv"), F.col("cv")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")


def _mmr_shortlist(pairs: DataFrame) -> DataFrame:
    """Top-MMR_M shortlist (query_id, neighbor_id, rel_micro) from
    any (query_id, qv, neighbor_id, cv) candidate frame — the seam
    that lets the brute and IVF shortlists share everything after
    candidate generation."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel_micro"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id", "neighbor_id", _mmr_rel_micro().alias("rel_micro")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MMR_M)
        .drop("rn")
        .localCheckpoint(eager=False)
    )


def _mmr_pairs(spark: SparkSession, sf_dir: str, cand: DataFrame):
    """The shortlist's pairwise similarity table (query_id, a, b,
    sim_micro) — M^2 rows per query, integer-micro quantized."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    ce = cand.join(emb, "neighbor_id").select(
        "query_id", "neighbor_id", "cv"
    )
    sim = F.floor(
        cosine(F.col("av"), F.col("bv")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    return (
        ce.selectExpr("query_id", "neighbor_id AS a", "cv AS av")
        .join(
            ce.selectExpr("query_id", "neighbor_id AS b", "cv AS bv"),
            "query_id",
        )
        .where(F.col("a") != F.col("b"))
        .select("query_id", "a", "b", sim.alias("sim_micro"))
        .localCheckpoint(eager=False)
    )


def _mmr_cand(spark: SparkSession, sf_dir: str):
    """Brute-shortlist variant: broadcast queries x all candidates
    (the knn_bruteforce plan), then the shared pair table."""
    q, c = _queries_and_cands(spark, sf_dir)
    cand = _mmr_shortlist(c.crossJoin(F.broadcast(q)))
    return cand, _mmr_pairs(spark, sf_dir, cand)


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, mmr_rank, rel_micro): MMR-diversified
    top-``MMR_K`` over the exact-cosine ``MMR_M`` shortlist.

    Greedy recurrence, integer throughout: pick 1 maximizes
    ``7 * rel_micro``; pick t maximizes
    ``7 * rel_micro - 3 * max_{s in S} sim_micro(d, s)`` (lambda =
    0.7 in exact tenths), neighbor_id ascending on ties. Fixed
    ``MMR_K`` relational steps — the LPA/PageRank fixed-round
    discipline — so the DuckDB twin replays the identical chain.

    Scale shape: everything after the brute shortlist is k-bounded —
    the pair table is MMR_M^2 rows per query, each step is a window
    over at most MMR_M rows per query. The shortlist itself is the
    knn_bruteforce plan (broadcast queries, one window); swap in the
    IVF shortlist for the 100-TB path without touching the rerank.
    """
    cand, pairs = _mmr_cand(spark, sf_dir)
    return _mmr_greedy(cand, pairs)


def _mmr_greedy(cand: DataFrame, pairs: DataFrame) -> DataFrame:
    """The fixed-step integer greedy shared by every shortlist
    source (brute, IVF), run per-query in ONE cogrouped
    applyInPandas pass (VERDICT r08 item 3).

    One query's state is tiny — a ≤MMR_M-row shortlist and its
    ≤MMR_M² pair table — so the MMR_K-step recurrence is pure local
    int64 arithmetic inside a single task: two shuffles total (cand
    + pairs hash to query_id) instead of the former 300+-exchange
    relational chain whose planning cost dominated the bench. The
    similarity QUANTIZATION stays JVM-side (``pairs.sim_micro``
    arrives pre-floored from Catalyst, exactly as the DuckDB twin
    floors it), so the greedy itself — max/compare/subtract on
    int64 — cannot diverge between engines. Tie rule identical to
    the twin: mmr desc, neighbor_id asc; queries with fewer than
    MMR_K candidates emit one row per candidate, like the
    relational chain's empty step-t.
    """
    import numpy as np
    import pandas as pd

    lam, lam_c, k = MMR_LAMBDA10, 10 - MMR_LAMBDA10, MMR_K

    def greedy(cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(cdf)
        if n == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "mmr_rank": pd.Series(dtype="int32"),
                    "rel_micro": pd.Series(dtype="int64"),
                }
            )
        nid = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        rel = cdf["rel_micro"].to_numpy(dtype=np.int64)
        # dense M x M penalty matrix: pairs covers every a != b of
        # the shortlist, so sim[c, s] is fully populated off-diagonal
        pos = {v: i for i, v in enumerate(nid)}
        sim = np.zeros((n, n), dtype=np.int64)
        if len(pdf):
            ai = pdf["a"].map(pos).to_numpy(dtype=np.int64)
            bi = pdf["b"].map(pos).to_numpy(dtype=np.int64)
            sim[ai, bi] = pdf["sim_micro"].to_numpy(dtype=np.int64)
        taken = np.zeros(n, dtype=bool)
        pen = np.zeros(n, dtype=np.int64)
        picks: list[int] = []
        for t in range(min(k, n)):
            score = lam * rel if t == 0 else lam * rel - lam_c * pen
            free = np.flatnonzero(~taken)
            best_score = score[free].max()
            ties = free[score[free] == best_score]
            j = int(ties[nid[ties].argmin()])
            taken[j] = True
            picks.append(j)
            if t == 0:
                # sim_micro is SIGNED (cosine can be negative): the
                # first penalty is exactly that column, not
                # max(0, .) — a zero init would clamp negative
                # penalties up and flip picks
                pen = sim[:, j].copy()
            else:
                np.maximum(pen, sim[:, j], out=pen)
        idx = np.asarray(picks, dtype=np.int64)
        return pd.DataFrame(
            {
                "query_id": np.repeat(
                    np.int64(cdf["query_id"].iloc[0]), len(idx)
                ),
                "neighbor_id": nid[idx],
                "mmr_rank": np.arange(1, len(idx) + 1, dtype=np.int32),
                "rel_micro": rel[idx],
            }
        )

    return (
        cand.select("query_id", "neighbor_id", "rel_micro")
        .groupBy("query_id")
        .cogroup(
            pairs.select("query_id", "a", "b", "sim_micro").groupBy(
                "query_id"
            )
        )
        .applyInPandas(
            greedy,
            "query_id long, neighbor_id long, mmr_rank int, rel_micro long",
        )
    )


def _mmr_steps_sql(pairs_name: str = "pairs") -> tuple[str, str]:
    """(chain, union_all) of the fixed greedy CTE steps, run against
    a shortlist CTE named ``cand`` and a pairwise-similarity CTE
    named ``pairs_name`` — shared by the brute and IVF twins."""
    # sel{t} is MATERIALIZED: each step references it twice (pen join
    # + NOT EXISTS) and DuckDB re-inlines plain CTEs — without the
    # hint the re-evaluation count doubles per step (ADVICE r08)
    steps = []
    for t in range(2, MMR_K + 1):
        steps.append(
            f"""sel{t-1} AS MATERIALIZED ({' UNION ALL '.join(f'SELECT * FROM s{i}' for i in range(1, t))}),
pen{t} AS (
  SELECT p.query_id, p.a AS neighbor_id, max(p.sim_micro) AS pen
  FROM {pairs_name} p JOIN sel{t-1} s
    ON s.query_id = p.query_id AND s.neighbor_id = p.b
  GROUP BY p.query_id, p.a
),
s{t} AS (
  SELECT query_id, neighbor_id, {t} AS mmr_rank FROM (
    SELECT c.query_id, c.neighbor_id,
           row_number() OVER (
             PARTITION BY c.query_id
             ORDER BY {MMR_LAMBDA10} * c.rel_micro
                      - {10 - MMR_LAMBDA10} * pen.pen DESC,
                      c.neighbor_id) AS rn
    FROM cand c
    JOIN pen{t} pen USING (query_id, neighbor_id)
    WHERE NOT EXISTS (SELECT 1 FROM sel{t-1} s
                      WHERE s.query_id = c.query_id
                        AND s.neighbor_id = c.neighbor_id)
  ) WHERE rn = 1
)"""
        )
    chain = ",\n".join(steps)
    union_all = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1)
    )
    return chain, union_all


def _mmr_rerank_sql() -> str:
    # cand/pairs are MATERIALIZED like the IVF twin's: the greedy
    # chain references them in every step and DuckDB re-inlines
    # plain CTEs, re-evaluating the cross-join shortlist and the M^2
    # pair table per re-reference (ADVICE r08)
    chain, union_all = _mmr_steps_sql()
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
  WHERE vec_id >= {N_QUERIES}
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_micro FROM (
    SELECT query_id, neighbor_id,
           CAST(floor({cosine_sql('qv', 'cv')} * 1000000.0 + 0.5)
                AS BIGINT) AS rel_micro,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY CAST(floor({cosine_sql('qv', 'cv')} * 1000000.0
                           + 0.5) AS BIGINT) DESC, neighbor_id) AS rn
    FROM c CROSS JOIN q
  ) WHERE rn <= {MMR_M}
),
pairs AS MATERIALIZED (
  SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
         CAST(floor({cosine_sql('ea.embedding', 'eb.embedding')}
              * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
  FROM cand ca
  JOIN cand cb ON ca.query_id = cb.query_id
              AND ca.neighbor_id <> cb.neighbor_id
  JOIN embeddings ea ON ea.vec_id = ca.neighbor_id
  JOIN embeddings eb ON eb.vec_id = cb.neighbor_id
),
s1 AS (
  SELECT query_id, neighbor_id, 1 AS mmr_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel_micro DESC, neighbor_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
{chain}
SELECT sel.query_id, sel.neighbor_id,
       CAST(sel.mmr_rank AS INT) AS mmr_rank, cand.rel_micro
FROM ({union_all}) sel
JOIN cand USING (query_id, neighbor_id)
"""


MMR_RERANK_SQL = _mmr_rerank_sql()


def mmr_rerank_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR over the IVF-PROBED shortlist — the 100-TB serving path:
    instead of the brute shortlist's full candidate scan per query,
    candidates come from the probed fine cells of the shared
    two-level index (ivf_probe_pairs, the same stage knn_ivf serves
    from), then the IDENTICAL fixed greedy runs. Same columns, same
    recurrence; results may differ from the exact variant only where
    probing excludes a true top-M neighbor (the standard IVF recall
    trade, audited by sim_ann_recall_audit)."""
    cand = _mmr_shortlist(
        ivf_probe_pairs(
            spark, sf_dir, _query_frame(spark, sf_dir), cohort="registered"
        )
    )
    return _mmr_greedy(cand, _mmr_pairs(spark, sf_dir, cand))


def _mmr_rerank_ivf_sql() -> str:
    # cand/npairs are MATERIALIZED: the greedy chain references cand
    # in every step, and DuckDB re-inlines plain CTEs — on top of the
    # full two-level Lloyd replay that inlining is exponential.
    chain, union_all = _mmr_steps_sql(pairs_name="npairs")
    return f"""
{_ivf_pairs_sql()},
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_micro FROM (
    SELECT query_id, neighbor_id,
           CAST(floor({cosine_sql('qv', 'cv')} * 1000000.0 + 0.5)
                AS BIGINT) AS rel_micro,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY CAST(floor({cosine_sql('qv', 'cv')} * 1000000.0
                           + 0.5) AS BIGINT) DESC, neighbor_id) AS rn
    FROM pairs
  ) WHERE rn <= {MMR_M}
),
npairs AS MATERIALIZED (
  SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
         CAST(floor({cosine_sql('ea.embedding', 'eb.embedding')}
              * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
  FROM cand ca
  JOIN cand cb ON ca.query_id = cb.query_id
              AND ca.neighbor_id <> cb.neighbor_id
  JOIN embeddings ea ON ea.vec_id = ca.neighbor_id
  JOIN embeddings eb ON eb.vec_id = cb.neighbor_id
),
s1 AS (
  SELECT query_id, neighbor_id, 1 AS mmr_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel_micro DESC, neighbor_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
{chain}
SELECT sel.query_id, sel.neighbor_id,
       CAST(sel.mmr_rank AS INT) AS mmr_rank, cand.rel_micro
FROM ({union_all}) sel
JOIN cand USING (query_id, neighbor_id)
"""


MMR_RERANK_IVF_SQL = _mmr_rerank_ivf_sql()


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal, Gonzalez 1985):
# the corpus-level diverse-subset selection a curation pipeline runs
# to pick representative documents for labeling / eval / seeding —
# the 2-approximation to the k-center cover. Complements MMR (which
# diversifies one query's shortlist); this diversifies the corpus.

CORESET_K = 8  # centers to select


def _cos_dist_micro(a: F.Column, b: F.Column) -> F.Column:
    """Integer-micro cosine distance: 1e6 - floor(cos * 1e6 + 0.5)."""
    return (
        F.lit(1000000)
        - F.floor(cosine(a, b) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    ).cast("long")


def coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pick_rank, vec_id, dist_micro): greedy farthest-point k-center
    selection over the full embedding table. Pick 1 is the lowest
    vec_id (deterministic seed); pick t is the point maximizing its
    integer-micro cosine distance to the nearest already-selected
    center (ties to the lowest vec_id). ``dist_micro`` is that
    covering distance at selection time (0 for the seed) — the
    monotone non-increasing sequence whose last value bounds the
    k-center cover radius.

    Scale shape: the standard incremental farthest-point recurrence —
    the per-point state is ONE running min-distance, updated each
    round by a 1-row broadcast join (map-side, no data shuffle), and
    each pick is a distributed top-1 (TakeOrderedAndProject), never a
    single-partition global window. K passes over N rows total;
    lineage is truncated per round with lazy localCheckpoint. The
    DuckDB twin replays the identical fixed CTE chain.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    seed = emb.orderBy(F.asc("vec_id")).limit(1)
    st = (
        emb.crossJoin(
            F.broadcast(seed.select(F.col("embedding").alias("sv")))
        )
        .select(
            "vec_id",
            "embedding",
            _cos_dist_micro(F.col("embedding"), F.col("sv")).alias("mind"),
        )
        .localCheckpoint(eager=False)
    )
    picks = seed.select(
        F.lit(1).cast("int").alias("pick_rank"),
        "vec_id",
        F.lit(0).cast("long").alias("dist_micro"),
    )
    for t in range(2, CORESET_K + 1):
        # optimization r15 (guide §2.4 / §1.2): the picked row already
        # carries its embedding in ``st`` — thread it through ``new``
        # instead of re-joining the embeddings table per round, and
        # checkpoint the 1-row pick so the distributed top-1 is not
        # evaluated twice (once for picks, once for the state update).
        new = (
            st.join(F.broadcast(picks.select("vec_id")), "vec_id", "left_anti")
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(t).cast("int").alias("pick_rank"),
                "vec_id",
                F.col("mind").cast("long").alias("dist_micro"),
                F.col("embedding").alias("sv"),
            )
            .localCheckpoint(eager=False)
        )
        picks = picks.unionByName(
            new.select("pick_rank", "vec_id", "dist_micro")
        ).localCheckpoint(eager=False)
        if t == CORESET_K:
            break
        st = (
            st.crossJoin(F.broadcast(new.select("sv")))
            .select(
                "vec_id",
                "embedding",
                F.least(
                    F.col("mind"),
                    _cos_dist_micro(F.col("embedding"), F.col("sv")),
                ).alias("mind"),
            )
            .localCheckpoint(eager=False)
        )
    return picks


def _coreset_kcenter_sql() -> str:
    def d(a: str, b: str) -> str:
        return (
            f"(1000000 - CAST(floor({cosine_sql(a, b)} * 1000000.0 + 0.5) "
            f"AS BIGINT))"
        )

    # st{t} CTEs are MATERIALIZED: each is referenced by both the
    # next pick and the next state update, and DuckDB re-inlines
    # plain CTEs — without the hint the chain re-executes 2^K times.
    ctes = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        "p1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1)",
        f"""st1 AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, {d('e.embedding', 'p1.embedding')} AS mind
  FROM e CROSS JOIN p1
)""",
    ]
    for t in range(2, CORESET_K + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM p{i}" for i in range(1, t)
        )
        ctes.append(
            f"""p{t} AS (
  SELECT vec_id, embedding, mind FROM st{t-1}
  WHERE vec_id NOT IN ({prior})
  ORDER BY mind DESC, vec_id LIMIT 1
)"""
        )
        if t == CORESET_K:
            break
        ctes.append(
            f"""st{t} AS MATERIALIZED (
  SELECT s.vec_id, s.embedding,
         least(s.mind, {d('s.embedding', f'p{t}.embedding')}) AS mind
  FROM st{t-1} s CROSS JOIN p{t}
)"""
        )
    finals = [
        "SELECT CAST(1 AS INT) AS pick_rank, vec_id, "
        "CAST(0 AS BIGINT) AS dist_micro FROM p1"
    ] + [
        f"SELECT CAST({t} AS INT), vec_id, CAST(mind AS BIGINT) FROM p{t}"
        for t in range(2, CORESET_K + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


CORESET_KCENTER_SQL = _coreset_kcenter_sql()


# ---------------------------------------------------------------------------
# k-NN graph construction — the all-vectors neighbor graph (every
# vector gets its top-k within-cell neighbors), the building block
# under graph-based ANN indexes (HNSW layer 0 / NN-descent seeds),
# embedding-cluster dedup, and label propagation over semantic
# neighborhoods. Unlike the knn_* serving queries (which score the
# fixed query set), this emits an edge list for the WHOLE corpus.

KNN_GRAPH_K = 5  # neighbors per vector
KNN_GRAPH_CAP = 64  # per-cell candidate anchors (the SemDeDup bound)


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank): each vector's top-k
    cosine neighbors among its two-level k-means cell's
    ``KNN_GRAPH_CAP`` lowest-id members (itself excluded), rank 1 =
    closest, ties broken by ascending neighbor id. Vectors whose
    cell has no other anchor emit no edges.

    Scale shape: the SemDeDup linear bound — candidate volume is
    Σ min(|cell|, CAP)·|cell| <= n·CAP, one cell-keyed shuffle, and
    the per-vector window runs over <= CAP rows. The cap trades
    recall only on >CAP-member cells (none at the test scales); at
    corpus scale it is the same valve the paper's cluster
    approximation uses. Assignment is the shared two-level inline
    argmax (no data-side shuffle, plan-guarded in knn_ivf).
    """
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )

    assigned = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .select("vec_id", "v", "cell")
        .localCheckpoint(eager=True)
    )
    return _cell_topk(assigned)


def _cell_topk(assigned: DataFrame) -> DataFrame:
    """The within-cell top-k core over any (vec_id, v, cell) frame —
    shared by the full build and the delta-maintenance variant."""
    anchors = (
        assigned.withColumn(
            "arank",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(F.asc("vec_id"))
            ),
        )
        .where(F.col("arank") <= KNN_GRAPH_CAP)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("nv"),
            "cell",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        assigned.join(anchors, "cell")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(cosine(F.col("v"), F.col("nv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_GRAPH_K)
    )


def _knn_graph_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_ctes,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    return f"""
WITH {chain},
cells2 AS ({final}),
assigned AS (
  SELECT c.vec_id, e.v, c.cell FROM cells2 c JOIN emb e USING (vec_id)
),
anchors AS (
  SELECT vec_id AS neighbor_id, v AS nv, cell
  FROM (SELECT vec_id, v, cell, row_number() OVER (
          PARTITION BY cell ORDER BY vec_id ASC) AS arank
        FROM assigned)
  WHERE arank <= {KNN_GRAPH_CAP}
),
scored AS (
  SELECT b.vec_id, a.neighbor_id,
         round({cosine_sql('b.v', 'a.nv')}, 6) AS cos_sim
  FROM assigned b JOIN anchors a
    ON a.cell = b.cell AND a.neighbor_id <> b.vec_id
)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT vec_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (
           PARTITION BY vec_id
           ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {KNN_GRAPH_K}
"""


KNN_GRAPH_SQL = _knn_graph_sql()


# ---------------------------------------------------------------------------
# Multi-probe k-NN graph: union the candidates from TWO independent
# space partitions — the two-level k-means cells and the hyperplane
# sign buckets — then score once and keep top-k. Cell-only graphs
# cannot link vectors across a cell boundary no matter how close
# they are; a second, independently-drawn partition restores exactly
# those edges (the multi-table LSH / multi-probe IVF recall argument)
# while keeping candidate volume at the sum of two linear bounds.


def _multiprobe_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, cell, bucket): the two independent partition keys,
    checkpointed once — shared by the operator and the r14 cost
    decomposition (worklog) so measurements can't drift from the
    registered plan."""
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        kmeans_cells_2level_assigned,
    )

    n_planes = planes_for(corpus_size(spark, sf_dir))
    return (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .select("vec_id", "v", "cell")
        .withColumn("bucket", F.expr(_bucket_expr_spark_np("v", n_planes)))
        .localCheckpoint(eager=True)
    )


def _multiprobe_candidates(assigned: DataFrame) -> DataFrame:
    """The deduped (vec_id, neighbor_id) candidate relation — the
    union of both partitions' capped anchor pairs."""

    def part_pairs(key: str) -> DataFrame:
        anchors = (
            assigned.withColumn(
                "arank",
                F.row_number().over(
                    Window.partitionBy(key).orderBy(F.asc("vec_id"))
                ),
            )
            .where(F.col("arank") <= KNN_GRAPH_CAP)
            .select(F.col("vec_id").alias("neighbor_id"), key)
        )
        return (
            assigned.select("vec_id", key)
            .join(anchors, key)
            .where(F.col("vec_id") != F.col("neighbor_id"))
            .select("vec_id", "neighbor_id")
        )

    return part_pairs("cell").unionByName(part_pairs("bucket")).distinct()


def knn_graph_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank): top-``KNN_GRAPH_K``
    neighbors per vector over the UNION of its cell's and its
    hyperplane-bucket's ``KNN_GRAPH_CAP`` lowest-id anchors.

    Candidate volume is <= n*CAP per partition (the SemDeDup bound,
    twice); the union dedups on the pair key before the single
    scoring pass, so no pair is scored twice. Per-vector results
    dominate the single-partition graph pointwise: the candidate set
    is a superset of knn_graph's (verified in tests).

    The bucket key uses the ADAPTIVE plane count (VERDICT r08 item
    4): planes_for(n) grows the 2^p bucket space with the corpus so
    expected occupancy tracks KNN_GRAPH_CAP instead of saturating
    toward CAP-bounded cliques on dup-heavy corpora (the static
    8-plane key measured 13.9x at 100x data). Small corpora keep the
    historical 8 planes; the twin computes the same count from
    count(*) with all-integer arithmetic.
    """
    assigned = _multiprobe_assigned(spark, sf_dir)
    cands = _multiprobe_candidates(assigned)
    ev = assigned.select("vec_id", "v")
    scored = (
        cands.join(ev, "vec_id")
        .join(
            ev.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("nv"),
            ),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.round(cosine(F.col("v"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= KNN_GRAPH_K
    )


def _knn_graph_multiprobe_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_ctes,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)

    def part_sql(key: str) -> str:
        return f"""
  SELECT b.vec_id, a.vec_id AS neighbor_id
  FROM assigned b
  JOIN (SELECT vec_id, {key} FROM (
          SELECT vec_id, {key}, row_number() OVER (
            PARTITION BY {key} ORDER BY vec_id ASC) AS arank
          FROM assigned)
        WHERE arank <= {KNN_GRAPH_CAP}) a
    ON a.{key} = b.{key} AND a.vec_id <> b.vec_id"""

    return f"""
WITH {chain},
cells2 AS ({final}),
nplanes AS (SELECT {_planes_for_sql()} AS np),
assigned AS (
  SELECT c.vec_id, e.v, c.cell,
         {_bucket_expr_duckdb_np('e.v', 'np.np')} AS bucket
  FROM cells2 c JOIN emb e USING (vec_id) CROSS JOIN nplanes np
),
cands AS (
  SELECT DISTINCT vec_id, neighbor_id FROM ({part_sql('cell')}
  UNION ALL{part_sql('bucket')})
),
scored AS (
  SELECT cd.vec_id, cd.neighbor_id,
         round({cosine_sql('ev.v', 'en.v')}, 6) AS cos_sim
  FROM cands cd
  JOIN assigned ev ON ev.vec_id = cd.vec_id
  JOIN assigned en ON en.vec_id = cd.neighbor_id
)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT vec_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (
           PARTITION BY vec_id
           ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {KNN_GRAPH_K}
"""


KNN_GRAPH_MULTIPROBE_SQL = _knn_graph_multiprobe_sql()


# ---------------------------------------------------------------------------
# One NN-descent round (Dong et al. 2011) over the multi-probe graph:
# "a neighbor of my neighbor is probably my neighbor". Candidates =
# current edges  ∪  reversed edges  ∪  2-hop paths through the union
# graph; score once; keep top-k. Each round multiplies candidate
# volume by at most k (2-hop fan-out is k^2 per vector, k·n total
# new pairs), and recall can only improve — per-vector results
# dominate the input graph pointwise (asserted in tests).


def knn_graph_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank): top-``KNN_GRAPH_K``
    after one NN-descent round seeded by the multi-probe graph.

    Scale shape: the seed graph is n*k rows; reversal is a column
    swap; the 2-hop expansion is one self-join keyed on the shared
    middle vertex (<= n*k^2 candidate rows); pair-key dedup, then
    ONE scoring pass (two vec_id-keyed embedding joins) and the
    per-vector top-k window. No stage touches more than n*k^2 rows
    — corpus-linear for fixed k.
    """
    seed = (
        knn_graph_multiprobe(spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    return _nn_descent_round(spark, sf_dir, seed)


def _nn_descent_round(
    spark: SparkSession, sf_dir: str, seed: DataFrame
) -> DataFrame:
    """One NN-descent round over an arbitrary (vec_id, neighbor_id)
    seed — the shared body of knn_graph_refine and the convergence
    diagnostic (one definition of the candidate rule)."""
    undirected = seed.unionByName(
        seed.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )
    two_hop = (
        undirected.selectExpr("vec_id", "neighbor_id AS mid")
        .join(
            undirected.selectExpr(
                "vec_id AS mid", "neighbor_id AS neighbor_id"
            ),
            "mid",
        )
        .select("vec_id", "neighbor_id")
    )
    cands = (
        undirected.unionByName(two_hop)
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    scored = (
        cands.join(emb, "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("nv"),
            ),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.round(cosine(F.col("v"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= KNN_GRAPH_K
    )


def _nn_descent_chain_sql() -> str:
    """undirected → cands → scored → refined CTE chain reading a
    seed CTE named ``seed`` (vec_id, neighbor_id) — the SQL twin of
    :func:`_nn_descent_round`, shared by the refine twin and the
    convergence diagnostic. undirected is MATERIALIZED: it is
    referenced three times (one union branch, both sides of the
    2-hop join) and plain-CTE inlining would re-run the whole seed
    chain each time (the coreset/k-core lesson)."""
    return f"""undirected AS MATERIALIZED (
  SELECT vec_id, neighbor_id FROM seed
  UNION ALL
  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM seed
),
cands AS (
  SELECT DISTINCT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id FROM undirected
    UNION ALL
    SELECT a.vec_id, b.neighbor_id
    FROM undirected a JOIN undirected b ON a.neighbor_id = b.vec_id
  ) WHERE vec_id <> neighbor_id
),
scored AS (
  SELECT cd.vec_id, cd.neighbor_id,
         round({cosine_sql('ev.embedding', 'en.embedding')}, 6) AS cos_sim
  FROM cands cd
  JOIN embeddings ev ON ev.vec_id = cd.vec_id
  JOIN embeddings en ON en.vec_id = cd.neighbor_id
),
refined AS (
  SELECT vec_id, neighbor_id, cos_sim, rank FROM (
    SELECT vec_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (
             PARTITION BY vec_id
             ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
    FROM scored
  ) WHERE rank <= {KNN_GRAPH_K}
)"""


def _knn_graph_refine_sql() -> str:
    # seed MATERIALIZED on top of the full Lloyd replay — see
    # _nn_descent_chain_sql
    mp = KNN_GRAPH_MULTIPROBE_SQL.strip()
    return f"""
WITH seed AS MATERIALIZED (
  SELECT vec_id, neighbor_id FROM ({mp})
),
{_nn_descent_chain_sql()}
SELECT vec_id, neighbor_id, cos_sim, rank FROM refined
"""


KNN_GRAPH_REFINE_SQL = _knn_graph_refine_sql()


def knn_graph_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_vectors, n_improved, n_new_edges, total_gain_micro,
    max_gain_micro): the OBSERVABILITY row for NN-descent (VERDICT
    r08 item 8) — how much one refinement round actually improved
    the multiprobe graph, the metric a production refinement loop
    watches to decide when rounds stop paying (the role
    ann_recall_audit plays for IVF probe counts).

    Per vector, quality is the sum of its top-k neighbor cosines in
    integer micro-units; the gain is refined minus seed (>= 0 by the
    pointwise-dominance property pinned in the refine tests).
    n_new_edges counts refined edges absent from the seed. All
    integers, one row.

    Scale shape: the seed graph is computed ONCE (checkpointed) and
    feeds both the refinement round and the comparison; everything
    after the refine's bounded candidate stage is two vec_id-keyed
    rollups plus 1-row aggregates.
    """
    seed_full = knn_graph_multiprobe(spark, sf_dir).localCheckpoint(
        eager=True
    )
    # refined is n x k bounded and feeds BOTH the per-vector rollup
    # and the new-edge anti-join — checkpoint so the NN-descent
    # candidate stage runs once (PLANSTATS r13: 11 shuffles / 8 scans
    # before truncation)
    refined = _nn_descent_round(
        spark, sf_dir, seed_full.select("vec_id", "neighbor_id")
    ).localCheckpoint(eager=False)
    # repo-standard integer-micro idiom: floor(x*1e6 + 0.5) on BOTH
    # sides (cos_sim is pre-6dp-rounded so values are exact; floor is
    # engine-identical where HALF_UP vs double-round could tie-split)
    micro = F.floor(F.col("cos_sim") * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    seed_sum = seed_full.groupBy("vec_id").agg(F.sum(micro).alias("sm"))
    ref_sum = refined.groupBy("vec_id").agg(F.sum(micro).alias("rm"))
    gains = (
        seed_sum.join(ref_sum, "vec_id", "full")
        .select(
            (
                F.coalesce(F.col("rm"), F.lit(0))
                - F.coalesce(F.col("sm"), F.lit(0))
            ).alias("gain")
        )
    )
    stats = gains.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("gain") > 0).cast("long")).alias("n_improved"),
        F.sum("gain").alias("total_gain_micro"),
        F.max("gain").alias("max_gain_micro"),
    )
    new_edges = (
        refined.select("vec_id", "neighbor_id")
        .join(
            seed_full.select("vec_id", "neighbor_id"),
            ["vec_id", "neighbor_id"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_new_edges"))
    )
    return stats.crossJoin(F.broadcast(new_edges)).select(
        "n_vectors",
        "n_improved",
        "n_new_edges",
        "total_gain_micro",
        "max_gain_micro",
    )


def _knn_graph_convergence_sql() -> str:
    mp = KNN_GRAPH_MULTIPROBE_SQL.strip()
    return f"""
WITH seed_full AS MATERIALIZED (SELECT * FROM ({mp})),
seed AS MATERIALIZED (SELECT vec_id, neighbor_id FROM seed_full),
{_nn_descent_chain_sql()},
seed_sum AS (
  SELECT vec_id,
         sum(CAST(floor(cos_sim * 1e6 + 0.5) AS BIGINT)) AS sm
  FROM seed_full GROUP BY vec_id
),
ref_sum AS (
  SELECT vec_id,
         sum(CAST(floor(cos_sim * 1e6 + 0.5) AS BIGINT)) AS rm
  FROM refined GROUP BY vec_id
),
gains AS (
  SELECT coalesce(r.rm, 0) - coalesce(s.sm, 0) AS gain
  FROM seed_sum s FULL JOIN ref_sum r USING (vec_id)
),
new_edges AS (
  SELECT CAST(count(*) AS BIGINT) AS n_new_edges FROM refined r
  WHERE NOT EXISTS (SELECT 1 FROM seed s
                    WHERE s.vec_id = r.vec_id
                      AND s.neighbor_id = r.neighbor_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_improved,
       (SELECT n_new_edges FROM new_edges) AS n_new_edges,
       CAST(sum(gain) AS BIGINT) AS total_gain_micro,
       CAST(max(gain) AS BIGINT) AS max_gain_micro
FROM gains
"""


KNN_GRAPH_CONVERGENCE_SQL = _knn_graph_convergence_sql()


# ---------------------------------------------------------------------------
# Delta maintenance of the kNN graph — the CDC discipline
# (retrieval_index_delta's) applied to graph construction: when a
# batch of NEW vectors arrives, only the cells they land in can have
# changed edges, so the update recomputes the within-cell top-k for
# touched cells only and leaves every other cell's edges untouched.
# The index (trained centroids) is fixed; membership updates.

DELTA_NEW_TENTHS = 9  # vec_id * 10 >= (max_id + 1) * 9  =>  "new"


def _graph_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )

    return (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .select("vec_id", "v", "cell")
        .localCheckpoint(eager=True)
    )


def knn_graph_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rank): the UPDATE SET a kNN
    graph store applies when the newest tenth of vectors (integer
    rule: ``vec_id * 10 >= (max_id + 1) * DELTA_NEW_TENTHS``)
    arrives — the post-update within-cell top-k for every vector in
    a cell touched by a new vector. Cells no new vector lands in are
    untouched (their stored edges remain exactly valid — pinned in
    tests via the merge==rebuild identity).

    Scale shape: delta-sized — assignment of the new batch is the
    shared inline two-level argmax; the |touched cells| membership
    semi-join and the top-k recompute run only over touched cells
    (<= |delta| cells), so update cost tracks the batch, not the
    corpus.
    """
    assigned = _graph_assigned(spark, sf_dir)
    mx = assigned.agg(F.max("vec_id").alias("mx"))
    flagged = assigned.crossJoin(F.broadcast(mx)).withColumn(
        "is_new",
        F.col("vec_id") * 10 >= (F.col("mx") + 1) * DELTA_NEW_TENTHS,
    )
    touched = (
        flagged.where(F.col("is_new")).select("cell").distinct()
    )
    sub = flagged.join(F.broadcast(touched), "cell").select(
        "vec_id", "v", "cell"
    )
    return _cell_topk(sub)


def _knn_graph_delta_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_ctes,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    return f"""
WITH {chain},
cells2 AS ({final}),
assigned AS MATERIALIZED (
  SELECT c.vec_id, e.v, c.cell FROM cells2 c JOIN emb e USING (vec_id)
),
mx AS (SELECT max(vec_id) AS mx FROM assigned),
touched AS (
  SELECT DISTINCT cell FROM assigned CROSS JOIN mx
  WHERE vec_id * 10 >= (mx + 1) * {DELTA_NEW_TENTHS}
),
sub AS (
  SELECT vec_id, v, cell FROM assigned
  WHERE cell IN (SELECT cell FROM touched)
),
anchors AS (
  SELECT vec_id AS neighbor_id, v AS nv, cell
  FROM (SELECT vec_id, v, cell, row_number() OVER (
          PARTITION BY cell ORDER BY vec_id ASC) AS arank
        FROM sub)
  WHERE arank <= {KNN_GRAPH_CAP}
),
scored AS (
  SELECT b.vec_id, a.neighbor_id,
         round({cosine_sql('b.v', 'a.nv')}, 6) AS cos_sim
  FROM sub b JOIN anchors a
    ON a.cell = b.cell AND a.neighbor_id <> b.vec_id
)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT vec_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (
           PARTITION BY vec_id
           ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {KNN_GRAPH_K}
"""


KNN_GRAPH_DELTA_SQL = _knn_graph_delta_sql()


# ---------------------------------------------------------------------------
# Nearest-centroid classifier evaluation — the Rocchio-style baseline
# every embedding-quality audit starts from: assign each vector to
# its closest LABEL centroid (exact quantized means, the
# label_centroids artifact) and report the confusion matrix. If this
# cheap classifier can't separate the labels, the embeddings won't
# carry a downstream model either.


def centroid_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(true_label, pred_label, n): resubstitution confusion matrix
    of the nearest-centroid classifier over the label_centroids
    means.

    Determinism: per-dim products quantize to integer micro BEFORE
    the (vector, label) sum — integer sums are order-independent, so
    the distributed dot product is exact; the label argmax divides
    two engine-identical doubles (int dot / sqrt of int sum-square)
    and ties break to the lowest label.

    Scale shape: the scoring relation is |vectors| x dims x |labels|
    rows, collapsed by map-side partial aggregation on (vec, label);
    the centroid table (|labels| x dims) broadcasts; output is at
    most |labels|^2 rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select("vec_id", "true_label", "dim", F.col("v").cast("double").alias("v"))
    cent = label_centroids(spark, sf_dir).select(
        F.col("label").alias("cand_label"), "dim", "centroid_v"
    )
    normc = cent.groupBy("cand_label").agg(
        F.sqrt(
            F.sum(
                F.round(
                    F.col("centroid_v") * F.col("centroid_v") * F.lit(1e6)
                ).cast("long")
            ).cast("double")
        ).alias("norm_c")
    )
    dotq = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "true_label", "cand_label")
        .agg(
            F.sum(
                F.round(
                    F.col("v") * F.col("centroid_v") * F.lit(1e6)
                ).cast("long")
            ).alias("dotq")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("score"), F.asc("cand_label")
    )
    pred = (
        dotq.join(F.broadcast(normc), "cand_label")
        .withColumn(
            "score", F.col("dotq").cast("double") / F.col("norm_c")
        )
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("true_label", F.col("cand_label").alias("pred_label"))
    )
    return pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )


CENTROID_CLASSIFIER_EVAL_SQL = f"""
WITH cent AS MATERIALIZED ({LABEL_CENTROIDS_SQL.strip()}),
ex AS (
  SELECT vec_id, label AS true_label,
         unnest(range(len(embedding))) AS dim,
         CAST(embedding[CAST(unnest(range(len(embedding))) AS INT) + 1]
              AS DOUBLE) AS v
  FROM embeddings
),
normc AS (
  SELECT label AS cand_label,
         sqrt(CAST(sum(CAST(round(centroid_v * centroid_v * 1e6)
                           AS BIGINT)) AS DOUBLE)) AS norm_c
  FROM cent GROUP BY label
),
dotq AS (
  SELECT ex.vec_id, ex.true_label, cent.label AS cand_label,
         CAST(sum(CAST(round(ex.v * cent.centroid_v * 1e6) AS BIGINT))
              AS BIGINT) AS dotq
  FROM ex JOIN cent USING (dim)
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT true_label, cand_label AS pred_label FROM (
    SELECT d.true_label, d.cand_label,
           row_number() OVER (
             PARTITION BY d.vec_id
             ORDER BY CAST(d.dotq AS DOUBLE) / n.norm_c DESC,
                      d.cand_label) AS rn
    FROM dotq d JOIN normc n USING (cand_label)
  ) WHERE rn = 1
)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Retrieval label purity — labels-as-relevance evaluation: what
# fraction of each query's top-k neighbors share its label. The
# recall audit (sim_ann_recall_audit) measures faithfulness to brute
# force; this measures whether retrieved neighbors are SEMANTICALLY
# right, the metric that actually gates an embedding model swap.


def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, query_label, n_hits, purity_bp): per query, how
    many of its IVF top-k neighbors carry the query's label, in
    integer basis points of k.

    Scale shape: two vec_id-keyed label joins onto the k-bounded
    search result (k rows per query), one query-keyed rollup.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    hits = knn_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    ql = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
    )
    nl = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
    )
    return (
        hits.join(F.broadcast(ql), "query_id")
        .join(nl, "neighbor_id")
        .groupBy("query_id", "query_label")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(
                F.when(
                    F.col("n_label") == F.col("query_label"), 1
                ).otherwise(0)
            ).alias("n_hits"),
        )
        .select(
            "query_id",
            "query_label",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("CAST((n_hits * 10000L) DIV k AS BIGINT)").alias(
                "purity_bp"
            ),
        )
    )


KNN_LABEL_PURITY_SQL = f"""
WITH hits AS MATERIALIZED (
{KNN_IVF_SQL.strip()}
)
SELECT h.query_id, ql.label AS query_label,
       CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST((sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)
             * 10000) // count(*) AS BIGINT) AS purity_bp
FROM hits h
JOIN embeddings ql ON ql.vec_id = h.query_id
JOIN embeddings nl ON nl.vec_id = h.neighbor_id
GROUP BY 1, 2
"""


def bitext_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_capped, n_exact_cells, n_common, recall_bp, precision_bp):
    the observability row for the capped bitext default — how many of
    the UNCAPPED cell-probed variant's mined pairs the capped
    fixed-probe path still finds (recall, basis points) and how many
    of its own pairs the uncapped variant confirms (precision). The
    dial a production deployment watches when tuning BITEXT_PROBES /
    BITEXT_CELL_CAP, exactly the role sim_ann_recall_audit plays for
    the IVF probe count.

    Scale note: the audit runs the UNCAPPED variant, so it is an
    audit-sized job over a sampled corpus at scale (the
    ann_recall_audit discipline), not a production path.

    Plan shape (r12): each mined-pair relation is referenced twice
    below (semi-join + its own count), and without lineage
    truncation each reference re-derives the FULL bitext pipeline —
    two-level tree, probe ranking, rerank — inside one action
    (PLANSTATS r11: 120 scans, 2x the next-widest plan). Both pair
    relations are bounded (capped / per-cell-capped emission), so
    localCheckpoint them once and let every consumer read the
    materialized artifact — the same pattern that took the LSH band
    relations 4.4 s -> 2.8 s in r1.
    """
    capped = (
        bitext_mining_capped(spark, sf_dir)
        .select("src_id", "tgt_id")
        .localCheckpoint(eager=False)
    )
    exact = (
        bitext_mining_ivf(spark, sf_dir)
        .select("src_id", "tgt_id")
        .localCheckpoint(eager=False)
    )
    common = capped.join(exact, ["src_id", "tgt_id"], "left_semi")
    nc = capped.agg(F.count(F.lit(1)).alias("n_capped"))
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact_cells"))
    nb = common.agg(F.count(F.lit(1)).alias("n_common"))
    return (
        nc.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_capped",
            "n_exact_cells",
            "n_common",
            F.expr(
                "CASE WHEN n_exact_cells > 0"
                " THEN (10000 * n_common) div n_exact_cells END"
            ).alias("recall_bp"),
            F.expr(
                "CASE WHEN n_capped > 0"
                " THEN (10000 * n_common) div n_capped END"
            ).alias("precision_bp"),
        )
    )


def _bitext_recall_audit_sql() -> str:
    capped = BITEXT_MINING_CAPPED_SQL.strip()
    exact = BITEXT_MINING_IVF_SQL.strip()
    return f"""
WITH capped AS MATERIALIZED (
  SELECT src_id, tgt_id FROM ({capped})
),
exact_cells AS MATERIALIZED (
  SELECT src_id, tgt_id FROM ({exact})
),
common AS (
  SELECT count(*) AS n_common FROM capped c
  WHERE EXISTS (SELECT 1 FROM exact_cells e
                WHERE e.src_id = c.src_id AND e.tgt_id = c.tgt_id)
),
counts AS (
  SELECT CAST((SELECT count(*) FROM capped) AS BIGINT) AS n_capped,
         CAST((SELECT count(*) FROM exact_cells) AS BIGINT)
           AS n_exact_cells,
         CAST((SELECT n_common FROM common) AS BIGINT) AS n_common
)
SELECT n_capped, n_exact_cells, n_common,
       CASE WHEN n_exact_cells > 0
            THEN (10000 * n_common) // n_exact_cells END AS recall_bp,
       CASE WHEN n_capped > 0
            THEN (10000 * n_common) // n_capped END AS precision_bp
FROM counts
"""


BITEXT_RECALL_AUDIT_SQL = _bitext_recall_audit_sql()


def bitext_probe_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_probe_budget, n_exact, n_reachable, recall): the
    recall-vs-cost CURVE of the fixed-probe bitext dial — for every
    probe budget p up to BITEXT_PROBES, the fraction of the
    cell-probed exact variant's mined pairs whose TARGET cell the
    source doc would reach probing only its p best fine cells.
    bitext_recall_audit answers "is the default OK?"; this is the
    tuning artifact that says what the next probe buys (the
    ivf_probe_sensitivity role, for mining). Reachability isolates
    the PROBE knob: BITEXT_CELL_CAP losses are the audit's
    precision/recall row, not this curve.

    Monotone in p by construction (a reachable cell stays reachable
    at a larger budget) — pinned as a property test.

    Scale note: the exact side replays the uncapped cell-probed
    variant, so like the audit this is a sampled-cohort job at
    scale, not a production path. The curve itself is |pairs| x
    |budgets| bounded with the probe ranking's narrow
    (query_id, cell, prk) exchange.
    """
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )

    exact = bitext_mining_ivf(spark, sf_dir).select(
        F.col("src_id").alias("query_id"), "tgt_id"
    )
    cand = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .where(F.col("vec_id") >= N_QUERIES)
        .select(F.col("vec_id").alias("tgt_id"), "cell")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    q = (
        emb.join(langs, "vec_id")
        .where(F.col("lang") == "en")
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )
    probes = probe_rank(spark, sf_dir, q).select("query_id", "cell", "prk")
    hits = exact.join(cand, "tgt_id").join(
        probes, ["query_id", "cell"], "left_outer"
    )
    budgets = spark.range(1, BITEXT_PROBES + 1).select(
        F.col("id").cast("int").alias("n_probe_budget")
    )
    return (
        hits.crossJoin(F.broadcast(budgets))
        .groupBy("n_probe_budget")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(
                F.when(F.col("prk") <= F.col("n_probe_budget"), 1).otherwise(0)
            ).cast("long").alias("n_reachable"),
        )
        .select(
            "n_probe_budget",
            "n_exact",
            "n_reachable",
            F.round(
                F.col("n_reachable").cast("double")
                / F.col("n_exact").cast("double"),
                6,
            ).alias("recall"),
        )
    )


def _bitext_probe_sensitivity_sql() -> str:
    from spark_app_twitter_spark.operators.clustering import (
        ITERS,
        _centroid_score_sql,
        kmeans_2level_assigned_cte,
        kmeans_cells_2level_ctes,
        levels_sql,
    )

    parts, _final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    k1_sql, k2_sql = levels_sql()
    p1_sql = (
        f"greatest(1, CAST(ceil({k1_sql} / {PROBE_FRACTION}.0) AS INT))"
    )
    cand = kmeans_2level_assigned_cte(
        "vec_id AS tgt_id, cell", where=f"m.vec_id >= {N_QUERIES}"
    )
    exact = BITEXT_MINING_IVF_SQL.strip()
    return f"""
WITH {chain},
exact AS MATERIALIZED (
  SELECT src_id AS query_id, tgt_id FROM ({exact})
),
cand AS ({cand}),
q AS (
  SELECT e.vec_id AS query_id, e.v AS qv FROM emb e
  JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en'
),
probe_coarse AS (
  SELECT query_id, qv, coarse FROM (
    SELECT q.query_id, q.qv, c.cell AS coarse,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_centroid_score_sql('q.qv', 'c.cv')} DESC,
                                       c.cell ASC) AS crk
    FROM q CROSS JOIN c{ITERS} c
  ) WHERE crk <= {p1_sql}
),
probes AS (
  SELECT pc.query_id,
         CAST(pc.coarse * {k2_sql} + f.fine AS INT) AS cell,
         row_number() OVER (PARTITION BY pc.query_id
                            ORDER BY {_centroid_score_sql('pc.qv', 'f.fv')} DESC,
                                     CAST(pc.coarse * {k2_sql} + f.fine AS INT) ASC) AS prk
  FROM probe_coarse pc JOIN f{ITERS} f ON pc.coarse = f.coarse
),
hits AS (
  SELECT e.query_id, p.prk
  FROM exact e
  JOIN cand c USING (tgt_id)
  LEFT OUTER JOIN probes p
    ON e.query_id = p.query_id AND c.cell = p.cell
),
budgets AS (
  SELECT CAST(unnest(range(1, {BITEXT_PROBES} + 1)) AS INT)
    AS n_probe_budget
)
SELECT b.n_probe_budget,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN h.prk <= b.n_probe_budget THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reachable,
       round(CAST(sum(CASE WHEN h.prk <= b.n_probe_budget THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM hits h CROSS JOIN budgets b
GROUP BY b.n_probe_budget
"""


BITEXT_PROBE_SENSITIVITY_SQL = _bitext_probe_sensitivity_sql()
