"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public arXiv:2303.09540).

The trick that makes embedding dedup tractable at corpus scale:
instead of all-pairs cosine over N documents (O(N²)), k-means the
embeddings into cells and compare ONLY within a cell, and each cell's
pairwise block is an independent task. Rising corpus size is absorbed
by raising k (k ∝ √n keeps training/assignment at n^1.5), and the
pairwise stage is bounded LINEAR by the per-cell candidate cap
(``SEM_CANDIDATE_CAP``): each vector checks only the cap lowest-id
members of its cell, so Σ min(|cell|, CAP)·|cell| <= n·CAP and a
pathological mega-cell cannot blow up the stage.

Pipeline here (all deterministic, oracle-replayable):
  1. cells <- Lloyd k-means (operators/clustering.py: fixed first-k
     init, quantized recenter).
  2. pairwise cosine within each cell; pairs over SEM_DUP_THRESHOLD
     are semantic duplicates.
  3. keep-first policy: a vector drops iff it has a near-dup with a
     LOWER vec_id (the paper keeps the point closest to the centroid;
     lowest-id is the order-free deterministic equivalent).

Output: (vec_id, cell, keep) — the full corpus with its survival
verdict, ready to semi-join the documents table as a filter stage.

Reference scope note: the reference app has no dedup at all; this
family comes from SURVEY.md's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.vectors import cosine, cosine_sql
from spark_app_twitter_spark.operators.clustering import (
    ITERS,
    K_CELLS,
    _centroid_score_sql,
    _vecs,
    assign_cells,
    kmeans_centroid_ctes,
    kmeans_centroid_rows,
)

SEM_DUP_THRESHOLD = 0.40  # synthetic embeddings are near-orthogonal; real corpora use ~0.95

# Per-cell candidate bound (VERDICT r05: the k=√n adaptive cell count
# balances assignment vs pairwise cost at n^1.5 each, but lets the
# intra-cell pairwise stage grow superlinearly). Each vector compares
# only against the SEM_CANDIDATE_CAP lowest-id members of its cell,
# so total pairwise work is Σ min(|cell|, CAP)·|cell| <= n·CAP —
# LINEAR in corpus size — and a pathological mega-cell is bounded by
# construction. 64 exceeds every observed cell at the test scales
# (max 35 @ sf0.01, 56 @ sf0.1), so small-SF results are unchanged;
# at 100 TB the cap is the scale valve, trading recall on >64-member
# cells exactly like the paper's cluster approximation trades recall
# against all-pairs. Measured: 30x data = 3.4x time (13.0x before the
# cap), 100x = 65.5x. With pairwise linear, the remaining n^1.5 term
# is the shared k-means train/assign (n*k, k=sqrt(n)); beyond ~1e7
# vectors production swaps in hierarchical cell assignment — a
# clustering-module boundary, not a semdedup one.
SEM_CANDIDATE_CAP = 64


def semdedup_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, keep) over FLAT Lloyd cells — keep=false iff a
    same-cell near-dup ANCHOR (one of the cell's SEM_CANDIDATE_CAP
    lowest-id members) with a lower vec_id exists.

    The explicit small-n variant (VERDICT r06 item 4 demoted it from
    the default): its train/assign cost is n·k with k = √n, which is
    the right trade only while the corpus is small enough that one
    flat centroid table beats the two-level tree's extra stage. The
    registered default is :func:`semdedup`.

    Plan shape: the assigned relation (vec_id, v, cell) is
    materialized once (assignment is a shuffle-free map against the
    driver-held trained centroids, and the checkpoint feeds both
    sides of the self-join); the self-join shuffles on the cell id —
    narrow rows, cells bounded by the candidate cap on the build
    side. The drop set is tiny and left-joins back for the keep flag.
    """
    assigned = assign_cells(
        spark, _vecs(spark, sf_dir), kmeans_centroid_rows(spark, sf_dir)
    ).localCheckpoint(eager=True)
    return _keep_first_within(assigned)


def _keep_first_within(assigned: DataFrame) -> DataFrame:
    """The capped intra-cell keep-first stage shared by both cell
    assignments (flat and two-level): anchors are each cell's
    SEM_CANDIDATE_CAP lowest-id members; a vector drops iff an anchor
    with a lower id is within SEM_DUP_THRESHOLD cosine. ONE
    definition — the linear-bound discipline must not fork."""
    from pyspark.sql import Window

    anchor_rank = F.row_number().over(
        Window.partitionBy("cell").orderBy(F.asc("vec_id"))
    )
    a = (
        assigned.withColumn("arank", anchor_rank)
        .where(F.col("arank") <= SEM_CANDIDATE_CAP)
        .select(
            F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"), "cell"
        )
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"), "cell"
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            F.round(cosine(F.col("a_v"), F.col("b_v")), 6) > SEM_DUP_THRESHOLD
        )
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned.vec_id == dups.dup_id, "left_outer")
        .select(
            "vec_id",
            "cell",
            F.col("dup_id").isNull().alias("keep"),
        )
    )


def _semdedup_flat_sql() -> str:
    kmeans_chain = ",\n".join(kmeans_centroid_ctes())
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_assigned_cte,
    )

    assign = f"assigned AS ({kmeans_assigned_cte()})"
    return f"""
WITH {kmeans_chain},
{assign},
anchors AS (
  SELECT vec_id, v, cell
  FROM (SELECT vec_id, v, cell, row_number() OVER (
          PARTITION BY cell ORDER BY vec_id ASC) AS arank
        FROM assigned)
  WHERE arank <= {SEM_CANDIDATE_CAP}
),
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM anchors a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({cosine_sql('a.v', 'b.v')}, 6) > {SEM_DUP_THRESHOLD}
)
SELECT assigned.vec_id, assigned.cell, dup_id IS NULL AS keep
FROM assigned LEFT OUTER JOIN dups ON assigned.vec_id = dup_id
"""


SEMDEDUP_FLAT_SQL = _semdedup_flat_sql()

def semdedup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, keep): SemDeDup over the hierarchical two-level
    cell assignment — THE REGISTERED DEFAULT since round 7 (VERDICT
    r06 item 4: 7.7× vs the flat variant's 65.5× at 100× data). The
    answer to the flat variant's documented n*k (k = sqrt(n))
    training/assignment boundary: every vector scores ~2*sqrt(k)
    centroids instead of k (clustering.kmeans_cells_2level), and the
    pairwise stage is the SAME capped keep-first self-join, still
    bounded by Σ min(|cell|, CAP)·|cell| <= n·CAP. Cell boundaries
    differ from the flat variant (finer tree, same discipline), so
    survivors may differ — this is the documented scale-path trade,
    verified by its own full-tree DuckDB replay oracle.
    """
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )

    # the assignment already carries the vector — no second
    # embeddings scan / vec_id join (review finding)
    assigned = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .select("vec_id", "v", "cell")
        .localCheckpoint(eager=True)
    )
    return _keep_first_within(assigned)


def _semdedup_2level_sql() -> str:
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
  SELECT vec_id, v, cell
  FROM (SELECT vec_id, v, cell, row_number() OVER (
          PARTITION BY cell ORDER BY vec_id ASC) AS arank
        FROM assigned)
  WHERE arank <= {SEM_CANDIDATE_CAP}
),
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM anchors a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({cosine_sql('a.v', 'b.v')}, 6) > {SEM_DUP_THRESHOLD}
)
SELECT assigned.vec_id, assigned.cell, dup_id IS NULL AS keep
FROM assigned LEFT OUTER JOIN dups ON assigned.vec_id = dup_id
"""


SEMDEDUP_2LEVEL_SQL = _semdedup_2level_sql()


# ---------------------------------------------------------------------------
# Semantic benchmark decontamination: the embedding-similarity
# complement of textstats.decontaminate's n-gram collision check
# (modern pipelines run BOTH — paraphrased eval items share no
# n-grams but sit next to the eval doc in embedding space). Same
# held-out split as the n-gram gate (doc_id % DECON_BENCH_MOD ==
# DECON_BENCH_REM, one definition of "the benchmark"), same capped
# intra-cell discipline as semdedup (benchmark members per cell
# capped at SEM_CANDIDATE_CAP lowest-id — the linear-bound trade,
# documented recall seam at extreme per-cell benchmark density).
SEMDECON_THRESHOLD = 0.30  # deliberately LOOSER than the dedup
# threshold: a contamination screen prefers recall (flag-and-review)
# over the dedup gate's precision — the same reason n-gram decon
# uses small n. Synthetic near-orthogonal embeddings put background
# similarity ~0; real corpora tune ~0.90-0.95.


def _bench_train_split(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """ONE definition of the semantic screens' held-out split and
    per-cell bench ordering, shared by the production screen
    (decontaminate_semantic) and its sensitivity audit — the audit's
    cap_recall is only ground truth if its in_cap flag matches the
    production cap filter exactly, so the construction cannot fork.

    Returns (bench, train): bench rows carry (bench_id, bv, cell,
    brank) with brank the 1-based lowest-id-first rank within the
    cell (the production screen keeps brank <= SEM_CANDIDATE_CAP);
    train rows carry (doc_id, tv, cell)."""
    from pyspark.sql import Window

    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_assigned,
    )
    from spark_app_twitter_spark.operators.textstats import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
    )

    assigned = (
        kmeans_cells_2level_assigned(spark, sf_dir)
        .select("vec_id", "v", "cell")
        .localCheckpoint(eager=True)  # feeds both join sides
    )
    is_b = (F.col("vec_id") % DECON_BENCH_MOD) == DECON_BENCH_REM
    brank = F.row_number().over(
        Window.partitionBy("cell").orderBy(F.asc("vec_id"))
    )
    bench = (
        assigned.where(is_b)
        .withColumn("brank", brank)
        .select(
            F.col("vec_id").alias("bench_id"),
            F.col("v").alias("bv"),
            "cell",
            "brank",
        )
    )
    train = assigned.where(~is_b).select(
        F.col("vec_id").alias("doc_id"), F.col("v").alias("tv"), "cell"
    )
    return bench, train


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bench_hits, max_sim, bench_id): training docs whose
    embedding sits within SEMDECON_THRESHOLD cosine of a held-out
    benchmark doc sharing their fine cell — per contaminated doc, the
    number of (capped) benchmark neighbours over threshold, the best
    similarity (6dp), and the best-matching benchmark id (ties break
    on the LOWEST bench id).

    Scale shape: rides the shared two-level assignment (shuffle-free
    inline scoring against driver-held centroids); the bench×train
    pair stage is a cell-keyed equi-join with the bench side capped
    per cell — Σ min(|bench∩cell|, CAP)·|cell| <= n·CAP, the
    semdedup bound. The rollup is doc_id-keyed.
    """
    bench_ranked, train = _bench_train_split(spark, sf_dir)
    bench = bench_ranked.where(
        F.col("brank") <= SEM_CANDIDATE_CAP
    ).select("bench_id", "bv", "cell")
    hits = (
        train.join(bench, "cell")
        .withColumn(
            "cos_sim", F.round(cosine(F.col("tv"), F.col("bv")), 6)
        )
        .where(F.col("cos_sim") > SEMDECON_THRESHOLD)
    )
    # argmax(bench_id tie-break: lowest id) as a struct max — one
    # aggregation, no second window pass
    best = F.max(
        F.struct(
            F.col("cos_sim").alias("s"),
            (-F.col("bench_id")).alias("nb"),
        )
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            best.alias("m"),
        )
        .select(
            "doc_id",
            "n_bench_hits",
            F.col("m.s").alias("max_sim"),
            (-F.col("m.nb")).cast("bigint").alias("bench_id"),
        )
    )


def _bench_train_sql_ctes() -> str:
    """The SQL realization of _bench_train_split — the twins share
    this text so the oracle-side split/cap construction cannot fork
    either. Yields CTEs: ... , assigned, bench_ranked (bench_id, bv,
    cell, brank), train (doc_id, tv, cell)."""
    from spark_app_twitter_spark.operators.clustering import (
        kmeans_cells_2level_ctes,
    )
    from spark_app_twitter_spark.operators.textstats import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
    )

    parts, final = kmeans_cells_2level_ctes()
    chain = ",\n".join(parts)
    return f"""{chain},
cells2 AS ({final}),
assigned AS (
  SELECT c.vec_id, e.v, c.cell FROM cells2 c JOIN emb e USING (vec_id)
),
bench_ranked AS (
  SELECT vec_id AS bench_id, v AS bv, cell, row_number() OVER (
           PARTITION BY cell ORDER BY vec_id ASC) AS brank
  FROM assigned
  WHERE vec_id % {DECON_BENCH_MOD} = {DECON_BENCH_REM}
),
train AS (
  SELECT vec_id AS doc_id, v AS tv, cell FROM assigned
  WHERE vec_id % {DECON_BENCH_MOD} <> {DECON_BENCH_REM}
)"""


def _decontaminate_semantic_sql() -> str:
    return f"""
WITH {_bench_train_sql_ctes()},
bench AS (
  SELECT bench_id, bv, cell FROM bench_ranked
  WHERE brank <= {SEM_CANDIDATE_CAP}
),
hits AS (
  SELECT doc_id, bench_id,
         round({cosine_sql('tv', 'bv')}, 6) AS cos_sim
  FROM train t JOIN bench b USING (cell)
  WHERE round({cosine_sql('tv', 'bv')}, 6) > {SEMDECON_THRESHOLD}
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
         max(cos_sim) AS max_sim
  FROM hits GROUP BY doc_id
)
SELECT a.doc_id, a.n_bench_hits, a.max_sim,
       CAST(min(h.bench_id) AS BIGINT) AS bench_id
FROM agg a JOIN hits h
  ON h.doc_id = a.doc_id AND h.cos_sim = a.max_sim
GROUP BY a.doc_id, a.n_bench_hits, a.max_sim
"""


DECONTAMINATE_SEMANTIC_SQL = _decontaminate_semantic_sql()


# Threshold grid for the sensitivity audit — spans well below and
# above the production SEMDECON_THRESHOLD (0.30) so the curve shows
# what tightening or loosening the dial buys. Synthetic fixtures put
# background similarity ~0, so the interesting region is low.
SEMDECON_GRID = (0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.40, 0.50)


def decontaminate_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(threshold, n_pairs, n_flagged, n_flagged_capped, cap_recall):
    the SEMDECON_THRESHOLD dial's sensitivity curve (VERDICT r10
    item 7 — the bitext_probe_sensitivity role for the semantic
    contamination screen). For every threshold in SEMDECON_GRID:
    how many intra-cell bench×train pairs score above it, how many
    distinct training docs would be flagged, how many of those the
    SEM_CANDIDATE_CAP-capped production screen still flags, and the
    cap's recall at that threshold (null when nothing is flagged).
    n_pairs / n_flagged are non-increasing in threshold by
    construction — pinned as a property test, with planted
    paraphrases exercising the non-trivial region.

    Scale note: the FULL (uncapped) intra-cell pair relation is the
    audit's ground truth — Σ|bench∩cell|·|cell| pairs, the same
    sampled-cohort shape as bitext_probe_sensitivity's exact replay;
    the production screen stays the capped decontaminate_semantic.
    One pass over the pair relation: the 8-row grid broadcasts, and
    map-side combine collapses each task to |grid| groups.
    """
    bench_ranked, train = _bench_train_split(spark, sf_dir)
    bench = bench_ranked.select(
        "bv",
        "cell",
        (F.col("brank") <= SEM_CANDIDATE_CAP).alias("in_cap"),
    )
    pairs = train.join(bench, "cell").select(
        "doc_id",
        "in_cap",
        F.round(cosine(F.col("tv"), F.col("bv")), 6).alias("cos_sim"),
    )
    grid = spark.createDataFrame(
        [(float(t),) for t in SEMDECON_GRID], "threshold double"
    )
    hit = F.col("cos_sim") > F.col("threshold")
    n_flagged = F.count_distinct(F.when(hit, F.col("doc_id")))
    n_capped = F.count_distinct(
        F.when(hit & F.col("in_cap"), F.col("doc_id"))
    )
    return (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_pairs"),
            n_flagged.cast("long").alias("n_flagged"),
            n_capped.cast("long").alias("n_flagged_capped"),
        )
        .select(
            "threshold",
            "n_pairs",
            "n_flagged",
            "n_flagged_capped",
            F.when(
                F.col("n_flagged") > 0,
                F.round(
                    F.col("n_flagged_capped").cast("double")
                    / F.col("n_flagged").cast("double"),
                    6,
                ),
            ).alias("cap_recall"),
        )
    )


def _decontaminate_threshold_sensitivity_sql() -> str:
    grid = ", ".join(str(t) for t in SEMDECON_GRID)
    return f"""
WITH {_bench_train_sql_ctes()},
bench AS (
  SELECT bv, cell, brank <= {SEM_CANDIDATE_CAP} AS in_cap
  FROM bench_ranked
),
pairs AS (
  SELECT doc_id, in_cap,
         round({cosine_sql('tv', 'bv')}, 6) AS cos_sim
  FROM train t JOIN bench b USING (cell)
),
grid AS (SELECT CAST(unnest([{grid}]) AS DOUBLE) AS threshold),
agg AS (
  SELECT g.threshold,
         CAST(sum(CASE WHEN p.cos_sim > g.threshold THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT CASE WHEN p.cos_sim > g.threshold
                                  THEN p.doc_id END) AS BIGINT)
           AS n_flagged,
         CAST(count(DISTINCT CASE WHEN p.in_cap
                                   AND p.cos_sim > g.threshold
                                  THEN p.doc_id END) AS BIGINT)
           AS n_flagged_capped
  FROM pairs p CROSS JOIN grid g
  GROUP BY g.threshold
)
SELECT threshold, n_pairs, n_flagged, n_flagged_capped,
       CASE WHEN n_flagged > 0
            THEN round(CAST(n_flagged_capped AS DOUBLE)
                       / CAST(n_flagged AS DOUBLE), 6)
       END AS cap_recall
FROM agg
"""


DECONTAMINATE_THRESHOLD_SENSITIVITY_SQL = (
    _decontaminate_threshold_sensitivity_sql()
)


def decon_screen_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(screen, n_docs, avg_hit_grams, avg_max_sim): agreement audit
    between the two contamination screens — the n-gram collision gate
    (text_decontaminate, the GPT-3 appendix-C method) and the
    embedding-similarity screen (text_decontaminate_semantic). Every
    flagged training doc lands in exactly one class: ``both``,
    ``ngram_only`` (verbatim overlap the loose cosine threshold
    missed), or ``semantic_only`` (the paraphrase bucket — shared
    meaning with NO shared n-grams, the class that justifies running
    the semantic screen at all). Per class: doc count, mean n-gram
    hits, mean best cosine.

    Scale shape: a doc_id-keyed full-outer join of two already-
    bounded screen outputs (each much smaller than the corpus),
    then a 3-group rollup — composition adds one keyed exchange.
    """
    from spark_app_twitter_spark.operators import textstats

    ng = textstats.decontaminate(spark, sf_dir)
    sem = decontaminate_semantic(spark, sf_dir).select(
        "doc_id", "max_sim"
    )
    j = ng.join(sem, "doc_id", "full_outer")
    screen = (
        F.when(
            F.col("n_hit_grams").isNotNull()
            & F.col("max_sim").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("n_hit_grams").isNotNull(), F.lit("ngram_only"))
        .otherwise(F.lit("semantic_only"))
    )
    return (
        j.groupBy(screen.alias("screen"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("n_hit_grams"), 6).alias("avg_hit_grams"),
            F.round(F.avg("max_sim"), 6).alias("avg_max_sim"),
        )
    )


def _decon_screen_agreement_sql() -> str:
    from spark_app_twitter_spark.operators.textstats import (
        DECONTAMINATE_SQL,
    )

    return f"""
WITH ng AS (SELECT * FROM ({DECONTAMINATE_SQL})),
sem AS (SELECT doc_id, max_sim FROM ({DECONTAMINATE_SEMANTIC_SQL})),
j AS (
  SELECT coalesce(ng.doc_id, sem.doc_id) AS doc_id,
         ng.n_hit_grams, sem.max_sim
  FROM ng FULL OUTER JOIN sem ON ng.doc_id = sem.doc_id
)
SELECT CASE WHEN n_hit_grams IS NOT NULL AND max_sim IS NOT NULL
              THEN 'both'
            WHEN n_hit_grams IS NOT NULL THEN 'ngram_only'
            ELSE 'semantic_only' END AS screen,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_hit_grams), 6) AS avg_hit_grams,
       round(avg(max_sim), 6) AS avg_max_sim
FROM j
GROUP BY 1
"""


DECON_SCREEN_AGREEMENT_SQL = _decon_screen_agreement_sql()


def contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_train_docs, n_flagged_ngram, n_flagged_semantic,
    ngram_rate, semantic_rate): per-SOURCE contamination rates from
    both screens — the actionable rollup a pipeline owner reads to
    decide which ingest feeds are dirty (global agreement is
    text_decon_screen_agreement; this is its by-source drill-down).
    Rates are over the source's TRAINING docs (the held-out bench
    split is excluded from the denominator — it is not trainable).

    Scale shape: two bounded flag relations left-joined onto the
    (doc_id, source) projection, one source-keyed rollup with
    map-side combine — |sources| output rows.
    """
    from spark_app_twitter_spark.operators.textstats import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
        decontaminate,
    )
    from spark_app_twitter_spark.sources.parquet import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % DECON_BENCH_MOD) != DECON_BENCH_REM)
        .select("doc_id", "source")
    )
    ng = decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("is_ng")
    )
    sem = decontaminate_semantic(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("is_sem")
    )
    rate = lambda c, n: F.round(  # noqa: E731
        c.cast("double") / n.cast("double"), 6
    )
    agg = (
        docs.join(ng, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_docs"),
            F.sum(F.coalesce(F.col("is_ng"), F.lit(0)))
            .cast("long")
            .alias("n_flagged_ngram"),
            F.sum(F.coalesce(F.col("is_sem"), F.lit(0)))
            .cast("long")
            .alias("n_flagged_semantic"),
        )
    )
    return agg.select(
        "source",
        "n_train_docs",
        "n_flagged_ngram",
        "n_flagged_semantic",
        rate(F.col("n_flagged_ngram"), F.col("n_train_docs")).alias(
            "ngram_rate"
        ),
        rate(F.col("n_flagged_semantic"), F.col("n_train_docs")).alias(
            "semantic_rate"
        ),
    )


def _contamination_by_source_sql() -> str:
    from spark_app_twitter_spark.operators.textstats import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
        DECONTAMINATE_SQL,
    )

    return f"""
WITH ng AS (SELECT doc_id FROM ({DECONTAMINATE_SQL})),
sem AS (SELECT doc_id FROM ({DECONTAMINATE_SEMANTIC_SQL})),
agg AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_train_docs,
         CAST(count(ng.doc_id) AS BIGINT) AS n_flagged_ngram,
         CAST(count(sem.doc_id) AS BIGINT) AS n_flagged_semantic
  FROM documents d
  LEFT JOIN ng ON d.doc_id = ng.doc_id
  LEFT JOIN sem ON d.doc_id = sem.doc_id
  WHERE d.doc_id % {DECON_BENCH_MOD} <> {DECON_BENCH_REM}
  GROUP BY d.source
)
SELECT source, n_train_docs, n_flagged_ngram, n_flagged_semantic,
       round(CAST(n_flagged_ngram AS DOUBLE) / n_train_docs, 6)
         AS ngram_rate,
       round(CAST(n_flagged_semantic AS DOUBLE) / n_train_docs, 6)
         AS semantic_rate
FROM agg
"""


CONTAMINATION_BY_SOURCE_SQL = _contamination_by_source_sql()

# The registered default (VERDICT r06 item 4): `sem_dedup` IS the
# two-level path; the flat trainer stays available as the explicit
# small-n variant `sem_dedup_flat`. The aliases keep every historic
# import working while making the scale path the one a user gets by
# default.
semdedup = semdedup_2level
_semdedup_sql = _semdedup_2level_sql
SEMDEDUP_SQL = SEMDEDUP_2LEVEL_SQL


__all__ = [
    "semdedup",
    "SEMDEDUP_SQL",
    "semdedup_flat",
    "SEMDEDUP_FLAT_SQL",
    "semdedup_2level",
    "SEMDEDUP_2LEVEL_SQL",
    "decontaminate_semantic",
    "DECONTAMINATE_SEMANTIC_SQL",
    "decontaminate_threshold_sensitivity",
    "DECONTAMINATE_THRESHOLD_SENSITIVITY_SQL",
    "decon_screen_agreement",
    "DECON_SCREEN_AGREEMENT_SQL",
    "SEMDECON_GRID",
    "SEMDECON_THRESHOLD",
    "SEM_DUP_THRESHOLD",
    "SEM_CANDIDATE_CAP",
    "K_CELLS",
]
