"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public arXiv:2303.09540).

The trick that makes embedding dedup tractable at corpus scale:
instead of all-pairs cosine over N documents (O(N²)), k-means the
embeddings into cells and compare ONLY within a cell — O(Σ|cell|²),
and each cell's pairwise block is an independent task. Rising corpus
size is absorbed by raising k (cells stay bounded), and a pathological
mega-cell can be salted further by LSH bucket inside the cell.

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


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, keep) — keep=false iff a same-cell near-dup with
    a lower vec_id exists.

    Plan shape: the assigned relation (vec_id, v, cell) is
    materialized once (assignment is a shuffle-free map against the
    driver-held trained centroids, and the checkpoint feeds both
    sides of the self-join); the self-join shuffles on the cell id —
    narrow rows, bounded cells. The drop set is tiny and left-joins
    back for the keep flag.
    """
    assigned = assign_cells(
        spark, _vecs(spark, sf_dir), kmeans_centroid_rows(spark, sf_dir)
    ).localCheckpoint(eager=True)
    a = assigned.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"), "cell"
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


def _semdedup_sql() -> str:
    kmeans_chain = ",\n".join(kmeans_centroid_ctes())
    assign = (
        f"assigned AS (SELECT vec_id, v, cell FROM ("
        f"SELECT e.vec_id, e.v, c.cell, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {_centroid_score_sql('e.v', 'c.cv')} DESC, c.cell ASC) AS rk "
        f"FROM emb e CROSS JOIN c{ITERS} c) WHERE rk = 1)"
    )
    return f"""
WITH {kmeans_chain},
{assign},
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({cosine_sql('a.v', 'b.v')}, 6) > {SEM_DUP_THRESHOLD}
)
SELECT assigned.vec_id, assigned.cell, dup_id IS NULL AS keep
FROM assigned LEFT OUTER JOIN dups ON assigned.vec_id = dup_id
"""


SEMDEDUP_SQL = _semdedup_sql()

__all__ = ["semdedup", "SEMDEDUP_SQL", "SEM_DUP_THRESHOLD", "K_CELLS"]
