"""Deterministic distributed k-means over embedding columns — the
iterative-algorithm pattern, and the learned-cells upgrade for IVF
similarity search.

Design points (the ones that matter at 100 TB):
- **Per-iteration plan truncation.** Each Lloyd iteration ends with a
  ``localCheckpoint`` of the k centroids (a tiny relation) — without
  it the logical plan doubles every iteration and analysis/codegen
  time explodes long before data size matters. On a cluster the same
  role is played by persisting or writing the centroid table.
- **Determinism.** Init = the first k vectors by id (no RNG);
  assignment argmin is computed as argmax(v·c - |c|²/2) rounded to
  6dp with cell-id tie-break; new centroids quantize components to
  1e-6 before the integer-exact mean. Every engine that follows the
  same recipe — including the DuckDB oracle, via a generated
  CTE-chain — lands on bit-identical clusters.
- **Shuffle shape.** Assignment is a broadcast cross join against k
  rows (map-side); recentering is one posexplode + groupBy(cell,dim)
  shuffle of |N|·dim narrow rows.

``pyspark.ml.clustering.KMeans`` exists but seeds its init randomly
(kmeans||), so results are not oracle-reproducible; this module is
the contract-friendly equivalent with the same complexity profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.vectors import dot
from spark_app_twitter_spark.sources.parquet import load_table

K_CELLS = 8
ITERS = 2


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: argmin ||v-c||² == argmax(v·c - |c|²/2)."""
    score = F.round(
        dot(F.col("v"), F.col("cv")) - dot(F.col("cv"), F.col("cv")) / F.lit(2.0),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cell"))
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "v", "cell")
    )


def _recenter(assigned: DataFrame) -> DataFrame:
    """Quantized per-cell mean, reassembled dim-ordered."""
    exploded = assigned.select(
        "cell", F.posexplode("v").alias("dim", "x")
    )
    q = F.round(F.col("x") * 1e6).cast("long")
    means = exploded.groupBy("cell", "dim").agg(
        (F.sum(q).cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias("m")
    )
    return means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )


# Trained centroid tables, keyed by (spark app, data, k, iters).
# Centroids are a TRAINED ARTIFACT: every consumer (IVF search,
# SemDeDup, cell assignment) needs the identical table, and on a
# cluster you train once and publish it — recomputing the Lloyd chain
# per downstream query would re-run the training job each time. The
# cached DataFrame is already localCheckpoint'ed (k tiny rows pinned
# on executors), so reuse costs nothing and is deterministic.
# CONTRACT: a dataset path is immutable for the lifetime of a session
# (true for this engine's sf_dir snapshots); if a path is rewritten
# in-session, call clear_centroid_cache() or the next consumer reads
# centroids trained on the old files. Entries are k-row tables — the
# dict stays tiny even across many datasets.
_CENTROID_CACHE: dict[tuple[str, str, int, int], DataFrame] = {}


def clear_centroid_cache() -> None:
    """Drop all trained centroid tables (e.g. after rewriting a
    dataset path in-session)."""
    _CENTROID_CACHE.clear()


def kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int = K_CELLS, iters: int = ITERS
) -> DataFrame:
    """(cell, cv) — the centroid table after `iters` Lloyd iterations
    from the deterministic init (first k vectors). This is the IVF
    cell table: k tiny rows, broadcastable anywhere. Trained once per
    (session, data, k, iters) — see ``_CENTROID_CACHE``."""
    key = (spark.sparkContext.applicationId, sf_dir, k, iters)
    cached = _CENTROID_CACHE.get(key)
    if cached is not None:
        return cached
    vecs = _vecs(spark, sf_dir)
    cents = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("cv")
    )
    for i in range(iters):
        assigned = _assign(vecs, cents)
        cents = _recenter(assigned)
        # truncate lineage every 2nd iteration (and at the end): the
        # plan doubles per iteration, but a checkpoint is a full job
        # boundary — batching two iterations per truncation measured
        # ~0.5 s faster at sf0.1 with the same bounded-depth guarantee
        if (i + 1) % 2 == 0 or i == iters - 1:
            cents = cents.localCheckpoint(eager=True)
    _CENTROID_CACHE[key] = cents
    return cents


def kmeans_cells(
    spark: SparkSession, sf_dir: str, k: int = K_CELLS, iters: int = ITERS
) -> DataFrame:
    """(vec_id, cell) after `iters` Lloyd iterations from a
    deterministic init (first k vectors)."""
    vecs = _vecs(spark, sf_dir)
    return _assign(vecs, kmeans_centroids(spark, sf_dir, k, iters)).select(
        "vec_id", "cell"
    )


def _centroid_score_sql(v: str, c: str) -> str:
    """Negated-distance centroid score: v·c - |c|²/2. argmax of this
    over centroids == argmin of squared distance (|v|² is constant
    per vector), hence the DESC ordering at every use site — do not
    "fix" it to ASC."""
    return (
        f"round(list_dot_product({v}, {c}) "
        f"- list_dot_product({c}, {c}) / 2.0, 6)"
    )


def kmeans_centroid_ctes(k: int = K_CELLS, iters: int = ITERS) -> list[str]:
    """CTE chain (no WITH keyword) ending at ``c{iters}`` = the final
    centroid table — shared by the kmeans oracle and the IVF oracle."""
    parts = [
        "emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cell, v AS cv FROM emb WHERE vec_id < {k})",
    ]
    for i in range(iters):
        parts.append(
            f"a{i} AS (SELECT vec_id, v, cell FROM ("
            f"SELECT e.vec_id, e.v, c.cell, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {_centroid_score_sql('e.v', 'c.cv')} DESC, c.cell ASC) AS rk "
            f"FROM emb e CROSS JOIN c{i} c) WHERE rk = 1)"
        )
        parts.append(
            f"m{i} AS (SELECT cell, dim, CAST(sum(q) AS DOUBLE) / (count(*) * 1e6) AS m FROM ("
            f"SELECT cell, unnest(range(len(v))) AS dim, "
            f"unnest(list_transform(v, x -> CAST(round(x * 1e6) AS BIGINT))) AS q "
            f"FROM a{i}) GROUP BY cell, dim)"
        )
        parts.append(
            f"c{i + 1} AS (SELECT cell, list(m ORDER BY dim ASC) AS cv FROM m{i} GROUP BY cell)"
        )
    return parts


def kmeans_cells_sql(k: int = K_CELLS, iters: int = ITERS) -> str:
    """Generated CTE chain mirroring :func:`kmeans_cells` exactly."""
    parts = kmeans_centroid_ctes(k, iters)
    final = (
        f"SELECT vec_id, cell FROM ("
        f"SELECT e.vec_id, c.cell, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {_centroid_score_sql('e.v', 'c.cv')} DESC, c.cell ASC) AS rk "
        f"FROM emb e CROSS JOIN c{iters} c) WHERE rk = 1"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


KMEANS_CELLS_SQL = kmeans_cells_sql()
