"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-disciplined for 100 TB:

- **exact**: hash-groupBy on md5(text) — one shuffle on the digest,
  keep-first by doc_id (deterministic).
- **MinHash + LSH banding**: shingle -> k minhashes -> b bands; a
  shuffle on (band_idx, band_hash) turns the O(n^2) pair search into
  per-bucket joins. Candidates verified with exact shingle Jaccard.
- **SimHash**: 16-bit signature from token-hash parities; equal
  signatures cluster near-identical token multisets. One shuffle.
- **n-gram Jaccard (blocked)**: exact all-pairs within a blocking key
  — the verification baseline; at scale it runs only inside LSH
  buckets (never globally).

All hashing is md5-of-string (functions/hashing.py) so the DuckDB
oracle reproduces signatures bit-for-bit. Each Spark operator has a
generated SQL twin built from the same Python constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.hashing import (
    packed_minhash_sql_cols,
    shingles,
    shingles_sql,
    with_packed_minhash,
)
from spark_app_twitter_spark.functions.text import tokens
from spark_app_twitter_spark.sources.parquet import load_table

SHINGLE_N = 3
NUM_HASHES = 8
BANDS = 4  # rows per band = NUM_HASHES // BANDS = 2
JACCARD_THRESHOLD = 0.5

# Odd hex digits — used for hash-bit parity in simhash.
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")
SIMHASH_BITS = 16


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content digest, keep lowest doc_id.

    groupBy(md5) would lose the survivor row; row_number keeps it.
    At 100 TB: one shuffle on a uniform 128-bit key — no skew by
    construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("digest").orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("digest", F.md5("text"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "digest")
    )


EXACT_DEDUP_SQL = """
SELECT doc_id, lang, source, n_chars, digest
FROM (
  SELECT doc_id, lang, source, n_chars, md5(text) AS digest,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def _with_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "sh", F.array_distinct(shingles(tokens("text"), SHINGLE_N))
    )


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashing-heavy per-row work: spread a single-file scan to all cores
    return load_table(spark, sf_dir, "documents", spread=True)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: NUM_HASHES lexicographic-min hash
    slices, 4 components per md5 call (functions/hashing.py)."""
    docs = _with_shingles(_docs_spread(spark, sf_dir))
    return with_packed_minhash(docs, "sh", NUM_HASHES).select(
        "doc_id", *[f"mh{i}" for i in range(NUM_HASHES)]
    )


MINHASH_SIGNATURES_SQL = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct({shingles_sql("string_split(text, ' ')", SHINGLE_N)}) AS sh
  FROM documents
)
SELECT doc_id,
  {", ".join(packed_minhash_sql_cols("sh", NUM_HASHES))}
FROM sh
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard verify.

    Plan: signature projection (map-only) -> explode to BANDS rows/doc
    -> shuffle on (band, band_hash) -> within-bucket self-join ->
    distinct candidate pairs -> Jaccard verify -> threshold.

    At 100 TB the bucket join is the only pairwise work; banding
    keeps buckets tiny for non-dup-heavy corpora.
    """
    # Materialize the shingled docs once: three consumers (signature
    # build + two verify joins) would otherwise each recompute
    # tokenize+shingle. Only (doc_id, sh) is kept — narrower blocks in
    # the cache. localCheckpoint here; persist(MEMORY_AND_DISK) is the
    # same move on a real cluster.
    docs = (
        _with_shingles(_docs_spread(spark, sf_dir))
        .select("doc_id", "sh")
        .localCheckpoint(eager=True)
    )
    rows_per_band = NUM_HASHES // BANDS
    # Narrow band rows: (doc_id, band, bh) only. Shingle arrays do NOT
    # ride through the explode/shuffle/self-join — they are re-joined
    # afterwards for the (few) surviving candidates. At corpus scale
    # this keeps the banding shuffle bytes ~40B/row instead of KBs.
    sig = with_packed_minhash(docs, "sh", NUM_HASHES).drop("sh")
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    # A self-join evaluates its subtree twice; checkpointing the narrow
    # band rows halves the md5 work (the dominant cost).
    bands = bands.localCheckpoint(eager=True)
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = docs.select("doc_id", "sh")
    verified = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        verified.withColumn(
            "jaccard",
            F.round(inter.cast("double") / union.cast("double"), 6),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_lsh_sql() -> str:
    rows_per_band = NUM_HASHES // BANDS
    band_arms = "\nUNION ALL\n".join(
        "SELECT doc_id, "
        f"{b} AS band, "
        "md5("
        + " || '|' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ") AS bh FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct({shingles_sql("string_split(text, ' ')", SHINGLE_N)}) AS sh
  FROM documents
),
sig AS (
  SELECT doc_id, sh,
    {", ".join(packed_minhash_sql_cols("sh", NUM_HASHES))}
  FROM sh
),
bands AS (
{band_arms}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b, a.sh AS sh_a, b.sh AS sh_b
  FROM cand c
  JOIN sh a ON c.doc_a = a.doc_id
  JOIN sh b ON c.doc_b = b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
FROM verified
WHERE round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) >= {JACCARD_THRESHOLD}
"""


MINHASH_LSH_PAIRS_SQL = _minhash_lsh_sql()


def _parity_pm1(token_expr: str, bit: int) -> str:
    """+1/-1 from the parity of hex digit `bit` of md5(token) — SQL
    fragment valid in both Spark SQL and DuckDB."""
    odd = ", ".join(f"'{d}'" for d in _ODD_HEX)
    return (
        f"CASE WHEN substr(md5({token_expr}), {bit + 1}, 1) IN ({odd}) "
        "THEN 1 ELSE -1 END"
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit SimHash + duplicate-cluster size.

    bit_i(doc) = sign of sum over tokens of parity_i(md5(token)).
    Equal signatures = near-identical token distributions. Map-only
    signature computation (higher-order functions, no UDF), then one
    shuffle to size the clusters.
    """
    docs = _docs_spread(spark, sf_dir)
    bit_terms = " + ".join(
        f"(CASE WHEN aggregate(transform(split(text, ' '), "
        f"t -> {_parity_pm1('t', i)}), 0, (acc, x) -> acc + x) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    sig = docs.select(
        "doc_id", F.expr(f"{bit_terms}").cast("long").alias("simhash")
    )
    w = Window.partitionBy("simhash")
    return sig.withColumn("cluster_size", F.count(F.lit(1)).over(w))


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(string_split(text, ' '), "
        f"t -> {_parity_pm1('t', i)})) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH sig AS (
  SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM documents
)
SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS cluster_size
FROM sig
"""


SIMHASH_SQL = _simhash_sql()


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard pairs within a blocking key (lang).

    This is the *verification* operator: blocked all-pairs compare.
    The blocking key bounds the quadratic term; at 100 TB block by
    LSH bucket (minhash_lsh_pairs) instead of a categorical column.
    """
    docs = _with_shingles(_docs_spread(spark, sf_dir)).select(
        "doc_id", "lang", "sh"
    )
    l, r = docs.alias("l"), docs.alias("r")
    pairs = l.join(
        r,
        (F.col("l.lang") == F.col("r.lang"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    )
    inter = F.size(F.array_intersect("l.sh", "r.sh"))
    union = F.size("l.sh") + F.size("r.sh") - inter
    return (
        pairs.select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union.cast("double"), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


NGRAM_JACCARD_PAIRS_SQL = f"""
WITH sh AS (
  SELECT doc_id, lang,
         list_distinct({shingles_sql("string_split(text, ' ')", SHINGLE_N)}) AS sh
  FROM documents
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
             / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) AS jaccard
FROM sh l JOIN sh r ON l.lang = r.lang AND l.doc_id < r.doc_id
WHERE round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
            / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) >= 0.2
"""


CONTAINMENT_THRESHOLD = 0.4


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-containment: |A∩B| / |A| — catches documents
    that are (mostly) embedded inside another (quotes, boilerplate
    wrappers), which symmetric Jaccard under-scores. Blocked by lang
    like the Jaccard pairs; at scale block by LSH bucket instead.
    """
    docs = _with_shingles(_docs_spread(spark, sf_dir)).select(
        "doc_id", "lang", "sh"
    )
    l, r = docs.alias("l"), docs.alias("r")
    pairs = l.join(
        r,
        (F.col("l.lang") == F.col("r.lang"))
        & (F.col("l.doc_id") != F.col("r.doc_id")),
    )
    inter = F.size(F.array_intersect("l.sh", "r.sh"))
    containment = F.round(
        inter.cast("double") / F.size("l.sh").cast("double"), 6
    )
    return (
        pairs.select(
            F.col("l.doc_id").alias("contained_doc"),
            F.col("r.doc_id").alias("container_doc"),
            containment.alias("containment"),
        )
        .where(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


CONTAINMENT_PAIRS_SQL = f"""
WITH sh AS (
  SELECT doc_id, lang,
         list_distinct({shingles_sql("string_split(text, ' ')", SHINGLE_N)}) AS sh
  FROM documents
)
SELECT l.doc_id AS contained_doc, r.doc_id AS container_doc,
       round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) / len(l.sh), 6) AS containment
FROM sh l JOIN sh r ON l.lang = r.lang AND l.doc_id != r.doc_id
WHERE round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) / len(l.sh), 6) >= {CONTAINMENT_THRESHOLD}
"""


CC_ITERS = 3


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS -> dedup CLUSTERS via min-label propagation
    (connected components), the step that turns pairwise similarity
    into keep/drop decisions: every doc gets the min doc_id of its
    component; the component representative is the survivor.

    Fixed CC_ITERS label-propagation rounds (each: one join on the
    edge list + min-aggregate — all shuffles on doc_id). A production
    loop iterates until a convergence counter stops changing; fixed
    rounds keep the operator oracle-reproducible, and both engines run
    the same rounds so results agree even on non-converged graphs.
    """
    edges = ngram_jaccard_pairs(spark, sf_dir, threshold=0.2).select(
        "doc_a", "doc_b"
    )
    # symmetric edge list
    sym = edges.unionByName(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    labels = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(CC_ITERS):
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(
                neighbor_min, labels.doc_id == neighbor_min.doc_a, "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # iterative: truncate lineage
        )
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_survivor"),
    )


def _dedup_clusters_sql() -> str:
    parts = [
        f"""WITH sh AS (
  SELECT doc_id, lang,
         list_distinct({shingles_sql("string_split(text, ' ')", SHINGLE_N)}) AS sh
  FROM documents
),
edges0 AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM sh l JOIN sh r ON l.lang = r.lang AND l.doc_id < r.doc_id
  WHERE round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
              / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) >= 0.2
),
sym AS (
  SELECT doc_a, doc_b FROM edges0
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM edges0
),
l0 AS (SELECT doc_id, doc_id AS label FROM documents)"""
    ]
    for i in range(CC_ITERS):
        parts.append(
            f"""n{i} AS (
  SELECT s.doc_a, min(l.label) AS nmin
  FROM sym s JOIN l{i} l ON s.doc_b = l.doc_id
  GROUP BY s.doc_a
),
l{i + 1} AS (
  SELECT l.doc_id, least(l.label, coalesce(n.nmin, l.label)) AS label
  FROM l{i} l LEFT JOIN n{i} n ON l.doc_id = n.doc_a
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT doc_id, label AS cluster_id, doc_id = label AS is_survivor FROM l{CC_ITERS}"
    )


DEDUP_CLUSTERS_SQL = _dedup_clusters_sql()
