"""Retrieval capstone: ANN search joined back to document payloads —
the serving-side query of a RAG / retrieval pipeline.

Composes the engine's existing pieces end-to-end:
  1. top-k cosine neighbors per query vector (similarity.py's
     broadcast-query shape; swap in the LSH/IVF variant at scale),
  2. join neighbor ids to the documents table (vec_id == doc_id in
     the synthetic corpus),
  3. attach the quality score (textstats.py's filter stage) and the
     PII-redacted text — what a retrieval API actually returns.

Plan shape at 100 TB: the ANN stage bounds candidates to k rows per
query, so the payload join probes the documents table with a tiny
key set (shuffle or broadcast of the *result* side, never the
corpus); quality/redaction are map-side projections on the few
matched rows.

Reference scope note: the reference app has no retrieval surface;
this composes SURVEY.md's LLM-pipeline mandate into the user-facing
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import tokens
from spark_app_twitter_spark.operators.similarity import knn_bruteforce
from spark_app_twitter_spark.operators.similarity import (
    KNN_BRUTEFORCE_SQL as _KNN_SQL,
)
from spark_app_twitter_spark.operators.textstats import (
    REDACT_RULES,
    quality_score_expr,
    quality_score_sql,
    redact_sql_expr,
)
from spark_app_twitter_spark.sources.parquet import load_table


def _payload_join(spark: SparkSession, sf_dir: str, knn_hits) -> DataFrame:
    """Stage 2 of both retrieval variants — ONE documents scan
    provides both payload columns (quality and redacted text are
    map-side projections of the same row), joined once to the
    k-per-query hit set. A single definition so a redaction-rule or
    output-contract change can never reach one variant and miss the
    other."""
    hits = knn_hits.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        "cos_sim",
        "rank",
    )
    red = F.col("text")
    for pat, repl in REDACT_RULES:
        red = F.regexp_replace(red, pat, repl)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score_expr(tokens("text")).alias("quality_score"),
        red.alias("text"),
    )
    return hits.join(docs, "doc_id").select(
        "query_id", "doc_id", "cos_sim", "rank", "quality_score", "text"
    )


def _rag_sql(knn_sql: str) -> str:
    """Shared SQL tail of both retrieval twins (mirrors
    :func:`_payload_join`)."""
    return f"""
WITH hits AS (
{knn_sql.strip()}
),
docs AS (
  SELECT doc_id,
         {quality_score_sql("string_split(text, ' ')")} AS quality_score,
         {redact_sql_expr("text")} AS text
  FROM documents
)
SELECT h.query_id, h.neighbor_id AS doc_id, h.cos_sim, h.rank,
       d.quality_score, d.text
FROM hits h
JOIN docs d ON h.neighbor_id = d.doc_id
"""


def rag_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, cos_sim, rank, quality_score, text) for the
    top-k neighbors of each query vector, with redacted payload text.
    """
    return _payload_join(spark, sf_dir, knn_bruteforce(spark, sf_dir))


RAG_RETRIEVE_SQL = _rag_sql(_KNN_SQL)

# Posting-list truncation: keep a term's POSTING_CAP lowest doc ids.
# The cap is what makes index build scale-safe — a stopword's posting
# list is the corpus, and an uncapped collect would hold it in one
# aggregation buffer. df stays EXACT (counted before the cap).
POSTING_CAP = 1000


def build_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, postings): the sparse-retrieval index build — exact
    document frequency plus the sorted posting list (lowest
    ``POSTING_CAP`` doc ids) per distinct term. The BM25/keyword
    half of a hybrid RAG stack, and the exact-match complement of
    the ANN index.

    Scale shape: one explode to (term, doc_id), distinct, then a
    single per-term pass — row_number over (term ORDER BY doc_id)
    ranks postings so the cap is applied WITHOUT materializing the
    full list (no unbounded collect_set; the aggregation buffer
    holds at most POSTING_CAP ids per term), and df counts the
    pre-cap pairs in the same aggregation. Both shuffles are keyed
    on the term — no skew beyond natural stopword weight, which the
    cap bounds on the output side.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    pairs = docs.select(
        F.explode(tokens("text")).alias("term"), "doc_id"
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy(F.asc("doc_id"))
    )
    return (
        pairs.withColumn("rn", rn)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= POSTING_CAP, F.col("doc_id"))
                )
            ).alias("postings"),
        )
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-facing projection of :func:`build_inverted_index`:
    (term, df, postings_csv) with the posting list serialized to a
    comma-joined string. The driver's oracle harness canonicalizes
    results by sorting every column in pandas, and an
    ``array<bigint>`` column is unhashable there (the r06 red gate
    row) — so the REGISTERED query emits only scalar columns while
    library callers keep the typed array via build_inverted_index."""
    return build_inverted_index(spark, sf_dir).select(
        "term",
        "df",
        F.array_join(F.col("postings").cast("array<string>"), ",").alias(
            "postings_csv"
        ),
    )


BUILD_INVERTED_INDEX_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT unnest(string_split(text, ' ')) AS term, doc_id
        FROM documents)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       (list(doc_id ORDER BY doc_id ASC))[:{POSTING_CAP}] AS postings
FROM pairs
GROUP BY term
"""

# the gate-facing twin WRAPS the library twin — one definition of
# tokenization / df / the posting cap, one extra projection
INVERTED_INDEX_SQL = f"""
WITH idx AS (
{BUILD_INVERTED_INDEX_SQL.strip()}
)
SELECT term, df, array_to_string(postings, ',') AS postings_csv
FROM idx
"""

def rag_retrieve_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`rag_retrieve` with the IVF index as stage 1 — the
    SCALE path of the retrieval capstone. Brute-force cosine scores
    every (query, candidate) pair, so the serving cost grows with
    the corpus; swapping in similarity.knn_ivf bounds stage 1 to the
    candidates inside each query's probed cells (trained-centroid
    assignment, broadcast probes) while stage 2 — the payload join,
    quality score, and PII redaction — is unchanged and still only
    touches the k surviving rows per query.

    Same output contract as rag_retrieve; hits differ only where IVF
    recall differs from exact (tests pin the recall floor on
    knn_ivf itself)."""
    from spark_app_twitter_spark.operators.similarity import knn_ivf

    return _payload_join(spark, sf_dir, knn_ivf(spark, sf_dir))


def _rag_retrieve_ivf_sql() -> str:
    from spark_app_twitter_spark.operators.similarity import KNN_IVF_SQL

    return _rag_sql(KNN_IVF_SQL)


RAG_RETRIEVE_IVF_SQL = _rag_retrieve_ivf_sql()


__all__ = [
    "rag_retrieve",
    "RAG_RETRIEVE_SQL",
    "rag_retrieve_ivf",
    "RAG_RETRIEVE_IVF_SQL",
    "build_inverted_index",
    "BUILD_INVERTED_INDEX_SQL",
    "inverted_index",
    "INVERTED_INDEX_SQL",
    "POSTING_CAP",
]
