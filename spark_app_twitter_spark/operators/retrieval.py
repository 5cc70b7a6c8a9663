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
from spark_app_twitter_spark.functions.caches import register_cache
from spark_app_twitter_spark.sources.parquet import load_table

# (applicationId, sf_dir) -> (postings, doclen, scalars): the
# published sparse-retrieval index. A search deployment builds its
# postings offline — (doc_id, term, tf) plus per-doc lengths and the
# corpus scalars are exactly what Lucene stores — and every
# BM25/QL/RRF query serves against that storage. Before r15 each
# ranking query re-exploded the corpus and re-reduced doc lengths per
# call. Frames are checkpointed (postings/doclen lazily: the first
# consumer folds the build pass into its own job) and evicted under
# the session cache contract.
_TEXT_INDEX_CACHE: dict[
    tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]
] = register_cache({})


def text_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings (doc_id, term, tf), doclen (doc_id, dl),
    scalars 1-row (n_docs, n_tokens)): the published text index,
    built once per (session, corpus).

    doclen derives from postings (sum of tf per doc == token count)
    so the build is ONE corpus explode + one (doc_id, term) reduce;
    the scalars row aggregates the narrow documents scan directly.
    Filtering postings to a query's terms AFTER the tf reduce is
    row-identical to filtering the token stream before it (the group
    key contains the filter key), so every consumer's results are
    unchanged — the parity gates prove it.
    """
    from spark_app_twitter_spark.functions.caches import get_or_build

    def build() -> tuple[DataFrame, DataFrame, DataFrame]:
        docs = load_table(spark, sf_dir, "documents", spread=True)
        toks = docs.select(
            "doc_id", F.explode(tokens("text")).alias("term")
        )
        postings = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=False)
        )
        doclen = (
            postings.groupBy("doc_id")
            .agg(F.sum("tf").cast("long").alias("dl"))
            .localCheckpoint(eager=False)
        )
        scalars = docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).alias("n_tokens"),
        ).localCheckpoint(eager=False)
        return (postings, doclen, scalars)

    key = (spark.sparkContext.applicationId, sf_dir)
    return get_or_build(_TEXT_INDEX_CACHE, key, build)


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

    Scale shape: the distinct (term, doc_id) pairs ARE the published
    text index's postings rows (unique on the group key by
    construction — r16: serve against the session artifact instead
    of re-running the corpus explode + distinct exchange per call),
    then a single per-term pass — row_number over (term ORDER BY
    doc_id) ranks postings so the cap is applied WITHOUT
    materializing the full list (no unbounded collect_set; the
    aggregation buffer holds at most POSTING_CAP ids per term), and
    df counts the pre-cap pairs in the same aggregation. Both
    shuffles are keyed on the term — no skew beyond natural stopword
    weight, which the cap bounds on the output side.
    """
    from pyspark.sql import Window

    postings, _dl, _scalars = text_index(spark, sf_dir)
    pairs = postings.select("term", "doc_id")
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

# ---------------------------------------------------------------------------
# BM25 ranked retrieval — the scoring half of the keyword/hybrid RAG
# stack whose index half is build_inverted_index above. Okapi BM25
# (Robertson & Walker; the Lucene idf variant ln(1 + (N-df+.5)/(df+.5))
# so idf is never negative).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERIES = 4  # doc_id < BM25_N_QUERIES seed the query set
BM25_Q_TERMS = 4  # first alphabetical distinct terms of the seed doc
BM25_TOP_K = 10
_BM25_SCALE = 1_000_000  # micro-units: integer per-doc sums


def bm25_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, bm25, rank): Okapi BM25 top-k per query.

    Queries are derived deterministically from the corpus: for each
    seed doc (doc_id < BM25_N_QUERIES), the query is its first
    BM25_Q_TERMS alphabetical distinct tokens — a reproducible
    stand-in for user keyword queries.

    Scale shape: the tiny (query, term) set broadcasts into the
    exploded token stream BEFORE the tf combine, so the (doc, term)
    shuffle carries only query-term rows — the sole corpus-wide
    reduction is the per-doc length count, keyed on doc_id alone.
    df per term is counted on the surviving rows (exact: tf rows are
    per-doc distinct already). Doc length is a map-side groupBy;
    corpus scalars (N, total token count) are a 1-row broadcast
    cross join. Per-(doc, term) scores are quantized to integer
    micro-units BEFORE the per-doc sum (bigram_lm_score's idiom) so
    the reduction is order-independent and engine-exact; ranking
    ties break on doc_id.

    Reference scope note: the reference app has no retrieval surface
    (SURVEY.md §2.9 mandates the LLM-pipeline families); this is the
    sparse complement of rag_retrieve's dense path.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # deterministic query set: 1 row per (query_id, term) — shared
    # with query_expansion's pass 1; checkpointed because the core
    # reads it twice (distinct-term filter + the scoring join)
    return bm25_search(
        spark, sf_dir, _seed_query_terms(docs).localCheckpoint(eager=False)
    )


def bm25_search(
    spark: SparkSession,
    sf_dir: str,
    qterms: DataFrame,
    materialized: list[DataFrame] | None = None,
) -> DataFrame:
    """The BM25 scoring core against an ARBITRARY (query_id, term)
    relation — the seam the streaming keyword server
    (streaming/bm25serve.py) answers micro-batches through.
    bm25_retrieve is this core applied to the corpus-derived query
    set; the plan shape (broadcast term filter over the published
    postings, micro-unit integer sums) is identical for both callers.

    Since r15 the corpus-wide relations come from
    :func:`text_index` — the published postings / doc-length /
    scalar storage every sparse ranker serves against (filtering
    postings to the query's terms after the tf reduce is
    row-identical to filtering the token stream before it). The
    per-call hit table is still localCheckpointed once (two consumer
    branches: df count + scoring). Legal on the streaming seam too:
    bm25serve calls this inside foreachBatch, where micro-batch
    frames are plain batch DataFrames; the session-owned index
    frames are NOT appended to ``materialized`` (they outlive the
    batch by design — index storage, evicted with the session
    caches).

    ``materialized`` (ADVICE r12): checkpointed RDD blocks are freed
    only when the driver GCs the frame references, so a LONG-RUNNING
    stream accumulates executor storage between GC cycles. A caller
    that consumes the result within one action (bm25serve's
    foreachBatch) passes a list; the checkpointed frames are appended
    to it and the caller unpersists them after its write. Batch
    callers (one action, short-lived session) may omit it."""
    from pyspark.sql import Window

    # serve against the published index (r15): postings, doc
    # lengths and corpus scalars are session index storage — the
    # per-query work is the broadcast term filter over postings
    # (row-identical to filtering the token stream before the tf
    # combine, since the group key contains the filter key)
    postings, dl, scalars = text_index(spark, sf_dir)

    hits = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    if materialized is not None:
        materialized.append(hits)
    df_per_term = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_per_term), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
    )
    n, dfc, tfc = (
        F.col("n_docs").cast("double"),
        F.col("df").cast("double"),
        F.col("tf").cast("double"),
    )
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    dl_norm = (
        F.lit(1.0)
        - F.lit(BM25_B)
        + F.lit(BM25_B)
        * F.col("dl").cast("double")
        * n
        / F.col("n_tokens").cast("double")
    )
    term_score = (
        idf
        * tfc
        * F.lit(BM25_K1 + 1.0)
        / (tfc + F.lit(BM25_K1) * dl_norm)
    )
    micro = F.floor(
        term_score * F.lit(float(_BM25_SCALE)) + F.lit(0.5)
    ).cast("long")
    per_doc = (
        scored.select("query_id", "doc_id", micro.alias("micro"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("micro").alias("sm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sm"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            (F.col("sm").cast("double") / F.lit(float(_BM25_SCALE))).alias(
                "bm25"
            ),
            "rank",
        )
    )


BM25_RETRIEVE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(
           list_sort(list_distinct(string_split(text, ' ')))[:{BM25_Q_TERMS}]
         ) AS term
  FROM documents WHERE doc_id < {BM25_N_QUERIES}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
scalars AS (
  SELECT count(*) AS n_docs, sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents
),
hits AS (
  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
),
df_per_term AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT q.query_id, h.doc_id,
         CAST(floor(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * CAST(tf AS DOUBLE) * {BM25_K1 + 1.0}
           / (CAST(tf AS DOUBLE) + {BM25_K1} *
              (1.0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE)
               * CAST(n_docs AS DOUBLE) / CAST(n_tokens AS DOUBLE)))
           * {_BM25_SCALE}.0 + 0.5) AS BIGINT) AS micro
  FROM hits h
  JOIN qterms q USING (term)
  JOIN df_per_term USING (term)
  JOIN dl ON h.doc_id = dl.doc_id
  CROSS JOIN scalars
),
per_doc AS (
  SELECT query_id, doc_id, sum(micro) AS sm
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id,
       CAST(sm AS DOUBLE) / {_BM25_SCALE}.0 AS bm25, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sm DESC, doc_id ASC) AS rank
  FROM per_doc
) WHERE rank <= {BM25_TOP_K}
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


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (Cormack, Clarke &
# Buettcher 2009) of the sparse BM25 ranking and a dense cosine
# ranking over the SAME query cohort — the standard first-stage
# fusion of a keyword+vector RAG stack.
RRF_K = 60  # the canonical RRF damping constant
RRF_TOP_K = 10


def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, sparse_rank, dense_rank, rrf, rank): RRF
    fusion of bm25_retrieve's keyword ranking and a dense cosine
    ranking, both over the seed cohort (doc_id < BM25_N_QUERIES;
    vec_id == doc_id contract). A doc retrieved by either side gets
    rrf = sum over sides of 1/(RRF_K + rank); absent sides
    contribute 0 and surface as NULL rank columns.

    Scale shape: both inputs are already top-k-bounded (k rows per
    query), so the fusion itself — one full-outer join on
    (query_id, doc_id) plus one window — touches at most 2k rows per
    query no matter the corpus size; the cost lives in the two
    retrievers, each independently swappable for its scale variant
    (IVF for dense, pruned impact-ordered postings for sparse).
    Determinism: 1/(RRF_K+rank) is the same two IEEE-double ops in
    both engines and the two-term sum has a fixed order (sparse +
    dense), so the 6dp-rounded score is engine-exact; ranking ties
    break on doc_id.

    Reference scope note: no reference analogue (SURVEY.md §2.9
    retrieval family) — the fusion consumer of bm25_retrieve and
    rag_retrieve's dense stage.
    """
    from pyspark.sql import Window

    from spark_app_twitter_spark.functions.vectors import cosine

    sparse = bm25_retrieve(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("sparse_rank")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < BM25_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.where(F.col("vec_id") >= BM25_N_QUERIES).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("cv")
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    dense = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "doc_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("dense_rank", F.row_number().over(wd))
        .where(F.col("dense_rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", "dense_rank")
    )

    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("sparse_rank")).cast("double"),
            F.lit(0.0),
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")).cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.select(
            "query_id", "doc_id", "sparse_rank", "dense_rank", rrf.alias("rrf")
        )
        .withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= RRF_TOP_K)
    )


def _hybrid_rrf_sql() -> str:
    from spark_app_twitter_spark.functions.vectors import cosine_sql

    return f"""
WITH sparse AS (
  SELECT query_id, doc_id, rank AS sparse_rank
  FROM ({BM25_RETRIEVE_SQL})
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {BM25_N_QUERIES}
),
c AS (
  SELECT vec_id AS doc_id, embedding AS cv FROM embeddings
  WHERE vec_id >= {BM25_N_QUERIES}
),
dense AS (
  SELECT query_id, doc_id, dense_rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, doc_id ASC
                             ) AS dense_rank
    FROM (
      SELECT query_id, doc_id,
             round({cosine_sql('qv', 'cv')}, 6) AS cos_sim
      FROM c CROSS JOIN q
    )
  ) WHERE dense_rank <= {BM25_TOP_K}
),
fused AS (
  SELECT query_id, doc_id, sparse_rank, dense_rank,
         round(coalesce(CAST(1.0 AS DOUBLE)
                        / CAST({RRF_K} + sparse_rank AS DOUBLE), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE)
                          / CAST({RRF_K} + dense_rank AS DOUBLE), 0.0),
               6) AS rrf
  FROM sparse FULL JOIN dense USING (query_id, doc_id)
)
SELECT query_id, doc_id, sparse_rank, dense_rank, rrf, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {RRF_TOP_K}
"""


HYBRID_RRF_SQL = _hybrid_rrf_sql()


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
    "bm25_retrieve",
    "BM25_RETRIEVE_SQL",
    "hybrid_rrf",
    "HYBRID_RRF_SQL",
]


# ---------------------------------------------------------------------------
# Incremental index maintenance: the posting-list delta between the
# two corpus snapshots versioning.corpus_delta derives — the indexer
# half of a CDC pipeline (corpus delta -> re-tokenize ONLY delta
# docs -> merge posting changes into the published index). Terms in
# unchanged documents never re-tokenize; cost is bounded by the
# delta size, not the corpus.
def index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, n_added, n_removed, df_delta): per-term posting
    changes between the old and new snapshots (versioning.py's
    derived snapshot rules), restricted to terms whose document
    membership actually moved.

    Scale shape: the delta doc set comes from corpus_delta's
    fingerprint join (text never travels); ONLY those docs'
    old/new texts explode into distinct (term, doc_id) membership
    rows, and the (term, doc_id)-keyed full-outer join + term rollup
    touch delta-sized relations end to end. A 'changed' doc's
    surviving terms appear on both sides and cancel — only real
    membership moves reach the aggregate.

    Reference scope note: composes the SURVEY §2.9 retrieval family
    (build_inverted_index) with the versioning family's CDC contract.
    """
    from spark_app_twitter_spark.operators.versioning import (
        _ADD_MOD,
        _CHG_MOD,
        _CHG_SUFFIX,
        _DEL_MOD,
        corpus_delta,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    # delta is bounded (changed-docs only) and feeds BOTH the old-side
    # and new-side branches below; corpus_delta is the session-shared
    # checkpointed CDC work list (r16), so both branches read its
    # persisted rows — no private re-checkpoint, no re-run of the
    # full-outer fingerprint join (PLANSTATS r12: 13 shuffles / 12
    # scans before truncation).
    delta = corpus_delta(spark, sf_dir).select("doc_id", "status")
    ddocs = docs.join(F.broadcast(delta), "doc_id")

    old_side = ddocs.where(
        F.col("status").isin("removed", "changed")
        & (F.pmod(F.col("doc_id"), F.lit(_ADD_MOD)) != 0)
    ).select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    new_text = F.when(
        F.pmod(F.col("doc_id"), F.lit(_CHG_MOD)) == 0,
        F.concat(F.col("text"), F.lit(_CHG_SUFFIX)),
    ).otherwise(F.col("text"))
    new_side = ddocs.where(
        F.col("status").isin("added", "changed")
        & (F.pmod(F.col("doc_id"), F.lit(_DEL_MOD)) != 0)
    ).select(
        "doc_id",
        F.explode(F.array_distinct(F.split(new_text, " "))).alias("term"),
    )
    # membership move detection as ONE union + hash aggregate
    # (optimization r15): each side is per-doc DISTINCT terms, so
    # max(flag) per (doc_id, term) reproduces the old full-outer
    # join's null pattern exactly — and the union shuffles the same
    # rows ONCE (partial-aggregated) where the full outer exchanged
    # and sorted both sides (5 -> 3 Exchanges on the delta tail).
    u = old_side.select(
        "doc_id", "term", F.lit(1).alias("o"), F.lit(0).alias("nw")
    ).unionByName(
        new_side.select(
            "doc_id", "term", F.lit(0).alias("o"), F.lit(1).alias("nw")
        )
    )
    moved = u.groupBy("doc_id", "term").agg(
        F.max("o").alias("in_old"), F.max("nw").alias("in_new")
    )
    return (
        moved.groupBy("term")
        .agg(
            F.sum(
                F.when(
                    (F.col("in_new") == 1) & (F.col("in_old") == 0), 1
                ).otherwise(0)
            ).alias("n_added"),
            F.sum(
                F.when(
                    (F.col("in_old") == 1) & (F.col("in_new") == 0), 1
                ).otherwise(0)
            ).alias("n_removed"),
        )
        .where((F.col("n_added") > 0) | (F.col("n_removed") > 0))
        .select(
            "term",
            "n_added",
            "n_removed",
            (F.col("n_added") - F.col("n_removed")).alias("df_delta"),
        )
    )


def _index_delta_sql() -> str:
    from spark_app_twitter_spark.operators.versioning import (
        _ADD_MOD,
        _CHG_MOD,
        _CHG_SUFFIX,
        _DEL_MOD,
    )

    return f"""
WITH old_fp AS (
  SELECT doc_id, md5(text) AS old_fp FROM documents
  WHERE doc_id % {_ADD_MOD} != 0
),
new_fp AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_CHG_MOD} = 0
                  THEN text || '{_CHG_SUFFIX}' ELSE text END) AS new_fp
  FROM documents WHERE doc_id % {_DEL_MOD} != 0
),
delta AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.old_fp IS NULL THEN 'added'
              WHEN n.new_fp IS NULL THEN 'removed'
              WHEN o.old_fp != n.new_fp THEN 'changed'
         END AS status
  FROM old_fp o FULL JOIN new_fp n ON o.doc_id = n.doc_id
),
dd AS (
  SELECT d.doc_id, d.status, doc.text
  FROM delta d JOIN documents doc ON d.doc_id = doc.doc_id
  WHERE d.status IS NOT NULL
),
old_side AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM dd WHERE status IN ('removed', 'changed')
    AND doc_id % {_ADD_MOD} != 0
),
new_side AS (
  SELECT doc_id,
         unnest(list_distinct(string_split(
           CASE WHEN doc_id % {_CHG_MOD} = 0
                THEN text || '{_CHG_SUFFIX}' ELSE text END, ' '))) AS term
  FROM dd WHERE status IN ('added', 'changed')
    AND doc_id % {_DEL_MOD} != 0
),
moved AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         COALESCE(o.term, n.term) AS term,
         o.doc_id IS NOT NULL AS in_old,
         n.doc_id IS NOT NULL AS in_new
  FROM old_side o
  FULL JOIN new_side n ON o.doc_id = n.doc_id AND o.term = n.term
)
SELECT term,
       CAST(sum(CASE WHEN in_new AND NOT in_old THEN 1 ELSE 0 END)
            AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN in_new AND NOT in_old THEN 1 ELSE 0 END)
            - sum(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END)
            AS BIGINT) AS df_delta
FROM moved
GROUP BY term
HAVING sum(CASE WHEN in_new AND NOT in_old THEN 1 ELSE 0 END) > 0
    OR sum(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END) > 0
"""


INDEX_DELTA_SQL = _index_delta_sql()


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio/RM1-lite): retrieve with the
# seed query, mine expansion terms from the top feedback docs, and
# rescore the expanded query — classic recall lift for sparse
# retrieval, built entirely from the shared bm25_search core.
FB_DOCS = 5  # feedback depth: top-N docs of the first pass
FB_TERMS = 3  # expansion width: top-N new terms mined from them


def _seed_query_terms(docs: DataFrame) -> DataFrame:
    """The deterministic (query_id, term) seed set shared by
    bm25_retrieve and query_expansion."""
    return (
        docs.where(F.col("doc_id") < BM25_N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.slice(
                    F.array_sort(F.array_distinct(tokens("text"))),
                    1,
                    BM25_Q_TERMS,
                )
            ).alias("term"),
        )
        .distinct()
    )


def query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, bm25, rank): BM25 top-k under pseudo-
    relevance feedback — pass 1 retrieves with the seed terms, the
    top FB_DOCS docs per query vote expansion terms (total
    occurrences across the feedback set, original terms excluded,
    ties on term asc), and pass 2 rescores the seed ∪ expansion
    query through the SAME bm25_search core.

    Scale shape: both passes keep bm25_search's plan (broadcast term
    filter below the tf combine; only doc-length is corpus-keyed).
    The feedback set is |queries| * FB_DOCS rows — it BROADCASTS into
    the token stream, so term mining shuffles only feedback-doc
    tokens; expansion adds <= FB_TERMS terms per query.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    qterms = _seed_query_terms(docs)
    base = bm25_search(spark, sf_dir, qterms)
    fb = base.where(F.col("rank") <= FB_DOCS).select("query_id", "doc_id")
    # r16: total term occurrences over the feedback docs = sum of the
    # published postings' per-doc tf (same tokens(), counting grouped
    # by (doc, term) first commutes with the (query, term) rollup) —
    # the corpus token explode leaves this pass too
    postings, _dl, _scalars = text_index(spark, sf_dir)
    mined = (
        postings.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("c"))
        .join(qterms, ["query_id", "term"], "left_anti")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("term"))
    expansion = (
        mined.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= FB_TERMS)
        .select("query_id", "term")
    )
    # materialize the tiny expanded-query relation (<= |queries| *
    # (BM25_Q_TERMS + FB_TERMS) rows): without the checkpoint, pass
    # 2's plan re-inlines pass 1's ENTIRE DAG under every reference
    # to the expansion (measured 82 shuffles / 68 scans in
    # PLANSTATS); with it, pass 2 is one fresh bm25_search plan
    expanded = (
        qterms.unionByName(expansion).distinct().localCheckpoint(eager=True)
    )
    return bm25_search(spark, sf_dir, expanded)


def _bm25_score_sql(qcte: str, sfx: str, top_k: int) -> str:
    """hits/df/scored/per_doc/ranked CTEs scoring the ``qcte``
    (query_id, term) relation — the SQL twin of bm25_search, CTE
    names suffixed so a query can run two scoring passes."""
    return f"""hits{sfx} AS (
  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM {qcte}) q USING (term)
),
df{sfx} AS (SELECT term, count(*) AS df FROM hits{sfx} GROUP BY term),
scored{sfx} AS (
  SELECT q.query_id, h.doc_id,
         CAST(floor(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * CAST(tf AS DOUBLE) * {BM25_K1 + 1.0}
           / (CAST(tf AS DOUBLE) + {BM25_K1} *
              (1.0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE)
               * CAST(n_docs AS DOUBLE) / CAST(n_tokens AS DOUBLE)))
           * {_BM25_SCALE}.0 + 0.5) AS BIGINT) AS micro
  FROM hits{sfx} h
  JOIN {qcte} q USING (term)
  JOIN df{sfx} USING (term)
  JOIN dl ON h.doc_id = dl.doc_id
  CROSS JOIN scalars
),
per_doc{sfx} AS (
  SELECT query_id, doc_id, sum(micro) AS sm
  FROM scored{sfx} GROUP BY query_id, doc_id
),
ranked{sfx} AS (
  SELECT query_id, doc_id,
         CAST(sm AS DOUBLE) / {_BM25_SCALE}.0 AS bm25, rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sm DESC, doc_id ASC) AS rank
    FROM per_doc{sfx}
  ) WHERE rank <= {top_k}
)"""


QUERY_EXPANSION_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(
           list_sort(list_distinct(string_split(text, ' ')))[:{BM25_Q_TERMS}]
         ) AS term
  FROM documents WHERE doc_id < {BM25_N_QUERIES}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
scalars AS (
  SELECT count(*) AS n_docs, sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents
),
{_bm25_score_sql("qterms", "1", FB_DOCS)},
fb AS (SELECT query_id, doc_id FROM ranked1),
mined AS (
  SELECT f.query_id, t.term, count(*) AS c
  FROM fb f JOIN toks t USING (doc_id)
  GROUP BY f.query_id, t.term
),
fresh AS (
  SELECT m.query_id, m.term, m.c
  FROM mined m LEFT JOIN qterms q
    ON m.query_id = q.query_id AND m.term = q.term
  WHERE q.term IS NULL
),
expansion AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY c DESC, term ASC) AS r
    FROM fresh
  ) WHERE r <= {FB_TERMS}
),
eq AS (
  SELECT query_id, term FROM qterms
  UNION
  SELECT query_id, term FROM expansion
),
{_bm25_score_sql("eq", "2", BM25_TOP_K)}
SELECT query_id, doc_id, bm25, rank FROM ranked2
"""


def bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, self_rank, rr_micro, hit_at_1): the sparse
    retrieval sanity audit — each seed query's terms came from one
    document, so that document IS the relevant answer; its rank in
    the BM25 ranking (NULL when outside top-k) gives reciprocal rank
    in exact integer micro-units (1e6 div rank). The sparse
    complement of sim_ann_recall_audit: a retrieval stack change that
    drops self-rank broke tokenization, scoring, or ranking.

    Scale shape: the full ranking is the shared bm25_search plan; the
    audit adds a filter to |queries| rows and a broadcast join back
    to the |queries|-row cohort — audit cost is cohort-sized.
    """
    hits = bm25_retrieve(spark, sf_dir).where(
        F.col("doc_id") == F.col("query_id")
    )
    cohort = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < BM25_N_QUERIES)
        .select(F.col("doc_id").alias("query_id"))
    )
    return cohort.join(
        F.broadcast(hits.select("query_id", "rank")), "query_id", "left"
    ).select(
        "query_id",
        F.col("rank").cast("int").alias("self_rank"),
        F.expr("CAST(1000000 div rank AS BIGINT)").alias("rr_micro"),
        F.coalesce(F.col("rank") == 1, F.lit(False)).alias("hit_at_1"),
    )


BM25_EVAL_SQL = f"""
WITH ranking AS (
{BM25_RETRIEVE_SQL.strip()}
),
self_hits AS (
  SELECT query_id, rank FROM ranking WHERE doc_id = query_id
),
cohort AS (
  SELECT doc_id AS query_id FROM documents WHERE doc_id < {BM25_N_QUERIES}
)
SELECT c.query_id,
       CAST(s.rank AS INTEGER) AS self_rank,
       CAST(1000000 // s.rank AS BIGINT) AS rr_micro,
       COALESCE(s.rank = 1, false) AS hit_at_1
FROM cohort c LEFT JOIN self_hits s USING (query_id)
"""


# ---------------------------------------------------------------------------
# Query-likelihood retrieval (Ponte & Croft 1998; Zhai & Lafferty
# 2001 Dirichlet smoothing): the language-model ranker that predates
# and complements BM25 — score(q, d) = sum_w log p(w | d) with
# p(w|d) = (tf + MU * cf_w / C) / (dl + MU).

QL_MU = 200.0  # Dirichlet pseudo-count (corpus docs are short)


def query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, ql, rank): Dirichlet-smoothed query log-
    likelihood top-k over the shared seed query set. Candidates are
    docs with >= 1 query-term hit (inverted-index semantics — a doc
    with zero hits scores strictly below any candidate differing
    only in tf, so top-k is unaffected in practice and the plan
    never scores the full corpus per query).

    The textbook decomposition keeps every per-row log engine-exact:
      score = sum_hits log(1 + tf*C/(MU*cf_w))        (per doc-term)
            + |q| * log(MU/(dl+MU))                   (per doc)
            + sum_w log(cf_w/C)                       (per query)
    Each log quantizes to integer micro-units BEFORE its sum (the
    bm25_search idiom); the per-doc term multiplies an integer count
    by ONE quantized log, so the whole score is an exact integer
    until the final division.

    Scale shape identical to bm25_search: broadcast term filter
    under the tf combine, doc_id-keyed length reduce, constant-size
    broadcast scalars; ranking is the per-query-bounded window.

    The three SHARED bounded relations — the seed query set (<=
    N_QUERIES * Q_TERMS rows), the hit table (candidate docs x query
    terms), and the 1-row corpus scalar — are localCheckpointed once
    (the sim_bitext_recall_audit r12 pattern): without truncation the
    plan re-derived qterms 3x, the corpus-explode-backed hit combine
    2x, and the corpus-sum scalar 2x inside one action (25 shuffles /
    22 scans, the widest registry plan after the bitext cut).

    Reference scope note: no reference analogue; SURVEY.md §2.9
    retrieval mandate (sparse family, second ranker).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    qterms = _seed_query_terms(docs).localCheckpoint(eager=False)
    # serve against the published index (r15): postings / doc
    # lengths / corpus scalar — same storage bm25_search reads
    postings, dl, idx_scalars = text_index(spark, sf_dir)
    scalars = idx_scalars.select("n_tokens")
    hits = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    cf = hits.groupBy("term").agg(F.sum("tf").alias("cf"))

    tfc, cfc, ct = (
        F.col("tf").cast("double"),
        F.col("cf").cast("double"),
        F.col("n_tokens").cast("double"),
    )
    hit_micro = F.floor(
        F.log(F.lit(1.0) + tfc * ct / (F.lit(QL_MU) * cfc))
        * F.lit(float(_BM25_SCALE))
        + F.lit(0.5)
    ).cast("long")
    s1 = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(scalars))
        .select("query_id", "doc_id", hit_micro.alias("micro"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("micro").alias("s1"))
    )
    qconst = (
        qterms.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            F.floor(
                F.log(cfc / ct) * F.lit(float(_BM25_SCALE)) + F.lit(0.5)
            )
            .cast("long")
            .alias("micro"),
        )
        .groupBy("query_id")
        .agg(F.sum("micro").alias("s3"), F.count(F.lit(1)).alias("nq"))
    )
    dl_micro = F.floor(
        F.log(
            F.lit(QL_MU) / (F.col("dl").cast("double") + F.lit(QL_MU))
        )
        * F.lit(float(_BM25_SCALE))
        + F.lit(0.5)
    ).cast("long")
    per_doc = (
        s1.join(dl, "doc_id")
        .join(F.broadcast(qconst), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("s1") + F.col("nq") * dl_micro + F.col("s3")).alias("sm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sm"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            (F.col("sm").cast("double") / F.lit(float(_BM25_SCALE))).alias(
                "ql"
            ),
            "rank",
        )
    )


QUERY_LIKELIHOOD_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(
           list_sort(list_distinct(string_split(text, ' ')))[:{BM25_Q_TERMS}]
         ) AS term
  FROM documents WHERE doc_id < {BM25_N_QUERIES}
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
scalars AS (
  SELECT sum(len(string_split(text, ' '))) AS n_tokens FROM documents
),
hits AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
  GROUP BY doc_id, term
),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM hits GROUP BY term),
s1 AS (
  SELECT q.query_id, h.doc_id,
         sum(CAST(floor(
           ln(1.0 + CAST(tf AS DOUBLE) * CAST(n_tokens AS DOUBLE)
                    / ({QL_MU} * CAST(cf AS DOUBLE)))
           * {_BM25_SCALE}.0 + 0.5) AS BIGINT)) AS s1
  FROM hits h
  JOIN qterms q USING (term)
  JOIN cf USING (term)
  CROSS JOIN scalars
  GROUP BY q.query_id, h.doc_id
),
qconst AS (
  SELECT query_id,
         sum(CAST(floor(
           ln(CAST(cf AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           * {_BM25_SCALE}.0 + 0.5) AS BIGINT)) AS s3,
         count(*) AS nq
  FROM qterms JOIN cf USING (term) CROSS JOIN scalars
  GROUP BY query_id
),
per_doc AS (
  SELECT s1.query_id, s1.doc_id,
         s1.s1 + qc.nq * CAST(floor(
           ln({QL_MU} / (CAST(dl AS DOUBLE) + {QL_MU}))
           * {_BM25_SCALE}.0 + 0.5) AS BIGINT) + qc.s3 AS sm
  FROM s1 JOIN dl ON s1.doc_id = dl.doc_id
  JOIN qconst qc ON s1.query_id = qc.query_id
)
SELECT query_id, doc_id,
       CAST(sm AS DOUBLE) / {_BM25_SCALE}.0 AS ql, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sm DESC, doc_id ASC) AS rank
  FROM per_doc
) WHERE rank <= {BM25_TOP_K}
"""


# ---------------------------------------------------------------------------
# Exact phrase search over positional postings — the "quoted query"
# half of keyword retrieval that bag-of-words BM25 cannot answer.

PHRASE_QUERIES = (
    ("key", "agg"),
    ("order", "fast"),
    ("the", "line"),
    ("data", "column"),
)


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(phrase, n_docs, n_hits): exact adjacent-bigram phrase
    occurrence counts for the fixed ``PHRASE_QUERIES`` set, via
    positional postings.

    The classic positional-index plan: tokenize with positions,
    keep ONLY postings whose term appears in some query phrase (a
    literal IN filter the scanner applies map-side, so the corpus
    never shuffles whole), then self-join first-word postings to
    second-word postings on (doc_id, pos + 1). n_docs distincts over
    matched docs; n_hits counts every occurrence.

    Scale shape: the join input is term-filtered (|query terms| of
    the vocabulary), keyed (doc_id, pos) — no skew beyond the query
    terms' own document frequency; the final reduce lands on
    |phrases| keys. Phrases that never occur still emit a zero row
    (left join from the literal phrase table), so the output is
    constant-shape.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    terms = sorted({w for p in PHRASE_QUERIES for w in p})
    post = (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "term"))
        .where(F.col("term").isin(terms))
    )
    phrases = spark.createDataFrame(
        [(f"{a} {b}", a, b) for a, b in PHRASE_QUERIES],
        "phrase string, w1 string, w2 string",
    )
    p1 = post.selectExpr("doc_id", "pos", "term AS w1")
    p2 = post.selectExpr("doc_id", "pos - 1 AS pos", "term AS w2")
    hits = (
        F.broadcast(phrases)
        .join(p1, "w1")
        .join(p2, ["w2", "doc_id", "pos"])
        .groupBy("phrase")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return (
        phrases.select("phrase")
        .join(hits, "phrase", "left")
        .select(
            "phrase",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def _phrase_search_sql() -> str:
    values = ", ".join(
        f"('{a} {b}', '{a}', '{b}')" for a, b in PHRASE_QUERIES
    )
    terms = ", ".join(
        f"'{w}'" for w in sorted({w for p in PHRASE_QUERIES for w in p})
    )
    return f"""
WITH phrases(phrase, w1, w2) AS (VALUES {values}),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
post AS (
  SELECT doc_id, unnest(ts) AS term,
         unnest(range(0, len(ts))) AS pos
  FROM toks
),
fpost AS (SELECT * FROM post WHERE term IN ({terms})),
hits AS (
  SELECT phrase, count(DISTINCT p1.doc_id) AS n_docs,
         count(*) AS n_hits
  FROM phrases
  JOIN fpost p1 ON p1.term = phrases.w1
  JOIN fpost p2 ON p2.term = phrases.w2
             AND p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
  GROUP BY phrase
)
SELECT phrases.phrase,
       CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits
FROM phrases LEFT JOIN hits USING (phrase)
"""


PHRASE_SEARCH_SQL = _phrase_search_sql()
