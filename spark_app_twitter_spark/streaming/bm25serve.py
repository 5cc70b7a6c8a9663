"""Streaming keyword (BM25) serving: a stream of keyword queries
answered per micro-batch against the corpus statistics — the SPARSE
complement of streaming/annserve.py's dense ANN server, completing
the hybrid-retrieval stack's streaming story.

Top-k ranking needs batch semantics, so the serve path is
``foreachBatch`` (annserve's pattern): each micro-batch of
(query_id, terms) rows explodes to the (query_id, term) relation and
runs through operators/retrieval.bm25_search — the same broadcast
term filter / doc-length count / integer micro-unit scoring as the
registered batch query. In production the tf/df/length statistics
are a published artifact refreshed on index build; here they derive
from the corpus parquet exactly as the batch path does, so
stream == batch equality is a meaningful test, not a tautology over
shared cached state.

Exactly-once: each micro-batch overwrites its own ``batch_id=N``
partition (idempotent replay on checkpoint recovery — the engine's
standard sink discipline).

Reference scope note: the reference app has no retrieval surface;
SURVEY §2.7 streaming mandate × the sparse retrieval family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# Wire schema of a keyword-query stream: id + term list.
KEYWORD_WIRE = "query_id bigint, terms array<string>"


def read_keyword_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source keyword stream: one JSON object per line with
    (query_id, terms) — the shape a Kafka query topic would yield
    after a value parse."""
    return spark.readStream.schema(KEYWORD_WIRE).json(path)


def serve_bm25_stream(
    spark: SparkSession,
    queries: DataFrame,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """queries (streaming, KEYWORD_WIRE shape) -> per-micro-batch
    BM25 top-k answers -> idempotent batch-partitioned parquet.
    Drains available input and stops (availableNow), like every
    test-driveable job here."""
    from spark_app_twitter_spark.operators.retrieval import bm25_search

    def answer(batch: DataFrame, batch_id: int) -> None:
        qterms = batch.select(
            "query_id", F.explode("terms").alias("term")
        ).distinct()
        # collect the core's checkpointed relations and free their
        # blocks after the write: a long-running stream must not
        # accumulate per-batch checkpoint storage until driver GC
        # (ADVICE r12); the unpersist sits in finally so a failed
        # batch write can't leak the blocks either (ADVICE r13)
        materialized: list[DataFrame] = []
        try:
            bm25_search(
                spark, sf_dir, qterms, materialized=materialized
            ).write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
        finally:
            # unpersist_frame, not DataFrame.unpersist: checkpoint
            # blocks live under a LogicalRDD the cacheManager never
            # sees (r14 finding — the bare unpersist was a no-op)
            from spark_app_twitter_spark.functions.caches import (
                unpersist_frame,
            )

            for df in materialized:
                unpersist_frame(df)

    return (
        queries.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
