"""Streaming ANN serving: a stream of query vectors answered per
micro-batch against the PUBLISHED two-level IVF index (SURVEY §2.7
streaming mandate × the similarity-search family).

Top-k ranking needs batch semantics (``row_number`` over an unbounded
streaming frame is unsupported by design), so the serve path is
``foreachBatch`` — the standard Structured Streaming pattern for
answering each micro-batch against published state. The index
artifacts (coarse + fine centroids, the candidate cell assignment)
are the session-cached trained state every batch consumer shares
(operators/clustering.py): the stream NEVER retrains; a production
deployment refreshes the artifact on index publish and the next
micro-batch picks it up.

Exactly-once: each micro-batch overwrites its own ``batch_id=N``
partition, so a replayed batch (checkpoint recovery) lands on the
same path instead of appending duplicates — the same idempotent-sink
discipline as the serving upsert (sources/sinks.py).

Reference scope note: the reference app has no retrieval surface;
this is the streaming half of the engine's RAG/similarity capstone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

# Wire schema of a query stream: id + embedding as a JSON array.
QUERY_WIRE = "query_id bigint, qv array<double>"


def read_query_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source query stream: one JSON object per line with
    (query_id, qv) — the shape a Kafka query topic would yield after
    a value parse."""
    return spark.readStream.schema(QUERY_WIRE).json(path)


def serve_knn_stream(
    spark: SparkSession,
    queries: DataFrame,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """queries (streaming, QUERY_WIRE shape) -> per-micro-batch
    top-k answers from the published index -> idempotent
    batch-partitioned parquet. Drains what is available and stops
    (availableNow), like every other test-driveable job here."""
    from spark_app_twitter_spark.operators.similarity import knn_ivf_search

    def answer(batch: DataFrame, batch_id: int) -> None:
        knn_ivf_search(spark, sf_dir, batch).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/batch_id={batch_id}")

    return (
        queries.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
