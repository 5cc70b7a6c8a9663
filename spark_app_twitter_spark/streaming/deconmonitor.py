"""Streaming benchmark-decontamination admission gate: documents
arriving on the live wire are checked against the published
benchmark's Bloom table BEFORE admission to the training corpus —
contaminated docs route to a quarantine log, clean docs to the lake.

The gate math is textstats' bloom pipeline verbatim (`doc_ngrams` →
`bloom_gate` — the pii_group_counts discipline: ONE definition, so
the streaming gate and the batch `text_decontaminate_bloom` report
can never disagree; equality is pinned in tests). The benchmark
artifacts (distinct gram set + bloom bit table) are STATIC for a
published benchmark: built once from the corpus at startup,
checkpointed, and reused by every micro-batch — at 100 TB the bloom
table is the ~8 KiB broadcast and the gram set is the benchmark's,
not the corpus's.

Exactly-once: both sinks are batch_id-partitioned parquet (replay
overwrites its own directory — the bm25serve/versioning discipline).

Reference scope note: no reference analogue; SURVEY §2.7 streaming
mandate x the decontamination family (the admission-gate composition
a production training-data pipeline runs between ingest and lake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.textstats import (
    DECON_BENCH_MOD,
    DECON_BENCH_REM,
    bloom_gate,
    bloom_words_frame,
    doc_ngrams,
)
from spark_app_twitter_spark.sources.parquet import load_table


def benchmark_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(bench_grams, bloom_words): the held-out benchmark's distinct
    gram set and its ~8 KiB bloom bit table, both materialized once
    (eager checkpoint) — the static side of every micro-batch's
    stream-static gate."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    bench_docs = docs.where(
        (F.col("doc_id") % DECON_BENCH_MOD) == DECON_BENCH_REM
    )
    bench = (
        doc_ngrams(bench_docs)
        .select("g")
        .distinct()
        .localCheckpoint(eager=True)
    )
    words = bloom_words_frame(bench).localCheckpoint(eager=True)
    return bench, words


def gate_batch(
    batch_docs: DataFrame, bench: DataFrame, words: DataFrame
) -> DataFrame:
    """(doc_id, n_candidates, n_hit_grams) for one batch of
    (doc_id, text) rows — contaminated iff n_hit_grams > 0. The
    shared bloom_gate math over the batch's gram frame."""
    return bloom_gate(doc_ngrams(batch_docs), bench, words)


def admit_stream(
    docs: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    clean_path: str,
    quarantine_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    artifacts: tuple[DataFrame, DataFrame] | None = None,
) -> StreamingQuery:
    """docs (streaming, at least (doc_id, text)) -> admission gate ->
    clean/quarantine batch_id-partitioned parquet. Quarantine rows
    carry the audit columns (n_candidates, n_hit_grams). Pass
    ``artifacts`` (a benchmark_artifacts result) to reuse the static
    side across stream restarts — built here otherwise."""
    bench, words = artifacts or benchmark_artifacts(spark, sf_dir)

    def admit(batch: DataFrame, batch_id: int) -> None:
        b = batch.localCheckpoint(eager=True)  # two consumers
        flags = gate_batch(b, bench, words).where(
            F.col("n_hit_grams") > 0
        )
        quarantined = b.join(flags, "doc_id")
        quarantined.write.mode("overwrite").parquet(
            f"{quarantine_path}/batch_id={batch_id}"
        )
        b.join(flags.select("doc_id"), "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(f"{clean_path}/batch_id={batch_id}")

    w = (
        docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
