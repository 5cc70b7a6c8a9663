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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.textstats import (
    bloom_gate,
    doc_ngrams,
)


def benchmark_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[int]]:
    """(bench_grams, bloom_bit_words): the held-out benchmark's
    distinct gram set (eager checkpoint) and its ~8 KiB bloom bit
    table collected to a dense word list ONCE — the static side of
    every micro-batch's stream-static gate (since r12 the bit table
    is a constant-folded literal in each batch's plan, not a joined
    relation — see bloom_gate's plan-shape note). Since optimization
    r15 this delegates to the session-cached
    textstats.decon_benchmark_artifacts, so the batch
    decontamination queries and every stream share ONE build."""
    from spark_app_twitter_spark.operators.textstats import (
        decon_benchmark_artifacts,
    )

    return decon_benchmark_artifacts(spark, sf_dir)


# Default micro-batch shape for the gate's file wire (VERDICT r11
# item 5): the r11 stress trajectory proved per-batch cost is
# dominated by a ~1 s fixed floor (plan + checkpoint commit), so
# docs/sec RISES 11x with batch size (289 at 1 file/trigger ->
# 3,157 at the 100x fixture). The throughput-sized default is
# therefore "drain everything available per trigger" (no
# maxFilesPerTrigger cap — with availableNow this is ONE batch per
# drain); deployments that need bounded per-batch latency instead
# set files_per_trigger / SPARK_GRAFT_GATE_FILES_PER_TRIGGER to cap
# batch size. 0 means uncapped.
GATE_FILES_PER_TRIGGER = 0


def wire_source(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id bigint, text string",
    files_per_trigger: int | None = None,
) -> DataFrame:
    """The gate's ingest wire as a file-source stream with the
    module's throughput-sized batching default. files_per_trigger:
    None -> SPARK_GRAFT_GATE_FILES_PER_TRIGGER or the uncapped
    default; 0 -> uncapped (one availableNow batch); N>0 -> cap
    each micro-batch at N files (the latency-bounded shape)."""
    if files_per_trigger is None:
        files_per_trigger = int(
            os.environ.get(
                "SPARK_GRAFT_GATE_FILES_PER_TRIGGER",
                GATE_FILES_PER_TRIGGER,
            )
        )
    r = spark.readStream.schema(schema)
    if files_per_trigger > 0:
        r = r.option("maxFilesPerTrigger", files_per_trigger)
    return r.parquet(path)


def gate_batch(
    batch_docs: DataFrame, bench: DataFrame, words: DataFrame | list[int]
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
    artifacts: tuple[DataFrame, DataFrame | list[int]] | None = None,
) -> StreamingQuery:
    """docs (streaming, at least (doc_id, text)) -> admission gate ->
    clean/quarantine batch_id-partitioned parquet. Quarantine rows
    carry the audit columns (n_candidates, n_hit_grams). Pass
    ``artifacts`` (a benchmark_artifacts result) to reuse the static
    side across stream restarts — built here otherwise."""
    bench, words = artifacts or benchmark_artifacts(spark, sf_dir)

    def admit(batch: DataFrame, batch_id: int) -> None:
        # both consumers of the raw batch (the gate's gram explode
        # and the join's left side) sit inside ONE action below (the
        # routed checkpoint), so re-scanning the micro-batch source
        # twice is cheaper than an extra eager-checkpoint job
        b = batch
        flags = gate_batch(b, bench, words).where(
            F.col("n_hit_grams") > 0
        )
        # route with ONE gate pass + ONE join: the flags relation fed
        # both an inner join and an anti-join before r12, running the
        # whole gram-explode gate twice per micro-batch — at the ~1 s
        # micro-batch floor that was most of the marginal batch cost.
        # Left-join once, checkpoint the routed batch, write two
        # filtered views of the materialized artifact.
        routed = b.join(flags, "doc_id", "left").localCheckpoint(
            eager=True
        )
        try:
            routed.where(F.col("n_hit_grams").isNotNull()).write.mode(
                "overwrite"
            ).parquet(f"{quarantine_path}/batch_id={batch_id}")
            routed.where(F.col("n_hit_grams").isNull()).drop(
                "n_candidates", "n_hit_grams"
            ).write.mode("overwrite").parquet(
                f"{clean_path}/batch_id={batch_id}"
            )
        finally:
            # release the per-batch checkpoint blocks (r14: the bare
            # DataFrame.unpersist is a no-op on checkpointed frames)
            from spark_app_twitter_spark.functions.caches import (
                unpersist_frame,
            )

            unpersist_frame(routed)

    w = (
        docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
