#!/usr/bin/env python
"""Streaming decontamination admission-gate stress (VERDICT r10
item 6): micro-batch throughput of streaming/deconmonitor.py at the
scale-trajectory fixtures.

Reuses tools/stress.py's replicated fixture (build is shared and
cached), builds the STATIC benchmark artifacts once (timed — the
startup cost a deployment pays per published benchmark), then runs
the real admit_stream over deconmonitor.wire_source of the scaled
documents table. Since r12 the batching shape is the MODULE default
(uncapped = one availableNow drain batch — the throughput-sized
shape the r11 trajectory proved out); pass FPT to cap files per
trigger (FPT=1 reproduces the r11 per-file cadence). Runs the drain
twice over fresh checkpoints — cold (plan/codegen paid once at
stream start) and steady-state (what the gate pays for months) —
and reports both; docs/sec is steady-state. These are the numbers
behind BASELINE.md's stream_decon_gate rows.

Run: python tools/stress_decon_gate.py [R [FPT]]   (one JSON line,
R=1 for the unreplicated sf0.1 anchor; FPT omitted = module default)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from spark_app_twitter_spark.session import get_spark  # noqa: E402
from tools.stress import SRC, build  # noqa: E402

OUT = "/tmp/spark_graft_decon_gate"


def main() -> None:
    from spark_app_twitter_spark.sources.parquet import load_table
    from spark_app_twitter_spark.streaming.deconmonitor import (
        admit_stream,
        benchmark_artifacts,
        wire_source,
    )

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("decon_gate_stress", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    sf_dir = SRC if repl <= 1 else build(spark, repl)
    build_s = round(time.perf_counter() - t0, 1)

    shutil.rmtree(OUT, ignore_errors=True)
    wire = os.path.join(OUT, "wire")
    # stage the wire: the documents table re-written as fixed-size
    # files so maxFilesPerTrigger=1 gives a deterministic micro-batch
    # cadence (each file ~one ingest batch)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    n_files = 16
    docs.repartition(n_files).write.mode("overwrite").parquet(wire)

    # static artifacts: built once per published benchmark — the
    # startup cost, NOT a per-batch cost
    t0 = time.perf_counter()
    bench, words = benchmark_artifacts(spark, sf_dir)
    artifact_s = round(time.perf_counter() - t0, 2)

    # two full drains over fresh checkpoints: drain 1 pays the cold
    # plan/codegen cost a deployment pays ONCE at stream start; drain
    # 2 is the steady-state per-drain cost the gate pays for months.
    # Both are reported; docs_per_sec is the steady-state number.
    drains = []
    for label in ("cold", "steady"):
        for sub in ("clean", "quarantine", "ckpt"):
            shutil.rmtree(os.path.join(OUT, sub), ignore_errors=True)
        stream = wire_source(spark, wire, files_per_trigger=fpt)
        t0 = time.perf_counter()
        q = admit_stream(
            stream,
            spark,
            sf_dir,
            clean_path=os.path.join(OUT, "clean"),
            quarantine_path=os.path.join(OUT, "quarantine"),
            checkpoint=os.path.join(OUT, "ckpt"),
            trigger_available_now=True,
            artifacts=(bench, words),
        )
        q.awaitTermination()
        drains.append((label, round(time.perf_counter() - t0, 2)))
    cold_s = drains[0][1]
    stream_s = drains[1][1]

    quarantined = spark.read.parquet(os.path.join(OUT, "quarantine")).count()
    clean = spark.read.parquet(os.path.join(OUT, "clean")).count()
    assert quarantined + clean == n_docs, (quarantined, clean, n_docs)
    # batches actually run: one per batch_id partition in the sinks
    n_batches = len(
        {
            d
            for d in os.listdir(os.path.join(OUT, "clean"))
            if d.startswith("batch_id=")
        }
    )
    print(
        json.dumps(
            {
                "metric": "stress_decon_gate",
                "replication": repl,
                "files_per_trigger": fpt,
                "build_sec": build_s,
                "artifact_sec": artifact_s,
                "cold_stream_sec": cold_s,
                "stream_sec": stream_s,
                "n_docs": n_docs,
                "n_batches": n_batches,
                "docs_per_sec": round(n_docs / stream_s, 1),
                "batch_latency_sec": round(stream_s / n_batches, 2),
                "quarantined": quarantined,
                "clean": clean,
                "loadavg": list(os.getloadavg()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
