#!/usr/bin/env python
"""Phase decomposition for the PQ-ADC serving pair (r15).

sim_knn_pq_adc / sim_knn_ivf_pq sit at the top of the headline cost
table (~4-6 s at sf0.1) while their data volumes are tiny (2k
vectors, 5 queries) — so before restructuring the plan (the Arrow
LUT-gather + partial-top-k rewrite), attribute the wall to phases:

  train     pq_codebook_rows (session-cached after first call)
  codes     _pq_assign over the database subvectors (the M*K literal
            dispatch — wide codegen)
  lut       per-query ADC lookup table (Q*M*K rows)
  score     codes x lut join + (query, neighbor) sum
  topk      the final window

Each phase is forced with .count() off localCheckpointed inputs, so a
phase's time excludes its upstream. Run on a QUIET host (the r14/r15
protocol); prints one JSON line.

Usage: python tools/decomp_adc.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.operators import pq
    from spark_app_twitter_spark.operators.similarity import N_QUERIES
    from spark_app_twitter_spark.session import get_spark

    spark = get_spark("decomp_adc")
    spark.sparkContext.setLogLevel("ERROR")
    t: dict[str, float] = {}

    t0 = time.time()
    cents = pq.pq_codebook_rows(spark, SF)
    t["train"] = round(time.time() - t0, 3)

    t0 = time.time()
    subs = pq._subvecs(spark, SF).localCheckpoint(eager=True)
    t["subvecs"] = round(time.time() - t0, 3)

    t0 = time.time()
    codes = (
        pq._pq_assign(subs.where(F.col("vec_id") >= N_QUERIES), cents)
        .select(F.col("vec_id").alias("neighbor_id"), "m", "cell")
        .localCheckpoint(eager=True)
    )
    t["codes"] = round(time.time() - t0, 3)

    t0 = time.time()
    lut = pq._adc_lut(spark, cents, subs).localCheckpoint(eager=True)
    t["lut"] = round(time.time() - t0, 3)

    t0 = time.time()
    scored = (
        codes.join(F.broadcast(lut), ["m", "cell"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("s_micro").alias("adc_micro"))
        .localCheckpoint(eager=True)
    )
    t["score"] = round(time.time() - t0, 3)

    t0 = time.time()
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_micro"), F.asc("neighbor_id")
    )
    n = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pq.PQ_TOP_K)
        .count()
    )
    t["topk"] = round(time.time() - t0, 3)

    # warm end-to-end (train + artifacts cached) for the headline view
    t0 = time.time()
    pq.knn_pq_adc(spark, SF).count()
    t["e2e_warm_adc"] = round(time.time() - t0, 3)
    t0 = time.time()
    pq.knn_ivf_pq(spark, SF).count()
    t["e2e_warm_ivf_pq"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "decomp_adc",
                "sf_dir": SF,
                "rows_topk": n,
                "phases_sec": t,
                "loadavg": list(os.getloadavg()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
