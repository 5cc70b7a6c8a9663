#!/usr/bin/env python
"""VERDICT r13 item 2: decompose sim_knn_graph_multiprobe's cost the
way winnowing's was decomposed — candidate-pair count, per-phase wall
time, and output rows at the stress fixtures — to prove or refute
that wall time tracks the O(n*CAP) candidate volume.

Phases measured off ONE shared eager checkpoint (the registered plan
builds the same way, so the split is exact, not an approximation):
  assign  — two-level assignment + bucket key, checkpoint write
  cand    — deduped (vec_id, neighbor_id) candidate relation .count()
  cand_cp — eager checkpoint of the candidate relation (gen + write)
  score   — cosine + rank window + filter off the CHECKPOINTED
            candidates, noop sink (pure scoring/join/window cost)
  full    — the registered operator end-to-end, noop sink (control:
            assign + cand gen + score in one plan)

Run: python tools/decomp_multiprobe.py [R ...]   (default: 1 3 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_app_twitter_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from tools.stress import build

    from spark_app_twitter_spark.operators.similarity import (
        KNN_GRAPH_K,
        _multiprobe_assigned,
        _multiprobe_candidates,
        knn_graph_multiprobe,
    )
    from spark_app_twitter_spark.functions.vectors import cosine

    repls = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark("decomp_multiprobe", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the kernels once at tiny scale
    knn_graph_multiprobe(spark, "/root/testdata/sf0.001").count()

    rows = []
    for repl in repls:
        sf_dir = SRC if repl == 1 else build(spark, repl)
        rec: dict[str, float | int] = {"repl": repl}

        t0 = time.perf_counter()
        assigned = _multiprobe_assigned(spark, sf_dir)
        n_vec = assigned.count()
        rec["assign_s"] = round(time.perf_counter() - t0, 2)
        rec["n_vec"] = n_vec

        cands = _multiprobe_candidates(assigned)
        t0 = time.perf_counter()
        rec["n_cand"] = cands.count()
        rec["cand_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        cands_cp = cands.localCheckpoint(eager=True)
        rec["cand_cp_s"] = round(time.perf_counter() - t0, 2)

        ev = assigned.select("vec_id", "v")
        scored = (
            cands_cp.join(ev, "vec_id")
            .join(
                ev.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("v").alias("nv"),
                ),
                "neighbor_id",
            )
            .select(
                "vec_id",
                "neighbor_id",
                F.round(cosine(F.col("v"), F.col("nv")), 6).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        out = scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= KNN_GRAPH_K
        )
        t0 = time.perf_counter()
        out.write.mode("overwrite").format("noop").save()
        rec["score_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        rec["n_out"] = out.count()
        rec["out_count_s"] = round(time.perf_counter() - t0, 2)
        cands_cp.unpersist()
        assigned.unpersist()

        t0 = time.perf_counter()
        knn_graph_multiprobe(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        rec["full_s"] = round(time.perf_counter() - t0, 2)

        rows.append(rec)
        print(f"  {rec}", file=sys.stderr)

    print(json.dumps({"metric": "decomp_multiprobe", "rows": rows,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
