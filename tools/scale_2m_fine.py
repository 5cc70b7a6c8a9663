#!/usr/bin/env python
"""Natural-regime demonstration of the r14 Arrow fine path: at 2M
vectors levels_for gives k1=38, k2=38 -> 1444 fine cells >
LITERAL_ASSIGN_MAX_K, so kmeans_cells_2level_assigned selects
_arrow_fine_assign WITHOUT any forced threshold — the regime the
synthetic decomp_fine_arrow tree only simulated. Builds an
embeddings-only fixture (sf0.1 embeddings replicated R times,
vec_id-shifted), trains the full two-level tree cold, and times one
extra assignment pass per strategy for the head-to-head.

Run: python tools/scale_2m_fine.py [R]   (default 1000 -> 2M vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from spark_app_twitter_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = "/tmp/spark_graft_scale2m"


def main() -> None:
    from spark_app_twitter_spark.operators import clustering as cl

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_spark("scale2m", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    out = os.path.join(OUT, f"r{repl}")
    marker = os.path.join(out, "_BUILT")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        from spark_app_twitter_spark.sources.parquet import load_table

        emb = load_table(spark, SRC, "embeddings")
        n0 = emb.count()
        reps = emb.crossJoin(
            spark.range(repl).select(F.col("id").alias("_r"))
        ).select(
            (F.col("vec_id") + F.col("_r") * F.lit(n0 * 10)).alias("vec_id"),
            "embedding",
        )
        reps.repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )
        open(marker, "w").write("ok")

    rec: dict = {"repl": repl}
    n = cl.corpus_size(spark, out)
    k1, k2 = cl.levels_for(n)
    rec.update(n_vec=n, k1=k1, k2=k2, fine_cells=k1 * k2)
    assert k1 * k2 > cl.LITERAL_ASSIGN_MAX_K, "not in the Arrow regime"

    t0 = time.perf_counter()
    assigned = cl.kmeans_cells_2level_assigned(spark, out)
    rec["n_assigned"] = assigned.count()
    rec["cold_2level_train_s"] = round(time.perf_counter() - t0, 1)

    # head-to-head: one fine-assignment pass per strategy over the
    # trained tree (the train above warmed the caches)
    coarse_rows = cl.kmeans_centroid_rows(spark, out, k=k1)
    members = (
        cl.assign_cells(spark, cl._vecs(spark, out), coarse_rows)
        .select("vec_id", "v", F.col("cell").alias("coarse"))
        .localCheckpoint(eager=True)
    )
    rows = cl.kmeans_fine_centroid_rows(spark, out)
    t0 = time.perf_counter()
    cl._arrow_fine_assign(members, rows).write.mode("overwrite").format(
        "noop"
    ).save()
    rec["fine_arrow_s"] = round(time.perf_counter() - t0, 1)
    fdf = spark.createDataFrame(
        rows, "coarse int, fine int, fv array<double>"
    )
    t0 = time.perf_counter()
    cl._fine_assign(members, fdf).write.mode("overwrite").format(
        "noop"
    ).save()
    rec["fine_bcast_s"] = round(time.perf_counter() - t0, 1)

    print(json.dumps({"metric": "scale2m_fine", "rec": rec,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
