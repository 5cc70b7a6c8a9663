#!/usr/bin/env python
"""VERDICT r13 item 3 measurement: the large-k fine-assignment and
probe-scoring regimes (beyond LITERAL_ASSIGN_MAX_K / ARROW_ASSIGN_MIN_K)
are unreachable at the replication fixtures through levels_for (k1*k2
crosses 1024 only past ~1M vectors), so this probe builds a SYNTHETIC
large fine tree over the 100x fixture's real vectors and times the
three fine-assignment strategies head-to-head:

  inline  — the CASE-dispatched literal expression (the <=1024 path;
            at large k its parse/codegen cost is the documented risk)
  bcast   — broadcast join + per-vector window (the OLD >1024 default)
  arrow   — the r14 Arrow coarse-dispatched exact fold (NEW default)

plus the probe side (inline_top_cells_euclid) literal vs Arrow at a
k above the switch. Equality is asserted exactly (exceptAll both ways).

Run: python tools/decomp_fine_arrow.py [R] [K2]   (default R=10 K2=150)
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

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from tools.stress import build

    from spark_app_twitter_spark.operators import clustering as cl

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k2 = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    spark = get_spark("decomp_fine_arrow", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build(spark, repl) if repl > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    k1 = cl.levels_for(cl.corpus_size(spark, sf_dir))[0]
    coarse_rows = cl.kmeans_centroid_rows(spark, sf_dir, k=k1)
    members = (
        cl.assign_cells(spark, cl._vecs(spark, sf_dir), coarse_rows)
        .select("vec_id", "v", F.col("cell").alias("coarse"))
        .localCheckpoint(eager=True)
    )
    n_vec = members.count()

    # synthetic fine tree: first K2 members of each coarse cell
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("coarse").orderBy(F.asc("vec_id"))
    )
    rows = [
        (r["coarse"], r["_rn"] - 1, list(r["v"]))
        for r in members.withColumn("_rn", rn)
        .where(F.col("_rn") <= k2)
        .collect()
    ]
    rec = {"repl": repl, "n_vec": n_vec, "k1": k1, "k2": k2,
           "fine_rows": len(rows)}

    fdf = spark.createDataFrame(rows, "coarse int, fine int, fv array<double>")
    variants = {
        "bcast": lambda: cl._fine_assign(members, fdf),
        "arrow": lambda: cl._arrow_fine_assign(members, rows),
    }
    if len(rows) <= 2500:  # inline parse survives this envelope
        variants["inline"] = lambda: cl._inline_fine_assign(members, rows)
    outs = {}
    for name, mk in variants.items():
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        rec[f"fine_{name}_s"] = round(time.perf_counter() - t0, 2)
        outs[name] = mk().select("vec_id", "coarse", "fine")
    for name, df in outs.items():
        if name == "arrow":
            continue
        a, b = outs["arrow"], df
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), (
            f"arrow != {name}"
        )
    rec["fine_equal"] = True

    # probe side at k just above the switch: literal vs arrow
    kp = cl.ARROW_ASSIGN_MIN_K + 72
    cents = [
        (i, list(r.v))
        for i, r in enumerate(
            members.orderBy("vec_id").limit(kp).collect()
        )
    ]
    q = members.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))

    def probe():
        return cl.inline_top_cells_euclid(q, "query_id", "qv", cents, keep=5)

    t0 = time.perf_counter()
    probe().write.mode("overwrite").format("noop").save()
    rec["probe_arrow_s"] = round(time.perf_counter() - t0, 2)
    arrow_probe = probe().localCheckpoint(eager=True)
    orig = cl.ARROW_ASSIGN_MIN_K
    cl.ARROW_ASSIGN_MIN_K = 10_000_000
    try:
        t0 = time.perf_counter()
        probe().write.mode("overwrite").format("noop").save()
        rec["probe_literal_s"] = round(time.perf_counter() - t0, 2)
        lit_probe = probe()
        assert arrow_probe.exceptAll(lit_probe).isEmpty()
        assert lit_probe.exceptAll(arrow_probe).isEmpty()
    finally:
        cl.ARROW_ASSIGN_MIN_K = orig
    rec["probe_k"] = kp
    rec["probe_equal"] = True

    print(json.dumps({"metric": "decomp_fine_arrow", "rec": rec,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
