#!/usr/bin/env python
"""VERDICT r13 item 4: one more attempt at a faster winnowing
emission. Variants, all producing the exact (doc_id, fp_pos, fp_hash)
relation of textstats.winnowing (exceptAll-checked both ways at R=1):

  current — array_min(slice(hs, j, W)) per window (interpreted HOF,
            ~(W+1)·L ops/doc), map-only
  double  — sparse-table doubling: 3 chained zip_with(..., least)
            levels compute all window-8 minima in ~3·L interpreted
            ops/doc; still map-only, zero exchange
  gbwin   — the verdict-suggested shape: position-explode each hash
            into its windows, groupBy(doc_id, window) min (map-side
            partial agg collapses the x8 before the exchange, but the
            exchange still carries ~|chars| rows)

Run: python tools/decomp_winnow.py [R ...]   (default 1 10)
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


def winnow_double(spark, sf_dir):
    from spark_app_twitter_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
    )
    from spark_app_twitter_spark.sources.parquet import load_table

    assert WINNOW_W == 8, "doubling ladder below is specialized to W=8"
    docs = load_table(spark, sf_dir, "documents", spread=True)
    hs = F.expr(
        f"transform(sequence(1, length(text) - {WINNOW_K - 1}),"
        f" i -> concat(md5(substr(text, i, {WINNOW_K})), '|',"
        f"             lpad(cast(i as string), 10, '0')))"
    )
    # m1[i] = min(hs[i], hs[i+1]); m2[i] = min(m1[i], m1[i+2]);
    # m3[i] = min(m2[i], m2[i+4]) = min(hs[i..i+7]). zip_with pads the
    # shorter side with null and least() skips nulls, so trailing
    # positions degrade to partial-window minima exactly like
    # array_min(slice(...)) does at the array end.
    m1 = "zip_with(hs, slice(hs, 2, size(hs)), (x, y) -> least(x, y))"
    m2 = f"zip_with({m1}, slice({m1}, 3, size(hs)), (x, y) -> least(x, y))"
    m3 = f"zip_with({m2}, slice({m2}, 5, size(hs)), (x, y) -> least(x, y))"
    fps = F.expr(
        f"array_distinct(slice({m3}, 1, greatest(size(hs) - 7, 1)))"
    )
    return (
        docs.where(F.length("text") >= WINNOW_K)
        .select("doc_id", hs.alias("hs"))
        .select("doc_id", F.explode(fps).alias("fp"))
        .select(
            "doc_id",
            F.expr("cast(substring(fp, 34, 10) as bigint)").alias("fp_pos"),
            F.expr("substring(fp, 1, 32)").alias("fp_hash"),
        )
    )


def winnow_gbwin(spark, sf_dir):
    from spark_app_twitter_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
    )
    from spark_app_twitter_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents", spread=True)
    # (doc_id, i, fp) one row per shingle position, then fan each
    # position into the windows it belongs to: j in
    # [max(1, i-W+1), min(i, n_windows)]
    pos = (
        docs.where(F.length("text") >= WINNOW_K)
        .select(
            "doc_id",
            (F.length("text") - F.lit(WINNOW_K - 1)).alias("L"),
            F.explode(
                F.expr(f"sequence(1, length(text) - {WINNOW_K - 1})")
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "i",
            F.expr(
                f"concat(md5(substr(text, i, {WINNOW_K})), '|',"
                f" lpad(cast(i as string), 10, '0'))"
            ).alias("fp"),
            F.greatest(F.col("L") - F.lit(WINNOW_W - 1), F.lit(1)).alias(
                "nw"
            ),
        )
    )
    wins = pos.select(
        "doc_id",
        "fp",
        F.explode(
            F.expr(
                f"sequence(greatest(i - {WINNOW_W - 1}, 1), least(i, nw))"
            )
        ).alias("j"),
    )
    sel = wins.groupBy("doc_id", "j").agg(F.min("fp").alias("fp"))
    return sel.select("doc_id", "fp").distinct().select(
        "doc_id",
        F.expr("cast(substring(fp, 34, 10) as bigint)").alias("fp_pos"),
        F.expr("substring(fp, 1, 32)").alias("fp_hash"),
    )


def main() -> None:
    from tools.stress import build

    from spark_app_twitter_spark.operators.textstats import winnowing

    repls = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("decomp_winnow", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "current": winnowing,
        "double": winnow_double,
        "gbwin": winnow_gbwin,
    }
    # exactness first, at sf0.1
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cur = variants["current"](spark, base_dir).localCheckpoint(eager=True)
    for name in ("double", "gbwin"):
        alt = variants[name](spark, base_dir)
        assert cur.exceptAll(alt).isEmpty() and alt.exceptAll(cur).isEmpty(), (
            f"{name} != current"
        )
    cur.unpersist()
    print("exactness: both variants equal current at sf0.1",
          file=sys.stderr)

    rows = []
    for repl in repls:
        sf_dir = base_dir if repl == 1 else build(spark, repl)
        rec = {"repl": repl}
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            rec[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        rows.append(rec)
        print(f"  {rec}", file=sys.stderr)
    print(json.dumps({"metric": "decomp_winnow", "rows": rows,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
