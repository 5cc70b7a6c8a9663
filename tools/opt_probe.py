#!/usr/bin/env python
"""Warm per-query timing probe for the optimization rounds.

Usage: python tools/opt_probe.py [-n REPS] name [name ...]

Spins one session on local[$SPARK_GRAFT_CPUS], pre-trains the published
artifacts exactly like bench.py, runs each named query REPS+1 times
(first = warmup, discarded), and prints per-query sorted samples +
median. This is the within-session instrument; cross-epoch totals are
not comparable (worklog: 135.8 -> 229.6 -> 176.9 s for the same tree in
three epochs), so before/after claims use THIS probe run back-to-back
in one session, or tools/bench_ab.py across trees.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from spark_app_twitter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    import __spark_entry__ as ent

    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args
    spark = get_spark("opt_probe", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    from spark_app_twitter_spark.operators import clustering, pq, textstats, unigram
    from spark_app_twitter_spark.operators import similarity as _sim

    t0 = time.perf_counter()
    clustering.kmeans_fine_centroid_rows(spark, SF_DIR)
    clustering.kmeans_cells_2level_assigned(spark, SF_DIR).count()
    textstats.bpe_train_merges(spark, SF_DIR).count()
    textstats.bpe_encoded_vocab(spark, SF_DIR).count()
    textstats.decon_benchmark_artifacts(spark, SF_DIR)
    from spark_app_twitter_spark.operators import dedup as _dd

    _dd.minhash_band_index(spark, SF_DIR).count()
    _sim._pca_components(spark, SF_DIR, _sim.PCA_COMPONENTS)
    pq.pq_codebook_rows(spark, SF_DIR)
    pq.pq_corpus_codes(spark, SF_DIR).count()
    unigram.unigram_trained(spark, SF_DIR)
    unigram.unigram_encoded_vocab(spark, SF_DIR).count()
    clustering.kmeans_centroid_rows(spark, SF_DIR)
    clustering.kmeans_cells(spark, SF_DIR).count()
    _sim.bitext_capped_candidates(spark, SF_DIR).count()
    textstats.trained_bigram_lm(spark, SF_DIR)
    from spark_app_twitter_spark.operators import retrieval as _ret

    for fr in _ret.text_index(spark, SF_DIR):
        fr.count()
    print(f"artifact warm: {time.perf_counter() - t0:.1f}s", flush=True)

    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for i in range(reps + 1):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(round(dt, 3))
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
        }
        print(f"  {name}: median {out[name]['median']} {samples}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
