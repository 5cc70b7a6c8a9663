#!/usr/bin/env python
"""Cold first-call timing probe for session-cached queries (the
streaming replay twins, lang_id): one session, artifacts pre-warmed
exactly like bench.py, then each named query timed on its FIRST call
(fold + serve — what the bench's headline number measures) plus one
warm repeat for the serve-only share. Also records the Spark job
count consumed by the cold call (DAGScheduler's job id counter), the
instrument for §1.2 job-count claims.

Usage: python tools/cold_probe.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from spark_app_twitter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _njobs(spark) -> int:
    # DAGScheduler's job-id counter: py4j unwraps the AtomicInteger
    # accessor to a plain int
    return spark._jsc.sc().dagScheduler().nextJobId()


def main() -> None:
    import __spark_entry__ as ent

    names = sys.argv[1:]
    spark = get_spark("cold_probe", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    from spark_app_twitter_spark.operators import clustering, pq, textstats, unigram
    from spark_app_twitter_spark.operators import dedup as _dd
    from spark_app_twitter_spark.operators import retrieval as _ret
    from spark_app_twitter_spark.operators import similarity as _sim

    t0 = time.perf_counter()
    clustering.kmeans_fine_centroid_rows(spark, SF_DIR)
    clustering.kmeans_cells_2level_assigned(spark, SF_DIR).count()
    textstats.bpe_train_merges(spark, SF_DIR).count()
    textstats.bpe_encoded_vocab(spark, SF_DIR).count()
    textstats.decon_benchmark_artifacts(spark, SF_DIR)
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
    for fr in _ret.text_index(spark, SF_DIR):
        fr.count()
    print(f"artifact warm: {time.perf_counter() - t0:.1f}s", flush=True)

    out = {}
    for name in names:
        fn = qs[name]
        j0 = _njobs(spark)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        cold = round(time.perf_counter() - t0, 3)
        j1 = _njobs(spark)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        warm = round(time.perf_counter() - t0, 3)
        out[name] = {"cold": cold, "warm": warm, "cold_jobs": j1 - j0}
        print(f"  {name}: cold {cold}s ({j1 - j0} jobs), warm {warm}s",
              flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
