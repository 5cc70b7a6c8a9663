#!/usr/bin/env python
"""Scale-trajectory stress harness: replicate the sf0.1 tables R times
with key-shifting (default R=10 ≈ sf1) into a tmp dir, then time the
headline operator families against the scaled data.

Purpose: the correctness gate runs at sf0.01; this answers the scale
question directly — do the plans hold when the fact table is 6M rows
and the corpus is 50k near-duplicate-heavy documents? Near-linear
per-family scaling here is the evidence that the same plans survive
the next 100x on a real cluster (shuffles stay keyed, joins stay
broadcast/bucketed, nothing driver-side grows with data).

Replication details (all deterministic):
- lineitem/orders/customer: key-shift l_orderkey/o_orderkey,
  o_custkey/c_custkey by replica*stride so joins stay consistent and
  cardinalities really grow (no accidental 10x duplicate joins).
- documents: doc_id shift + two replica-specific tokens appended —
  replicas become NEAR-duplicates (jaccard ~0.9), deliberately
  stressing the LSH candidate path the way a crawl with mirrored
  pages would.
- embeddings: vec_id shift, vectors unchanged (exact-duplicate
  vectors stress the near-dup/cell paths).
- events: event_id/user_id shift; ts shifted by replica days.

Run: python tools/stress.py [R]   (writes one JSON line, like bench.py)
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

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_ROOT = "/tmp/spark_graft_stress"

STRESS_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_top_customers_per_nation",
    "serving_sessionize",
    "text_lang_id",
    "text_tfidf_top_terms",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "sem_dedup",
    "sim_knn_ivf",
    "sim_knn_quantized",
    "text_train_split",
    # late round 3: dup-span counting join at 10x duplicate-heavy
    # data, LM model growth, covariance's fixed d(d+1)/2 output
    "dedup_span_stats",
    "text_bigram_lm_score",
    "sim_embedding_covariance",
    # round 5: keyless bucketed range join (candidates must scale
    # with events-per-bucket, not corpus^2), BPE training (rounds run
    # over the vocabulary, which barely grows under replication), LR
    # training (per-iteration shuffle is |dims| rows at any scale),
    # PCA projection (map-only after a bounded covariance reduction)
    "range_clicks_near_errors",
    "text_bpe_train_merges",
    "text_train_lang_lr",
    "sim_embedding_pca",
    # late round 5: regular-grid resample, skew-safe agg, layout
    # keys, shuffle layout, dup-graph centrality, session windows
    "serving_hourly_gapfill",
    "agg_salted_event_totals",
    "layout_zorder_events",
    "pack_shuffle_export",
    "graph_pagerank_near_dup",
    "serving_session_window_stats",
    # round 6: sparse index build (term-keyed, posting cap bounds
    # output), nearest-event join, snapshot delta, mixture planner
    # (|sources|-bounded), HLL (cell-bounded shuffle), bloom-gated
    # decontamination, delta-only stats maintenance, batched BPE,
    # two-level k-means (2n*sqrt(k) assignment), segment dedup
    # (words-linear), CMS (2048-cell shuffle), compaction planner
    # (listing-row window), skew report (key-keyed counts)
    "retrieval_inverted_index",
    "asof_nearest_click",
    "versioning_corpus_delta",
    "text_mixture_plan",
    "sketch_hll_daily_users",
    "text_decontaminate_bloom",
    "versioning_incremental_stats",
    "text_bpe_train_batched",
    "sim_kmeans_cells_2level",
    "dedup_paragraphs",
    "sketch_cms_top_terms",
    "layout_compaction_plan",
    "diag_key_skew",
    # late round 6: source-pair overlap (|sources|^2-bounded rollup),
    # k-anonymity gate (release-key agg), IVF-backed retrieval
    "dedup_source_overlap",
    "versioning_k_anonymous",
    "retrieval_rag_ivf",
    "text_mixture_apply",
    "sketch_hist_quantiles",
    # NOT listed: dedup_cluster_best — it consumes dedup_clusters'
    # connected components, and the stress fixture's deliberate
    # 30-way near-dup replication makes every doc a 30-clique
    # (~65M verified pairs at 30x), the same fixture-quadratic
    # growth documented for pagerank; a 30x attempt ran >18 min
    # before being cut. Real-corpus scaling rides on the LSH pair
    # volume, which the minhash_lsh_pairs stress entry measures.
    # (round 7: "sem_dedup" above IS the two-level path now; the
    # explicit flat variant stays stressable under its new name —
    # its 65.5x-at-100x trajectory is the documented reason it was
    # demoted, so only re-measure it at small multiples)
    "sem_dedup_flat",
    # r10: embedding contamination screen — the semdedup bound
    # (bench side capped per cell; cell-keyed equi-join)
    "text_decontaminate_semantic",
    # r11: the threshold-sensitivity audit runs the UNCAPPED
    # intra-cell pair relation (its ground truth) — an audit-class
    # job whose pair volume is Σ|bench∩cell|·|cell| (bench is 2% of
    # docs); the replication fixture's exact-duplicate embeddings
    # inflate cells, so this is its worst case
    "text_semdecon_sensitivity",
    # r11: screen-agreement rollup — composes the two bounded screens
    # plus one doc_id-keyed outer join
    "text_decon_screen_agreement",
    # r11: soft dedup rides the O(n) lsh_clusters chain + one
    # cluster-keyed count/join pair
    "dedup_soft_weights",
    # r11: per-source drill-down — two bounded flag relations onto
    # the (doc_id, source) projection, |sources|-row rollup
    "text_contamination_by_source",
    # r12: the sampler face of soft dedup — soft weights + one
    # map-side draw/compare projection (same O(n) cluster chain)
    "text_weighted_sample_soft",
    # late r12: topic-balanced subsample — cell-partitioned window
    # over the trained cell table (quota pick), k-row size broadcast;
    # output sublinear (CAP * sqrt(n))
    "sim_cluster_balanced_sample",
    # late r12: tokenizer fertility — vocabulary-bounded encode +
    # broadcast-profile lang-ID composed by one doc-keyed join into a
    # |langs|-row rollup
    "text_tokenizer_fertility",
    # late r12: per-source quality floor — one corpus pass into a
    # |sources| x (GRID+1)-row checkpointed histogram; the quantile
    # read-off windows the sketch, never the data
    "text_quality_floor_by_source",
    # round 7: IVF+int8 serving composition (candidate-bounded +
    # RERANK_M-bounded float math), contrastive pair mining (its
    # registered stage 1 is the EXACT sampled-cohort top-k, so the
    # trajectory tracks brute force over the fixed query set),
    # vocabulary-bounded compression scorecard
    "sim_knn_ivf_quantized",
    "sim_contrastive_pairs",
    "text_bpe_compression",
    # round 8 (VERDICT r07 items 3-4): the capped pair relation and
    # the cluster chain are O(n)-output by construction — their
    # trajectories are the evidence the near-dup family no longer
    # rides the fixture's quadratic clique growth; split leakage is
    # cluster-routed now, so it tracks lsh_clusters, not the exact
    # pair volume
    "dedup_minhash_lsh_pairs_capped",
    "dedup_lsh_clusters",
    "dedup_split_leakage",
    # round-8 additions: SimHash clusters (same capped-bucket shape),
    # vocabulary-bounded coverage curve, digest-keyed n-gram novelty,
    # PRF double-pass BM25 (both passes term-broadcast), map-side PII
    # rollup, index-sized k-means quality audit, single-exchange
    # funnel
    "dedup_simhash_clusters",
    "text_vocab_coverage",
    "text_ngram_novelty",
    "retrieval_query_expansion",
    "text_pii_stats",
    "sim_kmeans_quality",
    "serving_funnel_conversion",
    # late round 8: survivor election (cluster-chain + one doc join),
    # cohort-sized sparse eval, sketch-sized KMV set ops, 8-byte
    # binary ANN tier (brute over codes: same broadcast-query shape
    # as knn_bruteforce but 8 bytes/candidate), rollup-sized anomaly
    # windows
    "dedup_cluster_survivors_by_source",
    "retrieval_bm25_eval",
    "sketch_kmv_source_overlap",
    "sim_knn_binary_hamming",
    "serving_hourly_anomalies",
    "sim_embedding_sanity",
    "sim_ivf_index_append",
    "sim_embedding_drift",
    "pack_efficiency",
    "dedup_paragraphs_rewrite",
    "sim_embedding_outliers",
    "layout_zorder_skipping",
    "serving_trending_topics",
    # round-7 continuation: sparse BM25 (explode + doc_id-keyed
    # combine, query terms broadcast), DSIR (one profile groupBy +
    # one doc_id-keyed reduce), shard manifest (one shard-keyed
    # reduce), hybrid RRF (two k-bounded retrievers + k-bounded
    # fusion), matryoshka audit (two broadcast-query brute rankings
    # over the fixed 5-query cohort), datacard (one source-keyed
    # pass), tempered mixture (|sources|-row plan)
    "retrieval_bm25",
    "text_dsir_weights",
    "pack_shard_manifest",
    "retrieval_hybrid_rrf",
    "sim_matryoshka_recall",
    "text_corpus_datacard",
    "text_mixture_temperature",
    # duplicate-aware sampling (one digest-keyed count + map-side
    # draw), CCNet buckets (vocab-bounded LM scoring + per-SCORE
    # span placement — no global sort; boundary-crossing scores
    # alone rank their members)
    "dedup_weighted_sample",
    "text_perplexity_buckets",
    # unigram-LM tokenizer: EM rounds run the Viterbi UDF over
    # DISTINCT WORDS (vocabulary-bounded, like the BPE trainer);
    # encode joins the per-word artifact back via broadcast
    "text_unigram_train",
    "text_unigram_encode",
    # DP count release: one release-key count + a 129-row constant
    # threshold broadcast against CELLS, never data rows
    "versioning_dp_counts",
    # PQ family: training is one job/iteration over the narrow
    # (vec_id, m, subvector) relation; encode is a map-side literal
    # dispatch; ADC joins a constant-size lut onto the codes
    "sim_pq_train",
    "sim_pq_encode",
    "sim_knn_pq_adc",
    # incremental index maintenance: only DELTA docs re-tokenize;
    # the (term, doc)-keyed join touches delta-sized relations
    "retrieval_index_delta",
    # rebalance planning reads the |cells|-row published index, not
    # the corpus; the mean is a 1-row broadcast
    "sim_ivf_rebalance_plan",
    # Zipf fit: term-keyed combine + top-N cut + five bigint sums
    "text_zipf_fit",
    "text_unigram_prune",
    # lang-ID eval: rides lang_id's broadcast-profile scoring +
    # two |langs|-keyed rollups
    "text_langid_metrics",
    # curriculum ordering: map-side shard+quality, one shard-keyed
    # reduce, |shards|-row ranking window
    "pack_curriculum_shards",
    # isotropy = the covariance reduction + a driver-side 64x64 eig
    # (model state); trajectory tracks sim_embedding_covariance
    "sim_embedding_isotropy",
    # NOT listed: sim_ann_recall_audit and sim_ivf_probe_sensitivity
    # — their exact sides score the corpus per query by construction
    # (the operators' docstrings document the sampled-query audit
    # pattern at scale). sim_bitext_mining is the same class: its
    # registered variant scores all src x tgt pairs exactly (the
    # gate-oracle contract), so replication grows it quadratically
    # by construction; the docstring documents the IVF-bucketed
    # candidate composition as the corpus-scale path —
    # the uncapped cell-probed variant (sim_bitext_mining_exact_cells
    # since r9) IS that composition, and probing cuts the scored pair
    # volume by the probe fraction (~4x), but mining pairs BETWEEN
    # two corpus-sized language groups is inherently
    # O(|src| x |tgt| x probe_fraction) without a cell cap: the
    # fixture grows both sides, so full-multiple stress is quadratic
    # by construction for IT (measured 29 s at 3x, r8). The
    # REGISTERED default since r9 is the per-cell-capped variant,
    # which bounds pair volume at |src| x n_probe x CAP — stressed
    # below as sim_bitext_mining.
    # closing round 8: O(log max_len)-output padding audit, one
    # (source, term) shuffle then vocab-bounded KL, map-only
    # winnowing (explode without exchange), IVF-shortlisted integer
    # ADC (candidate-bounded like knn_ivf_quantized), QL ranking
    # (bm25_search's broadcast-term-filter plan), session-riding
    # |types|^2 transition rollup
    "pack_length_buckets",
    "text_source_kl",
    "text_winnowing",
    "sim_knn_ivf_pq",
    "retrieval_query_likelihood",
    "serving_event_transitions",
    # winnowing consumer: df-capped fp buckets bound pair emission
    # (C(WINNOW_DF_CAP, 2) per surviving hash) — the near-dup
    # emission discipline; note replication pushes shared boilerplate
    # hashes ABOVE the cap, so the surviving informative-pair volume
    # can shrink as the corpus grows
    "dedup_winnowing_pairs",
    # map-only per-doc projection: count() prunes the WHOLE entropy
    # computation (no explode/filter depends on it) — measure with
    # SPARK_GRAFT_STRESS_NOOP=1 only
    "text_char_entropy",
    # one purchase-filtered user_id reduce; r10: DISTRIBUTED exact
    # ntile (3 range shuffles + bounded offsets, no single-partition
    # window) on the |users| aggregate
    "serving_rfm_scores",
    # oriented path join over the capped O(n) edge relation; wedges
    # by degree formula — rides the lsh band shuffle
    "graph_triangle_count",
    # map-only regexp projection (noop-measure: count prunes it all)
    "text_readability",
    # one bigram shuffle + vocab-bounded joins + top-K
    "text_pmi_collocations",
    # node-keyed reduce on capped edges -> |degrees|-row histogram
    "graph_degree_stats",
    # 4 synchronous rounds: edges join + vote combine per round
    "graph_label_propagation",
    # session-membership distinct + |types|^2-bounded pair join
    "serving_item_cooccurrence",
    # term-filtered positional postings + (doc,pos) self-join
    # (noop-measure: constant 4-row output is count-prunable)
    "retrieval_phrase_search",
    # KN model train + broadcast scoring (noop-measure: the
    # unique-keyed doc left join is the bigram_lm_score class)
    "text_kn_bigram_score",
    # brute shortlist + k-bounded fixed greedy steps (noop-measure:
    # constant 25-row final join is count-prunable)
    "sim_mmr_rerank",
    # one (month, day, user) distinct + |months|-row join (noop:
    # unique-keyed month join is count-prunable)
    "serving_stickiness",
    # K passes over N rows, 1-row broadcast join each + top-1 picks
    # (noop: the K-row pick stack is count-prunable)
    "sim_coreset_kcenter",
    # digest-keyed chunk buckets, DF-capped pair emission
    "multimodal_chunk_dedup",
    # user-keyed reduce + r10 distributed exact decile (range
    # shuffle + bounded offsets) on the |users| aggregate (noop: the
    # 10-row final is count-prunable)
    "serving_power_users",
    # fixed peel rounds: per-round degree reduce + two semi-joins on
    # the capped edge relation
    "graph_kcore",
    # banded candidate relation x constant threshold fan-out (noop:
    # the fixed 5-row zero-filled curve is count-prunable)
    "dedup_threshold_yield",
    # (doc, term) combine + term-keyed DF reduce + term join +
    # doc reduce — all keyed exchanges
    "text_rare_token_ratio",
    # SemDeDup-bound candidate volume (<= n*CAP), one cell-keyed
    # shuffle, per-vector window over <= CAP rows
    "sim_knn_graph",
    # two linear candidate bounds (cells + buckets), pair-key dedup,
    # one scoring pass
    "sim_knn_graph_multiprobe",
    # quality projection + doc_id join to the O(n) cluster relation
    # (noop: fixed 3-row output is count-prunable)
    "dedup_quality_lift",
    # (day, user) distinct + user-keyed first-seen reduce + day reduce
    "serving_new_vs_returning",
    # probed-cell shortlist + the same k-bounded greedy (noop:
    # constant 25-row final is count-prunable)
    "sim_mmr_rerank_ivf",
    # two user-keyed min reduces + one single-row percentile agg
    # (noop: 1-row final is count-prunable)
    "serving_time_to_convert",
    # seed graph + mid-keyed 2-hop self-join (<= n*k^2 rows) + one
    # scoring pass
    "sim_knn_graph_refine",
    # touched-cell membership semi-join + top-k over touched cells
    # only — update cost tracks the delta batch
    "sim_knn_graph_delta",
    # |vecs| x dims x |labels| scoring rows collapsed map-side;
    # centroid table broadcasts
    "sim_centroid_classifier_eval",
    # two label joins on the k-bounded IVF result + query rollup
    "sim_knn_label_purity",
    # two map-side DECIMAL partials + a 6-group merge (the IVM shape)
    "tpch_q1_incremental",
    # signed partials under deletes (the RF2 shape)
    "tpch_q1_retraction",
    # round 9: per-cell-capped bitext mining — pair volume bounded
    # at |src| x n_probe x CAP (the minhash capped-pairs discipline
    # applied to cross-lingual mining; VERDICT r08 item 2)
    "sim_bitext_mining",
    # round 9: join-bearing IVM — bilinear insert delta and signed
    # deletes THROUGH the customer x orders join
    "tpch_q3_incremental",
    "tpch_q3_retraction",
    # round 9: LPA chain + one pair join + node-keyed degree reduce
    "graph_modularity",
    # round 9: one user_id exchange for all three SCD2 windows
    "versioning_scd2",
    # round 9: seed graph (checkpointed once) + the bounded
    # NN-descent candidate stage + two vec_id rollups
    "sim_knn_graph_convergence",
    # r14: the streaming monitors' replay twins — per-batch cost is
    # one assignment pass + two bounded state transacts (quota) /
    # one histogram fold (quality); state stays k x CAP and
    # |sources| x (GRID+1) rows at any corpus size
    "stream_quota_state_sample",
    "stream_quality_floor_state",
    # r14: Gopher repetition battery — one tagged shingle union into
    # a (doc, n, gram)-keyed count (map-side combine), (doc, n)
    # reduce, doc pivot + slim doc join; all exchanges keyed
    "text_repetition_rules",
    # r14: cluster naming — one (cell, term)-keyed corpus count, then
    # |cells|/|vocab|-bounded broadcasts + per-cell vocab window
    "sim_cluster_topic_terms",
    # r14: maximal duplicated spans — the dup_span_stats skeleton +
    # one per-doc window over the duplicated minority; the
    # replication fixture makes every replicated doc one giant span,
    # so output stays O(docs)
    "dedup_dup_spans",
    # r14: the span CUT — dup_spans + one doc-keyed range anti-join +
    # doc reassembly (noop-measure: the unique-keyed output is
    # count-prunable through the final agg only, so count is honest)
    "dedup_span_rewrite",
    # r14: whitening serve — map-only literal projections after the
    # bounded covariance train (the pca shape; noop-measure to defeat
    # projection pruning)
    "sim_embedding_whiten",
    # r15: URL canonical dedup — map-only regex canonicalization +
    # one canon-keyed combine; the replication fixture shifts doc_id
    # so canonical pages REALLY multiply (no accidental collapse)
    "dedup_url_canonical",
    "dedup_url_host_stats",
    # r15: tokenizer-aware packing — the unigram vocab-trick join +
    # one shard-keyed running window; replicas multiply the doc
    # stream while the distinct-word table stays vocab-bounded
    "pack_unigram_sequences",
    "pack_unigram_efficiency",
    # r15: exact-fill rollover — the piece window + a map-side
    # sequence explode (output = pieces/BUDGET + docs, input-linear)
    "pack_rollover_segments",
    "pack_rollover_fill",
    # r15 capstone: the full funnel -> tokenize -> rollover manifest;
    # v6 composition — the lexical stage rides the capped O(n) LSH
    # cluster relation (the exact chain measured 1392 s of 1450 s at
    # the 100x fixture, tools/decomp_funnel.py, and stays audit-only)
    "pipeline_pretrain_export",
    # r15: keep-best over the capped cluster relation (v6's reps)
    "dedup_lsh_cluster_best",
    # r15: nightly append — batch-only gates (incremental minhash vs
    # the index, floor, repetition, bloom) + one |shards|-row
    # published aggregate; the published export is never repacked
    "pipeline_export_append",
]


def build(spark, repl: int) -> str:
    out = os.path.join(OUT_ROOT, f"r{repl}")
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def load(t):
        from spark_app_twitter_spark.sources.parquet import load_table

        return load_table(spark, SRC, t)

    def reps(df, build_one):
        return [build_one(df, i) for i in range(repl)]

    def write(name, parts):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )

    okey = 10_000_000  # > max l_orderkey at sf0.1
    ckey = 1_000_000
    write(
        "lineitem",
        reps(
            load("lineitem"),
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * okey)
            ),
        ),
    )
    write(
        "orders",
        reps(
            load("orders"),
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * okey)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * ckey)),
        ),
    )
    write(
        "customer",
        reps(
            load("customer"),
            lambda df, i: df.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * ckey)
            ),
        ),
    )
    write(
        "documents",
        reps(
            load("documents"),
            lambda df, i: df.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * ckey)
            ).withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" w{i} x{(i * 7) % 97}")),
            ),
        ),
    )
    write(
        "embeddings",
        reps(
            load("embeddings"),
            lambda df, i: df.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * ckey)
            ),
        ),
    )
    write(
        "events",
        reps(
            load("events"),
            lambda df, i: df.withColumn(
                "event_id", F.col("event_id") + F.lit(i * ckey)
            )
            .withColumn("user_id", F.col("user_id") + F.lit(i * ckey))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} DAY")),
        ),
    )
    for t in ("region", "nation", "supplier", "part"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write("1")
    return out


def main() -> None:
    import __spark_entry__ as ent

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # optional: names after R restrict the run (e.g. the newest
    # families at 100x, where the full sweep would be hours)
    names = sys.argv[2:] or STRESS_QUERIES
    unknown = [n for n in names if n not in STRESS_QUERIES]
    if unknown:
        raise SystemExit(f"not stress queries: {unknown}")
    spark = get_spark("stress", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    sf_dir = build(spark, repl)
    build_s = round(time.perf_counter() - t0, 1)

    qs = ent.queries()
    # warm the kernel families at the original scale
    for warm in ("tpch_q1_pricing_summary", "dedup_minhash_lsh_pairs",
                 "text_lang_id", "sim_knn_quantized"):
        qs[warm](spark, "/root/testdata/sf0.001").count()

    # default measurement is .count() (comparable with every prior
    # round's numbers). count() lets Catalyst PRUNE work that doesn't
    # affect cardinality — notably unique-keyed left joins (join
    # elimination), which makes e.g. bigram_lm_score's scoring branch
    # vanish from the measured plan. SPARK_GRAFT_STRESS_NOOP=1
    # switches to a noop-sink write that materializes every output
    # column — the honest number for such queries; results carry
    # "measure": "noop" so the two modes are never mixed in a table.
    noop = os.environ.get("SPARK_GRAFT_STRESS_NOOP") == "1"

    def run(df) -> int:
        if noop:
            df.write.mode("overwrite").format("noop").save()
            return -1
        return df.count()

    base, scaled = {}, {}
    for name in names:
        t0 = time.perf_counter()
        run(qs[name](spark, SRC))
        base[name] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n = run(qs[name](spark, sf_dir))
        scaled[name] = round(time.perf_counter() - t0, 2)
        print(
            f"  {name}: {base[name]}s -> {scaled[name]}s "
            f"({scaled[name] / max(base[name], 0.01):.1f}x, {n} rows)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": f"stress_{repl}x",
                "replication": repl,
                "build_sec": build_s,
                "base_sec": base,
                "scaled_sec": scaled,
                "measure": "noop" if noop else "count",
                "loadavg": list(os.getloadavg()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
