"""Physical-plan assertions: pushdown, pruning, broadcast, shuffle
discipline — the scale properties SURVEY §7 commits to."""

from spark_app_twitter_spark.operators import (
    aggregates,
    ingest,
    serving,
    similarity,
    tpch,
)
from spark_app_twitter_spark.plans import explain as E


def test_q1_filter_pushed_and_columns_pruned(spark, sf_dir):
    df = tpch.q1_pricing_summary(spark, sf_dir)
    assert E.has_pushed_filter(df, "l_shipdate"), "shipdate filter must reach the scan"
    scans = E.read_schema_columns(df)
    assert scans, "expected a parquet scan"
    read = set(scans[0])
    assert "l_partkey" not in read and "l_orderkey" not in read, (
        f"q1 must not read join keys it never uses: {read}"
    )
    assert {"l_quantity", "l_extendedprice", "l_returnflag"} <= read


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = tpch.q5_local_supplier_volume(spark, sf_dir)
    assert E.has_broadcast_join(df)


def test_parse_events_is_map_only(spark, sf_dir):
    df = ingest.parse_events(spark, sf_dir)
    assert E.num_shuffles(df) == 0, "pure projection must not shuffle"


def test_parse_events_prunes_columns(spark, sf_dir):
    df = ingest.parse_events(spark, sf_dir).select("event_id", "topic")
    scans = E.read_schema_columns(df)
    # user_id/value/props must be pruned when only id+topic are needed
    assert scans and "user_id" not in set(scans[0])


def test_serving_join_broadcasts_aggregate(spark, sf_dir):
    df = aggregates.aggregated_serving(spark, sf_dir)
    assert E.has_broadcast_join(df)


def test_serving_join_single_enrichment_pass(spark, sf_dir):
    """VERDICT r01 item 4: both J1 join sides must read the
    already-materialized single-pass aggregate — the enrichment
    projection and its shuffle ran ONCE (inside the eager
    localCheckpoint), so the join plan contains no parquet scan and
    no enrichment expression at all."""
    df = aggregates.aggregated_serving(spark, sf_dir)
    plan = E.executed_plan(df)
    assert plan.count("Scan ExistingRDD") == 2, (
        "both join branches must read the checkpointed combined aggregate"
    )
    assert "Scan parquet" not in plan, (
        "enrichment must not re-run inside the join plan"
    )


def test_knn_broadcasts_queries(spark, sf_dir):
    df = similarity.knn_bruteforce(spark, sf_dir)
    assert E.has_broadcast_join(df)


def test_hourly_window_single_aggregation_pass(spark, sf_dir):
    df = serving.hourly_window(spark, sf_dir)
    # partial + final hash aggregate around exactly one shuffle
    assert E.num_shuffles(df) == 1
    assert E.executed_plan(df).count("HashAggregate") == 2


def test_topk_uses_take_ordered(spark, sf_dir):
    df = serving.latest_inputs(spark, sf_dir)
    assert "TakeOrderedAndProject" in E.executed_plan(df), (
        "top-k must not materialize a global sort"
    )


def test_datalake_partition_pruning(spark, tmp_path, sf_dir):
    from spark_app_twitter_spark.sources.parquet import read_datalake_hour

    ev = ingest.parse_events(spark, sf_dir).limit(200)
    ev.write.partitionBy("date", "hour").parquet(str(tmp_path / "lake"))
    df = read_datalake_hour(spark, str(tmp_path / "lake"), "2024-01-01", "01")
    plan = E.executed_plan(df)
    assert "PartitionFilters" in plan and "date" in plan

def test_asof_join_has_no_join_operator(spark, sf_dir):
    """The as-of implementation must stay union+window — a range/theta
    join here would explode at scale."""
    from spark_app_twitter_spark.operators import asof

    plan = E.executed_plan(asof.purchases_with_last_click(spark, sf_dir))
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan


def test_approx_percentile_close_to_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) <= max(2.0, 0.05 * abs(r.exact))


def test_q21_existentials_become_semi_and_anti_joins(spark, sf_dir):
    """EXISTS / NOT EXISTS must plan as semi/anti joins on the fact
    key — never a per-row subquery execution."""
    plan = E.executed_plan(tpch.q21_sole_blame_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q16_not_in_subquery_plans_as_anti_join(spark, sf_dir):
    """NOT IN over a subquery must become a (null-aware) anti join."""
    plan = E.executed_plan(tpch.q16_supplier_part_stats(spark, sf_dir))
    assert "LeftAnti" in plan
    assert E.has_pushed_filter(
        tpch.q16_supplier_part_stats(spark, sf_dir), "p_size"
    ), "IN-list size filter must reach the part scan"


def test_q9_like_filter_pushed(spark, sf_dir):
    assert E.has_pushed_filter(
        tpch.q9_product_profit(spark, sf_dir), "widget"
    ), "LIKE '%widget%' must push as a Contains filter"


def test_q17_single_final_aggregation_shuffle(spark, sf_dir):
    """The decorrelated per-part average must reuse broadcast, leaving
    one shuffle (its own groupBy) at this size."""
    df = tpch.q17_small_quantity_revenue(spark, sf_dir)
    assert E.num_shuffles(df) <= 2
    assert E.has_broadcast_join(df)


def test_rag_retrieve_no_cartesian_single_query_shuffle(spark, sf_dir):
    """VERDICT r02 item 9: the RAG capstone must stay ANN-shaped —
    query side broadcast (no cartesian), one shuffle keyed on
    query_id for the top-k window."""
    from spark_app_twitter_spark.operators import retrieval

    df = retrieval.rag_retrieve(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert E.has_broadcast_join(df), "query side must broadcast"
    assert E.num_shuffles(df) == 1
    assert plan.count("Exchange hashpartitioning(query_id") == 1


def test_session_paths_single_user_shuffle(spark, sf_dir):
    """Sessionization + path build must reuse ONE user_id shuffle
    (windows and the session group share it); the only other
    exchange is the tiny path count."""
    from spark_app_twitter_spark.operators import serving as sv

    df = sv.session_paths(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, (
        "windows + session aggregation must share one user_id shuffle"
    )
    assert E.num_shuffles(df) == 2  # user_id + final path count


def test_sem_dedup_cell_bucketed_join(spark, sf_dir):
    """SemDeDup's pair scan must be an equi-join bucketed on the
    k-means cell — never an all-pairs product."""
    from spark_app_twitter_spark.operators import semdedup

    df = semdedup.semdedup(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # The pair scan must be an EQUI-join keyed on cell; the physical
    # strategy is Spark's call — broadcast-hash at test scale (the
    # checkpointed assigned relation is tiny), shuffle on the cell key
    # once stats exceed the broadcast threshold.
    assert (
        "BroadcastHashJoin [cell" in plan
        or plan.count("Exchange hashpartitioning(cell") == 2
    ), "pair scan must equi-join on the cell key"


def test_quality_rules_is_map_only(spark, sf_dir):
    """The rule battery is per-row array math — no shuffle beyond the
    deliberate spread repartition for single-row-group inputs."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.quality_rules(spark, sf_dir)
    plan = E.executed_plan(df)
    assert E.num_shuffles(df) <= 1  # only the spread RoundRobin
    assert "hashpartitioning" not in plan, (
        "no keyed shuffle belongs in a pure projection"
    )


def test_common_ngrams_topk_never_global_sorts(spark, sf_dir):
    """Top-k by doc frequency must be TakeOrderedAndProject over a
    partially-aggregated relation — a global Sort would materialize
    every distinct gram on one node at corpus scale."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.common_ngrams(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan, "top-k must not global-sort"
    assert plan.count("HashAggregate") >= 2, (
        "gram counting must partial-aggregate map-side"
    )


def test_ivf_candidate_assignment_shuffle_free(spark, sf_dir):
    """The data-sized candidate side of knn_ivf must carry NO window
    shuffle: inline literal argmax scoring, with the only exchanges
    belonging to the tiny probe-side window and the final top-k."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.knn_ivf(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    # neighbor_id-keyed window == the old per-candidate shuffle shape
    assert "hashpartitioning(neighbor_id" not in plan, (
        "candidate cell assignment must not shuffle on neighbor_id"
    )


def test_dup_span_stats_bucketed_not_pairwise(spark, sf_dir):
    """The exact-substring signal must stay count-and-join shaped:
    window hashes partial-aggregate map-side, membership is an
    equi-join on the hash — never any pairwise product."""
    from spark_app_twitter_spark.operators import dedup

    df = dedup.dup_span_stats(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2, (
        "window-hash counting must partial-aggregate map-side"
    )


def test_bigram_lm_model_join_broadcasts(spark, sf_dir):
    """Scoring must hash-join the (small) model side broadcast; the
    only nested-loop is the deliberate 1-row vocab-size scalar."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.bigram_lm_score(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert E.has_broadcast_join(df), "model must broadcast into scoring"
    # the 1-row vocab scalar may appear as a broadcast nested loop —
    # anything larger must not
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_weighted_sample_single_source_shuffle(spark, sf_dir):
    """Draws are built per-row JVM-side (no explode/join); the only
    keyed shuffle is the per-source ranking window."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.weighted_sample(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, "weighted sampling needs no join at all"
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert E.num_shuffles(df) <= 2  # spread RoundRobin + source window


def test_embedding_covariance_partials_collapse(spark, sf_dir):
    """The pair aggregation must partial-aggregate (each partition
    collapses to <= d(d+1)/2 rows pre-shuffle); mean sums join
    broadcast; nothing pairwise-joins the data."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.embedding_covariance(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert E.has_broadcast_join(df), "per-dim mean sums must broadcast"
    assert plan.count("HashAggregate") >= 2, (
        "pair products must partial-aggregate before the shuffle"
    )


def test_keyless_range_join_is_bucketed_equi(spark, sf_dir):
    """The keyless +-60s range join must plan as an EQUI join on the
    manufactured bucket key — never a cartesian/nested-loop product.
    Probe-side explode appears as a Generate of the 3-bucket array."""
    from spark_app_twitter_spark.operators import asof

    df = asof.clicks_near_errors(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan, "probe side must explode buckets"
    assert "bucket" in plan


def test_pca_projection_is_map_only_after_training(spark, sf_dir):
    """Trained axes are broadcast LITERALS: the projection itself must
    be a shuffle-free scan -> project pipeline (only the RoundRobin
    scan-spread is allowed)."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.embedding_pca_project(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "Join" not in plan, "projection must not join"
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange rangepartitioning") == 0


def test_bpe_encode_folds_run_on_vocabulary(spark, sf_dir):
    """The merge folds must execute over the DISTINCT-word relation:
    the plan joins words back to docs (one equi join), with no
    cartesian and no per-corpus-token fold."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.bpe_encode(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or (
        "ShuffledHashJoin" in plan
    )


def test_lr_training_iteration_is_dim_bounded(spark, sf_dir):
    """One GD iteration's gradient job: the aggregate keys on dim, so
    partial aggregation collapses every partition to <= |dims| rows
    before the shuffle, and nothing joins."""
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.operators import training
    from spark_app_twitter_spark.sources.parquet import load_table

    feats = training._doc_features(
        load_table(spark, sf_dir, "documents")
    )
    pq = training._sigmoid_q(F.lit(0.0))
    contrib = feats.withColumn("pq", pq).select(
        F.posexplode("fq").alias("dim", "fj"),
        (F.col("pq") - F.col("y") * training._Q_F).alias("err"),
    )
    grad = contrib.groupBy("dim").agg(
        F.sum((F.col("err") * F.col("fj")).cast("decimal(38,0)")).alias("g")
    )
    plan = E.executed_plan(grad)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2, "must partial-aggregate"
    assert E.num_shuffles(grad) == 1


def test_salted_totals_two_phase_shape(spark, sf_dir):
    """The salted aggregation must shuffle twice — once on
    (event_type, _salt), once on event_type — with partial
    aggregation before each, and never join."""
    from spark_app_twitter_spark.operators import aggregates

    df = aggregates.salted_event_totals(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "Join" not in plan
    assert "_salt" in plan, "phase-1 grouping must include the salt"
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("HashAggregate") >= 4  # partial+final per phase


def test_nearest_click_single_shuffle_no_range_join(spark, sf_dir):
    """The bidirectional nearest join must be the union+window shape:
    one hash shuffle on user_id feeding two sorted window passes —
    never a per-user range/nested-loop product."""
    from spark_app_twitter_spark.operators import asof

    df = asof.nearest_click_to_purchase(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, (
        "expected the union shuffle (+ the click-dedup agg) only"
    )


def test_inverted_index_caps_inside_aggregation(spark, sf_dir):
    """Posting lists are capped by the pre-aggregation rank filter:
    the plan carries the row_number window BEFORE the final
    aggregate, and all exchanges are keyed (no global sort)."""
    from spark_app_twitter_spark.operators import retrieval

    df = retrieval.build_inverted_index(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_delta_is_single_join_of_fingerprints(spark, sf_dir):
    """Snapshot diff: two fingerprint projections into ONE
    co-partitioned full-outer join — text never travels past md5."""
    from spark_app_twitter_spark.operators import versioning

    # r16: corpus_delta serves a session-shared checkpointed relation;
    # the gated plan shape is the BUILD body's.
    df = versioning._corpus_delta_build(spark, sf_dir)
    plan = E.executed_plan(df)
    assert plan.count("SortMergeJoin FullOuter") == 1 or (
        "FullOuter" in plan
    )
    assert "CartesianProduct" not in plan


def test_mixture_plan_totals_from_tiny_relation(spark, sf_dir):
    """Grand totals must aggregate the |sources| relation, not rescan
    the corpus: exactly one parquet scan in the plan."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.mixture_plan(spark, sf_dir)
    plan = E.executed_plan(df)
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_paragraph_dedup_single_digest_shuffle_no_pairs(spark, sf_dir):
    """Segment dedup is the exact-dedup discipline one level down:
    digest-keyed window + doc rollup, never a pairwise join."""
    from spark_app_twitter_spark.operators import dedup

    df = dedup.paragraph_dedup(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, "dedup must not join anything"
    assert plan.count("Exchange hashpartitioning") == 2, (
        "one shuffle on digest (window), one on the doc rollup"
    )


def test_cms_sketch_broadcast_and_partial_agg(spark, sf_dir):
    """The 2048-cell sketch must reach the estimate join as a
    broadcast, and the cell aggregation must map-side combine
    (partial_count before the exchange)."""
    from spark_app_twitter_spark.operators import sketches

    df = sketches.cms_top_terms(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "BroadcastHashJoin" in plan, "sketch join must broadcast"
    # r16: cells aggregate the vocabulary-bounded per-term counts
    # weighted by n_exact (partial_sum) instead of counting raw
    # occurrence x j rows (partial_count) — the map-side combine
    # requirement is the same either way
    assert "partial_sum" in plan or "partial_count" in plan, (
        "cell counts must combine map-side"
    )
    assert "CartesianProduct" not in plan


def test_compaction_plan_windows_per_source(spark, sf_dir):
    """The running-sum window must partition by source — a global
    (unpartitioned) window would serialize the listing."""
    from spark_app_twitter_spark.sources import bucketing

    df = bucketing.compaction_plan(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    # a keyless window emits 'Exchange SinglePartition' feeding Window
    import re

    win_idx = plan.find("Window")
    assert win_idx != -1
    assert not re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*Window", plan), (
        "window must not collapse to a single partition"
    )


def test_key_skew_report_broadcasts_totals(spark, sf_dir):
    """The 1-row totals aggregate rides a broadcast nested-loop over
    the per-key counts; the only hash exchange is the key count."""
    from spark_app_twitter_spark.operators import aggregates

    df = aggregates.key_skew_report(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rag_retrieve_ivf_no_cartesian(spark, sf_dir):
    """The IVF-backed retrieval must keep stage 1's bounded shape:
    no cartesian anywhere, payload join on the k-per-query hit set."""
    from spark_app_twitter_spark.operators import retrieval

    df = retrieval.rag_retrieve_ivf(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan


def test_semdedup_2level_no_cartesian_cell_keyed(spark, sf_dir):
    """The two-level pairwise stage must stay a cell-keyed equi-join
    (the linear-bound cap discipline) — no cartesian anywhere."""
    from spark_app_twitter_spark.operators import semdedup

    df = semdedup.semdedup_2level(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan


def test_cluster_best_quality_is_single_scan_projection(spark, sf_dir):
    """Keep-best adds ONE documents scan (the quality projection) on
    top of the CC labels; the argmax is a cluster-keyed window, not
    a join against a sorted global ranking."""
    from spark_app_twitter_spark.operators import dedup

    df = dedup.cluster_best_representatives(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan, (
        "no global sort — the ranking is per-cluster"
    )


# --------------------------------------------------------------- round 7


def test_ivf_quantized_candidate_side_shuffle_free(spark, sf_dir):
    """The IVF+int8 composition keeps the same data-side discipline
    as knn_ivf: no cartesian product, no per-candidate window
    shuffle; the only windows are the per-query-bounded pre-rank and
    rerank (partitioned on query_id over the probed candidate set)."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.knn_ivf_quantized(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(neighbor_id" not in plan, (
        "candidate cell assignment must not shuffle on neighbor_id"
    )


def test_contrastive_pairs_windows_only_over_ann_result(spark, sf_dir):
    """Pair mining must do no corpus-sized pairwise work of its own —
    no cartesian beyond the ANN stage's broadcast loop, and every
    window keyed on query_id (the k-rows-per-query frame)."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.contrastive_pairs(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(neighbor_id" not in plan


def test_split_leakage_no_new_pairwise_stage(spark, sf_dir):
    """The leakage audit adds only maps and |splits|-row rollups on
    top of the LSH pair set: no cartesian, no broadcast nested loop."""
    from spark_app_twitter_spark.operators import dedup

    df = dedup.split_leakage(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_default_bitext_registration_is_capped_ivf(spark, sf_dir):
    """VERDICT r07 item 2 + r08 item 2: the registry's default
    ``sim_bitext_mining`` must be the CAPPED fixed-probe scale path —
    no corpus-sized broadcast cross join anywhere in its plan. The
    uncapped cell-probed variant stays available only under
    ``sim_bitext_mining_exact_cells``, the all-pairs one under
    ``sim_bitext_mining_exact``."""
    import __spark_entry__ as entry
    from spark_app_twitter_spark.operators import similarity

    q = entry.queries()
    assert q["sim_bitext_mining"] is similarity.bitext_mining_capped
    assert (
        q["sim_bitext_mining_exact_cells"] is similarity.bitext_mining_ivf
    )
    assert q["sim_bitext_mining_exact"] is similarity.bitext_mining
    assert (
        entry.oracle_sql()["sim_bitext_mining"]
        == similarity.BITEXT_MINING_CAPPED_SQL
    )
    plan = E.executed_plan(q["sim_bitext_mining"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bitext_family_plan_width(spark, sf_dir):
    """VERDICT r12 item 2: the bitext margin stage checkpoints its
    3-consumer ranked relation, so the capped default's plan must
    stay narrow (was 18 shuffles / 30 scans when every margin branch
    re-derived the IVF candidate pipeline). Same ceiling discipline
    for the probe-sensitivity curve (was 17/38) and the CDC-composed
    index delta (was 13/12)."""
    from spark_app_twitter_spark.operators import retrieval, similarity

    df = similarity.bitext_mining_capped(spark, sf_dir)
    assert E.num_shuffles(df) <= 6
    df = similarity.bitext_probe_sensitivity(spark, sf_dir)
    assert E.num_shuffles(df) <= 10
    df = retrieval.index_delta(spark, sf_dir)
    assert E.num_shuffles(df) <= 7


def test_lsh_clusters_capped_and_bucket_joined(spark, sf_dir):
    """The O(n) cluster chain must stay bucket-joined: no cartesian,
    no broadcast nested loop, and the candidate join keyed on the
    (band, bh) bucket exactly like the exact pair relation."""
    from spark_app_twitter_spark.operators import dedup

    plan = E.executed_plan(dedup.lsh_clusters(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------- round 8 continuation


def test_coreset_kcenter_zero_data_shuffle(spark, sf_dir):
    """Farthest-point traversal must never shuffle the data side:
    every round is a 1-row broadcast join (map-side min-dist update)
    plus a distributed top-1, and the per-round checkpoints truncate
    to a plan with NO exchanges at all."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.coreset_kcenter(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert E.num_shuffles(df) == 0


def test_chunk_dedup_digest_keyed_no_allpairs(spark, sf_dir):
    """Chunk dedup is the exact-dedup discipline: every exchange is
    keyed on the digest or the media id — no cartesian, no broadcast
    nested loop, no corpus-pairwise stage."""
    from spark_app_twitter_spark.operators import multimodal

    df = multimodal.chunk_dedup(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(digest" in plan


def test_kcore_rounds_checkpointed_single_live_exchange(spark, sf_dir):
    """Per-round localCheckpoint must truncate the peel lineage: the
    final composed plan carries only the last degree reduce (one
    src-keyed exchange), not the whole round chain."""
    from spark_app_twitter_spark.operators import graph

    df = graph.kcore(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert E.num_shuffles(df) == 1
    assert "hashpartitioning(src" in plan


def test_power_users_reduces_on_user_before_windows(spark, sf_dir):
    """The decile table aggregates events user_id-keyed FIRST; the
    ntile/cumulative windows and the grand-total broadcast run on the
    |users|-sized (then 10-row) aggregates only."""
    from spark_app_twitter_spark.operators import serving

    df = serving.power_users(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan


def test_knn_graph_cell_keyed_and_vector_windowed(spark, sf_dir):
    """The kNN graph's only exchanges are the cell-keyed candidate
    join and the per-vector (<= CAP rows) top-k window — never a
    cartesian or an unkeyed pairwise stage."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.knn_graph(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(cell" in plan
    assert "hashpartitioning(vec_id" in plan


def test_mmr_greedy_is_one_cogroup_pass(spark, sf_dir):
    """The MMR greedy runs per-query inside ONE cogrouped
    applyInPandas task: the whole rerank plan carries O(1) exchanges
    (shortlist + pairs hashing to query_id), not one exchange pair
    per greedy step (the former 300+-exchange relational chain whose
    planning cost dominated the bench — VERDICT r08 item 3)."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.mmr_rerank(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "FlatMapCoGroupsInPandas" in plan
    assert E.num_shuffles(df) <= 4, (
        f"greedy must not re-shuffle per step: {E.num_shuffles(df)}"
    )


def test_rfm_and_power_users_have_no_unpartitioned_window(spark, sf_dir):
    """The r10 contract: the CRM quintiles and the Lorenz deciles run
    the DISTRIBUTED exact ntile (repartitionByRange + bounded offsets
    + partition-local windows) — no partition-less WindowExec (a
    single-partition sort of the |users| aggregate) anywhere."""
    for fn in (serving.rfm_scores, serving.power_users):
        df = fn(spark, sf_dir)
        wins = E.unpartitioned_windows(df)
        assert not wins, f"{fn.__name__}: {wins}"


def test_perplexity_buckets_has_no_unpartitioned_window(spark, sf_dir):
    """The CCNet tercile's cumulative span over distinct lm_scores is
    the distributed running total since r10 — distinct scores can
    approach |docs| on real corpora, so no single-partition window."""
    from spark_app_twitter_spark.operators import textstats

    wins = E.unpartitioned_windows(textstats.perplexity_buckets(spark, sf_dir))
    assert not wins, wins


def test_zipf_and_vocab_rank_after_take_ordered(spark, sf_dir):
    """zipf_fit / vocab_coverage cut top-N with orderBy().limit
    (TakeOrderedAndProject) BEFORE ranking: the vocabulary never
    totally sorts; the surviving global window sees <= N constant
    rows (the GLOBAL_WINDOW_OK allowlist bound)."""
    from spark_app_twitter_spark.operators import textstats

    for fn, bound in (
        (textstats.zipf_fit, textstats.ZIPF_TOP_N),
        (textstats.vocab_coverage, max(textstats.VOCAB_COVERAGE_SIZES)),
    ):
        df = fn(spark, sf_dir)
        plan = E.executed_plan(df)
        assert "TakeOrderedAndProject" in plan, f"{fn.__name__}: no top-N cut"
        assert len(E.unpartitioned_windows(df)) <= 1


def test_cluster_balanced_sample_quota_pushdown_and_bounded_sizes(
    spark, sf_dir
):
    """The quota pick pushes the rank filter below the cell exchange
    (WindowGroupLimit: each map task forwards <= CAP rows per cell),
    the window stays cell-partitioned, and the cell_size join
    broadcasts the k-row count relation."""
    from spark_app_twitter_spark.operators import clustering

    df = clustering.cluster_balanced_sample(spark, sf_dir)
    plan = E.executed_plan(df)
    assert "WindowGroupLimit" in plan
    assert not E.unpartitioned_windows(df)
    assert "BroadcastExchange" in plan


def test_retrieval_shared_relations_checkpointed_once(spark, sf_dir):
    """The late-r12 plan-width cut stays cut: the bm25 core and the
    query-likelihood ranker localCheckpoint their shared bounded
    relations, so one action scans the corpus at most a handful of
    times instead of re-deriving the explode per consumer branch
    (query_likelihood was 25 shuffles / 22 scans before)."""
    from spark_app_twitter_spark.operators import retrieval

    for fn, max_shuffles, max_scans in (
        (retrieval.query_likelihood, 9, 4),
        (retrieval.bm25_retrieve, 7, 4),
        (retrieval.hybrid_rrf, 11, 8),
    ):
        df = fn(spark, sf_dir)
        plan = E.executed_plan(df)
        n_sh = E.num_shuffles(df)
        n_sc = plan.count("Scan parquet") + plan.count("FileScan")
        assert n_sh <= max_shuffles, (fn.__name__, n_sh)
        assert n_sc <= max_scans, (fn.__name__, n_sc)


# --------------------------------------------------------------- round 14


def test_r14_new_ops_plan_width(spark, sf_dir, tmp_path):
    """The r14 additions keep their checkpointed multi-consumer
    relations: topic terms materialize the (cell, term) count once
    (was 11 shuffles / 16 scans when cc/tt/tot/scored each re-ran the
    corpus explode), the repetition battery stays a single tagged
    union (no per-n re-aggregation), and the quality-floor serving
    read checkpoints the merged histogram (was 12 shuffles / 12 state
    scans)."""
    from spark_app_twitter_spark.operators import clustering, textstats
    from spark_app_twitter_spark.streaming.qualitymon import (
        apply_quality_batch,
        quality_floor_from_state,
    )
    from spark_app_twitter_spark.sources.parquet import load_table

    df = clustering.cluster_topic_terms(spark, sf_dir)
    assert E.num_shuffles(df) <= 5
    plan = E.executed_plan(df)
    assert plan.count("Scan parquet") + plan.count("FileScan") == 0

    df = textstats.repetition_rules(spark, sf_dir)
    assert E.num_shuffles(df) <= 8
    assert "CartesianProduct" not in E.executed_plan(df)

    path = f"{tmp_path}/qstate"
    apply_quality_batch(load_table(spark, sf_dir, "documents"), 0, path)
    df = quality_floor_from_state(spark, path)
    assert E.num_shuffles(df) <= 7
    plan = E.executed_plan(df)
    assert plan.count("Scan parquet") + plan.count("FileScan") == 0


def test_collect_linter_green_on_tree():
    """Mechanical close-gate guard (VERDICT r14 item 2): the
    no-unbounded-collects linter must be green on the committed tree —
    zero unlisted collect sites AND zero stale allowlist keys, so a
    rename (the _pca_components -> _pca_axes slip) can't silently
    re-redden it after a manual 'lint clean' check."""
    import importlib.util
    import io
    import os
    from contextlib import redirect_stdout

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "lint_collects", os.path.join(root, "tools", "lint_collects.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sites = mod._sites()
    found = {(rel, fn) for rel, fn, _ in sites}
    assert sorted(found - set(mod.ALLOWED)) == [], "unlisted collect site"
    assert sorted(set(mod.ALLOWED) - found) == [], "stale allowlist entry"
