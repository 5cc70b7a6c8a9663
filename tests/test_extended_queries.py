"""Parity tests for the extended query surface: sessionization,
distinct counts, grand means, normalized shares, TPC-H q6/anti-join/
promo-share — plus session-window consistency and property checks."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spark_app_twitter_spark.operators import aggregates, enrich, serving, tpch
from spark_app_twitter_spark.sources.parquet import load_table

from tests.parity import assert_parity


def test_topic_means(spark, sf_dir):
    assert_parity(
        serving.topic_means(spark, sf_dir), serving.TOPIC_MEANS_SQL, sf_dir, "means"
    )


def test_distinct_users(spark, sf_dir):
    assert_parity(
        serving.distinct_users(spark, sf_dir),
        serving.DISTINCT_USERS_SQL,
        sf_dir,
        "distinct",
    )


def test_sessionize(spark, sf_dir):
    assert_parity(
        serving.sessionize(spark, sf_dir), serving.SESSIONIZE_SQL, sf_dir, "sessions"
    )


def test_sessionize_agrees_with_session_window(spark, sf_dir):
    """lag-cumsum sessionization and Spark's built-in session_window
    must produce the same number of sessions per user."""
    ours = (
        serving.sessionize(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ev = load_table(spark, sf_dir, "events")
    builtin = (
        ev.groupBy(
            F.session_window("ts", f"{serving.SESSION_GAP_SECONDS} seconds"),
            "user_id",
        )
        .agg(F.count(F.lit(1)))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    diff = ours.join(builtin, "user_id", "full").where(
        ours.n.eqNullSafe(builtin.n) == False  # noqa: E712
    )
    assert diff.count() == 0


def test_emotion_share(spark, sf_dir):
    enriched = enrich.enrich(load_table(spark, sf_dir, "documents"))
    assert_parity(
        aggregates.emotion_share_normalized(enriched),
        aggregates.EMOTION_SHARE_SQL,
        sf_dir,
        "emotion_share",
    )


def test_q6(spark, sf_dir):
    assert_parity(tpch.q6_forecast_revenue(spark, sf_dir), tpch.Q6_SQL, sf_dir, "q6")


def test_customers_without_orders(spark, sf_dir):
    assert_parity(
        tpch.customers_without_orders(spark, sf_dir),
        tpch.CUSTOMERS_WITHOUT_ORDERS_SQL,
        sf_dir,
        "anti",
    )


def test_promo_share(spark, sf_dir):
    assert_parity(
        tpch.promo_revenue_share(spark, sf_dir),
        tpch.PROMO_REVENUE_SHARE_SQL,
        sf_dir,
        "promo",
    )


# ---------------------------------------------------------------------------
# Property-based invariants (SURVEY §5.4)
# ---------------------------------------------------------------------------
def test_positivity_rate_bounded(spark, sf_dir):
    enriched = enrich.enrich(load_table(spark, sf_dir, "documents"))
    rows = aggregates.positivity_agg(enriched).collect()
    assert rows and all(0.0 <= r.positivity_rate <= 1.0 for r in rows)


def test_pivot_row_sums_equal_counts(spark, sf_dir):
    from spark_app_twitter_spark.schemas import EMOTIONS

    enriched = enrich.enrich(load_table(spark, sf_dir, "documents"))
    wide = aggregates.emotion_pivot(enriched).collect()
    base = {
        r.topic_agg: r.counts
        for r in aggregates.positivity_agg(enriched).collect()
    }
    for r in wide:
        assert sum(r[e] for e in EMOTIONS) == base[r.topic]


def test_shares_sum_to_one(spark, sf_dir):
    rows = serving.topic_share(spark, sf_dir).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
def test_unpivot_of_pivot_roundtrip(spark, rows):
    """pivot -> unpivot returns exactly the original (key, val) counts."""
    df = spark.createDataFrame(rows, "k string, v int")
    vals = list(range(6))
    wide = df.groupBy("k").pivot("v", vals).count().na.fill(0)
    stack_args = ", ".join(f"'{v}', `{v}`" for v in vals)
    long = wide.select(
        "k", F.expr(f"stack(6, {stack_args}) AS (v, cnt)")
    ).where(F.col("cnt") > 0)
    got = {(r.k, int(r.v)): r.cnt for r in long.collect()}
    import collections

    want = collections.Counter(rows)
    assert got == {k: c for k, c in want.items()}


def test_rollup_value(spark, sf_dir):
    assert_parity(
        serving.rollup_value(spark, sf_dir),
        serving.ROLLUP_VALUE_SQL,
        sf_dir,
        "rollup",
    )


def test_loyal_purchasers(spark, sf_dir):
    assert_parity(
        serving.loyal_purchasers(spark, sf_dir),
        serving.LOYAL_PURCHASERS_SQL,
        sf_dir,
        "setops",
    )


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    """The 100 TB path for distinct counts: HLL sketch within 5% of
    exact (not oracle-checked — approx is engine-specific)."""
    from spark_app_twitter_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact)


def test_asof_join_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import asof

    assert_parity(
        asof.purchases_with_last_click(spark, sf_dir),
        asof.PURCHASES_WITH_LAST_CLICK_SQL,
        sf_dir,
        "asof",
    )


def test_range_join_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import asof

    assert_parity(
        asof.errors_near_purchases(spark, sf_dir),
        asof.ERRORS_NEAR_PURCHASES_SQL,
        sf_dir,
        "range",
    )


def test_asof_join_generic_semantics(spark):
    """Hand-built case: inclusive as-of, per-key isolation, no-match -> null."""
    from spark_app_twitter_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "L1"), ("u1", 20, "L2"), ("u2", 5, "L3")],
        "k string, ts long, lv string",
    )
    right = spark.createDataFrame(
        [("u1", 10, "R10"), ("u1", 15, "R15"), ("u2", 9, "R9")],
        "k string, ts long, rv string",
    )
    got = {
        r.lv: r.r_rv
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    # L1@10 matches R10 (inclusive); L2@20 matches R15; L3@5 has no prior right
    assert got == {"L1": "R10", "L2": "R15", "L3": None}


def test_moving_avg_daily(spark, sf_dir):
    assert_parity(
        serving.moving_avg_daily(spark, sf_dir),
        serving.MOVING_AVG_DAILY_SQL,
        sf_dir,
        "ma7",
    )


def test_value_quartiles(spark, sf_dir):
    assert_parity(
        serving.value_quartile_assignments(spark, sf_dir),
        serving.VALUE_QUARTILE_ASSIGNMENTS_SQL,
        sf_dir,
        "ntile",
    )


def test_value_histogram(spark, sf_dir):
    assert_parity(
        serving.value_histogram(spark, sf_dir),
        serving.VALUE_HISTOGRAM_SQL,
        sf_dir,
        "hist",
    )


def test_cumulative_daily(spark, sf_dir):
    assert_parity(
        serving.cumulative_daily_counts(spark, sf_dir),
        serving.CUMULATIVE_DAILY_COUNTS_SQL,
        sf_dir,
        "cum",
    )


def test_signup_purchase_funnel(spark, sf_dir):
    assert_parity(
        serving.signup_purchase_funnel(spark, sf_dir),
        serving.SIGNUP_PURCHASE_FUNNEL_SQL,
        sf_dir,
        "conv_funnel",
    )


def test_keyless_range_join_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import asof

    assert_parity(
        asof.clicks_near_errors(spark, sf_dir),
        asof.CLICKS_NEAR_ERRORS_SQL,
        sf_dir,
        "keyless_range",
    )


def test_keyless_range_join_bucketing_is_lossless(spark, sf_dir):
    """The 3-bucket explode must find exactly the pairs a naive
    (cartesian+filter) range join finds, including radius-boundary
    hits — the blocking is a plan optimization, not an approximation."""
    from spark_app_twitter_spark.operators import asof
    from spark_app_twitter_spark.functions.timeutil import epoch_us

    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), epoch_us("ts").alias("e_us")
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), epoch_us("ts").alias("c_us")
    )
    naive = (
        err.crossJoin(clk)
        .where(F.abs(F.col("c_us") - F.col("e_us")) <= asof.BURST_RADIUS_US)
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).alias("n_nearby_clicks"),
            F.countDistinct("c_user").alias("n_nearby_users"),
        )
    )
    bucketed = {
        r.error_id: (r.n_nearby_clicks, r.n_nearby_users)
        for r in asof.clicks_near_errors(spark, sf_dir).collect()
    }
    for r in naive.collect():
        assert bucketed[r.error_id] == (r.n_nearby_clicks, r.n_nearby_users)


def test_session_window_stats_parity(spark, sf_dir):
    assert_parity(
        serving.session_window_stats(spark, sf_dir),
        serving.SESSION_WINDOW_STATS_SQL,
        sf_dir,
        "session_window_stats",
    )


def test_salted_event_totals_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import aggregates

    assert_parity(
        aggregates.salted_event_totals(spark, sf_dir),
        aggregates.SALTED_EVENT_TOTALS_SQL,
        sf_dir,
        "salted_totals",
    )


def test_hourly_gapfill_parity(spark, sf_dir):
    assert_parity(
        serving.hourly_gapfill(spark, sf_dir),
        serving.HOURLY_GAPFILL_SQL,
        sf_dir,
        "hourly_gapfill",
    )


def test_hourly_gapfill_is_dense_grid(spark, sf_dir):
    """Every (hour, type) cell exists exactly once between the corpus
    bounds, and ffill never leaves a null after the first observation."""
    rows = serving.hourly_gapfill(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_hours = {t: len(v) for t, v in by_type.items()}
    assert len(set(n_hours.values())) == 1, "all types share the spine"
    for t, v in by_type.items():
        v.sort(key=lambda r: r.hour)
        seen = False
        for r in v:
            if r.avg_value_ffill is not None:
                seen = True
            elif seen:
                raise AssertionError(f"null after first obs: {t} {r.hour}")


def test_session_window_exact_gap_merges(spark):
    """Regression for the boundary rule (caught in round-5 review):
    two events EXACTLY gap apart must land in ONE session — for the
    built-in session_window, the lag-cumsum recipe, and the oracle's
    > rule alike."""
    import datetime

    from spark_app_twitter_spark.operators.serving import (
        SESSION_GAP_SECONDS,
        _with_session_idx,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 1, t0),
            (2, 1, t0 + datetime.timedelta(seconds=SESSION_GAP_SECONDS)),
            (3, 1, t0 + datetime.timedelta(seconds=2 * SESSION_GAP_SECONDS + 1)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    builtin = (
        df.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
            "user_id",
        )
        .count()
        .count()
    )
    assert builtin == 2, "exact gap must MERGE; gap+1s must split"
    lagcum = (
        _with_session_idx(df).select("sess_idx").distinct().count()
    )
    assert lagcum == 2


# --------------------------------------------------------------- round 6


def test_inverted_index_parity_and_cap(spark, sf_dir):
    """Posting lists match the SQL twin; df is exact and postings
    are sorted, unique, and capped."""
    from spark_app_twitter_spark.operators import retrieval

    df = retrieval.build_inverted_index(spark, sf_dir)
    assert_parity(
        df, retrieval.BUILD_INVERTED_INDEX_SQL, sf_dir, "inverted_index"
    )
    for r in df.collect():
        p = list(r.postings)
        assert p == sorted(set(p))
        assert len(p) == min(r.df, retrieval.POSTING_CAP)
    # the REGISTERED (gate-facing) variant serializes postings to a
    # scalar csv column — the driver canonicalizer cannot sort array
    # columns (r06 red row); its twin must match too
    assert_parity(
        retrieval.inverted_index(spark, sf_dir),
        retrieval.INVERTED_INDEX_SQL,
        sf_dir,
        "inverted_index_csv",
    )


def test_nearest_click_parity_and_nearest_property(spark, sf_dir):
    """Window-pass nearest-neighbor join matches the per-purchase
    argmin oracle, and no other click of the same user is closer
    than the one chosen (spot-checked via the naive join)."""
    from spark_app_twitter_spark.operators import asof

    out = asof.nearest_click_to_purchase(spark, sf_dir)
    assert_parity(
        out, asof.NEAREST_CLICK_TO_PURCHASE_SQL, sf_dir, "nearest_click"
    )
    got = {r.event_id: r.gap_seconds for r in out.collect()}
    assert got, "fixture has purchases"
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    from spark_app_twitter_spark.functions.timeutil import epoch_us

    best = (
        purchases.join(clicks, "user_id")
        .groupBy("event_id")
        .agg(
            F.min(F.abs(epoch_us("cts") - epoch_us("ts"))).alias("d_us")
        )
    )
    for r in best.collect():
        # gap_seconds is rounded to ms; compare within half an ms
        assert abs(abs(got[r.event_id]) * 1_000_000 - r.d_us) <= 500, (
            r.event_id
        )


def test_corpus_delta_parity_and_statuses(spark, sf_dir):
    """Snapshot diff matches the SQL twin and classifies the derived
    add/remove/change moduli correctly (a doc hit by several rules
    resolves in added > removed > changed priority)."""
    from spark_app_twitter_spark.operators import versioning

    df = versioning.corpus_delta(spark, sf_dir)
    assert_parity(df, versioning.CORPUS_DELTA_SQL, sf_dir, "corpus_delta")
    rows = {r.doc_id: r.status for r in df.collect()}
    assert set(rows.values()) == {"added", "removed", "changed"}
    for doc_id, status in rows.items():
        if doc_id % 11 == 0:
            expect = "added" if doc_id % 17 != 0 else None
        elif doc_id % 17 == 0:
            expect = "removed"
        else:
            expect = "changed" if doc_id % 13 == 0 else None
        assert status == expect, (doc_id, status, expect)


def test_mixture_plan_parity_and_mass_balance(spark, sf_dir):
    """Mixture multipliers match the SQL twin; shares each sum to ~1
    and multiplier * token_share reproduces target_share."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.mixture_plan(spark, sf_dir)
    assert_parity(df, textstats.MIXTURE_PLAN_SQL, sf_dir, "mixture_plan")
    rows = df.collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.multiplier * r.token_share - r.target_share) < 1e-4


def test_hll_daily_users_parity_and_accuracy(spark, sf_dir):
    """Deterministic HLL: bit-exact twin parity, rel-err ceiling
    (m=256 -> sigma ~6.5%, ceiling 3-4 sigma), and the mergeable
    property: sketching two halves and merging bucket maxima gives
    the same estimate as sketching everything."""
    from spark_app_twitter_spark.operators import sketches

    df = sketches.hll_daily_users(spark, sf_dir)
    assert_parity(df, sketches.HLL_DAILY_USERS_SQL, sf_dir, "hll_daily")
    rows = df.collect()
    assert rows
    assert max(r.rel_err for r in rows) < 0.25
    # merge property at the register level: max(rho) over a union of
    # disjoint halves == max(rho) over the whole (trivially true for
    # max, but run through the real pipeline to pin the plumbing)
    ev = load_table(spark, sf_dir, "events")
    whole = {(r.day, r.hll_estimate) for r in rows}
    halves = ev.where(F.col("event_id") % 2 == 0).unionByName(
        ev.where(F.col("event_id") % 2 == 1)
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        halves.write.mode("overwrite").parquet(f"{td}/events.parquet")
        again = {
            (r.day, r.hll_estimate)
            for r in sketches.hll_daily_users(spark, td).collect()
        }
    assert again == whole


def test_decontaminate_bloom_parity_and_no_false_negatives(spark, sf_dir):
    """Bloom-prefiltered decontamination: twin parity, and the exact
    hit counts among bloom candidates equal the full exact join's
    counts (bloom admits false positives, never false negatives)."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.decontaminate_bloom(spark, sf_dir)
    assert_parity(
        df, textstats.DECONTAMINATE_BLOOM_SQL, sf_dir, "decon_bloom"
    )
    got = {r.doc_id: r.n_hit_grams for r in df.collect()}
    exact = {
        r.doc_id: r.n_hit_grams
        for r in textstats.decontaminate(spark, sf_dir).collect()
    }
    assert exact, "fixture plants contamination"
    for doc_id, n in exact.items():
        assert got.get(doc_id, 0) == n, doc_id


def test_incremental_source_stats_equals_full_recompute(spark, sf_dir):
    """Incremental maintenance == full recompute: the oracle twin
    recomputes the new snapshot's stats from scratch while the Spark
    side applies only delta adjustments to the old base — parity IS
    the maintenance proof."""
    from spark_app_twitter_spark.operators import versioning

    assert_parity(
        versioning.incremental_source_stats(spark, sf_dir),
        versioning.INCREMENTAL_SOURCE_STATS_SQL,
        sf_dir,
        "incr_stats",
    )


def test_bpe_batched_trainer_matches_replica_and_runs_fewer_rounds(
    spark, sf_dir
):
    """Batched BPE: bit-parity with the sequential replica via the
    generated twin, disjointness of each round's picks, and the
    trained merges stay usable by the encode fold."""
    from spark_app_twitter_spark import oracles
    from spark_app_twitter_spark.operators import textstats

    df = textstats.bpe_train_merges_batched(spark, sf_dir)
    assert_parity(
        df,
        oracles.bpe_train_merges_batched_sql(sf_dir),
        sf_dir,
        "bpe_batched",
    )
    rows = sorted(df.collect(), key=lambda r: r.merge_rank)
    assert len(rows) == textstats.BPE_MERGE_ROUNDS
    # encode with the batched artifact: every doc still encodes
    docs = load_table(spark, sf_dir, "documents")
    enc = textstats.bpe_encode_frame(
        docs, [(r["left"], r["right"]) for r in rows]
    )
    assert enc.where(F.col("n_subwords") <= 0).count() == 0


# --- round 6 (continued): segment dedup, CMS, compaction, skew ---


def test_paragraph_dedup_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import dedup

    assert_parity(
        dedup.paragraph_dedup(spark, sf_dir),
        dedup.PARAGRAPH_DEDUP_SQL,
        sf_dir,
        "paragraph_dedup",
    )


def test_paragraph_dedup_planted_duplicate_segment(spark, tmp_path):
    """Two docs sharing an identical SEG_WORDS-word prefix: the later
    doc must report exactly one dropped segment, the earlier none."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from spark_app_twitter_spark.operators import dedup

    seg = " ".join(f"w{i}" for i in range(dedup.SEG_WORDS))
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            seg + " tail one alpha",
            seg + " other tail here",
            "completely different words only",
        ],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": [1] * 3,
    }
    sf = str(tmp_path / "pq")
    os.makedirs(sf)
    pq.write_table(pa.table(rows), f"{sf}/documents.parquet")
    got = {
        r.doc_id: (r.n_segments, r.n_dropped)
        for r in dedup.paragraph_dedup(spark, sf).collect()
    }
    assert got[1] == (2, 0)
    assert got[2] == (2, 1)  # shared prefix segment dropped
    assert got[3][1] == 0


def test_cms_top_terms_parity_and_overestimate(spark, sf_dir):
    from spark_app_twitter_spark.operators import sketches

    df = sketches.cms_top_terms(spark, sf_dir)
    assert_parity(df, sketches.CMS_TOP_TERMS_SQL, sf_dir, "cms")
    rows = df.collect()
    assert len(rows) == sketches.CMS_TOPK
    # CMS never underestimates, and the top terms' estimates here
    # should be near-exact (heavy terms dominate their cells)
    for r in rows:
        assert r.overestimate >= 0
        assert r.cms_estimate >= r.n_exact


def test_compaction_plan_parity_and_bin_bound(spark, sf_dir):
    from spark_app_twitter_spark.sources import bucketing

    df = bucketing.compaction_plan(spark, sf_dir)
    assert_parity(df, bucketing.COMPACTION_PLAN_SQL, sf_dir, "compaction")
    # every shard except possibly a source's last lands within one
    # input of the target: starts strictly below target + one file
    rows = df.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for src, shards in per_source.items():
        shards.sort(key=lambda r: r.shard)
        # doc ranges must not overlap between consecutive shards
        for a, b in zip(shards, shards[1:]):
            assert a.doc_hi < b.doc_lo
        # total bytes over shards == total bytes of the source
        assert sum(r.n_inputs for r in shards) > 0


def test_key_skew_report_parity_and_semantics(spark, sf_dir):
    from spark_app_twitter_spark.operators import aggregates

    df = aggregates.key_skew_report(spark, sf_dir)
    assert_parity(df, aggregates.KEY_SKEW_REPORT_SQL, sf_dir, "skew")
    rows = df.collect()
    assert len(rows) == aggregates.SKEW_TOPK
    # descending count order, salt >= 1, share in (0, 100]
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r.suggested_salt >= 1
        assert 0 < r.share_pct <= 100


def test_rag_retrieve_ivf_parity_and_contract(spark, sf_dir):
    """Two-stage retrieval (IVF recall -> payload join) must match
    its oracle and keep rag_retrieve's output contract."""
    from spark_app_twitter_spark.operators import retrieval

    df = retrieval.rag_retrieve_ivf(spark, sf_dir)
    assert_parity(df, retrieval.RAG_RETRIEVE_IVF_SQL, sf_dir, "rag_ivf")
    assert df.columns == [
        "query_id",
        "doc_id",
        "cos_sim",
        "rank",
        "quality_score",
        "text",
    ]


def test_source_overlap_parity_and_symmetric_bound(spark, sf_dir):
    from spark_app_twitter_spark.operators import dedup

    df = dedup.source_overlap(spark, sf_dir)
    assert_parity(df, dedup.SOURCE_OVERLAP_SQL, sf_dir, "source_overlap")
    rows = df.collect()
    assert rows, "synthetic corpus must share some segments"
    for r in rows:
        assert r.src_a < r.src_b  # unordered pairs emitted once
        assert 0 < r.overlap <= 1


def test_source_overlap_detects_planted_mirror(spark, tmp_path):
    """A source that mirrors another's paragraphs must dominate the
    overlap matrix."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_app_twitter_spark.operators import dedup

    seg_a = " ".join(f"a{i}" for i in range(dedup.SEG_WORDS))
    seg_b = " ".join(f"b{i}" for i in range(dedup.SEG_WORDS))
    rows = {
        "doc_id": [1, 2, 3],
        "text": [seg_a + " " + seg_b, seg_a + " " + seg_b, "novel text"],
        "lang": ["en"] * 3,
        "source": ["orig", "mirror", "other"],
        "n_chars": [1] * 3,
    }
    sf = str(tmp_path / "pq")
    os.makedirs(sf)
    pq.write_table(pa.table(rows), f"{sf}/documents.parquet")
    got = {
        (r.src_a, r.src_b): (r.n_shared, r.overlap)
        for r in dedup.source_overlap(spark, sf).collect()
    }
    assert got == {("mirror", "orig"): (2, 1.0)}  # both 20-word segs


def test_k_anonymous_release_parity_and_suppression(spark, sf_dir):
    from spark_app_twitter_spark.operators import versioning

    df = versioning.k_anonymous_release(spark, sf_dir)
    assert_parity(
        df, versioning.K_ANONYMOUS_RELEASE_SQL, sf_dir, "k_anon"
    )
    # both branches exercise at the driver-gate SF (sf0.001 is too
    # sparse to publish any hourly cell at k=5)
    rows = versioning.k_anonymous_release(
        spark, "/root/testdata/sf0.01"
    ).collect()
    pub = [r for r in rows if not r.suppressed]
    sup = [r for r in rows if r.suppressed]
    assert pub and sup, "fixture must exercise both branches"
    for r in pub:
        assert r.n_users >= versioning.ANON_K
    for r in sup:
        assert r.n_rows is None and r.n_users is None


def test_paragraph_dedup_mass_conservation(spark, sf_dir):
    """Corpus-wide invariant: dropped segments == total segments
    minus distinct segment digests (every duplicate beyond the first
    occurrence is dropped, nothing else)."""
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.operators import dedup
    from spark_app_twitter_spark.sources.parquet import load_table

    out = dedup.paragraph_dedup(spark, sf_dir).agg(
        F.sum("n_segments").alias("total"), F.sum("n_dropped").alias("dropped")
    ).collect()[0]
    segs = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.expr(
                "transform("
                f" sequence(0, int(ceil(size(split(text, ' ')) / {dedup.SEG_WORDS}.0)) - 1),"
                f" i -> md5(concat_ws(' ', slice(split(text, ' '), i * {dedup.SEG_WORDS} + 1, {dedup.SEG_WORDS}))))"
            )
        ).alias("digest")
    )
    n_total = segs.count()
    n_distinct = segs.distinct().count()
    assert out.total == n_total
    assert out.dropped == n_total - n_distinct


def test_mixture_apply_parity_and_epoch_semantics(spark, sf_dir):
    """Epoch expansion must match the oracle AND respect the plan:
    every oversampled source emits >= floor(mult) epochs per doc,
    and per-doc epochs are dense 1..n."""
    from spark_app_twitter_spark.operators import textstats

    df = textstats.mixture_apply(spark, sf_dir)
    assert_parity(df, textstats.MIXTURE_APPLY_SQL, sf_dir, "mix_apply")
    per_doc = (
        df.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("epoch").alias("lo"),
            F.max("epoch").alias("hi"),
        )
        .collect()
    )
    for r in per_doc:
        assert (r.lo, r.hi) == (1, r.n)  # dense epochs
    plan = {
        r.source: r.multiplier
        for r in textstats.mixture_plan(spark, sf_dir).collect()
    }
    got = {
        r.source: r.avg_epochs
        for r in df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("rows"))
        .join(
            textstats.mixture_plan(spark, sf_dir).select("source", "n_docs"),
            "source",
        )
        .select(
            "source", (F.col("rows") / F.col("n_docs")).alias("avg_epochs")
        )
        .collect()
    }
    for src, m in plan.items():
        if src in got:
            assert abs(got[src] - m) <= 0.5  # draw variance bound


def test_hist_quantiles_parity_and_error_bound(spark, sf_dir):
    """The histogram quantile sketch must hash-match its twin AND
    land within one bucket width of the exact quantile (the sketch's
    documented error bound)."""
    from spark_app_twitter_spark.operators import sketches
    from spark_app_twitter_spark.sources.parquet import load_table

    import math

    df = sketches.hist_quantiles(spark, sf_dir)
    assert_parity(df, sketches.HIST_QUANTILES_SQL, sf_dir, "histq")
    # the sketch's guarantee is vs the ORDER STATISTIC the cum >= p*n
    # rule selects (the interpolated percentile may sit below the
    # k-1th..kth gap): est = upper edge of that value's bucket, so
    # os_k lies in (est - width, est]
    by_type: dict = {}
    for row in (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    ):
        by_type.setdefault(row.event_type, []).append(row.value)
    for r in df.collect():
        vals = sorted(by_type[r.event_type])
        for p, est in ((0.5, r.p50_est), (0.95, r.p95_est), (0.99, r.p99_est)):
            k = max(1, math.ceil(p * len(vals)))
            os_k = vals[k - 1]
            assert est - r.width - 1e-6 <= os_k <= est + 1e-6, (
                f"{r.event_type} p{p}: est {est} width {r.width} os {os_k}"
            )


def test_registry_has_no_duplicate_keys_and_full_oracle_cover():
    """The registry dict is a rotation schedule — a duplicate key
    silently drops the earlier entry (Python keeps the last), which
    once nearly shrank the driver window unnoticed. Pin it with an
    AST check, and pin that every query has an oracle twin."""
    import ast
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries",
            "oracle_sql",
        ):
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys = [
                        k.value
                        for k in sub.keys
                        if isinstance(k, ast.Constant)
                    ]
                    dupes = {k for k in keys if keys.count(k) > 1}
                    assert not dupes, (node.name, dupes)
    import __spark_entry__ as ent

    q, o = ent.queries(), ent.oracle_sql()
    assert set(o) <= set(q), "orphan oracle entries"
    missing = [n for n in q if n not in o]
    assert not missing, f"queries without an oracle twin: {missing}"


def test_cluster_best_representatives_parity_and_keep_best(spark, sf_dir):
    """Keep-best must match its oracle, and every representative must
    carry its cluster's max quality score."""
    from spark_app_twitter_spark.operators import dedup, textstats
    from spark_app_twitter_spark.functions.text import tokens

    df = dedup.cluster_best_representatives(spark, sf_dir)
    assert_parity(
        df, dedup.CLUSTER_BEST_REPRESENTATIVES_SQL, sf_dir, "keepbest"
    )
    labels = dedup.dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    quality = load_table(spark, sf_dir, "documents").select(
        "doc_id", textstats.quality_score_expr(tokens("text")).alias("q")
    )
    maxq = (
        labels.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max("q").alias("mq"))
    )
    bad = df.join(maxq, "cluster_id").where(
        F.col("rep_quality") != F.col("mq")
    )
    assert bad.count() == 0


def test_semdedup_2level_parity_and_shared_discipline(spark, sf_dir):
    """The two-level scale path must match its full-tree oracle, and
    both variants must agree on the corpus-wide keep RATE order of
    magnitude (same threshold, same cap — only cell boundaries
    differ)."""
    from spark_app_twitter_spark.operators import semdedup

    df2 = semdedup.semdedup_2level(spark, sf_dir)
    assert_parity(df2, semdedup.SEMDEDUP_2LEVEL_SQL, sf_dir, "semd2")
    flat_kept = (
        semdedup.semdedup(spark, sf_dir).where("keep").count()
    )
    two_kept = df2.where("keep").count()
    total = df2.count()
    assert two_kept <= total
    # identical threshold/cap: dropped counts must be within 3x
    flat_dropped = max(1, total - flat_kept)
    two_dropped = max(1, total - two_kept)
    assert 1 / 3 <= flat_dropped / two_dropped <= 3


def test_ivf_index_append_parity_and_conservation(spark, sf_dir):
    """The index append report must match its oracle and conserve
    the corpus: old + new member counts sum to |embeddings|."""
    from spark_app_twitter_spark.operators import similarity
    from spark_app_twitter_spark.sources.parquet import load_table

    df = similarity.ivf_index_append(spark, sf_dir)
    assert_parity(df, similarity.IVF_INDEX_APPEND_SQL, sf_dir, "append")
    tot = df.agg(F.sum(F.col("n_old") + F.col("n_new"))).collect()[0][0]
    # the audited index is knn_ivf's CANDIDATE set (queries excluded)
    assert (
        tot
        == load_table(spark, sf_dir, "embeddings").count()
        - similarity.N_QUERIES
    )


def test_embedding_drift_parity_and_dims(spark, sf_dir):
    from spark_app_twitter_spark.operators import similarity
    from spark_app_twitter_spark.sources.parquet import load_table

    df = similarity.embedding_drift(spark, sf_dir)
    assert_parity(df, similarity.EMBEDDING_DRIFT_SQL, sf_dir, "drift")
    dim = len(
        load_table(spark, sf_dir, "embeddings").first()["embedding"]
    )
    assert df.count() == dim


def test_pack_efficiency_parity_and_bounds(spark, sf_dir):
    from spark_app_twitter_spark.operators import packing

    df = packing.pack_efficiency(spark, sf_dir)
    assert_parity(df, packing.PACK_EFFICIENCY_SQL, sf_dir, "packeff")
    for r in df.collect():
        assert 0 < r.fill_pct <= 100
        assert r.n_boundary_crossers <= r.n_docs
        # n_bins is the exact ceil of total/budget
        assert (
            r.n_bins
            == (r.total_tokens + packing.PACK_BUDGET - 1)
            // packing.PACK_BUDGET
        )


def test_cluster_size_histogram_parity_and_mass(spark, sf_dir):
    from spark_app_twitter_spark.operators import dedup
    from spark_app_twitter_spark.sources.parquet import load_table

    df = dedup.cluster_size_histogram(spark, sf_dir)
    assert_parity(
        df, dedup.CLUSTER_SIZE_HISTOGRAM_SQL, sf_dir, "csize"
    )
    tot = df.agg(F.sum("n_docs")).collect()[0][0]
    assert tot == load_table(spark, sf_dir, "documents").count()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_paragraph_dedup_randomized_corpus_parity(spark, tmp_path_factory, docs):
    """Randomized corpora (hypothesis): segment dedup must match the
    DuckDB twin on ANY word-list corpus, not just the shipped
    fixtures — catching slice/ceil edge cases (short docs, exact
    multiples of SEG_WORDS, all-identical docs) the fixed tests
    might miss."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_app_twitter_spark.operators import dedup

    rows = {
        "doc_id": list(range(len(docs))),
        "text": [" ".join(words) for words in docs],
        "lang": ["en"] * len(docs),
        "source": ["s"] * len(docs),
        "n_chars": [1] * len(docs),
    }
    sf = str(tmp_path_factory.mktemp("pq"))
    pq.write_table(pa.table(rows), os.path.join(sf, "documents.parquet"))
    assert_parity(
        dedup.paragraph_dedup(spark, sf),
        dedup.PARAGRAPH_DEDUP_SQL,
        sf,
        "rand_paragraph",
    )
    # the MATERIALIZING rewrite shares the slice/ceil edges plus its
    # own reassembly logic (struct sort vs string_agg ORDER BY,
    # zero-segment dropout) — parity-check it on the same corpus
    assert_parity(
        dedup.paragraph_dedup_rewrite(spark, sf),
        dedup.PARAGRAPH_DEDUP_REWRITE_SQL,
        sf,
        "rand_rewrite",
    )


def test_paragraph_dedup_rewrite_parity_and_consistency(spark, sf_dir):
    """The rewrite must match its oracle AND agree with the report:
    per doc, n_kept == n_segments - n_dropped, and the new text
    contains exactly n_kept * SEG_WORDS words (except short tails)."""
    from spark_app_twitter_spark.operators import dedup

    df = dedup.paragraph_dedup_rewrite(spark, sf_dir)
    assert_parity(
        df, dedup.PARAGRAPH_DEDUP_REWRITE_SQL, sf_dir, "rewrite"
    )
    report = {
        r.doc_id: (r.n_segments, r.n_dropped)
        for r in dedup.paragraph_dedup(spark, sf_dir).collect()
    }
    for r in df.collect():
        n_seg, n_drop = report[r.doc_id]
        assert r.n_kept == n_seg - n_drop
    # fully-recycled docs drop out of the rewrite but stay in the
    # report
    assert set(report) >= {r.doc_id for r in df.collect()}


def test_ann_recall_audit_parity_and_floor(spark, sf_dir):
    from spark_app_twitter_spark.operators import similarity

    df = similarity.ann_recall_audit(spark, sf_dir)
    assert_parity(
        df, similarity.ANN_RECALL_AUDIT_SQL, sf_dir, "recall_audit"
    )
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.recall <= 1
        assert r.n_hit <= r.n_exact
    avg = sum(r.recall for r in rows) / len(rows)
    assert avg >= 0.8, f"IVF avg recall collapsed: {avg}"


def test_embedding_outliers_parity_and_discrimination(spark, sf_dir):
    from spark_app_twitter_spark.operators import similarity

    df = similarity.embedding_outliers(spark, sf_dir)
    assert_parity(
        df, similarity.EMBEDDING_OUTLIERS_SQL, sf_dir, "outliers"
    )
    rows = df.collect()
    out = [r for r in rows if r.is_outlier]
    inl = [r for r in rows if not r.is_outlier]
    assert out and inl, "threshold must discriminate"
    # strict separation: outlier sims all below every inlier sim
    assert max(r.centroid_sim for r in out) < min(
        r.centroid_sim for r in inl
    )


def test_zorder_skipping_parity_and_effectiveness(spark, sf_dir):
    """The skipping audit must match its oracle AND show the layout
    actually skips: every audit predicate prunes > 50% of groups."""
    from spark_app_twitter_spark.sources import bucketing

    df = bucketing.zorder_skipping_stats(spark, sf_dir)
    assert_parity(
        df, bucketing.ZORDER_SKIPPING_STATS_SQL, sf_dir, "zskip"
    )
    for r in df.collect():
        assert r.skip_pct > 50, f"{r.predicate} skips only {r.skip_pct}%"
        # (at tiny SFs a narrow predicate may legitimately skip ALL
        # groups — no residual-read assertion)


def test_trending_topics_parity_and_semantics(spark, sf_dir):
    """The trend query must match its oracle, rank by RISE (not raw
    volume), and have dense ranks per day."""
    from spark_app_twitter_spark.operators import serving

    df = serving.trending_topics(spark, sf_dir)
    assert_parity(df, serving.TRENDING_TOPICS_SQL, sf_dir, "trending")
    by_day: dict = {}
    for r in df.collect():
        by_day.setdefault(str(r.day), []).append(r)
    for day, rows in by_day.items():
        rows.sort(key=lambda r: r.trend_rank)
        assert [r.trend_rank for r in rows] == list(
            range(1, len(rows) + 1)
        )
        deltas = [r.delta for r in rows]
        assert deltas == sorted(deltas, reverse=True)
        for r in rows:
            assert r.delta == r.counts - r.prev_counts


# --------------------------------------------------------------- round 7


def test_contrastive_pairs_parity_and_mining_semantics(spark, sf_dir):
    """Hard-negative mining matches the SQL twin; every row's
    positive is the query's rank-1 neighbor, negatives come from
    ranks > 1 inside the hard band, and the margin is pos - neg."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.contrastive_pairs(spark, sf_dir)
    assert_parity(
        df, similarity.CONTRASTIVE_PAIRS_SQL, sf_dir, "contrastive_pairs"
    )
    rows = df.collect()
    assert rows, "hard band must not be empty at the test SF"
    top1 = {
        r.query_id: (r.neighbor_id, r.cos_sim)
        for r in similarity.knn_bruteforce(spark, sf_dir)
        .where(F.col("rank") == 1)
        .collect()
    }
    for r in rows:
        assert (r.pos_id, r.pos_sim) == top1[r.query_id]
        assert r.neg_rank > 1
        assert r.neg_sim >= similarity.HARD_NEG_FLOOR
        assert abs(r.margin - round(r.pos_sim - r.neg_sim, 6)) < 1e-9


def test_bpe_compression_parity_and_consistency(spark, sf_dir):
    """Per-source chars-per-token matches the trained-artifact twin,
    and the rollup conserves the per-doc encode sums exactly."""
    from spark_app_twitter_spark import oracles
    from spark_app_twitter_spark.operators import textstats

    df = textstats.bpe_compression(spark, sf_dir)
    assert_parity(
        df, oracles.bpe_compression_sql(sf_dir), sf_dir, "bpe_compression"
    )
    total_sub = sum(r.n_subwords for r in df.collect())
    enc_sub = (
        textstats.bpe_encode(spark, sf_dir)
        .agg(F.sum("n_subwords"))
        .collect()[0][0]
    )
    assert total_sub == enc_sub


def test_knn_ivf_quantized_parity_and_recall(spark, sf_dir):
    """IVF + int8 pre-rank + float rerank matches its twin; recall vs
    exact brute force stays at the IVF floor (the rerank margin must
    absorb int8 rank noise inside the probe set)."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.knn_ivf_quantized(spark, sf_dir)
    assert_parity(
        df, similarity.KNN_IVF_QUANTIZED_SQL, sf_dir, "knn_ivf_quantized"
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in df.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"IVF+int8 recall regressed: {recall}"
    # and the int8 stage must not lose what plain IVF finds, beyond
    # the documented rerank margin: hit sets agree on >= 90%
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_ivf(spark, sf_dir).collect()
    }
    agree = len(got & ivf) / len(ivf)
    assert agree >= 0.9, f"int8 pre-rank dropped IVF hits: {agree}"


def test_ivf_index_export_parity_and_conservation(spark, sf_dir):
    """The published index table matches the full-tree twin; member
    counts conserve the candidate corpus; every cell id encodes its
    (coarse, fine) coordinates."""
    from spark_app_twitter_spark.operators import similarity
    from spark_app_twitter_spark.operators.clustering import (
        corpus_size,
        levels_for,
    )

    df = similarity.ivf_index_export(spark, sf_dir)
    assert_parity(
        df, similarity.IVF_INDEX_EXPORT_SQL, sf_dir, "ivf_index_export"
    )
    rows = df.collect()
    n = corpus_size(spark, sf_dir)
    _, k2 = levels_for(n)
    assert sum(r.n_members for r in rows) == n - similarity.N_QUERIES
    for r in rows:
        assert r.cell == r.coarse * k2 + r.fine
        assert all(p.lstrip("-").isdigit() for p in r.centroid_q6_csv.split(","))


def test_ivf_probe_sensitivity_parity_and_monotonicity(spark, sf_dir):
    """The recall-vs-probe-budget curve matches its twin, is
    monotonically non-decreasing in the budget, and its value at the
    default budget agrees with ann_recall_audit's aggregate recall."""
    from spark_app_twitter_spark.operators import similarity

    df = similarity.ivf_probe_sensitivity(spark, sf_dir)
    assert_parity(
        df,
        similarity.IVF_PROBE_SENSITIVITY_SQL,
        sf_dir,
        "ivf_probe_sensitivity",
    )
    rows = sorted(df.collect(), key=lambda r: r.n_probe_budget)
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.n_reachable >= a.n_reachable
        assert a.n_exact == b.n_exact
    audit = similarity.ann_recall_audit(spark, sf_dir).collect()
    agg_recall = sum(r.n_hit for r in audit) / sum(r.n_exact for r in audit)
    # reachability at the full budget upper-bounds served recall
    assert rows[-1].recall >= agg_recall - 1e-9


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=0, max_size=9),
    vocab=st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        st.integers(min_value=-3_000_000, max_value=-1),
        min_size=1,
        max_size=25,
    ),
)
def test_unigram_viterbi_engine_replica_agree_randomized(word, vocab):
    """The engine's Arrow-side DP and the oracle's independently
    written sequential DP must return the IDENTICAL segmentation on
    arbitrary words and score tables — including dead-end fallbacks,
    ties, and the shortest-piece tie rule. Any drift between the two
    implementations is a gate hash-mismatch waiting to happen."""
    from spark_app_twitter_spark import oracles
    from spark_app_twitter_spark.operators import unigram

    # both sides guarantee totality only when every char is scored
    logp = dict(vocab)
    for ch in set(word):
        logp.setdefault(ch, -2_500_000)
    got_engine = unigram._viterbi_pieces(word, logp)
    got_replica = oracles._ug_viterbi(word, logp)
    assert got_engine == got_replica
    assert "".join(got_engine) == word


@settings(max_examples=120, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=8),
    vocab=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=4),
        st.integers(min_value=-3_000_000, max_value=-1),
        min_size=1,
        max_size=12,
    ),
)
def test_unigram_viterbi_optimal_randomized(word, vocab):
    """DP score equals the exhaustive-enumeration optimum on every
    random (word, score-table) pair."""
    import itertools

    from spark_app_twitter_spark.operators import unigram

    logp = dict(vocab)
    for ch in set(word):
        logp.setdefault(ch, -2_500_000)
    got = unigram._viterbi_pieces(word, logp)
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        seg, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                seg.append(word[start:i])
                start = i
        seg.append(word[start:])
        if all(len(p) <= unigram.UNIGRAM_MAX_PIECE and p in logp for p in seg):
            s = sum(logp[p] for p in seg)
            if best is None or s > best:
                best = s
    assert best is not None
    assert sum(logp[p] for p in got) == best


def test_funnel_conversion_respects_stage_order(spark, tmp_path):
    """The funnel is ORDERED: a click before the user's first view
    doesn't count, a purchase without a qualifying click doesn't
    count, and conversion basis points follow the stage-over-previous
    arithmetic."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_app_twitter_spark.operators import serving
    from tests.parity import assert_parity

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [  # (event_id, ts, user_id, event_type)
        (1, ts(1), 1, "view"), (2, ts(2), 1, "click"),
        (3, ts(3), 1, "purchase"),
        (4, ts(1), 2, "click"), (5, ts(2), 2, "view"),  # click too early
        (6, ts(1), 3, "view"), (7, ts(2), 3, "purchase"),  # no click
        (8, ts(1), 4, "error"),  # never enters
        (9, ts(1), 5, "purchase"), (10, ts(2), 5, "view"),
        (11, ts(3), 5, "click"), (12, ts(4), 5, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": ["{}"] * len(rows),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    sf = str(tmp_path)
    assert_parity(
        serving.funnel_conversion(spark, sf),
        serving.FUNNEL_CONVERSION_SQL,
        sf,
        "funnel_planted",
    )
    out = {r.stage: r for r in serving.funnel_conversion(spark, sf).collect()}
    assert out["view"].n_users == 4 and out["view"].conversion_bp == 10000
    assert out["click"].n_users == 2
    assert out["click"].conversion_bp == (10000 * 2) // 4
    assert out["purchase"].n_users == 2
    assert out["purchase"].conversion_bp == 10000


def test_funnel_single_user_shuffle(spark, sf_dir):
    """The three chained stage windows must share ONE user_id
    exchange — no joins, no repeated corpus scans."""
    from spark_app_twitter_spark.operators import serving
    from spark_app_twitter_spark.plans import explain as E

    plan = E.executed_plan(serving.funnel_conversion(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Join" not in plan or "SortMergeJoin" not in plan


def test_hourly_anomalies_flags_planted_spike(spark, tmp_path):
    """A 10x spike after 24 flat observed hours is flagged; the flat
    hours are not; hours without a full trailing window are never
    flagged; and a series with variance tolerates in-band wobble."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_app_twitter_spark.operators import serving
    from tests.parity import assert_parity

    t0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    # 24 flat hours of 5 events, then one spike hour of 50
    for h in range(25):
        n = 50 if h == 24 else 5
        for _ in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h), eid % 7, "click")
            )
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": ["{}"] * len(rows),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    sf = str(tmp_path)
    assert_parity(
        serving.hourly_anomalies(spark, sf),
        serving.HOURLY_ANOMALIES_SQL,
        sf,
        "anomalies_planted",
    )
    out = sorted(
        serving.hourly_anomalies(spark, sf).collect(),
        key=lambda r: r.hour_ts,
    )
    assert len(out) == 25
    # the flat hours: no full window until hour 24, so none flagged
    for r in out[:24]:
        assert not r.is_anomaly and r.trail_n < serving.ANOM_W
    spike = out[24]
    assert spike.n == 50 and spike.trail_n == serving.ANOM_W
    assert spike.is_anomaly  # zero-variance window, any deviation flags


def test_event_transitions_parity_and_stochasticity(spark, sf_dir):
    """Transition matrix matches the twin; each row's basis points
    sum to 10000 within the floor slack; transition mass conserves:
    sum n == total events - total sessions (one lost pair per
    session head)."""
    from tests.parity import assert_parity

    df = serving.event_transitions(spark, sf_dir)
    assert_parity(df, serving.EVENT_TRANSITIONS_SQL, sf_dir, "transitions")
    rows = df.collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for ft, rs in by_from.items():
        bp = sum(r.p_bp for r in rs)
        assert 10000 - len(rs) < bp <= 10000, (ft, bp)
    n_events = load_table(spark, sf_dir, "events").count()
    n_sessions = serving.sessionize(spark, sf_dir).count()
    assert sum(r.n for r in rows) == n_events - n_sessions
