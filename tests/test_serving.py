

def test_props_stats_parity(spark, sf_dir):
    from spark_app_twitter_spark.operators import serving as sv
    from tests.parity import assert_parity

    assert_parity(
        sv.props_stats(spark, sf_dir), sv.PROPS_STATS_SQL, sf_dir, "props"
    )


def test_weekly_active_parity_and_bounds(spark, sf_dir):
    """WAU >= DAU every day (the window is a superset), and WAU never
    exceeds the 7-day distinct-user union."""
    from spark_app_twitter_spark.operators import serving as sv
    from tests.parity import assert_parity

    assert_parity(
        sv.weekly_active(spark, sf_dir), sv.WEEKLY_ACTIVE_SQL, sf_dir, "wau"
    )
    rows = sv.weekly_active(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau > 0


def test_rfm_scores_parity_and_quintiles(spark, sf_dir):
    """RFM matches the twin; quintile sizes differ by at most one;
    scores agree with the metric ordering (a user strictly better on
    a metric never scores lower on it)."""
    from tests.parity import assert_parity

    from spark_app_twitter_spark.operators import serving

    df = serving.rfm_scores(spark, sf_dir)
    assert_parity(df, serving.RFM_SCORES_SQL, sf_dir, "rfm")
    rows = df.collect()
    assert rows
    for dim, metric, better_is_lower in (
        ("r_score", "recency_days", True),
        ("f_score", "frequency", False),
        ("m_score", "monetary", False),
    ):
        sizes = {}
        for r in rows:
            sizes[r[dim]] = sizes.get(r[dim], 0) + 1
        assert set(sizes) <= {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1
        for a in rows:
            for b in rows:
                if better_is_lower and a[metric] < b[metric]:
                    assert a[dim] >= b[dim]
                elif not better_is_lower and a[metric] > b[metric]:
                    assert a[dim] >= b[dim]
    for r in rows:
        assert r.rfm == r.r_score * 100 + r.f_score * 10 + r.m_score
