

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
