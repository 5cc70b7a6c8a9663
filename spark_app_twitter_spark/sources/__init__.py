from spark_app_twitter_spark.sources.parquet import load_table, load_tables, register_views
