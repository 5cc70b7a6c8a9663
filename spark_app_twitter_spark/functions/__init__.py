from spark_app_twitter_spark.functions import hashing, text, vectors
