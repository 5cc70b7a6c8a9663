"""All engine schemas in one place.

The reference scatters schema knowledge across ``from_json`` literals
(reference ``spark_app/functions/functions.py:23-26``), parquet
inference, and dashboard conventions; here every shape is a named
``StructType`` constant so plans are deterministic and reviewable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Event-stream payload (schema K in FIXTURES.md).
# The reference parses Twitter API v2 JSON: {"data": {"created_at", "text"}}
# (reference spark_app/functions/functions.py:23-26). Fields outside the
# declared schema are dropped — schema-on-read projection.
# ---------------------------------------------------------------------------
TWEET_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("created_at", T.TimestampType()),
                    T.StructField("text", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "matching_rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("tag", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Raw datalake row (schema R): output of the streaming ingest projection.
RAW_EVENT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("hour", T.StringType()),  # "HH"   (partition col)
        T.StructField("date", T.StringType()),  # "yyyy-MM-dd" (partition col)
    ]
)

# Enriched row (schema E): RAW_EVENT + classifier labels.
SENTIMENT_LABELS = ("positive", "negative", "neutral")
EMOTIONS = ("anger", "fear", "joy", "love", "sadness", "surprise")

# Aggregated serving row (schema A): one row per (topic, run).
AGGREGATED = T.StructType(
    [
        T.StructField("topic_agg", T.StringType()),
        T.StructField("positivity_rate", T.DoubleType()),
        T.StructField("counts", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("topic", T.StringType()),
        *[T.StructField(e, T.LongType()) for e in EMOTIONS],
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (/root/testdata/sf*/ — TESTDATA.md).
# Parquet carries its own schema; these constants exist for streaming
# readers (file streams need explicit schemas) and for tests.
# ---------------------------------------------------------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string {"k": int}
    ]
)

EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")

# Multimodal blob row: media as opaque binary + typed metadata. The
# engine treats decode as a pluggable Pandas-UDF stage (operators/
# multimodal.py); Spark-side plumbing is schema-first.
MEDIA_BLOB = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)
