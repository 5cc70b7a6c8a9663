"""Parquet batch sources.

The reference addresses partitions by hand-building path strings from
the wall clock (reference ``spark_app/functions/functions.py:63-71``)
— which defeats Catalyst partition pruning and breaks on late data.
Here partition selection is expressed as a *predicate* so the
optimizer prunes at plan time (static) or run time (dynamic): at
100 TB the difference is scanning one hive partition vs listing paths
in Python and hoping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_app_twitter_spark.functions.caches import register_cache
from spark_app_twitter_spark.schemas import ALL_TABLES

# Session metadata caches (optimization r15, guide §6 listing note):
# a bare ``spark.read.parquet(path)`` re-resolves the datasource on
# EVERY call — file listing + footer schema inference — measured at
# ~100-125 ms per load_table call vs ~15 ms with the schema supplied.
# The bench makes hundreds of load_table calls, so this was tens of
# seconds of pure driver latency. A real deployment reads through a
# catalog (metastore/Iceberg) that holds exactly this metadata; these
# dicts are that catalog for the session. Keys are (appId, sf_dir,
# table); values are METADATA ONLY (schema / partition width — never
# data or results). The standing immutable-path contract applies
# (clear_session_caches after rewriting a path in-session).
_SCHEMA_CACHE: dict[tuple, object] = register_cache({})
_NPART_CACHE: dict[tuple, int] = register_cache({})
# registered (ADVICE r15): clear_session_caches must force a re-pin,
# so a caller that reset spark.sql.session.timeZone mid-session can
# restore the UTC contract with the same clear it already owes after
# any in-session contract change
_TZ_PINNED: dict[str, bool] = register_cache({})


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one synthetic table (TESTDATA.md layout).

    ``events.parquet`` carries TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default. We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds — exactly what DuckDB does when it surfaces the same
    column as TIMESTAMP — so both engines see identical values.

    ``spread=True`` repartitions to cluster width: a table that is one
    small parquet file scans as ONE partition, serializing any
    CPU-heavy per-row work (hashing, n-gram generation, UDF decode)
    onto a single core. The round-robin shuffle costs one pass over a
    small table and buys full parallelism — only use it when per-row
    compute dominates (at real scale inputs arrive in many files and
    this becomes a no-op by construction).
    """
    # All oracle parity assumes UTC timestamp rendering; pin it here so
    # correctness does not depend on the caller's session defaults
    # (once per session — conf.set is a py4j round trip per call).
    app_id = spark.sparkContext.applicationId
    if app_id not in _TZ_PINNED:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _TZ_PINNED[app_id] = True
    path = os.path.join(sf_dir, f"{name}.parquet")
    skey = (app_id, sf_dir, name)
    schema = _SCHEMA_CACHE.get(skey)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if schema is None:
            df = spark.read.parquet(path)
            _SCHEMA_CACHE[skey] = df.schema
        else:
            df = spark.read.schema(schema).parquet(path)
        # The driver testdata stores TIMESTAMP(NANOS), surfaced as a
        # long under nanosAsLong — convert ONLY then. A re-exported
        # events table (engine-written parquet, e.g. tools/stress.py)
        # already carries a real timestamp column.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: float division would lose precision at ~1e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        if schema is None:
            df = spark.read.parquet(path)
            _SCHEMA_CACHE[skey] = df.schema
        else:
            df = spark.read.schema(schema).parquet(path)
    if spread:
        width = spread if isinstance(spread, int) and spread is not True else (
            spark.sparkContext.defaultParallelism
        )
        nparts = _NPART_CACHE.get(skey)
        if nparts is None:
            # df.rdd forces physical planning — cache the scan width
            # per (session, path) under the immutable-path contract
            nparts = df.rdd.getNumPartitions()
            _NPART_CACHE[skey] = nparts
        if nparts < width:
            df = df.repartition(width)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or ALL_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can be written in pure SQL."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


def read_datalake_hour(
    spark: SparkSession, root: str, date: str, hour: str
) -> DataFrame:
    """Read one (date, hour) slice of a hive-partitioned datalake.

    Replaces the reference's path-string construction + 3600 s
    blocking retry (``functions.py:63-86``). The filter on partition
    columns compiles to `PartitionFilters` in the parquet scan — only
    matching directories are listed/read; an empty slice is an empty
    DataFrame, not an exception.
    """
    df = spark.read.parquet(root)
    return df.where((F.col("date") == date) & (F.col("hour") == hour))
