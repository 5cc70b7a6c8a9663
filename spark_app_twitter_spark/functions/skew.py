"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles joins; for *aggregations* with a
pathological hot key (one topic = 50% of a 100 TB stream), pre-salting
splits the hot key across `salt` reducers, then a second tiny
aggregation merges the partials. Use only for algebraic aggregates
(sum/count/min/max — anything with a merge function).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """groupBy(keys) -> (total, counts), skew-safe.

    Phase 1 groups by (keys, salt_bucket): the hot key's rows spread
    over `salt` reducers. Phase 2 merges |keys| x salt partials —
    negligible. ``salt_on`` names a column to derive the bucket from
    (deterministic); default uses a per-row random bucket, which is
    fine because sum/count partials are merge-invariant.
    """
    bucket = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
        if salt_on
        else (F.rand() * salt).cast("int")
    )
    phase1 = (
        df.withColumn("_salt", bucket)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_psum").alias("total"), F.sum("_pcnt").alias("counts")
    )
