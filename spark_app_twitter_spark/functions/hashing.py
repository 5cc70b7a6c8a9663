"""Hashing building blocks for dedup / fingerprinting.

Everything is built on md5-of-string so Spark and any ANSI oracle
agree bit-for-bit (both emit lowercase hex). Engine-internal hashes
(xxhash64, murmur) are faster but engine-specific; md5 keeps the
correctness gate portable, and the operators accept a pluggable hash
column factory where throughput matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_of(col: Column) -> Column:
    return F.md5(col.cast("string"))


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles from a token array, JVM-side.

    transform over a 0..size-n index range; each shingle joined with
    a space. Empty/short docs yield an empty array (not null).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )
    )


def shingles_sql(toks_expr: str, n: int) -> str:
    """DuckDB twin of :func:`shingles` (list_transform + list slicing)."""
    return (
        f"CASE WHEN len({toks_expr}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({toks_expr}) - {n} + 2), "
        f"i -> array_to_string({toks_expr}[i:i+{n}-1], ' ')) END"
    )


def minhash_value(shingle_col: Column, seed: int) -> Column:
    """One minhash component: min over md5(seed || '|' || shingle).

    Using the *lexicographic min of hex digests* instead of numeric
    min avoids engine-specific hex->int conversion entirely; the
    uniformity argument is identical (md5 is uniform per hex char).
    """
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def minhash_value_sql(shingles_expr: str, seed: int) -> str:
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"s -> md5('{seed}|' || s)))"
    )
