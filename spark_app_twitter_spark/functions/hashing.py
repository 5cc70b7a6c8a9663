"""Hashing building blocks for dedup / fingerprinting.

Everything is built on md5-of-string so Spark and any ANSI oracle
agree bit-for-bit (both emit lowercase hex). Engine-internal hashes
(xxhash64, murmur) are faster but engine-specific; md5 keeps the
correctness gate portable, and the operators accept a pluggable hash
column factory where throughput matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def exploded_shingles(
    df: DataFrame, key_cols: list[str], toks: Column, n: int, out: str
) -> DataFrame:
    """(key..., out) rows: one row per word n-gram shingle — the
    EXPLODED twin of :func:`shingles`, emitting shingles through a
    position explode + scalar slice/concat so the whole pipeline
    stays inside whole-stage codegen.

    Use this instead of ``explode(shingles(...))`` whenever the
    shingles are consumed as rows: the array form runs its transform
    lambda INTERPRETED (higher-order functions sit outside codegen)
    and measured 5.5x slower at the 100x stress fixture (13.7 s vs
    2.5 s for the corpus bigram count, r13 A/B —
    worklog/r13_notes.md). Keep :func:`shingles` for operators that
    need the per-doc ARRAY (minhash's per-seed array_min, the bloom
    prefilter's array_contains gate).

    Docs with fewer than n tokens emit nothing — exactly
    explode(empty array) semantics."""
    w = df.select(*key_cols, toks.alias("_w")).where(F.size("_w") >= n)
    idx = F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1)))
    if n == 2:  # the common case: two element_ats beat a slice alloc
        sh = F.concat_ws(
            " ", F.expr("element_at(_w, _i)"), F.expr("element_at(_w, _i + 1)")
        )
    else:
        sh = F.concat_ws(" ", F.expr(f"slice(_w, _i, {n})"))
    return w.select(*key_cols, "_w", idx.alias("_i")).select(
        *key_cols, sh.alias(out)
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


# ---------------------------------------------------------------------------
# Packed minhash: k components from ceil(k/4) md5 calls per shingle.
# One 128-bit md5 is split into four independent 32-bit (8-hex-char)
# slices; the lexicographic min of each slice is a valid minhash.
# 4x fewer hash invocations than one-md5-per-component — this is the
# throughput-critical inner loop of LSH dedup at corpus scale.
#
# Implemented as a DataFrame transform (not bare column expressions):
# the digest arrays are materialized as their own projection step so
# CollapseProject cannot inline — and thus recompute — the md5 pass
# once per slice.
# ---------------------------------------------------------------------------
def _seeded_md5(seed: int):
    # closure factory, NOT a default-arg lambda: a two-parameter
    # lambda would make transform() pass (element, index) and the
    # index column would silently replace the seed
    return lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))


def _slice8(off: int):
    return lambda d: F.substring(d, off, 8)


def with_packed_minhash(df: DataFrame, shingle_col: str, k: int) -> DataFrame:
    """Append minhash columns mh0..mh{k-1} (drops nothing else)."""
    seeds = (k + 3) // 4
    for seed in range(seeds):
        df = df.withColumn(
            f"_dg{seed}",
            F.transform(F.col(shingle_col), _seeded_md5(seed)),
        )
    for i in range(k):
        seed, slot = divmod(i, 4)
        df = df.withColumn(
            f"mh{i}",
            F.array_min(
                F.transform(F.col(f"_dg{seed}"), _slice8(slot * 8 + 1))
            ),
        )
    return df.drop(*[f"_dg{s}" for s in range(seeds)])


def packed_minhash_sql_cols(shingles_expr: str, k: int) -> list[str]:
    """DuckDB twins of :func:`with_packed_minhash` (same slicing)."""
    out: list[str] = []
    for i in range(k):
        seed, slot = divmod(i, 4)
        off = slot * 8 + 1
        out.append(
            f"list_min(list_transform({shingles_expr}, "
            f"s -> substr(md5('{seed}|' || s), {off}, 8))) AS mh{i}"
        )
    return out
