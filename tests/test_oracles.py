"""Literal-artifact oracle generation (spark_app_twitter_spark/
oracles.py): each generated DuckDB twin must match the live Spark
operator exactly, and the SQL merge-stage generator must reproduce
the greedy-leftmost BPE fold on adversarial fixtures — including the
left == right run-parity branch the real sf0.01 merges don't hit.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_app_twitter_spark import oracles

from .parity import assert_parity


def _oracle_cases():
    from spark_app_twitter_spark.operators import (
        graph,
        similarity,
        textstats,
        training,
    )

    return [
        ("text_bpe_train_merges", textstats.bpe_train_merges,
         oracles.bpe_train_merges_sql),
        ("text_bpe_encode", textstats.bpe_encode, oracles.bpe_encode_sql),
        ("text_train_lang_lr", training.train_lang_lr,
         oracles.train_lang_lr_sql),
        ("sim_embedding_pca", similarity.embedding_pca_project,
         oracles.embedding_pca_sql),
        ("graph_pagerank_near_dup", graph.pagerank_near_dup,
         oracles.pagerank_near_dup_sql),
    ]


@pytest.mark.parametrize("case", _oracle_cases(), ids=lambda c: c[0])
def test_literal_artifact_oracle_parity(spark, sf_dir, case):
    """The generated twin (replica-trained artifact + real SQL over
    the corpus) hash-matches the distributed operator."""
    name, fn, gen = case
    assert_parity(fn(spark, sf_dir), gen(sf_dir), sf_dir, name)


# Adversarial vocab: runs of equal symbols (greedy parity), merges
# whose output feeds later merges, multi-char symbols that must not
# false-match inside other symbols, the empty word, and words with
# no matches at all.
_WORDS = ["aaaa", "aaab", "aab", "abab", "baaa", "bb", "", "xaay", "aaaaa"]
_MERGES = [("a", "a"), ("aa", "a"), ("b", "</w>"), ("aa", "aa")]


def _sql_encode(words: list[str], merges: list[tuple[str, str]]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE words AS SELECT * FROM (VALUES "
        + ", ".join("('" + w + "')" for w in words)
        + ") AS t(word)"
    )
    stages = ",\n".join(
        oracles._merge_stage_sql(k, l, r) for k, (l, r) in enumerate(merges)
    )
    rows = con.execute(
        "WITH v0 AS (SELECT word,"
        f" list_append(string_split(word, ''), '{oracles.BPE_EOW}') AS sym"
        " FROM words),\n"
        + stages
        + f"\nSELECT word, sym FROM v{len(merges)}"
    ).fetchall()
    return {w: list(s) for w, s in rows}


def test_merge_stage_sql_matches_python_fold():
    """Window-function merge stages == the (out, carry) fold replica
    on every adversarial word, for every prefix of the merge list."""
    for upto in range(1, len(_MERGES) + 1):
        merges = _MERGES[:upto]
        got = _sql_encode(_WORDS, merges)
        for w in _WORDS:
            sym = oracles._word_syms(w)
            for left, right in merges:
                sym = oracles._merge_word(sym, left, right)
            assert got[w] == sym, (w, merges, got[w], sym)


def test_merge_stage_sql_matches_spark_fold(spark):
    """The same adversarial fixtures through the SPARK fold
    (textstats._bpe_merge_pair) — three implementations agree."""
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.operators import textstats

    df = spark.createDataFrame(
        [(w,) for w in _WORDS], "word string"
    ).withColumn(
        "sym",
        F.concat(F.split("word", ""), F.array(F.lit(oracles.BPE_EOW))),
    )
    for left, right in _MERGES:
        df = df.withColumn(
            "sym", textstats._bpe_merge_pair(F.col("sym"), left, right)
        )
    got = {r.word: list(r.sym) for r in df.collect()}
    expect = _sql_encode(_WORDS, _MERGES)
    assert got == expect


def test_pagerank_replica_integer_discipline(sf_dir):
    """Replica ranks are exact integers summing to <= 1 unit of mass
    (floor leak only) and every pair participant is ranked."""
    from spark_app_twitter_spark.operators.graph import PR_Q

    ranks = oracles.replica_pagerank(sf_dir)
    assert ranks, "fixture corpora plant near-dups"
    total = sum(rq for _, rq in ranks)
    assert 0.9 * PR_Q <= total <= PR_Q
