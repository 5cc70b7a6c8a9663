"""Unigram language-model tokenizer (Kudo 2018, "Subword
Regularization" — the SentencePiece unigram trainer), the second
trained-tokenizer family next to BPE (textstats.py): instead of
greedy merge rules, a PIECE VOCABULARY with log-probabilities is
trained by EM, and encoding is the Viterbi-best segmentation of each
word under those probabilities.

Engine variant (documented simplifications, both mirrored exactly by
the oracle replica):
- candidate seeding: every 1-char piece that occurs, plus the top
  UNIGRAM_SEED_K substrings of length 2..UNIGRAM_MAX_PIECE by
  frequency-weighted occurrence count (ties on piece asc) — a
  bounded, deterministic stand-in for SentencePiece's suffix-array
  seed;
- FIXED vocabulary EM (no pruning schedule): UNIGRAM_EM_ROUNDS
  rounds of (Viterbi E-step, add-one M-step);
- all Viterbi math is INTEGER micro-log-prob DP (floor(ln p * 1e6)),
  so executor workers, the driver, and the sequential replica agree
  bit-for-bit; ties take the SHORTEST piece ending at a position
  (candidate length ascending, strictly-greater acceptance).

Scale shape (the BPE trainer's discipline): ONE corpus scan builds
the (word, freq) vocabulary; seeding is one substring explode +
count over vocabulary rows with a TakeOrderedAndProject top-K; every
EM round runs the Arrow-batched Viterbi UDF over DISTINCT WORDS (the
vocabulary trick — never the corpus), reduces integer piece counts
map-side, and collects only the |pieces| <= SEED_K + |alphabet|
artifact rows to the driver for the M-step. Encoding joins the
per-word piece counts back to per-doc word counts — a
vocabulary-bounded broadcast.

Reference scope note: the reference app has no tokenizer surface;
this extends SURVEY.md §2.9's text-analysis mandate (tokenizer
training family) beyond textstats.py's BPE.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import tokens
from spark_app_twitter_spark.functions.caches import register_cache
from spark_app_twitter_spark.sources.parquet import load_table

UNIGRAM_MAX_PIECE = 4  # candidate substring length cap
UNIGRAM_SEED_K = 200  # multi-char candidates kept at seeding
UNIGRAM_EM_ROUNDS = 2
_UG_SCALE = 1_000_000


def _viterbi_pieces(
    word: str, logp: dict[str, int], max_len: int = UNIGRAM_MAX_PIECE
) -> list[str]:
    """Best segmentation of ``word`` under integer micro-log-probs.

    DP over end positions; candidate piece lengths iterate ASCENDING
    with strictly-greater acceptance, so ties keep the shortest
    piece ending at each position. Every single char of the corpus
    is in the vocabulary by construction, so the DP never dead-ends
    on corpus words; chars outside the vocabulary (impossible for
    corpus-seeded calls) fall back to a floor score so encode stays
    total.
    """
    n = len(word)
    if n == 0:
        return []
    neg_inf = -(1 << 60)
    floor = min(logp.values(), default=-_UG_SCALE) - _UG_SCALE
    best = [neg_inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for length in range(1, min(max_len, i) + 1):
            piece = word[i - length : i]
            score = logp.get(piece)
            if score is None:
                if length > 1:
                    continue
                score = floor
            cand = best[i - length] + score
            if cand > best[i]:
                best[i] = cand
                back[i] = length
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _seed_vocab(vocab_df: DataFrame) -> list[tuple[str, int]]:
    """(piece, weighted_count) seed list: all 1-char pieces plus the
    top UNIGRAM_SEED_K multi-char substrings, each with its
    freq-weighted occurrence count. Char pieces and the top-K are
    both artifact-bounded collects (TakeOrderedAndProject / alphabet
    size); the substring explode runs over VOCABULARY rows."""
    # guard: Spark's sequence(1, 0) is a DESCENDING [1, 0] — words
    # shorter than L must contribute an empty array, not two bogus
    # out-of-range substrings
    sub_lens = ", ".join(
        f"CASE WHEN length(word) >= {L} THEN"
        f" transform(sequence(1, length(word) - {L} + 1),"
        f" i -> substring(word, i, {L}))"
        f" ELSE array() END"
        for L in range(1, UNIGRAM_MAX_PIECE + 1)
    )
    cands = (
        vocab_df.select(
            "freq",
            F.explode(F.expr(f"flatten(array({sub_lens}))")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
    )
    chars = [
        (r.piece, r.c)
        for r in cands.where(F.length("piece") == 1).collect()
    ]
    multi = [
        (r.piece, r.c)
        for r in cands.where(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(UNIGRAM_SEED_K)
        .collect()
    ]
    return sorted(chars + multi)


def _mstep(counts: dict[str, int], vocab: list[str]) -> dict[str, int]:
    """Add-one micro-log-probs over the fixed vocabulary. math.log
    runs on the DRIVER only (executor DP is pure integer), so both
    the engine and the sequential replica call the same libm."""
    total = sum(counts.get(p, 0) for p in vocab)
    denom = total + len(vocab)
    return {
        p: math.floor(
            (math.log(counts.get(p, 0) + 1) - math.log(denom)) * _UG_SCALE
        )
        for p in vocab
    }


def _estep_counts(
    vocab_df: DataFrame, logp: dict[str, int]
) -> dict[str, int]:
    """Distributed E-step: Arrow-batched Viterbi over distinct words,
    freq-weighted integer piece counts reduced map-side; only the
    |pieces| rows come back to the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces: list[str] = []
            cs: list[int] = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in _viterbi_pieces(word, logp):
                    pieces.append(piece)
                    cs.append(int(freq))
            yield pd.DataFrame({"piece": pieces, "c": cs})

    agg = (
        vocab_df.mapInPandas(run, schema="piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r.piece: r.c for r in agg}


# session artifact cache, the BPE merges-cache idiom (immutable-path
# contract: a session that rewrites a corpus dir must clear this)
_UNIGRAM_CACHE: dict[tuple[str, str], list[tuple[str, int, int]]] = (
    register_cache({})
)


def clear_unigram_cache() -> None:
    _UNIGRAM_CACHE.clear()


def unigram_trained(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, int, int]]:
    """The trained artifact [(piece, em_count, logp_micro)], piece
    asc — trained once per (session, corpus)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _UNIGRAM_CACHE.get(key)
    if cached is None:
        vocab_df = _word_freqs(spark, sf_dir).localCheckpoint(eager=True)
        seed = _seed_vocab(vocab_df)
        vocab = [p for p, _ in seed]
        logp = _mstep({p: c for p, c in seed}, vocab)
        counts: dict[str, int] = {}
        for _ in range(UNIGRAM_EM_ROUNDS):
            counts = _estep_counts(vocab_df, logp)
            logp = _mstep(counts, vocab)
        cached = [(p, counts.get(p, 0), logp[p]) for p in vocab]
        _UNIGRAM_CACHE[key] = cached
    return cached


def unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, em_count, logp_micro): the trained unigram-LM
    tokenizer vocabulary. Iterative EM — not single-statement SQL —
    so the driver oracle is a literal-artifact twin (oracles.py): an
    independent sequential replica trains the same artifact over
    DuckDB-read words and the gate hash-compares the two."""
    art = unigram_trained(spark, sf_dir)
    return spark.createDataFrame(
        art, "piece string, em_count bigint, logp_micro bigint"
    )


# (applicationId, sf_dir) -> (word, n_pieces): the ENCODED unigram
# vocabulary — Viterbi run once per distinct corpus word, published
# like the BPE encoded vocab (optimization r15: every consumer of
# the encode — packing, fertility, the export capstone — re-ran the
# ArrowEvalPython Viterbi pass per query).
_UNIGRAM_VOCAB_CACHE: dict[tuple[str, str], "DataFrame"] = register_cache({})


def unigram_encoded_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n_pieces) over the corpus's distinct words under the
    trained piece table — computed once per (session, corpus) and
    lazily checkpointed; the tokenizer's deployment vocabulary."""
    from spark_app_twitter_spark.functions.caches import get_or_build

    def build() -> DataFrame:
        logp = {p: lp for p, _, lp in unigram_trained(spark, sf_dir)}

        def run(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "word": pdf["word"],
                        "n_pieces": [
                            len(_viterbi_pieces(w, logp))
                            for w in pdf["word"]
                        ],
                    }
                )

        docs = load_table(spark, sf_dir, "documents", spread=True)
        return (
            docs.select(F.explode(tokens("text")).alias("word"))
            .distinct()
            .mapInPandas(run, schema="word string, n_pieces long")
            .localCheckpoint(eager=False)
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return get_or_build(_UNIGRAM_VOCAB_CACHE, key, build)


def unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_pieces, chars_per_piece): per-doc encoding
    stats under the trained unigram vocabulary — the deployment half
    (train once, publish the piece table, encode anywhere).

    Scale shape: Viterbi runs once per DISTINCT word (vocabulary
    trick) against the PUBLISHED encoded vocabulary
    (:func:`unigram_encoded_vocab` — one Arrow pass per session, not
    per query); the (word -> n_pieces) map joins back onto per-doc
    word counts as a vocabulary-bounded broadcast; per-doc sums are
    one doc_id-keyed reduce. The oracle twin embeds the replica's
    per-word encoding as a literal relation and replays only the
    relational half — so the gate checks the distributed join/reduce
    against sequential Viterbi output.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    word_counts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    encoded = unigram_encoded_vocab(spark, sf_dir)
    return (
        word_counts.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces")).alias("n_pieces"),
            F.sum(F.col("n") * F.length("word")).alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            F.when(
                F.col("n_pieces") > 0,
                F.round(
                    F.col("n_chars").cast("double")
                    / F.col("n_pieces").cast("double"),
                    6,
                ),
            ).alias("chars_per_piece"),
        )
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_words, n_pieces, pieces_per_word): per-language
    FERTILITY of the trained unigram tokenizer — pieces emitted per
    whitespace word, grouped by the trigram language-ID prediction.
    The standard multilingual-tokenizer fairness metric: a tokenizer
    trained on a skewed mixture fragments under-represented languages
    into more pieces per word, which silently taxes their effective
    context window and per-token training budget. Grouping by the
    PREDICTED language (not the gold label) makes this the deployable
    monitor — at corpus scale there is no gold label column.

    Scale shape: composes two already-bounded operators — the
    vocabulary-trick unigram encode (Viterbi once per distinct word,
    vocab-bounded broadcast back onto per-doc counts) and the
    broadcast-profile language ID — with ONE doc_id-keyed equi-join
    and a |langs|-row aggregation. No new unbounded state; the output
    is |langs| rows.
    """
    # function-level import: textstats is the bigger module and does
    # not depend on unigram — keep it that way
    from spark_app_twitter_spark.operators.textstats import lang_id

    enc = unigram_encode(spark, sf_dir).select(
        "doc_id", "n_words", "n_pieces"
    )
    lid = lang_id(spark, sf_dir).select(
        "doc_id", F.col("predicted").alias("lang")
    )
    return (
        enc.join(lid, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_pieces",
            F.round(
                F.col("n_pieces").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("pieces_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary pruning (the SentencePiece reduction schedule, one
# round): after EM, keep every character plus only the multi-char
# pieces that earned EM mass — top UNIGRAM_PRUNE_KEEP by
# (em_count desc, piece asc) among count > 0 — then one more EM
# round over the pruned vocabulary so the survivors' probabilities
# absorb the dropped pieces' mass.
UNIGRAM_PRUNE_KEEP = 100

_PRUNED_CACHE: dict[tuple[str, str], list[tuple[str, int, int]]] = (
    register_cache({})
)


def clear_pruned_cache() -> None:
    _PRUNED_CACHE.clear()


def unigram_pruned(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, int, int]]:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PRUNED_CACHE.get(key)
    if cached is None:
        full = unigram_trained(spark, sf_dir)
        chars = [p for p, _, _ in full if len(p) == 1]
        multi = sorted(
            ((p, c) for p, c, _ in full if len(p) > 1 and c > 0),
            key=lambda t: (-t[1], t[0]),
        )[:UNIGRAM_PRUNE_KEEP]
        vocab = sorted(chars + [p for p, _ in multi])
        logp = _mstep(
            {p: c for p, c, _ in full if p in set(vocab)}, vocab
        )
        vocab_df = _word_freqs(spark, sf_dir).localCheckpoint(eager=True)
        counts = _estep_counts(vocab_df, logp)
        logp = _mstep(counts, vocab)
        cached = [(p, counts.get(p, 0), logp[p]) for p in vocab]
        _PRUNED_CACHE[key] = cached
    return cached


def unigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, em_count, logp_micro): the PRUNED unigram vocabulary
    after one reduction round — chars + the UNIGRAM_PRUNE_KEEP
    highest-mass multi-char pieces, re-estimated with one further EM
    round. Same literal-artifact oracle discipline as
    unigram_train (independent sequential replica)."""
    art = unigram_pruned(spark, sf_dir)
    return spark.createDataFrame(
        art, "piece string, em_count bigint, logp_micro bigint"
    )
