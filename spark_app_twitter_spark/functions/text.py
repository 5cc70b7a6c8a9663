"""Text column functions: tokenization and the classifier surface.

The reference delegates text -> label to Spark NLP pretrained
pipelines (reference ``spark_app/main.py:70,73-87``,
``spark_app/functions/functions.py:87-95``): sentiment labels
consumed via equality to ``'positive'`` and six emotion labels. The
heavy models are not part of the query semantics — the *capability*
is "text -> label". The engine therefore ships:

1. A deterministic, pure-Catalyst lexicon classifier (the default):
   whole-stage-codegen'd JVM expressions, zero Python in the hot
   path, and oracle-reproducible (the same rule is ANSI SQL).
2. A vectorized Pandas-UDF adapter (``make_pandas_classifier``) that
   shows where a real model (Spark NLP / transformers) plugs in:
   Arrow-batched, model loaded once per executor via an iterator UDF.

At 100 TB the classifier is a map-side projection — no shuffle — so
throughput is bounded by scan + codegen (path 1) or Arrow transfer +
model inference (path 2).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_app_twitter_spark.schemas import EMOTIONS

# Seeded lexicon for the deterministic classifier. Chosen from the
# synthetic documents vocabulary (TESTDATA.md) so labels are non-trivial.
POSITIVE_WORDS = ("fast", "small")
NEGATIVE_WORDS = ("slow", "big")

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — array<string>, JVM-side."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    vocab = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(vocab, t)))


def sentiment(text: Column | str) -> Column:
    """Deterministic lexicon sentiment: positive/negative/neutral.

    SQL-equivalent (DuckDB):
      CASE WHEN len(list_filter(string_split(text,' '), t -> t IN pos))
              > len(list_filter(...neg...)) THEN 'positive' ... END
    """
    toks = tokens(text)
    pos, neg = _hit_count(toks, POSITIVE_WORDS), _hit_count(toks, NEGATIVE_WORDS)
    return (
        F.when(pos > neg, F.lit("positive"))
        .when(pos < neg, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def emotion(text: Column | str) -> Column:
    """Deterministic emotion label: EMOTIONS[length(text) % 6].

    Stands in for the reference's DistilBERT emotion classifier
    (6 labels — reference ``streamlit/utilities/utilities.py:30-31``)
    while staying oracle-reproducible.
    """
    c = F.col(text) if isinstance(text, str) else text
    arr = F.array(*[F.lit(e) for e in EMOTIONS])
    return F.element_at(arr, (F.length(c) % 6 + 1).cast("int"))


def sentiment_sql(text_expr: str = "text") -> str:
    """The DuckDB-SQL twin of :func:`sentiment` (oracle parity)."""
    pos = ", ".join(f"'{w}'" for w in POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE_WORDS)
    p = f"len(list_filter(string_split({text_expr}, ' '), t -> t IN ({pos})))"
    n = f"len(list_filter(string_split({text_expr}, ' '), t -> t IN ({neg})))"
    return (
        f"CASE WHEN {p} > {n} THEN 'positive' "
        f"WHEN {p} < {n} THEN 'negative' ELSE 'neutral' END"
    )


def emotion_sql(text_expr: str = "text") -> str:
    """The DuckDB-SQL twin of :func:`emotion`."""
    arr = "[" + ", ".join(f"'{e}'" for e in EMOTIONS) + "]"
    return f"({arr})[(length({text_expr}) % 6) + 1]"


# ---------------------------------------------------------------------------
# Pluggable model path: Arrow-batched iterator UDF. A real deployment
# swaps `fn` for a transformer; load-once-per-executor semantics come
# from the iterator form.
# ---------------------------------------------------------------------------
def make_pandas_classifier(
    fn: Callable[..., pd.Series],
    label_type: T.DataType = T.StringType(),
    init: Callable[[], object] | None = None,
):
    """Arrow-batched iterator classifier UDF.

    Without ``init``: ``fn(batch) -> labels`` per Arrow batch.
    With ``init``: ``init()`` loads the model ONCE per python worker
    task (before the batch loop — the expensive weight load is
    amortized over every batch the worker sees), then
    ``fn(batch, model) -> labels`` per batch.
    """

    @F.pandas_udf(label_type)
    def classify(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = init() if init is not None else None
        for batch in batches:
            yield fn(batch, model) if init is not None else fn(batch)

    return classify


def _lexicon_sentiment_pandas(texts: pd.Series) -> pd.Series:
    def one(t: str | None) -> str:
        if t is None:
            return "neutral"
        toks = t.split(" ")
        p = sum(tok in POSITIVE_WORDS for tok in toks)
        n = sum(tok in NEGATIVE_WORDS for tok in toks)
        return "positive" if p > n else ("negative" if p < n else "neutral")

    return texts.map(one)


def _lexicon_emotion_pandas(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: EMOTIONS[len(t) % 6] if t is not None else None)


def pandas_sentiment() -> Column:
    """Pandas-UDF twin of :func:`sentiment` (tested equivalent)."""
    return make_pandas_classifier(_lexicon_sentiment_pandas)("text")


def pandas_emotion() -> Column:
    return make_pandas_classifier(_lexicon_emotion_pandas)("text")


# ---------------------------------------------------------------------------
# Spark-SQL string forms of the classifiers (for SQLTransformer /
# spark.sql call sites). Same semantics as the Column builders above.
# ---------------------------------------------------------------------------
def sentiment_sql_spark(text_expr: str = "text") -> str:
    pos = ", ".join(f"'{w}'" for w in POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE_WORDS)
    p = (
        f"size(filter(split({text_expr}, ' '), "
        f"t -> array_contains(array({pos}), t)))"
    )
    n = (
        f"size(filter(split({text_expr}, ' '), "
        f"t -> array_contains(array({neg}), t)))"
    )
    return (
        f"CASE WHEN {p} > {n} THEN 'positive' "
        f"WHEN {p} < {n} THEN 'negative' ELSE 'neutral' END"
    )


def emotion_sql_spark(text_expr: str = "text") -> str:
    arr = "array(" + ", ".join(f"'{e}'" for e in EMOTIONS) + ")"
    return f"element_at({arr}, CAST(length({text_expr}) % 6 + 1 AS INT))"
