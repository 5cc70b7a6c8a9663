"""Distributed model TRAINING on the corpus — the missing half of the
model seam (functions/models.py runs pretrained models; this module
trains one with Spark as the compute engine).

The flagship is a logistic-regression document classifier trained by
full-batch gradient descent: the CCNet/GPT-3-style quality-filter
recipe (learn to separate a reference slice of the corpus from the
rest, then use the model as an admission score). Label here is
``lang = 'en'`` over cheap lexical features, so the learned weights
are interpretable (the English-stopword ratio dominates) and the
pipeline is exactly the one a quality filter would run at 100 TB:

- per-doc features: one map-side projection (no shuffle);
- per-iteration gradient: ONE aggregation job whose shuffle is
  |dims| rows after map-side combine — independent of corpus size;
- weights: driver state (a model artifact, like k-means centroids),
  broadcast back into the next iteration's closure as literals.

Determinism (the engine's exact-reduction discipline, see
operators/similarity.py covariance): features are quantized to 1e-6
integers, the sigmoid to 1e-6 via an explicit floor(x*1e6 + 0.5)
(no banker's-rounding ambiguity), so every per-row gradient
contribution is an INTEGER and the distributed sum is
order-independent. Weights quantize to 1e-9 between iterations. A
numpy replica following the same recipe reproduces the weights bit
for bit (tests/test_llm_ops.py pins it); the only cross-library
float surface is exp(), identical-input on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import STOPWORDS, tokens
from spark_app_twitter_spark.sources.parquet import load_table

LR_ITERS = 12
LR_RATE = 1.0
LR_FEATURES = (
    "bias",
    "len_capped",  # min(n_tokens / 64, 1)
    "uniq_ratio",  # distinct tokens / tokens
    "stop_ratio",  # English-stopword tokens / tokens
    "mean_tok_len",  # mean token length / 10
)
_Q_F = 1_000_000  # feature / sigmoid quantization
_Q_W = 1_000_000_000  # weight quantization between iterations


def _doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, fq): label and the 1e-6-quantized integer feature
    vector. All JVM-side column math, one projection."""
    toks = tokens("text")
    n = F.size(toks).cast("double")
    stop_lits = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lits, t)))
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / n
    feats = [
        F.lit(1.0),
        F.least(n / F.lit(64.0), F.lit(1.0)),
        F.size(F.array_distinct(toks)).cast("double") / n,
        n_stop.cast("double") / n,
        mean_len / F.lit(10.0),
    ]
    fq = F.array(
        *[
            F.floor(f * _Q_F + F.lit(0.5)).cast("long")
            for f in feats
        ]
    )
    return docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("y"),
        fq.alias("fq"),
    )


def _sigmoid_q(z: F.Column) -> F.Column:
    """floor(sigmoid(z) * 1e6 + 0.5) as an integer column."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.floor(p * _Q_F + F.lit(0.5)).cast("long")


def train_lang_lr_weights(
    docs: DataFrame, iters: int = LR_ITERS, rate: float = LR_RATE
) -> tuple[list[float], int, int]:
    """Run ``iters`` full-batch GD steps; returns (weights, n_docs,
    n_correct_final). One Spark aggregation job per iteration; the
    job's shuffle payload is |dims| rows regardless of corpus size."""
    feats = _doc_features(docs).localCheckpoint(eager=True)
    n_docs = feats.count()
    dims = len(LR_FEATURES)
    w = [0.0] * dims

    def z_col() -> F.Column:
        # sequential left-to-right fold, mirrored by the numpy twin
        z = F.lit(0.0)
        for j in range(dims):
            z = z + F.lit(w[j]) * (
                F.element_at("fq", j + 1).cast("double") / F.lit(float(_Q_F))
            )
        return z

    for _ in range(iters):
        pq = _sigmoid_q(z_col())
        # integer gradient contribution per (row, dim):
        # (p_q - y*Q) * f_q  — exact, order-independent sum
        contrib = feats.withColumn("pq", pq).select(
            F.posexplode("fq").alias("dim", "fj"),
            (F.col("pq") - F.col("y") * _Q_F).alias("err"),
        )
        gsum = (
            contrib.groupBy("dim")
            .agg(
                F.sum(
                    (F.col("err") * F.col("fj")).cast("decimal(38,0)")
                ).alias("g")
            )
            .collect()
        )
        g = {r["dim"]: int(r["g"]) for r in gsum}
        for j in range(dims):
            step = rate * (g[j] / (float(_Q_F) * _Q_F)) / n_docs
            wj = w[j] - step
            w[j] = (
                int(wj * _Q_W + (0.5 if wj >= 0 else -0.5)) / _Q_W
            )
    n_correct = (
        feats.withColumn("pq", _sigmoid_q(z_col()))
        .where(
            ((F.col("pq") >= _Q_F // 2) & (F.col("y") == 1))
            | ((F.col("pq") < _Q_F // 2) & (F.col("y") == 0))
        )
        .count()
    )
    return w, n_docs, n_correct


def train_lang_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained classifier as a table: (feature, weight,
    train_accuracy) — the published model artifact. Iterative
    (GD loop), so not single-statement SQL — the driver oracle is a
    literal-artifact twin (oracles.train_lang_lr_sql): a sequential
    replica of the same integer-gradient recipe reproduces the
    weights bit-for-bit; unit tests pin the replica and an accuracy
    floor above the majority class."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    w, n_docs, n_correct = train_lang_lr_weights(docs)
    acc = round(n_correct / n_docs, 6)
    rows = [
        (name, float(wj), acc) for name, wj in zip(LR_FEATURES, w)
    ]
    return spark.createDataFrame(
        rows, "feature string, weight double, train_accuracy double"
    )


def lr_score_frame(docs: DataFrame, weights: list[float]) -> DataFrame:
    """Score any documents frame with published weights —
    (doc_id, lr_score). Stateless map-side projection; streaming-safe
    (append mode), the admission-filter deployment form."""
    feats = _doc_features(docs)
    z = F.lit(0.0)
    for j, wj in enumerate(weights):
        z = z + F.lit(wj) * (
            F.element_at("fq", j + 1).cast("double") / F.lit(float(_Q_F))
        )
    return feats.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("lr_score"),
    )
