"""Drive a real (numpy) model through the two pluggable-model seams:

- ``make_pandas_classifier(fn, init=...)`` — the enrichment path a
  transformer classifier would use (reference runs Spark NLP
  pipelines at ``spark_app/main.py:70-87``; here the model is a
  deterministic numpy linear scorer so the test is hermetic).
- ``extract_features(decoder=...)`` — the multimodal decode path
  (reference scope: none; this is the LLM-pipeline extension).

Asserts the operational properties the seams promise: Arrow batch
iteration (vectorized calls, not per-row), once-per-worker-task model
init, and driver-reproducible outputs.
"""

import glob
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import make_pandas_classifier
from spark_app_twitter_spark.operators import multimodal
from spark_app_twitter_spark.sources.parquet import load_table

LABELS = ["alpha", "beta", "gamma", "delta"]


def _model_weights() -> np.ndarray:
    # deterministic "trained" weight matrix: 26 char features -> 4 labels
    rng = np.random.default_rng(7)
    return rng.standard_normal((26, len(LABELS)))


def _char_counts(texts: pd.Series) -> np.ndarray:
    mat = np.zeros((len(texts), 26), dtype=np.float64)
    for i, t in enumerate(texts.fillna("")):
        for ch in t:
            j = ord(ch) - ord("a")
            if 0 <= j < 26:
                mat[i, j] += 1.0
    return mat


def test_pandas_classifier_runs_numpy_model_with_init(spark, sf_dir, tmp_path):
    marker_dir = str(tmp_path / "init_markers")
    os.makedirs(marker_dir)
    batch_log = str(tmp_path / "batches")
    os.makedirs(batch_log)

    def init():
        # once per python worker task: record (pid) and load weights
        with open(os.path.join(marker_dir, f"init-{os.getpid()}-{id(object())}"), "w") as f:
            f.write("1")
        return _model_weights()

    def score(batch: pd.Series, model: np.ndarray) -> pd.Series:
        with open(
            os.path.join(batch_log, f"batch-{os.getpid()}-{len(batch)}"), "w"
        ) as f:
            f.write(str(len(batch)))
        logits = _char_counts(batch) @ model
        return pd.Series([LABELS[i] for i in logits.argmax(axis=1)])

    clf = make_pandas_classifier(score, init=init)
    docs = load_table(spark, sf_dir, "documents").coalesce(1)
    n_docs = docs.count()
    got = docs.select("doc_id", "text", clf("text").alias("label")).collect()
    assert len(got) == n_docs

    # driver-side reproduction: identical labels for every row
    texts = pd.Series([r.text for r in got])
    expected = (_char_counts(texts) @ _model_weights()).argmax(axis=1)
    assert [r.label for r in got] == [LABELS[i] for i in expected]

    # once-per-worker-task init: exactly 1 task (coalesce(1)) -> 1 init
    inits = glob.glob(os.path.join(marker_dir, "init-*"))
    assert len(inits) == 1, f"expected one init for one task, saw {len(inits)}"

    # vectorized batches: every call saw many rows, not one
    batch_sizes = [
        int(os.path.basename(p).rsplit("-", 1)[1])
        for p in glob.glob(os.path.join(batch_log, "batch-*"))
    ]
    assert sum(batch_sizes) == n_docs
    assert all(s > 1 for s in batch_sizes), f"per-row calls detected: {batch_sizes}"


def test_extract_features_with_numpy_model_decoder(spark, sf_dir):
    """A numpy 'embedding model' behind the decoder seam: byte
    histogram projected through a fixed matrix. Spark-side vectors
    must equal the driver-side model output bit-for-bit."""
    rng = np.random.default_rng(11)
    proj = rng.standard_normal((256, multimodal.FEATURE_DIM)).astype(np.float32)

    def model_decode(blob: bytes, kind: str) -> np.ndarray:
        hist = np.bincount(
            np.frombuffer(blob, dtype=np.uint8), minlength=256
        ).astype(np.float32)
        return hist @ proj

    media = multimodal.media_table(spark, sf_dir)
    feats = (
        multimodal.extract_features(media, decoder=model_decode)
        .orderBy("media_id")
        .limit(20)
        .collect()
    )
    assert len(feats) == 20
    blobs = {
        r.media_id: (bytes(r.blob), r.kind)
        for r in media.orderBy("media_id").limit(20).collect()
    }
    for r in feats:
        expect = model_decode(*blobs[r.media_id])
        assert len(r.feature) == multimodal.FEATURE_DIM
        assert np.array_equal(
            np.array(r.feature, dtype=np.float32), expect
        ), f"vector mismatch for media_id={r.media_id}"
