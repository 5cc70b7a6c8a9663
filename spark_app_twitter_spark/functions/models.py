"""Real (numpy) models for the two pluggable-model seams.

The engine's oracle-checked queries use deterministic lexicon
classifiers for reproducibility (SURVEY §2.6), but the seams exist so
deployments can run real models (the reference runs pretrained Spark
NLP pipelines: ``spark_app/main.py:70-87``). This module provides an
actually-computing model on each seam — numpy, not a stub — so the
"model under load" path is exercised at bench scale:

- :func:`ngram_logistic_model` / :func:`ngram_logistic_scorer` — a
  hashed char-bigram -> dense logistic scorer (the classic fastText-
  style shape: featurize, one matmul, argmax). Plugs into
  ``make_pandas_classifier(scorer, init=loader)``; weight
  construction happens in ``init`` so the load cost is paid once per
  python worker task, exactly like unpickling a checkpoint.
- :func:`bilinear_decode` — a deterministic raster decoder + the
  bilinear resample math a PIL-backed deployment would run, for the
  ``resize_media``/``extract_features`` decoder seam.

Weights are generated from a fixed seed instead of shipped as a file
(no model artifacts in this environment); the compute shape —
vectorized batch featurize + matmul per Arrow batch — is the real
thing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

N_FEATURES = 1 << 12  # hashed bigram buckets
N_CLASSES = 8
_SEED = 20260813


def ngram_logistic_model() -> np.ndarray:
    """Deterministic (N_FEATURES, N_CLASSES) float32 weight matrix —
    the 'checkpoint load' for the classifier seam."""
    rng = np.random.default_rng(_SEED)
    return rng.standard_normal((N_FEATURES, N_CLASSES)).astype(np.float32)


def _featurize(texts: pd.Series) -> np.ndarray:
    """Hashed char-bigram count matrix, vectorized per batch."""
    mat = np.zeros((len(texts), N_FEATURES), dtype=np.float32)
    for i, t in enumerate(texts.fillna("")):
        b = t.encode("utf-8", "ignore")
        if len(b) < 2:
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        # bigram hash: (c1 * 31 + c2) mod buckets, all-numpy
        h = (arr[:-1].astype(np.int64) * 31 + arr[1:]) & (N_FEATURES - 1)
        np.add.at(mat[i], h, 1.0)
    return mat


def ngram_logistic_scorer(batch: pd.Series, model: np.ndarray) -> pd.Series:
    """fn(batch, model) for ``make_pandas_classifier(..., init=...)``:
    featurize -> logits matmul -> argmax class label."""
    logits = _featurize(batch) @ model
    return pd.Series([f"c{i}" for i in logits.argmax(axis=1)])


def bilinear_decode(blob: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic raster expand (md5 stream, as fake_image_decode)
    — stands in for the codec read a PIL deployment does. Returned
    as float32 so downstream resampling math runs in real pixel
    arithmetic."""
    out = bytearray()
    cur = blob or b"\x00"
    while len(out) < w * h:
        cur = hashlib.md5(cur).digest()
        out.extend(cur)
    return (
        np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
        .reshape(h, w)
        .astype(np.float32)
    )


def bilinear_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Pure-numpy bilinear resample (align_corners=False convention),
    vectorized — the real interpolation a deployment's resize does,
    not nearest-neighbor index picking."""
    h, w = img.shape
    ys = (np.arange(th, dtype=np.float64) + 0.5) * (h / th) - 0.5
    xs = (np.arange(tw, dtype=np.float64) + 0.5) * (w / tw) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def bilinear_decoder(blob: bytes, w: int, h: int) -> np.ndarray:
    """resize_media-compatible decoder: decode to float32 raster.
    (resize_media's index resize then applies; use
    :func:`bilinear_resize` directly for the full-quality path.)"""
    return bilinear_decode(blob, w, h)
