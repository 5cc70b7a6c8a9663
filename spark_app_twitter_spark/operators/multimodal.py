"""Multimodal columns: media as opaque binary + typed metadata.

Spark-side design (the part that must be right at 100 TB):
- media rides in a ``binary`` column next to typed metadata
  (schemas.MEDIA_BLOB); parquet stores it column-chunked, so
  metadata-only queries never deserialize blobs (column pruning).
- decode / feature-extract runs as ``mapInPandas`` — Arrow batches,
  one Python worker per core, bounded memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- real codecs (PIL/librosa/ffmpeg) are not in this container; the
  decode seam is the pluggable ``decoder`` callable. The default
  ``fake_decode`` is deterministic (md5-derived) so the pipeline is
  testable end-to-end; ``strict_decode`` documents the real
  integration point and raises ``NotImplementedError``.

``media_table`` synthesizes blobs from ``documents`` (utf-8 bytes)
— deterministic, so digest/size features are oracle-checkable; the
feature vector itself is exercised by unit tests (schema + values),
not the SQL oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.schemas import MEDIA_FEATURES
from spark_app_twitter_spark.sources.parquet import load_table

FEATURE_DIM = 4

# synthetic raster shape for media_table blobs — single source of
# truth shared with the SQL oracle twins below
MEDIA_W = 64
MEDIA_H = 64


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: text bytes as the blob payload."""
    # not spread: for a small table the Python-worker fan-out costs
    # more than single-stream Arrow decode; large inputs arrive
    # multi-file and parallelize at the scan
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.lit(MEDIA_W).alias("width"),
            F.lit(MEDIA_H).alias("height"),
            (F.col("n_chars") * 10).alias("duration_ms"),
        ).alias("meta"),
    )


# SQL re-synthesis of media_table for the DuckDB oracle (which only
# sees the raw parquet tables): same kind rule, same meta dims.
MEDIA_CTE_SQL = f"""
media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
         {MEDIA_W} AS width, {MEDIA_H} AS height
  FROM documents
)
"""


def strict_decode(blob: bytes, kind: str) -> np.ndarray:
    """The real-codec integration point (PIL / librosa / ffmpeg).

    Not available in this environment — deployments override the
    decoder; the engine plumbing (schema, batching, partitioning)
    is identical either way.
    """
    raise NotImplementedError(
        "real media codecs are not installed; pass decoder=fake_decode "
        "or a codec-backed callable"
    )


def fake_decode(blob: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: FEATURE_DIM floats from the
    md5 digest of the blob (uniform in [0, 1))."""
    h = hashlib.md5(blob).digest()
    return np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(
        np.float32
    ) / np.float32(2**32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction over the blob column.

    Batch shape: input Arrow batches with (media_id, kind, blob);
    output rows add byte-size, content digest, and the decoded
    feature vector. Blobs never hit the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(b, k).tolist()
                for b, k in zip(pdf["blob"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "digest": [hashlib.md5(b).hexdigest() for b in pdf["blob"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "blob").mapInPandas(
        run, schema=MEDIA_FEATURES
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-facing slice of the extraction: deterministic scalar
    features (the vector column is covered by unit tests)."""
    return extract_features(media_table(spark, sf_dir)).select(
        "media_id", "kind", "n_bytes", "digest"
    )


MEDIA_FEATURES_SQL = """
SELECT
  doc_id AS media_id,
  (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS digest
FROM documents
"""


N_FRAMES = 3

FRAME_SCHEMA_DDL = (
    "media_id long, frame_idx int, n_frame_bytes long, frame_digest string"
)


def sample_frames(
    media: DataFrame,
    n_frames: int = N_FRAMES,
) -> DataFrame:
    """One-to-many decode: sample N_FRAMES pseudo-frames per video
    blob (mapInPandas rows-out > rows-in — the frame-sampling shape).

    A real implementation seeks keyframes with ffmpeg inside the same
    iterator; the deterministic stand-in slices the blob into N equal
    chunks. Non-video media pass through with zero rows — the
    operator is a filter+flatMap in one Arrow pass.
    """
    import pyspark.sql.types as T

    out_schema = T.StructType.fromDDL(FRAME_SCHEMA_DDL)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "n_frame_bytes", "frame_digest")}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                if kind != "video":
                    continue
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    chunk = bytes(blob[i * step : (i + 1) * step])
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["n_frame_bytes"].append(len(chunk))
                    rows["frame_digest"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "blob").mapInPandas(
        run, schema=out_schema
    )


def video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir))


# Oracle twin: the deterministic fake "frames" are substring slices of
# the utf-8 text, reproducible in SQL (video rows are doc_id % 3 == 2).
VIDEO_FRAMES_SQL = f"""
WITH vids AS (
  SELECT doc_id AS media_id, text,
         greatest(1, octet_length(encode(text)) // {N_FRAMES}) AS step
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       octet_length(encode(substr(text, CAST(i * step + 1 AS BIGINT), CAST(step AS BIGINT)))) AS n_frame_bytes,
       md5(substr(text, CAST(i * step + 1 AS BIGINT), CAST(step AS BIGINT))) AS frame_digest
FROM vids, unnest(range({N_FRAMES})) AS t(i)
"""


RESIZE_TARGET = 32  # max output side


def fake_image_decode(blob: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in image decoder: an (h, w) uint8 grayscale
    raster md5-stream-expanded from the blob bytes. Replace with a
    PIL/ffmpeg-backed callable in deployments (strict_decode seam)."""
    out = bytearray()
    cur = blob or b"\x00"
    while len(out) < w * h:
        cur = hashlib.md5(cur).digest()
        out.extend(cur)
    return np.frombuffer(bytes(out[: w * h]), dtype=np.uint8).reshape(h, w)


def resize_media(
    media: DataFrame,
    target: int = RESIZE_TARGET,
    decoder: Callable[[bytes, int, int], np.ndarray] = fake_image_decode,
    resampler: Callable[[np.ndarray, int, int], np.ndarray] | None = None,
) -> DataFrame:
    """Resize of image blobs via ``mapInPandas``.

    Batch shape: (media_id, blob, width, height) Arrow batches in,
    (media_id, out_w, out_h, n_bytes, blob) out — the resized raster
    re-serializes to a binary column, so downstream stages keep the
    same blob-plus-metadata contract. Decoding and pixel math stay in
    the Python worker (Arrow-batched); blobs never hit the driver.

    ``resampler(img, tw, th)`` is the interpolation seam (e.g.
    ``functions.models.bilinear_resize`` for real bilinear math);
    default is deterministic nearest-neighbor index picking. Output
    pixels are re-quantized to uint8 so n_bytes == tw*th regardless
    of the resampler's working dtype.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "out_w": [], "out_h": [], "n_bytes": [], "blob": []}
            for mid, blob, w, h in zip(
                pdf["media_id"], pdf["blob"], pdf["width"], pdf["height"]
            ):
                img = decoder(bytes(blob) if blob is not None else b"", int(w), int(h))
                th, tw = min(int(h), target), min(int(w), target)
                if resampler is not None:
                    resized = resampler(img, tw, th)
                else:
                    ri = (np.arange(th) * int(h)) // th
                    ci = (np.arange(tw) * int(w)) // tw
                    resized = img[np.ix_(ri, ci)]
                if resized.dtype != np.uint8:
                    resized = np.clip(np.rint(resized), 0, 255).astype(np.uint8)
                rows["media_id"].append(mid)
                rows["out_w"].append(tw)
                rows["out_h"].append(th)
                rows["n_bytes"].append(tw * th)
                rows["blob"].append(resized.tobytes())
            yield pd.DataFrame(rows)

    imgs = media.where(F.col("kind") == "image").select(
        "media_id",
        "blob",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return imgs.mapInPandas(
        run,
        schema="media_id long, out_w int, out_h int, n_bytes long, blob binary",
    )


def resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-facing projection of :func:`resize_media`: the resized
    dimensions/byte counts are pure metadata math the SQL twin can
    replay; pixel content is pinned by unit test (fake decoder is
    deterministic)."""
    return resize_media(media_table(spark, sf_dir)).select(
        "media_id", "out_w", "out_h", "n_bytes"
    )


# Derives out_w/out_h from the media CTE's meta dims (ADVICE r02):
# changing MEDIA_W/MEDIA_H or the kind rule updates both engines.
RESIZE_IMAGES_SQL = f"""
WITH {MEDIA_CTE_SQL}
SELECT media_id,
       least(width, {RESIZE_TARGET}) AS out_w,
       least(height, {RESIZE_TARGET}) AS out_h,
       CAST(least(width, {RESIZE_TARGET}) * least(height, {RESIZE_TARGET}) AS BIGINT) AS n_bytes
FROM media
WHERE kind = 'image'
"""


AUDIO_CHUNK_MS = 5000


def audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking of audio media: each clip becomes
    ceil(duration/5s) rows of (chunk_idx, start_ms, end_ms) — the
    segmentation step before a transcription/embedding model runs
    per-chunk. Pure metadata math: generate + explode, map-only (no
    blob decode; the chunk boundaries travel with the blob refs).
    """
    aud = media_table(spark, sf_dir).where(F.col("kind") == "audio")
    n = F.ceil(
        F.col("meta.duration_ms").cast("double") / F.lit(AUDIO_CHUNK_MS)
    ).cast("int")
    chunk = F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx")
    return (
        aud.where(F.col("meta.duration_ms") > 0)
        .select("media_id", F.col("meta.duration_ms").alias("dur"), chunk)
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx").cast("long") * AUDIO_CHUNK_MS).alias("start_ms"),
            F.least(
                (F.col("chunk_idx").cast("long") + 1) * AUDIO_CHUNK_MS,
                F.col("dur").cast("long"),
            ).alias("end_ms"),
        )
    )


AUDIO_CHUNKS_SQL = f"""
WITH aud AS (
  SELECT doc_id AS media_id, n_chars * 10 AS dur
  FROM documents
  WHERE doc_id % 3 = 1 AND n_chars * 10 > 0
)
SELECT media_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {AUDIO_CHUNK_MS} AS BIGINT) AS start_ms,
       least(CAST((i + 1) * {AUDIO_CHUNK_MS} AS BIGINT), CAST(dur AS BIGINT)) AS end_ms
FROM aud, unnest(range(CAST(ceil(CAST(dur AS DOUBLE) / {AUDIO_CHUNK_MS}) AS BIGINT))) AS t(i)
"""


# ---------------------------------------------------------------------------
# Chunk-fingerprint near-dup over the BINARY blob column — the
# content-defined-chunking dedup backup/CDC systems run, applied to
# media blobs: media pairs sharing >= CHUNK_MIN_SHARED fixed-size
# chunk digests are near-duplicate payload candidates (partial
# overlap that whole-blob digests miss).

CHUNK_BYTES = 64  # fixed chunk width
CHUNK_MAX_DF = 16  # drop digests present in more medias (boilerplate)
CHUNK_MIN_SHARED = 2  # pair evidence threshold


def chunk_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, digest): distinct md5 digests of the blob's
    fixed-64-byte chunks — all byte math on the BinaryType column
    (``substring``/``md5`` accept binary natively; nothing leaves the
    JVM). One row per distinct (media, chunk content)."""
    m = media_table(spark, sf_dir).select("media_id", "blob")
    n = F.greatest(
        F.ceil(F.length("blob") / F.lit(CHUNK_BYTES)).cast("int"), F.lit(1)
    )
    return (
        m.select(
            "media_id",
            "blob",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("i"),
        )
        .select(
            "media_id",
            F.md5(
                F.expr(
                    f"substring(blob, i * {CHUNK_BYTES} + 1, {CHUNK_BYTES})"
                )
            ).alias("digest"),
        )
        .distinct()
    )


def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_a, media_b, shared_chunks): media pairs sharing at
    least ``CHUNK_MIN_SHARED`` distinct chunk digests, after dropping
    digests whose document frequency exceeds ``CHUNK_MAX_DF``.

    Scale shape: the exact-dedup discipline — digest-keyed buckets,
    never all-pairs. The DF cap bounds per-digest fan-out at
    CHUNK_MAX_DF^2 pair emissions (ubiquitous chunks are boilerplate,
    not dup evidence — the same reasoning as LSH band caps), so the
    pair relation is O(n_chunks * MAX_DF), linear in corpus bytes.
    """
    ch = chunk_digests(spark, sf_dir)
    df = ch.groupBy("digest").agg(F.count(F.lit(1)).alias("df"))
    ok = ch.join(df.where(F.col("df") <= CHUNK_MAX_DF), "digest")
    return (
        ok.select("digest", F.col("media_id").alias("media_a"))
        .join(
            ok.select("digest", F.col("media_id").alias("media_b")),
            "digest",
        )
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .where(F.col("shared_chunks") >= CHUNK_MIN_SHARED)
    )


# Oracle twin: blobs are utf-8 text (ASCII in the driver corpus, so
# byte slicing == char slicing — the same equivalence VIDEO_FRAMES_SQL
# rests on); digests replay as md5 over the text slices.
CHUNK_DEDUP_SQL = f"""
WITH chunks AS (
  SELECT DISTINCT doc_id AS media_id,
         md5(substr(text, CAST(i * {CHUNK_BYTES} + 1 AS BIGINT),
                    {CHUNK_BYTES})) AS digest
  FROM documents,
       unnest(range(greatest(CAST(ceil(octet_length(encode(text))
                    / {CHUNK_BYTES}.0) AS BIGINT), 1))) AS t(i)
),
ok AS (
  SELECT media_id, digest FROM chunks
  QUALIFY count(*) OVER (PARTITION BY digest) <= {CHUNK_MAX_DF}
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(count(*) AS BIGINT) AS shared_chunks
FROM ok a JOIN ok b ON a.digest = b.digest AND a.media_id < b.media_id
GROUP BY 1, 2
HAVING count(*) >= {CHUNK_MIN_SHARED}
"""
