"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec step is STUBBED because the
sandbox has no image/audio libraries: ``decode_media`` raises
``NotImplementedError`` for real codecs and offers a deterministic fake
("bytes are the pixels") so the pipeline is end-to-end verifiable. At
scale, each batch is one Arrow transfer of the binary column; kernels are
pure per-partition passes (no shuffle), so media featurization runs at
scan speed and parallelism = input splits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import register

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, mime string, width int, height int, "
    "n_frames int, sample_rate int"
)
FEATURE_SCHEMA = "media_id bigint, n_bytes bigint, mean_byte double, max_byte int, checksum string"


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Decode one media payload to a sample array.

    Real codecs (image/jpeg, audio/wav, video/mp4) need PIL/ffmpeg — not in
    this container — so they raise. ``application/fake`` treats the raw
    bytes as samples (deterministic, used by tests and the driver check).
    """
    if mime == "application/fake":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"codec for {mime!r} requires external libraries (PIL/soundfile/ffmpeg); "
        "only the deterministic 'application/fake' codec exists in-sandbox"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from documents: payload =
    md5(text) bytes (a stand-in for an image blob), typed metadata columns."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("application/fake").alias("mime"),
        F.lit(4).alias("width"),
        F.lit(4).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas): decode →
    byte statistics + checksum. The shape every real featurizer (CLIP
    embedding, mel spectrogram, frame sampler) plugs into."""

    def kernel(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                arr = decode_media(bytes(payload), mime)
                rows.append({
                    "media_id": int(mid),
                    "n_bytes": int(arr.size),
                    "mean_byte": float(arr.sum()) / arr.size if arr.size else 0.0,
                    "max_byte": int(arr.max()) if arr.size else 0,
                    # checksum over the hex rendering (SQL-checkable: DuckDB
                    # md5() only takes VARCHAR)
                    "checksum": hashlib.md5(arr.tobytes().hex().encode()).hexdigest(),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updates flow through; pixel resample raises
    inside decode for real mimes (documented stub)."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_hex string, frame_mean double"


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling plumbing (video path): split the payload into
    ``n_frames`` equal byte-slices ("frames" under the fake codec), keep
    every ``every_k``-th. Same mapInPandas shape a real ffmpeg keyframe
    sampler plugs into; one Arrow pass, no shuffle."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload, mime, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"], pdf["n_frames"]
            ):
                arr = decode_media(bytes(payload), mime)
                n_frames = max(int(n_frames), 1)
                flen = arr.size // n_frames
                for fi in range(0, n_frames, every_k):
                    fr = arr[fi * flen:(fi + 1) * flen]
                    rows.append({
                        "media_id": int(mid),
                        "frame_idx": fi,
                        "frame_hex": fr.tobytes().hex(),
                        "frame_mean": float(fr.sum()) / fr.size if fr.size else 0.0,
                    })
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 2nd of 4 frames per media item (frames 0 and 2)."""
    media = media_table(spark, sf_dir).withColumn("n_frames", F.lit(4))
    return sample_frames(media, every_k=2).orderBy("media_id", "frame_idx")


MULTIMODAL_FRAMES_SQL = """
WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
fr AS (
    SELECT media_id, f AS frame_idx, substr(h, 8 * f + 1, 8) AS fhex
    FROM m, (SELECT unnest([0, 2]) AS f)
),
b AS (
    SELECT media_id, frame_idx,
           ('0x' || substr(fhex, 2 * i + 1, 2))::INT AS byte
    FROM fr, (SELECT unnest(generate_series(0, 3)) AS i)
)
SELECT fr.media_id, fr.frame_idx, fr.fhex AS frame_hex,
       sum(b.byte)::DOUBLE / 4 AS frame_mean
FROM fr JOIN b USING (media_id, frame_idx)
GROUP BY 1, 2, 3 ORDER BY 1, 2"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir)).orderBy("media_id")


MULTIMODAL_FEATURES_SQL = """
WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
b AS (
    SELECT media_id, ('0x' || substr(h, 2 * i + 1, 2))::INT AS byte
    FROM m, (SELECT unnest(generate_series(0, 15)) AS i)
)
SELECT b.media_id,
       16::BIGINT AS n_bytes,
       sum(b.byte)::DOUBLE / 16 AS mean_byte,
       max(b.byte)::INTEGER AS max_byte,
       md5(any_value(m.h)) AS checksum
FROM b JOIN m USING (media_id)
GROUP BY b.media_id
ORDER BY media_id"""


register("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_SQL)
register("multimodal_frames", multimodal_frames, MULTIMODAL_FRAMES_SQL)
