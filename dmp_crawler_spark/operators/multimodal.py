"""Multimodal (image/audio/video) column plumbing for the pages pipeline.

Media payloads are opaque `binary` columns + a typed metadata struct —
the same pattern as the `html binary` column in the pages table. The
Spark-side plumbing (schemas, Arrow batch shape, mapInPandas signatures,
partition hygiene: media bytes are column-pruned out of every non-decode
stage) is real and tested; the actual codec work is stubbed behind
DETERMINISTIC fakes because the image/audio libraries are not in this
container — each stub is clearly marked and raises NotImplementedError
when `strict=True`.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
    T.StructField("n_bytes", T.IntegerType(), False),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake for the codec step. A real deployment
    plugs Pillow/torchaudio/ffmpeg here; the container lacks them, so the
    'decoded features' are a seeded hash expansion of the payload bytes.
    The Spark plumbing around it (Arrow batches, schema, pruning) is what
    this module actually tests."""
    h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 4).digest()
    return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, kind, payload) → FEATURE_DIM float features per item.
    Column-prunes to exactly the needed columns before the Python stage."""
    if strict:
        raise NotImplementedError(
            "real media decode requires Pillow/ffmpeg — not available in this "
            "environment; run with strict=False for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_features(p).tolist() for p in pdf["payload"].values]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "feature": feats,
                "n_bytes": [len(p or b"") for p in pdf["payload"].values],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video frame sampling: one 'frame' per every_ms of duration.
    STUB decode — frames are deterministic hashes of (payload, idx); the
    UDTF-style explode shape (one input row → N output rows) is real."""
    if strict:
        raise NotImplementedError("real frame decode requires ffmpeg")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"].values, pdf["payload"].values, pdf["duration_ms"].values
            ):
                dur = 0 if dur is None or pd.isna(dur) else int(dur)  # null → NaN in pandas
                n = max(1, dur // every_ms)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.blake2b((payload or b"") + struct.pack("<i", i),
                                        digest_size=32).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    cols = media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return cols.mapInPandas(run, FRAME_SCHEMA)


def _media_row(i: int) -> dict:
    kind = ["image", "audio", "video"][i % 3]
    payload = hashlib.blake2b(str(i).encode(), digest_size=64).digest()
    return {
        "media_id": i, "kind": kind,
        "mime": {"image": "image/jpeg", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
        "payload": payload,
        "meta": {
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "duration_ms": 3000 + (i % 5) * 1000 if kind != "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        },
    }


def _gen_media(id_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([_media_row(int(i)) for i in pdf[id_col].values],
                               columns=[f.name for f in MEDIA_SCHEMA.fields])
    return gen


def generate_media(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded payload bytes)."""
    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        _gen_media("id"), MEDIA_SCHEMA)


def media_from_ids(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic media rows keyed by an EXISTING id column — lets a
    harness-replayed query derive its media table from a parquet table
    (e.g. documents.doc_id) instead of self-generating, so an external
    oracle can re-derive the identical shape from the same source table."""
    return ids.select(id_col).mapInPandas(_gen_media(id_col), MEDIA_SCHEMA)
