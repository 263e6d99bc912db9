"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The decoders themselves are STUBBED in this
environment (no image/audio libs in the container) behind
``DeterministicFakeDecoder`` (seeded, content-derived — fully testable) and
``LibraryDecoder`` (uses Pillow/soundfile when importable on the cluster,
falling back to the deterministic decoder otherwise). The Spark-side
contract — schemas, batch iteration, partitioning, UDF signatures — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, content_hash long, "
    "features array<float>"
)


class LibraryDecoder:
    """Real decoder: Pillow for images and soundfile for audio, when those
    libraries are importable on the cluster; otherwise (or when a payload
    fails to parse) it falls back to ``DeterministicFakeDecoder`` so a
    pipeline never dies on a missing optional dependency. Imports happen
    lazily inside ``decode`` so the module always loads."""

    def __init__(self, feature_dim: int = 16, fallback=None):
        self.feature_dim = feature_dim
        self.fallback = fallback or DeterministicFakeDecoder(feature_dim)

    def _image_features(self, payload: bytes) -> "np.ndarray | None":
        try:
            import io

            from PIL import Image
        except ImportError:
            return None
        try:
            img = Image.open(io.BytesIO(payload)).convert("L")
        except Exception:  # undecodable bytes → fallback
            return None
        arr = np.asarray(img, dtype=np.float32) / 255.0
        # luminance profile: row means ++ column means, resampled to dim
        prof = np.concatenate([arr.mean(axis=1), arr.mean(axis=0)])
        idx = np.linspace(0, len(prof) - 1, self.feature_dim).astype(np.int64)
        return prof[idx].astype(np.float32)

    def _audio_features(self, payload: bytes) -> "np.ndarray | None":
        try:
            import io

            import soundfile as sf
        except ImportError:
            return None
        try:
            data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        except Exception:
            return None
        mono = data if data.ndim == 1 else data.mean(axis=1)
        if mono.size == 0:
            return np.zeros(self.feature_dim, dtype=np.float32)
        # RMS energy per equal-width window
        splits = np.array_split(mono, self.feature_dim)
        return np.asarray(
            [float(np.sqrt(np.mean(np.square(s)))) if s.size else 0.0 for s in splits],
            dtype=np.float32,
        )

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "image":
            out = self._image_features(payload)
        elif kind == "audio":
            out = self._audio_features(payload)
        else:  # video frame decode needs pyav; always delegated for now
            out = None
        return out if out is not None else self.fallback.decode(payload, kind)


class DeterministicFakeDecoder:
    """Deterministic stand-in: derives a float array from the payload bytes.
    Lets every Spark-side stage (batching, schema, hashing, feature shape)
    be exercised for real."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(self.feature_dim, dtype=np.float32)
        # content-derived, deterministic 'features': bucketed byte histogram
        hist = np.bincount(arr % self.feature_dim, minlength=self.feature_dim)
        return (hist / arr.size).astype(np.float32)


def extract_features(
    media: DataFrame, decoder=None, batch_size_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    Partitioning note: payloads are large — the input should be partitioned
    by size (``maxPartitionBytes``) so a batch fits executor memory; the
    output is narrow (id + features).
    """
    dec = decoder or DeterministicFakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            kinds = pdf["meta"].apply(lambda m: (m or {}).get("kind", "image"))
            feats = [
                dec.decode(bytes(p), k).tolist() for p, k in zip(payloads, kinds)
            ]
            hashes = [
                np.int64(
                    np.bitwise_xor.reduce(
                        np.frombuffer(bytes(p), dtype=np.uint8).astype(np.uint64)
                        * np.uint64(1099511628211)
                    )
                    if len(p)
                    else np.uint64(0)
                )
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": payloads.apply(len).astype("int64"),
                    "content_hash": pd.Series(hashes, dtype="int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps per clip JVM-side;
    the decode of each frame is the stubbed stage."""
    return media.filter(F.col("meta.kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def generate_fake_media(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic binary fixtures (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.randint(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m-{i:05d}",
                bytearray(payload),
                (kind, f"{kind}/x-fake", 64, 64, 5000 if kind == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
