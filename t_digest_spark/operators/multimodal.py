"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata. The Spark
side — schemas, partition-preserving ``mapInPandas`` transforms, Arrow batch
shapes, deterministic fake featurization for tests — is real; the actual
codec calls are STUBBED (no image/audio libraries in this environment) behind
``decode_stub`` which raises NotImplementedError unless the deterministic
fake decoder is requested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int, n_frames int")

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_norm double"


def synthetic_media(df_ids: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows from an id column (for plumbing tests)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [hashlib.sha256(f"media{(int(i))}".encode()).digest() * 8
                        for i in ids]
            yield pd.DataFrame({
                "media_id": ids, "kind": kind, "payload": payloads,
                "width": 64 + (ids % 64), "height": 64 + (ids % 48),
                "sample_rate": np.where(kind == "audio", 16000, 0),
                "n_frames": 1 + (ids % 16),
            })
    return df_ids.mapInPandas(gen, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str):
    """Real decode would go here (PIL/librosa/ffmpeg). Not available in this
    environment — see extract_features(fake=True) for the deterministic fake."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not present "
        "in this environment; use extract_features(..., fake=True)")


def extract_features(media_df: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """Feature extraction over media binary columns via mapInPandas.

    With fake=True, features are a deterministic function of the payload bytes
    (hash-seeded), so the distributed plumbing (batching, schema, norms) is
    fully testable without codecs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            norms = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if not fake:
                    decode_stub(payload, kind)  # raises: real codecs absent
                h = hashlib.sha256(bytes(payload)).digest()
                raw = np.frombuffer((h * ((4 * dim) // len(h) + 1))[:4 * dim],
                                    dtype=np.uint32).astype(np.float64)
                vec = (raw / np.iinfo(np.uint32).max - 0.5).astype(np.float32)
                feats.append(vec)
                norms.append(float(np.linalg.norm(vec)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "kind": pdf["kind"],
                                "feature": feats, "feat_norm": norms})

    return media_df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one output row per kept frame index, metadata
    only (decode is the stubbed step). JVM-side explode."""
    return media_df.select(
        "media_id", "kind", "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
                  ).alias("frame_idx"))
