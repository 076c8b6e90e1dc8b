"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing (schemas, batch shapes,
mapInPandas signatures, partitioning) is real and tested; the actual
codec work is STUBBED — the decode libs (PIL/ffmpeg/librosa) are not in
this container. ``decode_stub=True`` substitutes a deterministic fake
(features derived from the payload hash) so the distributed plumbing
can be exercised end-to-end; ``decode_stub=False`` raises
NotImplementedError at the decode boundary, marking exactly where a
real codec plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, n_bytes int"


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: dim floats
    derived from the payload digest (NOT a real image feature)."""
    if payload is None:
        return [0.0] * dim
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32).tolist()


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas featurizer: (media rows) → (media_id, feature).

    Batch shape: Arrow batches of binary payloads; a real implementation
    decodes per batch (vectorized) and runs the model once per batch.
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this image"
                )
            feats = [_fake_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(body, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling plumbing for video rows: 1 row → N frame rows
    (flatMap shape). Frame payload decode is stubbed; the row expansion,
    schema, and timestamps are real."""
    schema = "media_id string, frame_idx int, frame_ts_ms int, frame_feature array<float>"

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode requires ffmpeg")
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                duration = (meta or {}).get("duration_ms") or 0
                n = max(duration // every_ms, 1)
                for i in range(int(n)):
                    seed = (mid + f"#{i}").encode()
                    rows.append(
                        (mid, i, i * every_ms, _fake_feature(seed, dim=8))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_feature"],
            )

    return df.filter(df.kind == "video").mapInPandas(body, schema)
