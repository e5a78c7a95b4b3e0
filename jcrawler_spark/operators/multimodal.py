"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata — the same shape the
crawl engine already stores page bodies in (pages.html is binary). The
decode step needs codec libraries absent from this container, so it is
STUBBED behind `decode_media` (raises NotImplementedError) with a
deterministic fake featurizer (`fake_features`) standing in so the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested.

Scale notes: media bytes never leave the executor; feature extraction is
mapInPandas over Arrow batches (zero-copy binary), so a real decoder drops
in by replacing one function. Frame sampling for video is expressed as a
deterministic byte-stride here; with a real codec it becomes keyframe
selection with the same row-multiplying mapInPandas shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram16", T.ArrayType(T.LongType()), False),
    ]
)


def decode_media(content: bytes, mime: str):
    """Real decode — requires PIL/ffmpeg/soundfile, absent here by design."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "swap in PIL/ffmpeg here on a real cluster"
    )


def fake_features(content: bytes) -> dict:
    """Deterministic stand-in features from raw bytes (no codec)."""
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return {
            "n_bytes": 0, "byte_mean": 0.0, "byte_entropy": 0.0,
            "histogram16": [0] * 16,
        }
    hist = np.bincount(arr >> 4, minlength=16).astype(np.int64)
    p = hist / arr.size
    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    return {
        "n_bytes": int(arr.size),
        "byte_mean": float(arr.mean()),
        "byte_entropy": ent,
        "histogram16": hist.tolist(),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, content in zip(b["media_id"], b["content"]):
                f = fake_features(bytes(content) if content is not None else b"")
                f["media_id"] = int(mid)
                rows.append(f)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FEATURES)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Deterministic 'frame' sampling stub: one row per byte-stride chunk
    (kind=video only) — exercises the row-multiplying mapInPandas shape a
    real keyframe sampler has."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, kind, content in zip(b["media_id"], b["kind"], b["content"]):
                if kind != "video" or content is None:
                    continue
                raw = bytes(content)
                for fi, off in enumerate(range(0, len(raw), every_n_bytes)):
                    chunk = raw[off : off + every_n_bytes]
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_index": fi,
                            "offset": off,
                            "frame_bytes": chunk,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_index", "offset", "frame_bytes"],
            )

    return media.mapInPandas(
        run,
        schema="media_id long, frame_index int, offset long, frame_bytes binary",
    )


def synthetic_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (bytes derived from media_id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng(seed=i)
                size = 1024 + (i * 977) % 8192
                rows.append(
                    {
                        "media_id": i,
                        "kind": kinds[i % 3],
                        "content": rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        "mime": ["image/png", "audio/wav", "video/mp4"][i % 3],
                        "width": 64 + (i % 32) * 8 if i % 3 == 0 else None,
                        "height": 64 + (i % 24) * 8 if i % 3 == 0 else None,
                        "duration_ms": 1000 + (i % 60) * 500 if i % 3 != 0 else None,
                    }
                )
            yield pd.DataFrame(rows)

    rng_df = spark.range(n)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=MEDIA)
