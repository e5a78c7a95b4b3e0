"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata — the same shape the
crawl engine already stores page bodies in (pages.html is binary).
`decode_media` REALLY decodes the containers that need no codec library
(uncompressed 24-bit BMP, binary PPM, PCM WAV — stdlib+numpy), feeding
`extract_decoded_features` (per-channel means, nearest-neighbor thumbnail
resize, audio RMS/duration). Codec formats (png/jpeg/mp4/…) raise the
declared NotImplementedError stub — PIL/ffmpeg are absent from this
container; they drop into the same dispatch on a real cluster. The
byte-level featurizer (`fake_features`) remains for format-agnostic
statistics, so the Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partitioning — is real and tested on BOTH paths.

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


# ---------------------------------------------------------------------------
# real decode for container-decodable formats (stdlib/numpy only):
# uncompressed BMP (24-bit), PCM WAV, binary PPM. Codec formats (png/jpeg/
# mp4/…) keep the declared stub — PIL/ffmpeg are absent in this container.
# ---------------------------------------------------------------------------


def _encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (BITMAPINFOHEADER), used by
    the synthetic generator and tests. pixels: (h, w, 3) uint8 RGB."""
    import struct

    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        pixels[y, :, ::-1].tobytes() + b"\x00" * pad  # BGR rows, bottom-up
        for y in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def _decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) uint8 RGB."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", data, 10)[0]
    size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((abs(h), w, 3), dtype=np.uint8)
    off = data_off
    rows = range(abs(h) - 1, -1, -1) if h > 0 else range(abs(h))
    for y in rows:
        out[y] = np.frombuffer(data, np.uint8, row, off).reshape(w, 3)[:, ::-1]
        off += row + pad
    return out


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV → (samples int16 mono-mixed, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        raw = wf.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch).mean(axis=1)
    return samples.astype(np.float64), sr


def _decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8."""
    parts = data.split(maxsplit=4)
    if parts[0] != b"P6":
        raise ValueError("not a binary PPM")
    w, h, maxv = int(parts[1]), int(parts[2]), int(parts[3])
    if maxv > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    return np.frombuffer(parts[4][: w * h * 3], np.uint8).reshape(h, w, 3)


def decode_media(content: bytes, mime: str):
    """Decode to a typed payload where the container needs no codec lib:
      image/bmp → {'kind':'image','pixels':(h,w,3) uint8}
      image/x-portable-pixmap → same
      audio/wav → {'kind':'audio','samples':float64[],'sample_rate':int}
    Codec formats (png/jpeg/mp4/webm/…) raise the declared stub error —
    swap PIL/ffmpeg into this dispatch on a real cluster."""
    m = (mime or "").lower()
    if m in ("image/bmp", "image/x-ms-bmp"):
        return {"kind": "image", "pixels": _decode_bmp(content)}
    if m in ("image/x-portable-pixmap", "image/ppm"):
        return {"kind": "image", "pixels": _decode_ppm(content)}
    if m in ("audio/wav", "audio/x-wav", "audio/wave"):
        samples, sr = _decode_wav(content)
        return {"kind": "audio", "samples": samples, "sample_rate": sr}
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; "
        "swap in PIL/ffmpeg here on a real cluster"
    )


def resize_image(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index sampling) — deterministic,
    no interpolation library needed."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)]


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


DECODED_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType()), True),
        T.StructField("thumb64", T.BinaryType(), True),  # 8x8 RGB thumbnail
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decoded_features_row(
    media_id: int, mime: str, content: bytes | None,
    thumb: tuple[int, int] = (8, 8),
) -> dict:
    """Pure per-row decode→feature pipeline — the single source of truth
    shared by the Spark UDF below AND the DuckDB oracle generator
    (tools/gen_media_oracle.py), so the contract check verifies the Spark
    PLUMBING (Arrow batching, schema, partitioning) bit-for-bit."""
    tw, th = thumb
    out = {
        "media_id": int(media_id), "decoded": False, "kind": None,
        "width": None, "height": None, "mean_rgb": None,
        "thumb64": None, "sample_rate": None, "duration_ms": None,
        "rms": None, "decode_error": None,
    }
    try:
        d = decode_media(bytes(content) if content is not None else b"", mime)
        out["decoded"] = True
        out["kind"] = d["kind"]
        if d["kind"] == "image":
            px = d["pixels"]
            out["height"], out["width"] = int(px.shape[0]), int(px.shape[1])
            out["mean_rgb"] = [float(x) for x in px.mean(axis=(0, 1))]
            out["thumb64"] = resize_image(px, tw, th).tobytes()
        else:
            s, sr = d["samples"], d["sample_rate"]
            out["sample_rate"] = int(sr)
            out["duration_ms"] = int(1000 * len(s) / sr) if sr else 0
            out["rms"] = float(np.sqrt((s ** 2).mean())) if len(s) else 0.0
    except NotImplementedError as e:
        out["decode_error"] = str(e)
    return out


def extract_decoded_features(
    media: DataFrame, thumb: tuple[int, int] = (8, 8)
) -> DataFrame:
    """REAL decode → feature-extract → resize pipeline over the binary
    column (Arrow mapInPandas; bytes never leave the executor): BMP/PPM
    images yield per-channel means + a nearest-neighbor thumbnail, PCM WAV
    yields sample-rate/duration/RMS. Rows whose mime needs an absent codec
    come back decoded=false with the stub error recorded — the pipeline
    shape is identical when PIL/ffmpeg replace the dispatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                decoded_features_row(mid, mime, content, thumb)
                for mid, mime, content in zip(
                    b["media_id"], b["mime"], b["content"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_FEATURES.fields])

    return media.mapInPandas(run, schema=DECODED_FEATURES)


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


def synthetic_media_row(i: int) -> dict:
    """Pure per-id synthetic media row — shared by the Spark generator and
    the oracle generator (tools/gen_media_oracle.py)."""
    import io
    import wave

    i = int(i)
    rng = np.random.default_rng(seed=i)
    kind = ["image", "audio", "video", "image"][i % 4]
    mime = ["image/bmp", "audio/wav", "video/mp4", "image/png"][i % 4]
    w = h = dur = None
    if mime == "image/bmp":
        w, h = 16 + (i % 8) * 4, 12 + (i % 6) * 4
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        content = _encode_bmp(px)
    elif mime == "audio/wav":
        sr, n_s = 8000, 800 + (i % 10) * 80
        dur = int(1000 * n_s / sr)
        samples = (
            (np.sin(np.arange(n_s) * (0.01 + 0.001 * (i % 7))) * 12000)
            .astype("<i2")
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(samples.tobytes())
        content = buf.getvalue()
    else:
        size = 1024 + (i * 977) % 8192
        content = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        if kind == "video":
            dur = 1000 + (i % 60) * 500
    return {
        "media_id": i, "kind": kind, "content": content,
        "mime": mime, "width": w, "height": h, "duration_ms": dur,
    }


def synthetic_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table: REAL decodable payloads where the
    container needs no codec (image/bmp, audio/wav) interleaved with
    codec-format rows (image/png, video/mp4 — opaque deterministic bytes),
    so both the decode path and the stub path are exercised."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([synthetic_media_row(i) for i in b["id"]])

    rng_df = spark.range(n)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=MEDIA)
