"""Multimodal column conventions + Arrow-batched processing plumbing.

Convention (north star): media travel as opaque ``binary`` columns
with a typed metadata struct alongside:

    content   BINARY                    -- raw bytes (image/audio/video)
    media     STRUCT<mime: STRING,      -- container/type tag
                     n_bytes: BIGINT,
                     checksum: STRING>  -- md5 of the bytes

Real decode (PIL / torchaudio / ffmpeg) is NOT available in this
container, so the decode kernels are deliberately split:

- the Spark-side plumbing (schemas, mapInPandas batch shape, explode
  of per-frame rows, partitioning) is REAL and tested;
- the byte→pixels step is a clearly marked seam:
  ``decode_image_batch(..., decoder=None)`` raises
  ``NotImplementedError`` unless given a decoder callable or
  ``fake=True`` (a deterministic stand-in deriving "features" from the
  bytes themselves, so pipelines are testable end-to-end).

At 100 TB: binary columns dominate row size → keep them OUT of
shuffles (project metadata early, join features back by id), size
``maxPartitionBytes`` down so an Arrow batch of blobs fits executor
memory, and store media in separate column chunks (Parquet already
does) so metadata-only queries never read the bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "mime string, n_bytes bigint, checksum string"
IMAGE_FEATURE_SCHEMA = (
    "id long, width int, height int, mean_intensity double, phash string"
)
FRAME_SCHEMA = "id long, frame_idx int, frame_ts_ms bigint, frame_checksum string"


def attach_media(df: DataFrame, bytes_col: str, mime: str) -> DataFrame:
    """Attach the metadata struct for an existing binary column —
    expression-only (md5/length run JVM-side over the bytes)."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(bytes_col)).cast("bigint").alias("n_bytes"),
            F.md5(F.col(bytes_col)).alias("checksum"),
        ),
    )


def text_as_binary(df: DataFrame, text_col: str, out_col: str = "content") -> DataFrame:
    """Test helper: UTF-8 bytes of a text column as the opaque blob."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _round_half_up(x: float, digits: int) -> float:
    """SQL-style round (half away from zero for positives) — Python's
    built-in round() is banker's and disagrees with every SQL engine
    exactly at representable .5 boundaries."""
    import math

    scale = 10**digits
    return math.floor(x * scale + 0.5) / scale


def _fake_image_features(blob: bytes) -> tuple[int, int, float, str]:
    """Deterministic stand-in for image decode: derives plausible
    (width, height, mean_intensity, phash) purely from the bytes."""
    import hashlib

    h = hashlib.md5(blob).hexdigest()
    width = 64 + (len(blob) % 512)
    height = 64 + (int(h[:4], 16) % 512)
    mean_intensity = _round_half_up(
        (sum(blob[:256]) / max(min(len(blob), 256), 1)) / 255.0, 6
    )
    return width, height, mean_intensity, h[:16]


def decode_image_batch(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    decoder: Callable[[bytes], tuple[int, int, float, str]] | None = None,
    fake: bool = False,
) -> DataFrame:
    """Image feature extraction over Arrow batches (``mapInPandas``).

    ``decoder`` maps raw bytes → (width, height, mean_intensity, phash).
    Pass a real decoder (e.g. PIL-based) in a full environment; in this
    container use ``fake=True`` for the deterministic stand-in. The
    Spark plumbing — Arrow batch iteration, schema, distribution — is
    identical either way.
    """
    if decoder is None:
        if not fake:
            raise NotImplementedError(
                "image decoding requires PIL/cv2 (not in this container); "
                "pass decoder=... or fake=True"
            )
        decoder = _fake_image_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(b) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_intensity": [f[2] for f in feats],
                    "phash": [f[3] for f in feats],
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


RESIZE_SCHEMA = "id long, target_w int, target_h int, orig_bytes bigint, resized_checksum string"
AUDIO_FEATURE_SCHEMA = (
    "id long, sample_rate int, n_samples bigint, duration_s double, rms double"
)


def resize_image_batch(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing over Arrow batches: blob → resized blob →
    (dims, checksum of the result). Without a real ``resizer`` (PIL is
    absent here) the output bytes are the deterministic stand-in
    ``blob + b'@WxH'`` — so the whole distributed path, including the
    checksum of the *produced* bytes, is verifiable end-to-end."""
    import hashlib

    def fake_resize(blob: bytes, w: int, h: int) -> bytes:
        return blob + f"@{w}x{h}".encode()

    resize = resizer or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = list(pdf[bytes_col])
            resized = [resize(b, width, height) for b in blobs]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "target_w": width,
                    "target_h": height,
                    "orig_bytes": [len(b) for b in blobs],
                    "resized_checksum": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(run, RESIZE_SCHEMA)


def audio_features_batch(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
    fake: bool = False,
) -> DataFrame:
    """Audio feature extraction plumbing (sample_rate, n_samples, rms)
    over Arrow batches — same seam pattern as ``decode_image_batch``:
    real decoder (torchaudio/ffmpeg) injected in a full environment,
    deterministic byte-derived stand-in under ``fake=True``."""
    if decoder is None:
        if not fake:
            raise NotImplementedError(
                "audio decoding requires torchaudio/ffmpeg (not in this "
                "container); pass decoder=... or fake=True"
            )

        def decoder(blob: bytes) -> tuple[int, int, float]:
            rate = 16000 if len(blob) % 2 == 0 else 44100
            n = len(blob) * 256
            rms = _round_half_up(
                (sum(blob[:128]) / max(min(len(blob), 128), 1)) / 255.0, 6
            )
            return rate, n, rms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(b) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "sample_rate": [f[0] for f in feats],
                    "n_samples": [f[1] for f in feats],
                    "duration_s": [_round_half_up(f[1] / f[0], 6) for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    fps_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: one output row per
    sampled frame (id, frame_idx, frame_ts_ms, frame_checksum).
    Frame count is derived deterministically from the blob (stub for a
    container parse); the explode/distribution shape is the real thing.
    """
    n_frames = (F.length(F.col(bytes_col)) % max_frames + 1).cast("int")
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(bytes_col).alias("__b"),
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "__f"),
        )
        .select(
            "id",
            "frame_idx",
            (F.col("frame_idx").cast("bigint") * fps_ms).alias("frame_ts_ms"),
            F.md5(
                F.concat(
                    F.col("__b"),
                    F.encode(
                        F.concat(F.lit("#"), F.col("frame_idx").cast("string")), "UTF-8"
                    ),
                )
            ).alias("frame_checksum"),
        )
    )
