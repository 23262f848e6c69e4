"""Multimodal (binary) column plumbing: typed metadata, deterministic byte
feature extraction, and stubbed decode operators with real Spark plumbing.

Training-data extension (no reference impl). Media payloads are opaque
`binary` columns + typed metadata; compute-heavy steps run as Arrow-batched
mapInPandas with explicit schemas and partition-sized batches. The container
has no image/audio codecs, so `decode_image`/`sample_frames` gate the actual
codec call behind an injectable decoder (default raises NotImplementedError),
while `binary_byte_stats` is a real, deterministic feature extractor used to
validate the batch shape / schema / partitioning plumbing end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

BYTE_STATS_SCHEMA = (
    "id bigint, n_bytes bigint, n_distinct int, entropy double, head_hex string"
)


def binary_byte_stats(df: DataFrame, id_col: str = "id", bin_col: str = "media") -> DataFrame:
    """Deterministic per-blob features: size, distinct byte values, byte
    entropy (bits), first-8-bytes hex (magic sniffing). Arrow-batched."""

    def stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"id": [], "n_bytes": [], "n_distinct": [], "entropy": [], "head_hex": []}
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                rows["id"].append(int(i))
                if blob is None:
                    rows["n_bytes"].append(0)
                    rows["n_distinct"].append(0)
                    rows["entropy"].append(0.0)
                    rows["head_hex"].append("")
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                rows["n_bytes"].append(int(arr.size))
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    rows["entropy"].append(float(-(p * np.log2(p)).sum()))
                    rows["n_distinct"].append(int((counts > 0).sum()))
                else:
                    rows["entropy"].append(0.0)
                    rows["n_distinct"].append(0)
                rows["head_hex"].append(bytes(blob[:8]).hex())
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        stats, schema=BYTE_STATS_SCHEMA
    )


def media_metadata(df: DataFrame, bin_col: str = "media") -> DataFrame:
    """Cheap Catalyst-side metadata: byte length + magic-based type sniff."""
    head = F.hex(F.substring(F.col(bin_col), 1, 4))
    return df.withColumn("media_bytes", F.octet_length(F.col(bin_col))).withColumn(
        "media_kind",
        F.when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("89504E47"), "png")
        .when(head.startswith("52494646"), "riff")
        .otherwise("unknown"),
    )


def _default_decoder(blob: bytes):
    raise NotImplementedError(
        "no image/audio codec in this environment — inject a decoder "
        "(bytes -> np.ndarray) to run real decode"
    )


def fake_decoder(blob: bytes):
    """Deterministic stand-in decoder: 8x8 'pixels' derived from byte
    content (for plumbing tests only, clearly not a real codec)."""
    import numpy as np

    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
    if arr.size == 0:
        return np.zeros((8, 8), dtype=np.uint8)
    reps = int(math.ceil(64 / arr.size))
    return np.tile(arr, reps)[:64].reshape(8, 8)


DECODE_SCHEMA = "id bigint, height int, width int, mean_px double"


def decode_image_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "media", decoder=None
) -> DataFrame:
    """Decode → feature(mean pixel) over Arrow batches. Real Spark plumbing
    (schema, batching, partition parallelism); decode step is injected."""
    dec = decoder or _default_decoder

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"id": [], "height": [], "width": [], "mean_px": []}
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                img = dec(blob if blob is not None else b"")
                rows["id"].append(int(i))
                rows["height"].append(int(img.shape[0]))
                rows["width"].append(int(img.shape[1]) if img.ndim > 1 else 1)
                rows["mean_px"].append(float(img.mean()))
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(run, schema=DECODE_SCHEMA)


def chunk_audio_layout(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "media",
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    chunk_ms: int = 250,
) -> DataFrame:
    """Fixed-duration chunking LAYOUT for an opaque PCM audio column,
    computed purely from byte lengths + container metadata — the
    training-pipeline step that decides segment boundaries BEFORE any
    codec runs (each chunk row later feeds the decode/feature UDF).
    Because no decode is needed, this stays whole-stage-codegen Catalyst
    (octet_length → sequence → explode), unlike the injectable-decoder
    ops above. All outputs exact integers.

    Rows: (id, chunk_idx, start_byte, chunk_bytes, start_ms); empty/NULL
    blobs produce no rows."""
    bpc = sample_rate * bytes_per_sample * chunk_ms // 1000
    if bpc < 1:
        raise ValueError("chunk shorter than one sample")
    n = F.coalesce(F.octet_length(F.col(bin_col)), F.lit(0))
    n_chunks = F.floor((n + bpc - 1) / F.lit(bpc)).cast("long")
    base = df.select(
        F.col(id_col),
        n.cast("long").alias("_nb"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    start = F.col("chunk_idx").cast("long") * bpc
    return base.filter(F.col("_nb") > 0).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.alias("start_byte"),
        F.least(F.lit(bpc).cast("long"), F.col("_nb") - start).alias("chunk_bytes"),
        (F.col("chunk_idx").cast("long") * chunk_ms).alias("start_ms"),
    )


FRAME_SCHEMA = "id bigint, frame_idx int, ts_ms bigint, mean_px double"


def _default_video_decoder(blob: bytes, every_ms: int):
    raise NotImplementedError(
        "no video codec in this container: inject decoder=(blob, every_ms) -> "
        "iterable of (frame_idx, ts_ms, ndarray) — e.g. an av/ffmpeg wrapper; "
        "fake_video_decoder provides the deterministic test double"
    )


def fake_video_decoder(blob: bytes, every_ms: int):
    """Deterministic stand-in: 'duration' is 1 ms per byte; one 4x4 'frame'
    sampled every `every_ms` ms, pixels derived from the bytes at the
    sample offset (wrapping)."""
    import numpy as np

    n = len(blob)
    ts = 0
    idx = 0
    while ts < max(n, 1):
        px = np.frombuffer(
            bytes((blob[(ts + j) % max(n, 1)] if n else 0) for j in range(16)),
            dtype=np.uint8,
        ).reshape(4, 4)
        yield idx, ts, px
        idx += 1
        ts += every_ms


def sample_frames(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "media",
    every_ms: int = 1000,
    decoder=None,
) -> DataFrame:
    """Frame sampling: one blob → MANY (frame_idx, ts_ms, feature) rows —
    the one-to-many Arrow-batched shape the image ops above don't
    exercise. Container parse + decode are injected (this container ships
    no codecs; the plumbing — schema, batching, per-partition
    parallelism, row explosion — is real and tested with
    fake_video_decoder)."""
    dec = decoder or _default_video_decoder

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "ts_ms": [], "mean_px": []}
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                for idx, ts, frame in dec(bytes(blob) if blob is not None else b"", every_ms):
                    rows["id"].append(int(i))
                    rows["frame_idx"].append(int(idx))
                    rows["ts_ms"].append(int(ts))
                    rows["mean_px"].append(float(frame.mean()))
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(run, schema=FRAME_SCHEMA)
