"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing. Image decode is feature
gated: with PIL importable it is REAL (true dimensions + luminance
histogram); without it (this container) a deterministic stub keeps the
same output contract. Video frame sampling stays stubbed (no ffmpeg
here); its real implementation is keyframe extraction inside the same
mapInPandas shape.

Scale notes: media blobs dominate row size, so the decode stage uses
``mapInPandas`` (streaming Arrow batches, bounded memory) rather than
a per-row UDF, and ``spark.sql.files.maxPartitionBytes`` — not row
count — governs task granularity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried alongside every media blob.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims/features derived from the bytes.

    Fallback when PIL is absent (this container); keeps the pipeline
    testable end-to-end with a stable output contract.
    """
    if content is None or len(content) == 0:
        return 0, 0, []
    h = int.from_bytes(content[:8].ljust(8, b"\0"), "little", signed=False)
    width = 64 + (h % 1024)
    height = 64 + ((h >> 10) % 1024)
    feats = [((h >> (i * 2)) % 251) / 251.0 for i in range(8)]
    return width, height, feats


def _decode_image_pil(content: bytes) -> tuple[int, int, list[float]]:
    """Real decode via PIL: true dimensions + an 8-bin grayscale
    histogram (normalized) as the feature vector. Import is deferred to
    the executor; caller gates on availability."""
    import io

    from PIL import Image  # noqa: PLC0415 — executor-side optional dep

    if content is None or len(content) == 0:
        return 0, 0, []
    try:
        img = Image.open(io.BytesIO(content))
        img.load()
    except Exception:
        return 0, 0, []
    hist = img.convert("L").histogram()  # 256 bins
    total = float(sum(hist)) or 1.0
    feats = [sum(hist[i * 32 : (i + 1) * 32]) / total for i in range(8)]
    return img.width, img.height, feats


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_images(media: DataFrame, batch_hint: int = 256, use_pil: bool | None = None) -> DataFrame:
    """image rows -> (media_id, width, height, features) via mapInPandas.

    Arrow streams batches into Python; each batch is decoded in bulk.
    Non-image rows are filtered *before* the Python boundary so only
    relevant bytes cross it. With PIL on the workers (``use_pil=None``
    auto-detects on the driver) the decode is real — true dimensions +
    an 8-bin luminance histogram; otherwise the deterministic stub
    keeps the contract intact.
    """
    if use_pil is None:
        use_pil = _pil_available()
    decode_one = _decode_image_pil if use_pil else _decode_image_stub

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(decode, IMAGE_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video rows -> (media_id, frame_idx, frame) frame-sample stub.

    Real impl: ffmpeg keyframe extraction inside mapInPandas. The stub
    emits deterministic frame indices so downstream plumbing (explode
    shape, partitioning by media_id) is exercised.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = 0 if content is None else max(1, len(content) // 1024)
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(None if content is None else bytes(content[:16]))
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(sample, out_schema)
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory media table for tests (no data files)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes([(i * 7 + j) % 256 for j in range(128 + (i % 5) * 1024)])
        rows.append((i, kind, f"application/x-{kind}", content, len(content)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def _resize_image_stub(content: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Deterministic fake resize: stub dims scaled to fit max_side,
    payload truncated proportionally to the area ratio — keeps the
    (smaller-bytes-out) contract the real path has."""
    w, h, _ = _decode_image_stub(content)
    if w == 0 or h == 0:
        return 0, 0, b""
    scale = min(1.0, max_side / float(max(w, h)))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    keep = max(1, int(len(content) * (nw * nh) / float(w * h)))
    return nw, nh, bytes(content[:keep])


def _resize_image_pil(content: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Real thumbnail via PIL: aspect-preserving fit into a max_side
    box, re-encoded PNG."""
    import io

    from PIL import Image  # noqa: PLC0415 — executor-side optional dep

    if content is None or len(content) == 0:
        return 0, 0, b""
    try:
        img = Image.open(io.BytesIO(content))
        img.thumbnail((max_side, max_side))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
    except Exception:
        return 0, 0, b""
    return img.width, img.height, buf.getvalue()


def resize_images(
    media: DataFrame, max_side: int = 256, use_pil: bool | None = None
) -> DataFrame:
    """image rows -> aspect-preserving resize to fit ``max_side``.

    Same Arrow-batched mapInPandas shape as decode_images; the output
    is again a binary media column, so resize stages chain (decode ->
    resize -> feature-extract) without leaving the batch pipeline.
    """
    if use_pil is None:
        use_pil = _pil_available()
    resize_one = _resize_image_pil if use_pil else _resize_image_stub

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_one(c, max_side) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [r[0] for r in out],
                    "height": [r[1] for r in out],
                    "content": [r[2] for r in out],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(resize, RESIZED_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_windows", IntegerType(), True),
        StructField("mean_energy", FloatType(), True),
        StructField("peak_energy", FloatType(), True),
    ]
)


def audio_features(media: DataFrame, window_bytes: int = 1024) -> DataFrame:
    """audio rows -> per-window RMS energy profile (windows, mean, peak).

    This is a REAL windowed-energy computation over the raw byte
    stream (bytes treated as unsigned 8-bit samples — a stand-in for
    codec decode, which would slot in front of the same windowing
    inside this mapInPandas). numpy does the window math per Arrow
    batch, so cost is linear in bytes with zero JVM<->Python row
    traffic.
    """
    import numpy as np

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, me, pe = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None or len(content) == 0:
                    nw.append(0), me.append(0.0), pe.append(0.0)
                    continue
                a = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
                a = (a - 128.0) / 128.0
                n = (len(a) // window_bytes) or 1
                wins = np.array_split(a[: n * window_bytes] if len(a) >= window_bytes else a, n)
                rms = np.array([float(np.sqrt(np.mean(w * w))) for w in wins])
                nw.append(n), me.append(round(float(rms.mean()), 6)), pe.append(
                    round(float(rms.max()), 6)
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_windows": nw,
                    "mean_energy": me,
                    "peak_energy": pe,
                }
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(energy, AUDIO_FEATURES_SCHEMA)
    )
