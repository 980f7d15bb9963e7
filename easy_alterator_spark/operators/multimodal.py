"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing. Decode stages are feature
gated on executor-side deps, each with a deterministic fallback that
keeps the same output contract where the dep is absent (this
container): image decode/resize on PIL (real: true dimensions,
luminance histogram, thumbnail re-encode), audio energy on soundfile
(real: codec decode to float samples before the windowed RMS), video
frame sampling on ffmpeg (real: every-nth frame re-encoded as PNG via
an executor subprocess).

Scale notes: media blobs dominate row size, so the decode stage uses
``mapInPandas`` (streaming Arrow batches, bounded memory) rather than
a per-row UDF, and ``spark.sql.files.maxPartitionBytes`` — not row
count — governs task granularity.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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

# features are float64, not float32: the decode math runs in doubles
# (numpy / PIL histogram ratios), and a float32 round-trip quantizes
# values so no SQL oracle could ever reproduce them bit-for-bit.
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(DoubleType()), True),
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


# --- builtin PNG codec -------------------------------------------------------
# A dependency-free real decode tier between PIL and the stub: 8-bit
# non-interlaced gray/RGB/RGBA PNG, all five scanline filters, zlib
# from the stdlib. Exists so "real decode" has a testable path in
# containers without PIL, and so the resize stage can re-encode.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal PNG encoder: 8-bit RGB, filter 0 rows, one IDAT."""
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + rgb[y * width * 3 : (y + 1) * width * 3]
        for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes):
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG to
    ``(width, height, channels, ndarray[h, w, ch])``; None if the
    bytes are not such a PNG. Pure stdlib+numpy: chunk walk, IDAT
    concat, zlib inflate, and the five scanline filters (none/sub/up/
    average/paeth) from the PNG spec."""
    import struct
    import zlib

    import numpy as np

    if content is None or not bytes(content).startswith(_PNG_SIG):
        return None
    content = bytes(content)
    pos, idat, meta = 8, [], None
    try:
        while pos + 8 <= len(content):
            (ln,), tag = struct.unpack(">I", content[pos : pos + 4]), content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
                if depth != 8 or ctype not in (0, 2, 6) or inter != 0:
                    return None
                meta = (w, h, {0: 1, 2: 3, 6: 4}[ctype])
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
        if meta is None or not idat:
            return None
        w, h, ch = meta
        raw = zlib.decompress(b"".join(idat))
    except Exception:  # noqa: BLE001 — truncated/corrupt stream
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 1:  # sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            return None
        out[y] = line
        prev = line
    return w, h, ch, out.reshape(h, w, ch)


def _luminance(px) -> "object":
    """ITU-R 601-2 luma (the PIL 'L' convention) as uint8."""
    import numpy as np

    if px.shape[2] == 1:
        return px[:, :, 0]
    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _decode_image_builtin(content: bytes) -> tuple[int, int, list[float]]:
    """Real decode without PIL: builtin PNG codec + 8-bin normalized
    luminance histogram. Non-PNG bytes yield the same (0, 0, [])
    graceful-reject contract as the PIL path."""
    import numpy as np

    dec = decode_png(content)
    if dec is None:
        return 0, 0, []
    w, h, _ch, px = dec
    lum = _luminance(px)
    hist = np.bincount((lum >> 5).ravel(), minlength=8).astype(float)
    total = float(hist.sum()) or 1.0
    return w, h, [float(v / total) for v in hist]


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
    relevant bytes cross it. ``use_pil=None`` auto-selects the best
    REAL tier on the driver: PIL when installed, else the builtin PNG
    codec (true dimensions + 8-bin luminance histogram either way);
    ``use_pil=False`` pins the deterministic stub (the oracle-gated
    form — environment-independent).
    """
    if use_pil is None:
        use_pil = _pil_available()
        decode_one = _decode_image_pil if use_pil else _decode_image_builtin
    else:
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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def _ffmpeg_available() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def _sample_frames_ffmpeg(content: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Real keyframe extraction: pipe the blob through ffmpeg, keep
    every ``every_n``-th frame re-encoded as PNG. Executor-side
    subprocess; gated on the binary being present."""
    import subprocess

    if content is None or len(content) == 0:
        return []
    try:
        proc = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-loglevel", "error",
                "-i", "pipe:0",
                "-vf", f"select='not(mod(n\\,{every_n}))'",
                "-vsync", "vfr",
                "-f", "image2pipe", "-vcodec", "png", "pipe:1",
            ],
            input=bytes(content),
            capture_output=True,
            timeout=120,
            check=True,
        )
    except Exception:  # noqa: BLE001 — bad blob/codec -> no frames
        return []
    # split the concatenated PNG stream on its 8-byte signature
    sig = b"\x89PNG\r\n\x1a\n"
    chunks = proc.stdout.split(sig)
    return [(i * every_n, sig + c) for i, c in enumerate(chunks[1:])]


def _sample_frames_pngstream(content: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Real frame sampling over a concatenated-PNG stream — the exact
    container the ffmpeg path emits (image2pipe/png). Splitting on the
    PNG signature is the same post-processing the ffmpeg tier applies
    to its pipe; here it doubles as the dependency-free real tier for
    pre-extracted frame streams."""
    frames = bytes(content).split(_PNG_SIG)[1:]
    return [
        (i, _PNG_SIG + f)
        for i, f in enumerate(frames)
        if i % every_n == 0
    ]


def _sample_frames_stub(content: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Deterministic fake: frame count derived from blob size so the
    explode shape and partitioning are exercised without a codec."""
    if content is None:
        return []
    n_frames = max(1, len(content) // 1024)
    return [(idx, bytes(content[:16])) for idx in range(0, n_frames, every_n)]


def sample_frames(
    media: DataFrame, every_n: int = 10, use_ffmpeg: bool | None = None
) -> DataFrame:
    """video rows -> (media_id, frame_idx, frame) frame samples.

    Same Arrow-batched mapInPandas shape as the image pipeline. With
    ffmpeg on the workers (``use_ffmpeg=None`` auto-detects on the
    driver) frames are REAL — every n-th decoded frame re-encoded as
    PNG via an executor-side subprocess. Without it, auto mode still
    handles concatenated-PNG frame streams for real (the image2pipe
    container) and falls back to the deterministic stub for anything
    else; ``use_ffmpeg=False`` pins the stub.
    """
    if use_ffmpeg is None:
        use_ffmpeg = _ffmpeg_available()
        if not use_ffmpeg:
            def sample_one(content, n):
                if content is not None and bytes(content).startswith(_PNG_SIG):
                    return _sample_frames_pngstream(content, n)
                return _sample_frames_stub(content, n)
        else:
            sample_one = _sample_frames_ffmpeg
    else:
        sample_one = _sample_frames_ffmpeg if use_ffmpeg else _sample_frames_stub

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for idx, frame in sample_one(content, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(sample, FRAME_SCHEMA)
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


def _resize_image_builtin(content: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Real resize without PIL: builtin PNG decode, nearest-neighbor
    downsample (aspect-preserving, shrink-only — the thumbnail
    contract), builtin PNG re-encode. Non-PNG bytes reject to
    (0, 0, b'') like the PIL path."""
    import numpy as np

    dec = decode_png(content)
    if dec is None:
        return 0, 0, b""
    w, h, ch, px = dec
    scale = min(1.0, max_side / float(max(w, h)))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    xs = (np.arange(nw) * (w / nw)).astype(int)
    ys = (np.arange(nh) * (h / nh)).astype(int)
    small = px[np.ix_(ys, xs)]
    if ch == 1:
        small = np.repeat(small, 3, axis=2)
    elif ch == 4:
        small = small[:, :, :3]
    return nw, nh, encode_png(nw, nh, small.astype(np.uint8).tobytes())


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
    ``use_pil=None`` auto-selects the real tier (PIL, else builtin
    PNG codec); ``use_pil=False`` pins the deterministic stub.
    """
    if use_pil is None:
        use_pil = _pil_available()
        resize_one = _resize_image_pil if use_pil else _resize_image_builtin
    else:
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
        StructField("mean_energy", DoubleType(), True),
        StructField("peak_energy", DoubleType(), True),
    ]
)


def _soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def _audio_samples_sf(content: bytes):
    """Real codec decode via soundfile (WAV/FLAC/OGG...): float64
    samples in [-1, 1], channels mixed down. Executor-side deferred
    import; caller gates on availability. Returns None on undecodable
    bytes so the caller can fall back to the raw-byte interpretation."""
    import io

    import numpy as np
    import soundfile as sf  # noqa: PLC0415 — executor-side optional dep

    try:
        data, _rate = sf.read(io.BytesIO(content), dtype="float64")
    except Exception:  # noqa: BLE001 — not a known audio container
        return None
    if data.ndim > 1:
        data = np.mean(data, axis=1)
    return data


def _audio_samples_wave(content: bytes):
    """Real PCM WAV decode from the stdlib ``wave`` module — the
    dependency-free tier between soundfile and the raw interpretation.
    Returns float64 samples in [-1, 1] (channels mixed down), or None
    for anything that is not an 8/16/32-bit PCM RIFF/WAVE blob."""
    import io
    import wave as wavemod

    import numpy as np

    if content is None or not bytes(content).startswith(b"RIFF"):
        return None
    try:
        with wavemod.open(io.BytesIO(bytes(content))) as wf:
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except Exception:  # noqa: BLE001 — malformed/compressed container
        return None
    if width == 1:
        a = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        a = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        a = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        a = a[: (len(a) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return a


def _audio_samples_raw(content: bytes):
    """Raw-byte interpretation: unsigned 8-bit samples -> [-1, 1]."""
    import numpy as np

    a = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
    return (a - 128.0) / 128.0


def audio_features(
    media: DataFrame, window_bytes: int = 1024, use_soundfile: bool | None = None
) -> DataFrame:
    """audio rows -> per-window RMS energy profile (windows, mean, peak).

    A REAL windowed-energy computation. With soundfile on the workers
    (``use_soundfile=None`` auto-detects on the driver) the blob is
    codec-decoded first (WAV/FLAC/OGG; undecodable blobs fall back to
    the raw interpretation); otherwise bytes are treated as unsigned
    8-bit samples. ``window_bytes`` counts decoded samples per window
    on either path. numpy does the window math per Arrow batch, so
    cost is linear in bytes with zero JVM<->Python row traffic.

    Per-window RMS values are floor-gridded to 1e-6 BEFORE the mean/
    peak rollup (truncation, not round-half-up — read the last digit
    accordingly): floor of an exactly-computed double is
    engine-identical, which is what lets a SQL oracle recompute
    mean/peak bit-for-bit on the raw-byte path.
    """
    import numpy as np

    # auto mode (None) falls through sf -> stdlib-wave -> raw so PCM
    # WAV decodes for real even without soundfile; use_soundfile=False
    # pins the raw interpretation (environment-independent).
    auto = use_soundfile is None
    if auto:
        use_soundfile = _soundfile_available()

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, me, pe = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None or len(content) == 0:
                    nw.append(0), me.append(0.0), pe.append(0.0)
                    continue
                a = _audio_samples_sf(content) if use_soundfile else None
                if a is None and (auto or use_soundfile):
                    a = _audio_samples_wave(content)
                if a is None:
                    a = _audio_samples_raw(content)
                n = (len(a) // window_bytes) or 1
                wins = np.array_split(a[: n * window_bytes] if len(a) >= window_bytes else a, n)
                rms = np.array([float(np.sqrt(np.mean(w * w))) for w in wins])
                # integer-exact rollup: each gridded RMS is a small
                # integer, so the sum is exact in any order, the /n is
                # a single IEEE op, and both engines floor the same
                # double — no accumulation-order nondeterminism
                rms6 = np.floor(rms * 1e6)
                nw.append(n)
                me.append(math.floor(float(rms6.sum()) / n) / 1e6)
                pe.append(float(rms6.max()) / 1e6)
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


def exact_media_dedup(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    min_copies: int = 2,
) -> DataFrame:
    """(fingerprint, n_copies, canonical_id) for every group of
    byte-identical media blobs — exact dedup over an opaque binary
    column, the first pass every multimodal ingest runs before any
    decode (identical files are the dominant duplication mode in
    crawled media; catching them needs no image library at all).

    Same shape as the text exact-dedup: fingerprint = md5 of the raw
    bytes (32-hex, the shuffle key stays 32 bytes however large the
    blob), one hash-groupBy, canonical = smallest id. The default
    ``min_copies=2`` emits only duplicate groups (duplication-sized
    output); ``min_copies=1`` returns the full fingerprint inventory
    (the persisted artifact an incremental media ingest probes). At 100 TB the scan reads ONLY the fingerprint
    column when the source layout stores blobs in a separate parquet
    column chunk (column pruning does the rest).
    """
    return (
        media.groupBy(F.md5(F.col(content_col)).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("canonical_id"),
        )
        .filter(F.col("n_copies") >= min_copies)
    )
