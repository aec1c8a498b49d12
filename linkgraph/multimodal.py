"""Multimodal columns: opaque binary payloads with typed metadata,
processed by Arrow-batched mapInPandas kernels.

The pattern for image/audio/video at 100 TB: store the payload as a
`binary` column next to typed metadata, partition by size-balanced
buckets, and run decode / feature-extract as vectorized pandas
kernels over Arrow batches. The decode step itself needs codec
libraries that are NOT in this environment, so it is STUBBED —
`decode_image` raises NotImplementedError unless a known deterministic
fake format is detected — while everything Spark-side (schema,
batching, UDF signature, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

try:  # real decoders, absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def attach_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, blob: binary, meta: struct) — the canonical
    multimodal shape (payload bytes + typed metadata)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.length("text").alias("n_chars"),
        ).alias("meta"),
    )


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic P6 PPM image (pure numpy) — the test
    payload generator for the decode path."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + pix.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 array.

    REAL decoders, pure numpy: binary PPM (P6) and uncompressed
    24-bit BMP — formats decodable without codec libraries. Other
    formats fall through to PIL when importable, else raise
    NotImplementedError (the codec libs are absent here; the Spark
    plumbing around this function is real and tested either way)."""
    if payload[:2] == b"P6":
        # P6 header: magic, then three whitespace-delimited ints
        # (width, height, maxval), then exactly ONE whitespace byte
        # before pixel data. Parse positionally — searching for the
        # maxval token's byte value misfires when width/height contain
        # the same digits (e.g. width 255, maxval 255).
        pos = 2
        vals = []
        for _ in range(3):
            while payload[pos] in b" \t\r\n":
                pos += 1
            start = pos
            while payload[pos] not in b" \t\r\n":
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = vals
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return arr.reshape(h, w, 3)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP supported")
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=abs(h) * row_bytes, offset=off
        ).reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
        bgr = rows if h < 0 else rows[::-1]  # bottom-up unless h negative
        return bgr[..., ::-1].copy()  # BGR -> RGB
    if HAVE_PIL:
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError("unsupported image format (PPM/BMP decodable; PIL absent)")


def _feature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads:
    n_bytes, sha256, and a deterministic FEATURE_DIM-dim byte-histogram
    feature (the stand-in for an embedding model / codec pipeline).
    Vectorized per batch; one output row per input row."""
    for pdf in batches:
        if pdf.empty:
            continue
        blobs = pdf["blob"]
        # whole-batch vectorized byte histogram: concatenate every
        # payload into ONE uint8 buffer, zero-pad each payload to a
        # multiple of FEATURE_DIM, reshape to (-1, FEATURE_DIM) and
        # segment-sum with np.add.reduceat — no per-byte Python
        lens = blobs.map(len).to_numpy(dtype=np.int64)
        padded = -(-lens // FEATURE_DIM) * FEATURE_DIM  # ceil to multiple
        buf = np.zeros(int(padded.sum()), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum(padded)[:-1]))
        for o, b in zip(offs, blobs):
            buf[o : o + len(b)] = np.frombuffer(bytes(b), dtype=np.uint8)
        cols = buf.reshape(-1, FEATURE_DIM).astype(np.int64)
        # empty payloads get zero features; drop them BEFORE reduceat —
        # an empty segment's start equals the next segment's start (or
        # falls past the end for trailing empties), and clipping it
        # would silently truncate the preceding document's segment
        nonempty = padded > 0
        feats = np.zeros((len(pdf), FEATURE_DIM))
        if nonempty.any():
            row_starts = (offs[nonempty] // FEATURE_DIM).astype(np.int64)
            feats[nonempty] = np.add.reduceat(cols, row_starts, axis=0).astype(
                np.float64
            )
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": lens,
                "content_sha": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "feature": feats.tolist(),
            }
        )
        yield out


def _image_stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode + per-image stats: (doc_id, width, height,
    mean_rgb: array<double>). Decode is per-image (images are opaque
    variable-size payloads); all pixel math is numpy."""
    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            img = decode_image(bytes(blob))
            rows.append(
                (
                    doc_id,
                    int(img.shape[1]),
                    int(img.shape[0]),
                    img.reshape(-1, 3).mean(axis=0).tolist(),
                )
            )
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_rgb"])


def image_stats(images: DataFrame) -> DataFrame:
    """(doc_id, blob: binary) → (doc_id, width, height, mean_rgb)
    through the REAL decode path (PPM/BMP numpy decoders)."""
    return images.select("doc_id", "blob").mapInPandas(
        _image_stats_kernel,
        schema="doc_id long, width long, height long, mean_rgb array<double>",
    )


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (real — no codec libs
    needed): integer index sampling on both axes."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[yi][:, xi]


def _resize_kernel(out_w: int, out_h: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                small = resize_image(decode_image(bytes(blob)), out_w, out_h)
                rows.append(
                    (
                        doc_id,
                        out_w,
                        out_h,
                        b"P6\n%d %d\n255\n" % (out_w, out_h) + small.tobytes(),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "blob"])

    return kernel


def resize_images(images: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """(doc_id, blob) → (doc_id, width, height, blob): decode (REAL for
    PPM/BMP), nearest-neighbor downsample, re-encode as P6 PPM — the
    image-normalization primitive of a multimodal training pipeline.
    Per-image work is independent → linear scale; output rows are
    bounded at out_w·out_h·3 bytes regardless of input size, so the
    shuffle after this stage shrinks with the resize ratio."""
    return images.select("doc_id", "blob").mapInPandas(
        _resize_kernel(out_w, out_h),
        schema="doc_id long, width long, height long, blob binary",
    )


# --- audio: REAL RIFF/WAV PCM decode (pure numpy) --------------------------


def make_wav(
    n_samples: int, rate: int = 8000, channels: int = 1, seed: int = 0
) -> bytes:
    """Deterministic synthetic PCM-16 WAV (pure numpy) — the test
    payload generator for the audio path."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(2**15), 2**15, size=(n_samples, channels)).astype("<i2")
    data = pcm.tobytes()
    block = channels * 2
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAV payload to ((n_samples, channels) int16, rate).

    REAL decoder, pure numpy: uncompressed PCM-16 WAV — the one audio
    container decodable without codec libraries. Chunk-walks the RIFF
    structure (fmt may be followed by LIST/fact chunks before data).
    Compressed formats (mp3/ogg/flac, non-PCM WAV) raise
    NotImplementedError — same stub discipline as decode_image."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio container (PCM WAV decodable; codec libs absent)"
        )
    pos, channels, rate, bits, fmt = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = pos + 8
        if cid == b"fmt ":
            fmt = int.from_bytes(payload[body : body + 2], "little")
            channels = int.from_bytes(payload[body + 2 : body + 4], "little")
            rate = int.from_bytes(payload[body + 4 : body + 8], "little")
            bits = int.from_bytes(payload[body + 14 : body + 16], "little")
        elif cid == b"data":
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM-16 WAV supported")
            pcm = np.frombuffer(payload, dtype="<i2", count=sz // 2, offset=body)
            return pcm.reshape(-1, channels), rate
        pos = body + sz + (sz & 1)  # chunks are word-aligned
    raise NotImplementedError("WAV data chunk not found")


def _audio_stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            pcm, rate = decode_audio(bytes(blob))
            x = pcm.astype(np.float64)
            rows.append(
                (
                    doc_id,
                    int(pcm.shape[0]),
                    int(pcm.shape[1]),
                    rate,
                    pcm.shape[0] / rate,
                    float(np.sqrt((x**2).mean())) if x.size else 0.0,
                    int(np.abs(pcm).max()) if pcm.size else 0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "channels", "rate",
                "duration_s", "rms", "peak",
            ],
        )


def audio_stats(audios: DataFrame) -> DataFrame:
    """(doc_id, blob) → per-clip waveform stats through the REAL
    PCM-WAV decode path: (doc_id, n_samples, channels, rate,
    duration_s, rms, peak). The audio analog of image_stats — same
    Arrow-batched independent-row kernel, linear scale."""
    return audios.select("doc_id", "blob").mapInPandas(
        _audio_stats_kernel,
        schema=(
            "doc_id long, n_samples long, channels long, rate long, "
            "duration_s double, rms double, peak long"
        ),
    )


# --- video frame sampling -------------------------------------------------
# Real video codecs are absent in this container; the RAWV test
# container (magic + w/h/n_frames header + concatenated raw RGB24
# frames) keeps the Spark-side plumbing — schema, batch shape, per-frame
# explode — real while the codec boundary stays an honest stub.
RAWV_MAGIC = b"RAWV"
_RAWV_HEADER = 16  # magic(4) + w(4) + h(4) + n_frames(4), little-endian


def make_video(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    """Deterministic synthetic RAWV clip (pure numpy) — the test
    payload generator for the frame-sampling path."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n_frames, height, width, 3), dtype=np.uint8)
    head = RAWV_MAGIC + b"".join(
        int(v).to_bytes(4, "little") for v in (width, height, n_frames)
    )
    return head + frames.tobytes()


def decode_video_meta(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, header_offset) for a RAWV payload;
    other containers raise NotImplementedError (codec libs absent —
    same stub discipline as decode_image)."""
    if payload[:4] != RAWV_MAGIC:
        raise NotImplementedError(
            "only the RAWV test container is decodable here (video codecs absent)"
        )
    w = int.from_bytes(payload[4:8], "little")
    h = int.from_bytes(payload[8:12], "little")
    n = int.from_bytes(payload[12:16], "little")
    return w, h, n, _RAWV_HEADER


def _frame_sample_kernel(every_k: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                w, h, n, off = decode_video_meta(b)
                fsz = w * h * 3
                for idx in range(0, n, every_k):
                    start = off + idx * fsz
                    rows.append((doc_id, idx, w, h, b[start : start + fsz]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "frame"]
            )

    return kernel


def sample_frames(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """(doc_id, blob) → one row per sampled frame (every k-th):
    (doc_id, frame_idx, width, height, frame: binary) — the
    frame-sampling primitive for video training data. The explode
    happens INSIDE the Arrow kernel so a clip never round-trips whole
    through the shuffle; downstream stages see fixed-size raw frames
    they can feed to resize_images-style kernels."""
    return videos.select("doc_id", "blob").mapInPandas(
        _frame_sample_kernel(every_k),
        schema="doc_id long, frame_idx long, width long, height long, frame binary",
    )


def blob_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, content_sha, feature: array<double>) via the
    Arrow-batched kernel. The sha256 doubles as the per-row invariant
    check against the source text."""
    return attach_blob(docs).select("doc_id", "blob").mapInPandas(
        _feature_kernel,
        schema="doc_id long, n_bytes long, content_sha string, feature array<double>",
    )


def blob_stats(spark, sf_dir: str) -> DataFrame:
    """Gate query: byte length + sha256 through the REAL multimodal
    path (binary column → mapInPandas kernel) — oracle-checkable
    against octet_length/sha256 in SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return blob_features(docs).select("doc_id", "n_bytes", "content_sha")
