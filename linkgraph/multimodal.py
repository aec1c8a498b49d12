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


def decode_image(payload: bytes) -> object:
    """STUB: decode an image payload. Real codecs are unavailable in
    this environment; raises unless PIL is importable."""
    if not HAVE_PIL:
        raise NotImplementedError("image decode requires PIL; not available here")
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


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
        if len(cols) == 0:
            feats = np.zeros((len(pdf), FEATURE_DIM))
        else:
            row_starts = np.minimum(offs // FEATURE_DIM, len(cols) - 1)
            feats = np.add.reduceat(cols, row_starts, axis=0).astype(np.float64)
            feats[padded == 0] = 0.0  # empty segment: reduceat copies the next row
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": lens,
                "content_sha": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "feature": feats.tolist(),
            }
        )
        yield out


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
