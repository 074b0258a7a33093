"""Multimodal (image/audio/video) column handling.

Design (north-star training-data pipeline): media rides through the engine
as an opaque ``binary`` payload column plus a typed metadata struct —
Spark never interprets the bytes except inside explicitly-invoked
Arrow-batched decode/feature UDFs, so filters/joins/dedup on metadata stay
JVM-side and columnar while payloads stream through untouched.

The container has no image/audio codecs, so the actual decode step is a
STUB: ``decode_media`` raises ``NotImplementedError`` unless given the
deterministic fake decoder (``fake_decode=True``), which derives pixel-like
properties from the payload bytes. Everything AROUND the decode — schema,
partitioning, ``mapInPandas`` batch shape, frame-slicing, feature
vectors — is real and tested; swapping in PIL/ffmpeg later only changes
the inner per-row function.

Scale notes: payload bytes never shuffle except where semantically
required (frame explode); metadata-only transforms select away the binary
column before any wide operation. Feature extraction is one pass of
Arrow-batched numpy per partition — no driver collection, no Python
row-at-a-time loops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MEDIA_METADATA_FIELDS = (
    "media_type string, n_bytes long, digest string, frame_size int"
)

HISTOGRAM_BINS = 16
DEFAULT_FRAME_SIZE = 256


def synthetic_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media corpus: utf-8 payload bytes + metadata.

    Stands in for a real binary ingest (S3 image tarballs etc.); the
    engine-side contract — (id, payload binary, meta struct) — is exactly
    what a real loader would produce.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.lit(DEFAULT_FRAME_SIZE).alias("frame_size"),
        ).alias("meta"),
    )


def media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata projection WITHOUT the payload — the shape any wide
    operation (join/groupBy/dedup) should run on. Pure Column exprs.
    """
    return df.select(
        F.col(id_col),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Decode payloads to (id, width, height, mode) via mapInPandas.

    Real decoding needs PIL/ffmpeg (absent in this container): without
    ``fake_decode`` the returned DataFrame raises ``NotImplementedError``
    on execution. With it, dimensions derive deterministically from the
    payload so the full pipeline is testable end-to-end.
    """
    schema = f"{_id_field_ddl(df, id_col)}, width int, height int, mode string"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not fake_decode:
                raise NotImplementedError(
                    "media decoding requires an image/audio codec library "
                    "(PIL / ffmpeg), not available in this environment; "
                    "pass fake_decode=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            n = payloads.str.len().to_numpy()
            first = payloads.str[0:1].apply(
                lambda b: b[0] if len(b) else 0
            ).to_numpy()
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": (first % 64 + 1).astype("int32"),
                    "height": (n % 64 + 1).astype("int32"),
                    "mode": np.where(n % 2 == 0, "RGB", "L"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", bins: int = HISTOGRAM_BINS
) -> DataFrame:
    """(id, features array<double>) — normalized byte-value histogram.

    The stand-in for real feature extraction (CLIP embedding, mel
    spectrogram): Arrow-batched numpy over each partition, one output row
    per input row, payload column pruned immediately after.
    """
    schema = f"{_id_field_ddl(df, id_col)}, features array<double>"
    edges = np.linspace(0, 256, bins + 1)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for raw in pdf["payload"]:
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=edges)
                total = max(arr.size, 1)
                feats.append((hist / total).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, "payload").mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_size: int = DEFAULT_FRAME_SIZE,
    every_nth: int = 4,
) -> DataFrame:
    """Sample every n-th fixed-size frame of each payload (the video-frame
    extraction shape): one input row fans out to ceil(n_frames/every_nth)
    rows of (id, frame_idx, frame binary, frame_digest).
    """
    import hashlib

    schema = (
        f"{_id_field_ddl(df, id_col)}, frame_idx int, frame binary,"
        " frame_digest string"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, idxs, frames, digests = [], [], [], []
            for rid, raw in zip(pdf[id_col], pdf["payload"]):
                n_frames = max((len(raw) + frame_size - 1) // frame_size, 1)
                for fi in range(0, n_frames, every_nth):
                    chunk = bytes(raw[fi * frame_size : (fi + 1) * frame_size])
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(chunk)
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_digest": digests,
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)


def media_phash(
    df: DataFrame, id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprint per payload: the media
    analogue of simhash. The payload's byte stream is divided into
    ``bits`` contiguous chunks (the stand-in for a downscaled grayscale
    tile grid — with a real codec the chunks would be 8x8 pixel means);
    bit j is set when chunk j's mean byte value exceeds the whole
    payload's mean. Re-encodings that preserve content shift byte means
    only locally, so perceptual duplicates land within a small Hamming
    distance — feed the result to ``dedup.hamming_pairs``.

    Every comparison is cross-multiplied integer math
    (``chunk_sum * L > total_sum * chunk_len``) — no float division, so
    the hash is bit-identical across engines and batch shapes.

    Scale: one Arrow-batched pass, no shuffle; only (id, long) leaves
    the scan, the payload never crosses a wire.
    """
    schema = f"{_id_field_ddl(df, id_col)}, phash long"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            hashes = np.zeros(len(pdf), dtype=np.int64)
            for row_i, b in enumerate(pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(arr)
                if n == 0:
                    continue
                # chunk of byte i = (i * bits) // n: contiguous, covers
                # every byte, possibly empty chunks when n < bits
                idx = (np.arange(n) * bits) // n
                csum = np.bincount(idx, weights=arr, minlength=bits)
                clen = np.bincount(idx, minlength=bits)
                total = int(arr.sum())
                bits_set = (csum * n) > (total * clen)
                hashes[row_i] = int(
                    (bits_set.astype(np.int64) << np.arange(bits)).sum()
                )
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return df.select(id_col, "payload").mapInPandas(run, schema)


def _id_field_ddl(df: DataFrame, id_col: str) -> str:
    return f"{id_col} {df.schema[id_col].dataType.simpleString()}"


def media_dedup(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact media deduplication on the content digest: (digest, keep_id,
    n_copies) with the minimum id canonical — the binary-column sibling
    of ``dedup.dedup_exact``. Payload bytes NEVER shuffle: the digest is
    already in the metadata struct, so the groupBy exchanges 32-byte
    keys regardless of media size (the property that matters when the
    payload column is megabytes per row).
    """
    return (
        media.select(F.col(id_col), F.col("meta.digest").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
