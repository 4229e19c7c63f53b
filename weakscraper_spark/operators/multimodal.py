"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The decode/feature-extract kernels are STUBS (this container ships no
image/audio libraries — clearly marked below); the Spark-side
plumbing is real and tested: schema, batch shape, partitioning, and
the mapInPandas signature are exactly what a production decoder drops
into. ``sniff_magic``/``fake_features`` are deterministic stand-ins
so the pipeline is end-to-end testable.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

BLOB_META_SCHEMA = (
    "blob_id long, n_bytes int, magic string, media_type string, "
    "feat array<float>"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1aE\xdf\xa3": "video/webm",
}


def _sniff(raw: bytes) -> str:
    for magic, mt in _MAGIC.items():
        if raw.startswith(magic):
            return mt
    return "application/octet-stream"


def decode_image(raw: bytes):
    """REAL decode would go here (PIL/libvips). Deliberately stubbed:
    the sandbox has no imaging libraries. The Spark plumbing around it
    (batching, schema, partitioning) is the tested surface."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_features for plumbing tests")


def resize_image(raw: bytes, width: int, height: int):
    """REAL resize would go here (PIL/libvips thumbnail). Deliberately
    stubbed like ``decode_image`` — no imaging libs in this
    environment; the batching/schema plumbing is the tested surface."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "environment; the mapInPandas plumbing around it is real")


def fake_features(raw: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector derived from content
    bytes — stable across executors/runs, no RNG."""
    h = blake2b(raw, digest_size=dim).digest()
    return [b / 255.0 for b in h]


def frame_offsets(n_bytes: int, n_frames: int,
                  frame_stride: int = 4096) -> list[int]:
    """Deterministic frame-sample byte offsets: evenly spaced over the
    blob, aligned down to ``frame_stride``. Stands in for timestamp-
    based frame selection; pure arithmetic, same on every executor."""
    if n_bytes <= 0 or n_frames <= 0:
        return []
    step = max(n_bytes // n_frames, 1)
    return sorted({min((i * step) // frame_stride * frame_stride,
                       n_bytes - 1) for i in range(n_frames)})


def extract_blob_meta(df: DataFrame, id_col: str = "blob_id",
                      blob_col: str = "blob",
                      feat_dim: int = 8) -> DataFrame:
    """(id, blob) → typed metadata + feature vector, one Arrow batch
    at a time. This is the exact shape a real image/audio featurizer
    uses; only the kernel inside the loop changes."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, magics, types, feats = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(raw) if raw is not None else b""
                ids.append(int(i))
                sizes.append(len(raw))
                magics.append(raw[:4].hex())
                types.append(_sniff(raw))
                feats.append(fake_features(raw, feat_dim))
            yield pd.DataFrame({
                "blob_id": ids, "n_bytes": sizes, "magic": magics,
                "media_type": types, "feat": feats,
            })

    return df.select(id_col, blob_col).mapInPandas(run, BLOB_META_SCHEMA)


FRAME_SCHEMA = ("blob_id long, frame_idx int, byte_offset long, "
                "feat array<float>")


def sample_frames(df: DataFrame, n_frames: int = 4,
                  id_col: str = "blob_id", blob_col: str = "blob",
                  feat_dim: int = 8) -> DataFrame:
    """Video-style frame sampling plumbing: one OUTPUT ROW PER FRAME
    (a flat-map-shaped mapInPandas — output cardinality ≠ input), each
    with a deterministic byte offset and a stand-in per-frame feature
    (real decoder kernel = ``decode_image``/codec lib, stubbed here).
    This is the batch shape a production frame featurizer drops into;
    downstream it joins/aggregates like any long-format table."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, feats = [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(raw) if raw is not None else b""
                for j, off in enumerate(frame_offsets(len(raw), n_frames)):
                    ids.append(int(i))
                    idxs.append(j)
                    offs.append(off)
                    feats.append(fake_features(
                        raw[off:off + 4096], feat_dim))
            # feat must be object-dtyped even when the batch yields no
            # frames — an empty plain column defaults to float64 and
            # Arrow then refuses the list<float> conversion
            yield pd.DataFrame({
                "blob_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "byte_offset": pd.Series(offs, dtype="int64"),
                "feat": pd.Series(feats, dtype="object"),
            })

    return df.select(id_col, blob_col).mapInPandas(run, FRAME_SCHEMA)
