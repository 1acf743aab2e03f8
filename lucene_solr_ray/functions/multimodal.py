"""Multimodal (image/audio/video) column plumbing — decode stubbed.

Treats media as opaque ``binary`` columns with typed metadata, exactly the
pattern the index treats the ``html`` column with (SURVEY.md §1.2). The
decode/feature kernels would be actor-pool ``map_batches`` stages loading
codecs once per actor — the image/audio libraries are NOT in this
container, so the kernel body is stubbed (clearly marked), while the
Ray-side plumbing is real and tested: schema, batch sizing for large
binary payloads, actor signature, output layout.

Batch-size note (SURVEY.md §7.4.4 / ray_guide "Memory-aware"): binary
payload stages must use a SMALL ``batch_size`` (payload_bytes × batch ×
concurrency must fit the worker heap) and ``batch_format="pyarrow"``
(binary columns don't survive pandas round-trips untouched).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["binary_meta_batch", "MediaDecodeStage", "SUGGESTED_BINARY_BATCH_SIZE"]

SUGGESTED_BINARY_BATCH_SIZE = 64  # rows per batch for multi-MB payloads


def binary_meta_batch(batch: pa.Table, bin_col: str = "payload") -> pa.Table:
    """Typed metadata for an opaque binary column: byte length + sha1 —
    vectorized, no decode."""
    payloads = batch[bin_col].to_pylist()
    n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    sha1 = [hashlib.sha1(p).hexdigest() for p in payloads]
    return batch.append_column("n_bytes", pa.array(n_bytes)).append_column(
        "sha1", pa.array(sha1, type=pa.string())
    )


class MediaDecodeStage:
    """Actor-pool decode/feature stage. Real plumbing, stubbed kernel.

    Usage: ``ds.map_batches(MediaDecodeStage,
    fn_constructor_kwargs={"kind": "image", "fake": True},
    batch_format="pyarrow", batch_size=SUGGESTED_BINARY_BATCH_SIZE,
    concurrency=N, num_cpus=1)``.

    ``fake=True`` produces a deterministic feature vector derived from the
    payload hash (for pipeline tests); ``fake=False`` raises
    NotImplementedError at the decode call — the marked integration point
    for PIL/ffmpeg/soundfile when available.
    """

    FEATURE_DIM = 16

    def __init__(self, kind: str = "image", bin_col: str = "payload", fake: bool = True):
        if kind not in ("image", "audio", "video"):
            raise ValueError(kind)
        self.kind = kind
        self.bin_col = bin_col
        self.fake = fake
        # real implementation would load the codec/model HERE, once per actor

    def _decode_features(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                f"{self.kind} decode requires media libraries not present in "
                "this container; wire PIL/ffmpeg here"
            )
        # deterministic fake: 16 bytes of blake2b → float32 in [0, 1)
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_features(p) for p in batch[self.bin_col].to_pylist()]
        feat_arr = pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        out = batch.drop_columns([self.bin_col])  # payload dropped post-decode
        return out.append_column("features", feat_arr)
