"""Deterministic hash routing of documents to index partitions.

Analog of Solr's CompositeIdRouter (reference: solr/solrj/src/java/org/
apache/solr/common/cloud/CompositeIdRouter.java + Hash.java#murmurhash3_x86_32,
branch_8x; SURVEY.md §3.1 step 3): every doc is routed by a stable hash of
its unique key (url) so that all versions of a url land in the same
partition — which lets last-wins dedup happen inside the partition writer
with NO extra shuffle.

The hot path uses ``zlib.crc32`` (C speed, stable across processes and
platforms — unlike Python's salted ``hash``); a pure-Python
``murmurhash3_x86_32`` is provided for parity tests with the reference's
router semantics, but crc32 is the production router (documented choice:
both are uniform; crc32 is ~20x faster from Python).
"""

from __future__ import annotations

import zlib
from typing import Iterable

import numpy as np

__all__ = ["part_keys", "murmurhash3_x86_32"]


def part_keys(urls: Iterable[str], num_partitions: int) -> np.ndarray:
    """Stable partition id per url: ``crc32(utf8(url)) % P`` → int32."""
    out = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) for u in urls), dtype=np.uint32
    )
    return (out % np.uint32(num_partitions)).astype(np.int32)


def murmurhash3_x86_32(data: bytes, seed: int = 0) -> int:
    """Reference murmur3 32-bit (public algorithm, Austin Appleby);
    matches Solr's Hash.murmurhash3_x86_32 for byte input."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = length & 0x3
    if tail >= 3:
        k ^= data[rounded + 2] << 16
    if tail >= 2:
        k ^= data[rounded + 1] << 8
    if tail >= 1:
        k ^= data[rounded]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h
