"""Deterministic hash routing of documents to index partitions.

Analog of Solr's CompositeIdRouter (reference: solr/solrj/src/java/org/
apache/solr/common/cloud/CompositeIdRouter.java + Hash.java#murmurhash3_x86_32,
branch_8x; SURVEY.md §3.1 step 3): every doc is routed by a stable hash of
its unique key (url) so that all versions of a url land in the same
partition — which lets last-wins dedup happen inside the partition writer
with NO extra shuffle.

The production router is CRC-32 (stable across processes/platforms, part
of resume lineage). The hot path is a VECTORIZED table-driven CRC-32 over
the raw Arrow utf-8 string buffer — bit-identical to ``zlib.crc32`` (same
reflected 0xEDB88320 polynomial, pinned by a parity test) but with no
per-row Python and no str materialization: one numpy gather + xor/shift
round per byte position over the still-live rows. A pure-Python
``murmurhash3_x86_32`` is provided for parity tests with the reference's
router semantics.
"""

from __future__ import annotations

import zlib
from typing import Iterable

import numpy as np
import pyarrow as pa

__all__ = ["part_keys", "part_keys_arrow", "crc32_strings", "murmurhash3_x86_32"]


def _crc_tables() -> np.ndarray:
    """Slicing-by-4 CRC-32 tables (public algorithm, reflected 0xEDB88320
    polynomial — same as zlib): T[0] is the classic byte table;
    T[k+1][i] = (T[k][i] >> 8) ^ T[0][T[k][i] & 0xFF]."""
    t = np.empty((4, 256), dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if (c & 1) else (c >> 1)
        t[0, i] = c
    for k in range(3):
        prev = t[k]
        t[k + 1] = (prev >> 8) ^ t[0][prev & 0xFF]
    return t


_CRC_T = _crc_tables()
_T0, _T1, _T2, _T3 = _CRC_T[0], _CRC_T[1], _CRC_T[2], _CRC_T[3]
_U8, _U16, _U24 = np.uint32(8), np.uint32(16), np.uint32(24)
_U32MAX, _FF = np.uint32(0xFFFFFFFF), np.uint32(0xFF)


def crc32_strings(arr: pa.Array) -> np.ndarray:
    """``zlib.crc32`` of every string's utf-8 bytes, vectorized over the
    Arrow buffer. Rows are sorted by length once so the still-live set in
    every round is a SUFFIX (plain slice, no per-round boolean gather);
    bytes are consumed 4 per round with slicing-by-4 tables, then ≤3
    single-byte tail rounds. Nulls hash as empty strings (crc 0)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = arr.cast(pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    if bufs[1] is None:
        return np.zeros(n, dtype=np.uint32)
    raw_off = np.frombuffer(bufs[1], dtype=off_dtype)
    offs = raw_off[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    lens = np.diff(offs)
    order = np.argsort(lens, kind="stable")
    s_start = offs[:-1][order]
    s_len = lens[order]
    s_q = s_len >> 2  # number of 4-byte rounds per row
    crc = np.full(n, _U32MAX, dtype=np.uint32)
    nq = int(s_q[-1]) if n else 0
    for r in range(nq):
        k0 = int(np.searchsorted(s_q, r, side="right"))
        base = s_start[k0:] + (r << 2)
        c = crc[k0:]
        b0 = data[base].astype(np.uint32)
        b1 = data[base + 1].astype(np.uint32)
        b2 = data[base + 2].astype(np.uint32)
        b3 = data[base + 3].astype(np.uint32)
        crc[k0:] = (
            _T3[(c ^ b0) & _FF]
            ^ _T2[((c >> _U8) ^ b1) & _FF]
            ^ _T1[((c >> _U16) ^ b2) & _FF]
            ^ _T0[((c >> _U24) ^ b3) & _FF]
        )
    tail = s_len - (s_q << 2)  # 0..3 remaining bytes per row
    for t in range(3):
        idx = np.nonzero(tail > t)[0]
        if not len(idx):
            break
        b = data[s_start[idx] + (s_q[idx] << 2) + t].astype(np.uint32)
        c = crc[idx]
        crc[idx] = (c >> _U8) ^ _T0[(c ^ b) & _FF]
    out = np.empty(n, dtype=np.uint32)
    out[order] = crc ^ _U32MAX
    if arr.null_count:
        import pyarrow.compute as pc

        out[~np.asarray(pc.is_valid(arr))] = np.uint32(0)
    return out


def part_keys_arrow(urls: pa.Array, num_partitions: int) -> np.ndarray:
    """Stable partition id per url: ``crc32(utf8(url)) % P`` → int32,
    computed straight off the Arrow buffer (no per-row Python)."""
    return (crc32_strings(urls) % np.uint32(num_partitions)).astype(np.int32)


def part_keys(urls, num_partitions: int) -> np.ndarray:
    """List/array-of-str front door for :func:`part_keys_arrow` — same
    ``crc32(utf8(url)) % P`` routing, same int32 output."""
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        return part_keys_arrow(urls, num_partitions)
    return part_keys_arrow(pa.array(list(urls), type=pa.string()), num_partitions)


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
