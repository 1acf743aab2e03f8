"""Posting-list block codec: docID-delta + frame-of-reference bit packing.

From-scratch re-creation of the semantics of Lucene 8.x's block postings
format (reference: lucene/core/src/java/org/apache/lucene/codecs/lucene84/
Lucene84PostingsWriter.java + ForUtil.java + Lucene84SkipWriter.java,
branch_8x; SURVEY.md §1.1, Appendix B): docIDs are stored as deltas in
blocks of 128, bit-packed at the block's max bit width; term frequencies
(minus 1) are packed the same way; every block carries skip/impact data
(last docID, max freq, min norm byte) used for block-max WAND upper bounds.

The byte layout is our own (this is not a port of the Lucene file format):

    per term:  [block 0][block 1]...[block B-1]
    per block: 1 byte doc_bw | 1 byte freq_bw |
               ceil(128*doc_bw/8) bytes packed doc deltas |
               ceil(128*freq_bw/8) bytes packed (freq-1)

Tail blocks are zero-padded to 128 entries; the decoder slices by df.
Skip/impact arrays are stored out-of-band (terms table), one row per block:
(last_docid int32, max_freq int32, min_norm uint8).

Packing is fully vectorized: blocks are grouped by bit width and each
group is packed/unpacked with one unpackbits/packbits round per width —
no per-block Python loops in the encoder.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np

BLOCK = 128

__all__ = [
    "BLOCK",
    "encode_postings_batch",
    "decode_term_postings",
    "decode_all_postings",
    "TermPostings",
]


def _bitwidths(mat: np.ndarray) -> np.ndarray:
    """Per-row bit width of a (nblocks, BLOCK) uint32 matrix (min width 0)."""
    mx = mat.max(axis=1)
    # bit_length via log2-free integer trick
    bw = np.zeros(len(mx), dtype=np.uint8)
    nz = mx > 0
    bw[nz] = np.floor(np.log2(mx[nz].astype(np.float64))).astype(np.uint8) + 1
    return bw


def _pack_group(vals: np.ndarray, bw: int) -> np.ndarray:
    """Pack (n, BLOCK) uint32 values of known bit width bw → (n, BLOCK*bw/8) uint8.

    Materializes only the bw live bits per value (MSB first) instead of a
    full 32-bit expansion — ~bw/32 of the memory traffic, packbits does
    the byte assembly in C."""
    n = vals.shape[0]
    if bw == 0:
        return np.empty((n, 0), dtype=np.uint8)
    # expand only the ceil(bw/8) live LE byte planes with C unpackbits
    # (MSB-first per byte, so high→low plane order gives the 8*nplanes-bit
    # big-endian view), then drop the pad bits above bw — same output bytes
    # as the old per-bit uint32 shift expansion at ~1/4 the memory traffic
    vals32 = np.ascontiguousarray(vals, dtype=np.uint32)
    if sys.byteorder != "little":  # pragma: no cover - x86/arm LE everywhere
        vals32 = vals32.byteswap()
    nplanes = (bw + 7) // 8
    v8 = vals32.view(np.uint8).reshape(n, BLOCK, 4)
    sel = np.ascontiguousarray(v8[:, :, nplanes - 1 :: -1])
    bits = np.unpackbits(sel.reshape(n, BLOCK * nplanes), axis=1)
    pad = 8 * nplanes - bw
    if pad:
        bits = bits.reshape(n, BLOCK, 8 * nplanes)[:, :, pad:]
    return np.packbits(bits.reshape(n, BLOCK * bw), axis=1)


def _unpack_group(packed: np.ndarray, bw: int) -> np.ndarray:
    """Inverse of _pack_group: (n, BLOCK*bw/8) uint8 → (n, BLOCK) uint32.

    Horner accumulation over the bw bit planes (bw cheap vectorized rounds)
    instead of re-expanding to 32-bit bit matrices."""
    n = packed.shape[0]
    if bw == 0:
        return np.zeros((n, BLOCK), dtype=np.uint32)
    bits = np.unpackbits(packed, axis=1)[:, : BLOCK * bw].reshape(n, BLOCK, bw)
    out = bits[:, :, 0].astype(np.uint32)
    for i in range(1, bw):
        out = (out << np.uint32(1)) | bits[:, :, i]
    return out


def encode_postings_batch(
    term_ids: np.ndarray,
    docids: np.ndarray,
    freqs: np.ndarray,
    n_terms: int,
    norm_bytes: np.ndarray | None = None,
) -> Tuple[bytes, np.ndarray, np.ndarray, dict]:
    """Encode ALL terms' postings of one segment in one vectorized pass.

    Input arrays are parallel and sorted by (term_id, docid); ``term_ids``
    must be dense 0..n_terms-1. ``norm_bytes``, if given, is the norm byte
    of each posting's doc (for per-block min-norm impacts).

    Returns ``(blob, term_offsets, term_nbytes, skips)`` where ``skips`` is
    a dict of per-block arrays concatenated in term order:
    ``term`` (int32 owner), ``last_docid`` (int32), ``max_freq`` (int32),
    ``min_norm`` (uint8, 255 when norms not given), ``nbytes`` (int32 —
    the block's encoded size, enabling random block access for WAND).
    """
    npost = len(docids)
    docids = docids.astype(np.int64)
    freqs = freqs.astype(np.uint32)

    # per-term boundaries
    df = np.bincount(term_ids, minlength=n_terms).astype(np.int64)
    term_start = np.concatenate(([0], np.cumsum(df)[:-1]))

    # deltas with reset at term starts: d[i] = docid[i] - docid[i-1]; first of term = docid
    deltas = np.empty(npost, dtype=np.int64)
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[term_start] = docids[term_start]
    deltas_u = deltas.astype(np.uint32)

    # global block assignment: each posting's (term, idx_in_term)
    idx_in_term = np.arange(npost, dtype=np.int64) - np.repeat(term_start, df)
    blocks_per_term = (df + BLOCK - 1) // BLOCK
    blocks_per_term = np.maximum(blocks_per_term, 0)
    term_block_start = np.concatenate(([0], np.cumsum(blocks_per_term)[:-1]))
    n_blocks = int(blocks_per_term.sum())
    block_of_post = np.repeat(term_block_start, df) + idx_in_term // BLOCK
    pos_in_block = (idx_in_term % BLOCK).astype(np.int64)

    # scatter into padded (n_blocks, BLOCK) matrices
    dmat = np.zeros((n_blocks, BLOCK), dtype=np.uint32)
    fmat = np.zeros((n_blocks, BLOCK), dtype=np.uint32)
    dmat[block_of_post, pos_in_block] = deltas_u
    fmat[block_of_post, pos_in_block] = freqs - 1  # freq >= 1 always

    dbw = _bitwidths(dmat)
    fbw = _bitwidths(fmat)

    # per-block byte layout
    dbytes = (BLOCK * dbw.astype(np.int64) + 7) // 8
    fbytes = (BLOCK * fbw.astype(np.int64) + 7) // 8
    blk_nbytes = 2 + dbytes + fbytes
    blk_off = np.concatenate(([0], np.cumsum(blk_nbytes)[:-1]))
    total = int(blk_nbytes.sum())

    out = np.zeros(total, dtype=np.uint8)
    out[blk_off] = dbw
    out[blk_off + 1] = fbw

    # pack groups by bit width (≤32 vectorized rounds per stream)
    for mat, bws, base in ((dmat, dbw, blk_off + 2), (fmat, fbw, blk_off + 2 + dbytes)):
        for bw in np.unique(bws):
            bw = int(bw)
            if bw == 0:
                continue
            sel = np.nonzero(bws == bw)[0]
            packed = _pack_group(mat[sel], bw)  # (n_sel, nb)
            nb = packed.shape[1]
            # scatter each group's bytes: build index matrix (n_sel, nb)
            idx = base[sel][:, None] + np.arange(nb)[None, :]
            out[idx.reshape(-1)] = packed.reshape(-1)

    # per-term offsets into the blob
    term_nblocks = blocks_per_term
    term_offsets = blk_off[term_block_start] if n_blocks else np.zeros(n_terms, dtype=np.int64)
    # terms with df=0 cannot occur (every term has >=1 posting); guard anyway
    term_nbytes = np.zeros(n_terms, dtype=np.int64)
    nz = term_nblocks > 0
    last_blk = term_block_start + term_nblocks - 1
    term_nbytes[nz] = (blk_off[last_blk[nz]] + blk_nbytes[last_blk[nz]]) - blk_off[
        term_block_start[nz]
    ]

    # per-block skip data: last docid + max freq + min norm + encoded size
    # last docid of block = docid at posting index min(start + (b+1)*128, df) - 1
    skip_block_term = np.repeat(np.arange(n_terms), term_nblocks)
    blk_idx_in_term = np.arange(n_blocks) - np.repeat(term_block_start, term_nblocks)
    last_post = np.minimum(
        np.repeat(term_start, term_nblocks) + (blk_idx_in_term + 1) * BLOCK,
        np.repeat(term_start + df, term_nblocks),
    ) - 1
    skip_last_docid = docids[last_post].astype(np.int32)
    skip_max_freq = fmat.max(axis=1).astype(np.int32) + 1

    min_norm = np.full(n_blocks, 255, dtype=np.uint8)
    if norm_bytes is not None and n_blocks:
        # postings are sorted by (term, docid) so block_of_post is
        # nondecreasing: per-block min is a reduceat over block start
        # indices (vectorized C) — minimum.at's per-element scatter was a
        # measurable chunk of segment build time
        blk_starts = np.repeat(term_start, term_nblocks) + blk_idx_in_term * BLOCK
        min_norm = np.minimum.reduceat(
            np.asarray(norm_bytes, dtype=np.uint8), blk_starts
        )

    skips = {
        "term": skip_block_term.astype(np.int32),
        "last_docid": skip_last_docid,
        "max_freq": skip_max_freq,
        "min_norm": min_norm,
        "nbytes": blk_nbytes.astype(np.int32),
    }
    return out.tobytes(), term_offsets.astype(np.int64), term_nbytes, skips


def decode_block(buf: np.ndarray, off: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode ONE block at byte offset ``off`` → (deltas[128], freqs[128]).

    Used by block-max WAND for random block access (block offsets come from
    cumsum of the per-block ``nbytes`` skip column). Caller turns deltas
    into docids via ``prev_block_last_docid + cumsum(deltas)`` (for the
    first block the base is 0, as deltas[0] stores the absolute docid).
    """
    dbw = int(buf[off])
    fbw = int(buf[off + 1])
    p = off + 2
    dnb = (BLOCK * dbw + 7) // 8
    fnb = (BLOCK * fbw + 7) // 8
    deltas = _unpack_group(
        np.ascontiguousarray(buf[p : p + dnb]).reshape(1, dnb), dbw
    )[0]
    freqs = _unpack_group(
        np.ascontiguousarray(buf[p + dnb : p + dnb + fnb]).reshape(1, fnb), fbw
    )[0] + 1
    return deltas.astype(np.int64), freqs.astype(np.int32)


def decode_all_postings(
    buf: np.ndarray, block_offset: np.ndarray, df: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bulk-decode EVERY term's postings of a segment in one vectorized
    pass → flat term-major ``(tids, docids, freqs)`` arrays.

    The merge path's decoder: one Python call per *bit width* (≤32 rounds
    per stream over the whole blob) instead of one ``reader.postings(o)``
    call per vocabulary term (10⁵–10⁶ Python round-trips per partition).
    ``block_offset`` is the absolute byte offset of every block (cumsum of
    the skips ``nbytes`` column — blocks are contiguous in term order);
    ``df`` the per-term doc counts."""
    df = df.astype(np.int64)
    n_terms = len(df)
    tids = np.repeat(np.arange(n_terms, dtype=np.int64), df)
    n_blocks = len(block_offset)
    if n_blocks == 0:
        return tids, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint32)

    dbw = buf[block_offset].astype(np.int64)
    fbw = buf[block_offset + 1].astype(np.int64)
    dnb = (BLOCK * dbw + 7) // 8

    dmat = np.empty((n_blocks, BLOCK), dtype=np.uint32)
    fmat = np.empty((n_blocks, BLOCK), dtype=np.uint32)
    for bws, mat, extra in ((dbw, dmat, None), (fbw, fmat, dnb)):
        for bw in np.unique(bws):
            bw = int(bw)
            sel = np.nonzero(bws == bw)[0]
            if bw == 0:
                mat[sel] = 0
                continue
            nb = (BLOCK * bw + 7) // 8
            base = block_offset[sel] + 2
            if extra is not None:  # freq stream sits after the doc stream
                base = base + extra[sel]
            idx = base[:, None] + np.arange(nb)[None, :]
            mat[sel] = _unpack_group(
                np.ascontiguousarray(buf[idx.reshape(-1)]).reshape(len(sel), nb), bw
            )

    # flatten the padded block matrices to valid entries only: blocks are
    # term-major and contiguous, so the row-major masked flatten lands in
    # exactly (term, docid) posting order
    blocks_per_term = (df + BLOCK - 1) // BLOCK
    term_of_block = np.repeat(np.arange(n_terms, dtype=np.int64), blocks_per_term)
    first_block = np.concatenate(([0], np.cumsum(blocks_per_term)[:-1]))
    blk_in_term = np.arange(n_blocks, dtype=np.int64) - np.repeat(
        first_block, blocks_per_term
    )
    valid_per_block = np.minimum(BLOCK, df[term_of_block] - blk_in_term * BLOCK)
    mask = np.arange(BLOCK, dtype=np.int64)[None, :] < valid_per_block[:, None]
    deltas = dmat[mask].astype(np.int64)
    freqs = fmat[mask] + 1

    # per-term docid reconstruction: global cumsum of deltas minus each
    # term's preceding total (delta[0] of a term stores the absolute docid)
    total = np.cumsum(deltas)
    term_start = np.concatenate(([0], np.cumsum(df)[:-1]))
    nz = df > 0
    base = np.zeros(n_terms, dtype=np.int64)
    base[nz] = total[term_start[nz]] - deltas[term_start[nz]]
    docids = total - np.repeat(base, df)
    return tids, docids, freqs.astype(np.uint32)


class TermPostings:
    """Decoded postings of one term: parallel ``docids``/``freqs`` arrays."""

    __slots__ = ("docids", "freqs")

    def __init__(self, docids: np.ndarray, freqs: np.ndarray):
        self.docids = docids
        self.freqs = freqs


def decode_term_postings(buf: np.ndarray, df: int) -> TermPostings:
    """Decode one term's byte slice (from offset/nbytes) back to postings.

    ``buf`` is a uint8 array/memmap slice containing exactly the term's
    blocks. Blocks are walked once to find widths (cheap: nblocks is
    df/128), then grouped by width and unpacked vectorized.
    """
    n_blocks = (df + BLOCK - 1) // BLOCK
    dbw = np.empty(n_blocks, dtype=np.int64)
    fbw = np.empty(n_blocks, dtype=np.int64)
    off = np.empty(n_blocks, dtype=np.int64)
    p = 0
    for b in range(n_blocks):
        off[b] = p
        dbw[b] = buf[p]
        fbw[b] = buf[p + 1]
        p += 2 + (BLOCK * int(dbw[b]) + 7) // 8 + (BLOCK * int(fbw[b]) + 7) // 8

    dmat = np.empty((n_blocks, BLOCK), dtype=np.uint32)
    fmat = np.empty((n_blocks, BLOCK), dtype=np.uint32)
    for bws, mat, extra in ((dbw, dmat, None), (fbw, fmat, dbw)):
        for bw in np.unique(bws):
            bw = int(bw)
            sel = np.nonzero(bws == bw)[0]
            if bw == 0:
                mat[sel] = 0
                continue
            nb = (BLOCK * bw + 7) // 8
            base = off[sel] + 2
            if extra is not None:  # freq stream sits after the doc stream
                base = base + (BLOCK * extra[sel] + 7) // 8
            idx = base[:, None] + np.arange(nb)[None, :]
            mat[sel] = _unpack_group(np.ascontiguousarray(buf[idx.reshape(-1)]).reshape(len(sel), nb), bw)

    deltas = dmat.reshape(-1)[:df].astype(np.int64)
    docids = np.cumsum(deltas)
    freqs = fmat.reshape(-1)[:df] + 1
    return TermPostings(docids.astype(np.int32), freqs.astype(np.int32))
