"""Vectorized ASCII fast path for the analyzer stage.

The regex StandardTokenizer (tokenizer.py) is the semantic reference; this
module re-implements the SAME token boundaries for pure-ASCII documents as
numpy kernels over the raw Arrow string buffer — no per-row Python — and
is used by the analyzer stage for every doc that contains no byte > 0x7F.
Docs with non-ASCII bytes fall back to the regex path (CJK, curly quotes,
İ/Σ lowercase subtleties all live there), so the two paths together are
byte-identical to running the regex tokenizer on everything; the property
test in tests/test_tokenizer.py asserts exactly that.

ASCII projection of the UAX#29 rules implemented (see tokenizer.py for the
full rule set and the reference citations):
- token runs: [0-9A-Za-z_] with an optional leading "_+" and ≥1 alnum;
- MidLetter ∪ Single_Quote ∪ MidNumLet ASCII members {' . :} join when
  both neighbors are letters (WB6/WB7);
- MidNum ∪ MidNumLet ∪ Single_Quote ASCII members {' . , ;} join when
  both neighbors are digits (WB11/WB12);
- tokens never span document boundaries;
- tokens longer than max_token_length split into fixed-size chunks;
- lowercase = ASCII [A-Z] += 0x20 (exact for pure ASCII).

The per-doc term-frequency map (what the analyzer emits — the analog of
Lucene's TermsHashPerField accumulation) is likewise vectorized:
``pa.compute.dictionary_encode`` over the token array (Arrow C++ hash)
then one ``np.unique`` over packed (doc_id, term_code) int64 keys.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "tokenize_ascii_buffer", "doc_tf_from_tokens", "ascii_doc_mask",
    "concat_ranges",
]


def concat_ranges(starts: np.ndarray, lens: np.ndarray):
    """Gather indices for the concatenation of ranges
    ``[starts[i], starts[i]+lens[i])`` → (idx int64[total], out_off
    int64[n+1]). Built with ONE cumsum over the output length (start each
    range with a jump step, +1 inside) instead of arange + np.repeat —
    np.repeat with ragged counts was the single hottest line of the
    analyzer profile. Zero-length ranges are allowed."""
    m = len(starts)
    out_off = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return np.empty(0, dtype=np.int64), out_off
    nz = lens > 0
    s_nz, l_nz = starts[nz], lens[nz]
    # int32 indices when the source fits — halves the memory traffic of
    # the fill + cumsum + gather (token bytes ≈ text bytes per batch)
    dt = np.int32 if int(s_nz.max()) + total < 2**31 - 1 else np.int64
    idx = np.ones(total, dtype=dt)
    idx[0] = s_nz[0]
    if len(s_nz) > 1:
        # output position where each later range begins = cumsum of the
        # nonzero lengths; write the jump from the previous range's end
        pos = np.cumsum(l_nz[:-1])
        idx[pos] = (s_nz[1:] - s_nz[:-1] - l_nz[:-1] + 1).astype(dt)
    np.cumsum(idx, out=idx)
    return idx, out_off

# byte classes
_DIGIT, _LETTER, _UNDER, _MIDL, _MIDN = 1, 2, 4, 8, 16
_CLS = np.zeros(256, dtype=np.uint8)
for b in range(ord("0"), ord("9") + 1):
    _CLS[b] |= _DIGIT
for b in list(range(ord("A"), ord("Z") + 1)) + list(range(ord("a"), ord("z") + 1)):
    _CLS[b] |= _LETTER
_CLS[ord("_")] |= _UNDER
for ch in "'.:":
    _CLS[ord(ch)] |= _MIDL
for ch in "'.,;":
    _CLS[ord(ch)] |= _MIDN
_ALNUM = _DIGIT | _LETTER
_INTOK = _ALNUM | _UNDER


def _string_buffers(arr: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """(byte buffer, int64 offsets) of a non-null String/LargeString array,
    zero-copy, slice-offset corrected."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    if bufs[1] is None:
        return np.empty(0, dtype=np.uint8), np.zeros(len(arr) + 1, dtype=np.int64)
    raw_off = np.frombuffer(bufs[1], dtype=off_dtype)
    offs = raw_off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offs


def ascii_doc_mask(arr: pa.Array) -> np.ndarray:
    """Bool mask: True where the doc contains no byte > 0x7F (and no NUL —
    keeps the classification table honest about the padding sentinel)."""
    data, offs = _string_buffers(arr)
    n = len(arr)
    bad_pos = np.nonzero((data > 0x7F) | (data == 0))[0]
    mask = np.ones(n, dtype=bool)
    if len(bad_pos):
        bad_pos = bad_pos[(bad_pos >= offs[0]) & (bad_pos < offs[-1])]
        docs = np.searchsorted(offs, bad_pos, side="right") - 1
        mask[np.unique(docs)] = False
    if arr.null_count:
        mask &= np.asarray(pc.is_valid(arr))
    return mask


def tokenize_ascii_buffer(
    data: np.ndarray, offs: np.ndarray, max_token_length: int = 255
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token spans over a concatenated pure-ASCII doc buffer.

    Returns (starts, lengths, doc_ids) for every token, in document order.
    ``offs`` delimits docs: doc d = data[offs[d]:offs[d+1]].
    """
    lo, hi = int(offs[0]), int(offs[-1])
    buf = data[lo:hi]
    offs = offs - lo
    L = len(buf)
    if L == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    run_starts, lens = _alnum_runs(
        _CLS[buf], offs, np.nonzero(buf == 0x5F)[0], max_token_length
    )
    doc_ids = np.searchsorted(offs, run_starts, side="right") - 1
    return run_starts + lo, lens, doc_ids


def _alnum_runs(
    cls: np.ndarray, offs: np.ndarray, under_pos: np.ndarray, max_token_length: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Alphanumeric token runs over a class sequence (index space = the
    caller's unit: bytes for ASCII, codepoints for Unicode). Shared core of
    tokenize_ascii_buffer / tokenize_utf8_buffer — returns (starts, lens)."""
    L = len(cls)
    starts_of_docs = offs[:-1][offs[:-1] < L]
    in_tok = (cls & _INTOK) > 0

    # mid chars (' . : , ;) are SPARSE in real text: evaluate the WB6/7 +
    # WB11/12 join rules only at those positions instead of building
    # full-width shifted prev/next class arrays (saves ~8 buffer passes)
    mids = np.nonzero(cls & (_MIDL | _MIDN))[0]
    if len(mids):
        mc = cls[mids]
        prev_cls = np.where(mids > 0, cls[np.maximum(mids - 1, 0)], 0)
        nxt_cls = np.where(mids < L - 1, cls[np.minimum(mids + 1, L - 1)], 0)
        # neighbor classes must not leak across doc boundaries
        i = np.searchsorted(starts_of_docs, mids)
        at_start = (i < len(starts_of_docs)) & (
            starts_of_docs[np.minimum(i, len(starts_of_docs) - 1)] == mids
        )
        prev_cls[at_start] = 0
        doc_end = offs[np.searchsorted(offs, mids, side="right")] - 1
        nxt_cls[mids == doc_end] = 0
        join_m = (
            ((mc & _MIDL) > 0) & ((prev_cls & _LETTER) > 0) & ((nxt_cls & _LETTER) > 0)
        ) | (((mc & _MIDN) > 0) & ((prev_cls & _DIGIT) > 0) & ((nxt_cls & _DIGIT) > 0))
        in_tok[mids[join_m]] = True

    if not in_tok.any():
        z = np.empty(0, dtype=np.int64)
        return z, z.copy()
    # run boundaries from the in-token delta; then split any run spanning a
    # doc boundary (docs routinely end mid-word, so these splits are real)
    d = np.diff(in_tok.view(np.int8))
    run_starts = np.nonzero(d == 1)[0] + 1
    run_ends = np.nonzero(d == -1)[0]  # inclusive
    if in_tok[0]:
        run_starts = np.concatenate(([0], run_starts))
    if in_tok[-1]:
        run_ends = np.concatenate((run_ends, [L - 1]))
    splits = starts_of_docs[starts_of_docs > 0]
    if len(splits):
        # EMPTY docs duplicate boundary offsets (doc d and d+1 share one
        # start); a duplicated split would insert a ZERO-LENGTH run — an
        # empty token credited to the next doc (corrupt terms + dl)
        splits = np.unique(splits)
        splits = splits[in_tok[splits] & in_tok[splits - 1]]
    if len(splits):
        # both inputs are sorted and splits fall strictly inside runs:
        # O(n) merge-insert instead of re-sorting the whole run array
        run_starts = np.insert(
            run_starts, np.searchsorted(run_starts, splits), splits
        )
        run_ends = np.insert(
            run_ends, np.searchsorted(run_ends, splits - 1), splits - 1
        )

    # drop runs with no alphanumeric char: a run can only lack alnum when
    # it is ALL underscores (joined mid chars require alnum neighbors), so
    # count underscores per run against the sparse underscore position
    # list — two searchsorteds, no full-buffer segmented reduce
    if len(run_starts):
        if len(under_pos):
            cnt = np.searchsorted(under_pos, run_ends, side="right") - np.searchsorted(
                under_pos, run_starts, side="left"
            )
            has_alnum = cnt < (run_ends - run_starts + 1)
            if not has_alnum.all():
                run_starts, run_ends = run_starts[has_alnum], run_ends[has_alnum]
    lens = run_ends - run_starts + 1

    # split over-long runs into max_token_length chunks (rare)
    m = max_token_length
    long = lens > m
    if long.any():
        pieces_s, pieces_l = [run_starts[~long]], [lens[~long]]
        for s, ln in zip(run_starts[long], lens[long]):
            ks = np.arange(s, s + ln, m, dtype=np.int64)
            kl = np.minimum(m, s + ln - ks)
            pieces_s.append(ks)
            pieces_l.append(kl)
        run_starts = np.concatenate(pieces_s)
        lens = np.concatenate(pieces_l)
        order = np.argsort(run_starts, kind="stable")
        run_starts, lens = run_starts[order], lens[order]

    return run_starts, lens


# --- vectorized Unicode path ------------------------------------------------
# class flags for non-ASCII codepoints extend the byte table's bit layout
_HAN_F, _HIRA_F, _KATA_F = 32, 64, 128
_CJK_F = _HAN_F | _HIRA_F | _KATA_F
# kana voiced/semi-voiced sound marks (WB:Extend) — mirrors tokenizer._KMARK;
# only 4 codepoints, so the mask is a direct compare instead of a table bit
_KMARK_CPS = np.array([0x3099, 0x309A, 0xFF9E, 0xFF9F], dtype=np.uint32)
_UCLS: np.ndarray | None = None


def _unicode_cls() -> np.ndarray:
    """Full-codepoint class table (uint8[0x110000]) built from the packed
    bitmaps that tools/gen_unicode_cls.py derives from the reference regex
    character classes — the vectorized Unicode path and the regex tokenizer
    therefore share one source of truth for every class decision."""
    global _UCLS
    if _UCLS is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "data", "uax29_cls.npz")
        z = np.load(path)
        n = 0x110000
        t = np.zeros(n, dtype=np.uint8)
        for name, flag in (
            ("digit", _DIGIT), ("letter", _LETTER), ("midl", _MIDL),
            ("midn", _MIDN), ("han", _HAN_F), ("hira", _HIRA_F),
            ("kata", _KATA_F),
        ):
            t |= np.unpackbits(z[name])[:n].astype(np.uint8) * np.uint8(flag)
        t[0x5F] |= _UNDER
        _UCLS = t
    return _UCLS


def _decode_utf8(buf: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized UTF-8 decode of a validated byte buffer → (codepoints
    uint32[n_cp], cp byte positions int64[n_cp])."""
    is_lead = (buf & 0xC0) != 0x80
    cp_pos = np.nonzero(is_lead)[0]
    lead = buf[cp_pos].astype(np.uint32)
    L = len(buf)
    # sequence length per lead byte
    n2 = lead >= 0xC0
    n3 = lead >= 0xE0
    n4 = lead >= 0xF0
    cp = np.where(n4, lead & 0x07, np.where(n3, lead & 0x0F,
                  np.where(n2, lead & 0x1F, lead)))
    if n2.any():
        c1 = buf[np.minimum(cp_pos + 1, L - 1)].astype(np.uint32) & 0x3F
        cp = np.where(n2, (cp << 6) | c1, cp)
        if n3.any():
            c2 = buf[np.minimum(cp_pos + 2, L - 1)].astype(np.uint32) & 0x3F
            cp = np.where(n3, (cp << 6) | c2, cp)
            if n4.any():
                c3 = buf[np.minimum(cp_pos + 3, L - 1)].astype(np.uint32) & 0x3F
                cp = np.where(n4, (cp << 6) | c3, cp)
    return cp, cp_pos


def _mask_runs(mask: np.ndarray, doc_starts: np.ndarray, max_len: int):
    """Maximal runs of a boolean mask, split at doc boundaries and into
    max_len chunks — the [KATA]+ alternative of the reference regex."""
    if not mask.any():
        z = np.empty(0, dtype=np.int64)
        return z, z.copy()
    L = len(mask)
    d = np.diff(mask.view(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0]
    if mask[0]:
        starts = np.concatenate(([0], starts))
    if mask[-1]:
        ends = np.concatenate((ends, [L - 1]))
    splits = doc_starts[doc_starts > 0]
    if len(splits):
        splits = splits[mask[splits] & mask[splits - 1]]
    if len(splits):
        starts = np.insert(starts, np.searchsorted(starts, splits), splits)
        ends = np.insert(ends, np.searchsorted(ends, splits - 1), splits - 1)
    lens = ends - starts + 1
    long = lens > max_len
    if long.any():
        pieces_s, pieces_l = [starts[~long]], [lens[~long]]
        for s, ln in zip(starts[long], lens[long]):
            ks = np.arange(s, s + ln, max_len, dtype=np.int64)
            pieces_s.append(ks)
            pieces_l.append(np.minimum(max_len, s + ln - ks))
        starts = np.concatenate(pieces_s)
        lens = np.concatenate(pieces_l)
        order = np.argsort(starts, kind="stable")
        starts, lens = starts[order], lens[order]
    return starts, lens


def tokenize_utf8_buffer(
    data: np.ndarray, offs: np.ndarray, max_token_length: int = 255
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token BYTE spans over a concatenated UTF-8 doc buffer (the
    vectorized twin of the regex tokenizer for docs with non-ASCII bytes;
    property-pinned token-identical in tests/test_tokenizer.py).

    Decodes codepoints vectorized, classifies them through the
    regex-derived table, builds alnum/mid/underscore runs with the same
    core as the ASCII path plus the Han/Hiragana single-codepoint and
    Katakana-run rules, then maps codepoint spans back to byte spans —
    token bytes are gathered from the original buffer, so no re-encoding.
    max_token_length counts CODEPOINTS, matching the reference."""
    lo, hi = int(offs[0]), int(offs[-1])
    buf = data[lo:hi]
    offs_b = offs - lo
    if len(buf) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    cp, cp_pos = _decode_utf8(buf)
    cls = _unicode_cls()[cp]
    # doc boundaries in codepoint space (doc offsets are valid UTF-8
    # boundaries, so they coincide with codepoint starts)
    offs_cp = np.searchsorted(cp_pos, offs_b, side="left")
    doc_starts = offs_cp[:-1][offs_cp[:-1] < len(cp)]

    # kana voiced-mark attachment (WB4 Extend, kana slice — see
    # tokenizer._KMARK): a maximal mark run attaches to the preceding
    # codepoint iff that codepoint is Han/Hiragana/Katakana in the same
    # doc; attached marks inherit the base char's class so the kata-run
    # and han/hira-single logic below absorbs them. Unattached marks
    # keep class 0 and are dropped, matching the regex path.
    kmark = np.isin(cp, _KMARK_CPS)
    rs = run_len = att_run = None
    if kmark.any():
        mpos = np.nonzero(kmark)[0]
        is_rs = np.ones(len(mpos), dtype=bool)
        is_rs[1:] = np.diff(mpos) != 1
        is_rs |= np.isin(mpos, doc_starts)  # doc boundary splits a run
        rs_idx = np.nonzero(is_rs)[0]
        rs = mpos[rs_idx]
        run_len = np.diff(np.append(rs_idx, len(mpos)))
        att_run = (rs > 0) & ~np.isin(rs, doc_starts) & (
            (cls[np.maximum(rs - 1, 0)] & _CJK_F) > 0
        )
        ridx = np.searchsorted(rs, mpos, side="right") - 1
        att_mark = att_run[ridx]
        cls[mpos[att_mark]] = cls[rs[ridx[att_mark]] - 1]

    starts, lens = _alnum_runs(
        cls, offs_cp, np.nonzero(cp == 0x5F)[0], max_token_length
    )
    # CJK: Han/Hiragana emit single-codepoint tokens (plus any attached
    # mark run), Katakana emits runs
    cjk = cls & (_HAN_F | _HIRA_F)
    if cjk.any() or (cls & _KATA_F).any():
        if rs is not None:
            singles = np.nonzero((cjk > 0) & ~kmark)[0]
            s_lens = np.ones(len(singles), dtype=np.int64)
            j = np.searchsorted(rs, singles + 1)
            hit = j < len(rs)
            hit[hit] = (rs[j[hit]] == singles[hit] + 1) & att_run[j[hit]]
            s_lens[hit] = 1 + run_len[j[hit]]
            long = s_lens > max_token_length
            if long.any():
                # chunk-split like the regex path's buffer behavior
                ps, pl = [singles[~long]], [s_lens[~long]]
                for s0, ln in zip(singles[long], s_lens[long]):
                    ks = np.arange(s0, s0 + ln, max_token_length,
                                   dtype=np.int64)
                    ps.append(ks)
                    pl.append(np.minimum(max_token_length, s0 + ln - ks))
                singles = np.concatenate(ps)
                s_lens = np.concatenate(pl)
        else:
            singles = np.nonzero(cjk)[0]
            s_lens = np.ones(len(singles), dtype=np.int64)
        k_starts, k_lens = _mask_runs(
            (cls & _KATA_F) > 0, doc_starts, max_token_length
        )
        starts = np.concatenate([starts, singles, k_starts])
        lens = np.concatenate([lens, s_lens, k_lens])
        order = np.argsort(starts, kind="stable")
        starts, lens = starts[order], lens[order]
    doc_ids = np.searchsorted(offs_cp, starts, side="right") - 1
    # codepoint spans → byte spans
    cp_end = np.append(cp_pos, len(buf))
    b_starts = cp_pos[starts]
    b_lens = cp_end[starts + lens] - b_starts
    return b_starts + lo, b_lens, doc_ids


def tokens_to_string_array(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> pa.Array:
    """Gather token bytes (ASCII-lowercased) into one Arrow StringArray."""
    n = len(starts)
    if n == 0:
        return pa.array([], type=pa.string())
    idx, out_off = concat_ranges(starts, lens)
    tok = data[idx]
    upper = (tok >= 0x41) & (tok <= 0x5A)
    tok[upper] += 0x20
    # pa.py_buffer wraps the numpy memory zero-copy and keeps it alive
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(tok)
    )


def doc_tf_from_tokens(
    tokens: pa.Array, doc_ids: np.ndarray, n_docs: int, want_positions: bool = False
):
    """Per-doc term-frequency accumulation, fully vectorized.

    Returns (unique terms values array, list offsets int64[n_docs+1],
    freqs int32, dl int32[, flat positions int32]): doc d's unique terms
    are values[offsets[d]:offsets[d+1]] with matching freqs. With
    ``want_positions``, also returns the within-doc token positions of
    every (doc, term) pair, flattened in (doc, term, position) order —
    inner list lengths are exactly ``freqs``.
    """
    dl = np.bincount(doc_ids, minlength=n_docs).astype(np.int32)
    if len(tokens) == 0:
        empty = (
            pa.array([], type=pa.string()),
            np.zeros(n_docs + 1, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            dl,
        )
        return empty + (np.empty(0, dtype=np.int32),) if want_positions else empty
    enc = pc.dictionary_encode(tokens)
    codes = enc.indices.to_numpy().astype(np.int64)
    # pack (doc, code) into the narrowest dtype the ranges allow — int32
    # keys halve the sort's memory traffic (typical batch: <1k docs ×
    # <100k-term dict fits easily)
    bits = max(1, int(len(enc.dictionary) - 1).bit_length() if len(enc.dictionary) else 1)
    if n_docs.bit_length() + bits <= 31:
        key = ((doc_ids << bits) | codes).astype(np.int32)
        shift = bits
    else:
        key = (doc_ids.astype(np.int64) << 32) | codes
        shift = 32
    mask = (np.int64(1) << shift) - 1
    if not want_positions:
        uniq, counts = np.unique(key, return_counts=True)
    else:
        # positions need the stable permutation anyway — derive the unique
        # keys/counts from ONE argsort instead of sorting the keys twice
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        first = np.ones(len(key_s), dtype=bool)
        first[1:] = key_s[1:] != key_s[:-1]
        uniq = key_s[first]
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(key_s)))
    uniq = uniq.astype(np.int64)
    u_docs = uniq >> shift
    u_codes = uniq & mask
    offsets = np.searchsorted(u_docs, np.arange(n_docs + 1, dtype=np.int64))
    values = enc.dictionary.take(pa.array(u_codes))
    if not want_positions:
        return values, offsets, counts.astype(np.int32), dl
    # token position within its doc, regrouped by (doc, term) in ascending
    # position order (the stable argsort keeps token order)
    doc_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(dl.astype(np.int64), out=doc_start[1:])
    tok_pos = (np.arange(len(tokens), dtype=np.int64) - doc_start[doc_ids]).astype(
        np.int32
    )
    return values, offsets, counts.astype(np.int32), dl, tok_pos[order]
