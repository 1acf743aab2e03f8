"""Posting-block codec round-trip property tests (SURVEY.md §5 pattern 3:
BasePostingsFormatTestCase analog — random term/doc distributions round-
tripped, including df ∈ {1, 127, 128, 129, 10_000} and degenerate freqs)."""

import numpy as np
import pytest

from lucene_solr_ray.index.postings import (
    BLOCK,
    decode_block,
    decode_term_postings,
    encode_postings_batch,
)


def roundtrip(tids, dids, fqs, n_terms, norms=None):
    blob, toff, tnb, skips = encode_postings_batch(tids, dids, fqs, n_terms, norm_bytes=norms)
    buf = np.frombuffer(blob, dtype=np.uint8)
    for tid in range(n_terms):
        sel = tids == tid
        tp = decode_term_postings(buf[toff[tid] : toff[tid] + tnb[tid]], int(sel.sum()))
        assert (tp.docids == dids[sel]).all(), tid
        assert (tp.freqs == fqs[sel]).all(), tid
    return blob, toff, tnb, skips


@pytest.mark.parametrize("df", [1, 2, 127, 128, 129, 255, 256, 257, 10_000])
def test_single_term_df_boundaries(df):
    rng = np.random.default_rng(df)
    dids = np.sort(rng.choice(df * 50, size=df, replace=False))
    fqs = rng.integers(1, 1000, size=df)
    roundtrip(np.zeros(df, dtype=np.int64), dids, fqs, 1)


@pytest.mark.parametrize("freq_kind", ["all_one", "zipf", "constant_max"])
def test_freq_patterns(freq_kind):
    rng = np.random.default_rng(7)
    df = 1000
    dids = np.sort(rng.choice(100_000, size=df, replace=False))
    if freq_kind == "all_one":
        fqs = np.ones(df, dtype=np.int64)
    elif freq_kind == "zipf":
        fqs = np.minimum(rng.zipf(1.3, size=df), 2**20)
    else:
        fqs = np.full(df, 2**20, dtype=np.int64)
    roundtrip(np.zeros(df, dtype=np.int64), dids, fqs, 1)


def test_many_terms_random():
    rng = np.random.default_rng(42)
    tids, dids, fqs = [], [], []
    n_terms = 200
    for tid in range(n_terms):
        df = int(rng.integers(1, 500))
        dids.extend(np.sort(rng.choice(50_000, size=df, replace=False)))
        tids.extend([tid] * df)
        fqs.extend(rng.integers(1, 300, size=df))
    tids, dids, fqs = map(np.asarray, (tids, dids, fqs))
    norms = rng.integers(0, 256, size=50_000).astype(np.uint8)
    blob, toff, tnb, skips = roundtrip(tids, dids, fqs, n_terms, norms=norms[dids])

    # skip/impact invariants
    for tid in range(n_terms):
        sel = tids == tid
        d, f = dids[sel], fqs[sel]
        bsel = skips["term"] == tid
        last, maxf, minn = (
            skips["last_docid"][bsel],
            skips["max_freq"][bsel],
            skips["min_norm"][bsel],
        )
        nb = (len(d) + BLOCK - 1) // BLOCK
        assert len(last) == nb
        for b in range(nb):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, len(d))
            assert last[b] == d[hi - 1]
            assert maxf[b] == f[lo:hi].max()
            assert minn[b] == norms[d[lo:hi]].min()

    # random block access (decode_block) agrees with sequential decode
    buf = np.frombuffer(blob, dtype=np.uint8)
    tid = int(np.argmax(np.bincount(tids)))  # biggest term
    sel = tids == tid
    d, f = dids[sel], fqs[sel]
    bsel = np.nonzero(skips["term"] == tid)[0]
    off = toff[tid]
    for j, b in enumerate(bsel):
        deltas, freqs = decode_block(buf, int(off))
        base = 0 if j == 0 else int(skips["last_docid"][bsel[j - 1]])
        lo, hi = j * BLOCK, min((j + 1) * BLOCK, len(d))
        got = base + np.cumsum(deltas[: hi - lo])
        assert (got == d[lo:hi]).all()
        assert (freqs[: hi - lo] == f[lo:hi]).all()
        off += int(skips["nbytes"][b])


def test_adjacent_docids_zero_deltas_width():
    # dense run: deltas all 1 → 1-bit blocks; tail padded correctly
    df = 300
    dids = np.arange(1000, 1000 + df)
    fqs = np.ones(df, dtype=np.int64)
    blob, *_ = roundtrip(np.zeros(df, dtype=np.int64), dids, fqs, 1)
    # block 0 pays 10-bit width (absolute first delta 1000 sets the FOR
    # frame): 2+160; blocks 1-2 are 1-bit: 2+16 each; freqs all-1 → 0 bits
    assert len(blob) == (2 + 160) + 2 * (2 + 16)


def test_pack_group_byte_identity_all_bitwidths():
    """The byte-plane _pack_group must emit byte-identical output to the
    reference per-bit expansion for every bit width, and roundtrip through
    _unpack_group (on-disk format stability across the r5 rewrite)."""
    import numpy as np

    from lucene_solr_ray.index.postings import BLOCK, _pack_group, _unpack_group

    def reference_pack(vals, bw):
        n = vals.shape[0]
        if bw == 0:
            return np.empty((n, 0), dtype=np.uint8)
        shifts = np.arange(bw - 1, -1, -1, dtype=np.uint32)
        bits = (vals[:, :, None] >> shifts).astype(np.uint8) & np.uint8(1)
        return np.packbits(bits.reshape(n, BLOCK * bw), axis=1)

    rng = np.random.default_rng(7)
    for bw in range(33):
        hi = (1 << bw) if bw else 1
        vals = rng.integers(0, hi, size=(9, BLOCK), dtype=np.uint64).astype(np.uint32)
        ref = reference_pack(vals, bw)
        got = _pack_group(vals, bw)
        assert got.shape == ref.shape and (got == ref).all(), bw
        if bw:
            assert (_unpack_group(got, bw) == vals).all(), bw
