"""BM25 formula-level tests (SURVEY.md §5 pattern 2 — TestBM25Similarity
analog): idf formula, norm cache quantization, float32 evaluation order,
near-tie behavior after lossy norm encoding."""

import math

import numpy as np

from lucene_solr_ray.analysis.smallfloat import LENGTH_TABLE, _int_to_byte4_scalar
from lucene_solr_ray.search.similarity import Bm25Similarity

SIM = Bm25Similarity()


def test_idf_formula():
    # idf = float32(ln(1 + (N - df + 0.5)/(df + 0.5)))
    for n, df in [(100, 1), (100, 50), (100, 100), (10**6, 3), (7, 7)]:
        got = SIM.idf(df, n)[()]
        exp = np.float32(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        assert got == exp
    # df == N still positive (Lucene property: idf > 0 always)
    assert SIM.idf(100, 100)[()] > 0


def test_norm_cache_values():
    avgdl = SIM.avgdl(420_000, 1000)  # avgdl 420
    cache = SIM.norm_inverse_cache(avgdl)
    assert cache.dtype == np.float32
    k1, b = np.float32(1.2), np.float32(0.75)
    for i in [0, 1, 39, 40, 100, 255]:
        lt = np.float32(LENGTH_TABLE[i])
        exp = np.float32(1.0) / np.float32(
            k1 * np.float32(np.float32(np.float32(1.0) - b) + np.float32(np.float32(b * lt) / np.float32(avgdl)))
        )
        assert cache[i] == exp, i
    # longer docs → smaller reciprocal norm factor (monotone)
    assert (np.diff(cache[1:]) < 0).all()


def test_score_shape_and_monotonicity():
    avgdl = SIM.avgdl(100_000, 1000)
    cache = SIM.norm_inverse_cache(avgdl)
    w = np.float32(2.5)
    freqs = np.array([1, 2, 5, 100, 10**6])
    norm = np.full(len(freqs), _int_to_byte4_scalar(100), dtype=np.uint8)
    s = SIM.score_freqs(w, freqs, norm, cache)
    assert s.dtype == np.float32
    assert (np.diff(s) > 0).all()          # increasing in freq
    assert (s < w).all()                   # w is a strict upper bound
    # increasing doc length → lower score at same freq
    lens = [10, 50, 100, 1000, 4000]
    norms = np.array([_int_to_byte4_scalar(l) for l in lens], dtype=np.uint8)
    s2 = SIM.score_freqs(w, np.full(5, 3), norms, cache)
    assert (np.diff(s2) < 0).all()


def test_lossy_norm_near_tie():
    """Two docs whose exact lengths differ but quantize to the SAME norm
    byte must score identically (the lossy-norm semantics); docs in
    different buckets must not."""
    avgdl = SIM.avgdl(420_000, 1000)
    cache = SIM.norm_inverse_cache(avgdl)
    w = np.float32(1.0)
    b_255 = _int_to_byte4_scalar(255)
    b_256 = _int_to_byte4_scalar(256)
    assert b_255 == b_256  # same bucket (248..~263)
    s = SIM.score_freqs(w, np.array([4, 4]), np.array([b_255, b_256], dtype=np.uint8), cache)
    assert s[0] == s[1]
    b_200 = _int_to_byte4_scalar(200)
    assert b_200 != b_255
    s2 = SIM.score_freqs(w, np.array([4]), np.array([b_200], dtype=np.uint8), cache)
    assert s2[0] != s[0]


def test_float32_evaluation_order_pinned():
    """score = w - w/(1 + freq * cache[norm]) evaluated in float32 — the
    exact Lucene 8.x expression shape (weight is the WAND upper bound)."""
    avgdl = SIM.avgdl(100, 10)
    cache = SIM.norm_inverse_cache(avgdl)
    w = np.float32(3.7)
    freq, nb = 7, 13
    ni = cache[nb]
    exp = np.float32(w - np.float32(w / np.float32(np.float32(1.0) + np.float32(np.float32(freq) * ni))))
    got = SIM.score_freqs(w, np.array([freq]), np.array([nb], dtype=np.uint8), cache)[0]
    assert got == exp
    assert SIM.score_scalar(w, freq, nb, cache) == float(exp)
