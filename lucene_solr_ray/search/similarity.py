"""BM25 similarity, float32-exact to Lucene 8.x semantics.

From-scratch re-creation of lucene/core/src/java/org/apache/lucene/search/
similarities/BM25Similarity.java (branch_8x; SURVEY.md Appendix A.1):

- ``idf(t) = (float) ln(1 + (N - df + 0.5) / (df + 0.5))`` — double log,
  cast to float32.
- Since LUCENE-8563 (8.0) the ``(k1+1)`` numerator factor is dropped:
  per-term weight ``w = boost * idf`` (float32).
- A 256-entry per-field cache holds the *reciprocal* norm factor:
  ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))``
  (all float32 arithmetic), where ``LENGTH_TABLE`` decodes the lossy
  SmallFloat norm byte.
- Per (term, doc): ``score = w - w / (1 + freq * cache[normByte])``,
  evaluated in float32 in exactly that form so that ``w`` is a monotone
  upper bound for block-max WAND.
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)``.

A deliberately-slow scalar oracle (``score_scalar``) mirrors the
vectorized path for tests, and an alternative float64/exact-norm mode
(``Bm25Similarity(lossy_norms=False, dtype=float64)``) exists solely so
DuckDB SQL oracles can reproduce scores exactly (SQL cannot express the
float32 rounding or the SmallFloat table compactly).
"""

from __future__ import annotations

import numpy as np

from ..analysis.smallfloat import LENGTH_TABLE

__all__ = [
    "Bm25Similarity",
    "ClassicSimilarity",
    "register_similarity",
    "similarity_from_config",
]

F32 = np.float32


class Bm25Similarity:
    """``mode="recip_mul"`` (default): Lucene 8.x float32 semantics —
    reciprocal norm cache, ``w - w/(1 + freq * cache[norm])``.
    ``mode="div"``: direct norm-factor division ``w - w/(1 + freq / nf)``
    — used with ``dtype=float64`` for SQL-oracle parity (SQL cannot
    express float32 rounding; this mode is the Similarity-plugin analog,
    SURVEY.md §2.11)."""

    #: per-term weight is a monotone upper bound on the term's score —
    #: block-max WAND pruning is sound (TFIDF's sqrt(freq) growth is not)
    wand_safe = True

    def __init__(self, k1: float = 1.2, b: float = 0.75, lossy_norms: bool = True,
                 dtype=np.float32, mode: str = "recip_mul"):
        self.k1 = dtype(k1)
        self.b = dtype(b)
        self.lossy_norms = lossy_norms
        self.dtype = dtype
        self.mode = mode

    @classmethod
    def from_config(cls, cfg: dict | None) -> "Bm25Similarity":
        cfg = cfg or {}
        dtype = {"float32": np.float32, "float64": np.float64}[cfg.get("dtype", "float32")]
        return cls(
            k1=cfg.get("k1", 1.2), b=cfg.get("b", 0.75), dtype=dtype,
            mode=cfg.get("mode", "recip_mul"),
        )

    def idf(self, df, n_docs) -> np.ndarray:
        """float32(ln(1 + (N - df + 0.5)/(df + 0.5))), vectorized over df."""
        df = np.asarray(df, dtype=np.float64)
        val = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        return val.astype(self.dtype)

    def avgdl(self, sum_total_tf: int, doc_count: int):
        return self.dtype(np.float64(sum_total_tf) / np.float64(doc_count))

    def norm_inverse_cache(self, avgdl) -> np.ndarray:
        """256-entry norm cache: reciprocal factor in recip_mul mode, the
        plain norm factor in div mode."""
        dt = self.dtype
        table = LENGTH_TABLE.astype(dt)
        one = dt(1.0)
        nf = self.k1 * ((one - self.b) + self.b * table / dt(avgdl))
        if self.mode == "div":
            return nf.astype(dt)
        return (one / nf).astype(dt)

    def score_freqs(self, weight, freqs: np.ndarray, norm_bytes: np.ndarray,
                    cache: np.ndarray) -> np.ndarray:
        """Vectorized per-(term,doc) score; expression shape depends on mode
        (recip_mul: w - w/(1 + freq*cache[n]); div: w - w/(1 + freq/cache[n]))."""
        dt = self.dtype
        w = dt(weight)
        nrm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
        freqs = np.asarray(freqs, dtype=dt)
        if self.mode == "div":
            return (w - w / (dt(1.0) + freqs / nrm)).astype(dt)
        return (w - w / (dt(1.0) + freqs * nrm)).astype(dt)

    def score_exact_dl(self, weight, freqs: np.ndarray, dl: np.ndarray, avgdl):
        """Non-lossy variant (for SQL-oracle parity): normFactor from exact dl."""
        dt = self.dtype
        w = dt(weight)
        freqs = np.asarray(freqs, dtype=dt)
        dl = np.asarray(dl, dtype=dt)
        norm = self.k1 * ((dt(1.0) - self.b) + self.b * dl / dt(avgdl))
        return (w - w / (dt(1.0) + freqs / norm)).astype(dt)

    # -- scalar oracle path (slow, independent arithmetic order) ------------
    def score_scalar(self, weight: float, freq: int, norm_byte: int, cache: np.ndarray) -> float:
        dt = self.dtype
        w = dt(weight)
        ni = cache[int(norm_byte) & 0xFF]
        return float(dt(w - w / (dt(1.0) + dt(freq) * ni)))


class ClassicSimilarity:
    """Lucene's TF-IDF ClassicSimilarity (reference: lucene/core/src/java/
    org/apache/lucene/search/similarities/ClassicSimilarity.java +
    TFIDFSimilarity.java, branch_8x; SURVEY.md §2.11 Similarity plugin):

    - ``idf(t) = (float) (ln((N + 1) / (df + 1)) + 1)``
    - ``tf(freq) = sqrt(freq)``
    - norm decodes the SAME lossy length byte the index stores for BM25
      (Lucene 8 norms are length-based for every similarity):
      ``normTable[b] = 1 / sqrt(LENGTH_TABLE[b])``
    - ``score = boost * idf * tf(freq) * normTable[normByte]``
      (queryNorm and coord were removed in Lucene 7/8).

    ``wand_safe`` is False: sqrt(freq) is unbounded, so the per-term
    weight is NOT an upper bound and block-max WAND pruning would drop
    true hits — the searcher forces exhaustive scoring for this plugin.
    A ``dtype=float64`` mode exists for SQL-oracle parity (DuckDB
    reproduces the lossy length bucket from the LENGTH_TABLE values)."""

    wand_safe = False

    def __init__(self, k1: float = 1.2, b: float = 0.75, lossy_norms: bool = True,
                 dtype=np.float32, mode: str = "recip_mul"):
        # k1/b/mode accepted for config-shape compatibility; unused
        self.lossy_norms = lossy_norms
        self.dtype = dtype
        self.mode = mode

    @classmethod
    def from_config(cls, cfg: dict | None) -> "ClassicSimilarity":
        cfg = cfg or {}
        dtype = {"float32": np.float32, "float64": np.float64}[cfg.get("dtype", "float32")]
        return cls(dtype=dtype, mode=cfg.get("mode", "recip_mul"))

    def idf(self, df, n_docs) -> np.ndarray:
        df = np.asarray(df, dtype=np.float64)
        val = np.log((n_docs + 1.0) / (df + 1.0)) + 1.0
        return val.astype(self.dtype)

    def avgdl(self, sum_total_tf: int, doc_count: int):
        return self.dtype(np.float64(sum_total_tf) / np.float64(doc_count))

    def norm_inverse_cache(self, avgdl) -> np.ndarray:
        """256-entry table: ``1/sqrt(decoded length)`` in the default
        (Lucene-style precomputed multiply) mode; ``sqrt(decoded length)``
        in ``mode="div"`` so the float64 SQL oracle's ``x / sqrt(len)`` is
        reproduced bit-exactly (``x * (1/sqrt(len))`` differs in the last
        ulp). avgdl is unused (kept for the Similarity interface shape)."""
        dt = self.dtype
        table = np.sqrt(LENGTH_TABLE.astype(dt))
        if self.mode == "div":
            return table.astype(dt)
        # byte 0 decodes length 0 (a doc with no indexed terms — it can
        # never appear in a posting list, so its entry is never read)
        inv = np.zeros_like(table)
        np.divide(dt(1.0), table, out=inv, where=table > 0)
        return inv.astype(dt)

    def score_freqs(self, weight, freqs: np.ndarray, norm_bytes: np.ndarray,
                    cache: np.ndarray) -> np.ndarray:
        dt = self.dtype
        w = dt(weight)
        nrm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
        freqs = np.asarray(freqs, dtype=dt)
        if self.mode == "div":
            return (w * np.sqrt(freqs) / nrm).astype(dt)
        return (w * np.sqrt(freqs) * nrm).astype(dt)

    def score_scalar(self, weight: float, freq: int, norm_byte: int, cache: np.ndarray) -> float:
        dt = self.dtype
        nrm = cache[int(norm_byte) & 0xFF]
        val = dt(weight) * dt(np.sqrt(dt(freq)))
        return float(dt(val / nrm if self.mode == "div" else val * nrm))


#: Similarity SPI (SURVEY.md §2.11; reference solr schema
#: ``<similarity class=...>`` plugin point): name → class with
#: ``from_config``; extend with ``register_similarity``.
SIMILARITIES = {
    "bm25": Bm25Similarity,
    "classic": ClassicSimilarity,
}


def register_similarity(name: str, cls) -> None:
    SIMILARITIES[name] = cls


def similarity_from_config(cfg: dict | None):
    cfg = cfg or {}
    name = cfg.get("name", "bm25")
    try:
        cls = SIMILARITIES[name]
    except KeyError:
        raise ValueError(
            f"unknown similarity {name!r}; registered: {sorted(SIMILARITIES)}"
        ) from None
    return cls.from_config(cfg)
