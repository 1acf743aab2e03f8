"""Mergeable quantile sketch: t-digest (Dunning's public algorithm).

The reference's PercentileAgg IS a t-digest (reference: solr/core/src/
java/org/apache/solr/search/facet/PercentileAgg.java ~250 LoC wrapping
com.tdunning.math.stats, branch_8x; SURVEY.md §2.6). This is a
from-scratch re-creation of the merging-digest variant: centroids
(mean, weight) kept under the k1 scale-function size bound, mergeable
across partitions — the shuffle moves ≤ ``2·delta`` centroids per block
regardless of row count.

Use ``tdigest_quantiles(ds, col, qs)`` for unbounded/continuous value
domains; for bounded discrete domains (cents prices) the exact value
histogram in entry_queries.q_percentile_totalprice is both exact and
cheaper.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["TDigest", "tdigest_quantiles"]


class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function."""

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # -- build ------------------------------------------------------------
    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self.means = np.concatenate([self.means, v])
            self.weights = np.concatenate([self.weights, np.ones(len(v))])
            if len(self.means) > 8 * self.delta:
                self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        # k1 scale: k(q) = delta/(2π)·asin(2q−1); a centroid may absorb the
        # next point while k(q_right) − k(q_left) ≤ 1
        out_m: List[float] = []
        out_w: List[float] = []
        q0 = 0.0
        cur_m, cur_w = m[0], w[0]
        k = self.delta / (2 * np.pi)

        def k_of(q):
            return k * np.arcsin(2 * min(max(q, 0.0), 1.0) - 1)

        k_left = k_of(q0)
        for i in range(1, len(m)):
            q_new = q0 + (cur_w + w[i]) / total
            if k_of(q_new) - k_left <= 1.0:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                k_left = k_of(q0)
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- query ------------------------------------------------------------
    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        self._compress()
        m, w = self.means, self.weights
        total = w.sum()
        target = q * total
        cum = np.cumsum(w) - w / 2  # centroid centers
        if target <= cum[0]:
            return float(m[0])
        if target >= cum[-1]:
            return float(m[-1])
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / max(cum[i + 1] - cum[i], 1e-12)
        return float(m[i] + frac * (m[i + 1] - m[i]))


def tdigest_quantiles(ds, col: str, qs: Sequence[float], delta: int = 200):
    """Distributed quantiles: per-block partial digests (map_batches →
    centroid rows, ≤2·delta per block), merged into one digest on the
    driver (the merged input is centroids, bounded by blocks·delta — not
    rows). Returns {q: value}."""

    def partial(batch: pa.Table) -> pa.Table:
        d = TDigest(delta).add(batch[col].to_numpy(zero_copy_only=False))
        d._compress()
        return pa.table(
            {"mean": pa.array(d.means), "weight": pa.array(d.weights)}
        )

    digest = TDigest(delta)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        part = TDigest(delta)
        part.means = b["mean"].to_numpy(zero_copy_only=False).astype(np.float64)
        part.weights = b["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        digest.merge(part)
    return {q: digest.quantile(q) for q in qs}
