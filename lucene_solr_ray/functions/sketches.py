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

__all__ = ["TDigest", "tdigest_quantiles", "heavy_hitters"]


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


def heavy_hitters(ds, text_col: str, capacity: int = 256, k: int = 10,
                  split: str = " "):
    """Misra-Gries / Space-Saving heavy hitters over a token stream — the
    approximate top-k frequent items sketch a tokenizer-training or
    vocab-discovery pipeline runs over 100 TB of text (no reference
    analog; mergeable-summaries construction from Agarwal et al. 2012,
    "Mergeable Summaries", PODS).

    Per batch: vectorized split + one Arrow group_by count, then the MG
    reduction — if the batch has more than ``capacity`` distinct tokens,
    subtract the (capacity+1)-th largest count from every count and keep
    the positive remainder (≤ capacity entries). Each batch therefore
    ships O(capacity) rows into ONE small groupby-sum shuffle regardless
    of batch size or vocabulary. Merged estimates obey
    ``true - N/(capacity+1) <= est <= true`` for total token count N, so
    every token with frequency > N/(capacity+1) survives.

    Returns a Dataset of the top-``k`` (token, cnt) rows, ties broken by
    token ascending (facet sort order). When the corpus vocabulary fits
    in ``capacity`` the sketch is exact."""
    import pyarrow.compute as pc

    def mg_batch(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch[text_col], split))
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "wt": pa.array([], type=pa.int64())})
        counts = pa.table({"token": flat}).group_by("token").aggregate(
            [("token", "count")]
        )
        # rename by NAME, not position (column order differs across
        # pyarrow releases for group_by output)
        tok = counts["token"]
        wt = counts["token_count"].to_numpy().astype(np.int64)
        if len(wt) > capacity:
            thr = np.partition(wt, len(wt) - capacity - 1)[len(wt) - capacity - 1]
            keep = wt > thr
            tok = pc.array_filter(tok.combine_chunks(), pa.array(keep))
            wt = wt[keep] - thr
        return pa.table({"token": tok, "wt": pa.array(wt, type=pa.int64())})

    from ray.data.aggregate import Sum

    summed = (
        ds.map_batches(mg_batch, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("wt", alias_name="cnt"))
    )
    return summed.sort(["cnt", "token"], descending=[True, False]).limit(k)
