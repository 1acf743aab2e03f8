"""Distributed k-means over an embedding column — corpus clustering for
SemDeDup-style semantic dedup, domain discovery, and data-mixture
curation (no reference analog; SURVEY.md training-data extensions).

Scale shape (the part that matters at 100 TB): every Lloyd iteration is
ONE streaming pass — centroids are broadcast once per iteration via
``ray.put``, each batch computes its assignments with a single matmul
and emits at most k partial rows (cluster, count, sse, per-dim sums), and
a k-row groupby-sum reduces them. The driver only ever touches k×(d+2)
numbers per iteration; vectors never leave their blocks. Contrast with
ann.ivf_cosine_topk's codebook, which trains on a bounded sample — this
is the full-corpus variant for when cluster quality is the product.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from .ann import decode_fixed_dim

__all__ = ["kmeans_fit", "kmeans_assign"]


def _init_centroids(ds, vec_col: str, k: int, sample: int, seed: int) -> np.ndarray:
    """k-means++ on a bounded driver-side sample (sample size is a
    constant, not data-sized — same discipline as IVF training)."""
    tabs, got = [], 0
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        tabs.append(b)
        got += b.num_rows
        if got >= sample:
            break
    X = np.concatenate([decode_fixed_dim(t[vec_col]) for t in tabs])[:sample]
    rng = np.random.default_rng(seed)
    C = [X[rng.integers(len(X))]]
    for _ in range(1, min(k, len(X))):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(C)[None, :, :]) ** 2).sum(-1), axis=1
        )
        tot = d2.sum()
        if tot <= 0:
            C.append(X[rng.integers(len(X))])
            continue
        C.append(X[rng.choice(len(X), p=d2 / tot)])
    return np.asarray(C, dtype=np.float64)


def kmeans_fit(ds, vec_col: str = "embedding", k: int = 10, iters: int = 8,
               seed: int = 42, init_sample: int = 4096,
               ) -> Tuple[np.ndarray, list]:
    """Full-corpus Lloyd iterations; returns ``(centroids, inertia_per_iter)``
    (inertia = summed squared distance, non-increasing across iterations)."""
    import ray
    from ray.data.aggregate import Sum

    C = _init_centroids(ds, vec_col, k, init_sample, seed)
    d = C.shape[1]
    sum_cols = [f"s{j}" for j in range(d)]
    inertia = []

    for _ in range(iters):
        cent_ref = ray.put(C)

        def partials(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
            Cc = ray.get(cent_ref)
            X = decode_fixed_dim(batch[vec_col])
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ Cc.T) + (Cc * Cc).sum(1)[None, :]
            a = d2.argmin(axis=1)
            sse_row = d2[np.arange(len(X)), a]
            cl, inv = np.unique(a, return_inverse=True)
            n = np.bincount(inv).astype(np.int64)
            sse = np.bincount(inv, weights=sse_row)
            sums = np.zeros((len(cl), X.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, X)
            cols = {"cluster": pa.array(cl.astype(np.int64)),
                    "n": pa.array(n), "sse": pa.array(sse)}
            for j, name in enumerate(sum_cols):
                cols[name] = pa.array(sums[:, j])
            return pa.table(cols)

        aggs = [Sum("n", alias_name="n"), Sum("sse", alias_name="sse")]
        aggs += [Sum(c, alias_name=c) for c in sum_cols]
        red = (ds.map_batches(partials, batch_format="pyarrow")
               .groupby("cluster").aggregate(*aggs).to_pandas())
        inertia.append(float(red["sse"].sum()))
        for _, row in red.iterrows():
            c = int(row["cluster"])
            n = float(row["n"])
            if n > 0:
                C[c] = np.array([row[s] for s in sum_cols]) / n
    return C, inertia


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """One streaming pass: ``(id, cluster, sq_dist)`` per vector."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cent_ref)
        X = decode_fixed_dim(batch[vec_col])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ Cc.T) + (Cc * Cc).sum(1)[None, :]
        a = d2.argmin(axis=1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "sq_dist": pa.array(d2[np.arange(len(X)), a]),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 10, iters: int = 6, threshold: float = 0.95,
             seed: int = 42, max_cluster: int = 8192):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means the embedding
    space, then look for near-duplicate pairs ONLY within each cluster —
    cosine ≥ ``threshold`` drops the higher id of the pair. All-pairs work
    is confined to one cluster per task (groupby(cluster) + a vectorized
    normalized-Gram matmul per group) instead of the corpus-wide O(n²);
    clusters above ``max_cluster`` are truncated with a loud log (at real
    scale raise k so clusters stay bounded — cluster count is the knob).

    Returns a Dataset of (id, keep:bool, cluster) covering every vector.
    """
    import ray.data  # noqa: F401

    C, _ = kmeans_fit(ds, vec_col, k=k, iters=iters, seed=seed)

    # ship (id, cluster, vector) rows into per-cluster groups: assign
    # per batch so the vectors travel WITH their rows (one shuffle total)
    import ray as _ray
    cent_ref = _ray.put(np.asarray(C, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        Cc = _ray.get(cent_ref)
        X = decode_fixed_dim(batch[vec_col])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ Cc.T) + (Cc * Cc).sum(1)[None, :]
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            vec_col: batch[vec_col],
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def dedup_cluster(g: pa.Table) -> pa.Table:
        # Arrow group table + decode_fixed_dim: one zero-copy buffer view
        # per group, no per-row Python vector boxing (the pandas-objects
        # np.stack was the round-3 finding)
        all_ids = g[id_col].to_numpy()
        Xall = decode_fixed_dim(g[vec_col])
        order = np.argsort(all_ids)
        ids = all_ids[order]
        overflow = np.empty(0, dtype=ids.dtype)
        if len(ids) > max_cluster:
            import logging

            logging.getLogger(__name__).warning(
                "semdedup: cluster %s over cap (%d > %d): members past the "
                "cap pass through UNdeduplicated (raise k so clusters stay "
                "bounded)",
                g["cluster"][0].as_py(), len(ids), max_cluster,
            )
            overflow = ids[max_cluster:]
            order = order[:max_cluster]
            ids = ids[:max_cluster]
        X = Xall[order].astype(np.float64, copy=False)
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        Xn = X / n[:, None]
        sim = Xn @ Xn.T
        # drop the HIGHER id of any pair over threshold (upper triangle)
        iu = np.triu_indices(len(ids), k=1)
        dup_hi = np.unique(iu[1][sim[iu] >= threshold])
        keep = np.ones(len(ids), dtype=bool)
        keep[dup_hi] = False
        if len(overflow):
            # every vector must appear in the output: over-cap members are
            # emitted keep=True (not silently dropped)
            ids = np.concatenate([ids, overflow])
            keep = np.concatenate([keep, np.ones(len(overflow), dtype=bool)])
        return pa.table({
            id_col: pa.array(ids),
            "keep": pa.array(keep),
            "cluster": pa.array(
                np.full(len(ids), g["cluster"][0].as_py(), dtype=np.int64)),
        })

    return tagged.groupby("cluster").map_groups(dedup_cluster,
                                                batch_format="pyarrow")
