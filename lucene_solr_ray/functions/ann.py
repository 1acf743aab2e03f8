"""Similarity search over an embedding column: brute-force cosine top-k
baseline + LSH-bucketed scale path.

The vector analog of the engine's top-k machinery (same heap-merge
discipline as SURVEY.md §2.7; the reference's own knn surface is
MoreLikeThis / streaming ``knn()``, solr/solrj/.../io/stream/KnnStream.java,
branch_8x — term-based, so this is a capability extension, not a port).

Scale design: queries are BROADCAST once (``ray.put`` of the (Q, d) query
matrix); each ``map_batches`` task does one numpy matmul against its batch
and emits only its local top-k rows per query (k·Q rows per batch, not the
batch); the global answer is a groupby(query)-merge of local top-ks —
identical shape to the BM25 top-k merge, no all-to-all of vectors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["brute_force_cosine_topk", "lsh_cosine_topk", "ivf_cosine_topk", "decode_fixed_dim"]


def decode_fixed_dim(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy decode of a ``list<float>`` embedding column with a fixed
    dimension into a (B, d) matrix: ``combine_chunks → flatten → reshape``
    instead of ``to_pylist`` (which boxes every float into a Python
    object)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    d = len(flat) // n
    lens = np.diff(col.offsets.to_numpy())
    if not (lens == d).all():
        raise ValueError("embedding column is ragged — fixed dim required")
    return flat.reshape(n, d).astype(dtype, copy=False)


def _batch_topk_rows(sims, ids, qids, k):
    """Local top-k per query from a (Q, B) sim matrix → long-form arrays."""
    out_q, out_id, out_sim = [], [], []
    B = sims.shape[1]
    kk = min(k, B)
    for qi in range(sims.shape[0]):
        s = sims[qi]
        idx = np.argpartition(-s, kk - 1)[:kk] if B > kk else np.arange(B)
        out_q.extend([qids[qi]] * len(idx))
        out_id.extend(ids[idx].tolist())
        out_sim.extend(s[idx].tolist())
    return out_q, out_id, out_sim


def _merge_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
    return g


def brute_force_cosine_topk(
    ds,
    query_matrix_ref,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact cosine top-k: Dataset of (id, vec) × broadcast queries.

    ``query_matrix_ref``: ``ray.put`` of an L2-NORMALIZED float64 (Q, d)
    matrix (or the matrix itself for local runs)."""
    import ray

    qids = list(query_ids)

    def local_topk(batch: pa.Table) -> pa.Table:
        Q = (
            ray.get(query_matrix_ref)
            if not isinstance(query_matrix_ref, np.ndarray)
            else query_matrix_ref
        )
        ids = batch[id_col].to_numpy()
        mat = decode_fixed_dim(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = Q @ mat.T  # (Q, B)
        if exclude_self:
            qid_arr = np.asarray(qids)
            self_mask = ids[None, :] == qid_arr[:, None]
            sims = np.where(self_mask, -np.inf, sims)
        oq, oi, os = _batch_topk_rows(sims, ids, qids, k)
        return pa.table(
            {
                "query_id": pa.array(oq, type=pa.int64()),
                "vec_id": pa.array(oi, type=pa.int64()),
                "sim": pa.array(os, type=pa.float64()),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


def lsh_cosine_topk(
    ds,
    query_matrix_ref,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    exclude_self: bool = True,
):
    """Approximate cosine top-k via random-hyperplane LSH (public Charikar
    scheme): vectors bucket by sign patterns in ``n_tables`` tables; each
    query scans only its buckets. The scale path: the groupby key
    (table_id, bucket) bounds each comparison set; recall grows with
    n_tables. Results are approximate — verified against the brute-force
    baseline by recall, not equality."""
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    qids = list(query_ids)

    def q_buckets(Q):
        # (T, Q) bucket codes of the queries
        signs = (np.einsum("tpd,qd->tqp", planes, Q) > 0).astype(np.uint32)
        return (signs << np.arange(n_planes, dtype=np.uint32)).sum(axis=2)

    def explode(batch: pa.Table) -> pa.Table:
        Q = (
            ray.get(query_matrix_ref)
            if not isinstance(query_matrix_ref, np.ndarray)
            else query_matrix_ref
        )
        qb = q_buckets(Q)  # (T, Q)
        ids = batch[id_col].to_numpy()
        mat = decode_fixed_dim(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        signs = (np.einsum("tpd,bd->tbp", planes, matn) > 0).astype(np.uint32)
        codes = (signs << np.arange(n_planes, dtype=np.uint32)).sum(axis=2)  # (T, B)
        # keep only vectors landing in some query's bucket (candidate
        # prune) — all-numpy accumulation, vec column emitted as a
        # zero-copy ListArray over the flat float buffer
        sel_t, sel_b, sel_id, sel_rows = [], [], [], []
        for t in range(n_tables):
            sel = np.isin(codes[t], qb[t])
            m = int(sel.sum())
            if not m:
                continue
            sel_t.append(np.full(m, t, dtype=np.int32))
            sel_b.append(codes[t][sel].astype(np.int64))
            sel_id.append(ids[sel])
            sel_rows.append(matn[sel])
        if not sel_t:
            return pa.table(
                {
                    "table_id": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        rows = np.concatenate(sel_rows)
        d = matn.shape[1]
        off = np.arange(rows.shape[0] + 1, dtype=np.int32) * d
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(sel_t)),
                "bucket": pa.array(np.concatenate(sel_b)),
                "vec_id": pa.array(np.concatenate(sel_id), type=pa.int64()),
                "vec": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(rows.reshape(-1))
                ),
            }
        )

    def score_bucket(g: pa.Table) -> pa.Table:
        Q = (
            ray.get(query_matrix_ref)
            if not isinstance(query_matrix_ref, np.ndarray)
            else query_matrix_ref
        )
        qb = q_buckets(Q)
        t = g["table_id"][0].as_py()
        bucket = g["bucket"][0].as_py()
        q_here = np.nonzero(qb[t] == bucket)[0]
        if not len(q_here):
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        ids = g["vec_id"].to_numpy()
        mat = decode_fixed_dim(g["vec"])
        qid_arr = np.asarray(qids)[q_here]
        sims = Q[q_here] @ mat.T  # (q_here, B)
        if exclude_self:
            sims = np.where(ids[None, :] == qid_arr[:, None], -np.inf, sims)
        B = len(ids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qid_arr, B), type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, len(q_here)), type=pa.int64()),
                "sim": pa.array(sims.reshape(-1), type=pa.float64()),
            }
        )

    cands = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["table_id", "bucket"])
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    # a (query, vec) pair can appear in several tables with IDENTICAL sim
    # (same Q, same normalized vector) — dedup is therefore a native Max
    # aggregate, not a per-group Python head(1)
    from ray.data.aggregate import Max

    uniq = cands.groupby(["query_id", "vec_id"]).aggregate(
        Max("sim", alias_name="sim")
    )
    return uniq.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


def ivf_cosine_topk(
    ds,
    query_matrix_ref,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    lloyd_iters: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
):
    """Approximate cosine top-k via IVF (inverted-file) coarse
    quantization — the classic public IVF-flat scheme: a small k-means
    codebook (trained once on a bounded sample, Lloyd iterations in
    numpy), every vector assigned to its nearest centroid CELL, each
    query scanning only its ``nprobe`` nearest cells.

    Scale shape: the codebook is tiny and broadcast; assignment is one
    matmul per batch; only vectors in a probed cell are emitted (map-side
    candidate prune), and the per-cell scoring groupby is bounded by cell
    population — same discipline as the LSH variant, with data-adaptive
    buckets instead of random hyperplanes. A vector lives in exactly ONE
    cell, so no cross-table dedup is needed."""
    import ray

    qids = list(query_ids)

    # --- train the coarse quantizer on a bounded sample (driver-side:
    # sample size is a constant, not data-sized) ---------------------------
    sample_tabs, got = [], 0
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        sample_tabs.append(b)
        got += b.num_rows
        if got >= train_sample:
            break
    Xs = np.concatenate([decode_fixed_dim(t[vec_col]) for t in sample_tabs])[:train_sample]
    norms = np.linalg.norm(Xs, axis=1)
    norms[norms == 0] = 1.0
    Xs = Xs / norms[:, None]
    rng = np.random.default_rng(seed)
    C = Xs[rng.choice(len(Xs), size=min(n_centroids, len(Xs)), replace=False)].copy()
    for _ in range(lloyd_iters):
        assign = (Xs @ C.T).argmax(axis=1)  # cosine on normalized vectors
        for c in range(len(C)):
            members = Xs[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    cent_ref = ray.put(C)

    def probe_cells(Q, C):
        sims = Q @ C.T  # (Q, n_centroids)
        return np.argsort(-sims, axis=1)[:, : min(nprobe, C.shape[0])]

    def explode(batch: pa.Table) -> pa.Table:
        Q = (
            ray.get(query_matrix_ref)
            if not isinstance(query_matrix_ref, np.ndarray)
            else query_matrix_ref
        )
        Cc = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        wanted = np.unique(probe_cells(Q, Cc))
        ids = batch[id_col].to_numpy()
        mat = decode_fixed_dim(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        cell = (matn @ Cc.T).argmax(axis=1)
        sel = np.isin(cell, wanted)
        d = matn.shape[1]
        flat = matn[sel].reshape(-1)
        off = np.arange(int(sel.sum()) + 1, dtype=np.int32) * d
        return pa.table(
            {
                "cell": pa.array(cell[sel].astype(np.int64)),
                "vec_id": pa.array(ids[sel], type=pa.int64()),
                "vec": pa.ListArray.from_arrays(pa.array(off), pa.array(flat)),
            }
        )

    def score_cell(g: pa.Table) -> pa.Table:
        Q = (
            ray.get(query_matrix_ref)
            if not isinstance(query_matrix_ref, np.ndarray)
            else query_matrix_ref
        )
        Cc = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        cells_of_q = probe_cells(Q, Cc)
        cell = g["cell"][0].as_py()
        q_here = np.nonzero((cells_of_q == cell).any(axis=1))[0]
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
        if not len(q_here):
            return empty
        ids = g["vec_id"].to_numpy()
        mat = decode_fixed_dim(g["vec"])
        qid_arr = np.asarray(qids)[q_here]
        sims = Q[q_here] @ mat.T  # (q_here, B)
        if exclude_self:
            sims = np.where(ids[None, :] == qid_arr[:, None], -np.inf, sims)
        B = len(ids)
        kk = min(k, B)
        if B > kk:
            # per-query local top-k inside the cell before the merge
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            idx = np.tile(np.arange(B), (len(q_here), 1))
        rows = np.repeat(qid_arr, idx.shape[1])
        picked = idx.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows, type=pa.int64()),
                "vec_id": pa.array(ids[picked], type=pa.int64()),
                "sim": pa.array(
                    np.take_along_axis(sims, idx, axis=1).reshape(-1),
                    type=pa.float64(),
                ),
            }
        )

    cands = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(score_cell, batch_format="pyarrow")
    )
    return cands.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )
