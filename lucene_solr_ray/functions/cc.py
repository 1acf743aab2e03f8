"""Distributed connected components over an edge Dataset — the cluster
step that turns pairwise near-duplicate CANDIDATES into duplicate
CLUSTERS (Lee et al. 2022 dedup clusters; cf. Kiveris et al. 2014
"Connected Components in MapReduce and Beyond" for the star-contraction
family this is the simple member of).

Algorithm: min-label propagation. Labels start as each node's own id;
every round each node takes the min label over itself and its neighbors.
A round is expressed as tagged-union message passing — union(edge rows,
label rows) → groupby(BUCKET) → vectorized per-bucket propagate →
groupby(BUCKET of destination) → vectorized per-bucket min-reduce —
i.e. two hash shuffles per round and NO native join. (Ray 2.49's hash
join hard-fails on lineage whose schema isn't statically known: empty
shuffle partitions arrive schema-less and pyarrow join raises "No match
for FieldRef"; grouped map_groups tolerates the same bundles, so the
groupby formulation is the robust one. See ray-data notes in
BASELINE.md.)

Both shuffle-side reduces group by a HASH BUCKET of the node id, never
the node id itself: ``groupby(node)`` means one Python callable (or one
native-aggregate key) per graph node per round — the round-3 scale
finding; measured on a 1M-edge/100k-node random graph the native
``groupby("node").aggregate(Min)`` alone cost 15-31 s per round while
the bucketized numpy reduce runs in ~1 s. Bucketing makes it one
callable per bucket (~cluster CPUs), with every node in the bucket
processed by numpy — stable argsort by node, ``minimum.reduceat`` over
that node's rows, message emission via boolean take. Shuffle volume is
identical (bucket co-partition ≅ node co-partition).

Labels are monotone non-increasing, so convergence is detected by the
label-sum fixpoint (one cheap aggregate per round). Rounds needed = graph
diameter; near-dup graphs are dense clusters with tiny diameters (2-3
rounds). For adversarial long-chain graphs at petabyte scale, swap in
large-star/small-star contraction (same primitives, O(log²) rounds) —
the round structure here is deliberately the simple one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["connected_components"]

# sentinels inside a tagged-union row: edge rows carry no label (MAX so a
# min-reduce ignores them), label rows carry no destination
_NO_LABEL = np.int64(np.iinfo(np.int64).max)
_NO_DST = np.int64(-1)


def _sorted_group_min(key: np.ndarray, val: np.ndarray):
    """(unique_keys, min_val_per_key, order, starts) via stable argsort +
    minimum.reduceat — the whole-block reduce both round phases share."""
    order = np.argsort(key, kind="stable")
    k_s = key[order]
    new_grp = np.empty(len(k_s), dtype=bool)
    new_grp[0] = True
    np.not_equal(k_s[1:], k_s[:-1], out=new_grp[1:])
    starts = np.flatnonzero(new_grp)
    return k_s, np.minimum.reduceat(val[order], starts), order, starts, new_grp


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50):
    """(node, component) Dataset for every node appearing in ``edges``;
    component = min node id reachable."""
    import ray.data
    from ray.data.aggregate import Sum

    from .relational import _key_bucket_hash, default_shuffle_partitions

    B = default_shuffle_partitions()

    def bucket_of(key: np.ndarray) -> np.ndarray:
        return (_key_bucket_hash(pa.array(key)) % np.uint64(B)).astype(np.int64)

    def sym(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([a, b])
        return pa.table(
            {"key": pa.array(key),
             "dst": pa.array(np.concatenate([b, a])),
             "label": pa.array(np.full(2 * len(a), _NO_LABEL)),
             "bucket": pa.array(bucket_of(key))}
        )

    edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )

    _empty_labels = pa.table(
        {"node": pa.array([], type=pa.int64()),
         "label": pa.array([], type=pa.int64()),
         "bucket": pa.array([], type=pa.int64())}
    )

    def min_per_node(t: pa.Table) -> pa.Table:
        """One bucket of (node, label[, ...]) message rows → one row per
        node with its min label. The vectorized replacement for
        ``groupby(node).aggregate(Min)``."""
        if t.num_rows == 0:
            return _empty_labels
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        k_s, lo, _, starts, _ = _sorted_group_min(node, lab)
        uniq = k_s[starts]
        return pa.table(
            {"node": pa.array(uniq), "label": pa.array(lo),
             "bucket": pa.array(bucket_of(uniq))}
        )

    def init_labels(t: pa.Table) -> pa.Table:
        # every endpoint starts labeled with itself; bucket already = the
        # endpoint's bucket on edge rows
        return pa.table(
            {"node": t["key"], "label": t["key"], "bucket": t["bucket"]}
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_per_node, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def as_label_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["node"], "dst": pa.array(np.full(len(t), _NO_DST)),
             "label": t["label"], "bucket": t["bucket"]}
        )

    def propagate(t: pa.Table) -> pa.Table:
        """One bucket = MANY nodes' label + edge rows, all processed with
        numpy: per node lo = min over its label rows, broadcast lo to the
        node itself and every edge destination; messages carry the
        destination's bucket for the reduce shuffle."""
        if t.num_rows == 0:
            return _empty_labels
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        k_s, lo, order, starts, new_grp = _sorted_group_min(key, lab)
        d_s = dst[order]
        gid = np.cumsum(new_grp) - 1
        emask = d_s != _NO_DST
        node = np.concatenate([d_s[emask], k_s[starts]])
        label = np.concatenate([lo[gid[emask]], lo])
        return pa.table(
            {"node": pa.array(node), "label": pa.array(label),
             "bucket": pa.array(bucket_of(node))}
        )

    converged = False
    for _ in range(max_iters):
        tagged = edges.union(
            labels.map_batches(as_label_rows, batch_format="pyarrow")
        )
        labels = (
            tagged.groupby("bucket")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(min_per_node, batch_format="pyarrow")
            .materialize()
        )
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters) — raise max_iters or use a "
            "star-contraction variant for long-chain graphs"
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"].cast(pa.int64()),
             "component": t["label"].cast(pa.int64())}
        )

    return labels.map_batches(finish, batch_format="pyarrow")
