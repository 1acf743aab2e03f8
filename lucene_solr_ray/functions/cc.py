"""Distributed connected components over an edge Dataset — the cluster
step that turns pairwise near-duplicate CANDIDATES into duplicate
CLUSTERS (Lee et al. 2022 dedup clusters; cf. Kiveris et al. 2014
"Connected Components in MapReduce and Beyond" for the star-contraction
family this is the simple member of).

Algorithm: min-label propagation. Labels start as each node's own id;
every round each node takes the min label over itself and its neighbors
(one hash join edges⋈labels + one groupby-min — two shuffles per round).
Labels are monotone non-increasing, so convergence is detected by the
label-sum fixpoint (one cheap aggregate per round). Rounds needed = graph
diameter; near-dup graphs are dense clusters with tiny diameters (2-3
rounds). For adversarial long-chain graphs at petabyte scale, swap in
large-star/small-star contraction (same join primitives, O(log²) rounds)
— the round structure here is deliberately the simple one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["connected_components"]


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50):
    """(node, component) Dataset for every node appearing in ``edges``;
    component = min node id reachable. Edges are symmetrized once; each
    round is join + groupby-min; stops at the label-sum fixpoint."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    def sym(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.concatenate([a, b])),
             "dst": pa.array(np.concatenate([b, a]))}
        )

    edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
    for _ in range(max_iters):
        # neighbor labels: edges (src,dst) ⋈ labels(node=src) → (dst, label)
        from .relational import default_shuffle_partitions

        nbr = edges.join(
            labels, join_type="inner",
            num_partitions=default_shuffle_partitions(None),
            on=("src",), right_on=("node",),
        ).select_columns(["dst", "label"]).map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(nbr)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"].cast(pa.int64()),
             "component": t["label"].cast(pa.int64())}
        )

    return labels.map_batches(finish, batch_format="pyarrow")
