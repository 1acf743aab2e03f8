"""Distributed connected components over an edge Dataset — the cluster
step that turns pairwise near-duplicate CANDIDATES into duplicate
CLUSTERS (Lee et al. 2022 dedup clusters; cf. Kiveris et al. 2014
"Connected Components in MapReduce and Beyond" for the star-contraction
family this is the simple member of).

Algorithm: min-label propagation. Labels start as each node's own id;
every round each node takes the min label over itself and its neighbors.
A round is expressed as tagged-union message passing — union(edge rows,
label rows) → groupby(node) → emit (neighbor, my_label) messages →
groupby-min — i.e. two hash shuffles per round and NO native join.
(Ray 2.49's hash join hard-fails on lineage whose schema isn't statically
known: empty shuffle partitions arrive schema-less and pyarrow join
raises "No match for FieldRef"; grouped aggregates tolerate the same
bundles, so the groupby formulation is the robust one. See
ray-data notes in BASELINE.md.)

Labels are monotone non-increasing, so convergence is detected by the
label-sum fixpoint (one cheap aggregate per round). Rounds needed = graph
diameter; near-dup graphs are dense clusters with tiny diameters (2-3
rounds). For adversarial long-chain graphs at petabyte scale, swap in
large-star/small-star contraction (same primitives, O(log²) rounds) —
the round structure here is deliberately the simple one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50):
    """(node, component) Dataset for every node appearing in ``edges``;
    component = min node id reachable."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    def sym(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"key": pa.array(np.concatenate([a, b])),
             "dst": pa.array(np.concatenate([b, a])),
             "label": pa.nulls(2 * len(a), pa.int64())}
        )

    edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["key"], "label": t["key"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def as_label_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["node"], "dst": pa.nulls(len(t), pa.int64()),
             "label": t["label"]}
        )

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # one group = one node: its label row(s) + its outgoing edge rows;
        # broadcast min(label) to every neighbor and back to the node
        lab = g["label"].dropna()
        lo = int(lab.min())
        dsts = g["dst"].dropna().to_numpy(dtype=np.int64)
        nodes = np.concatenate([dsts, [np.int64(g["key"].iloc[0])]])
        return pd.DataFrame({"node": nodes, "label": np.full(len(nodes), lo,
                                                             dtype=np.int64)})

    converged = False
    for _ in range(max_iters):
        tagged = edges.union(
            labels.map_batches(as_label_rows, batch_format="pyarrow")
        )
        labels = (
            tagged.groupby("key")
            .map_groups(propagate, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
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
