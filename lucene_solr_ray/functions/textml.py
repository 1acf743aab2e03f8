"""Solr ML / graph streaming-expression analogs (SURVEY.md §2.8):

- ``train()``        — TextLogitStream ([8x] solr/solrj/src/java/org/apache/
  solr/client/solrj/io/stream/TextLogitStream.java ~800 LoC): iterative
  logistic-regression training where each iteration broadcasts the current
  weight vector to every shard, shards compute PARTIAL gradients over their
  own documents, and the coordinator sums the partials and updates the
  weights. Our analog keeps exactly that dataflow: the featurized corpus is
  a materialized Dataset of fixed-width tf vectors; one ``map_batches``
  pass per iteration emits ONE partial-gradient row per block (k+1 floats),
  and only those tiny rows reach the driver. Feature values are raw term
  frequencies plus an intercept slot (the reference scales by idf pulled
  from the same featuresSelection stream; tf is the documented v0 choice —
  the dataflow, not the scaling, is the load-bearing analog).
- ``classify()``     — ClassifyStream ([8x] …/io/stream/ClassifyStream.java
  ~250 LoC): score every tuple against a trained model. One streaming
  ``map_batches`` pass; the model (terms + weights) is a small broadcast
  closure. Emits the raw logit, sigmoid probability and predicted class.
- ``features()``     — FeaturesSelectionStream ([8x] …/io/stream/
  FeaturesSelectionStream.java ~400 LoC): information-gain term selection
  over a labeled training set. Distinct (doc, term) pairs explode
  vectorized per batch; per-term class counts ride the bucketed
  combiner+merge shuffle (relational.bucketed_agg — one partial row per
  distinct term per block, never data rows); IG is computed vectorized on
  the aggregated term table with the two scalar corpus totals broadcast in
  a closure, then a global sort+limit picks the top-k. log2 entropy, with
  ``0·log2 0 = 0``.
- ``shortest_path()`` — ShortestPathStream ([8x] …/io/stream/
  ShortestPathStream.java ~500 LoC): BFS over an edge table. Each hop is
  one distributed semi-join of the edges against the frontier (broadcast
  while the frontier is small — the graph_traverse routing), new nodes are
  discovered by an anti-join against the visited set, and the canonical
  parent per node is the minimum source key (deterministic paths). First
  discovery is minimum distance, so no relaxation rounds are needed.

Float caveat (mirrors functions/lm.py): training sums float64 partial
gradients in block order, so ``train()`` is pytest-gated against a
single-process numpy reference (planted-separation recovery + monotone
loss) rather than DuckDB. ``classify()`` with binary-fraction weights and
integer tf is EXACT in float64 and oracle-checked bit-for-bit;
``features()``'s counts are integer-exact and its IG is floor-e6 checked.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import (
    broadcast_table,
    bucketed_agg,
    distinct,
    semi_join,
    semi_join_broadcast_table,
)

__all__ = [
    "featurize",
    "train_logit",
    "classify",
    "features_ig",
    "shortest_path",
    "gather_nodes",
    "score_nodes",
]


def _tf_matrix(batch: pa.Table, terms: Sequence[str], text_col: str,
               split: str) -> np.ndarray:
    """Dense (rows × (1+k)) float64 tf matrix with the intercept in slot 0.
    Vectorized: split → flatten → ``index_in`` against the term list →
    one ``bincount`` over packed (row, term) codes. No Python per row."""
    k = len(terms)
    nrows = batch.num_rows
    toks = pc.split_pattern(pc.coalesce(batch[text_col], ""), split)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    rows = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    idx = pc.index_in(pc.list_flatten(toks), value_set=pa.array(terms))
    idx_np = idx.combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(idx, pa.ChunkedArray) else idx.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else np.ones(
        len(idx_np), dtype=bool)
    if idx_np.dtype.kind == "f":
        hit_rows = rows[valid]
        hit_terms = idx_np[valid].astype(np.int64)
    else:  # non-null int indices with a validity bitmap handled above
        hit_rows, hit_terms = rows, idx_np.astype(np.int64)
    X = np.zeros((nrows, k + 1), dtype=np.float64)
    X[:, 0] = 1.0
    if len(hit_rows):
        counts = np.bincount(hit_rows * k + hit_terms, minlength=nrows * k)
        X[:, 1:] = counts.reshape(nrows, k).astype(np.float64)
    return X


def featurize(ds, terms: Sequence[str], text_col: str = "text",
              id_col: str = "doc_id", label_col: Optional[str] = None):
    """Corpus → Dataset of (id [, label], f) where ``f`` is the
    fixed-size-list tf vector with intercept slot 0. This is the training
    working set TextLogitStream re-derives per iteration from the index;
    we materialize it once (~8·(k+1) bytes per doc — far smaller than the
    text it replaces) so every GD iteration is one pass over compact
    fixed-width blocks."""
    terms = list(terms)
    k = len(terms)

    def fn(batch: pa.Table) -> pa.Table:
        X = _tf_matrix(batch, terms, text_col, " ")
        cols = {id_col: batch[id_col]}
        if label_col is not None:
            cols["label"] = pc.cast(batch[label_col], pa.int64())
        cols["f"] = pa.FixedSizeListArray.from_arrays(
            pa.array(X.reshape(-1)), k + 1)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _f_matrix(batch: pa.Table, k1: int) -> np.ndarray:
    col = batch["f"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.values, dtype=np.float64).reshape(-1, k1)


def train_logit(ds, terms: Sequence[str], label_col: str,
                text_col: str = "text", id_col: str = "doc_id",
                iterations: int = 20, learning_rate: float = 0.5):
    """TextLogitStream analog: full-batch gradient descent. Per iteration,
    ONE streaming pass over the featurized corpus; each block contributes
    a single partial row (gradient k+1 floats, log-loss, error count, n);
    the driver sums ≤ num_blocks partials and updates the weights — the
    reference's shard-partial/coordinator-sum loop verbatim. Returns
    ``(weights, history)`` where history is a per-iteration DataFrame
    (iteration, log_loss, error_rate) like the tuples the stream emits."""
    import pandas as pd
    import ray

    terms = list(terms)
    k1 = len(terms) + 1
    feats = featurize(ds, terms, text_col=text_col, id_col=id_col,
                      label_col=label_col).materialize()
    w = np.zeros(k1, dtype=np.float64)
    history = []
    for it in range(iterations):
        w_ref = ray.put(w)

        def grad(batch: pa.Table) -> pa.Table:
            wt = ray.get(w_ref)
            X = _f_matrix(batch, k1)
            y = batch["label"].to_numpy().astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(X @ wt)))
            g = X.T @ (p - y)
            pc_ = np.clip(p, 1e-12, 1 - 1e-12)
            loss = float(-(y * np.log(pc_) + (1 - y) * np.log1p(-pc_)).sum())
            err = int(((p >= 0.5) != (y >= 0.5)).sum())
            return pa.table({
                "g": pa.FixedSizeListArray.from_arrays(pa.array(g), k1),
                "loss": pa.array([loss]), "err": pa.array([err]),
                "n": pa.array([len(y)]),
            })

        parts = feats.map_batches(grad, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in parts)
        g = np.zeros(k1, dtype=np.float64)
        for r in parts:
            g += np.asarray(r["g"], dtype=np.float64)
        w = w - learning_rate * g / max(n, 1)
        history.append({
            "iteration": it,
            "log_loss": sum(r["loss"] for r in parts) / max(n, 1),
            "error_rate": sum(r["err"] for r in parts) / max(n, 1),
        })
    return w, pd.DataFrame(history)


def classify(ds, terms: Sequence[str], weights: Sequence[float],
             text_col: str = "text", id_col: str = "doc_id"):
    """ClassifyStream analog: one streaming pass scoring every doc with a
    fixed model. ``weights[0]`` is the intercept. Emits (id, logit,
    probability, predicted); with binary-fraction weights and integer tf
    the logit is exact float64 (the oracle contract keys on it)."""
    terms = list(terms)
    w = np.asarray(list(weights), dtype=np.float64)
    if len(w) != len(terms) + 1:
        raise ValueError("weights must be [intercept] + one per term")

    def fn(batch: pa.Table) -> pa.Table:
        X = _tf_matrix(batch, terms, text_col, " ")
        z = X @ w
        return pa.table({
            id_col: batch[id_col],
            "logit": pa.array(z),
            "probability": pa.array(1.0 / (1.0 + np.exp(-z))),
            "predicted": pa.array((z > 0).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def features_ig(ds, label_col: str, top_k: int = 10,
                text_col: str = "text", id_col: str = "doc_id",
                num_partitions: Optional[int] = None):
    """FeaturesSelectionStream analog: top-k terms by information gain
    against a binary label. Returns a Dataset (term, pos_docs, docs,
    ig_e6) sorted by (ig_e6 desc, term asc) — the floor-e6 fixed-point of
    the gain so the ORDERING itself is ulp-stable across engines."""
    n_docs = ds.count()
    n_pos = int(ds.sum(label_col) or 0)

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.coalesce(batch[text_col], ""), " ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        t = pa.table({
            "_row": pa.array(rows),
            "term": pc.list_flatten(toks),
            "lab": pa.array(np.repeat(
                batch[label_col].to_numpy().astype(np.int64), lens)),
        })
        t = t.filter(pc.not_equal(t["term"], ""))
        # local DISTINCT (docs never span batches → per-batch pair dedup
        # IS global pair dedup), then drop the row key
        t = t.group_by(["_row", "term", "lab"]).aggregate([])
        return t.select(["term", "lab"])

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    counts = bucketed_agg(
        pairs, "term", [("lab", "sum"), ("lab", "count")],
        ["pos_docs", "docs"], num_partitions=num_partitions,
    )

    def ig(batch: pa.Table) -> pa.Table:
        pos = batch["pos_docs"].to_numpy().astype(np.float64)
        tot = batch["docs"].to_numpy().astype(np.float64)
        N, Np = float(n_docs), float(n_pos)

        def H(p):
            p = np.clip(p, 0.0, 1.0)
            out = np.zeros_like(p)
            m = (p > 0) & (p < 1)
            pm = p[m]
            out[m] = -(pm * np.log2(pm) + (1 - pm) * np.log2(1 - pm))
            return out

        h_c = H(np.array([Np / N]))[0] if N else 0.0
        p_t = tot / N
        gain = h_c - p_t * H(pos / tot) - (1 - p_t) * H(
            np.divide(Np - pos, N - tot, out=np.zeros_like(pos),
                      where=(N - tot) > 0))
        # IG is mathematically ≥ 0; float cancellation can land a hair
        # under zero, and floor() would turn -1e-16 into -1 on one engine
        # and +1e-16 into 0 on the other — clamp BEFORE the fixed-point
        # (the oracle SQL applies the same greatest(gain, 0))
        gain = np.maximum(gain, 0.0)
        return pa.table({
            "term": batch["term"],
            "pos_docs": batch["pos_docs"],
            "docs": batch["docs"],
            "ig_e6": pa.array(np.floor(gain * 1e6).astype(np.int64)),
        })

    scored = counts.map_batches(ig, batch_format="pyarrow")
    return scored.sort(["ig_e6", "term"], descending=[True, False]).limit(top_k)


def gather_nodes(edges_ds, from_col: str, to_col: str, start_keys,
                 num_partitions: Optional[int] = None,
                 broadcast_threshold: int = 1_000_000):
    """gatherNodes()/nodes() stream with the count(*) aggregation ([8x]
    solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
    GatherNodesStream.java ~700 LoC): expand one hop from ``start_keys``
    and count, per discovered node, how many edges gathered it. One
    distributed semi-join (start set broadcast while small) + one bucketed
    combiner+merge count — the per-node exchange never moves edge rows.
    Returns a Dataset (node, gathered)."""
    import ray.data as _rd

    start = _rd.from_items([{from_col: k} for k in start_keys])
    if len(start_keys) <= broadcast_threshold:
        s_ref = broadcast_table(start)
        hop = semi_join_broadcast_table(edges_ds, s_ref, on=from_col)
    else:
        hop = semi_join(edges_ds, start, on=from_col,
                        num_partitions=num_partitions)
    out = bucketed_agg(hop, to_col, [(to_col, "count")], ["gathered"],
                       num_partitions=num_partitions)
    return out.map_batches(
        lambda t: t.rename_columns(["node", "gathered"]),
        batch_format="pyarrow",
    )


def score_nodes(gathered_ds, coll_ds, node_col: str,
                num_partitions: Optional[int] = None):
    """scoreNodes() stream ([8x] …/io/graph/ScoreNodesStream.java ~250
    LoC): rank gathered nodes tf-idf style — the gather count is the term
    frequency and the node's document frequency in the backing collection
    supplies the idf, so hub nodes that appear everywhere stop dominating
    the traversal. score = gathered · ln(N / df).

    Scale shape: N is one streaming count; df is computed ONLY for the
    gathered nodes (the collection is semi-joined against the node set
    first, then one bucketed count — the full-vocabulary frequency table
    is never built); the final (node, gathered)⋈(node, df) join runs on
    two already-aggregated tables. Returns (node, gathered, df,
    score_e6 = floor(score · 1e6)) — the fixed-point convention keeping
    ln() ulp-stable across engines."""
    n_docs = coll_ds.count()
    hits = semi_join(
        coll_ds.select_columns([node_col]),
        gathered_ds, on=node_col, right_on="node",
        num_partitions=num_partitions,
    )
    df = bucketed_agg(hits, node_col, [(node_col, "count")], ["df"],
                      num_partitions=num_partitions)
    df = df.map_batches(lambda t: t.rename_columns(["node", "df"]),
                        batch_format="pyarrow")
    # heal bucketed/map_groups lineage before the native hash join (empty
    # schema-less bundles on tiny inputs — the round-4 gotcha)
    from .relational import default_shuffle_partitions
    P = default_shuffle_partitions(num_partitions)
    joined = gathered_ds.repartition(P).join(
        df.repartition(P), join_type="inner", num_partitions=P, on=("node",),
    )

    def score(t: pa.Table) -> pa.Table:
        g = t["gathered"].to_numpy().astype(np.float64)
        d = t["df"].to_numpy().astype(np.float64)
        s = g * np.log(float(n_docs) / d)
        return pa.table({
            "node": t["node"],
            "gathered": t["gathered"],
            "df": t["df"],
            "score_e6": pa.array(np.floor(s * 1e6).astype(np.int64)),
        })

    return joined.map_batches(score, batch_format="pyarrow")


def shortest_path(edges_ds_fn, from_col: str, to_col: str, src,
                  dst=None, max_hops: int = 6,
                  num_partitions: Optional[int] = None,
                  broadcast_threshold: int = 1_000_000):
    """ShortestPathStream analog: BFS from ``src``. Each hop is one
    distributed semi-join of the edge table against the frontier
    (broadcast below ``broadcast_threshold``, hash semi-join above — the
    graph_traverse routing); nodes already visited are removed with a
    per-batch mask against the broadcast visited set while it is small,
    else a distributed anti-join. First discovery IS minimum distance
    (BFS invariant), and the canonical parent is the minimum ``from`` key.

    Returns ``(dist_ds, path)``: ``dist_ds`` a Dataset (node, dist,
    parent) over every node reached within ``max_hops`` (src itself has
    dist 0, null parent); ``path`` the canonical min-parent node list
    ``[src, …, dst]`` when ``dst`` was reached, else None. Path walk-back
    touches ≤ max_hops single-node lookups on the (small, driver-held)
    per-hop parent slices — never the edge table."""
    import ray.data as _rd

    int_keys = isinstance(src, (int, np.integer))
    # hop_sets[h]: MATERIALIZED Dataset (node, parent) of hop-h discoveries;
    # driver state per hop is just the Dataset handle + its count. The
    # frontier/visited driver-side key SETS exist only while they fit under
    # broadcast_threshold — above it every membership test is a distributed
    # semi/anti-join and nothing node-shaped crosses the driver.
    src_t = pa.table({
        "node": pa.array([src]),
        "parent": pa.array([None], type=pa.int64() if int_keys else pa.string()),
    })
    hop_sets = [_rd.from_arrow(src_t).materialize()]
    hop_counts = [1]
    frontier_keys = {src}          # None once too big to hold
    visited_keys = {src}           # None once too big to hold
    found_at = 0 if dst == src else None
    for hop in range(1, max_hops + 1):
        if found_at is not None:
            break
        edges = edges_ds_fn()
        frontier = hop_sets[-1].map_batches(
            lambda t: t.select(["node"]).rename_columns([from_col]),
            batch_format="pyarrow",
        )
        if frontier_keys is not None:
            f_ref = broadcast_table(frontier)
            step = semi_join_broadcast_table(edges, f_ref, on=from_col)
        else:
            step = semi_join(edges, frontier, on=from_col,
                             num_partitions=num_partitions)
        # min parent per target, computed distributed (one partial row per
        # distinct target per block rides the bucketed shuffle)
        new = bucketed_agg(step, to_col, [(from_col, "min")], ["parent"],
                           num_partitions=num_partitions)
        new = new.map_batches(
            lambda t: t.rename_columns(["node", "parent"]),
            batch_format="pyarrow",
        )
        if visited_keys is not None:
            def unseen(t: pa.Table, _seen=frozenset(visited_keys)) -> pa.Table:
                col = t["node"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                keep = ~np.fromiter((v in _seen for v in col.to_pylist()),
                                    dtype=bool, count=t.num_rows)
                return t.filter(pa.array(keep))

            new = new.map_batches(unseen, batch_format="pyarrow")
        else:
            for prev in hop_sets:
                new = semi_join(new, prev, on="node", anti=True,
                                num_partitions=num_partitions)
        hop_ds = new.materialize()
        hop_n = hop_ds.count()
        if hop_n == 0:
            break
        hop_sets.append(hop_ds)
        hop_counts.append(hop_n)
        if hop_n <= broadcast_threshold and visited_keys is not None \
                and len(visited_keys) + hop_n <= 4 * broadcast_threshold:
            nodes = [r["node"] for r in hop_ds.take_all()]
            frontier_keys = set(nodes)
            visited_keys.update(nodes)
            if dst is not None and dst in frontier_keys:
                found_at = hop
        else:
            frontier_keys = None
            visited_keys = None
            if dst is not None and hop_ds.filter(
                    expr=f"node == {dst!r}").count():
                found_at = hop

    def tag(h):
        def fn(t: pa.Table, _h=h) -> pa.Table:
            return t.append_column(
                "dist", pa.array(np.full(t.num_rows, _h, dtype=np.int64))
            ).select(["node", "dist", "parent"])
        return fn

    dist_ds = hop_sets[0].map_batches(tag(0), batch_format="pyarrow")
    for h in range(1, len(hop_sets)):
        dist_ds = dist_ds.union(
            hop_sets[h].map_batches(tag(h), batch_format="pyarrow"))
    path = None
    if dst is not None and found_at is not None:
        # walk back ≤ max_hops single-node lookups; each is a point filter
        # on ONE hop's (small) materialized slice, never the edge table
        path = [dst]
        for h in range(found_at, 0, -1):
            node = path[-1]
            row = hop_sets[h].filter(expr=f"node == {node!r}").take(1)
            path.append(row[0]["parent"])
        path.reverse()
    return dist_ds, path
