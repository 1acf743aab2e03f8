"""functions/textml.py — the §2.8 ML/graph stream analogs, pinned against
single-process numpy / brute-force references."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray_session, rows, parallelism=4):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows)).repartition(parallelism)


def _planted(n=400, seed=7):
    """Positive docs lean on 'aard'/'bent', negatives on 'zebu'/'yolk';
    shared noise tokens on both sides."""
    rng = np.random.default_rng(seed)
    texts, labels, ids = [], [], []
    noise = ["the", "data", "query", "scan"]
    for i in range(n):
        y = int(rng.random() < 0.5)
        toks = list(rng.choice(noise, size=5))
        strong = ["aard", "bent"] if y else ["zebu", "yolk"]
        toks += list(rng.choice(strong, size=int(rng.integers(1, 4))))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        labels.append(y)
        ids.append(i)
    return {"doc_id": ids, "text": texts, "lab": labels}


TERMS = ["aard", "bent", "zebu", "yolk", "the"]


def _tf_reference(texts, terms):
    X = np.zeros((len(texts), len(terms) + 1))
    X[:, 0] = 1.0
    idx = {t: j for j, t in enumerate(terms)}
    for i, s in enumerate(texts):
        for tok in s.split(" "):
            j = idx.get(tok)
            if j is not None:
                X[i, 1 + j] += 1.0
    return X


def test_classify_matches_numpy(ray_session):
    from lucene_solr_ray.functions.textml import classify

    rows = _planted(200)
    w = np.array([-0.75, 1.5, 0.5, -1.25, -0.5, 0.25])
    out = classify(_docs_ds(ray_session, rows), TERMS, w).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    X = _tf_reference(rows["text"], TERMS)
    z = X @ w
    # binary-fraction weights x integer tf: bit-exact, not just close
    assert np.array_equal(out["logit"].to_numpy(), z)
    assert np.array_equal(out["predicted"].to_numpy(), (z > 0).astype(np.int64))
    assert np.allclose(out["probability"], 1 / (1 + np.exp(-z)))


def test_classify_empty_text_and_missing_terms(ray_session):
    from lucene_solr_ray.functions.textml import classify

    rows = {"doc_id": [0, 1], "text": ["", None]}
    out = classify(_docs_ds(ray_session, rows, parallelism=1),
                   ["nope"], [0.5, 3.0]).to_pandas()
    assert list(out.sort_values("doc_id")["logit"]) == [0.5, 0.5]


def test_train_logit_matches_numpy_reference(ray_session):
    from lucene_solr_ray.functions.textml import train_logit

    rows = _planted(300)
    iters, lr = 12, 0.5
    w, hist = train_logit(
        _docs_ds(ray_session, rows), TERMS, "lab",
        iterations=iters, learning_rate=lr,
    )
    # single-process full-batch GD reference (same update rule)
    X = _tf_reference(rows["text"], TERMS)
    y = np.asarray(rows["lab"], dtype=np.float64)
    wr = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1 / (1 + np.exp(-(X @ wr)))
        wr -= lr * (X.T @ (p - y)) / len(y)
    # identical math; only float summation ORDER differs across blocks
    assert np.allclose(w, wr, rtol=1e-9, atol=1e-12)
    # planted separation recovered: positive-term weights above negatives'
    assert w[1] > 0 and w[2] > 0 and w[3] < 0 and w[4] < 0
    losses = hist["log_loss"].to_numpy()
    assert (np.diff(losses) < 0).all(), "full-batch GD loss must decrease"
    assert hist["error_rate"].iloc[-1] <= 0.05


def test_features_ig_against_bruteforce(ray_session):
    from lucene_solr_ray.functions.textml import features_ig

    rows = _planted(250, seed=11)
    out = features_ig(_docs_ds(ray_session, rows), "lab", top_k=6).to_pandas()

    # brute-force IG
    import math

    docs = [set(t.split(" ")) - {""} for t in rows["text"]]
    y = rows["lab"]
    N, Np = len(docs), sum(y)

    def H(p):
        return 0.0 if p <= 0 or p >= 1 else -(
            p * math.log2(p) + (1 - p) * math.log2(1 - p))

    vocab = sorted(set().union(*docs))
    scored = []
    for t in vocab:
        tot = sum(1 for d in docs if t in d)
        pos = sum(yy for d, yy in zip(docs, y) if t in d)
        ig = H(Np / N) - (tot / N) * H(pos / tot) - (1 - tot / N) * (
            H((Np - pos) / (N - tot)) if N - tot else 0.0)
        scored.append((max(math.floor(max(ig, 0.0) * 1e6), 0), t, pos, tot))
    scored.sort(key=lambda r: (-r[0], r[1]))
    want = scored[:6]
    got = list(zip(out["ig_e6"], out["term"], out["pos_docs"], out["docs"]))
    assert got == [(ig, t, p, tt) for ig, t, p, tt in want]
    # the planted signal terms dominate
    assert {"aard", "bent", "zebu", "yolk"} <= set(out["term"][:4])


def _bfs_reference(edges, src, max_hops):
    from collections import deque

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist, parent = {src: 0}, {src: None}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in sorted(adj.get(u, [])):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_shortest_path_distances_and_canonical_path(ray_session):
    import ray.data as rd
    from lucene_solr_ray.functions.textml import shortest_path

    rng = np.random.default_rng(3)
    n = 120
    a = rng.integers(0, n, size=500)
    b = rng.integers(0, n, size=500)
    edges = list({(int(x), int(y)) for x, y in zip(a, b) if x != y})
    # undirected
    edges = edges + [(y, x) for x, y in edges]
    et = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                   "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    eds = rd.from_arrow(et).repartition(4).materialize()

    ref = _bfs_reference(edges, 0, max_hops=4)
    dist_ds, _ = shortest_path(lambda: eds, "src", "dst", 0, max_hops=4)
    got = {r["node"]: r["dist"] for r in dist_ds.take_all()}
    assert got == ref

    # dst variant: path is min-parent canonical and hop-consistent
    far = max(ref, key=lambda k: (ref[k], k))
    dist_ds2, path = shortest_path(
        lambda: eds, "src", "dst", 0, dst=far, max_hops=4)
    assert path is not None and path[0] == 0 and path[-1] == far
    assert len(path) == ref[far] + 1
    eset = set(edges)
    for u, v in zip(path, path[1:]):
        assert (u, v) in eset
    # each step's parent is the minimal predecessor at the previous hop
    for d, node in enumerate(path[1:], start=1):
        preds = [u for (u, v) in edges if v == node and ref.get(u) == d - 1]
        assert path[d - 1] == min(preds)


def test_shortest_path_unreachable_and_early_stop(ray_session):
    import ray.data as rd
    from lucene_solr_ray.functions.textml import shortest_path

    et = pa.table({"src": pa.array([1, 2], type=pa.int64()),
                   "dst": pa.array([2, 3], type=pa.int64())})
    eds = rd.from_arrow(et).materialize()
    dist_ds, path = shortest_path(lambda: eds, "src", "dst", 1,
                                  dst=99, max_hops=5)
    assert path is None
    got = {r["node"]: r["dist"] for r in dist_ds.take_all()}
    assert got == {1: 0, 2: 1, 3: 2}
    # src == dst short-circuits
    _, p0 = shortest_path(lambda: eds, "src", "dst", 1, dst=1, max_hops=5)
    assert p0 == [1]


def test_gather_and_score_nodes(ray_session):
    import math

    import ray.data as rd
    from lucene_solr_ray.functions.textml import gather_nodes, score_nodes

    # edges: orders -> parts; part 7 is a hub (appears everywhere)
    src = [1, 1, 2, 2, 3, 3, 4, 5, 6]
    dst = [7, 8, 7, 9, 7, 8, 7, 7, 7]
    et = pa.table({"o": pa.array(src, type=pa.int64()),
                   "p": pa.array(dst, type=pa.int64())})
    eds = rd.from_arrow(et).repartition(3).materialize()
    g = gather_nodes(eds, "o", "p", [1, 2, 3])
    got = {r["node"]: r["gathered"] for r in g.take_all()}
    assert got == {7: 3, 8: 2, 9: 1}

    coll = eds.map_batches(lambda t: t.select(["p"]), batch_format="pyarrow")
    s = score_nodes(g, coll, "p").to_pandas().set_index("node")
    N = len(dst)
    for node, (gath, df) in {7: (3, 6), 8: (2, 2), 9: (1, 1)}.items():
        assert s.loc[node, "gathered"] == gath and s.loc[node, "df"] == df
        assert s.loc[node, "score_e6"] == math.floor(
            gath * math.log(N / df) * 1e6)
    # idf demotes the hub: part 8 (rare) outranks part 7 (everywhere)
    assert s.loc[8, "score_e6"] > s.loc[7, "score_e6"]


def test_featurize_fixed_width_schema(ray_session):
    from lucene_solr_ray.functions.textml import featurize

    rows = {"doc_id": [0, 1], "text": ["aard aard bent", ""], "lab": [1, 0]}
    ds = featurize(_docs_ds(ray_session, rows, parallelism=1),
                   ["aard", "bent"], label_col="lab")
    t = pa.concat_tables(ds.iter_batches(batch_size=None,
                                         batch_format="pyarrow"))
    assert pa.types.is_fixed_size_list(t["f"].type)
    assert t["f"].type.list_size == 3
    rows_out = {r["doc_id"]: list(r["f"]) for r in ds.take_all()}
    assert rows_out[0] == [1.0, 2.0, 1.0]
    assert rows_out[1] == [1.0, 0.0, 0.0]
