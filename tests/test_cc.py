"""Connected components: min-label propagation vs a brute-force union-find
on random graphs, chains (diameter stress), and stars."""

import numpy as np
import pyarrow as pa
import pytest


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min node id in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(ray_session, edges):
    import ray.data

    from lucene_solr_ray.functions.cc import connected_components

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                  "b": pa.array([e[1] for e in edges], type=pa.int64())})
    )
    df = connected_components(ds).to_pandas()
    return dict(zip(df["node"], df["component"]))


def test_cc_chain_and_star(ray_session):
    # a 12-node chain (diameter stress: needs >1 propagation round) plus a
    # star and an isolated pair
    chain = [(i, i + 1) for i in range(100, 112)]
    star = [(7, x) for x in (20, 21, 22, 23)]
    pair = [(900, 901)]
    edges = chain + star + pair
    nodes = sorted({n for e in edges for n in e})
    got = _run(ray_session, edges)
    assert got == _union_find(edges, nodes)
    assert all(got[n] == 100 for n in range(100, 113))
    assert got[23] == 7 and got[901] == 900


@pytest.mark.parametrize("seed", [1, 2])
def test_cc_random_vs_union_find(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 60
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(80, 2))
        if a != b
    ]
    nodes = sorted({x for e in edges for x in e})
    got = _run(ray_session, edges)
    assert got == _union_find(edges, nodes)


def test_cc_large_random_vectorized(ray_session):
    """200k-edge random graph vs an array union-find: exercises the
    bucket-vectorized propagate (one numpy callable per bucket, NOT one
    Python callable per node — the round-3 scale finding) at a size where
    per-node Python would dominate."""
    rng = np.random.default_rng(7)
    n = 20_000
    m = 200_000
    ab = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    ab = ab[ab[:, 0] != ab[:, 1]]

    # vectorized-ish union-find oracle (path halving)
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ab:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = np.unique(ab)
    roots = np.array([find(x) for x in touched])
    # canonical label = min member per root
    exp = {}
    for r in np.unique(roots):
        members = touched[roots == r]
        mn = int(members.min())
        for x in members:
            exp[int(x)] = mn

    import ray.data

    from lucene_solr_ray.functions.cc import connected_components

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(ab[:, 0]), "b": pa.array(ab[:, 1])})
    )
    df = connected_components(ds).to_pandas()
    got = dict(zip(df["node"].astype(int), df["component"].astype(int)))
    assert got == exp


def test_cc_empty_edges(ray_session):
    import ray.data

    from lucene_solr_ray.functions.cc import connected_components

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()),
                  "b": pa.array([], type=pa.int64())})
    )
    out = connected_components(ds)
    # Ray drops schema on empty to_pandas; assert emptiness + Arrow schema
    assert out.count() == 0
    assert [f for f in (out.schema().names or [])] == ["node", "component"]


def test_near_dup_clusters_chain(ray_session):
    """Planted similarity CHAIN A~B~C with A≁C: pair generation finds only
    (A,B) and (B,C); the CC step must still cluster all three (the case
    pair-level dedup under-removes)."""
    import ray.data

    from lucene_solr_ray.functions.dedup import (
        minhash_near_dup_pairs,
        near_dup_clusters,
    )

    words = [f"tok{i:02d}" for i in range(40)]
    texts = {
        10: " ".join(words[0:20]),    # A
        11: " ".join(words[5:25]),    # B: 15/25 overlap with A
        12: " ".join(words[10:30]),   # C: 15/25 with B, 10/30 with A
        13: " ".join(words[30:40] * 2),  # unrelated
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(texts), type=pa.int64()),
                  "text": pa.array(list(texts.values()))})
    )
    kw = dict(threshold=0.5, num_perm=64, bands=32, shingle_k=2)
    pairs = minhash_near_dup_pairs(ds, **kw).to_pandas()
    pairset = set(zip(pairs["a"], pairs["b"]))
    assert (10, 11) in pairset and (11, 12) in pairset
    assert (10, 12) not in pairset  # the chain's weak link
    comp = near_dup_clusters(ds, **kw).to_pandas()
    got = dict(zip(comp["node"], comp["component"]))
    assert got == {10: 10, 11: 10, 12: 10}
