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
