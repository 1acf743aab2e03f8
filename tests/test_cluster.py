"""Distributed k-means gates (no SQL oracle exists for an iterative float
algorithm): exact recovery on well-separated synthetic blobs, plus Lloyd
inertia monotonicity and a variance-reduction bound on the real embeddings
fixture (whose planted labels are noise-dominated — assigning by the TRUE
label centroids only reaches 0.41 purity, so purity is not a valid gate
there)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"


def test_kmeans_recovers_separated_blobs(ray_session):
    import ray.data

    from lucene_solr_ray.functions.cluster import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(3)
    k, per, d = 5, 80, 16
    centers = rng.normal(size=(k, d)) * 10.0
    X = np.concatenate([centers[i] + rng.normal(size=(per, d)) * 0.3
                        for i in range(k)])
    y = np.repeat(np.arange(k), per)
    import pyarrow as pa

    tab = pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array(X.tolist(), type=pa.list_(pa.float64())),
        "label": pa.array(y.astype(np.int64)),
    })
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64), "label": y})
    ds = ray.data.from_arrow(tab).repartition(4)

    C, inertia = kmeans_fit(ds, "embedding", k=k, iters=6, seed=11)
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a + 1e-6, inertia

    got = kmeans_assign(ds, C, "vec_id", "embedding").to_pandas()
    m = got.merge(df[["vec_id", "label"]], on="vec_id")
    pure = m.groupby("cluster")["label"].agg(
        lambda s: s.value_counts().iloc[0]).sum()
    assert pure / len(m) == 1.0, pure / len(m)
    assert got["vec_id"].is_unique
    assert (got["sq_dist"].to_numpy() >= 0).all()


def test_kmeans_reduces_variance_on_fixture(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from lucene_solr_ray.functions.cluster import kmeans_fit

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    C, inertia = kmeans_fit(ds, "embedding", k=10, iters=6)
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a + 1e-6, inertia

    X = np.array(pq.read_table(f"{SF}/embeddings.parquet",
                               columns=["embedding"])["embedding"].to_pylist())
    total_sse = float(((X - X.mean(0)) ** 2).sum())
    # the fixture's clusters are noise-dominated (see module docstring);
    # 10 centroids must still strictly beat the single-centroid SSE
    assert inertia[-1] < 0.95 * total_sse, (inertia[-1], total_sse)


def test_semdedup_planted(ray_session):
    """SemDeDup: two well-separated blobs, each containing a planted
    near-duplicate set — within-cluster cosine dedup drops the higher ids
    of each dup set and keeps everything else."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.cluster import semdedup

    rng = np.random.default_rng(5)
    vecs, ids = [], []
    for c, center in enumerate([np.array([10.0, 0, 0, 0]),
                                np.array([0, 10.0, 0, 0])]):
        base = center + rng.normal(0, 0.05, size=4)
        # a dup set: 3 nearly identical vectors (ids c*100, c*100+1, +2)
        for j in range(3):
            ids.append(c * 100 + j)
            vecs.append(base + rng.normal(0, 1e-4, size=4))
        # distinct members of the same blob (direction differs)
        for j in range(3, 6):
            ids.append(c * 100 + j)
            v = center + rng.normal(0, 1.0, size=4)
            vecs.append(v)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(t)
    out = semdedup(ds, k=2, iters=4, threshold=0.9999).to_pandas()
    got = dict(zip(out["vec_id"], out["keep"]))
    assert len(got) == 12
    for c in (0, 1):
        assert got[c * 100] is True or got[c * 100] == True  # noqa: E712
        assert not got[c * 100 + 1] and not got[c * 100 + 2]
    # the two clusters never mixed: every blob's rows share one cluster id
    by_cluster = out.groupby("cluster")["vec_id"].apply(
        lambda s: {i // 100 for i in s}
    )
    assert all(len(blobs) == 1 for blobs in by_cluster)
