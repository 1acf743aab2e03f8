"""Sketch accuracy gates: HLL distinct estimate vs exact (SURVEY.md §2.6
hll/UniqueAgg — HLL.java analog is probabilistic, so the gate is an error
bound, not equality)."""

import duckdb


def test_hll_estimate_within_2pct(ray_session):
    from lucene_solr_ray.pipelines.entry_queries import q_hll_distinct_custkey

    sf = "/root/testdata/sf0.01"
    est = int(q_hll_distinct_custkey(sf)["estimate"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM read_parquet('{sf}/orders.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.02, (est, exact)


def test_tdigest_accuracy(ray_session):
    """t-digest quantiles within 1% relative error of exact on a skewed
    (lognormal) distribution, across distributed partial digests."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.sketches import TDigest, tdigest_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=200_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(16)
    got = tdigest_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99])
    for q, g in got.items():
        exact = float(np.quantile(vals, q))
        # VALUE-space relative error; the heavy lognormal tail stretches
        # value error at extreme quantiles even when q-space error is tiny
        tol = 0.03 if q >= 0.99 else 0.01
        assert abs(g - exact) / exact < tol, (q, g, exact)
    # single-digest path agrees with itself after merging splits
    d1 = TDigest().add(vals[:100_000])
    d2 = TDigest().add(vals[100_000:])
    merged = d1.merge(d2)
    assert abs(merged.quantile(0.5) - float(np.quantile(vals, 0.5))) / float(
        np.quantile(vals, 0.5)
    ) < 0.01


def test_ann_ivf_recall_gate(ray_session):
    """IVF-flat ANN recall@5 ≥ 0.8 averaged over the fixed query set at
    nprobe=8/16 cells (approximate path accuracy gate)."""
    from lucene_solr_ray.pipelines.entry_queries import q_ann_ivf_recall

    df = q_ann_ivf_recall("/root/testdata/sf0.01")
    assert df["recall_x100"].mean() >= 80, df.to_dict("records")
