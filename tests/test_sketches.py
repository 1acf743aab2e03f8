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


def test_heavy_hitters_mg_bound(ray_session):
    """Misra-Gries heavy hitters under forced compression (vocab >>
    capacity): estimates obey true - N/(capacity+1) <= est <= true, and
    every token with true frequency > N/(capacity+1) survives the merge."""
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data

    from lucene_solr_ray.functions.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish stream over a 5000-token vocab, forced through capacity 64
    toks = [f"t{int(i)}" for i in rng.zipf(1.3, size=120_000) if i < 5000]
    texts = [" ".join(toks[i:i + 200]) for i in range(0, len(toks), 200)]
    true = Counter(toks)
    N = len(toks)
    cap = 64

    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}),
                              override_num_blocks=8)
    got = heavy_hitters(ds, "text", capacity=cap, k=30).to_pandas()
    est = dict(zip(got["token"], got["cnt"]))

    bound = N / (cap + 1)
    for tok, e in est.items():
        assert e <= true[tok], (tok, e, true[tok])
        assert true[tok] - e <= bound, (tok, e, true[tok], bound)
    # the true top-5 sit far above the error bound in a zipf(1.3) stream;
    # they must all survive into the sketch's top-30
    top5 = [t for t, _ in true.most_common(5)]
    assert all(true[t] > 2 * bound for t in top5), "fixture lost its skew"
    assert set(top5) <= set(got["token"]), (top5, list(got["token"]))
