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
