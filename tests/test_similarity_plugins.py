"""Similarity SPI (SURVEY.md §2.11): the registry resolves plugins by
name, ClassicSimilarity (TF-IDF) scores partition-invariantly, and WAND is
auto-disabled for non-upper-boundable similarities (results must equal the
exhaustive path, not drop hits)."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.search.similarity import (
    Bm25Similarity,
    ClassicSimilarity,
    register_similarity,
    similarity_from_config,
)


def test_registry_resolution():
    assert isinstance(similarity_from_config(None), Bm25Similarity)
    assert isinstance(similarity_from_config({"name": "bm25"}), Bm25Similarity)
    c = similarity_from_config({"name": "classic", "dtype": "float64"})
    assert isinstance(c, ClassicSimilarity) and c.dtype is np.float64
    with pytest.raises(ValueError, match="unknown similarity"):
        similarity_from_config({"name": "nope"})

    class MySim(Bm25Similarity):
        pass

    register_similarity("mysim", MySim)
    assert isinstance(similarity_from_config({"name": "mysim"}), MySim)


def test_classic_scoring_formula():
    sim = ClassicSimilarity(dtype=np.float64, mode="div")
    # idf = ln((N+1)/(df+1)) + 1
    assert sim.idf(9, 99) == pytest.approx(np.log(100 / 10) + 1)
    cache = sim.norm_inverse_cache(avgdl=50.0)
    from lucene_solr_ray.analysis.smallfloat import LENGTH_TABLE

    # div mode stores sqrt(len); score = w * sqrt(freq) / sqrt(len)
    b = 130
    got = sim.score_freqs(2.0, np.array([4]), np.array([b], dtype=np.uint8), cache)
    assert got[0] == pytest.approx(2.0 * 2.0 / np.sqrt(LENGTH_TABLE[b]))


def test_classic_engine_invariance(built_indexes, corpus_queries):
    idx1, idx4 = built_indexes
    cfg = {"name": "classic"}
    r4 = search(idx4, corpus_queries, k=10, sim_config=cfg, method="exhaustive")
    r1 = search(idx1, corpus_queries, k=10, sim_config=cfg, method="exhaustive")
    cols = ["query_id", "rank", "url", "score"]
    assert r4[cols].reset_index(drop=True).equals(r1[cols].reset_index(drop=True))
    assert len(r4) > 0
    # method="wand" must silently fall back to exhaustive (wand_safe=False)
    rw = search(idx4, corpus_queries, k=10, sim_config=cfg, method="wand")
    assert rw[cols].reset_index(drop=True).equals(r4[cols].reset_index(drop=True))
    # and classic ranks genuinely differ from bm25 somewhere (different idf/tf)
    rb = search(idx4, corpus_queries, k=10, method="exhaustive")
    assert not np.array_equal(
        rb["score"].to_numpy(), r4["score"].to_numpy()
    )
