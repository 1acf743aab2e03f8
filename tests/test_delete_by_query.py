"""deleteByQuery (reference: solr DirectUpdateHandler2#deleteByQuery,
branch_8x): matching docs vanish from results, survivors keep bit-exact
scores (df/N/avgdl unadjusted until merge), the op is idempotent, and a
subsequent merge reclaims the tombstones."""

import shutil

import numpy as np
import pytest

from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.pipelines.update import delete_by_query


@pytest.fixture()
def dbq_index(built_indexes, tmp_path):
    _, idx4 = built_indexes
    dst = str(tmp_path / "dbq")
    shutil.copytree(idx4, dst)
    return dst


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


def test_delete_by_query_semantics(dbq_index, built_indexes, small_corpus):
    _, idx4 = built_indexes
    from lucene_solr_ray.sources.pages import corpus_df_stats

    dfs = corpus_df_stats(small_corpus)
    ranked = sorted(dfs.items(), key=lambda kv: -kv[1])
    a = ranked[0][0]  # near-universal term: a-only docs must survive
    b = ranked[len(ranked) // 2][0]  # mid-frequency delete target

    before = search(dbq_index, [{"query_id": 0, "kind": "term", "terms": [b]}],
                    k=10**9, method="exhaustive")
    res = delete_by_query(dbq_index, {"kind": "term", "terms": [b]})
    assert res["matched"] == len(before) > 0
    assert res["new_tombstones"] == res["matched"]

    # deleted docs are gone; a disjunction still finds the other term's docs
    after = search(dbq_index, [{"query_id": 0, "kind": "term", "terms": [b]}],
                   k=10**9, method="exhaustive")
    assert len(after) == 0
    or_after = search(dbq_index, [{"query_id": 0, "kind": "or", "terms": [a, b]}],
                      k=10**9, method="exhaustive")
    assert len(or_after) > 0
    assert not set(or_after["url"]) & set(before["url"])

    # survivors keep bit-exact scores: same query on the UNdeleted index,
    # rows restricted to survivors, must agree score-for-score
    or_before = search(idx4, [{"query_id": 0, "kind": "or", "terms": [a, b]}],
                       k=10**9, method="exhaustive")
    keep = or_before[~or_before["url"].isin(set(before["url"]))]
    merged_scores = dict(zip(keep["url"], keep["score"]))
    for url, score in zip(or_after["url"], or_after["score"]):
        assert merged_scores[url] == score

    # idempotent
    res2 = delete_by_query(dbq_index, {"kind": "term", "terms": [b]})
    assert res2["new_tombstones"] == 0

    # the op is recorded in the manifest
    from lucene_solr_ray.state.manifest import read_root_manifest

    ops = read_root_manifest(dbq_index)["delete_ops"]
    assert len(ops) == 2 and ops[0]["matched"] == res["matched"]


def test_delete_by_id(dbq_index, corpus_queries):
    from lucene_solr_ray.pipelines.update import delete_by_id

    q = [{"query_id": 0, **corpus_queries[0]}]
    hits = search(dbq_index, q, k=5, method="exhaustive")
    victims = sorted(hits["url"])[:3]
    res = delete_by_id(dbq_index, victims)
    assert res["matched"] == 3 and res["new_tombstones"] == 3
    after = search(dbq_index, q, k=10**9, method="exhaustive")
    assert not set(after["url"]) & set(victims)
    # idempotent; unknown urls are a no-op
    res2 = delete_by_id(dbq_index, victims + ["https://nope.example/x"])
    assert res2["new_tombstones"] == 0


def test_delete_by_term_range(dbq_index, small_corpus):
    """deleteByQuery must route term_range through the bool evaluator —
    score_query_exhaustive sees terms=[] for this kind and would silently
    match zero docs (the round-3 advice finding)."""
    from lucene_solr_ray.sources.pages import corpus_df_stats

    dfs = corpus_df_stats(small_corpus)
    b = sorted(dfs.items(), key=lambda kv: -kv[1])[len(dfs) // 2][0]
    before = search(dbq_index, [{"query_id": 0, "kind": "term", "terms": [b]}],
                    k=10**9, method="exhaustive")
    assert len(before) > 0
    res = delete_by_query(dbq_index, {"kind": "term_range", "lo": b, "hi": b})
    assert res["matched"] == len(before)
    after = search(dbq_index, [{"query_id": 0, "kind": "term", "terms": [b]}],
                   k=10**9, method="exhaustive")
    assert len(after) == 0


def test_delete_by_prefix_query(dbq_index, small_corpus):
    """Same routing guarantee for the other multi-term kinds (prefix)."""
    from lucene_solr_ray.sources.pages import corpus_df_stats

    dfs = corpus_df_stats(small_corpus)
    b = sorted(dfs.items(), key=lambda kv: -kv[1])[len(dfs) // 2][0]
    pre = b[:3]
    before = search(dbq_index, [{"query_id": 0, "kind": "prefix", "terms": [pre]}],
                    k=10**9, method="exhaustive")
    assert len(before) > 0
    res = delete_by_query(dbq_index, {"kind": "prefix", "terms": [pre]})
    assert res["matched"] == len(before)
    after = search(dbq_index, [{"query_id": 0, "kind": "prefix", "terms": [pre]}],
                   k=10**9, method="exhaustive")
    assert len(after) == 0


def test_delete_by_bool_query_and_merge(dbq_index, small_corpus):
    from lucene_solr_ray.sources.pages import corpus_df_stats

    dfs = corpus_df_stats(small_corpus)
    ranked = sorted(dfs.items(), key=lambda kv: -kv[1])
    a, b = ranked[0][0], ranked[len(ranked) // 2][0]
    q = {"kind": "bool", "must": [{"kind": "term", "terms": [a]}],
         "must_not": [{"kind": "term", "terms": [b]}]}
    victims = search(dbq_index, [{"query_id": 0, **q}], k=10**9,
                     method="exhaustive")
    res = delete_by_query(dbq_index, q)
    assert res["matched"] == len(victims) > 0

    # merge reclaims tombstones: deleted docs stay gone afterwards
    from lucene_solr_ray.index.merge import merge_index

    merge_index(dbq_index)
    post = search(dbq_index, [{"query_id": 0, "kind": "term", "terms": [a]}],
                  k=10**9, method="exhaustive")
    assert not set(post["url"]) & set(victims["url"])
    # CheckIndex stays green post-merge
    from lucene_solr_ray.index.checkindex import check_index

    errors = check_index(dbq_index)
    assert not errors, errors
