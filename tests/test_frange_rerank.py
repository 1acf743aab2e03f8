"""{!frange} FunctionRangeQuery + ReRankQParser query kinds: engine vs
brute-force ground truth over a tiny corpus, incl. the per-shard
reRankDocs cut semantics and deleteByQuery routing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.query import search

TEXTS = [
    "query planning and query execution for the query engine",  # tf(query)=3
    "join ordering for the query engine",                        # tf(query)=1
    "window functions join the party join join",                 # tf(query)=0
    "banana apple cherry",
    "query join query join",                                     # tf(query)=2
    "query query",                                               # tf(query)=2
]


def _mk_index(tmp_path, partitions=2):
    pages = pa.table(
        {
            "url": [f"u://{i:03d}" for i in range(len(TEXTS))],
            "warc_ts": pa.array(range(len(TEXTS)), type=pa.timestamp("us")),
            "text": pa.array(TEXTS),
            "lang": pa.array(["en"] * len(TEXTS)),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=partitions)
    return idx, p


def _tf(text, term):
    return text.split().count(term)


def test_frange_termfreq_bounds(ray_session, tmp_path):
    """l/u inclusive bounds over tf(query), all-docs candidate set,
    constant score, docid-asc tie-break."""
    idx, _ = _mk_index(tmp_path)
    q = {
        "query_id": 0,
        "kind": "frange",
        "vs": ["termfreq", "text", "query"],
        "l": 2, "u": 3,
    }
    res = search(idx, [q], k=10)
    expect = [f"u://{i:03d}" for i, t in enumerate(TEXTS)
              if 2 <= _tf(t, "query") <= 3]
    assert sorted(res["url"]) == expect
    assert set(res["score"]) == {1.0}
    # exclusive lower bound drops the tf==2 docs
    q2 = dict(q, incl_l=False, query_id=1)
    res2 = search(idx, [q2], k=10)
    assert sorted(res2["url"]) == [
        f"u://{i:03d}" for i, t in enumerate(TEXTS) if 2 < _tf(t, "query") <= 3
    ]


def test_frange_wrapped_of_and_boost(ray_session, tmp_path):
    """'of' restricts candidates to the wrapped query's matches; boost
    sets the constant score."""
    idx, _ = _mk_index(tmp_path)
    q = {
        "query_id": 0,
        "kind": "frange",
        "of": {"kind": "term", "terms": ["join"]},
        "vs": ["termfreq", "text", "query"],
        "l": 1,
        "boost": 2.5,
    }
    res = search(idx, [q], k=10)
    expect = [f"u://{i:03d}" for i, t in enumerate(TEXTS)
              if _tf(t, "join") > 0 and _tf(t, "query") >= 1]
    assert sorted(res["url"]) == expect
    assert set(res["score"]) == {2.5}


@pytest.mark.parametrize("partitions", [1, 2])
def test_rerank_full_cover_matches_bruteforce(ray_session, tmp_path, partitions):
    """With rerank_docs covering every match, combined score =
    bm25(main) + w * bm25(rq where matched) at any partitioning."""
    idx, _ = _mk_index(tmp_path, partitions)
    main = {"kind": "or", "terms": ["query", "join"]}
    rq = {"kind": "term", "terms": ["engine"]}
    res = search(
        idx,
        [{"query_id": 0, "kind": "rerank", "of": main, "rq": rq,
          "rerank_docs": 1000, "rerank_weight": 3.0}],
        k=10, method="exhaustive",
    )
    base = search(idx, [dict(main, query_id=0)], k=10, method="exhaustive")
    rqs = search(idx, [dict(rq, query_id=0)], k=10, method="exhaustive")
    rq_by_url = dict(zip(rqs["url"], rqs["score"]))
    expect = {
        u: s + 3.0 * rq_by_url.get(u, 0.0)
        for u, s in zip(base["url"], base["score"])
    }
    got = dict(zip(res["url"], res["score"]))
    assert set(got) == set(expect)
    for u in expect:
        assert got[u] == pytest.approx(expect[u], rel=0, abs=1e-6), u
    # ordering is by combined score desc
    assert list(res["score"]) == sorted(res["score"], reverse=True)


def test_rerank_cut_is_per_segment(ray_session, tmp_path):
    """rerank_docs=1 at P=1: ONLY the original top doc gets the rq boost;
    every other match keeps its bm25(main) score bit-exactly."""
    idx, _ = _mk_index(tmp_path, partitions=1)
    main = {"kind": "or", "terms": ["query", "join"]}
    rq = {"kind": "term", "terms": ["engine"]}
    base = search(idx, [dict(main, query_id=0)], k=10, method="exhaustive")
    top_url = base.iloc[0]["url"]
    rqs = search(idx, [dict(rq, query_id=0)], k=10, method="exhaustive")
    rq_by_url = dict(zip(rqs["url"], rqs["score"]))
    res = search(
        idx,
        [{"query_id": 0, "kind": "rerank", "of": main, "rq": rq,
          "rerank_docs": 1, "rerank_weight": 5.0}],
        k=10, method="exhaustive",
    )
    got = dict(zip(res["url"], res["score"]))
    for u, s in zip(base["url"], base["score"]):
        exp = s + 5.0 * rq_by_url.get(u, 0.0) if u == top_url else s
        assert got[u] == pytest.approx(exp, rel=0, abs=1e-6), u


def test_frange_delete_by_query(ray_session, tmp_path):
    """deleteByQuery with a {!frange} over termfreq tombstones exactly
    the in-range docs; global-stat leaves refuse loudly."""
    import shutil

    from lucene_solr_ray.pipelines.update import delete_by_query

    idx, _ = _mk_index(tmp_path)
    cp = str(tmp_path / "idx_cp")
    shutil.copytree(idx, cp)
    out = delete_by_query(
        cp, {"kind": "frange", "vs": ["termfreq", "text", "query"], "l": 2}
    )
    expect_deleted = sum(1 for t in TEXTS if _tf(t, "query") >= 2)
    assert out["matched"] == expect_deleted
    res = search(cp, [{"query_id": 0, "kind": "term", "terms": ["query"]}], k=10)
    assert sorted(res["url"]) == [
        f"u://{i:03d}" for i, t in enumerate(TEXTS) if _tf(t, "query") == 1
    ]
    cp2 = str(tmp_path / "idx_cp2")
    shutil.copytree(idx, cp2)
    with pytest.raises(Exception, match="global-stat"):
        delete_by_query(
            cp2,
            {"kind": "frange", "vs": ["docfreq", "text", "query"], "l": 1},
        )
