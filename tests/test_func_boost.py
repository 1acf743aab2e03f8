"""FunctionScoreQuery / boost(q, vs) with index-backed value sources
(SURVEY.md §2.9 index-stat family: termfreq/docfreq/idf/norm/numdocs/
sumtotaltermfreq): engine vs brute-force numpy ground truth."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.query import search

TEXTS = [
    "query planning and query execution for the query engine",
    "join ordering for the query engine",
    "window functions join the party join join",
    "banana apple cherry",
    "query join query join",
]


def _mk_index(tmp_path):
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
    build_index([p], idx, num_partitions=2)
    return idx


def _tf(text, term):
    return text.split().count(term)


def test_termfreq_boost_matches_bruteforce(ray_session, tmp_path):
    idx = _mk_index(tmp_path)
    # const(1) wrapped OR — final score = 100*tf(query) + 10*tf(join)
    q = {
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "or",
                                       "terms": ["query", "join"]}},
        "vs": ["sum", ["product", ["termfreq", "text", "query"], 100],
               ["product", ["termfreq", "text", "join"], 10]],
    }
    res = search(idx, [q], k=10)
    got = {r["url"]: r["score"] for _, r in res.iterrows()}
    expect = {
        f"u://{i:03d}": 100 * _tf(t, "query") + 10 * _tf(t, "join")
        for i, t in enumerate(TEXTS)
        if _tf(t, "query") + _tf(t, "join") > 0
    }
    assert {u: int(s) for u, s in got.items()} == expect
    # rank order: score desc
    assert list(res["score"]) == sorted(res["score"], reverse=True)


def test_global_stat_leaves(ray_session, tmp_path):
    idx = _mk_index(tmp_path)
    n_docs = len(TEXTS)
    sum_dl = sum(len(t.split()) for t in TEXTS)
    df_join = sum(1 for t in TEXTS if _tf(t, "join") > 0)
    ttf_join = sum(_tf(t, "join") for t in TEXTS)
    q = {
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "term", "terms": ["banana"]}},
        "vs": ["sum", ["product", ["numdocs"], 1000000],
               ["product", ["docfreq", "text", "join"], 10000],
               ["product", ["ttf", "text", "join"], 100],
               ["sumtotaltermfreq", "text"]],
    }
    res = search(idx, [q], k=10)
    assert len(res) == 1
    assert int(res["score"].iloc[0]) == (
        n_docs * 1000000 + df_join * 10000 + ttf_join * 100 + sum_dl
    )


def test_norm_leaf_is_quantized_dl(ray_session, tmp_path):
    from lucene_solr_ray.analysis.smallfloat import byte4_to_int, int_to_byte4

    idx = _mk_index(tmp_path)
    q = {
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "or",
                                       "terms": ["banana", "window"]}},
        "vs": ["norm", "text"],
    }
    res = search(idx, [q], k=10)
    got = {r["url"]: int(r["score"]) for _, r in res.iterrows()}
    for i in (2, 3):  # window doc, banana doc
        dl = len(TEXTS[i].split())
        nl = int(byte4_to_int(int_to_byte4(np.array([dl]))[0:1])[0])
        assert got[f"u://{i:03d}"] == nl


def test_idf_leaf_matches_similarity(ray_session, tmp_path):
    idx = _mk_index(tmp_path)
    from lucene_solr_ray.search.similarity import similarity_from_config

    sim = similarity_from_config(None)
    df = sum(1 for t in TEXTS if _tf(t, "banana") > 0)
    q = {
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "term", "terms": ["banana"]}},
        "vs": ["idf", "text", "banana"],
    }
    res = search(idx, [q], k=5)
    assert res["score"].iloc[0] == np.float32(sim.idf(df, len(TEXTS)))


def test_query_value_source(ray_session, tmp_path):
    """query(subq) leaf: boost(const(match), query(join)) must reproduce
    the plain BM25 term query's scores exactly (const 1 x score)."""
    idx = _mk_index(tmp_path)
    plain = search(idx, [{"query_id": 0, "kind": "term",
                          "terms": ["join"]}], k=10)
    boosted = search(idx, [{
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "term", "terms": ["join"]}},
        "vs": ["query", {"kind": "term", "terms": ["join"]}],
    }], k=10)
    cols = ["rank", "url", "score"]
    assert boosted[cols].reset_index(drop=True).equals(
        plain[cols].reset_index(drop=True))
    # non-matching subquery -> value 0: sum(query(banana), 5) on join docs
    mixed = search(idx, [{
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "term", "terms": ["join"]}},
        "vs": ["sum", ["query", {"kind": "term", "terms": ["banana"]}], 5],
    }], k=10)
    assert set(mixed["url"]) == set(plain["url"])
    assert (mixed["score"] == 5.0).all()  # banana matches no join doc


def test_missing_term_and_deletes(ray_session, tmp_path):
    idx = _mk_index(tmp_path)
    q = {
        "query_id": 0,
        "kind": "func_boost",
        "of": {"kind": "const", "of": {"kind": "term", "terms": ["banana"]}},
        "vs": ["sum", ["termfreq", "text", "nonexistent"], 7],
    }
    res = search(idx, [q], k=5)
    assert len(res) == 1 and int(res["score"].iloc[0]) == 7


def test_delete_by_query_func_boost_matches_wrapped_only(ray_session, tmp_path):
    """Review regression: deleteByQuery with a func_boost query must match
    the WRAPPED query's docs only — never the value source's stat terms."""
    import shutil

    from lucene_solr_ray.pipelines.update import delete_by_query

    idx = _mk_index(tmp_path)
    copy = str(tmp_path / "idx_copy")
    shutil.copytree(idx, copy)
    q = {
        "kind": "func_boost",
        "of": {"kind": "term", "terms": ["banana"]},
        "vs": ["sum", ["termfreq", "text", "query"], 1],
    }
    out = delete_by_query(copy, q)
    matched = out["matched"] if isinstance(out, dict) else out
    # exactly the one banana doc; the vs term 'query' (3 docs) untouched
    res = search(copy, [{"query_id": 0, "kind": "term",
                         "terms": ["query"]}], k=10)
    assert len(res) == 3
    res = search(copy, [{"query_id": 0, "kind": "term",
                         "terms": ["banana"]}], k=10)
    assert len(res) == 0
