"""Spellcheck, highlight, LTR rerank, and the grouping/pivot/range facet
operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from lucene_solr_ray.pipelines.build import build_index


def _mk_index(tmp_path):
    texts = [
        "query planning and query execution",
        "join ordering for the query engine",
        "window functions join the party",
        "banana apple cherry",
    ]
    pages = pa.table(
        {
            "url": [f"u://{i:03d}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2)
    return idx, texts


def test_spellcheck(ray_session, tmp_path):
    from lucene_solr_ray.search.spellcheck import spellcheck

    idx, _ = _mk_index(tmp_path)
    res = spellcheck(idx, ["quary", "jion", "zzz"], max_edits=2, topn=3)
    q = res[res["input"] == "quary"]
    assert list(q["suggestion"])[0] == "query" and list(q["distance"])[0] == 1
    # prefix_len=1 pins the first letter: 'jion' (j...) finds 'join'
    j = res[res["input"] == "jion"]
    assert "join" in list(j["suggestion"])
    assert (res["input"] == "zzz").sum() == 0  # nothing within 2 edits
    # exact self never suggested
    r2 = spellcheck(idx, ["query"], max_edits=2, topn=5)
    assert "query" not in set(r2["suggestion"])


def test_spellcheck_collate(ray_session, tmp_path):
    """SpellCheckCollator analog: known terms stay as typed, unknown terms
    take their top correction, the collation preserves query order."""
    from lucene_solr_ray.search.spellcheck import collate

    idx, _ = _mk_index(tmp_path)
    res = collate(idx, ["query", "jion", "quary"], max_edits=2)
    assert res["corrections"]["jion"] == "join"
    assert res["corrections"]["quary"] == "query"
    assert "query" not in res["corrections"]  # in-vocabulary: untouched
    assert res["collation"] == "query join query"


def test_highlight(ray_session, tmp_path):
    from lucene_solr_ray.search.highlight import highlight

    _, texts = _mk_index(tmp_path)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    res = highlight(docs, [0, 1, 2], ["query", "join"], window=2,
                    key_col="doc_id")
    by_id = {r["doc_id"]: r for _, r in res.iterrows()}
    # doc 0: 'query' at pos 0 → window clipped at the start, term marked
    assert by_id[0]["pos"] == 0
    assert by_id[0]["snippet"] == "<em>query</em> planning and"
    # doc 1: 'query' (priority 1) beats 'join' even though join is first
    assert by_id[1]["term"] == "query"
    assert by_id[1]["snippet"] == "for the <em>query</em> engine"
    # doc 2: only 'join' present
    assert by_id[2]["term"] == "join" and by_id[2]["pos"] == 2
    # unmarked mode
    plain = highlight(docs, [0], ["query"], window=1, key_col="doc_id",
                      mark=None)
    assert plain["snippet"][0] == "query planning"


def test_ltr_rerank(ray_session, tmp_path):
    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.search.ltr import ltr_rerank

    idx, _ = _mk_index(tmp_path)
    qs = [{"query_id": 0, "kind": "or", "terms": ["query", "join"]}]
    first = search(idx, qs, k=10, sim_config={"dtype": "float64", "mode": "div"})
    # identity model (bm25 only) must reproduce the first-pass ranking
    ident = {"bias": 0.0, "w_bm25": 1.0, "w_log_dl": 0.0, "w_tf": 0.0,
             "w_matched": 0.0}
    res = ltr_rerank(idx, qs, model=ident, k=10, rerank_k=10,
                     sim_config={"dtype": "float64", "mode": "div"})
    assert list(res["url"]) == list(first["url"])
    assert np.allclose(res["score2"].to_numpy(), first["score"].to_numpy())
    # a strong matched_frac weight pushes the 2-term docs above 1-term docs
    cover = {"bias": 0.0, "w_bm25": 0.0, "w_log_dl": 0.0, "w_tf": 0.0,
             "w_matched": 10.0}
    res2 = ltr_rerank(idx, qs, model=cover, k=10, rerank_k=10,
                      sim_config={"dtype": "float64", "mode": "div"})
    # doc 1 contains both terms (frac 1.0); docs 0 and 2 have one each
    assert res2.iloc[0]["url"] == "u://001"
    assert set(res2.head(3)["url"]) == {"u://001", "u://000", "u://002"}


def test_group_topk_and_facets(ray_session):
    from lucene_solr_ray.functions.relational import (
        facet_pivot, facet_range, group_topk,
    )

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "v": [5, 3, 9, 1, 7, 2, 8, 4],
            "id": list(range(8)),
        }
    )
    ds = ray.data.from_pandas(df, override_num_blocks=3)
    got = group_topk(ds, "k", ["v", "id"], [True, False], 2).to_pandas()
    got = got.sort_values(["k", "v"], ascending=[True, False])
    assert list(got["v"]) == [9, 7, 8, 4]

    piv = facet_pivot(
        ray.data.from_pandas(df, override_num_blocks=3), "k", "v", 1, 2
    )
    # top-1 'a' (5 rows), its top v values each count 1 → ties break v asc
    assert list(piv["k"]) == ["a", "a"]
    assert list(piv["count"]) == [1, 1]
    assert list(piv["v"]) == ["1", "3"]  # packed keys stringify

    rng = facet_range(
        ray.data.from_pandas(df, override_num_blocks=3), "v", 0.0, 10.0, 5.0
    )
    assert list(rng["bucket_lo"]) == [0.0, 5.0]
    assert list(rng["count"]) == [4, 4]


def test_pii_scrub_stage():
    from lucene_solr_ray.stages.urp import build_stage_chain

    (fn,) = build_stage_chain([{"name": "pii_scrub", "col": "text"}])
    t = pa.table(
        {
            "text": [
                "mail me at a.b+x@exa-mple.co.uk today",
                "server 10.0.255.7 then call 555-123-4567",
                "no pii here",
                "two mails x@y.io z@w.org and 1.2.3.4",
            ]
        }
    )
    out = fn(t)["text"].to_pylist()
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server <IP> then call <PHONE>"
    assert out[2] == "no pii here"
    assert out[3] == "two mails <EMAIL> <EMAIL> and <IP>"


def test_elevate():
    from lucene_solr_ray.search.elevate import elevate

    hits = pd.DataFrame(
        {
            "rank": [1, 2, 3, 4],
            "url": ["a", "b", "c", "d"],
            "score": [9.0, 8.0, 7.0, 6.0],
        }
    )
    res = elevate(hits, elevated=["c", "d"], excluded=["b"])
    assert list(res["url"]) == ["c", "d", "a"]
    assert list(res["rank"]) == [1, 2, 3]
    # forceElevation: a pinned doc outside the first pass appends with NaN
    res2 = elevate(hits, elevated=["zz"], k=3)
    assert list(res2["url"]) == ["zz", "a", "b"]
    assert np.isnan(res2["score"][0])


def test_json_facet(ray_session):
    from lucene_solr_ray.functions.json_facet import json_facet

    df = pd.DataFrame(
        {
            "s": ["x"] * 6 + ["y"] * 3 + ["z"] * 1,
            "p": ["a", "a", "b", "b", "b", "c", "a", "a", "b", "a"],
            "v": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        }
    )
    ds = ray.data.from_pandas(df, override_num_blocks=3)
    res = json_facet(
        ds,
        {
            "by_s": {
                "type": "terms", "field": "s", "limit": 2,
                "facet": {
                    "sum_v": "sum(v)",
                    "avg_v": "avg(v)",
                    "by_p": {"type": "terms", "field": "p", "limit": 1},
                },
            }
        },
    )
    assert res["count"] == 10
    b = res["by_s"]["buckets"]
    assert [x["val"] for x in b] == ["x", "y"]  # count desc, val asc
    assert b[0]["count"] == 6 and b[0]["sum_v"] == 21.0 and b[0]["avg_v"] == 3.5
    # nested: within 'x', top priority is 'b' (3); within 'y', 'a' (2)
    assert b[0]["by_p"]["buckets"] == [{"val": "b", "count": 3}]
    assert b[1]["by_p"]["buckets"] == [{"val": "a", "count": 2}]


def test_json_facet_query_type(ray_session):
    """query facet (FacetQuery.java analog): top-level filtered bucket,
    query nested under query, and query nested under terms buckets."""
    from lucene_solr_ray.functions.json_facet import json_facet

    df = pd.DataFrame(
        {
            "s": ["x"] * 6 + ["y"] * 3 + ["z"] * 1,
            "c": ["u1", "u1", "u2", "u3", "u3", "u3", "u1", "u2", "u2", "u9"],
            "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        }
    )
    ds = ray.data.from_pandas(df, override_num_blocks=3)
    res = json_facet(
        ds,
        {
            "big": {
                "type": "query", "q": {"col": "v", "op": ">=", "value": 5},
                "facet": {
                    "sum_v": "sum(v)",
                    "uniq_c": "unique(c)",
                    "also_x": {"type": "query",
                               "q": {"col": "s", "op": "==", "value": "x"}},
                },
            },
            "by_s": {
                "type": "terms", "field": "s", "limit": 3,
                "facet": {
                    "hi": {"type": "query",
                           "q": {"col": "v", "op": ">=", "value": 5},
                           "facet": {"sum_v": "sum(v)"}},
                },
            },
        },
    )
    big = res["big"]
    assert big["count"] == 6 and big["sum_v"] == 5 + 6 + 7 + 8 + 9 + 10
    assert big["uniq_c"] == 4  # u3, u1, u2, u9
    assert big["also_x"]["count"] == 2  # v in {5, 6}
    by_s = {b["val"]: b for b in res["by_s"]["buckets"]}
    assert by_s["x"]["hi"] == {"count": 2, "sum_v": 11.0}
    assert by_s["y"]["hi"] == {"count": 3, "sum_v": 24.0}
    assert by_s["z"]["hi"] == {"count": 1, "sum_v": 10.0}
    # in / contains predicate ops
    res2 = json_facet(
        ds,
        {"sel": {"type": "query",
                 "q": [{"col": "s", "op": "in", "value": ["x", "z"]},
                       {"col": "c", "op": "contains", "value": "3"}]}},
    )
    assert res2["sel"]["count"] == 3  # u3 rows within s in {x,z}


def test_pack_token_windows(ray_session, tmp_path):
    from lucene_solr_ray.functions.packing import pack_token_windows

    texts = ["a b c", "d e", "f g h i", "j", "k l m"]  # 3,2,4,1,3 tokens
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(5)), "text": texts}), p
    )
    df = pack_token_windows(p, window=4).to_pandas().sort_values("doc_id")
    assert list(df["n_tokens"]) == [3, 2, 4, 1, 3]
    assert list(df["tok_start"]) == [0, 3, 5, 9, 10]
    # windows of 4: doc0 [0,3)->w0; doc1 [3,5) straddles w0/w1;
    # doc2 [5,9) straddles w1/w2; doc3 [9,10)->w2; doc4 [10,13) w2/w3
    assert list(df["pack_first"]) == [0, 0, 1, 2, 2]
    assert list(df["pack_last"]) == [0, 1, 2, 2, 3]


def test_json_facet_nested_stats(ray_session):
    from lucene_solr_ray.functions.json_facet import json_facet

    df = pd.DataFrame(
        {
            "s": ["x", "x", "x", "y"],
            "p": ["a", "a", "b", "a"],
            "v": [1.0, 3.0, 5.0, 7.0],
        }
    )
    res = json_facet(
        ray.data.from_pandas(df, override_num_blocks=2),
        {
            "by_s": {
                "type": "terms", "field": "s", "limit": 2,
                "facet": {
                    "by_p": {
                        "type": "terms", "field": "p", "limit": 2,
                        "facet": {"mx": "max(v)"},  # stats inside nested
                    },
                },
            }
        },
    )
    x = res["by_s"]["buckets"][0]
    assert x["val"] == "x"
    sub = {b["val"]: b for b in x["by_p"]["buckets"]}
    assert sub["a"]["count"] == 2 and sub["a"]["mx"] == 3.0
    assert sub["b"]["count"] == 1 and sub["b"]["mx"] == 5.0


def test_json_facet_sort_offset_mincount(ray_session):
    from lucene_solr_ray.functions.json_facet import json_facet

    df = pd.DataFrame(
        {
            "s": ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1,
            "v": [1.0] * 5 + [10.0] * 3 + [100.0] * 2 + [1000.0],
        }
    )
    ds = ray.data.from_pandas(df, override_num_blocks=2)
    # sort by a sibling stat descending
    r = json_facet(ds, {"by_s": {
        "type": "terms", "field": "s", "limit": 2,
        "sort": "sum_v desc", "facet": {"sum_v": "sum(v)"},
    }})
    assert [b["val"] for b in r["by_s"]["buckets"]] == ["d", "c"]
    # index order + offset paging
    r2 = json_facet(ds, {"by_s": {
        "type": "terms", "field": "s", "limit": 2, "offset": 1,
        "sort": "index asc",
    }})
    assert [b["val"] for b in r2["by_s"]["buckets"]] == ["b", "c"]
    # mincount prunes sparse buckets before the default count sort
    r3 = json_facet(ds, {"by_s": {
        "type": "terms", "field": "s", "limit": 10, "mincount": 2,
    }})
    assert [b["val"] for b in r3["by_s"]["buckets"]] == ["a", "b", "c"]


def test_urp_timestamp_uuid_default():
    from lucene_solr_ray.stages.urp import build_stage_chain

    chain = build_stage_chain([
        {"name": "timestamp", "dst": "ingest_ts",
         "value": "2026-08-18T00:00:00"},
        {"name": "uuid", "src": "url", "dst": "id"},
        {"name": "default_value", "col": "lang", "value": "und"},
    ])
    t = pa.table({
        "url": ["u://a", "u://b", "u://a"],
        "lang": pa.array(["en", None, "de"]),
    })
    for fn in chain:
        t = fn(t)
    assert t["ingest_ts"].to_pylist()[0].isoformat() == "2026-08-18T00:00:00"
    ids = t["id"].to_pylist()
    assert ids[0] == ids[2] and ids[0] != ids[1]  # name-based: stable per url
    import uuid as _uuid

    _uuid.UUID(ids[0])  # well-formed
    assert t["lang"].to_pylist() == ["en", "und", "de"]


def test_json_facet_numbuckets_allbuckets(ray_session):
    from lucene_solr_ray.functions.json_facet import json_facet

    df = pd.DataFrame(
        {
            "s": ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1,
            "v": [2.0] * 11,
        }
    )
    ds = ray.data.from_pandas(df, override_num_blocks=2)
    r = json_facet(ds, {"by_s": {
        "type": "terms", "field": "s", "limit": 2,
        "numBuckets": True, "allBuckets": True,
        "facet": {"sum_v": "sum(v)"},
    }})
    f = r["by_s"]
    assert len(f["buckets"]) == 2  # limited
    assert f["numBuckets"] == 4    # pre-limit distinct buckets
    assert f["allBuckets"] == {"count": 11, "sum_v": 22.0}


def test_term_set_query(ray_session, tmp_path):
    """TermInSetQuery: constant-score union, raw terms (no analysis),
    P-invariant, composes as a bool FILTER clause and in deleteByQuery."""
    import shutil

    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.pipelines.update import delete_by_query

    idx, texts = _mk_index(tmp_path)
    qs = [
        {"query_id": 0, "kind": "term_set",
         "terms": ["banana", "window", "zzghost"]},
        # raw-term semantics: uppercase input must NOT lowercase-match
        {"query_id": 1, "kind": "term_set", "terms": ["BANANA"]},
        {"query_id": 2, "kind": "bool",
         "must": [{"kind": "term", "terms": ["query"]}],
         "filter": [{"kind": "term_set", "terms": ["join", "banana"]}]},
    ]
    res = search(idx, qs, k=10)
    g0 = res[res.query_id == 0]
    assert set(g0.url) == {"u://002", "u://003"}
    assert (g0.score == 1.0).all()  # constant score
    assert (res.query_id == 1).sum() == 0
    g2 = res[res.query_id == 2]
    assert list(g2.url) == ["u://001"]  # 'query' docs ∩ {join,banana} docs

    # P=1 build gives identical frames
    import pyarrow.parquet as _pq

    p1 = str(tmp_path / "idx1")
    pages = str(tmp_path / "pages.parquet")
    build_index([pages], p1, num_partitions=1)
    cols = ["query_id", "rank", "url", "score"]
    r1 = search(p1, qs, k=10)[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(res[cols].reset_index(drop=True), r1)

    # deleteByQuery with a term_set tombstones exactly the union
    copy = str(tmp_path / "idx_del")
    shutil.copytree(idx, copy)
    out = delete_by_query(copy, {"kind": "term_set",
                                 "terms": ["banana", "window"]})
    assert out["matched"] == 2
    left = search(copy, [{"query_id": 0, "kind": "term_set",
                          "terms": ["banana", "window", "query"]}], k=10)
    assert set(left.url) == {"u://000", "u://001"}


def test_ltr_eval_trees_matches_scalar_reference():
    """MultipleAdditiveTreesModel kernel (search/ltr.py#eval_trees):
    vectorized np.where cascade == per-row scalar walk; feature ==
    threshold branches LEFT (the reference's <=)."""
    import numpy as np

    from lucene_solr_ray.search.ltr import eval_trees

    rng = np.random.default_rng(9)
    n = 500
    feats = {
        "bm25": rng.uniform(0, 8, n),
        "log_dl": rng.uniform(0, 9, n),
        "tf_sum": rng.integers(0, 12, n).astype(np.float64),
        "matched_frac": rng.choice([1 / 3, 2 / 3, 1.0], n),
    }
    # plant exact-threshold rows: must go LEFT
    feats["bm25"][:3] = 2.0
    feats["tf_sum"][3:6] = 4.0
    model = {"type": "trees", "trees": [
        {"weight": 1.0, "root": {
            "feature": "bm25", "threshold": 2.0,
            "left": {"value": 0.25},
            "right": {"feature": "tf_sum", "threshold": 4.0,
                      "left": {"value": 0.5}, "right": {"value": 1.0}}}},
        {"weight": 0.5, "root": {
            "feature": "log_dl", "threshold": 4.5,
            "left": {"feature": "matched_frac", "threshold": 0.75,
                     "left": {"value": -0.5}, "right": {"value": 0.5}},
            "right": {"value": -0.25}}},
    ]}

    def walk(node, i):
        if "value" in node:
            return node["value"]
        nxt = ("left" if feats[node["feature"]][i] <= node["threshold"]
               else "right")
        return walk(node[nxt], i)

    want = np.array([
        sum(t["weight"] * walk(t["root"], i) for t in model["trees"])
        for i in range(n)])
    got = eval_trees(model, feats)
    assert (got == want).all()
    assert got[0] == 0.25 + 0.5 * walk(model["trees"][1]["root"], 0)
